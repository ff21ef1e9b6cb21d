"""docling_rag_spark — a PySpark-native document-extraction engine.

A from-scratch reimplementation of the extraction core of
``latent-system-notes/docling-rag`` (reference at /root/reference, cited per-module
as file:line) over tables of interleaved text+media documents:

    (doc_id: string, spans: array<struct<kind, text, media_ref, offset>>)

Design: declarative DataFrame plans everywhere; the only Python on the hot
path is Arrow-vectorized ``mapInPandas`` extraction kernels. See SURVEY.md.
"""

__version__ = "0.1.0"
