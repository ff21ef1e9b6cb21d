"""Single-process chunker mirror of pipeline.chunk_spans (frozen spec).

Reference semantics: HybridChunker's 512-token budget walk in reading order
with the md5 chunk-id recipe (reference src/ingestion/chunker.py:45-55,
src/config.py:34), re-specified as the exclusive-prefix-sum segmenting that
the Spark window implements. Tests assert the distributed chunker equals
this function per document.
"""

from __future__ import annotations

from .textutils import chunk_id, token_count

MAX_TOKENS = 512

CHUNKABLE_KINDS = frozenset({"text", "table"})


def chunk_document(
    spans: list[tuple[int, str, str, str | None, int | None]],
    max_tokens: int = MAX_TOKENS,
) -> list[dict]:
    """spans: [(order, kind, text, media_ref, page_num)] (any order; sorted
    by `order` here) → chunk dicts matching pipeline.chunk_spans columns."""
    chunkable = sorted(
        (s for s in spans if s[1] in CHUNKABLE_KINDS and s[2]),
        key=lambda s: s[0],
    )
    segments: dict[int, list] = {}
    cum = 0
    for order, _kind, text, _ref, page in chunkable:
        seg = cum // max_tokens
        segments.setdefault(seg, []).append((order, text, page))
        cum += token_count(text)
    out = []
    for idx, seg in enumerate(sorted(segments)):
        items = segments[seg]
        text = " ".join(t for (_o, t, _p) in items)
        out.append(
            {
                "chunk_index": idx,
                "text": text,
                "page_num": items[0][2],
                "n_tokens": sum(token_count(t) for (_o, t, _p) in items),
            }
        )
    return out


def chunk_ids(doc_id: str, chunks: list[dict]) -> list[str]:
    return [chunk_id(doc_id, c["chunk_index"], c["text"]) for c in chunks]
