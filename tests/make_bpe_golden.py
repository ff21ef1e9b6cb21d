"""(Re)generate tests/golden/bpe_merges_golden.parquet — the committed
single-process oracle of the BPE merge table (kernels/bpe_ref.py, no
Spark) over each /root/testdata/sf*/documents.parquet, keyed by the same
corpus content digest the extraction goldens use.

Run manually ONLY on a deliberate spec change:
``python tests/make_bpe_golden.py``. tests/test_operators.py compares a
live Spark run against the reference at sf0.001 so drift cannot go stale.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from docling_rag_spark.kernels.bpe_ref import (  # noqa: E402
    bpe_merges_reference,
    word_freqs,
)

# the digest + sf list are the frozen shared spec owned by the extraction
# golden generator — import, never copy (a forked digest writes goldens
# no oracle slice ever matches)
from make_extract_golden import SF_DIRS, corpus_key  # noqa: E402

GOLDEN_DIR = Path(__file__).parent / "golden"


def main() -> None:
    keys, steps, lhss, rhss, mergeds, counts = [], [], [], [], [], []
    for sf in SF_DIRS:
        tbl = pq.read_table(
            f"{sf}/documents.parquet", columns=["doc_id", "text"]
        )
        docs = list(
            zip(
                (str(d) for d in tbl.column("doc_id").to_pylist()),
                tbl.column("text").to_pylist(),
            )
        )
        ck = corpus_key(docs)
        merges = bpe_merges_reference(word_freqs([t for _d, t in docs]))
        for step, lhs, rhs, merged, cnt in merges:
            keys.append(ck)
            steps.append(step)
            lhss.append(lhs)
            rhss.append(rhs)
            mergeds.append(merged)
            counts.append(cnt)
        print(f"{sf}: corpus_key={ck} merges={len(merges)}")
    out = pa.table(
        {
            "corpus_key": pa.array(keys, pa.string()),
            "step": pa.array(steps, pa.int32()),
            "lhs": pa.array(lhss, pa.string()),
            "rhs": pa.array(rhss, pa.string()),
            "merged": pa.array(mergeds, pa.string()),
            "pair_count": pa.array(counts, pa.int64()),
        }
    )
    GOLDEN_DIR.mkdir(exist_ok=True)
    pq.write_table(out, GOLDEN_DIR / "bpe_merges_golden.parquet")
    print(f"wrote {GOLDEN_DIR / 'bpe_merges_golden.parquet'} ({len(keys)} rows)")


if __name__ == "__main__":
    main()
