"""Property-based checks of the round-6 algorithm SPECS, run against the
DuckDB oracle SQL (fast — no Spark session per example; the Spark plans
are already locked to these same SQL strings by the per-query oracle
gate, so a property proven on the SQL holds for both engines), plus a
seeded-random Spark batch for the BPE merge fold.

Hypothesis generates adversarial supply distributions / value sets the
fixed testdata can't: single-language corpora, all-equal supplies,
zero-token languages, negative and out-of-window percentile values.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from docling_rag_spark.operators.temporal import (
    EVENT_PERCENTILES_SQL,
    PCTL_Q,
    PCTL_QB_MAX,
    PCTL_QB_MIN,
)
from docling_rag_spark.operators.training_set import (
    UNIMAX_BUDGET_FRAC,
    UNIMAX_EPOCHS,
    UNIMAX_BUDGET_SQL,
)

_SETTINGS = settings(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


@given(
    st.lists(
        st.tuples(
            st.sampled_from(["aa", "bb", "cc", "dd", "ee"]),
            st.integers(min_value=0, max_value=40),
        ),
        min_size=1,
        max_size=12,
    )
)
@_SETTINGS
def test_unimax_waterfill_invariants(lang_sizes):
    """For ANY supply distribution (including zero-token languages and
    single-language corpora): alloc ≤ cap per language; capped ⇔ alloc ==
    cap; uncapped languages share ONE absolute allocation; Σalloc ==
    min(B, Σcap) (budget exhausted unless the caps bind everywhere);
    zero-supply languages report NULL epochs and 0 copies."""
    rows = []
    doc_id = 0
    langs = {}
    for lg, n in lang_sizes:
        langs[lg] = langs.get(lg, 0) + n
        rows.append((doc_id, ("w " * n).strip() or None, lg))
        doc_id += 1
    docs = pd.DataFrame(rows, columns=["doc_id", "text", "lang"])
    con = duckdb.connect()
    con.register("documents", docs)
    out = con.execute(UNIMAX_BUDGET_SQL).df()
    con.close()
    assert len(out) == len(docs)
    total = sum(langs.values())
    by_lang = {}
    for lg, grp in out.groupby("lang"):
        eps = set(grp["epochs"].fillna(-1))
        assert len(eps) == 1, (lg, eps)
        cap_flags = set(grp["capped"])
        assert len(cap_flags) == 1
        by_lang[lg] = (eps.pop(), cap_flags.pop())
    allocs = {}
    for lg, (ep, capped) in by_lang.items():
        n = langs[lg]
        if n == 0:
            assert ep == -1  # NULL epochs
            assert capped
            assert (out[out["lang"] == lg]["n_copies"] == 0).all()
            allocs[lg] = 0.0
            continue
        assert ep <= UNIMAX_EPOCHS + 1e-9
        if capped:
            assert ep == UNIMAX_EPOCHS
        allocs[lg] = ep * n
    budget = UNIMAX_BUDGET_FRAC * total
    cap_total = UNIMAX_EPOCHS * total
    want_total = min(budget, cap_total)
    # epochs is rounded to 6 decimals → tolerance scales with supply
    assert abs(sum(allocs.values()) - want_total) <= 1e-4 * max(total, 1) + 1e-6
    uncapped = [allocs[lg] for lg, (_, c) in by_lang.items() if not c]
    if len(uncapped) > 1:
        assert max(uncapped) - min(uncapped) <= 1e-4 * max(uncapped) + 1e-9


@given(
    st.lists(
        st.floats(
            min_value=-5000.0,
            max_value=5000.0,
            allow_nan=False,
            allow_infinity=False,
        ),
        min_size=1,
        max_size=60,
    )
)
@_SETTINGS
def test_percentile_cells_are_saturating_order_statistics(values):
    """For ANY value set (negatives and out-of-window included): each
    reported percentile equals the saturating-clamped cell of the
    ceil(p·n)-th smallest value."""
    docs = pd.DataFrame(
        [(i, None, i, "e", v, None) for i, v in enumerate(values)],
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    con = duckdb.connect()
    con.register("events", docs)
    out = con.execute(EVENT_PERCENTILES_SQL).df()
    con.close()
    assert len(out) == 1
    r = out.iloc[0]
    assert r["n_values"] == len(values)
    svals = sorted(values)
    for p, den, col in ((1, 2, "p50"), (19, 20, "p95"), (99, 100, "p99")):
        k = math.ceil(p * len(svals) / den)
        cell = min(
            max(math.floor(svals[k - 1] * PCTL_Q), PCTL_QB_MIN), PCTL_QB_MAX
        )
        assert r[col] == cell / PCTL_Q, (col, r[col], cell)


def test_bpe_fold_matches_reference_on_random_words(spark):
    """Seeded-random batch: the Spark F.aggregate carry fold must equal
    kernels/bpe_ref._merge_seq on 300 adversarial symbol strings
    (runs of the merged pair, interleavings, the pair at both ends) for
    several (lhs, rhs) choices including lhs == rhs."""
    import random

    from pyspark.sql import functions as F

    from docling_rag_spark.kernels.bpe_ref import _merge_seq
    from docling_rag_spark.operators.bpe import _merge_fold

    rng = random.Random(20260818)
    alphabet = ["a", "b", "ab", "ba"]
    words = [
        [rng.choice(alphabet) for _ in range(rng.randint(1, 12))]
        for _ in range(300)
    ]
    for lhs, rhs in (("a", "a"), ("a", "b"), ("ab", "a"), ("b", "ba")):
        df = spark.createDataFrame(
            [(i, w) for i, w in enumerate(words)],
            "i int, syms array<string>",
        )
        got = {
            r["i"]: r["m"]
            for r in df.select(
                "i", _merge_fold(F.col("syms"), lhs, rhs).alias("m")
            ).collect()
        }
        for i, w in enumerate(words):
            assert got[i] == _merge_seq(w, lhs, rhs), (lhs, rhs, w, got[i])


@given(
    st.lists(
        st.tuples(
            st.sampled_from(["en", "de"]),
            st.lists(
                st.sampled_from(["red", "blue", "fish", "dog", "cat"]),
                min_size=0,
                max_size=8,
            ),
        ),
        min_size=1,
        max_size=14,
    )
)
@_SETTINGS
def test_ccnet_tertile_invariants(docs_spec):
    """For ANY corpus (including <2-token docs and single-doc languages):
    bucket is NULL iff nll is NULL; per language the head holds ≥ a third
    of the scored mass and head+middle ≥ two thirds; buckets are strictly
    nll-ordered at cell granularity (cells are bucket-atomic, so values
    can never straddle)."""
    from docling_rag_spark.operators.textstats import CCNET_BUCKETS_SQL

    docs = pd.DataFrame(
        [
            (i, " ".join(words) if words else None, lang)
            for i, (lang, words) in enumerate(docs_spec)
        ],
        columns=["doc_id", "text", "lang"],
    )
    con = duckdb.connect()
    con.register("documents", docs)
    out = con.execute(CCNET_BUCKETS_SQL).df()
    con.close()
    assert len(out) == len(docs)
    for lang, grp in out.groupby("lang"):
        scored = grp[grp["nll"].notna()]
        unscored = grp[grp["nll"].isna()]
        assert unscored["bucket"].isna().all()
        if len(scored) == 0:
            continue
        assert scored["bucket"].notna().all()
        n = len(scored)
        by_b = {b: g["nll"] for b, g in scored.groupby("bucket")}
        head = by_b.get("head", pd.Series(dtype=float))
        middle = by_b.get("middle", pd.Series(dtype=float))
        tail = by_b.get("tail", pd.Series(dtype=float))
        assert 3 * len(head) >= n
        assert 3 * (len(head) + len(middle)) >= 2 * n
        if len(head) and len(middle):
            assert head.max() < middle.min()
        if len(middle) and len(tail):
            assert middle.max() < tail.min()
        if len(head) and len(tail):
            assert head.max() < tail.min()


@given(
    st.lists(
        st.tuples(
            st.sampled_from(["s0", "s1"]),
            st.sampled_from(["en", "de"]),
            st.one_of(
                st.none(),
                st.sampled_from(
                    ["the cat", "a dog runs", "blue fish", "the cat", ""]
                ),
            ),
        ),
        min_size=1,
        max_size=16,
    )
)
@_SETTINGS
def test_datacard_dup_accounting_matches_pandas_reference(rows):
    """For ANY corpus (duplicate texts spanning cells, NULL and empty
    texts): every cell's n_docs partitions the corpus, and dup_docs
    counts exactly the docs whose text (NULL keyed as its own group)
    occurs more than once CORPUS-WIDE — cross-checked against a direct
    pandas computation."""
    from collections import Counter

    from docling_rag_spark.operators.textstats import CORPUS_DATACARD_SQL

    docs = pd.DataFrame(
        [(i, t, lg, src, 0) for i, (src, lg, t) in enumerate(rows)],
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    )
    con = duckdb.connect()
    con.register("documents", docs)
    out = con.execute(CORPUS_DATACARD_SQL).df()
    con.close()
    assert out["n_docs"].sum() == len(rows)
    corpus_counts = Counter(t for _s, _l, t in rows)  # None is a key too
    want = {}
    for src, lg, t in rows:
        cell = (src, lg)
        n, d = want.get(cell, (0, 0))
        want[cell] = (n + 1, d + (1 if corpus_counts[t] > 1 else 0))
    got = {
        (r["source"], r["lang"]): (r["n_docs"], r["dup_docs"])
        for _i, r in out.iterrows()
    }
    assert got == want
