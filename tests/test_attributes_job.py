"""jobs/attributes_job.py — the Dolma-style tagger/mixer split: tag once
(idempotent keyed append + resume anti-join), mix cheaply and repeatedly
(atomic-swap regenerate over the committed attributes, never re-reading
document text)."""

from __future__ import annotations

import os
import sys

import pytest


@pytest.fixture(scope="module")
def docs_path(spark, tmp_path_factory):
    rows = [
        (
            i,
            "the quick brown fox jumps over the lazy dog and keeps "
            f"the lights on in town number {i}",
            "en",
            "s0",
            80,
        )
        for i in range(10)
    ] + [
        (100, "tiny", "en", "s0", 4),  # fails min_tokens
        (101, "zz yy xx ww vv uu tt ss rr qq pp oo nn mm ll kk jj ii "
              "hh gg ff ee", "en", "s0", 60),  # no stopwords -> fails
        (103, None, "en", "s0", 0),  # NULL text -> NULL attrs, keep=false
        (104, "win the casino jackpot tonight with all the lottery "
              "numbers and the prize money for the whole town to see",
         "en", "s0", 100),  # passes everything EXCEPT the blocklist
    ]
    out = str(tmp_path_factory.mktemp("attrs") / "documents.parquet")
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(out)
    return out


def _run_job(monkeypatch, spark, argv):
    import jobs.attributes_job as J

    monkeypatch.setattr(sys, "argv", ["attributes_job.py"] + argv)
    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    J.main()


def test_tag_resume_and_mix(spark, docs_path, tmp_path, monkeypatch):
    out = str(tmp_path / "out")
    _run_job(monkeypatch, spark, ["--input", docs_path, "--output", out])
    attrs = spark.read.parquet(os.path.join(out, "doc_attributes"))
    assert attrs.count() == 14
    assert attrs.select("doc_id").distinct().count() == 14

    # resume: replay must not duplicate rows (keyed append + anti-join)
    _run_job(
        monkeypatch, spark,
        ["--input", docs_path, "--output", out, "--resume"],
    )
    assert spark.read.parquet(os.path.join(out, "doc_attributes")).count() == 14

    # mix over the COMMITTED attributes — verdicts match the shared policy
    _run_job(
        monkeypatch, spark,
        ["--input", docs_path, "--output", out, "--resume", "--mix"],
    )
    verdicts = {
        r["doc_id"]: (r["keep"], r["reason"])
        for r in spark.read.parquet(
            os.path.join(out, "mix_verdicts")
        ).collect()
    }
    assert len(verdicts) == 14
    # NULL-text doc: every NULL attribute coalesces to a FAIL, first rule
    assert verdicts[103] == (False, "min_tokens")
    assert verdicts[104] == (False, "blocklist")
    assert verdicts[100] == (False, "min_tokens")
    assert verdicts[101][0] is False
    assert verdicts[101][1] in ("min_stopword", "min_quality")
    kept = [d for d, (k, _) in verdicts.items() if k]
    assert kept and all(d < 100 for d in kept)
    for d, (k, reason) in verdicts.items():
        assert (reason is None) == bool(k)


def test_mix_reruns_without_touching_text(spark, docs_path, tmp_path,
                                          monkeypatch):
    """The split's contract: a --mix re-run consumes ONLY the attributes
    table. Proven by deleting the documents input after tagging — the
    mixer must still succeed."""
    out = str(tmp_path / "out")
    _run_job(monkeypatch, spark, ["--input", docs_path, "--output", out])

    moved = str(tmp_path / "moved.parquet")
    os.rename(docs_path, moved)
    try:
        _run_job(monkeypatch, spark, ["--output", out, "--mix-only"])
    finally:
        os.rename(moved, docs_path)
    assert spark.read.parquet(os.path.join(out, "mix_verdicts")).count() == 14


def test_policy_file_overrides_thresholds(spark, docs_path, tmp_path,
                                          monkeypatch):
    """--policy is data, not code: a stricter min_tokens from a JSON file
    flips previously-kept docs to (False, 'min_tokens') in a --mix-only
    rerun — the corpus untouched, the source unedited; an unknown policy
    key fails loud instead of silently applying the default."""
    import json

    import pytest as _pytest

    from docling_rag_spark.operators.attributes import mix_verdict_cols

    out = str(tmp_path / "out")
    _run_job(monkeypatch, spark, ["--input", docs_path, "--output", out,
                                  "--mix"])
    base = {
        r["doc_id"]: r["keep"]
        for r in spark.read.parquet(os.path.join(out, "mix_verdicts")).collect()
    }
    assert any(base.values())

    pol = str(tmp_path / "strict.json")
    with open(pol, "w") as fh:
        json.dump({"min_tokens": 10_000}, fh)
    _run_job(monkeypatch, spark, ["--output", out, "--mix-only",
                                  "--policy", pol])
    strict = {
        (r["doc_id"]): (r["keep"], r["reason"])
        for r in spark.read.parquet(os.path.join(out, "mix_verdicts")).collect()
    }
    assert all(k is False and reason == "min_tokens"
               for k, reason in strict.values())

    with _pytest.raises(ValueError, match="unknown policy keys"):
        mix_verdict_cols({"min_tokons": 1})


def test_policy_value_type_validation():
    """Malformed policy VALUES fail loud, not silently: a string 'langs'
    would splat into per-character isin and drop everything."""
    import pytest as _pytest

    from docling_rag_spark.operators.attributes import mix_verdict_cols

    for bad in (
        {"langs": "en"},
        {"langs": []},
        {"langs": [1, 2]},
        {"min_tokens": "15"},
        {"min_quality": True},
    ):
        with _pytest.raises(ValueError):
            mix_verdict_cols(bad)
    mix_verdict_cols({"langs": ["en"], "min_tokens": 3})  # valid


def test_policy_without_mix_fails_loud(spark, docs_path, tmp_path,
                                       monkeypatch):
    """--policy with neither --mix nor --mix-only is a user error (the
    verdicts would not be regenerated) — argparse rejects it."""
    import pytest as _pytest

    pol = str(tmp_path / "p.json")
    with open(pol, "w") as fh:
        fh.write("{}")
    with _pytest.raises(SystemExit):
        _run_job(
            monkeypatch, spark,
            ["--input", docs_path, "--output", str(tmp_path / "o"),
             "--policy", pol],
        )
