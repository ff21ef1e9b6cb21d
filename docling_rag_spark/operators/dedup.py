"""Deduplication operators over the `documents` table.

Training-pipeline first-class ops (exact, MinHash+LSH, n-gram Jaccard,
SimHash). All are pure relational plans (explode → groupBy/join) — no
Python on the hot path — and every hash is md5-based so the DuckDB oracle
can reproduce values bit-for-bit (see functions/duckdb_sql.py).

Scale notes (100 TB):
- exact dedup: one shuffle on md5(text) — the minimal possible.
- minhash/jaccard: shingle explosion is narrow; the band-signature groupBy
  and the candidate self-join shuffle only (doc_id, 16-byte digest) pairs,
  never the text. The self-join key (band, signature) is exactly the LSH
  bucketing that keeps candidate pairs ~linear instead of O(n²).
- simhash: explode(tokens)×32 bit positions is wide but all codegen;
  per-doc state is 32 counters.

Plan-shape caveat (measured): explode() must sit DIRECTLY over the array
expression — materializing the array in its own aliased projection first
makes Generate re-evaluate the whole array per emitted row (~|array|×
recompute). See _shingle_rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.duckdb_sql import shingles_sql, tokens_sql
from ..functions.text import tokens_col
from .common import hexn_to_bigint_sql, table

NUM_BANDS = 4
JACCARD_THRESHOLD = 0.5
SIMHASH_BITS = 32


# --------------------------------------------------------------------------
# exact dedup (hash-groupBy) — reference analog: idempotent-id dedup before
# append (src/storage/postgres.py:98-124 ON CONFLICT DO NOTHING)
# --------------------------------------------------------------------------
def exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    # group on the 16-byte binary digest (half the shuffle key payload of
    # the hex string); re-encode to the reference lowercase-hex form only
    # in the final projection (F.hex emits uppercase — lower() restores
    # md5()'s encoding so the oracle matches byte-for-byte)
    return (
        docs.groupBy(F.unhex(F.md5("text")).alias("h"))
        .agg(
            F.count("*").alias("n_copies"),
            F.min("doc_id").alias("keep_doc_id"),
        )
        .select(
            F.lower(F.hex("h")).alias("text_hash"), "n_copies", "keep_doc_id"
        )
    )


EXACT_DEDUP_SQL = """
select md5(text) as text_hash,
       count(*) as n_copies,
       min(doc_id) as keep_doc_id
from documents group by md5(text)
"""


# --------------------------------------------------------------------------
# MinHash + LSH banding (shingle → md5 minhash → band signature → bucket join)
# --------------------------------------------------------------------------
def shingle_rows_from(df: DataFrame, id_col: str, n: int = 3) -> DataFrame:
    """Distinct word n-gram rows (id, shingle) for ANY (id, text) input —
    the shared front of doc-level and chunk-level minhash/jaccard.

    Stage the token array as a real column BEFORE the shingle lambda:
    referencing the raw shingles_col(text) expression duplicates the whole
    regexp-tokenize tree at every lambda use (huge codegen, ~10× slower)."""
    toks = df.select(id_col, tokens_col(F.col("text"), lower=True).alias("toks"))
    # CRITICAL plan shape: explode() must sit directly over the shingle
    # expression in the select ABOVE the token projection. Aliasing the
    # shingle array in its own intermediate projection lets CollapseProject
    # inline it into Generate in a form that re-evaluates the whole array per
    # emitted row (~|shingles|× recompute — measured 18s vs 2s at sf0.1).
    shingle_expr = F.when(
        F.size("toks") < n, F.array().cast("array<string>")
    ).otherwise(
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.size("toks") - n),
                lambda i: F.concat_ws(" ", F.slice("toks", i + 1, n)),
            )
        )
    )
    return toks.select(id_col, F.explode(shingle_expr).alias("shingle"))


def _shingle_rows(spark: SparkSession, sf_dir: str, n: int = 3) -> DataFrame:
    return shingle_rows_from(table(spark, sf_dir, "documents"), "doc_id", n)


def band_sigs(sh: DataFrame, id_col: str) -> DataFrame:
    """Melted LSH band signatures (id, band, sig) from (id, shingle) rows:
    NUM_BANDS parallel min-aggregates in ONE groupBy, then a tiny per-id
    stack — never a band×shingle row explosion before the shuffle.

    Sig width is a CORRECTNESS knob, not a perf knob: band sigs must stay
    the full 128-bit digest. A round-5 experiment split one md5 into four
    32-bit slices (NUM_BANDS× fewer digests, ~0.15s of the 1.8s sf0.1
    wall) — and the planted-skew test's uniform control immediately caught
    4 birthday collisions at just 100k ids (n²/2³³ per band). Candidate-
    PAIR consumers tolerate false positives, but lsh_bucket_dups drops the
    non-minimum member of every bucket UNVERIFIED, so a sig collision
    there is silent data loss — at 10^12 docs, catastrophic. Full-width
    per-band salted digests make collisions ~2^-128 (never).
    tests/test_operators.py::test_lsh_bucket_dups_planted_mega_bucket
    pins this (uniform control must produce ZERO dups).

    ENCODING is a perf knob though (round-5 verdict #4): the sig shuffles
    as the 16-BYTE binary digest, not the 32-char hex string — half the
    payload on every sig shuffle (the groupBy partials, the bucket-minima
    shuffle, the banded self-join) at identical 128-bit width. unhex is
    order-preserving over md5 hex (fixed 32 chars, digits 0-9a-f ascending
    in ASCII == ascending byte nibbles), so min-over-binary picks the same
    sig and bucket equality is unchanged — the DuckDB oracles keep
    comparing hex strings and the id/count outputs match bit-for-bit."""
    band_aggs = [
        F.min(
            F.unhex(F.md5(F.concat_ws("|", F.lit(str(b)), F.col("shingle"))))
        ).alias(f"s{b}")
        for b in range(NUM_BANDS)
    ]
    stack = ", ".join(f"{b}, s{b}" for b in range(NUM_BANDS))
    return (
        sh.groupBy(id_col)
        .agg(*band_aggs)
        .selectExpr(id_col, f"stack({NUM_BANDS}, {stack}) as (band, sig)")
    )


def lsh_bucket_dups(sh: DataFrame, id_col: str) -> DataFrame:
    """Keep-smallest-canonical LSH dedup WITHOUT materializing pairs: an id
    is a duplicate iff ANY of its band buckets contains a smaller id (it is
    not its bucket's minimum). One shuffle on (band, sig), output one column
    ``{id_col}`` of drop-candidates.

    This is the O(n) scale shape: on a boilerplate-heavy corpus a hot
    bucket of b members costs b rows here versus b²/2 join rows for the
    pair form (measured 12.0M pairs from 42k synthetic chunks — the pair
    rule melts exactly where dedup matters most). Shape note: groupBy-min
    + equi-join rather than a min-over window — the per-bucket min gets
    map-side partial aggregation AND the join is AQE-skew-splittable,
    while a window would sort every row of a mega-bucket in ONE task.
    ``sigs`` feeds both join sides, so its linear shingle+min-agg pass runs
    twice per action — deliberate: at corpus scale recomputing a linear
    pass beats materializing an n-row signature table, and the probe side
    arrives already hash-partitioned on (band, sig) from the agg.

    Round-7 materialization attempts, both measured and REJECTED so the
    next round doesn't re-try them: (a) ``.cache()`` — joining against the
    cached InMemoryRelation defeats AQE's runtime sort-merge→broadcast
    conversion (SMJ in the EXECUTED plan, forbidden by the scale-contract
    test) and best-case walls were a wash anyway; (b) eager
    ``localCheckpoint`` — keeps the broadcast conversion and won the
    ISOLATED dups branch by 0.7s (2.68 vs 3.38s), but lost ~0.5s on the
    full training_subset_chunks query (interleaved A/B: 7.1-7.6 vs
    6.6-7.3s): the eager materialization runs as its own job BEFORE the
    main action, forfeiting the stage overlap the one-action plan gets
    between the sig pass and the gram/scoring branches."""
    sigs = band_sigs(sh, id_col)
    mins = sigs.groupBy("band", "sig").agg(F.min(id_col).alias("mid"))
    return (
        sigs.join(mins, ["band", "sig"])
        .filter(F.col(id_col) > F.col("mid"))
        .select(id_col)
        .distinct()
    )


def band_sig_pairs(
    sh: DataFrame, id_col: str, out_a: str | None = None, out_b: str | None = None
) -> DataFrame:
    """Shared minhash-LSH core over (id, shingle) rows: NUM_BANDS parallel
    min-aggregates in ONE groupBy → band/sig melt → banded self-join.
    Returns (out_a, out_b, n_shared_bands) — default {id_col}_a/_b; the
    output names are parameters (NOT renamed post-hoc) so the scoped cache
    stays tied to the frame the caller actually holds. Ids compare with the
    column's native ordering (bigint doc ids, md5-hex chunk ids)."""
    out_a = out_a or f"{id_col}_a"
    out_b = out_b or f"{id_col}_b"
    sigs = (
        band_sigs(sh, id_col)
        # cached: the self-join references sigs twice and each branch would
        # otherwise recompute the full shingle+md5 pipeline; released when
        # the caller drops the result (scoped_cache)
        .cache()
    )
    a, b = sigs.alias("a"), sigs.alias("b")
    from .common import scoped_cache

    return scoped_cache(
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias(out_a),
            F.col(f"b.{id_col}").alias(out_b),
        )
        .agg(F.count("*").alias("n_shared_bands")),
        sigs,
    )


def minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate near-dup pairs sharing >=1 of NUM_BANDS band signatures.
    Band signature = lexicographic min of md5('{band}|{shingle}') over the
    doc's distinct shingles (portable: min over strings in both engines;
    full-width digests by design — see band_sigs on why narrower sigs are
    silent data loss in the keep-smallest path).

    All NUM_BANDS signatures come out of ONE groupBy(doc_id) as parallel
    min-aggregates (then a tiny per-doc stack melt) — no band×shingle row
    explosion before the shuffle; map-side combine sends one row per doc
    per partition. Measured ~20% faster than the explode form at sf0.1 and
    4× fewer shuffle rows at any scale."""
    return band_sig_pairs(_shingle_rows(spark, sf_dir), "doc_id", "doc_a", "doc_b")


MINHASH_LSH_SQL = f"""
with sh as (
  select doc_id, unnest({shingles_sql('text')}) as shingle from documents
),
sigs as (
  select doc_id, band, min(md5(band::varchar || '|' || shingle)) as sig
  from sh, unnest(range(0, {NUM_BANDS})) as t(band)
  group by doc_id, band
)
select a.doc_id as doc_a, b.doc_id as doc_b, count(*) as n_shared_bands
from sigs a join sigs b
  on a.band = b.band and a.sig = b.sig and a.doc_id < b.doc_id
group by a.doc_id, b.doc_id
"""


# --------------------------------------------------------------------------
# n-gram Jaccard near-dup (sparse shingle self-join, verified similarity)
# --------------------------------------------------------------------------
# Posting-list cap: a shingle appearing in > HOT_SHINGLE_DF_CAP documents is
# dropped from every doc's shingle set BEFORE the self-join. Without it, a
# boilerplate shingle shared by d docs emits d²/2 join rows — a quadratic
# skew key that kills the job at corpus scale ("all rights reserved").
# The cap prunes CANDIDATES and the shared-count numerator only; the
# denominator keeps the UNCAPPED per-doc set sizes, so a hot boilerplate
# shingle can never INFLATE a pair's score above its true jaccard (round-2
# advice) — capped scores are a lower bound of true jaccard, and pairs
# related only through hot shingles are (documented) recall loss. The
# DuckDB oracle applies the identical cap/denominator split.
HOT_SHINGLE_DF_CAP = 100


def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _ngram_jaccard_from_shingles(_shingle_rows(spark, sf_dir))


def _ngram_jaccard_from_shingles(shingle_rows: DataFrame) -> DataFrame:
    # shuffle the shingle as its 16-byte md5 digest, not the raw n-gram
    # text (~20-40 bytes avg): the digest is computed map-side and is the
    # ONLY thing the df computation, the self-join, and the per-doc sizes
    # need — counts/equality are identical at 2^-128 collision odds, and
    # the oracle (raw-string joins) matches because the output carries
    # only ids and counts (round-5 verdict #4)
    shingle_rows = shingle_rows.select(
        "doc_id", F.unhex(F.md5("shingle")).alias("shingle")
    )
    # cached: referenced four times below (df agg, anti-join probe,
    # uncapped sizes — and the self-join reads the capped derivative
    # twice); released when the caller drops the result (scoped_cache)
    shingle_rows = shingle_rows.cache()
    # Hot-shingle removal via ANTI-JOIN against the tiny over-cap list —
    # round 6, replacing df-as-count-over-window: a window partitioned by
    # shingle puts EVERY copy of a boilerplate shingle in one task (the
    # exact key the cap exists to tame becomes a single-task straggler
    # BEFORE the cap can drop it, and a window cannot be skew-split). The
    # groupBy is map-side combined — a hot shingle reaches the reducer as
    # one partial row PER MAP TASK, never as raw rows — and the over-cap
    # list is bounded by n_rows/CAP distinct values, so AQE broadcasts the
    # anti-join side and the full row set never shuffles for df at all.
    # The self-join downstream then only ever shuffles capped keys
    # (bucket size ≤ CAP, AQE-skew-splittable). Measured cost at sf0.1:
    # ~2.0→2.5s (one more scan of the cached rows) — bought: no
    # unbounded single-task sort anywhere in the plan at any corpus size.
    hot = (
        shingle_rows.groupBy("shingle")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") > HOT_SHINGLE_DF_CAP)
        .select("shingle")
    )
    sizes = shingle_rows.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    # capped rows repartitioned ONCE on shingle and cached: the self-join
    # reads this frame on both sides with no further exchange (the window
    # form got the same property from its sort-for-window — this keeps it
    # without the sort). Skew-safe by construction: every surviving
    # shingle has ≤ CAP rows, so no partition hot-spots regardless of
    # corpus size.
    sh = (
        shingle_rows.join(hot, "shingle", "left_anti")
        .repartition("shingle")
        .cache()
    )
    a, b = sh.alias("a"), sh.alias("b")
    shared = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("shared"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    out = (
        shared.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("shared") / (F.col("na") + F.col("nb") - F.col("shared")), 6
            ),
        )
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", "jaccard")
    )
    from .common import scoped_cache

    return scoped_cache(out, shingle_rows, sh)


NGRAM_JACCARD_SQL = f"""
with sh_all as materialized (
  select doc_id, unnest({shingles_sql('text')}) as shingle from documents
),
sh as materialized (
  select doc_id, shingle from (
    select doc_id, shingle, count(*) over (partition by shingle) as df
    from sh_all
  ) where df <= {HOT_SHINGLE_DF_CAP}
),
-- denominator uses UNCAPPED sizes (cap prunes candidates, never inflates)
sizes as (select doc_id, count(*) as n_sh from sh_all group by doc_id),
shared as (
  select a.doc_id as doc_a, b.doc_id as doc_b, count(*) as shared
  from sh a join sh b on a.shingle = b.shingle and a.doc_id < b.doc_id
  group by a.doc_id, b.doc_id
)
select doc_a, doc_b,
       round(shared::double / (sa.n_sh + sb.n_sh - shared), 6) as jaccard
from shared
join sizes sa on sa.doc_id = doc_a
join sizes sb on sb.doc_id = doc_b
where round(shared::double / (sa.n_sh + sb.n_sh - shared), 6) >= {JACCARD_THRESHOLD}
"""


# --------------------------------------------------------------------------
# SimHash (portable 16-bit variant; 64-bit python version in kernels)
# --------------------------------------------------------------------------
def simhash_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc 32-bit simhash over lowercase tokens; token hash = first 8 hex
    chars of md5(token) → int. Pure codegen. (16 bits was too coarse at
    corpus scale: over a small vocabulary 12.6% of ALL pairs landed within
    hamming 3 — 32 bits restores selectivity.)

    Physical shape: the 32 per-bit counter sums are PARALLEL aggregates of
    ONE groupBy(doc_id) over the token rows — no tokens×32 row explosion
    and a single map-side-combined shuffle carrying one 32-column row per
    (doc, partition), vs the previous explode(bits) plan that shuffled
    tokens×32 skinny rows (round-2 verdict item #5). The per-bit sums are
    identical integers, so the DuckDB oracle is unchanged."""
    # no repartition: scan splits already parallelize the explode; a blind
    # full shuffle of document text only adds cost at scale
    docs = table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(tokens_col(F.col("text"), lower=True)).alias("tok")
    ).withColumn("hv", F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("bigint"))
    bit_sums = [
        F.sum(
            F.when(F.shiftright(F.col("hv"), j) % 2 == 1, 1).otherwise(-1)
        ).alias(f"s{j}")
        for j in range(SIMHASH_BITS)
    ]
    per_doc = toks.groupBy("doc_id").agg(*bit_sums)
    simhash = None
    for j in range(SIMHASH_BITS):
        term = F.when(F.col(f"s{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        simhash = term if simhash is None else simhash + term
    return per_doc.select(
        "doc_id", simhash.cast("bigint").alias("simhash")
    )


SIMHASH_SQL = f"""
with toks as (
  select doc_id, unnest({tokens_sql('text', lower=True)}) as tok from documents
),
hv as (
  select doc_id, {hexn_to_bigint_sql('md5(tok)', 8)} as hv from toks
),
bits as (
  select doc_id, j,
         sum(case when cast(floor(hv / power(2, j)) as bigint) % 2 = 1
             then 1 else -1 end) as s
  from hv, unnest(range(0, {SIMHASH_BITS})) as t(j)
  group by doc_id, j
)
select doc_id,
       cast(sum(case when s > 0 then cast(power(2, j) as bigint) else 0 end)
            as bigint) as simhash
from bits group by doc_id
"""

# --------------------------------------------------------------------------
# SimHash near-dup pairs: banded candidate generation over the 32-bit hash
# (4 bands of 8 bits; a pair is a candidate iff it collides in >=1 band —
# by the pigeonhole principle 4 bands catch EVERY pair with hamming
# distance <= 3), then the exact bit_count(xor) <= 3 filter. Band width is
# a candidate-volume knob: 8-bit bands give 256 buckets/band (expected
# occupancy n/256 — at larger n widen the bands, exactly like the
# embedding LSH's size-scaled buckets). Never all-pairs.
# --------------------------------------------------------------------------
SIMHASH_BANDS = 4
SIMHASH_BAND_BITS = 8
SIMHASH_HAMMING_MAX = 3  # < SIMHASH_BANDS → banding is lossless (pigeonhole)


def simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .common import banded_pairs

    sigs = simhash_docs(spark, sf_dir)
    band_cols = [
        (
            F.shiftright(F.col("simhash"), SIMHASH_BAND_BITS * b)
            % (1 << SIMHASH_BAND_BITS)
        ).alias(f"b{b}")
        for b in range(SIMHASH_BANDS)
    ]
    # cached: referenced as both sides of SIMHASH_BANDS self-joins;
    # released when the caller drops the result (scoped_cache)
    keyed = sigs.select("doc_id", "simhash", *band_cols).cache()
    cand = banded_pairs(
        keyed, "doc_id", [f"b{b}" for b in range(SIMHASH_BANDS)], ["simhash"]
    )
    from .common import scoped_cache

    return scoped_cache(
        cand.withColumn(
            "hamming",
            F.bit_count(
                F.col("simhash_a").bitwiseXOR(F.col("simhash_b"))
            ).cast("int"),
        )
        .filter(F.col("hamming") <= SIMHASH_HAMMING_MAX)
        .select(
            F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b"), "hamming"
        ),
        keyed,
    )


def _simhash_pairs_sql() -> str:
    from .common import banded_pairs_sql

    band_cols = ",\n         ".join(
        f"(simhash >> {SIMHASH_BAND_BITS * b}) % {1 << SIMHASH_BAND_BITS} as b{b}"
        for b in range(SIMHASH_BANDS)
    )
    cand = banded_pairs_sql("keyed", "doc_id", SIMHASH_BANDS, ["simhash"])
    return f"""
with sims as materialized ({SIMHASH_SQL.strip()}),
keyed as materialized (
  select doc_id, simhash,
         {band_cols}
  from sims
),
cand as materialized (
  {cand}
)
select id_a as doc_a, id_b as doc_b,
       bit_count(xor(simhash_a, simhash_b))::int as hamming
from cand
where bit_count(xor(simhash_a, simhash_b)) <= {SIMHASH_HAMMING_MAX}
"""


SIMHASH_PAIRS_SQL = _simhash_pairs_sql()

QUERIES = {
    "dedup_exact": exact_dedup,
    "dedup_minhash_lsh": minhash_lsh_pairs,
    "dedup_ngram_jaccard": ngram_jaccard_pairs,
    "dedup_simhash_pairs": simhash_pairs,
}
ORACLES = {
    "dedup_exact": EXACT_DEDUP_SQL,
    "dedup_minhash_lsh": MINHASH_LSH_SQL,
    "dedup_ngram_jaccard": NGRAM_JACCARD_SQL,
    "dedup_simhash_pairs": SIMHASH_PAIRS_SQL,
}
# dedup_simhash (per-doc signatures) retired to the extended registry
# (round-6 rotation): dedup_simhash_pairs computes the SAME 32 parallel
# bit-sum signatures and goes further (banded hamming pairs), so the plan
# family stays contract-gated; the freed slot exposes doc_keywords
# (TF-IDF — previously the only extended op with no contract sibling).
EXTRA_QUERIES = {"dedup_simhash": simhash_docs}
EXTRA_ORACLES = {"dedup_simhash": SIMHASH_SQL}


# --------------------------------------------------------------------------
# near-dup clustering: connected components over the LSH candidate graph
# (iterative min-label propagation; the canonical-doc-per-cluster step of a
# training-data dedup pipeline)
# --------------------------------------------------------------------------
CC_MAX_ITERS = 20


def _persisted_ids(spark: SparkSession) -> set[int]:
    return {
        int(k)
        for k in spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray()
    }


def _ckpt_tracked(df: DataFrame) -> tuple[DataFrame, set[int]]:
    """localCheckpoint(eager) + the persisted-RDD ids it created.
    DataFrame.unpersist() canNOT release a local checkpoint (the RDD is
    persisted outside the cache manager), so the ids are the only handle for
    freeing superseded iteration state."""
    spark = df.sparkSession
    before = _persisted_ids(spark)
    out = df.localCheckpoint(eager=True)
    return out, _persisted_ids(spark) - before


def _release_rdds(spark: SparkSession, ids: set[int]) -> None:
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    for i in ids:
        rdd = jmap.get(i)
        if rdd is not None:
            rdd.unpersist(False)


def connected_components(docs: DataFrame, pairs: DataFrame) -> DataFrame:
    """(doc_id, cluster_id) for an undirected pair graph: cluster_id =
    min doc_id reachable from doc_id through ``pairs`` (doc_a, doc_b);
    isolated nodes are their own singleton cluster. The iterative core of
    dedup_clusters, shared with the scaling bench (which feeds it a
    generated multi-million-edge graph — the sf-table graph is too small
    to measure scaling against fixed per-iteration overhead).

    PRECONDITION: every ``pairs`` endpoint must appear in ``docs`` (true
    for every caller — pairs are always derived from the same docs
    table). Since the round-7 edge-nodes-only loop, an endpoint absent
    from docs still PROPAGATES (its id can become a neighbor's
    cluster_id) but is dropped from the output by the final docs left
    join — so a violated precondition can emit a cluster_id that is not
    any docs row (the pre-round-7 code instead ignored unknown
    endpoints via its labels inner join). If a caller ever feeds
    external pair lists, semi-join them onto docs first.

    Spark: iterative label propagation — labels(d) = min(label(d),
    min(label(n) for neighbors n)), looped to fixpoint with a driver-side
    convergence check. Each iteration is one broadcast/shuffle join; at
    10^12 docs this is the standard big-graph CC recipe (alternating
    small-star/large-star would cut iterations; candidate graphs from LSH
    are near-disjoint cliques, so plain propagation converges in ~2 steps).

    Round-7 deeper-pointer-jumping experiment, measured and REJECTED (do
    not re-try): applying the round-start label map 2-3× per round
    (label(label(label(d))), extra label⟕label joins inside the same
    action) did NOT cut rounds AT ALL on the real sf0.1 LSH graph —
    5 rounds at every depth, interleaved A/B min walls 2.92/3.08/3.48s
    for depth 1/2/3 (outputs verified identical). Convergence here is
    bound by min-label flow ACROSS EDGES (overlapping near-cliques), not
    by label-pointer path depth, so extra jumps are dead joins. Round
    count is a graph-structure property; the remaining per-round fixed
    cost needs a different recipe (bucket-propagation, see
    OPTIMIZATION_r07.md "Not yet optimized").
    """
    spark = docs.sparkSession
    # undirected edge list (both directions) — propagation is symmetric.
    # localCheckpoint(eager) TRUNCATES lineage each step: an iterative loop
    # built on cache() alone re-derives ever-longer plans (and a cached
    # parent unpersisted before its child materializes recomputes the whole
    # chain) — the standard Spark iterative-algorithm trap.
    edges, edge_ids = _ckpt_tracked(
        pairs.unionByName(
            pairs.select(
                F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b")
            )
        )
    )
    # round 7: only nodes that APPEAR IN EDGES ride the loop — an isolated
    # doc's label never changes (no neighbors, self pointer-jump), so
    # shuffling it through every iteration's three joins is pure waste; at
    # a few-percent dup rate the loop frames shrink by >10×. Isolated docs
    # re-enter as their own singleton cluster in the final left join —
    # output identical. The bidirectional edge list makes doc_a alone cover
    # every endpoint. Init label = min(self, neighbors) — exactly what
    # iteration 1 would compute, for the price of ONE map-combined groupBy
    # (no join, no checkpoint/convergence-job cycle): one full loop round
    # saved, and propagation still converges to the component min (initial
    # labels stay inside the component).
    labels, label_ids = _ckpt_tracked(
        edges.groupBy("doc_a")
        .agg(F.min("doc_b").alias("nb"))
        .select(
            F.col("doc_a").alias("doc_id"),
            F.least(F.col("doc_a"), F.col("nb")).alias("cluster_id"),
        )
    )
    for _ in range(CC_MAX_ITERS):
        neigh = (
            edges.join(labels, edges.doc_b == labels.doc_id)
            .groupBy(F.col("doc_a").alias("doc_id"))
            .agg(F.min("cluster_id").alias("neigh_min"))
        )
        # pointer jumping: also adopt label(label(d)) — halves the remaining
        # path to the component min each round (O(log diameter) convergence;
        # plain neighbor-pull alone is O(diameter) and chain-shaped LSH
        # components can exceed any fixed iteration cap)
        jump = labels.select(
            F.col("doc_id").alias("j_key"), F.col("cluster_id").alias("j_label")
        )
        new_label = F.least(
            F.col("cluster_id"),
            F.coalesce("neigh_min", F.col("cluster_id")),
            F.coalesce("j_label", F.col("cluster_id")),
        )
        # the changed flag rides INSIDE the checkpointed frame: the old
        # convergence check was a separate labels⋈new_labels join job per
        # iteration — pure per-iteration serial overhead (measured: the
        # 4→16 scaling of a 4M-node graph was Amdahl-capped at 0.55 with
        # ~4s/iteration of driver-side job latency; the flag turns the
        # check into a scan of already-materialized checkpoint blocks)
        new_labels, new_ids = _ckpt_tracked(
            labels.join(neigh, "doc_id", "left")
            .join(jump, F.col("cluster_id") == F.col("j_key"), "left")
            .select(
                "doc_id",
                new_label.alias("new_cluster_id"),
                (new_label != F.col("cluster_id")).alias("chg"),
            )
            .withColumnRenamed("new_cluster_id", "cluster_id")
        )
        changed = new_labels.filter("chg").limit(1).count()
        new_labels = new_labels.drop("chg")
        # the superseded checkpoint's blocks are dead once new_labels is
        # materialized (eager) and `changed` computed — release immediately
        # instead of accumulating one label table per iteration
        _release_rdds(spark, label_ids)
        labels, label_ids = new_labels, new_ids
        if changed == 0:
            break
    _release_rdds(spark, edge_ids)
    # only the FINAL label table stays persisted — it backs the returned
    # (lineage-truncated) DataFrame; isolated docs come back as singleton
    # clusters via the left join (cluster_id = own doc_id)
    return docs.select("doc_id").join(labels, "doc_id", "left").select(
        "doc_id", F.coalesce("cluster_id", "doc_id").alias("cluster_id")
    )


def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver query: connected components over the minhash-LSH candidate
    graph of this sf's documents table."""
    pairs = minhash_lsh_pairs(spark, sf_dir).select("doc_a", "doc_b")
    docs = table(spark, sf_dir, "documents").select("doc_id")
    return connected_components(docs, pairs)


# DuckDB oracle: recursive CTE reachability → min reachable doc per doc.
# The LSH candidate graph at test scale is small; recursion carries
# (doc_id, reach) pairs with UNION dedup, so it terminates.
DEDUP_CLUSTERS_SQL = f"""
with pairs as (
  {MINHASH_LSH_SQL.strip().rstrip(';')}
),
edges as (
  select doc_a as a, doc_b as b from pairs
  union all
  select doc_b as a, doc_a as b from pairs
),
recursive_reach as (
  with recursive reach(doc_id, r) as (
    select doc_id, doc_id as r from documents
    union
    select reach.doc_id, edges.b as r
    from reach join edges on edges.a = reach.r
  )
  select doc_id, min(r) as cluster_id from reach group by doc_id
)
select doc_id, cluster_id from recursive_reach
"""

QUERIES["dedup_clusters"] = dedup_clusters
ORACLES["dedup_clusters"] = DEDUP_CLUSTERS_SQL


# --------------------------------------------------------------------------
# Exact-substring duplication stats (Lee et al. 2022, "Deduplicating
# Training Data Makes Language Models Better"): flag every EXSUB_WINDOW-
# token window whose exact text occurs >=2 times corpus-wide, and report
# the per-document repeated-window fraction (the removal step's input).
# Relational shape: window-hash explode (md5 of the joined window — the
# 16-byte digest shuffles, never the text) → ONE shuffle on the hash for a
# corpus-wide occurrence count (window function; no self-join, so a hot
# boilerplate window costs partition imbalance, not quadratic rows) →
# per-doc rollup. Lee et al. use 50-token windows; 16 here because the
# sandbox docs are ~54 tokens.
# --------------------------------------------------------------------------
EXSUB_WINDOW = 16


def exact_substring_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Round-6 re-shape, removing the last window-partitioned-by-content
    # key in the dedup suite (count(*) over (partition by g) put every
    # copy of a hot boilerplate window into ONE un-splittable task).
    # Algebra: n_repeated(doc) = n_windows(doc) − n_unique(doc), where
    #  - a gram with GLOBAL count c == 1 is by definition owned by exactly
    #    one row, so min(doc_id) of its group IS that row's doc — one
    #    map-side-combined groupBy(g) yields (c, owner) and a hot gram
    #    reaches the reducer as one partial per map task, never as rows;
    #  - n_windows(doc) = max(0, n_tokens − w + 1) directly from the token
    #    array — no second explode, no per-row join-back.
    # ONE gram generation, ONE gram-keyed shuffle (combined partials), no
    # window, no sort; g shuffles as the 16-byte binary digest.
    docs = table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", tokens_col(F.col("text"), lower=True).alias("toks")
    )
    w = EXSUB_WINDOW
    gram_expr = F.when(
        F.size("toks") < w, F.array().cast("array<binary>")
    ).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.size("toks") - w),
            lambda i: F.unhex(F.md5(F.concat_ws(" ", F.slice("toks", i + 1, w)))),
        )
    )
    grams = toks.select("doc_id", F.explode(gram_expr).alias("g"))
    gstats = grams.groupBy("g").agg(
        F.count("*").alias("c"), F.min("doc_id").alias("owner")
    )
    uniq = (
        gstats.filter(F.col("c") == 1)
        .groupBy(F.col("owner").alias("doc_id"))
        .agg(F.count("*").alias("n_unique"))
    )
    n_windows = F.greatest(F.lit(0), F.size("toks") - w + 1).cast("long")
    return (
        toks.select("doc_id", n_windows.alias("n_windows"))
        .join(uniq, "doc_id", "left")
        .select(
            "doc_id",
            "n_windows",
            (F.col("n_windows") - F.coalesce("n_unique", F.lit(0))).alias(
                "n_repeated"
            ),
            F.round(
                F.when(F.col("n_windows") == 0, F.lit(0.0)).otherwise(
                    (F.col("n_windows") - F.coalesce("n_unique", F.lit(0)))
                    / F.col("n_windows")
                ),
                6,
            ).alias("repeated_frac"),
        )
    )


EXACT_SUBSTRING_SQL = f"""
with toks as (
  select doc_id, {tokens_sql('text', lower=True)} as w from documents
),
grams as (
  select doc_id,
         md5(list_aggregate(w[i:i+{EXSUB_WINDOW - 1}], 'string_agg', ' ')) as g
  from toks, unnest(range(1, len(w) - {EXSUB_WINDOW - 1} + 1)) as t(i)
  where len(w) >= {EXSUB_WINDOW}
),
marked as (
  select doc_id, count(*) over (partition by g) as c from grams
),
per_doc as (
  select doc_id, count(*) as n_windows,
         sum(case when c > 1 then 1 else 0 end)::bigint as n_repeated
  from marked group by doc_id
)
select d.doc_id,
       coalesce(p.n_windows, 0) as n_windows,
       coalesce(p.n_repeated, 0) as n_repeated,
       round(case when coalesce(p.n_windows, 0) = 0 then 0.0::double
             else p.n_repeated / p.n_windows::double end, 6) as repeated_frac
from (select doc_id from documents) d
left join per_doc p using (doc_id)
"""

QUERIES["dedup_exact_substring"] = exact_substring_stats
ORACLES["dedup_exact_substring"] = EXACT_SUBSTRING_SQL


# --------------------------------------------------------------------------
# Incremental dedup: today's crawl batch against the already-committed
# corpus. The production recurring shape — a daily batch must be deduped
# against 10^12 existing docs WITHOUT touching corpus text: the corpus
# keeps a persisted (band, sig) signature index (exactly like the IVF
# artifact; here both sides derive from one table and a deterministic
# batch predicate stands in for "today's files"). Batch sigs join the
# index on (band, sig) — cost scales with the BATCH, never corpus×corpus,
# and corpus-internal duplicate pairs are never generated. Reference
# analog: is_file_modified + document_exists re-ingest gating
# (src/storage/postgres.py:253-262) decides new-vs-known per arriving doc
# against committed state.
# --------------------------------------------------------------------------
INC_BATCH_MOD = 10
INC_BATCH_REM = 3


def incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each batch doc (doc_id % INC_BATCH_MOD == INC_BATCH_REM): the
    committed-corpus docs sharing >=1 LSH band signature — n_corpus_matches
    plus the smallest matching corpus doc (the canonical id an ON-CONFLICT
    append would dedup against). Batch docs with no collision (genuinely
    new content) carry a zero count, because the consumer is a WRITE gate:
    every arriving doc needs a verdict, not just the duplicates.

    Plan: ONE shingle+min-agg pass produces all sigs (cached — two filter
    branches); the batch side joins the corpus side on (band, sig), both
    16-byte binary digests. A boilerplate-heavy sig bucket is
    AQE-skew-splittable equi-join load, bounded by batch_bucket ×
    corpus_bucket — at production scale the corpus side is the persisted
    index read, and recomputation is only ever batch-sized."""
    sigs = band_sigs(_shingle_rows(spark, sf_dir), "doc_id").cache()
    is_batch = F.col("doc_id") % INC_BATCH_MOD == INC_BATCH_REM
    batch = sigs.filter(is_batch)
    corpus = sigs.filter(~is_batch).select(
        "band", "sig", F.col("doc_id").alias("corpus_doc")
    )
    hits = (
        batch.join(corpus, ["band", "sig"])
        .groupBy("doc_id")
        .agg(
            F.countDistinct("corpus_doc").alias("n_corpus_matches"),
            F.min("corpus_doc").alias("min_match_doc"),
        )
    )
    batch_docs = sigs.filter(is_batch).select("doc_id").distinct()
    out = (
        batch_docs.join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_corpus_matches", F.lit(0)).alias("n_corpus_matches"),
            "min_match_doc",
        )
    )
    from .common import scoped_cache

    return scoped_cache(out, sigs)


INCREMENTAL_DEDUP_SQL = f"""
with sh as (
  select doc_id, unnest({shingles_sql('text')}) as shingle from documents
),
sigs as (
  select doc_id, band, min(md5(band::varchar || '|' || shingle)) as sig
  from sh, unnest(range(0, {NUM_BANDS})) as t(band)
  group by doc_id, band
),
hits as (
  select b.doc_id,
         count(distinct c.doc_id) as n_corpus_matches,
         min(c.doc_id) as min_match_doc
  from sigs b join sigs c
    on b.band = c.band and b.sig = c.sig
   and b.doc_id % {INC_BATCH_MOD} = {INC_BATCH_REM}
   and c.doc_id % {INC_BATCH_MOD} != {INC_BATCH_REM}
  group by b.doc_id
)
select d.doc_id,
       coalesce(h.n_corpus_matches, 0) as n_corpus_matches,
       h.min_match_doc
from (select distinct doc_id from sigs
      where doc_id % {INC_BATCH_MOD} = {INC_BATCH_REM}) d
left join hits h using (doc_id)
"""

EXTRA_QUERIES["dedup_incremental"] = incremental_dedup
EXTRA_ORACLES["dedup_incremental"] = INCREMENTAL_DEDUP_SQL


# --------------------------------------------------------------------------
# Source overlap matrix (round 6): roll the minhash near-dup CANDIDATE
# pairs up to (source, source) cells — the corpus-audit question "how much
# does source A duplicate source B" that decides which feed to drop before
# paying a full dedup pass (the datacard's cross-source sibling: the card
# counts exact dups per cell, this counts NEAR-dup mass between cells).
# Scale shape: the pair frame is the banded O(n)-bucket candidate set
# (never all-pairs), the two source lookups are plain equi-joins on doc id
# (corpus-proportional sides, unhinted per module policy — AQE decides,
# and a doc-id join key is uniform so an SMJ fallback stays splittable),
# and the rollup is a map-combined groupBy over ≤ sources² cells. The
# source pair is CANONICALIZED (least, greatest) so (a,b) and (b,a) land
# in one cell regardless of pair orientation.
# --------------------------------------------------------------------------


def source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .common import carry_scope

    pairs = minhash_lsh_pairs(spark, sf_dir)
    src = table(spark, sf_dir, "documents").select("doc_id", "source")
    a = src.select(
        F.col("doc_id").alias("doc_a"), F.col("source").alias("sa")
    )
    b = src.select(
        F.col("doc_id").alias("doc_b"), F.col("source").alias("sb")
    )
    out = (
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .groupBy(
            F.least("sa", "sb").alias("source_a"),
            F.greatest("sa", "sb").alias("source_b"),
        )
        .agg(
            F.count("*").alias("n_pairs"),
            F.sum("n_shared_bands").alias("total_shared_bands"),
        )
    )
    # keep the pairs frame (and with it the banded signature cache)
    # alive through the caller's action — dropping the local here would
    # fire its scoped_cache finalizers before the derived plan runs
    return carry_scope(out, pairs)


SOURCE_OVERLAP_SQL = f"""
with pairs as (
  {MINHASH_LSH_SQL.strip().rstrip(';')}
),
s as (select doc_id, source from documents)
select least(sa.source, sb.source) as source_a,
       greatest(sa.source, sb.source) as source_b,
       count(*)::bigint as n_pairs,
       sum(n_shared_bands)::bigint as total_shared_bands
from pairs
join s sa on pairs.doc_a = sa.doc_id
join s sb on pairs.doc_b = sb.doc_id
group by 1, 2
"""

EXTRA_QUERIES["source_overlap_matrix"] = source_overlap_matrix
EXTRA_ORACLES["source_overlap_matrix"] = SOURCE_OVERLAP_SQL
