"""Deterministic corpus sampling — training-data pipeline operators over
``documents`` (north-star surface: a 100 TB corpus needs reproducible
sampling, not ``rand()``).

All three queries key their randomness on a Knuth multiplicative hash of
``doc_id`` (``h = (doc_id * 2654435761) % 2^32``) computed with plain 64-bit
integer arithmetic — identical in Spark and DuckDB, so samples are
bit-reproducible across engines, runs, and partitionings (the property
``rand()``/``TABLESAMPLE`` cannot give). No shuffle is introduced by the
Bernoulli filter (pure map); the stratified variant shuffles once on the
stratum key, same as any per-group top-N.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..sources.tables import fan_out, load_table
from .registry import query

KNUTH = 2654435761  # 2^32 * (golden ratio - 1), Knuth multiplicative hashing
MOD = 1 << 32
SAMPLE_PCT = 10          # Bernoulli keep-rate, percent
STRATA_N = 5             # docs kept per (lang, source) stratum
SPLIT_BUCKETS = (8, 1, 1)  # train/valid/test out of 10 hash buckets

_H_SQL = f"((doc_id * {KNUTH}) % {MOD})"


def _h_col():
    return (F.col("doc_id") * F.lit(KNUTH)) % F.lit(MOD)


@query(
    "sample_bernoulli",
    oracle=f"""
SELECT doc_id, lang, source, n_chars
FROM documents
WHERE {_H_SQL} % 100 < {SAMPLE_PCT}
""",
)
def q_sample_bernoulli(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~{pct}% Bernoulli sample: keep iff hash(doc_id) mod 100
    falls under the rate. Pure map-side filter — at 100 TB this subsamples a
    corpus with zero shuffle and perfect reproducibility (re-running, or
    running on a differently-partitioned copy, selects the same rows, unlike
    ``df.sample``'s partition-seeded RNG)."""
    d = load_table(spark, sf_dir, "documents")
    return d.filter(_h_col() % 100 < SAMPLE_PCT).select(
        "doc_id", "lang", "source", "n_chars"
    )


@query(
    "sample_stratified",
    oracle=f"""
WITH h AS (
    SELECT doc_id, lang, source, n_chars, {_H_SQL} AS hv FROM documents
), ranked AS (
    SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY lang, source
                   ORDER BY hv, doc_id) AS INTEGER) AS rk
    FROM h
)
SELECT doc_id, lang, source, n_chars, rk FROM ranked WHERE rk <= {STRATA_N}
""",
)
def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified fixed-N sample: per (lang, source) stratum keep the N docs
    with the smallest hash (hash order == uniform random order, but
    deterministic). One shuffle on the stratum key; Spark rewrites the
    rank-filter to WindowGroupLimit, so each map task pre-prunes to its
    local top-N before the exchange — per-stratum skew cannot blow up the
    shuffle."""
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang", "source").orderBy(F.asc("hv"), F.asc("doc_id"))
    return (
        d.select("doc_id", "lang", "source", "n_chars", _h_col().alias("hv"))
        .withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= STRATA_N)
        .drop("hv")
        .select("doc_id", "lang", "source", "n_chars", "rk")
    )


@query(
    "train_test_split",
    oracle=f"""
WITH assigned AS (
    SELECT *,
        CASE WHEN {_H_SQL} % 10 < {SPLIT_BUCKETS[0]} THEN 'train'
             WHEN {_H_SQL} % 10 < {SPLIT_BUCKETS[0] + SPLIT_BUCKETS[1]} THEN 'valid'
             ELSE 'test' END AS split
    FROM documents
)
SELECT split, lang,
       CAST(COUNT(*) AS BIGINT)       AS n_docs,
       CAST(SUM(n_chars) AS BIGINT)   AS n_chars_total,
       MIN(doc_id)                    AS min_doc_id,
       MAX(doc_id)                    AS max_doc_id
FROM assigned
GROUP BY split, lang
""",
)
def q_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-bucket train/valid/test split (8/1/1) with per-(split, lang)
    size accounting. Assignment is a map-side expression on the same
    multiplicative hash — any row's split can be recomputed independently
    (leak-proof joins between epochs), and the split survives corpus
    repartitioning. The only shuffle is the small accounting aggregate."""
    d = load_table(spark, sf_dir, "documents")
    hv = _h_col() % 10
    split = (
        F.when(hv < SPLIT_BUCKETS[0], "train")
        .when(hv < SPLIT_BUCKETS[0] + SPLIT_BUCKETS[1], "valid")
        .otherwise("test")
    )
    return (
        d.withColumn("split", split)
        .groupBy("split", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("n_chars_total"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
    )


q_sample_bernoulli.__doc__ = q_sample_bernoulli.__doc__.format(pct=SAMPLE_PCT)


# ---------------------------------------------------------------------------
# weighted_sample_wr — Efraimidis-Spirakis weighted sampling w/o replacement
# ---------------------------------------------------------------------------

WSAMPLE_K = 10     # docs drawn per source (policy constant — user's draw size)
WSAMPLE_SEED = "w7:"
# ln() is the one transcendental in the key; round it so a <=1-ulp libm
# difference between Java Math.log and DuckDB's log cannot flip a rank
# (the pre-r11 dp-rounding contract; margin ~1e-14 vs a 5e-10 boundary)
WKEY_DP = 9


@query(
    "weighted_sample_wr",
    oracle=f"""
WITH w AS (
    SELECT doc_id, source,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS weight,
           ('0x' || substr(
               md5('{WSAMPLE_SEED}' || CAST(doc_id AS VARCHAR)), 1, 13)
               )::BIGINT AS h
    FROM documents
), keyed AS (
    SELECT doc_id, source, weight,
           ROUND(ln((h + 1) / CAST(POW(2, 52) AS DOUBLE)) / weight,
                 {WKEY_DP}) AS sel_key
    FROM w
), ranked AS (
    SELECT *, CAST(ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY sel_key DESC, doc_id) AS BIGINT) AS draw
    FROM keyed
)
SELECT doc_id, source, weight, sel_key, draw
FROM ranked WHERE draw <= {WSAMPLE_K}
""",
)
def q_weighted_sample_wr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis & Spirakis 2006):
    per source, draw WSAMPLE_K docs with inclusion probability
    proportional to token weight, in ONE distributed pass — the A-ES
    reservoir trick: give every row the key u^(1/w) for deterministic
    md5-uniform u and take the top-K keys. Ranking by ln(u)/w is the
    monotone-equivalent form (no pow), u = (h+1)/2^52 with h the first 13
    md5 hex chars (52 bits) — an EXACT dyadic double uniform on (0, 1],
    strictly positive so ln is finite, identical in both engines. (Before
    round 9 this divided by 2^53, capping u at 0.5: the 2^(-1/w) factor
    that introduces into the A-ES key u^(1/w) biased inclusion toward
    high-weight rows beyond the intended proportionality.)

    This is the op a mixture builder uses when "sample by tokens, not by
    docs" must hold per draw (contrast token_budget_selection's prefix
    fill and mixture_resample's doc-count temperature targets).

    100-TB shape: key computation is map-only; top-K per source is the
    standard partial top-K window (WindowGroupLimit prunes to K rows per
    source map-side BEFORE the shuffle), so the exchange moves
    |sources| x K rows, not the corpus."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    w = d.select(
        "doc_id",
        "source",
        F.size(F.split("text", " ")).cast("long").alias("weight"),
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(WSAMPLE_SEED), F.col("doc_id").cast("string"))),
                1,
                13,
            ),
            16,
            10,
        ).cast("long").alias("h"),
    )
    keyed = w.select(
        "doc_id",
        "source",
        "weight",
        F.round(
            F.log((F.col("h") + 1) / F.lit(float(2 ** 52))) / F.col("weight"),
            WKEY_DP,
        ).alias("sel_key"),
    )
    win = Window.partitionBy("source").orderBy(F.desc("sel_key"), F.asc("doc_id"))
    return (
        keyed.withColumn("draw", F.row_number().over(win).cast("long"))
        .filter(F.col("draw") <= WSAMPLE_K)
        .select("doc_id", "source", "weight", "sel_key", "draw")
    )


# --- Poissonized bootstrap confidence interval ------------------------------

import math as _math

BOOT_B = 32            # bootstrap replicates
BOOT_SEED = "boot:"    # md5 domain separator
# Poisson(1) CDF ladder for the inverse-CDF draw; weights above
# len(_BOOT_CDF) round to the tail bucket (P < 1.1e-5).
_BOOT_CDF = []
_s = 0.0
for _k in range(8):
    _s += _math.exp(-1.0) / _math.factorial(_k)
    _BOOT_CDF.append(_s)
# ceil(q * B) order-statistic indexes of the replicate means
BOOT_LO_IDX = _math.ceil(0.05 * BOOT_B)    # 5th pct
BOOT_MID_IDX = _math.ceil(0.50 * BOOT_B)   # median
BOOT_HI_IDX = _math.ceil(0.95 * BOOT_B)    # 95th pct

_BOOT_CASE_SQL = (
    "CASE "
    + " ".join(
        f"WHEN u < {c!r} THEN {k}" for k, c in enumerate(_BOOT_CDF)
    )
    + f" ELSE {len(_BOOT_CDF)} END"
)


def _boot_weight_col() -> "F.Column":
    """Spark twin of the SQL CASE ladder (identical double literals)."""
    expr = F.lit(len(_BOOT_CDF))
    for k in range(len(_BOOT_CDF) - 1, -1, -1):
        expr = F.when(F.col("u") < F.lit(_BOOT_CDF[k]), F.lit(k)).otherwise(expr)
    return expr


@query(
    "bootstrap_mean_ci",
    oracle=f"""
WITH reps AS (
    SELECT unnest(range(1, {BOOT_B + 1})) AS rep
), drawn AS (
    SELECT r.rep, o.o_totalprice,
           ({_BOOT_CASE_SQL}) AS w
    FROM orders o CROSS JOIN reps r
    CROSS JOIN LATERAL (
        SELECT (('0x' || substr(md5('{BOOT_SEED}'
                    || CAST(o.o_orderkey AS VARCHAR) || ':'
                    || CAST(r.rep AS VARCHAR)), 1, 13))::BIGINT + 1)
               / CAST(POW(2, 52) AS DOUBLE) AS u
    ) h
), means AS (
    SELECT rep,
           CAST(SUM(w * CAST(o_totalprice AS DECIMAL(18,2)))
                AS DOUBLE) / CAST(SUM(w) AS BIGINT) AS m
    FROM drawn GROUP BY 1
), ranked AS (
    SELECT m, CAST(ROW_NUMBER() OVER (ORDER BY m, rep) AS BIGINT) AS rk
    FROM means
), base AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               / COUNT(*) AS full_mean
    FROM orders
)
SELECT b.n_rows,
       ROUND(b.full_mean, 6) AS mean_est,
       ROUND(lo.m, 6) AS boot_p05,
       ROUND(md.m, 6) AS boot_p50,
       ROUND(hi.m, 6) AS boot_p95,
       CAST({BOOT_B} AS BIGINT) AS n_replicates
FROM base b
CROSS JOIN (SELECT m FROM ranked WHERE rk = {BOOT_LO_IDX}) lo
CROSS JOIN (SELECT m FROM ranked WHERE rk = {BOOT_MID_IDX}) md
CROSS JOIN (SELECT m FROM ranked WHERE rk = {BOOT_HI_IDX}) hi
""",
)
def q_bootstrap_mean_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poissonized bootstrap CI for the mean order value: each of
    {BOOT_B} replicates re-weights every row by an independent
    Poisson(1) draw (the distributed bootstrap — Chamandy et al.,
    "Estimating uncertainty for massive data streams", and the basis of
    the bag-of-little-bootstraps) instead of multinomial resampling,
    which would need global coordination. The 5/50/95 order statistics
    of the replicate means are the interval.

    Determinism: u = (h+1)/2^52 from 13 md5 hex chars — h spans
    [0, 2^52-1], so u is uniform on (0, 1] (exact dyadic double, same
    hash idiom as ``weighted_sample_wr``; dividing by 2^53, as this
    query did before round 9, capped u at 0.5 and silently degraded the
    Poisson(1) ladder to a ~26% Bernoulli — the full ladder is now
    reachable); the Poisson inverse-
    CDF ladder compares u against shared double literals; replicate
    means divide a DECIMAL-exact weighted sum by an int64 count (one
    IEEE division), and the order statistics rank identical doubles
    (ties broken by rep id). ROUND 6 at the readout only.

    100-TB shape: the rep x row fan-out is MAP-SIDE (a broadcast range
    join, no shuffle) and collapses immediately into {BOOT_B} partial
    sums per partition — the shuffle moves B rows per partition, the
    classic sufficient-statistic bootstrap. The rank runs on a
    {BOOT_B}-row aggregate (bounded_window)."""
    from ..operators.windows import bounded_window

    # fan_out: the rep fan-out multiplies each order row by BOOT_B md5
    # draws, and orders is one file split at test SFs (policy in
    # sources/tables.fan_out)
    o = fan_out(
        load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice"),
        "o_orderkey",
    )
    reps = spark.range(1, BOOT_B + 1).select(F.col("id").cast("long").alias("rep"))
    u = (
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit(BOOT_SEED),
                            F.col("o_orderkey").cast("string"),
                            F.lit(":"),
                            F.col("rep").cast("string"),
                        )
                    ),
                    1,
                    13,
                ),
                16,
                10,
            ).cast("long")
            + 1
        )
        / F.lit(float(2**52))
    )
    drawn = o.crossJoin(F.broadcast(reps)).select(
        "rep", "o_totalprice", u.alias("u")
    ).select("rep", "o_totalprice", _boot_weight_col().alias("w"))
    means = drawn.groupBy("rep").agg(
        (
            F.sum(F.col("w") * F.col("o_totalprice").cast("decimal(18,2)")).cast(
                "double"
            )
            / F.sum("w").cast("long")
        ).alias("m")
    )
    wr = bounded_window(
        "m",
        "rep",
        bound=f"replicate-mean aggregate: exactly {BOOT_B} rows",
        queries=("bootstrap_mean_ci",),
    )
    ranked = means.select(
        "m", F.row_number().over(wr).cast("long").alias("rk")
    )
    base = o.agg(
        F.count("*").cast("long").alias("n_rows"),
        (
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double")
            / F.count("*")
        ).alias("full_mean"),
    )
    pick = lambda idx, name: F.broadcast(  # noqa: E731
        ranked.where(F.col("rk") == idx).select(F.col("m").alias(name))
    )
    return (
        base.crossJoin(pick(BOOT_LO_IDX, "lo"))
        .crossJoin(pick(BOOT_MID_IDX, "md"))
        .crossJoin(pick(BOOT_HI_IDX, "hi"))
        .select(
            "n_rows",
            F.round("full_mean", 6).alias("mean_est"),
            F.round("lo", 6).alias("boot_p05"),
            F.round("md", 6).alias("boot_p50"),
            F.round("hi", 6).alias("boot_p95"),
            F.lit(BOOT_B).cast("long").alias("n_replicates"),
        )
    )
