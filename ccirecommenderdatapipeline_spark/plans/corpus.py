"""Corpus-preparation operators over ``documents`` — the stages between a
cleaned crawl and a tokenized training set: chunking, sequence packing,
benchmark-contamination checks, and lexical relevance scoring (TF-IDF /
BM25) (north-star surface; closest reference analogue: the sanitize/slice
layer daily_function.py:1240-1330 applied to text).

Scale notes:
- chunking is a pure map (sequence + posexplode) — no shuffle, chunk
  boundaries derived arithmetically per row;
- packing's only shuffle is the per-source window cumsum; bin ids follow
  arithmetically from the running token offset (the concatenate-and-cut
  packing used for LLM pretraining batches);
- contamination joins the corpus's shingles against the (small) benchmark
  shingle set — a broadcast-ranged semi join at scale, never all-pairs;
- TF-IDF/BM25 build the inverted (term, doc) index once, aggregate
  map-side, and rank with WindowGroupLimit-pruned top-k windows.

Cross-engine determinism: log-free rational idf (the ln(x) libm call is not
guaranteed correctly-rounded, so Spark/JVM and DuckDB could disagree in the
last ulp); every per-term score is rounded to fixed scale and summed as
DECIMAL so combine order cannot flip the driver's value hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..operators.windows import bounded_window
from pyspark.storagelevel import StorageLevel

from ..operators.lnq import LN_UNIT_SCALE, LN_UNIT_SCALE_F, ln_units, ln_units_sql
from ..operators.text import tokens, word_ngrams
from ..sources.tables import load_table
from .registry import query
from .text import TOK_CTE

CHUNK_LEN = 128
CHUNK_STRIDE = 96
PACK_BUDGET = 512          # tokens per packed sequence
PACK_N_BUCKETS = 64        # offset buckets per prefix-sum phase (scale knob)
CONTAM_N = 3               # shingle width for the contamination check
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TERMS = ["spark", "window", "hash"]


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


def _with_start_tok(sized: DataFrame, value_col: str) -> DataFrame:
    """Per-source running token offset (exclusive prefix sum over doc_id
    order) as a TWO-PHASE prefix sum, not one global window per source.

    A plain ``SUM() OVER (PARTITION BY source ORDER BY doc_id)`` serializes
    each source into ONE task — with ~20 sources, a 100 TB corpus would run
    on 20 executor threads no matter the cluster size. Instead:

    1. range-bucket doc_ids into ``PACK_N_BUCKETS`` order-preserving buckets
       (global max doc_id is a one-row broadcast);
    2. within-(source, bucket) running sums — parallelism is
       sources x buckets, each task bounded to ~1/PACK_N_BUCKETS of a source;
    3. per-(source, bucket) totals (map-combinable partial agg) -> cumulative
       bucket offsets over the TINY (sources x buckets)-row table;
    4. broadcast the offsets back and add map-side.

    Integer arithmetic throughout, so the result is bit-identical to the
    single-window form the DuckDB oracle uses.
    """
    # three consumers (max agg, within-bucket sums, bucket totals) share the
    # upstream plan — persist it so CacheManager plan-matching reuses one scan
    sized = sized.persist(StorageLevel.MEMORY_AND_DISK)
    gmax = sized.agg(F.max("doc_id").alias("_max_doc_id"))
    bucketed = (
        sized.crossJoin(F.broadcast(gmax))
        .withColumn(
            "_bucket",
            F.least(
                F.floor(
                    F.col("doc_id") * PACK_N_BUCKETS / (F.col("_max_doc_id") + 1)
                ),
                F.lit(PACK_N_BUCKETS - 1),
            ).cast("long"),
        )
        .drop("_max_doc_id")
    )
    w_in = (
        Window.partitionBy("source", "_bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    within = bucketed.withColumn("_run", F.sum(value_col).over(w_in))
    totals = bucketed.groupBy("source", "_bucket").agg(
        F.sum(value_col).alias("_bsum")
    )
    w_off = (
        Window.partitionBy("source")
        .orderBy("_bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        "source",
        "_bucket",
        F.coalesce(F.sum("_bsum").over(w_off), F.lit(0)).alias("_boff"),
    )
    return (
        within.join(F.broadcast(offsets), ["source", "_bucket"])
        .withColumn(
            "start_tok",
            (F.col("_boff") + F.col("_run") - F.col(value_col)).cast("long"),
        )
        .drop("_bucket", "_run", "_boff")
    )


@query(
    "doc_chunking",
    oracle=f"""
SELECT d.doc_id,
       CAST((u.s - 1) // {CHUNK_STRIDE} AS INTEGER) AS chunk_id,
       CAST(u.s AS BIGINT)                          AS chunk_start,
       substr(d.text, CAST(u.s AS INTEGER), {CHUNK_LEN}) AS chunk_text,
       CAST(length(substr(d.text, CAST(u.s AS INTEGER), {CHUNK_LEN})) AS INTEGER)
           AS chunk_len
FROM documents d, UNNEST(generate_series(1, d.n_chars, {CHUNK_STRIDE})) AS u(s)
WHERE d.n_chars >= 1
""",
)
def q_doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping fixed-width character chunks ({CHUNK_LEN} chars, stride
    {CHUNK_STRIDE}): the context-window slicing stage before embedding or
    tokenization. Pure map-side — chunk starts come from sequence() on the
    stored length, no shuffle, and the blob column is sliced (not copied per
    chunk) inside codegen."""
    d = _docs(spark, sf_dir)
    return (
        # n_chars >= 1 guard: Spark's sequence(1, 0, stride) throws "illegal
        # sequence boundaries" where DuckDB's generate_series silently emits
        # no rows — drop empty docs identically in both engines.
        d.filter(F.col("n_chars") >= 1)
        .select(
            "doc_id",
            "text",
            F.explode(
                F.sequence(F.lit(1).cast("long"), F.col("n_chars"), F.lit(CHUNK_STRIDE))
            ).alias("s"),
        )
        .select(
            "doc_id",
            (((F.col("s") - 1) / CHUNK_STRIDE).cast("int")).alias("chunk_id"),
            F.col("s").alias("chunk_start"),
            F.expr(f"substring(text, CAST(s AS INT), {CHUNK_LEN})").alias("chunk_text"),
        )
        .withColumn("chunk_len", F.length("chunk_text").cast("int"))
    )


@query(
    "sequence_packing",
    oracle=f"""
WITH {TOK_CTE},
sized AS (
    SELECT doc_id, source, CAST(len(toks) AS BIGINT) AS n_tokens
    FROM tok
), packed AS (
    SELECT doc_id, source, n_tokens,
           SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                               ROWS UNBOUNDED PRECEDING) - n_tokens AS start_tok
    FROM sized
)
SELECT doc_id, source, n_tokens,
       CAST(start_tok AS BIGINT)                                   AS start_tok,
       CAST(start_tok // {PACK_BUDGET} AS BIGINT)                  AS first_bin,
       CAST((start_tok + n_tokens - 1) // {PACK_BUDGET} AS BIGINT) AS last_bin,
       (start_tok // {PACK_BUDGET} <> (start_tok + n_tokens - 1) // {PACK_BUDGET})
           AS spans_boundary
FROM packed
""",
)
def q_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concatenate-and-cut sequence packing: per source, documents are laid
    end-to-end in doc_id order into one token stream cut every
    {PACK_BUDGET} tokens — the standard LLM pretraining batch-packing
    discipline. Each doc's bin span falls out arithmetically from the
    running token offset (two-phase bucketed prefix sum — see
    ``_with_start_tok`` — so no single task ever owns a whole source);
    ``spans_boundary`` marks docs a loader would split across
    two sequences."""
    d = _docs(spark, sf_dir)
    sized = d.select(
        "doc_id", "source", F.size(tokens(F.col("text"))).cast("long").alias("n_tokens")
    )
    packed = _with_start_tok(sized, "n_tokens")
    first_bin = F.floor(F.col("start_tok") / PACK_BUDGET)
    last_bin = F.floor((F.col("start_tok") + F.col("n_tokens") - 1) / PACK_BUDGET)
    return packed.select(
        "doc_id",
        "source",
        "n_tokens",
        "start_tok",
        first_bin.cast("long").alias("first_bin"),
        last_bin.cast("long").alias("last_bin"),
        (first_bin != last_bin).alias("spans_boundary"),
    )


def _gram_sql(n: int) -> str:
    parts = " || ' ' || ".join(f"toks[i+{j}]" if j else "toks[i]" for j in range(n))
    return (
        f"list_distinct(CASE WHEN len(toks) >= {n} "
        f"THEN list_transform(range(1, len(toks) - {n - 2}), i -> {parts}) "
        "ELSE CAST([] AS VARCHAR[]) END)"
    )


@query(
    "contamination_check",
    oracle=f"""
WITH {TOK_CTE},
grams AS (
    SELECT doc_id, unnest({_gram_sql(CONTAM_N)}) AS g FROM tok
), bench AS (
    SELECT DISTINCT g FROM grams WHERE doc_id % 100 = 0
), hits AS (
    SELECT gr.doc_id, gr.g
    FROM grams gr JOIN bench b ON b.g = gr.g
    WHERE gr.doc_id % 100 <> 0
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_shared_grams,
       MIN(g)                   AS first_shared_gram
FROM hits GROUP BY doc_id
""",
)
def q_contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination scan: flag training documents sharing any
    {CONTAM_N}-gram with the held-out benchmark slice (doc_id % 100 == 0 —
    the stand-in for an eval-set manifest). The benchmark shingle set is
    orders of magnitude smaller than the corpus, so the membership join
    broadcasts at scale; corpus shingles stream map-side into it — never an
    all-pairs comparison. Per-doc shingle sets are deduped before the join,
    so counts are distinct-gram counts by construction."""
    d = _docs(spark, sf_dir)
    grams = d.select(
        "doc_id",
        F.explode(F.array_distinct(word_ngrams(tokens(F.col("text")), CONTAM_N))).alias(
            "g"
        ),
    )
    bench = (
        grams.filter(F.col("doc_id") % 100 == 0).select("g").distinct()
    )
    return (
        grams.filter(F.col("doc_id") % 100 != 0)
        .join(F.broadcast(bench), "g")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shared_grams"),
            F.min("g").alias("first_shared_gram"),
        )
    )


# Rational (log-free) idf: (N - df + 0.5) / (df + 0.5) — the BM25 odds term
# without the ln wrapper; exact in double division on both engines.
_IDF_SQL = "(n_docs - df + 0.5) / (df + 0.5)"


@query(
    "tfidf_sql",
    oracle=f"""
WITH {TOK_CTE},
terms AS (
    SELECT doc_id, unnest(toks) AS term FROM tok
), tf AS (
    SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
    FROM terms GROUP BY doc_id, term
), dl AS (
    SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM tok
), df AS (
    SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term
), n AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM tok
), scored AS (
    SELECT t.doc_id, t.term, t.tf, d.df,
           ROUND((t.tf / l.dl) * {_IDF_SQL}, 8) AS score
    FROM tf t
    JOIN dl l ON l.doc_id = t.doc_id
    JOIN df d ON d.term = t.term
    CROSS JOIN n
)
SELECT doc_id, term, tf, df, score
FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
              ORDER BY score DESC, term) AS rn
    FROM scored
) WHERE rn <= 5
""",
)
def q_tfidf_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 TF-IDF terms per document, fully oracle-backed (the MLlib
    ``ml_tfidf`` query covers the hashed-feature pipeline; this one pins the
    exact inverted-index math). idf is the log-free BM25 odds ratio — a
    per-term constant, so per-doc ranking among terms with equal tf/dl
    ordering is preserved and every value is exact rational arithmetic.
    Shape: one (doc, term) aggregation, a broadcast df/N side, top-k via
    rank window pruned map-side."""
    d = _docs(spark, sf_dir)
    toks = d.select("doc_id", tokens(F.col("text")).alias("toks"))
    terms = toks.select("doc_id", F.explode("toks").alias("term"))
    tf = terms.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dl = toks.select("doc_id", F.size("toks").cast("long").alias("dl"))
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    n = toks.agg(F.count("*").alias("n_docs"))
    idf = (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    scored = (
        tf.join(dl, "doc_id")
        .join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            F.round((F.col("tf") / F.col("dl")) * idf, 8).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .drop("rn")
    )


@query(
    "bm25_search",
    oracle=f"""
WITH {TOK_CTE},
q AS (SELECT unnest({[*BM25_TERMS]!r}::VARCHAR[]) AS term),
terms AS (
    SELECT doc_id, unnest(toks) AS term FROM tok
), tf AS (
    SELECT t.doc_id, t.term, CAST(COUNT(*) AS BIGINT) AS tf
    FROM terms t JOIN q ON q.term = t.term
    GROUP BY t.doc_id, t.term
), dl AS (
    SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM tok
), df AS (
    SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term
), stats AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           SUM(CAST(len(toks) AS BIGINT)) AS total_tokens
    FROM tok
), per_term AS (
    SELECT t.doc_id,
           CAST(ROUND(
               {_IDF_SQL}
               * (t.tf * ({BM25_K1} + 1))
               / (t.tf + {BM25_K1} * (1 - {BM25_B}
                   + {BM25_B} * l.dl * s.n_docs / s.total_tokens)),
               8) AS DECIMAL(18,8)) AS term_score
    FROM tf t
    JOIN dl l ON l.doc_id = t.doc_id
    JOIN df d ON d.term = t.term
    CROSS JOIN stats s
), totals AS (
    SELECT doc_id,
           CAST(SUM(term_score) AS DOUBLE) AS bm25,
           CAST(COUNT(*) AS INTEGER)       AS n_terms_hit
    FROM per_term GROUP BY doc_id
)
SELECT doc_id, bm25, n_terms_hit
FROM (
    SELECT *, ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS rn
    FROM totals
) WHERE rn <= 10
""",
)
def q_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 keyword search: top-10 documents for a fixed term set
    (k1={BM25_K1}, b={BM25_B}, log-free rational idf). Per-term partial
    scores are rounded to fixed scale and summed as DECIMAL so the <=3-term
    sum is combine-order-exact. The query-term filter hits the inverted
    (term, doc) index before any aggregation, so the scored set is only
    docs containing a query term; the global top-10 is a single tiny
    TakeOrdered over per-doc totals."""
    d = _docs(spark, sf_dir)
    toks = d.select("doc_id", tokens(F.col("text")).alias("toks"))
    terms = toks.select("doc_id", F.explode("toks").alias("term")).filter(
        F.col("term").isin(*BM25_TERMS)
    )
    tf = terms.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dl = toks.select("doc_id", F.size("toks").cast("long").alias("dl"))
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    stats = toks.agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size("toks").cast("long")).alias("total_tokens"),
    )
    idf = (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    tf_part = (F.col("tf") * (BM25_K1 + 1)) / (
        F.col("tf")
        + BM25_K1
        * (1 - BM25_B + BM25_B * F.col("dl") * F.col("n_docs") / F.col("total_tokens"))
    )
    per_term = (
        tf.join(dl, "doc_id")
        .join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            F.round(idf * tf_part, 8).cast("decimal(18,8)").alias("term_score"),
        )
    )
    totals = per_term.groupBy("doc_id").agg(
        F.sum("term_score").cast("double").alias("bm25"),
        F.count("*").cast("int").alias("n_terms_hit"),
    )
    # global top-10 via TakeOrderedAndProject (per-partition heap + merge),
    # NOT an unpartitioned row_number window (single-partition sort at scale)
    return totals.orderBy(F.desc("bm25"), F.asc("doc_id")).limit(10)


def _pipeline_oracle() -> str:
    # The composite reuses the registered quality+dedup oracle verbatim as
    # its first stage, so the two queries can never drift apart.
    from .registry import ORACLES

    return f"""
WITH kept AS ({ORACLES["quality_filtered_corpus"]})
, packed AS (
    SELECT doc_id, source, n_words,
           SUM(n_words) OVER (PARTITION BY source ORDER BY doc_id
                              ROWS UNBOUNDED PRECEDING) - n_words AS start_tok
    FROM kept
)
SELECT doc_id, source, n_words,
       CAST(start_tok AS BIGINT)                  AS start_tok,
       CAST(start_tok // {PACK_BUDGET} AS BIGINT) AS first_bin,
       CAST((start_tok + n_words - 1) // {PACK_BUDGET} AS BIGINT) AS last_bin
FROM packed
"""


@query("corpus_pipeline", oracle=None, late_oracle=True)
def q_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus preparation as ONE lazy plan: gopher-style quality
    gates -> repetition filter -> exact dedup (quality_filtered_corpus's
    composition) -> per-source sequence packing over the SURVIVORS. This is
    the shape a 100 TB prep job actually ships — one DAG, no intermediate
    materialization, every stage's shuffle key documented in its own
    registered query. The oracle is attached via registration below (it
    textually embeds the quality stage's oracle so the stages cannot
    drift)."""
    from .quality import q_quality_filtered_corpus

    kept = q_quality_filtered_corpus(spark, sf_dir)
    packed = _with_start_tok(kept, "n_words")
    first_bin = F.floor(F.col("start_tok") / PACK_BUDGET)
    last_bin = F.floor((F.col("start_tok") + F.col("n_words") - 1) / PACK_BUDGET)
    return packed.select(
        "doc_id", "source", "n_words", "start_tok",
        first_bin.cast("long").alias("first_bin"),
        last_bin.cast("long").alias("last_bin"),
    )


# attach the composite's oracle after definition (it needs the registry
# populated with quality_filtered_corpus, imported above)
from .registry import ORACLES as _ORACLES  # noqa: E402

_ORACLES["corpus_pipeline"] = _pipeline_oracle()


# --- Python UDTF: the table-function chunker ---------------------------------

UDTF_CHUNK = 64      # chars per UDTF chunk (distinct from CHUNK_LEN batteries)


@query(
    "udtf_chunker",
    oracle=f"""
SELECT d.doc_id,
       CAST(u.s - 1 AS INTEGER)                         AS piece_idx,
       substr(d.text, 1 + (CAST(u.s AS INTEGER) - 1) * {UDTF_CHUNK}, {UDTF_CHUNK})
                                                        AS piece,
       CAST(length(substr(d.text,
            1 + (CAST(u.s AS INTEGER) - 1) * {UDTF_CHUNK}, {UDTF_CHUNK}))
            AS INTEGER)                                 AS piece_len
FROM documents d,
     UNNEST(generate_series(1, CAST(ceil(d.n_chars / {UDTF_CHUNK}.0) AS BIGINT)))
         AS u(s)
WHERE d.n_chars >= 1
""",
)
def q_udtf_chunker(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 4 user-defined TABLE function): a lateral-join
    chunker — each document row expands to its non-overlapping
    {UDTF_CHUNK}-char pieces through the arrow-evaluated UDTF path
    (`LATERAL udtf(...)`), exercising the analyzer's table-function
    resolution rather than explode(). The same chunking is restated
    arithmetically in the oracle (generate_series over ceil(n/W)).

    Scale note: UDTF eval logic is per-row Python, so the plan pins the
    ARROW-optimized UDTF path (``useArrow=True`` — ArrowEvalPythonUDTF,
    columnar batch transfer instead of pickled row-at-a-time
    BatchEvalPythonUDTF; tools/audit_plans.py flags the latter repo-wide).
    Fine for connector-style expansion logic that built-ins can't
    express, but the repo's hot-path chunkers (doc_chunking) stay in
    Catalyst HOFs; this query pins the SURFACE so a user porting UDTF
    code gets a verified path."""
    from pyspark.sql.functions import lit, udtf

    @udtf(returnType="piece_idx INT, piece STRING, piece_len INT", useArrow=True)
    class Chunker:
        def eval(self, text: str, width: int):
            if not text:
                return
            for i in range(0, (len(text) + width - 1) // width):
                piece = text[i * width:(i + 1) * width]
                yield i, piece, len(piece)

    spark.udtf.register("chunker", Chunker)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(
        f"""
        SELECT d.doc_id, c.piece_idx, c.piece, c.piece_len
        FROM documents d, LATERAL chunker(d.text, {UDTF_CHUNK}) c
        WHERE d.n_chars >= 1
        """
    )


@query(
    "distinctive_terms",
    oracle=f"""
WITH {TOK_CTE},
terms AS (
    SELECT source, unnest(toks) AS term FROM tok
), st AS (
    SELECT source, term, CAST(COUNT(*) AS BIGINT) AS c_st FROM terms GROUP BY 1, 2
), src_tot AS (
    SELECT source, CAST(SUM(c_st) AS BIGINT) AS src_n FROM st GROUP BY 1
), g AS (
    SELECT term, CAST(SUM(c_st) AS BIGINT) AS c_g FROM st GROUP BY 1
), tot AS (
    SELECT CAST(SUM(c_g) AS BIGINT) AS n FROM g
), scored AS (
    SELECT s.source, s.term, s.c_st, gt.c_g,
           ROUND((s.c_st / st2.src_n) / (gt.c_g / t.n), 6) AS lift
    FROM st s
    JOIN src_tot st2 USING (source)
    JOIN g gt USING (term)
    CROSS JOIN tot t
    WHERE s.c_st >= 5
)
SELECT source, term, c_st, c_g, lift
FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY source
              ORDER BY lift DESC, term) AS rn
    FROM scored
) WHERE rn <= 5
""",
)
def q_distinctive_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source distinctive vocabulary: each term's frequency LIFT
    ((share within source) / (share globally)), top-5 per source with a
    minimum-count support filter — the corpus-exploration pass that
    surfaces domain drift before a training mix is frozen. All inputs are
    integer counts; lift is per-row division of exact integers rounded at
    fixed scale, so ordering and values are engine-exact. Two
    map-combinable count aggregates share the (source, term) shuffle; the
    global totals are tiny broadcasts; top-5 is WindowGroupLimit-pruned."""
    d = load_table(spark, sf_dir, "documents")
    terms = d.select("source", F.explode(tokens(F.col("text"))).alias("term"))
    # persist the (source, term) count table: it is the materialized
    # vocabulary index (bounded by |vocab| x |sources|, far smaller than
    # the corpus) and THREE consumers read it — without the persist each
    # branch re-tokenized the full corpus (4 scans in the executed plan)
    from pyspark.storagelevel import StorageLevel

    st = (
        terms.groupBy("source", "term")
        .agg(F.count("*").alias("c_st"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    src_tot = st.groupBy("source").agg(F.sum("c_st").cast("long").alias("src_n"))
    g = st.groupBy("term").agg(F.sum("c_st").cast("long").alias("c_g"))
    tot = g.agg(F.sum("c_g").cast("long").alias("n"))
    scored = (
        st.filter(F.col("c_st") >= 5)
        .join(F.broadcast(src_tot), "source")
        .join(g, "term")
        .crossJoin(F.broadcast(tot))
        .select(
            "source", "term", "c_st", "c_g",
            F.round(
                (F.col("c_st") / F.col("src_n")) / (F.col("c_g") / F.col("n")), 6
            ).alias("lift"),
        )
    )
    w = Window.partitionBy("source").orderBy(F.col("lift").desc(), "term")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("source", "term", "c_st", "c_g", "lift")
    )


# --- HyperLogLog vocabulary cardinality --------------------------------------

HLL_M = 256  # 2^8 registers: bucket = first two md5 hex digits


HLL_DISTINCT_ORACLE = f"""
WITH {TOK_CTE},
ex AS (
    SELECT UNNEST(CASE WHEN len(toks) >= 3
        THEN list_transform(range(1, len(toks) - 1),
                            i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
        ELSE CAST([] AS VARCHAR[]) END) AS t
    FROM tok),
hx AS (SELECT md5(t) AS h FROM ex),
parts AS (
    SELECT (instr('0123456789abcdef', substr(h, 1, 1)) - 1) * 16
         + (instr('0123456789abcdef', substr(h, 2, 1)) - 1) AS bucket,
           substr(h, 3, 12) AS rest
    FROM hx
), lzd AS (
    SELECT bucket, rest,
           length(regexp_extract(rest, '^0*')) AS lz,
           (instr('0123456789abcdef',
                  substr(rest, length(regexp_extract(rest, '^0*')) + 1, 1)) - 1)
               AS dval
    FROM parts
), rho AS (
    SELECT bucket,
           CASE WHEN lz = 12 THEN 49
                ELSE 4 * lz
                   + CASE WHEN dval >= 8 THEN 0
                          WHEN dval >= 4 THEN 1
                          WHEN dval >= 2 THEN 2
                          ELSE 3 END
                   + 1 END AS rho
    FROM lzd
), regs AS (SELECT bucket, MAX(rho) AS r FROM rho GROUP BY bucket),
s AS (SELECT COUNT(*) AS nb, SUM(power(2.0, -r)) AS zp FROM regs),
exact AS (SELECT CAST(COUNT(DISTINCT t) AS BIGINT) AS n_exact FROM ex),
est AS (
    SELECT n_exact,
           CASE WHEN raw <= 2.5 * {HLL_M} AND v > 0
                THEN {HLL_M}.0 * ln({HLL_M}.0 / v) ELSE raw END AS e
    FROM (SELECT n_exact,
                 (0.7213 / (1.0 + 1.079 / {HLL_M}.0)) * {HLL_M}.0 * {HLL_M}.0
                     / (zp + ({HLL_M} - nb)) AS raw,
                 {HLL_M} - nb AS v
          FROM s, exact)
)
SELECT CAST({HLL_M} AS INTEGER) AS m, n_exact,
       ROUND(e, 2) AS n_hll,
       ROUND(abs(e - n_exact) / n_exact, 4) AS rel_err
FROM est
"""


def hll_regs(docs: DataFrame) -> DataFrame:
    """(bucket, r) register table for a documents-shaped DataFrame —
    works identically on a batch table or one micro-batch
    (foreachBatch), which is what makes per-batch partial registers
    MAX-mergeable (the cms_cells analogue for the HLL; shared by
    q_hll_distinct's shape and streaming/jobs.py:stream_hll_merge)."""
    tok = docs.select(
        F.explode(word_ngrams(tokens(F.col("text")), 3)).alias("t")
    )
    h = F.md5("t")
    bucket = (F.conv(F.substring(h, 1, 2), 16, 10)).cast("int")
    rest = F.substring(h, 3, 12)
    lz = F.length(F.regexp_extract(rest, "^0*", 0))
    dval = F.conv(F.substr(rest, lz + 1, F.lit(1)), 16, 10).cast("int")
    extra = (
        F.when(dval >= 8, 0).when(dval >= 4, 1).when(dval >= 2, 2).otherwise(3)
    )
    rho = F.when(lz == 12, F.lit(49)).otherwise(4 * lz + extra + 1)
    return (
        tok.select(bucket.alias("bucket"), rho.alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("r"))
    )


@query("hll_distinct", oracle=HLL_DISTINCT_ORACLE)
def q_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog vocabulary cardinality, built from scratch so BOTH
    engines compute bit-identical registers (Spark's approx_count_distinct
    and DuckDB's approx sketches differ, so the built-ins can't be
    oracle-gated): bucket = first 2 md5 hex digits (m = 256 registers),
    rho = 1 + leading zero bits of the next 48 hash bits, registers are a
    map-combinable MAX per bucket, and the estimator (alpha_m * m^2 / sum
    2^-r, linear-counting small-range correction) runs on the 256-row
    register table. The exact COUNT(DISTINCT) rides along to report the
    realized relative error. At 100 TB this is THE shape for cardinality
    telemetry: one map pass + a 256-row agg, versus the full shuffle an
    exact distinct needs — and the register table unions across corpora
    (max per bucket), so per-source sketches merge for free."""
    # sketch the distinct word TRIGRAMS (the fixture's unigram vocabulary
    # is ~31 terms — far below the sketch's resolution; trigrams are the
    # realistic contamination-/shingle-sized value population)
    tok = load_table(spark, sf_dir, "documents").select(
        F.explode(word_ngrams(tokens(F.col("text")), 3)).alias("t")
    )
    h = F.md5("t")
    bucket = (F.conv(F.substring(h, 1, 2), 16, 10)).cast("int")
    rest = F.substring(h, 3, 12)
    lz = F.length(F.regexp_extract(rest, "^0*", 0))
    dval = F.conv(F.substr(rest, lz + 1, F.lit(1)), 16, 10).cast("int")
    extra = (
        F.when(dval >= 8, 0)
        .when(dval >= 4, 1)
        .when(dval >= 2, 2)
        .otherwise(3)
    )
    rho = F.when(lz == 12, F.lit(49)).otherwise(4 * lz + extra + 1)
    regs = (
        tok.select(bucket.alias("bucket"), rho.alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("r"))
    )
    s = regs.agg(
        F.count("*").alias("nb"), F.sum(F.pow(F.lit(2.0), -F.col("r"))).alias("zp")
    )
    exact = tok.agg(F.countDistinct("t").cast("long").alias("n_exact"))
    m = float(HLL_M)
    raw = (0.7213 / (1.0 + 1.079 / m)) * m * m / (
        F.col("zp") + (F.lit(HLL_M) - F.col("nb"))
    )
    v = F.lit(HLL_M) - F.col("nb")
    e = F.when((raw <= 2.5 * m) & (v > 0), m * F.log(m / v)).otherwise(raw)
    return (
        s.crossJoin(exact)
        .select(
            F.lit(HLL_M).cast("int").alias("m"),
            "n_exact",
            F.round(e, 2).alias("n_hll"),
            F.round(F.abs(e - F.col("n_exact")) / F.col("n_exact"), 4).alias(
                "rel_err"
            ),
        )
    )


# --- Bloom-filter membership: build + probe with measured FP rate ------------

BLOOM_K = 3  # salted hash functions; m = 65536 bits (4 md5 hex digits)

_HEXD = "(instr('0123456789abcdef', substr({h}, {i}, 1)) - 1)"


def _pos16_sql(val: str, salt: int) -> str:
    """16-bit bloom position: first 4 hex digits of md5('s<salt>:' || v)."""
    h = f"md5('s{salt}:' || {val})"
    return (
        "("
        + " + ".join(
            _HEXD.format(h=h, i=i + 1) + f" * {16 ** (3 - i)}" for i in range(4)
        )
        + ")"
    )


@query(
    "bloom_membership",
    oracle=f"""
WITH {TOK_CTE},
tri AS (
    SELECT doc_id,
           UNNEST(list_distinct(CASE WHEN len(toks) >= 3
               THEN list_transform(range(1, len(toks) - 1),
                   i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
               ELSE CAST([] AS VARCHAR[]) END)) AS t
    FROM tok
), corpus_t AS (
    SELECT DISTINCT t FROM tri WHERE doc_id % 2 = 0
), bits AS (
    SELECT DISTINCT pos FROM (
        {" UNION ALL ".join(f"SELECT {_pos16_sql('t', s)} AS pos FROM corpus_t" for s in range(3))}
    )
), probes AS (
    SELECT p.t, CASE WHEN c.t IS NOT NULL THEN 1 ELSE 0 END AS member
    FROM (SELECT DISTINCT t FROM tri) p LEFT JOIN corpus_t c ON c.t = p.t
), probe_pos AS (
    {" UNION ALL ".join(f"SELECT t, member, {_pos16_sql('t', s)} AS pos FROM probes" for s in range(3))}
), hits AS (
    SELECT pp.t, pp.member,
           CAST(COUNT(b.pos) AS BIGINT) AS n_hit
    FROM probe_pos pp LEFT JOIN bits b ON b.pos = pp.pos
    GROUP BY pp.t, pp.member
)
SELECT CAST(COUNT(*) AS BIGINT)                                   AS n_probes,
       CAST(SUM(member) AS BIGINT)                                AS n_members,
       CAST(SUM(CASE WHEN n_hit = {BLOOM_K} THEN 1 ELSE 0 END) AS BIGINT)
                                                                  AS n_positive,
       CAST(SUM(CASE WHEN n_hit = {BLOOM_K} AND member = 0
                THEN 1 ELSE 0 END) AS BIGINT)                      AS n_false_pos,
       ROUND(CAST(SUM(CASE WHEN n_hit = {BLOOM_K} AND member = 0
                      THEN 1 ELSE 0 END) AS DOUBLE)
             / NULLIF(COUNT(*) - SUM(member), 0), 6)               AS fp_rate
FROM hits
""",
)
def q_bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom filter as data: build a 65,536-bit / {BLOOM_K}-hash filter over
    the even-doc trigram set, probe it with EVERY distinct trigram, and
    measure the realized false-positive rate against exact membership —
    the primitive behind runtime join pruning (Spark's own
    spark.sql.optimizer.runtime.bloomFilter) and cross-corpus contamination
    pre-screens, made oracle-checkable by building the filter from salted
    md5 prefixes instead of engine-private hashes (the first 4 hex digits
    ARE the 16-bit position — no modulo). Scale shape: the bit table is
    DISTINCT positions (bounded by m = 65,536 rows however big the corpus),
    so the probe join broadcasts a bitmap-sized relation; build and probe
    are each one hash agg. No bloom positive can be a false negative by
    construction — the test pins positives ⊇ members."""
    tri = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.explode(F.array_distinct(word_ngrams(tokens(F.col("text")), 3))).alias("t"),
    )
    corpus_t = tri.filter(F.col("doc_id") % 2 == 0).select("t").distinct()

    def pos16(salt: int) -> F.Column:
        h = F.md5(F.concat(F.lit(f"s{salt}:"), F.col("t")))
        return F.conv(F.substring(h, 1, 4), 16, 10).cast("int")

    positions = F.array(*[pos16(s) for s in range(BLOOM_K)])
    bits = corpus_t.select(F.explode(positions).alias("pos")).distinct()
    probes = (
        tri.select("t")
        .distinct()
        .join(corpus_t.withColumn("member", F.lit(1)), "t", "left")
        .select("t", F.coalesce("member", F.lit(0)).alias("member"))
    )
    probe_pos = probes.select("t", "member", F.explode(positions).alias("pos"))
    hits = (
        probe_pos.join(F.broadcast(bits.withColumn("__b", F.lit(1))), "pos", "left")
        .groupBy("t", "member")
        .agg(F.count("__b").cast("long").alias("n_hit"))
    )
    positive = (F.col("n_hit") == BLOOM_K).cast("int")
    fp = (positive == 1).cast("int") * (1 - F.col("member"))
    return hits.agg(
        F.count("*").cast("long").alias("n_probes"),
        F.sum("member").cast("long").alias("n_members"),
        F.sum(positive).cast("long").alias("n_positive"),
        F.sum(fp).cast("long").alias("n_false_pos"),
        F.round(
            F.sum(fp).cast("double")
            / F.nullif(
                (F.count("*") - F.sum("member")).cast("double"), F.lit(0.0)
            ),
            6,
        ).alias("fp_rate"),
    )


@query(
    "hll_merge_sources",
    oracle=f"""
WITH {TOK_CTE},
ex AS (
    SELECT source,
           UNNEST(CASE WHEN len(toks) >= 3
               THEN list_transform(range(1, len(toks) - 1),
                   i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
               ELSE CAST([] AS VARCHAR[]) END) AS t
    FROM tok),
hx AS (SELECT source, md5(t) AS h FROM ex),
parts AS (
    SELECT source,
           (instr('0123456789abcdef', substr(h, 1, 1)) - 1) * 16
         + (instr('0123456789abcdef', substr(h, 2, 1)) - 1) AS bucket,
           substr(h, 3, 12) AS rest
    FROM hx
), lzd AS (
    SELECT source, bucket,
           length(regexp_extract(rest, '^0*')) AS lz,
           (instr('0123456789abcdef',
                  substr(rest, length(regexp_extract(rest, '^0*')) + 1, 1)) - 1)
               AS dval
    FROM parts
), rho AS (
    SELECT source, bucket,
           CASE WHEN lz = 12 THEN 49
                ELSE 4 * lz
                   + CASE WHEN dval >= 8 THEN 0
                          WHEN dval >= 4 THEN 1
                          WHEN dval >= 2 THEN 2
                          ELSE 3 END
                   + 1 END AS rho
    FROM lzd
), src_regs AS (
    SELECT source, bucket, MAX(rho) AS r FROM rho GROUP BY source, bucket
), all_regs AS (
    SELECT source, bucket, r FROM src_regs
    UNION ALL
    SELECT '__merged__' AS source, bucket, MAX(r) AS r
    FROM src_regs GROUP BY bucket
), s AS (
    SELECT source, COUNT(*) AS nb, SUM(power(2.0, -r)) AS zp
    FROM all_regs GROUP BY source
)
SELECT source,
       ROUND(CASE WHEN raw <= 2.5 * {HLL_M} AND v > 0
                  THEN {HLL_M}.0 * ln({HLL_M}.0 / v) ELSE raw END, 2) AS n_hll
FROM (SELECT source,
             (0.7213 / (1.0 + 1.079 / {HLL_M}.0)) * {HLL_M}.0 * {HLL_M}.0
                 / (zp + ({HLL_M} - nb)) AS raw,
             {HLL_M} - nb AS v
      FROM s)
""",
)
def q_hll_merge_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeability — the property that makes sketches a 100 TB tool:
    per-source HLL register tables (max rho per (source, bucket)) UNION a
    '__merged__' row built by MAX-merging those per-source registers. The
    merged registers are PROVABLY identical to sketching the union corpus
    directly (max is associative/commutative/idempotent), so per-corpus
    sketches computed by independent jobs — or stored as 256-row tables in
    a metadata catalog — combine into exact global estimates without
    touching the data again; the invariant is pinned against
    ``hll_distinct``'s global estimate by test. Scale shape: one map pass,
    a (source, bucket) hash agg, and a 256-rows-per-source re-agg."""
    tok = load_table(spark, sf_dir, "documents").select(
        "source", F.explode(word_ngrams(tokens(F.col("text")), 3)).alias("t")
    )
    h = F.md5("t")
    bucket = F.conv(F.substring(h, 1, 2), 16, 10).cast("int")
    rest = F.substring(h, 3, 12)
    lz = F.length(F.regexp_extract(rest, "^0*", 0))
    dval = F.conv(F.substr(rest, lz + 1, F.lit(1)), 16, 10).cast("int")
    extra = (
        F.when(dval >= 8, 0).when(dval >= 4, 1).when(dval >= 2, 2).otherwise(3)
    )
    rho = F.when(lz == 12, F.lit(49)).otherwise(4 * lz + extra + 1)
    src_regs = (
        tok.select("source", bucket.alias("bucket"), rho.alias("rho"))
        .groupBy("source", "bucket")
        .agg(F.max("rho").alias("r"))
    )
    merged = (
        src_regs.groupBy("bucket")
        .agg(F.max("r").alias("r"))
        .select(F.lit("__merged__").alias("source"), "bucket", "r")
    )
    all_regs = src_regs.unionByName(merged)
    s = all_regs.groupBy("source").agg(
        F.count("*").alias("nb"),
        F.sum(F.pow(F.lit(2.0), -F.col("r"))).alias("zp"),
    )
    m = float(HLL_M)
    raw = (0.7213 / (1.0 + 1.079 / m)) * m * m / (
        F.col("zp") + (F.lit(HLL_M) - F.col("nb"))
    )
    v = F.lit(HLL_M) - F.col("nb")
    e = F.when((raw <= 2.5 * m) & (v > 0), m * F.log(m / v)).otherwise(raw)
    return s.select("source", F.round(e, 2).alias("n_hll"))


# --- Count-Min sketch term frequencies ---------------------------------------

CMS_W = 64   # counters per hash row (collisions intended at ~900 bigrams)
CMS_D = 4    # independent hash rows; estimate = min over rows
CMS_TOP = 20


def cms_pos(d, t):
    """Cell position of term ``t`` in hash row ``d`` — md5-derived, the
    shared primitive of the batch sketch build, the top-K probe, and the
    streaming cell merge (streaming/jobs.py:stream_cms_merge)."""
    h = F.md5(F.concat(d.cast("string"), F.lit(":"), t))
    return (F.conv(F.substring(h, 1, 12), 16, 10).cast("long") % CMS_W).alias("pos")


def cms_cells(docs: DataFrame) -> DataFrame:
    """(d, pos) row per (bigram occurrence x hash row) for a documents-
    shaped DataFrame — works identically on a batch table or one
    micro-batch (foreachBatch), which is what makes per-batch partial
    sketches CELL-WISE ADDITIVE."""
    big = docs.select(F.explode(word_ngrams(tokens(F.col("text")), 2)).alias("t"))
    depths = F.explode(F.sequence(F.lit(0), F.lit(CMS_D - 1))).alias("d")
    return big.select("t", depths).select("d", cms_pos(F.col("d"), F.col("t")))


# the sketch-cell pipeline as oracle CTEs (shared by cms_term_freq and the
# streaming merge oracle)
CMS_SKETCH_CTES = f"""{TOK_CTE},
big AS (
    SELECT UNNEST(CASE WHEN len(toks) >= 2
        THEN list_transform(range(1, len(toks)),
                            i -> toks[i] || ' ' || toks[i+1])
        ELSE CAST([] AS VARCHAR[]) END) AS t
    FROM tok),
dd AS (SELECT * FROM (VALUES (0), (1), (2), (3)) v(d)),
cells AS (
    SELECT b.t, dd.d,
           ('0x' || substr(md5(dd.d || ':' || b.t), 1, 12))::BIGINT % {CMS_W} AS pos
    FROM big b CROSS JOIN dd
), sketch AS (
    SELECT d, pos, CAST(COUNT(*) AS BIGINT) AS c FROM cells GROUP BY d, pos
)"""


@query(
    "cms_term_freq",
    oracle=f"""
WITH {TOK_CTE},
big AS (
    SELECT UNNEST(CASE WHEN len(toks) >= 2
        THEN list_transform(range(1, len(toks)),
                            i -> toks[i] || ' ' || toks[i+1])
        ELSE CAST([] AS VARCHAR[]) END) AS t
    FROM tok),
dd AS (SELECT * FROM (VALUES (0), (1), (2), (3)) v(d)),
cells AS (
    SELECT b.t, dd.d,
           ('0x' || substr(md5(dd.d || ':' || b.t), 1, 12))::BIGINT % {CMS_W} AS pos
    FROM big b CROSS JOIN dd
), sketch AS (
    SELECT d, pos, CAST(COUNT(*) AS BIGINT) AS c FROM cells GROUP BY d, pos
), exact AS (
    SELECT t, CAST(COUNT(*) AS BIGINT) AS c_exact FROM big GROUP BY t
), top AS (
    SELECT * FROM exact ORDER BY c_exact DESC, t LIMIT {CMS_TOP}
), est AS (
    SELECT tp.t, MIN(s.c) AS cms_est
    FROM top tp CROSS JOIN dd
    JOIN sketch s
      ON s.d = dd.d
     AND s.pos = ('0x' || substr(md5(dd.d || ':' || tp.t), 1, 12))::BIGINT % {CMS_W}
    GROUP BY tp.t
)
SELECT tp.t AS term, tp.c_exact, e.cms_est,
       e.cms_est - tp.c_exact AS overest
FROM top tp JOIN est e ON e.t = tp.t
""",
)
def q_cms_term_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan 2005) term-frequency
    estimation — the third mergeable sketch next to ``hll_distinct``
    (cardinality) and ``bloom_membership`` (membership): a D x W counter
    grid where each of D independent md5-derived hash rows increments one
    of W cells per occurrence, and a term's estimate is the MIN over its D
    cells — never an underestimate, biased up only by collisions (the
    fixture's ~900 bigrams over W=64 cells collide on purpose so the
    overestimate column is non-trivial; the oracle proves both engines
    agree cell-for-cell). Built from scratch like the HLL so both engines
    compute bit-identical counters.

    100-TB shape: the sketch build is a map-combinable count at (d, pos)
    grain — D·W = {CMS_D}·{CMS_W} bounded rows regardless of corpus, the
    telemetry shape for per-shard frequency monitoring; sketches from
    different shards MERGE by cell-wise addition. The top-K exact side
    (here to report realized error) is TakeOrderedAndProject; the
    estimate probe broadcasts the bounded sketch."""
    # r16 (guide §1.2 don't-compute-what-you-throw-away): the sketch was
    # built by exploding every bigram OCCURRENCE x D depths and md5-ing
    # each (~4 md5/occurrence, corpus-scale), then counting cells — but
    # a cell count is just the sum of the exact per-term counts landing
    # in it, and the exact counts are ALREADY computed for the error
    # readout. Aggregate once at term grain (map-combinable, the one
    # corpus-scale pass), then hash only the VOCABULARY x D (bounded)
    # into cells weighted by c_exact: bit-identical counters, md5 calls
    # drop from occurrence-scale to vocabulary-scale. The former
    # MEMORY_AND_DISK persist of the exploded occurrence stream is gone
    # too — its cache write cost more than the two sub-second
    # recomputes it saved (measured: 4.5 -> 3.2 s before this replan);
    # the persisted table is now the ~|V|-row exact table.
    big = (
        load_table(spark, sf_dir, "documents")
        .select(F.explode(word_ngrams(tokens(F.col("text")), 2)).alias("t"))
    )
    depths = F.explode(F.sequence(F.lit(0), F.lit(CMS_D - 1))).alias("d")
    exact = big.groupBy("t").agg(F.count("*").cast("long").alias("c_exact")).persist()
    sketch = (
        exact.select("t", "c_exact", depths)
        .select("d", cms_pos(F.col("d"), F.col("t")), "c_exact")
        .groupBy("d", "pos")
        .agg(F.sum("c_exact").alias("c"))
    )
    top = exact.orderBy(F.desc("c_exact"), F.asc("t")).limit(CMS_TOP)
    probe = top.select("t", "c_exact", depths).select(
        "t", "c_exact", "d", cms_pos(F.col("d"), F.col("t"))
    )
    est = (
        probe.join(F.broadcast(sketch), ["d", "pos"])
        .groupBy("t", "c_exact")
        .agg(F.min("c").alias("cms_est"))
    )
    return est.select(
        F.col("t").alias("term"),
        "c_exact",
        "cms_est",
        (F.col("cms_est") - F.col("c_exact")).alias("overest"),
    )


# --- Per-source KL divergence vs the corpus term distribution ----------------

# per-term ln() is quantized to integer nano-nats (operators/lnq.py): the
# contribution p*ln(p/q) = c_st*units / (src_n*1e9) has an exact integer
# numerator, so the per-source sum needs no contribution rounding and no
# decimal-cast machinery (r11 ln-quantization rule).
_KL_LNU_SQL_ARG = "((s.c_st / st2.src_n) / (gt.c_g / t.n))"


_kl_lnu = ln_units_sql(_KL_LNU_SQL_ARG)


@query(
    "corpus_drift_kl",
    oracle=f"""
WITH {TOK_CTE},
terms AS (
    SELECT source, UNNEST(toks) AS term FROM tok
), st AS (
    SELECT source, term, CAST(COUNT(*) AS BIGINT) AS c_st
    FROM terms GROUP BY 1, 2
), src_tot AS (
    SELECT source, CAST(SUM(c_st) AS BIGINT) AS src_n FROM st GROUP BY 1
), g AS (
    SELECT term, CAST(SUM(c_st) AS BIGINT) AS c_g FROM st GROUP BY 1
), tot AS (SELECT CAST(SUM(c_g) AS BIGINT) AS n FROM g),
contrib AS (
    SELECT s.source, st2.src_n,
           CAST(s.c_st AS HUGEINT) * {_kl_lnu} AS prod
    FROM st s
    JOIN src_tot st2 USING (source)
    JOIN g gt USING (term)
    CROSS JOIN tot t
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_terms,
       ROUND(CAST(SUM(prod) AS DOUBLE) / CAST(src_n AS DOUBLE)
             / {LN_UNIT_SCALE}.0, 8) AS kl_nats
FROM contrib GROUP BY source, src_n
""",
)
def q_corpus_drift_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source KL divergence of the source's term distribution from the
    whole-corpus distribution — the drift score a curation pipeline
    monitors per shard/crawl-slice (``cusum_drift`` is the numeric-stream
    sibling; ``distinctive_terms``'s lift is the per-term view, this is
    the per-source aggregate). KL(p_source || q_corpus) = sum_t p ln(p/q),
    finite by construction since every source term has corpus support.

    Determinism (r11 ln-quantization rule, operators/lnq.py): p and q
    are exact int/int divisions on bit-identical doubles; ln(p/q) is
    quantized to integer nano-nats, making each contribution's numerator
    c_st*units an exact integer — the per-source sum is associative
    integer math and the single readout division+round runs on
    bit-identical doubles in both engines.

    100-TB shape: one (source, term) count agg (map-combinable), tiny
    broadcast totals, then a per-source sum — the shuffle carries the
    distinct (source, term) vocabulary, never the token stream."""
    terms = load_table(spark, sf_dir, "documents").select(
        "source", F.explode(tokens(F.col("text"))).alias("term")
    )
    st = (
        terms.groupBy("source", "term")
        .agg(F.count("*").cast("long").alias("c_st"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    src_tot = st.groupBy("source").agg(F.sum("c_st").cast("long").alias("src_n"))
    g = st.groupBy("term").agg(F.sum("c_st").cast("long").alias("c_g"))
    tot = g.agg(F.sum("c_g").cast("long").alias("n"))
    p = F.col("c_st") / F.col("src_n")
    q = F.col("c_g") / F.col("n")
    contrib = (
        st.join(F.broadcast(src_tot), "source")
        .join(g, "term")
        .crossJoin(F.broadcast(tot))
        .select(
            "source",
            "src_n",
            (F.col("c_st").cast("decimal(38,0)") * ln_units(p / q)).alias(
                "prod"
            ),
        )
    )
    return (
        contrib.groupBy("source", "src_n")
        .agg(
            F.count("*").cast("long").alias("n_terms"),
            F.round(
                F.sum("prod").cast("double")
                / F.col("src_n").cast("double")
                / F.lit(LN_UNIT_SCALE_F),
                8,
            ).alias("kl_nats"),
        )
        .drop("src_n")
    )


# --- Length-bucketed batching (padding-waste telemetry) ----------------------

LBB_STEP = 16  # bucket granularity in tokens (pad-to-multiple-of-16)


@query(
    "length_bucket_batching",
    oracle=f"""
WITH {TOK_CTE},
lens AS (
    SELECT CAST(len(toks) AS BIGINT) AS n_tok FROM tok
), b AS (
    SELECT GREATEST(((n_tok + {LBB_STEP - 1}) // {LBB_STEP}) * {LBB_STEP},
                    {LBB_STEP}) AS bucket_cap,
           n_tok
    FROM lens
), g AS (
    SELECT CAST(MAX(bucket_cap) AS BIGINT) AS gmax FROM b
), agg AS (
    SELECT bucket_cap,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS sum_tok,
           CAST(MAX(n_tok) AS BIGINT) AS max_tok
    FROM b GROUP BY 1
)
SELECT bucket_cap, n_docs, sum_tok, max_tok,
       n_docs * bucket_cap - sum_tok AS pad_waste,
       ROUND((n_docs * bucket_cap - sum_tok)
             / CAST(n_docs * bucket_cap AS DOUBLE), 8) AS waste_pct,
       n_docs * (g.gmax - bucket_cap) AS cells_saved
FROM agg CROSS JOIN g
""",
)
def q_length_bucket_batching(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed batching telemetry: assign every document to a
    pad-to-multiple-of-{LBB_STEP} token bucket and report, per bucket,
    the padding waste of batching at the bucket boundary and the cells
    saved vs padding the whole corpus to its global max — the standard
    accounting an inference/training batcher runs before choosing bucket
    boundaries (``sequence_packing`` is the greedy-fill sibling; this is
    the static-shape / XLA-friendly policy).

    Every measure is exact int64 arithmetic off one map-combinable
    (bucket) aggregate; the single double division (waste fraction) is
    one IEEE op on exact ints — bit-stable under any partitioning. The
    global max re-enters as a broadcast scalar.

    100-TB shape: one documents scan -> per-row tokenize + bucket id ->
    hash agg on a bounded bucket key (seq-len range / {LBB_STEP} distinct
    groups); nothing retains per-doc state."""
    lens = load_table(spark, sf_dir, "documents").select(
        F.size(tokens(F.col("text"))).cast("long").alias("n_tok")
    )
    b = lens.select(
        F.greatest(
            F.expr(f"((n_tok + {LBB_STEP - 1}) DIV {LBB_STEP}) * {LBB_STEP}"),
            F.lit(LBB_STEP).cast("long"),
        ).alias("bucket_cap"),
        "n_tok",
    )
    g = b.agg(F.max("bucket_cap").cast("long").alias("gmax"))
    agg = b.groupBy("bucket_cap").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_tok").cast("long").alias("sum_tok"),
        F.max("n_tok").cast("long").alias("max_tok"),
    )
    padded = F.col("n_docs") * F.col("bucket_cap")
    return agg.crossJoin(F.broadcast(g)).select(
        "bucket_cap",
        "n_docs",
        "sum_tok",
        "max_tok",
        (padded - F.col("sum_tok")).alias("pad_waste"),
        F.round((padded - F.col("sum_tok")) / padded.cast("double"), 8).alias(
            "waste_pct"
        ),
        (F.col("n_docs") * (F.col("gmax") - F.col("bucket_cap"))).alias(
            "cells_saved"
        ),
    )


# --- PMI collocations (rational lift ranking — no transcendentals) -----------

PMI_MIN_CNT = 5    # bigram frequency floor (kills hapax noise)
PMI_TOP = 100      # global top-K by lift


@query(
    "pmi_collocations",
    oracle=f"""
WITH {TOK_CTE},
bg AS (
    SELECT unnest(CASE WHEN len(toks) >= 2
               THEN list_transform(range(1, len(toks)),
                                   i -> toks[i] || ' ' || toks[i+1])
               ELSE CAST([] AS VARCHAR[]) END) AS gram
    FROM tok
), bgc AS (
    SELECT string_split(gram, ' ')[1] AS w1,
           string_split(gram, ' ')[2] AS w2,
           CAST(COUNT(*) AS BIGINT) AS c_xy
    FROM bg GROUP BY 1, 2
), uni AS (
    SELECT unnest(toks) AS w FROM tok
), uc AS (
    SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM uni GROUP BY 1
), n AS (
    SELECT CAST(SUM(c) AS BIGINT) AS total FROM uc
), scored AS (
    SELECT b.w1, b.w2, b.c_xy, u1.c AS c_x, u2.c AS c_y,
           ROUND(b.c_xy * CAST(n.total AS DOUBLE) / (u1.c * CAST(u2.c AS DOUBLE)),
                 8) AS lift
    FROM bgc b
    JOIN uc u1 ON u1.w = b.w1
    JOIN uc u2 ON u2.w = b.w2
    CROSS JOIN n
    WHERE b.c_xy >= {PMI_MIN_CNT}
), rk AS (
    SELECT *, ROW_NUMBER() OVER (ORDER BY lift DESC, w1, w2) AS rnk
    FROM scored
)
SELECT w1, w2, c_xy, c_x, c_y, lift, CAST(rnk AS INTEGER) AS rnk
FROM rk WHERE rnk <= {PMI_TOP}
""",
)
def q_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{PMI_TOP} collocations by pointwise-mutual-information RANK —
    the phrase-mining pass (Church & Hanks 1990) a corpus pipeline runs
    to find multi-word units worth single tokens. PMI = log of
    N*c(x,y) / (c(x)*c(y)); since log is monotone the ranking uses the
    RATIONAL lift directly — both engines evaluate one IEEE division on
    exact integer counts, and NO engine evaluates a transcendental (the
    frozen-literal lesson from ndcg_eval, applied by reformulation).

    100-TB shape: bigram and unigram counts are map-combinable hash
    aggregates over the token stream (the heavy shuffle, vocabulary-
    grain); the unigram re-joins are vocabulary-sized; the final
    ROW_NUMBER is unpartitioned BUT runs over the frequency-floored
    collocation table (c_xy >= {PMI_MIN_CNT}) — vocabulary²-bounded and
    frequency-thinned, the ``bpe_merge_pairs`` precedent; at an
    unbounded vocabulary you would pre-thin with a per-bucket top-K
    before the global one."""
    d = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    bg = d.select(
        F.explode(word_ngrams(toks, 2)).alias("gram")
    ).select(
        F.split(F.col("gram"), " ").getItem(0).alias("w1"),
        F.split(F.col("gram"), " ").getItem(1).alias("w2"),
    )
    bgc = bg.groupBy("w1", "w2").agg(F.count("*").cast("long").alias("c_xy"))
    uni = d.select(F.explode(toks).alias("w"))
    uc = uni.groupBy("w").agg(F.count("*").cast("long").alias("c")).persist()
    n = uc.agg(F.sum("c").cast("long").alias("total"))
    u1 = uc.select(F.col("w").alias("w1"), F.col("c").alias("c_x"))
    u2 = uc.select(F.col("w").alias("w2"), F.col("c").alias("c_y"))
    scored = (
        bgc.where(F.col("c_xy") >= PMI_MIN_CNT)
        .join(F.broadcast(u1), "w1")
        .join(F.broadcast(u2), "w2")
        .crossJoin(F.broadcast(n))
        .select(
            "w1",
            "w2",
            "c_xy",
            "c_x",
            "c_y",
            F.round(
                F.col("c_xy")
                * F.col("total").cast("double")
                / (F.col("c_x") * F.col("c_y").cast("double")),
                8,
            ).alias("lift"),
        )
    )
    w = bounded_window(
        F.desc("lift"), "w1", "w2",
        bound="bigram aggregate thresholded by PMI_MIN_PAIR: vocab-bounded",
        queries=("pmi_collocations",),
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("int"))
        .where(F.col("rnk") <= PMI_TOP)
    )


# --- Tokenizer vocabulary build (frequency-cutoff dictionary encoding) -------

VOCAB_MIN_TF = 20   # min corpus frequency for a vocabulary entry


@query(
    "vocab_build",
    oracle=f"""
WITH {TOK_CTE},
t AS (SELECT doc_id, unnest(toks) AS token FROM tok),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_tok FROM t),
tf AS (
    SELECT token,
           CAST(COUNT(*) AS BIGINT)            AS tf,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
    FROM t GROUP BY 1
    HAVING COUNT(*) >= {VOCAB_MIN_TF}
)
SELECT token,
       CAST(ROW_NUMBER() OVER (ORDER BY tf DESC, token) AS BIGINT) AS token_id,
       tf, df,
       ROUND(CAST(SUM(tf) OVER (ORDER BY tf DESC, token
                                ROWS UNBOUNDED PRECEDING) AS DOUBLE)
             / (SELECT n_tok FROM tot), 8) AS cum_coverage
FROM tf
""",
)
def q_vocab_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-vocabulary construction — the dictionary-encoding step a
    training pipeline runs before numericalising text: corpus term
    frequencies, a min-frequency cutoff (tf >= {VOCAB_MIN_TF}; everything
    below becomes OOV at encode time), contiguous ids by (tf DESC, token)
    rank, and each entry's CUMULATIVE token coverage (what fraction of all
    corpus tokens the vocabulary explains through this id — the curve that
    sizes the vocab).

    Scale shape: tf/df is one map-combinable hash aggregate at token
    grain; the cutoff then shrinks it to the vocabulary, and only THAT
    aggregate feeds the ranking window (a real vocabulary is 1e4-1e6
    entries — post-aggregate grain, orders of magnitude under the corpus;
    same bounded argument as bpe_merge_pairs' pair table). The id rank
    and the coverage running sum share one window sort. Coverage divides
    two exact longs once, rounded 8 — engine-stable."""
    from ..operators.text import tokens

    d = load_table(spark, sf_dir, "documents")
    t = d.select("doc_id", F.explode(tokens(F.col("text"))).alias("token"))
    tot = t.agg(F.count("*").cast("long").alias("n_tok"))
    tf = (
        t.groupBy("token")
        .agg(
            F.count("*").cast("long").alias("tf"),
            F.count_distinct("doc_id").cast("long").alias("df"),
        )
        .where(F.col("tf") >= VOCAB_MIN_TF)
    )
    w = bounded_window(
        F.desc("tf"), F.asc("token"),
        bound="post-cutoff vocabulary aggregate: <= |tokens with tf >= "
              f"{VOCAB_MIN_TF}|, corpus/{VOCAB_MIN_TF} at worst, ~1e4-1e6 real",
        queries=("vocab_build",),
    )
    return (
        tf.crossJoin(F.broadcast(tot))
        .select(
            "token",
            F.row_number().over(w).cast("long").alias("token_id"),
            "tf",
            "df",
            F.round(
                F.sum("tf")
                .over(w.rowsBetween(Window.unboundedPreceding, 0))
                .cast("double")
                / F.col("n_tok"),
                8,
            ).alias("cum_coverage"),
        )
    )


# --- Multinomial naive Bayes language classifier ----------------------------

NB_MIN_DF = 3    # train-split document frequency floor for the vocabulary
# class-prior and token-likelihood ln() quantized to integer nano-nats
# (operators/lnq.py, r11 rule): every class score is exact integer math
# (HUGEINT/decimal38 sums), so the argmax needs no contribution rounding
_NB_PRIOR_LNU = ln_units_sql("p.docs / CAST(t.nd AS DOUBLE)")
_NB_TOKEN_LNU = ln_units_sql(
    "(COALESCE(m.c, 0) + 1) / CAST(ct.n_l + vs.v AS DOUBLE)"
)


@query(
    "naive_bayes_classify",
    oracle=f"""
WITH {TOK_CTE.strip()},
split AS (
    SELECT doc_id, lang, toks, CAST(doc_id % 5 = 0 AS INT) AS is_test
    FROM tok
), train_tok AS (
    SELECT s.doc_id, s.lang, t.tok
    FROM split s, UNNEST(s.toks) AS t(tok) WHERE s.is_test = 0
), vocab AS (
    SELECT tok FROM (
        SELECT tok, COUNT(DISTINCT doc_id) AS df FROM train_tok GROUP BY 1
    ) WHERE df >= {NB_MIN_DF}
), vsize AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS v FROM vocab
), model AS (
    SELECT tt.lang, tt.tok, CAST(COUNT(*) AS BIGINT) AS c
    FROM train_tok tt JOIN vocab v ON v.tok = tt.tok
    GROUP BY 1, 2
), ctot AS (
    SELECT lang, CAST(SUM(c) AS BIGINT) AS n_l FROM model GROUP BY 1
), prior AS (
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS docs
    FROM split WHERE is_test = 0 GROUP BY 1
), ptot AS (
    SELECT CAST(SUM(docs) AS BIGINT) AS nd FROM prior
), classes AS (
    SELECT p.lang,
           CAST({_NB_PRIOR_LNU} AS HUGEINT) AS logprior
    FROM prior p CROSS JOIN ptot t
), test_cnt AS (
    SELECT x.doc_id, x.tok, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
        SELECT s.doc_id, t.tok
        FROM split s, UNNEST(s.toks) AS t(tok) WHERE s.is_test = 1
    ) x JOIN vocab v ON v.tok = x.tok GROUP BY 1, 2
), terms AS (
    SELECT tc.doc_id, c.lang,
           CAST(tc.cnt AS HUGEINT) * {_NB_TOKEN_LNU} AS term
    FROM test_cnt tc
    CROSS JOIN classes c
    LEFT JOIN model m ON m.lang = c.lang AND m.tok = tc.tok
    JOIN ctot ct ON ct.lang = c.lang
    CROSS JOIN vsize vs
), docscore AS (
    SELECT doc_id, lang, SUM(term) AS ll FROM terms GROUP BY 1, 2
), scored AS (
    SELECT s.doc_id, s.lang AS lang_actual, c.lang AS cand,
           c.logprior + COALESCE(d.ll, CAST(0 AS HUGEINT)) AS score
    FROM split s
    CROSS JOIN classes c
    LEFT JOIN docscore d ON d.doc_id = s.doc_id AND d.lang = c.lang
    WHERE s.is_test = 1
), best AS (
    SELECT doc_id, lang_actual, cand AS lang_pred,
           ROW_NUMBER() OVER (PARTITION BY doc_id
                              ORDER BY score DESC, cand) AS rn
    FROM scored
)
SELECT lang_actual, lang_pred, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM best WHERE rn = 1 GROUP BY 1, 2
""",
)
def q_naive_bayes_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial naive Bayes language ID, trained and applied in one
    dataflow: docs split 80/20 by ``doc_id % 5`` (deterministic, no RNG),
    a df >= {NB_MIN_DF} vocabulary, Laplace-smoothed per-class token
    log-likelihoods, and an argmax over class scores on the held-out
    split — emitted as the confusion matrix (actual x predicted doc
    counts), the eval artifact every classifier pipeline materializes.

    Determinism (r11 ln-quantization rule): the two transcendentals
    (class prior and token likelihood ln) are quantized to integer
    nano-nats; each doc-token-class contribution count x units and the
    per-doc score are exact integer sums (HUGEINT / decimal38), so the
    argmax (ties broken by class name) is engine-exact with no
    contribution rounding at all.

    100-TB shape: the model is a (class x vocab-token) aggregate —
    df-thresholded, so it broadcasts into the scoring join; test docs
    fan out only by |classes| (bounded, 5 here) and join the model on
    token. No global sort anywhere; OOV tokens drop at the vocab join
    exactly as a bounded-vocab production classifier drops them."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", tokens(F.col("text")).alias("toks"),
        (F.col("doc_id") % 5 == 0).cast("int").alias("is_test"),
    )
    train_tok = (
        docs.where(F.col("is_test") == 0)
        .select("doc_id", "lang", F.explode("toks").alias("tok"))
    )
    vocab = (
        train_tok.groupBy("tok")
        .agg(F.count_distinct("doc_id").alias("df"))
        .where(F.col("df") >= NB_MIN_DF)
        .select("tok")
        .persist()
    )
    vsize = vocab.agg(F.count("*").cast("long").alias("v"))
    model = (
        train_tok.join(vocab, "tok")
        .groupBy("lang", "tok")
        .agg(F.count("*").cast("long").alias("c"))
        .persist()
    )
    ctot = model.groupBy("lang").agg(F.sum("c").cast("long").alias("n_l"))
    prior = (
        docs.where(F.col("is_test") == 0)
        .groupBy("lang")
        .agg(F.count("*").cast("long").alias("docs"))
    )
    ptot = prior.agg(F.sum("docs").cast("long").alias("nd"))
    classes = prior.crossJoin(F.broadcast(ptot)).select(
        "lang",
        ln_units(F.col("docs") / F.col("nd").cast("double"))
        .cast("decimal(38,0)")
        .alias("logprior"),
    )
    test_cnt = (
        docs.where(F.col("is_test") == 1)
        .select("doc_id", F.explode("toks").alias("tok"))
        .join(vocab, "tok")
        .groupBy("doc_id", "tok")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    terms = (
        test_cnt.crossJoin(
            F.broadcast(classes.select("lang"))
        )
        .join(F.broadcast(model), ["lang", "tok"], "left")
        .join(F.broadcast(ctot), "lang")
        .crossJoin(F.broadcast(vsize))
        .select(
            "doc_id",
            "lang",
            (
                F.col("cnt").cast("decimal(38,0)")
                * ln_units(
                    (F.coalesce(F.col("c"), F.lit(0)) + 1)
                    / (F.col("n_l") + F.col("v")).cast("double")
                )
            ).alias("term"),
        )
    )
    docscore = terms.groupBy("doc_id", "lang").agg(F.sum("term").alias("ll"))
    scored = (
        docs.where(F.col("is_test") == 1)
        .select("doc_id", F.col("lang").alias("lang_actual"))
        .crossJoin(F.broadcast(classes))
        .join(
            docscore.select(
                "doc_id", F.col("lang").alias("lang"), "ll"
            ),
            ["doc_id", "lang"],
            "left",
        )
        .select(
            "doc_id",
            "lang_actual",
            F.col("lang").alias("cand"),
            (
                F.col("logprior")
                + F.coalesce(F.col("ll"), F.lit(0).cast("decimal(38,0)"))
            ).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("cand"))
    return (
        scored.select(
            "lang_actual",
            F.col("cand").alias("lang_pred"),
            F.row_number().over(w).alias("rn"),
        )
        .where(F.col("rn") == 1)
        .groupBy("lang_actual", "lang_pred")
        .agg(F.count("*").cast("long").alias("n_docs"))
    )


# --- Chi-squared feature selection (token x language) -----------------------

CHI2_MIN_DF = 5      # corpus document-frequency floor for scored tokens
CHI2_CRIT = 3.841    # chi^2_1 critical value at p = 0.05


@query(
    "chi2_feature_selection",
    oracle=f"""
WITH {TOK_CTE.strip()},
pres AS (
    SELECT DISTINCT x.doc_id, x.lang, x.tok FROM (
        SELECT t.doc_id, t.lang, u.tok
        FROM tok t, UNNEST(t.toks) AS u(tok)
    ) x
), vocab AS (
    SELECT tok, CAST(COUNT(*) AS BIGINT) AS df
    FROM pres GROUP BY 1 HAVING COUNT(*) >= {CHI2_MIN_DF}
), nl AS (
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_l
    FROM documents GROUP BY 1
), nd AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents
), a_cnt AS (
    SELECT p.tok, p.lang, CAST(COUNT(*) AS BIGINT) AS a
    FROM pres p JOIN vocab v ON v.tok = p.tok
    GROUP BY 1, 2
), grid AS (
    SELECT v.tok, v.df, l.lang, l.n_l, COALESCE(a.a, 0) AS a, n.n
    FROM vocab v
    CROSS JOIN nl l
    CROSS JOIN nd n
    LEFT JOIN a_cnt a ON a.tok = v.tok AND a.lang = l.lang
), scored AS (
    SELECT tok, lang, a, df, n_l,
           (CAST(n AS DOUBLE)
            * ((CAST(a AS DOUBLE) * (n - df - (n_l - a))
                - (CAST(df - a AS DOUBLE) * (n_l - a)))
               * (CAST(a AS DOUBLE) * (n - df - (n_l - a))
                  - (CAST(df - a AS DOUBLE) * (n_l - a)))))
           / (CAST(df AS DOUBLE) * (n - df) * n_l * (n - n_l)) AS chi2
    FROM grid
)
SELECT tok, lang, a AS n_lang_with, df, n_l,
       ROUND(chi2, 6) AS chi2
FROM scored WHERE chi2 >= {CHI2_CRIT}
""",
)
def q_chi2_feature_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-squared (token, language) feature selection: for every token
    with corpus document frequency >= {CHI2_MIN_DF}, the one-vs-rest 2x2
    presence contingency against each language, keeping associations
    significant at p = 0.05 (chi^2 >= {CHI2_CRIT}) — the classic filter
    step before training text classifiers, and the statistical sibling
    of ``info_gain_features`` (entropy) and ``pmi_collocations``
    (pairwise lift).

    Determinism: all four contingency cells are exact int64 derived from
    (a, df, n_l, n); the chi2 expression converts to double BEFORE any
    product (so no int64 overflow at scale) through an identical IEEE
    tree in both engines, and the {CHI2_CRIT} filter + ROUND 6 operate
    on identical doubles.

    100-TB shape: one explode to DISTINCT (doc, token) presence (the
    same inverted-index grain TF-IDF builds), a map-combinable df agg
    with a HAVING floor that bounds the scored vocabulary, and a
    |vocab| x |languages| grid via broadcast of the bounded language
    dimension — no all-pairs, no sort; the significance filter keeps
    the output sparse."""
    docs = load_table(spark, sf_dir, "documents")
    pres = (
        docs.select("doc_id", "lang", F.explode(tokens(F.col("text"))).alias("tok"))
        .distinct()
        .persist()
    )
    vocab = (
        pres.groupBy("tok")
        .agg(F.count("*").cast("long").alias("df"))
        .where(F.col("df") >= CHI2_MIN_DF)
    )
    nl = docs.groupBy("lang").agg(F.count("*").cast("long").alias("n_l"))
    nd = docs.agg(F.count("*").cast("long").alias("n"))
    a_cnt = (
        pres.join(vocab.select("tok"), "tok")
        .groupBy("tok", "lang")
        .agg(F.count("*").cast("long").alias("a"))
    )
    grid = (
        vocab.crossJoin(F.broadcast(nl))
        .crossJoin(F.broadcast(nd))
        .join(a_cnt, ["tok", "lang"], "left")
        .select(
            "tok",
            "df",
            "lang",
            "n_l",
            F.coalesce(F.col("a"), F.lit(0).cast("long")).alias("a"),
            "n",
        )
    )
    a, df, n_l, n = F.col("a"), F.col("df"), F.col("n_l"), F.col("n")
    e = a.cast("double") * (n - df - (n_l - a)) - (df - a).cast("double") * (n_l - a)
    chi2 = (n.cast("double") * (e * e)) / (
        df.cast("double") * (n - df) * n_l * (n - n_l)
    )
    return (
        grid.select(
            "tok",
            "lang",
            a.alias("n_lang_with"),
            "df",
            "n_l",
            chi2.alias("chi2_raw"),
        )
        .where(F.col("chi2_raw") >= CHI2_CRIT)
        .select(
            "tok",
            "lang",
            "n_lang_with",
            "df",
            "n_l",
            F.round("chi2_raw", 6).alias("chi2"),
        )
    )


# --- Reciprocal-rank fusion of two retrieval systems ------------------------

RRF_K = 60      # the canonical RRF constant (Cormack et al. 2009)
RRF_R = 50      # per-system candidate list depth
RRF_OUT = 20    # fused results returned
RRF_DP = 12     # per-system contribution rounding before the decimal sum


@query(
    "rank_fusion_rrf",
    oracle=f"""
WITH {TOK_CTE},
q AS (SELECT unnest({[*BM25_TERMS]!r}::VARCHAR[]) AS term),
terms AS (
    SELECT doc_id, unnest(toks) AS term FROM tok
), tf AS (
    SELECT t.doc_id, t.term, CAST(COUNT(*) AS BIGINT) AS tf
    FROM terms t JOIN q ON q.term = t.term
    GROUP BY t.doc_id, t.term
), dl AS (
    SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM tok
), df AS (
    SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term
), stats AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           SUM(CAST(len(toks) AS BIGINT)) AS total_tokens
    FROM tok
), per_term AS (
    SELECT t.doc_id,
           CAST(ROUND(
               {_IDF_SQL}
               * (t.tf * ({BM25_K1} + 1))
               / (t.tf + {BM25_K1} * (1 - {BM25_B}
                   + {BM25_B} * l.dl * s.n_docs / s.total_tokens)),
               8) AS DECIMAL(18,8)) AS term_score
    FROM tf t
    JOIN dl l ON l.doc_id = t.doc_id
    JOIN df d ON d.term = t.term
    CROSS JOIN stats s
), sys_a AS (
    SELECT doc_id, CAST(ROW_NUMBER() OVER (
               ORDER BY CAST(SUM(term_score) AS DOUBLE) DESC, doc_id)
           AS BIGINT) AS rk
    FROM per_term GROUP BY doc_id
    QUALIFY rk <= {RRF_R}
), sys_b AS (
    SELECT doc_id, CAST(ROW_NUMBER() OVER (
               ORDER BY SUM(tf) DESC, doc_id) AS BIGINT) AS rk
    FROM tf GROUP BY doc_id
    QUALIFY rk <= {RRF_R}
), fused AS (
    SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
           a.rk AS rank_bm25, b.rk AS rank_tf,
           COALESCE(CAST(ROUND(1.0 / ({RRF_K} + a.rk), {RRF_DP})
                         AS DECIMAL(18,{RRF_DP})),
                    CAST(0 AS DECIMAL(18,{RRF_DP})))
           + COALESCE(CAST(ROUND(1.0 / ({RRF_K} + b.rk), {RRF_DP})
                           AS DECIMAL(18,{RRF_DP})),
                      CAST(0 AS DECIMAL(18,{RRF_DP}))) AS score
    FROM sys_a a FULL OUTER JOIN sys_b b ON b.doc_id = a.doc_id
)
SELECT doc_id, rank_bm25, rank_tf,
       ROUND(CAST(score AS DOUBLE), 8) AS rrf
FROM (
    SELECT *, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rn
    FROM fused
) WHERE rn <= {RRF_OUT}
""",
)
def q_rank_fusion_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009) of two
    retrieval systems over the fixed query — BM25 (weighted lexical) and
    raw term frequency (unweighted lexical) — the standard way hybrid
    search merges heterogeneous rankers without score normalization:
    rrf(d) = sum over systems of 1/({RRF_K} + rank_s(d)), top-{RRF_R}
    per system, top-{RRF_OUT} fused.

    Determinism: ranks are exact ints (score DESC, doc_id ties); each
    1/(k+rank) is a rounded {RRF_DP}dp DECIMAL so the 2-system sum and
    its DESC order are engine-exact; ROUND 8 readout.

    100-TB shape: each system's top-{RRF_R} comes from TakeOrdered
    (per-partition heap + driver merge — never a single-task global
    sort); rank assignment then runs on the <= {RRF_R}-row result
    (bounded_window), and the fusion join touches <= 2x{RRF_R} rows."""
    from ..operators.windows import bounded_window

    d = _docs(spark, sf_dir)
    toks = d.select("doc_id", tokens(F.col("text")).alias("toks"))
    terms = toks.select("doc_id", F.explode("toks").alias("term")).filter(
        F.col("term").isin(*BM25_TERMS)
    )
    tf = terms.groupBy("doc_id", "term").agg(F.count("*").alias("tf")).persist()
    dl = toks.select("doc_id", F.size("toks").cast("long").alias("dl"))
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    stats = toks.agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size("toks").cast("long")).alias("total_tokens"),
    )
    idf = (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    tf_part = (F.col("tf") * (BM25_K1 + 1)) / (
        F.col("tf")
        + BM25_K1
        * (1 - BM25_B + BM25_B * F.col("dl") * F.col("n_docs") / F.col("total_tokens"))
    )
    bm25 = (
        tf.join(dl, "doc_id")
        .join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            F.round(idf * tf_part, 8).cast("decimal(18,8)").alias("term_score"),
        )
        .groupBy("doc_id")
        .agg(F.sum("term_score").cast("double").alias("s"))
    )
    tfsum = tf.groupBy("doc_id").agg(F.sum("tf").alias("s"))

    def top_ranked(scored: DataFrame) -> DataFrame:
        top = scored.orderBy(F.desc("s"), F.asc("doc_id")).limit(RRF_R)
        w = bounded_window(
            F.desc("s"),
            F.asc("doc_id"),
            bound=f"TakeOrdered result: at most {RRF_R} rows",
            queries=("rank_fusion_rrf",),
        )
        return top.select(
            "doc_id", F.row_number().over(w).cast("long").alias("rk")
        )

    contrib = lambda c: F.coalesce(  # noqa: E731
        F.round(F.lit(1.0) / (F.lit(RRF_K) + c), RRF_DP).cast(
            f"decimal(18,{RRF_DP})"
        ),
        F.lit(0).cast(f"decimal(18,{RRF_DP})"),
    )
    a = top_ranked(bm25).select("doc_id", F.col("rk").alias("rank_bm25"))
    b = top_ranked(tfsum).select("doc_id", F.col("rk").alias("rank_tf"))
    fused = a.join(b, "doc_id", "full_outer").select(
        "doc_id",
        "rank_bm25",
        "rank_tf",
        (contrib(F.col("rank_bm25")) + contrib(F.col("rank_tf"))).alias("score"),
    )
    return (
        fused.orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(RRF_OUT)
        .select(
            "doc_id",
            "rank_bm25",
            "rank_tf",
            F.round(F.col("score").cast("double"), 8).alias("rrf"),
        )
    )


# --- HLL set algebra: union-merge + inclusion-exclusion intersection --------

HLL_A_LO, HLL_A_HI = 0, 9     # set A: sources src0..src9
HLL_B_LO, HLL_B_HI = 5, 14    # set B: sources src5..src14 (overlaps A)

_HLL_EST_SQL = """
    SELECT CASE WHEN raw <= 2.5 * {m} AND v > 0
                THEN {m}.0 * ln({m}.0 / v) ELSE raw END
    FROM (SELECT (0.7213 / (1.0 + 1.079 / {m}.0)) * {m}.0 * {m}.0
                     / (zp + ({m} - nb)) AS raw,
                 {m} - nb AS v
          FROM (SELECT COUNT(*) AS nb, SUM(power(2.0, -r)) AS zp
                FROM {regs}))
"""


@query(
    "hll_set_intersection",
    oracle=f"""
WITH {TOK_CTE},
ex AS (
    SELECT CAST(substr(source, 4) AS INTEGER) AS src_no,
           UNNEST(CASE WHEN len(toks) >= 3
               THEN list_transform(range(1, len(toks) - 1),
                                   i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
               ELSE CAST([] AS VARCHAR[]) END) AS t
    FROM tok
), mem AS (
    SELECT 'a' AS s, t FROM ex
    WHERE src_no BETWEEN {HLL_A_LO} AND {HLL_A_HI}
    UNION ALL
    SELECT 'b' AS s, t FROM ex
    WHERE src_no BETWEEN {HLL_B_LO} AND {HLL_B_HI}
), hx AS (
    SELECT s, md5(t) AS h FROM mem
), parts AS (
    SELECT s,
           (instr('0123456789abcdef', substr(h, 1, 1)) - 1) * 16
         + (instr('0123456789abcdef', substr(h, 2, 1)) - 1) AS bucket,
           substr(h, 3, 12) AS rest
    FROM hx
), rho AS (
    SELECT s, bucket,
           CASE WHEN lz = 12 THEN 49
                ELSE 4 * lz
                   + CASE WHEN dval >= 8 THEN 0
                          WHEN dval >= 4 THEN 1
                          WHEN dval >= 2 THEN 2
                          ELSE 3 END
                   + 1 END AS rho
    FROM (SELECT s, bucket, rest,
                 length(regexp_extract(rest, '^0*')) AS lz,
                 (instr('0123456789abcdef',
                        substr(rest, length(regexp_extract(rest, '^0*')) + 1, 1))
                      - 1) AS dval
          FROM parts)
), regs AS (
    SELECT s, bucket, MAX(rho) AS r FROM rho GROUP BY 1, 2
), regs_a AS (SELECT bucket, r FROM regs WHERE s = 'a'),
regs_b AS (SELECT bucket, r FROM regs WHERE s = 'b'),
regs_u AS (SELECT bucket, MAX(r) AS r FROM regs GROUP BY 1),
exact AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_exact_inter FROM (
        SELECT DISTINCT a.t FROM
            (SELECT DISTINCT t FROM ex
             WHERE src_no BETWEEN {HLL_A_LO} AND {HLL_A_HI}) a
        JOIN (SELECT DISTINCT t FROM ex
              WHERE src_no BETWEEN {HLL_B_LO} AND {HLL_B_HI}) b
          ON b.t = a.t
    )
)
SELECT CAST({HLL_M} AS INTEGER) AS m,
       n_exact_inter,
       ROUND(ea, 2) AS est_a,
       ROUND(eb, 2) AS est_b,
       ROUND(eu, 2) AS est_union,
       ROUND(ea + eb - eu, 2) AS est_inter,
       ROUND(abs(ea + eb - eu - n_exact_inter) / n_exact_inter, 4) AS rel_err
FROM (SELECT ({_HLL_EST_SQL.format(m=HLL_M, regs="regs_a")}) AS ea,
             ({_HLL_EST_SQL.format(m=HLL_M, regs="regs_b")}) AS eb,
             ({_HLL_EST_SQL.format(m=HLL_M, regs="regs_u")}) AS eu)
CROSS JOIN exact
""",
)
def q_hll_set_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL set ALGEBRA over two overlapping per-source-group trigram
    sketches: the union sketch is the per-bucket register MAX of the two
    sketches (the merge that makes HLL the distributed-cardinality
    workhorse — never re-reads the data), and the intersection estimate
    is inclusion-exclusion |A| + |B| - |A u B|. The exact intersection
    (a distinct-join the sketches exist to avoid) rides along to report
    the realized relative error, completing the sketch-algebra family
    next to ``hll_distinct`` / ``hll_merge_sources`` / ``stream_hll_merge``.

    Determinism: registers are exact ints from md5 hex digits (same
    construction as ``hll_distinct``); the three estimator evaluations
    share one IEEE tree; ROUND 2/4 readouts.

    100-TB shape: ONE pass builds everything — a single trigram
    explosion over the union of both arms carries (in_a, in_b)
    membership flags, and the per-trigram flag aggregate (the exchange
    the exact-intersection arm needs anyway) is also the base for both
    sketches: registers over DISTINCT trigrams are identical to
    registers over occurrences (per-bucket MAX is duplicate-blind), so
    md5/rho run once per distinct trigram instead of once per
    occurrence, and the r15 replan drops three of the four explosion
    passes plus the semi-join's two distinct exchanges (guide §2.3
    aggregate-before-shuffle, §2.4 shared exchange). Everything after
    the 256-row register aggregate is constant-size."""
    docs = load_table(spark, sf_dir, "documents").select(
        F.substring("source", 4, 10).cast("int").alias("src_no"), "text"
    )
    in_a = F.col("src_no").between(HLL_A_LO, HLL_A_HI)
    in_b = F.col("src_no").between(HLL_B_LO, HLL_B_HI)
    # one explosion, one exchange: per-DISTINCT-trigram membership flags
    dt = (
        docs.where(in_a | in_b)
        .select(
            F.explode(word_ngrams(tokens(F.col("text")), 3)).alias("t"),
            in_a.alias("a"),
            in_b.alias("b"),
        )
        .groupBy("t")
        .agg(F.max("a").alias("a"), F.max("b").alias("b"))
        .persist()
    )
    # same md5-register construction as hll_regs, evaluated once per
    # distinct trigram; per-bucket conditional MAX yields both sketches
    # (and GREATEST of the two is exactly the union merge)
    h = F.md5("t")
    bucket = F.conv(F.substring(h, 1, 2), 16, 10).cast("int")
    rest = F.substring(h, 3, 12)
    lz = F.length(F.regexp_extract(rest, "^0*", 0))
    dval = F.conv(F.substr(rest, lz + 1, F.lit(1)), 16, 10).cast("int")
    extra = (
        F.when(dval >= 8, 0).when(dval >= 4, 1).when(dval >= 2, 2).otherwise(3)
    )
    rho = F.when(lz == 12, F.lit(49)).otherwise(4 * lz + extra + 1)
    regs = (
        dt.select(bucket.alias("bucket"), rho.alias("rho"), "a", "b")
        .groupBy("bucket")
        .agg(
            F.max(F.when(F.col("a"), F.col("rho"))).alias("ra"),
            F.max(F.when(F.col("b"), F.col("rho"))).alias("rb"),
        )
        .persist()
    )

    m = float(HLL_M)

    def est(rcol: str, name: str) -> DataFrame:
        r = (
            F.greatest(F.col("ra"), F.col("rb"))
            if rcol == "ru"
            else F.col(rcol)
        )
        s = regs.agg(
            F.count(r).alias("nb"),
            F.sum(F.pow(F.lit(2.0), -r)).alias("zp"),
        )
        raw = (0.7213 / (1.0 + 1.079 / m)) * m * m / (
            F.col("zp") + (F.lit(HLL_M) - F.col("nb"))
        )
        v = F.lit(HLL_M) - F.col("nb")
        e = F.when((raw <= 2.5 * m) & (v > 0), m * F.log(m / v)).otherwise(raw)
        return s.select(e.alias(name))

    exact = dt.where(F.col("a") & F.col("b")).agg(
        F.count("*").cast("long").alias("n_exact_inter")
    )
    inter = F.col("ea") + F.col("eb") - F.col("eu")
    return (
        est("ra", "ea")
        .crossJoin(F.broadcast(est("rb", "eb")))
        .crossJoin(F.broadcast(est("ru", "eu")))
        .crossJoin(F.broadcast(exact))
        .select(
            F.lit(HLL_M).cast("int").alias("m"),
            "n_exact_inter",
            F.round(F.col("ea"), 2).alias("est_a"),
            F.round(F.col("eb"), 2).alias("est_b"),
            F.round(F.col("eu"), 2).alias("est_union"),
            F.round(inter, 2).alias("est_inter"),
            F.round(
                F.abs(inter - F.col("n_exact_inter")) / F.col("n_exact_inter"), 4
            ).alias("rel_err"),
        )
    )


# --- positional phrase search -------------------------------------------------

PHRASE_T1 = "sort"    # phrase term 1
PHRASE_T2 = "merge"   # phrase term 2 (query: the exact bigram "sort merge")


@query(
    "phrase_search_positions",
    oracle="WITH " + TOK_CTE + f"""
, pos AS (
    SELECT doc_id, unnest(toks) AS t,
           CAST(generate_subscripts(toks, 1) AS BIGINT) AS p
    FROM tok
), m AS (
    SELECT a.doc_id, a.p
    FROM pos a JOIN pos b ON b.doc_id = a.doc_id AND b.p = a.p + 1
    WHERE a.t = '{PHRASE_T1}' AND b.t = '{PHRASE_T2}'
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_matches,
       CAST(MIN(p) AS BIGINT) AS first_pos
FROM m GROUP BY 1
""",
)
def q_phrase_search_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-phrase search through a POSITIONAL inverted index — the IR
    structure behind quoted queries: posting lists carry (doc, position),
    and a phrase match is an equi-join of the two terms' postings on
    (doc_id, adjacent position). Complements ``bm25_search`` (bag-of-words
    relevance) with the order-sensitive membership primitive; positions
    are 1-based to match the oracle's generate_subscripts convention.

    Plan: posexplode the token array once, filter to the TWO phrase
    terms' postings immediately (predicate reaches the scan — the index
    never materializes for non-query terms), then a co-keyed join on
    (doc_id, pos+1 = pos) and a per-doc count/min.

    100-TB: postings of two terms are a vanishing fraction of the
    corpus; the join shuffles only those postings on doc_id, and
    first-position/min aggregates map-side. Query cost scales with
    term selectivity, not corpus size — the inverted-index property."""
    toks = _docs(spark, sf_dir).select(
        "doc_id", F.posexplode(tokens(F.col("text"))).alias("pos0", "t")
    )
    postings = toks.select(
        "doc_id", "t", (F.col("pos0") + 1).cast("long").alias("p")
    ).where(F.col("t").isin(PHRASE_T1, PHRASE_T2))
    a = postings.where(F.col("t") == PHRASE_T1).select("doc_id", "p")
    b = postings.where(F.col("t") == PHRASE_T2).select(
        "doc_id", (F.col("p") - 1).alias("p")
    )
    return (
        a.join(b, ["doc_id", "p"])
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_matches"),
            F.min("p").cast("long").alias("first_pos"),
        )
    )


# --- OOV-rate evaluation against a frozen top-V vocabulary --------------------

OOV_V = 20             # vocabulary size (top-V train tokens)
OOV_TRAIN_MAX = 10     # sources srcN with N < 10 train the vocab; rest eval


@query(
    "oov_rate_eval",
    oracle="WITH " + TOK_CTE + f"""
, t AS (
    SELECT lang, CAST(substr(source, 4) AS INTEGER) AS src_n,
           unnest(toks) AS w
    FROM tok
), vocab AS (
    SELECT w FROM t WHERE src_n < {OOV_TRAIN_MAX}
    GROUP BY 1 ORDER BY COUNT(*) DESC, w LIMIT {OOV_V}
), ev AS (
    SELECT lang, t.w, v.w AS vw
    FROM t LEFT JOIN vocab v ON v.w = t.w
    WHERE src_n >= {OOV_TRAIN_MAX}
)
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(CASE WHEN vw IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_oov,
       CAST(SUM(CASE WHEN vw IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           / CAST(COUNT(*) AS BIGINT) AS oov_rate
FROM ev GROUP BY 1
""",
)
def q_oov_rate_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-vocabulary rate of a frozen top-{OOV_V} vocabulary, built
    on the train sources (srcN, N < {OOV_TRAIN_MAX}) and evaluated per
    language on the held-out sources — the tokenizer-coverage metric a
    training pipeline tracks when a vocab/BPE model trained on one crawl
    is applied to the next (pairs with ``vocab_build``, which emits the
    vocabulary itself, and ``corpus_drift_kl``, which tracks distribution
    shift). Vocab boundary ties break (count DESC, token ASC) — total
    order, both engines.

    Plan: one token explode feeds both arms; the train arm aggregates to
    token grain and TakeOrdered's the top-V (bounded result, no global
    row sort); the eval arm LEFT-joins the broadcast vocabulary and
    aggregates per language. 100-TB: token-grain agg is map-combinable;
    the vocabulary is O(V) and broadcast; eval is one scan."""
    t = _docs(spark, sf_dir).select(
        "lang",
        F.substring("source", 4, 10).cast("int").alias("src_n"),
        F.explode(tokens(F.col("text"))).alias("w"),
    )
    vocab = (
        t.where(F.col("src_n") < OOV_TRAIN_MAX)
        .groupBy("w")
        .agg(F.count("*").alias("c"))
        .orderBy(F.desc("c"), F.asc("w"))
        .limit(OOV_V)
        .select("w", F.lit(1).alias("in_vocab"))
    )
    ev = t.where(F.col("src_n") >= OOV_TRAIN_MAX).join(
        F.broadcast(vocab), "w", "left"
    )
    return ev.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_tokens"),
        F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_oov"),
        (
            F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0)).cast(
                "long"
            )
            / F.count("*").cast("long")
        ).alias("oov_rate"),
    )


# --- distance-weighted co-occurrence matrix (GloVe-style X builder) -----------

COOC_W = 5   # context window: token pairs up to 5 positions apart
# 1/d harmonic weights, FROZEN at 6dp so both engines sum the identical
# decimal literals (1/3 is not exactly representable; the rounded constant
# is the published GloVe recipe to working precision)
COOC_WEIGHTS = {1: "1.000000", 2: "0.500000", 3: "0.333333",
                4: "0.250000", 5: "0.200000"}


@query(
    "cooccurrence_window_weighted",
    oracle="WITH " + TOK_CTE + f"""
, pos AS (
    SELECT doc_id, unnest(toks) AS t,
           CAST(generate_subscripts(toks, 1) AS BIGINT) AS p
    FROM tok
), pairs AS (
    SELECT least(a.t, b.t) AS w1, greatest(a.t, b.t) AS w2,
           b.p - a.p AS d
    FROM pos a JOIN pos b
      ON b.doc_id = a.doc_id AND b.p > a.p AND b.p <= a.p + {COOC_W}
)
SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(CAST(CASE d {' '.join(f"WHEN {d} THEN '{w}'" for d, w in COOC_WEIGHTS.items())}
           END AS DECIMAL(7,6))) AS DOUBLE) AS w_sum
FROM pairs GROUP BY 1, 2
""",
)
def q_cooccurrence_window_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distance-weighted token co-occurrence counts over a +-{COOC_W}
    window with harmonic 1/d weighting — the X-matrix builder GloVe-class
    embedding training consumes (Pennington et al. 2014), and the
    windowed generalization of ``pmi_collocations`` (adjacent pairs
    only). Pairs are canonicalized (lexicographic least/greatest) so the
    matrix is stored upper-triangular.

    Determinism: weights are FROZEN 6dp decimal constants (1/3 rounded
    once, at authoring time, not per engine), so w_sum is an exact
    decimal aggregate — combine-order free, no float in the pipeline.

    Plan: pair generation is MAP-ONLY — {COOC_W} shifted zip_with slices
    of the token array per document (no positional self-join, no
    postings shuffle); the only exchange is the final (w1, w2) hash
    aggregate, which is map-combinable and vocabulary-bounded
    (|V|^2/2 keys max). The oracle states the self-join form the
    array slices replace. 100-TB: corpus-linear map work; the shuffle
    carries only partial sums at pair grain."""
    toks = tokens(F.col("text"))

    def _pair_at(dd: int):
        return lambda x, y: F.struct(
            F.least(x, y).alias("w1"),
            F.greatest(x, y).alias("w2"),
            F.lit(dd).alias("d"),
        )

    arrs = []
    for d in range(1, COOC_W + 1):
        n = F.greatest(F.size(toks) - d, F.lit(0))
        arrs.append(
            F.zip_with(F.slice(toks, 1, n), F.slice(toks, d + 1, n), _pair_at(d))
        )
    pairs = _docs(spark, sf_dir).select(
        F.explode(F.concat(*arrs)).alias("pr")
    ).select("pr.w1", "pr.w2", "pr.d")
    weight = F.create_map(
        *[
            x
            for d, w in COOC_WEIGHTS.items()
            for x in (F.lit(d), F.lit(w).cast("decimal(7,6)"))
        ]
    )[F.col("d")]
    return pairs.groupBy("w1", "w2").agg(
        F.count("*").cast("long").alias("n_pairs"),
        # the SUM itself is an exact decimal fold (combine-order free);
        # only the READOUT is flattened to double — Spark decimal(17,6)
        # vs DuckDB DECIMAL(38,6) hash apart in the driver (r9 verdict
        # item 1), while the <=15-sig-digit decimal converts to the
        # identical nearest double in both engines
        F.sum(weight).cast("double").alias("w_sum"),
    )


# --- rank-biased overlap between two document rankers -------------------------

RBO_D = 20       # evaluation depth (top-D prefixes)
RBO_P = 0.5      # persistence — DYADIC, so p^(d-1) is an exact double
RBO_T_DP = 12    # per-depth term rounding before the decimal sum


@query(
    "rank_biased_overlap",
    oracle="WITH " + TOK_CTE + f"""
, sig AS (
    SELECT doc_id, n_chars,
           CAST(len(list_distinct(toks)) AS BIGINT) AS n_terms
    FROM tok
), ra AS (
    SELECT doc_id, ROW_NUMBER() OVER (ORDER BY n_chars DESC, doc_id) AS r
    FROM sig QUALIFY r <= {RBO_D}
), rb AS (
    SELECT doc_id, ROW_NUMBER() OVER (ORDER BY n_terms DESC, doc_id) AS r
    FROM sig QUALIFY r <= {RBO_D}
), depths AS (
    SELECT unnest(range(1, {RBO_D + 1})) AS d
), xd AS (
    SELECT d, CAST(COUNT(o.ra_r) AS BIGINT) AS x
    FROM depths LEFT JOIN (
        SELECT a.r AS ra_r, b.r AS rb_r
        FROM ra a JOIN rb b ON b.doc_id = a.doc_id
    ) o ON o.ra_r <= d AND o.rb_r <= d
    GROUP BY 1
)
SELECT {RBO_D} AS depth,
       CAST(MAX(CASE WHEN d = {RBO_D} THEN x END) AS BIGINT)
           AS overlap_at_depth,
       ROUND((1 - {RBO_P}) * CAST(SUM(CAST(ROUND(
           POW({RBO_P}, d - 1) * x / CAST(d AS DOUBLE), {RBO_T_DP})
           AS DECIMAL(18,{RBO_T_DP}))) AS DOUBLE), 8) AS rbo
FROM xd
""",
)
def q_rank_biased_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-biased overlap (Webber, Moffat & Zobel 2010) between two
    document rankers — length (n_chars) vs lexical diversity (distinct
    tokens): RBO@D = (1-p) * sum_d p^(d-1) * |A_d intersect B_d| / d,
    the top-weighted agreement metric for comparing rankers whose raw
    scores are incomparable (complements ``rank_fusion_rrf``, which
    MERGES rankers; RBO measures how much they agree).

    Determinism: prefix overlaps X_d are exact ints (ties in both
    rankers break on doc_id); p = {RBO_P} is DYADIC, so p^(d-1) is an
    exact power of two; each depth term rounds at {RBO_T_DP}dp into a
    DECIMAL sum (combine-order free); one readout multiply, ROUND 8.

    100-TB shape: each ranker's top-{RBO_D} comes from TakeOrdered
    (per-partition heaps, no global sort); everything downstream —
    the join of two {RBO_D}-row lists and the {RBO_D}-depth scan — is
    constant-size. Comparing rankers over a trillion docs costs two
    top-K passes."""
    sig = _docs(spark, sf_dir).select(
        "doc_id",
        "n_chars",
        F.size(F.array_distinct(tokens(F.col("text")))).cast("long").alias(
            "n_terms"
        ),
    )

    def topd(col: str) -> DataFrame:
        from ..operators.windows import bounded_window

        top = (
            sig.orderBy(F.desc(col), F.asc("doc_id"))
            .limit(RBO_D)
            .select("doc_id")
        )
        # rank within the bounded top-D list: re-derive the order key
        return sig.join(F.broadcast(top), "doc_id").select(
            "doc_id",
            F.row_number()
            .over(
                bounded_window(
                    col,
                    bound=f"rank over a TakeOrdered top-{RBO_D} result",
                    queries=("rank_biased_overlap",),
                ).orderBy(F.desc(col), F.asc("doc_id"))
            )
            .alias("r"),
        )

    ra = topd("n_chars").select(F.col("doc_id"), F.col("r").alias("ra_r"))
    rb = topd("n_terms").select(F.col("doc_id"), F.col("r").alias("rb_r"))
    pairs = ra.join(rb, "doc_id").select("ra_r", "rb_r")
    depths = spark.range(1, RBO_D + 1).select(F.col("id").alias("d"))
    xd = (
        depths.join(
            F.broadcast(pairs),
            (F.col("ra_r") <= F.col("d")) & (F.col("rb_r") <= F.col("d")),
            "left",
        )
        .groupBy("d")
        .agg(F.count("ra_r").cast("long").alias("x"))
    )
    term = F.round(
        F.pow(F.lit(float(RBO_P)), F.col("d") - 1)
        * F.col("x")
        / F.col("d").cast("double"),
        RBO_T_DP,
    ).cast(f"decimal(18,{RBO_T_DP})")
    return xd.agg(
        F.lit(RBO_D).alias("depth"),
        F.max(F.when(F.col("d") == RBO_D, F.col("x")))
        .cast("long")
        .alias("overlap_at_depth"),
        F.round(
            (1 - RBO_P) * F.sum(term).cast("double"), 8
        ).alias("rbo"),
    )
