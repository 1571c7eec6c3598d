"""Corpus-quality operators over ``documents`` — the filtering/mixing stages
a large-scale training-data pipeline runs between crawl and tokenization
(north-star surface, beyond the reference's own operators; reference parity
anchor: the sanitize/cast layer daily_function.py:1240-1330 is the closest
analogue, applied here to text instead of order frames).

All five queries are pure Catalyst (no UDFs): per-document rules are array
HOFs over the token array, so the hot path is map-only — no shuffle until
the (tiny) per-language / per-source rollups. At 100 TB: quality scoring
and PII scrubbing are embarrassingly parallel scans; the mix/histogram
rollups shuffle one small row per (lang|source) group.

Cross-engine determinism notes:
- every ratio is int/int -> true double division in both engines;
- the corpus-mix denominator folds a SORTED list of sqrt weights
  sequentially (sqrt is IEEE-exact, and the fold order is pinned), so the
  double sum is bit-identical in Spark and DuckDB;
- regexes use only character classes and bounded quantifiers — the
  intersection of Java regex and RE2 semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.lnq import LN_UNIT_SCALE, LN_UNIT_SCALE_F, ln_units, ln_units_sql
from ..operators.text import STOPWORDS, tokens, word_ngrams
from ..sources.tables import load_table
from .registry import query
from .text import TOK_CTE

MIX_BUDGET = 10_000   # documents drawn in the temperature-resampled mix


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


def _max_freq(arr: F.Column) -> F.Column:
    """Highest frequency of any element in ``arr``: sort, then fold a
    run-length struct — O(n log n) per row vs the O(n * n_distinct) of
    counting each distinct element with a nested filter (measured 4x
    faster on the documents fixture; same value, so the DuckDB oracles
    keep the straightforward count-each-distinct form)."""
    acc0 = F.struct(
        F.lit(0).alias("best"),
        F.lit(0).alias("cur"),
        F.lit(None).cast("string").alias("prev"),
    )

    def step(a: F.Column, x: F.Column) -> F.Column:
        cur = F.when(x == a["prev"], a["cur"] + 1).otherwise(F.lit(1))
        return F.struct(
            F.greatest(a["best"], cur).alias("best"),
            cur.alias("cur"),
            x.alias("prev"),
        )

    return F.aggregate(F.array_sort(arr), acc0, step, lambda a: a["best"])


# --- Gopher-style quality rules ---------------------------------------------

_STOP_SQL = {
    lang: "[" + ", ".join(f"'{w}'" for w in ws) + "]" for lang, ws in STOPWORDS.items()
}
_STOP_CASE = "CASE lang " + " ".join(
    f"WHEN '{lang}' THEN {arr}" for lang, arr in _STOP_SQL.items()
) + " ELSE CAST([] AS VARCHAR[]) END"


@query(
    "quality_gopher",
    oracle=f"""
WITH {TOK_CTE},
m AS (
    SELECT doc_id, lang, source, toks,
           len(toks) AS n_words,
           list_sum(list_transform(toks, t -> length(t))) / len(toks) AS mean_word_len,
           len(list_distinct(toks)) / len(toks) AS distinct_ratio,
           len(list_filter(toks, t -> list_contains({_STOP_CASE}, t))) / len(toks)
               AS stop_ratio,
           list_max(list_transform(list_distinct(toks),
               t -> len(list_filter(toks, x -> x = t)))) / len(toks) AS max_token_frac
    FROM tok WHERE len(toks) > 0
)
SELECT doc_id, lang, source,
       CAST(n_words AS BIGINT) AS n_words,
       mean_word_len, distinct_ratio, stop_ratio, max_token_frac,
       CAST(n_words >= 20 AND n_words <= 1000
            AND mean_word_len >= 3 AND mean_word_len <= 8
            AND distinct_ratio >= 0.4
            AND max_token_frac <= 0.12 AS BOOLEAN) AS passes
FROM m
""",
)
def q_quality_gopher(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style heuristic quality rules, word-granular (the fixture has
    no lines/digits, so the line-based rules degenerate): word-count bounds,
    mean word length, distinct-token ratio, language-matched stopword ratio,
    and single-token dominance. Everything is an array HOF over one
    tokenization — map-only, no shuffle, no UDF."""
    d = _docs(spark, sf_dir)
    toks = tokens(F.col("text"))
    stop_arr = F.when(F.lit(False), F.array())
    for lang, words in STOPWORDS.items():
        stop_arr = stop_arr.when(
            F.col("lang") == lang, F.array(*[F.lit(w) for w in words])
        )
    stop_arr = stop_arr.otherwise(F.array().cast("array<string>"))
    base = d.select("doc_id", "lang", "source", toks.alias("toks")).filter(
        F.size("toks") > 0
    )
    n = F.size("toks")
    mean_word_len = (
        F.aggregate(F.transform("toks", F.length), F.lit(0), lambda a, x: a + x) / n
    )
    distinct_ratio = F.size(F.array_distinct("toks")) / n
    stop_ratio = (
        F.size(F.filter("toks", lambda t: F.array_contains(stop_arr, t))) / n
    )
    max_token_frac = _max_freq(F.col("toks")) / n
    m = base.select(
        "doc_id", "lang", "source",
        n.cast("long").alias("n_words"),
        mean_word_len.alias("mean_word_len"),
        distinct_ratio.alias("distinct_ratio"),
        stop_ratio.alias("stop_ratio"),
        max_token_frac.alias("max_token_frac"),
    )
    passes = (
        (F.col("n_words") >= 20) & (F.col("n_words") <= 1000)
        & (F.col("mean_word_len") >= 3) & (F.col("mean_word_len") <= 8)
        & (F.col("distinct_ratio") >= 0.4)
        & (F.col("max_token_frac") <= 0.12)
    )
    return m.withColumn("passes", passes)


# --- Repetition ratios -------------------------------------------------------

_BIGRAMS = (
    "CASE WHEN len(toks) >= 2 THEN list_transform(range(1, len(toks)), "
    "i -> toks[i] || ' ' || toks[i+1]) ELSE CAST([] AS VARCHAR[]) END"
)
_TRIGRAMS = (
    "CASE WHEN len(toks) >= 3 THEN list_transform(range(1, len(toks) - 1), "
    "i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) "
    "ELSE CAST([] AS VARCHAR[]) END"
)


@query(
    "repetition_ratios",
    oracle=f"""
WITH {TOK_CTE},
g AS (
    SELECT doc_id, {_BIGRAMS} AS b2, {_TRIGRAMS} AS b3
    FROM tok WHERE len(toks) >= 3
)
SELECT doc_id,
       CAST(len(b2) AS BIGINT) AS n_bigrams,
       1.0 - len(list_distinct(b2)) / len(b2) AS dup_bigram_frac,
       list_max(list_transform(list_distinct(b2),
           g -> len(list_filter(b2, x -> x = g)))) / len(b2) AS top_bigram_frac,
       1.0 - len(list_distinct(b3)) / len(b3) AS dup_trigram_frac,
       CAST(list_max(list_transform(list_distinct(b2),
                g -> len(list_filter(b2, x -> x = g)))) / len(b2) > 0.1
            OR 1.0 - len(list_distinct(b3)) / len(b3) > 0.5 AS BOOLEAN)
           AS repetitive
FROM g
""",
)
def q_repetition_ratios(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeated-n-gram quality signals (the MassiveText/Gopher repetition
    filters): duplicate-bigram fraction, most-common-bigram dominance, and
    duplicate-trigram fraction, with a composite `repetitive` flag. All
    per-document HOFs — map-only."""
    d = _docs(spark, sf_dir)
    toks = tokens(F.col("text"))
    base = (
        d.select("doc_id", toks.alias("toks"))
        .filter(F.size("toks") >= 3)
        .select(
            "doc_id",
            word_ngrams(F.col("toks"), 2).alias("b2"),
            word_ngrams(F.col("toks"), 3).alias("b3"),
        )
    )
    n2 = F.size("b2")
    n3 = F.size("b3")
    top_bigram_frac = _max_freq(F.col("b2")) / n2
    dup2 = F.lit(1.0) - F.size(F.array_distinct("b2")) / n2
    dup3 = F.lit(1.0) - F.size(F.array_distinct("b3")) / n3
    return base.select(
        "doc_id",
        n2.cast("long").alias("n_bigrams"),
        dup2.alias("dup_bigram_frac"),
        top_bigram_frac.alias("top_bigram_frac"),
        dup3.alias("dup_trigram_frac"),
        ((top_bigram_frac > 0.1) | (dup3 > 0.5)).alias("repetitive"),
    )


# --- Token-count distribution ------------------------------------------------

@query(
    "token_histogram",
    oracle=f"""
WITH {TOK_CTE},
c AS (SELECT lang, len(toks) AS n_tokens FROM tok)
SELECT lang,
       CAST(COUNT(*) AS BIGINT)        AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT)   AS total_tokens,
       CAST(MIN(n_tokens) AS BIGINT)   AS min_tokens,
       quantile_cont(n_tokens, 0.25)   AS p25,
       quantile_cont(n_tokens, 0.50)   AS p50,
       quantile_cont(n_tokens, 0.75)   AS p75,
       CAST(MAX(n_tokens) AS BIGINT)   AS max_tokens
FROM c GROUP BY lang
""",
)
def q_token_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language token-count distribution (the budget-planning rollup a
    tokenizer pipeline runs before scheduling): exact interpolated quartiles
    over integer token counts — Spark `percentile` and DuckDB
    `quantile_cont` share the linear-interpolation definition, and the
    interpolation arithmetic on integer inputs is FP-identical."""
    d = _docs(spark, sf_dir)
    c = d.select("lang", F.size(tokens(F.col("text"))).alias("n_tokens"))
    return c.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.min("n_tokens").cast("long").alias("min_tokens"),
        F.percentile("n_tokens", 0.25).alias("p25"),
        F.percentile("n_tokens", 0.50).alias("p50"),
        F.percentile("n_tokens", 0.75).alias("p75"),
        F.max("n_tokens").cast("long").alias("max_tokens"),
    )


# --- Temperature-resampled corpus mix ---------------------------------------

@query(
    "corpus_mix",
    oracle=f"""
WITH c AS (
    SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source
), d AS (
    SELECT list_reduce(
               list_prepend(CAST(0 AS DOUBLE),
                            list_sort(list(sqrt(CAST(n_docs AS DOUBLE))))),
               (a, b) -> a + b) AS denom
    FROM c
)
SELECT source,
       CAST(n_docs AS BIGINT)                    AS n_docs,
       sqrt(CAST(n_docs AS DOUBLE))              AS weight,
       sqrt(CAST(n_docs AS DOUBLE)) / denom      AS prob,
       CAST(floor(sqrt(CAST(n_docs AS DOUBLE)) / denom * {MIX_BUDGET}) AS BIGINT)
                                                 AS target_docs
FROM c, d
""",
)
def q_corpus_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source mixing (alpha = 0.5, i.e. sqrt weighting —
    the up/down-sampling step that balances a multi-source training mix):
    per-source draw probabilities and integer document targets at a fixed
    budget. sqrt is IEEE-correctly-rounded in both engines, and the
    denominator folds the SORTED weight list sequentially, so every double
    here is bit-identical to the oracle's. The denominator is a broadcast
    one-row aggregate (no driver-side action)."""
    d = _docs(spark, sf_dir)
    counts = d.groupBy("source").agg(F.count("*").alias("n_docs"))
    w = F.sqrt(F.col("n_docs").cast("double"))
    denom = counts.agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.sqrt(F.col("n_docs").cast("double")))),
            F.lit(0.0),
            lambda a, b: a + b,
        ).alias("denom")
    )
    return counts.crossJoin(F.broadcast(denom)).select(
        "source",
        F.col("n_docs").cast("long").alias("n_docs"),
        w.alias("weight"),
        (w / F.col("denom")).alias("prob"),
        F.floor(w / F.col("denom") * MIX_BUDGET).cast("long").alias("target_docs"),
    )


# --- PII scrubbing -----------------------------------------------------------

_EMAIL_RE = "[a-z0-9.]+@[a-z.]+[a-z]"
_PHONE_RE = "[0-9]{3}-[0-9]{4}-[0-9]{4}"
_ID_RE = "[0-9]{3}-[0-9]{2}-[0-9]{4}"


@query(
    "pii_scrub",
    oracle=f"""
WITH seeded AS (
    SELECT doc_id,
           text || CASE CAST(doc_id % 4 AS INTEGER)
               WHEN 0 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@mail.example.com today'
               WHEN 1 THEN ' call 010-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                        || '-' || lpad(CAST(doc_id % 7919 AS VARCHAR), 4, '0') || ' now'
               WHEN 2 THEN ' ssn 123-45-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' on file'
               ELSE ''
           END AS text2
    FROM documents
), scrubbed AS (
    SELECT doc_id, text2,
           regexp_replace(
               regexp_replace(
                   regexp_replace(text2, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                   '{_PHONE_RE}', '<PHONE>', 'g'),
               '{_ID_RE}', '<ID>', 'g') AS clean
    FROM seeded
)
SELECT doc_id,
       CAST(len(regexp_extract_all(text2, '{_EMAIL_RE}')) AS INTEGER) AS n_emails,
       CAST(len(regexp_extract_all(text2, '{_PHONE_RE}')) AS INTEGER) AS n_phones,
       CAST(len(regexp_extract_all(text2, '{_ID_RE}')) AS INTEGER)    AS n_ids,
       md5(clean) AS clean_hash,
       CAST(contains(clean, '<') AS BOOLEAN) AS redacted
FROM scrubbed
""",
)
def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction — the scrubbing pass every corpus pipeline runs before
    training. The fixture text carries no PII, so deterministic synthetic
    PII (email / phone / SSN-shaped, keyed off doc_id) is appended first,
    then scrubbed with sequential regexp_replace and counted with
    regexp_extract_all. Regexes stay inside the Java-regex/RE2 common
    subset. Emitted as (counts, md5 of scrubbed text) so the full redacted
    string is value-checked without megabyte result rows."""
    d = _docs(spark, sf_dir)
    doc_s = F.col("doc_id").cast("string")
    seeded = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 4 == 0,
                F.concat(F.lit(" contact user"), doc_s, F.lit("@mail.example.com today")),
            )
            .when(
                F.col("doc_id") % 4 == 1,
                F.concat(
                    F.lit(" call 010-"),
                    F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
                    F.lit("-"),
                    F.lpad((F.col("doc_id") % 7919).cast("string"), 4, "0"),
                    F.lit(" now"),
                ),
            )
            .when(
                F.col("doc_id") % 4 == 2,
                F.concat(
                    F.lit(" ssn 123-45-"),
                    F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
                    F.lit(" on file"),
                ),
            )
            .otherwise(F.lit("")),
        ).alias("text2"),
    )
    clean = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("text2"), _EMAIL_RE, "<EMAIL>"),
            _PHONE_RE, "<PHONE>",
        ),
        _ID_RE, "<ID>",
    )
    return seeded.select(
        "doc_id",
        F.size(F.regexp_extract_all("text2", F.lit(_EMAIL_RE), 0)).cast("int").alias("n_emails"),
        F.size(F.regexp_extract_all("text2", F.lit(_PHONE_RE), 0)).cast("int").alias("n_phones"),
        F.size(F.regexp_extract_all("text2", F.lit(_ID_RE), 0)).cast("int").alias("n_ids"),
        F.md5(clean).alias("clean_hash"),
        clean.contains("<").alias("redacted"),
    )

# --- End-to-end filtered corpus ---------------------------------------------

@query(
    "quality_filtered_corpus",
    oracle=f"""
WITH {TOK_CTE},
m AS (
    SELECT doc_id, lang, source, toks,
           len(toks) AS n_words,
           list_sum(list_transform(toks, t -> length(t))) / len(toks) AS mean_word_len,
           len(list_distinct(toks)) / len(toks) AS distinct_ratio,
           list_max(list_transform(list_distinct(toks),
               t -> len(list_filter(toks, x -> x = t)))) / len(toks) AS max_token_frac,
           {_BIGRAMS} AS b2, {_TRIGRAMS} AS b3
    FROM tok WHERE len(toks) >= 3
), flags AS (
    SELECT doc_id, lang, source, n_words,
           (n_words >= 20 AND n_words <= 1000
            AND mean_word_len >= 3 AND mean_word_len <= 8
            AND distinct_ratio >= 0.4
            AND max_token_frac <= 0.12) AS passes,
           (list_max(list_transform(list_distinct(b2),
                g -> len(list_filter(b2, x -> x = g)))) / len(b2) > 0.1
            OR 1.0 - len(list_distinct(b3)) / len(b3) > 0.5) AS repetitive
    FROM m
), canon AS (
    SELECT min(doc_id) AS keep_id FROM documents GROUP BY md5(text)
)
SELECT doc_id, lang, source, CAST(n_words AS BIGINT) AS n_words
FROM flags
WHERE passes AND NOT repetitive
  AND doc_id IN (SELECT keep_id FROM canon)
""",
)
def q_quality_filtered_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end corpus filter a training pipeline actually runs:
    quality rules AND repetition gate AND exact-dedup canonical survivor.
    Composes the quality_gopher / repetition_ratios plans (shared
    tokenization subtree — Catalyst dedups the scan) with a keep-min-doc_id
    semi join on the md5 canonical set. At 100 TB: two map-side rule
    passes, one hash-groupBy for canonicals, one semi-join shuffle."""
    d = _docs(spark, sf_dir)
    base = d.select(
        "doc_id", "lang", "source", tokens(F.col("text")).alias("toks")
    ).filter(F.size("toks") >= 3)
    # one projection computes every gate metric from the single toks column
    # (joining the standalone gate queries re-derives the HOF trees per
    # branch — measured 4x this plan's cost)
    n = F.size("toks")
    withg = base.select(
        "doc_id", "lang", "source", "toks",
        word_ngrams(F.col("toks"), 2).alias("b2"),
        word_ngrams(F.col("toks"), 3).alias("b3"),
        n.cast("long").alias("n_words"),
    )
    n2 = F.size("b2")
    n3 = F.size("b3")
    passes = (
        (F.col("n_words") >= 20) & (F.col("n_words") <= 1000)
        & ((F.aggregate(F.transform("toks", F.length), F.lit(0), lambda a, x: a + x)
            / F.col("n_words")).between(3, 8))
        & (F.size(F.array_distinct("toks")) / F.col("n_words") >= 0.4)
        & (_max_freq(F.col("toks")) / F.col("n_words") <= 0.12)
    )
    repetitive = (_max_freq(F.col("b2")) / n2 > 0.1) | (
        F.lit(1.0) - F.size(F.array_distinct("b3")) / n3 > 0.5
    )
    canon = d.groupBy(F.md5("text").alias("h")).agg(F.min("doc_id").alias("keep_id"))
    return (
        withg.filter(passes & ~repetitive)
        .join(canon.select(F.col("keep_id").alias("doc_id")), "doc_id", "semi")
        .select("doc_id", "lang", "source", "n_words")
    )


# --- Inlined-model batch inference ------------------------------------------

# logistic quality-classifier weights, frozen as literals in BOTH engines
# (the deploy artifact of ml_logreg_accuracy's training stage): features are
# deterministic int/int ratios, z is one fixed left-to-right fold, so the
# logit is bit-identical cross-engine; only the sigmoid touches exp(), and
# its input is pre-rounded so a <=1-ulp libm difference is confined to the
# 4-dp rounding of the score (never the logit or the decision).
LOGREG_W = {
    "bias": -2.0,
    "tokens_per_100": 0.8,
    "alpha_ratio": 2.5,
    "stopword_ratio": 4.0,
    "avg_token_len": -0.3,
}


@query(
    "quality_logreg_score",
    oracle="WITH " + TOK_CTE + f"""
, feats AS (
    SELECT doc_id,
           len(toks) / 100.0 AS f_tok,
           len(regexp_replace(text, '[^a-zA-Z]', '', 'g')) / NULLIF(len(text), 0)
               AS f_alpha,
           len(list_filter(toks, t -> t IN ('the', 'a', 'of', 'and')))
               / NULLIF(len(toks), 0) AS f_stop,
           list_sum(list_transform(toks, t -> len(t))) / NULLIF(len(toks), 0)
               AS f_len
    FROM tok
), scored AS (
    SELECT doc_id,
           ROUND({LOGREG_W['bias']} + {LOGREG_W['tokens_per_100']} * f_tok
                 + {LOGREG_W['alpha_ratio']} * f_alpha
                 + {LOGREG_W['stopword_ratio']} * f_stop
                 + {LOGREG_W['avg_token_len']} * f_len, 6) AS logit
    FROM feats
)
SELECT doc_id, logit,
       ROUND(1.0 / (1.0 + exp(-logit)), 4) AS score,
       CAST(logit > 0 AS BOOLEAN) AS predicted_keep
FROM scored
""",
)
def q_quality_logreg_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch model inference as a query: a frozen logistic quality
    classifier scored over the whole corpus inside codegen — the deployment
    half of the MLlib training stage (ml_logreg_accuracy), and the shape
    every learned filter (quality, toxicity, language) takes in a 100 TB
    pipeline: weights inlined as literals, features map-side, zero Python.
    The decision bit comes from the exact logit, not the sigmoid, so the
    keep/drop partition is bit-stable cross-engine."""
    d = _docs(spark, sf_dir)
    toks = tokens(F.col("text"))
    f_tok = F.size(toks) / F.lit(100.0)
    f_alpha = F.length(F.regexp_replace("text", "[^a-zA-Z]", "")) / F.nullif(
        F.length("text"), F.lit(0)
    )
    f_stop = F.size(
        F.filter(toks, lambda t: t.isin("the", "a", "of", "and"))
    ) / F.nullif(F.size(toks), F.lit(0))
    f_len = F.aggregate(
        F.transform(toks, lambda t: F.length(t)), F.lit(0), lambda a, x: a + x
    ) / F.nullif(F.size(toks), F.lit(0))
    logit = F.round(
        F.lit(LOGREG_W["bias"])
        + F.lit(LOGREG_W["tokens_per_100"]) * f_tok
        + F.lit(LOGREG_W["alpha_ratio"]) * f_alpha
        + F.lit(LOGREG_W["stopword_ratio"]) * f_stop
        + F.lit(LOGREG_W["avg_token_len"]) * f_len,
        6,
    )
    return d.select(
        "doc_id",
        logit.alias("logit"),
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-logit)), 4).alias("score"),
        (logit > 0).alias("predicted_keep"),
    )


@query(
    "corpus_datasheet",
    oracle="WITH " + TOK_CTE + """
SELECT source,
       CAST(COUNT(*) AS BIGINT)                       AS n_docs,
       CAST(SUM(len(toks)) AS BIGINT)                 AS total_tokens,
       SUM(len(toks)) / COUNT(*)                      AS mean_tokens,
       CAST(COUNT(DISTINCT lang) AS BIGINT)           AS n_langs,
       SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) / COUNT(*) AS en_frac,
       CAST(MIN(n_chars) AS BIGINT)                   AS min_chars,
       CAST(MAX(n_chars) AS BIGINT)                   AS max_chars
FROM tok
GROUP BY source
""",
)
def q_corpus_datasheet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus datasheet in ONE scan — the governance summary
    (docs, token volume, language spread, length envelope) published next
    to a training set. Every measure is a map-combinable agg over the
    token-counted scan; the shuffle moves one row per source. Ratios are
    int/int exact divisions, bit-stable cross-engine."""
    d = _docs(spark, sf_dir)
    n_toks = F.size(tokens(F.col("text")))
    return d.select("source", "lang", "n_chars", n_toks.alias("nt")).groupBy(
        "source"
    ).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("nt").cast("long").alias("total_tokens"),
        (F.sum("nt") / F.count("*")).alias("mean_tokens"),
        F.countDistinct("lang").cast("long").alias("n_langs"),
        (
            F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)) / F.count("*")
        ).alias("en_frac"),
        F.min("n_chars").cast("long").alias("min_chars"),
        F.max("n_chars").cast("long").alias("max_chars"),
    )


# ---------------------------------------------------------------------------
# boilerplate_ngram_scrub — corpus-frequency chunk removal (CCNet-style)
# ---------------------------------------------------------------------------

# POLICY constants, not scale parameters (contrast knn_ivf's codebook,
# which must track the corpus): the chunk width is a text-granularity
# choice and the document-frequency threshold is the curator's absolute
# "seen on N pages = boilerplate" rule (CCNet uses absolute counts too) —
# neither needs to grow with the corpus for the plan to stay sound.
CHUNK_W = 3        # words per non-overlapping chunk (the "line" analogue)
BOILER_DOCS = 5    # chunk in >= this many distinct docs => boilerplate


@query(
    "boilerplate_ngram_scrub",
    oracle=f"""
WITH words AS (
    SELECT doc_id, string_split(text, ' ') AS w FROM documents
), chunks AS (
    SELECT doc_id, CAST(t.i AS INTEGER) AS pos,
           array_to_string(
               w[(t.i*{CHUNK_W}+1):(t.i*{CHUNK_W}+{CHUNK_W})], ' ') AS chunk
    FROM words,
         UNNEST(range(0, CAST(ceil(len(w)/{CHUNK_W}.0) AS BIGINT))) t(i)
), bad AS (
    SELECT chunk FROM chunks
    GROUP BY chunk HAVING COUNT(DISTINCT doc_id) >= {BOILER_DOCS}
), kept AS (
    SELECT c.* FROM chunks c ANTI JOIN bad b ON c.chunk = b.chunk
), reb AS (
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
           string_agg(chunk, ' ' ORDER BY pos) AS clean_text
    FROM kept GROUP BY doc_id
), tot AS (
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_chunks
    FROM chunks GROUP BY doc_id
)
SELECT t.doc_id, t.n_chunks,
       COALESCE(r.n_kept, 0) AS n_kept,
       t.n_chunks - COALESCE(r.n_kept, 0) AS n_dropped,
       COALESCE(r.clean_text, '') AS clean_text
FROM tot t LEFT JOIN reb r USING (doc_id)
""",
)
def q_boilerplate_ngram_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style boilerplate removal by CORPUS frequency (Wenzek et al.
    2020 drop repeated lines/headers seen across many pages): each doc is
    cut into non-overlapping {CHUNK_W}-word chunks (the line analogue for
    this corpus's unpunctuated text), a chunk appearing in >= BOILER_DOCS
    distinct docs is boilerplate, and every doc is REWRITTEN from its
    surviving chunks in original order. Differs from the dedup family:
    repetition_ratios is within-doc, dedup_* drop whole docs — this is
    the only operator that edits documents using corpus-wide statistics.

    100-TB shape: chunking is a map-only array HOF (no UDF); the chunk
    document-frequency agg is map-combinable; and the scrub joins the
    BOILERPLATE SET, not the frequency table — a stop list that is small
    by construction (high-DF chunks only), so it BROADCASTS at any corpus
    size and hot boilerplate chunks can never skew a shuffle join. The
    rebuild groups by doc_id — per-doc state bounded by doc length."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    words = d.withColumn("w", F.split("text", " "))
    n_chunks = F.ceil(F.size("w") / CHUNK_W).cast("int")
    # THREE subtrees consume the chunk explode (stop-list agg, scrub
    # anti-join, per-doc totals) — persist so the scan+explode runs once,
    # not 3x (audited: 3 parquet scans without this; standard clearCache
    # contract, see two_phase_rank's cache note)
    from pyspark.storagelevel import StorageLevel

    chunks = words.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_chunks - 1),
                lambda i: F.array_join(
                    F.slice(F.col("w"), i * CHUNK_W + 1, CHUNK_W), " "
                ),
            )
        ).alias("pos", "chunk"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    bad = (
        chunks.groupBy("chunk")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= BOILER_DOCS)
        .select("chunk")
    )
    kept = chunks.join(F.broadcast(bad), "chunk", "left_anti")
    reb = kept.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "chunk"))),
                lambda s: s["chunk"],
            ),
            " ",
        ).alias("clean_text"),
    )
    tot = chunks.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_chunks")
    )
    return tot.join(reb, "doc_id", "left").select(
        "doc_id",
        "n_chunks",
        F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
        (F.col("n_chunks") - F.coalesce("n_kept", F.lit(0)))
        .cast("long")
        .alias("n_dropped"),
        F.coalesce("clean_text", F.lit("")).alias("clean_text"),
    )


# --- Subgroup fairness metrics for the frozen scorer -------------------------

FAIR_GROUPS = 5   # protected-group proxy: nationkey % 5


@query(
    "fairness_metrics",
    oracle=f"""
WITH s AS (
    SELECT c_nationkey % {FAIR_GROUPS} AS grp,
           CAST(c_mktsegment = 'BUILDING' AS INT) AS y,
           CAST(ROUND(1.0 / (1.0 + exp(-ROUND({LOGREG_W['bias']}
                 + {LOGREG_W['tokens_per_100']} * (c_acctbal / 10000.0)
                 + {LOGREG_W['alpha_ratio']} * (c_nationkey / 25.0), 9))), 10)
                > 0.5 AS INT) AS yhat
    FROM customer
)
SELECT CAST(grp AS BIGINT) AS grp,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(SUM(y) / CAST(COUNT(*) AS DOUBLE), 8) AS base_rate,
       ROUND(SUM(yhat) / CAST(COUNT(*) AS DOUBLE), 8) AS pred_rate,
       ROUND(SUM(y * yhat)
             / CAST(NULLIF(SUM(y), 0) AS DOUBLE), 8) AS tpr,
       ROUND(SUM((1 - y) * yhat)
             / CAST(NULLIF(SUM(1 - y), 0) AS DOUBLE), 8) AS fpr
FROM s GROUP BY 1
""",
)
def q_fairness_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subgroup fairness audit of a frozen classifier: per protected-group
    proxy (nation mod {FAIR_GROUPS}), the selection rate (demographic
    parity read), TPR and FPR (equalized-odds read) against the actual
    label — the model-governance table served next to
    ``logreg_calibration_bins`` (calibration) and ``propensity_ipw``
    (effect estimation). Gaps across rows are the fairness metrics;
    per-group rows keep the query composable (max-gap is a 5-row fold).

    Determinism: the score threshold is applied to the {LOGREG_W['bias']}-
    family sigmoid under the usual rounding schedule (z@9dp, sig@10dp), so
    yhat is an exact 0/1 in both engines; every metric is exact-int
    counts with one IEEE division; empty denominators are NULL via
    NULLIF, never 0/0.

    100-TB shape: map-side score -> one hash agg on a {FAIR_GROUPS}-
    bounded key. Nothing else."""
    z = F.round(
        F.lit(LOGREG_W["bias"])
        + F.lit(LOGREG_W["tokens_per_100"]) * (F.col("c_acctbal") / 10000.0)
        + F.lit(LOGREG_W["alpha_ratio"]) * (F.col("c_nationkey") / 25.0),
        9,
    )
    s = load_table(spark, sf_dir, "customer").select(
        (F.col("c_nationkey") % FAIR_GROUPS).alias("grp"),
        (F.col("c_mktsegment") == "BUILDING").cast("int").alias("y"),
        (F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 10) > 0.5)
        .cast("int")
        .alias("yhat"),
    )
    return s.groupBy(F.col("grp").cast("long").alias("grp")).agg(
        F.count("*").cast("long").alias("n"),
        F.round(F.sum("y") / F.count("*").cast("double"), 8).alias("base_rate"),
        F.round(F.sum("yhat") / F.count("*").cast("double"), 8).alias("pred_rate"),
        F.round(
            F.sum(F.col("y") * F.col("yhat"))
            / F.nullif(F.sum("y"), F.lit(0)).cast("double"),
            8,
        ).alias("tpr"),
        F.round(
            F.sum((F.lit(1) - F.col("y")) * F.col("yhat"))
            / F.nullif(F.sum(F.lit(1) - F.col("y")), F.lit(0)).cast("double"),
            8,
        ).alias("fpr"),
    )


# --- k-anonymity / l-diversity audit -----------------------------------------

KANON_K = 5          # minimum safe equivalence-class size
KANON_BAL_BUCKET = 1000   # quasi-identifier coarsening for acctbal


@query(
    "k_anonymity_audit",
    oracle=f"""
WITH sens AS (
    SELECT DISTINCT o_custkey AS ck FROM orders
    WHERE o_orderpriority = '1-URGENT'
), rows_q AS (
    SELECT CAST(c.c_nationkey AS BIGINT) AS nation,
           c.c_mktsegment AS segment,
           CAST(FLOOR(c.c_acctbal / {KANON_BAL_BUCKET}) AS BIGINT) AS bal_bucket,
           CAST(s.ck IS NOT NULL AS INTEGER) AS sensitive
    FROM customer c LEFT JOIN sens s ON s.ck = c.c_custkey
)
SELECT nation, segment, bal_bucket,
       CAST(COUNT(*) AS BIGINT)                    AS class_size,
       CAST(COUNT(DISTINCT sensitive) AS BIGINT)   AS l_diversity,
       COUNT(*) < {KANON_K}                        AS k_violation,
       COUNT(DISTINCT sensitive) = 1               AS homogeneous
FROM rows_q
GROUP BY 1, 2, 3
""",
)
def q_k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity / l-diversity audit (Sweeney 2002; Machanavajjhala
    2007) over the quasi-identifier set (nation, market segment,
    coarsened balance) with an URGENT-order flag as the sensitive
    attribute — the release-gate check next to ``dp_noisy_counts``
    (noise) and ``pii_scrub`` (redaction): every equivalence class
    reports its size, its l-diversity, and the two failure modes
    (class smaller than k={KANON_K}; homogeneous sensitive value, the
    attack l-diversity exists to stop).

    Exact integers end to end; one map-combinable aggregate over the
    bounded QI key space plus a broadcast-able distinct sensitive-set
    join — the fact table is scanned once. At 100 TB the class table is
    |QI-combinations| rows, the release decision's natural grain."""
    sens = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
    )
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal"
    )
    rows_q = c.join(
        F.broadcast(sens.withColumn("s", F.lit(1))), "c_custkey", "left"
    ).select(
        F.col("c_nationkey").cast("long").alias("nation"),
        F.col("c_mktsegment").alias("segment"),
        F.floor(F.col("c_acctbal") / KANON_BAL_BUCKET).cast("long").alias(
            "bal_bucket"
        ),
        F.coalesce(F.col("s"), F.lit(0)).alias("sensitive"),
    )
    return (
        rows_q.groupBy("nation", "segment", "bal_bucket")
        .agg(
            F.count("*").cast("long").alias("class_size"),
            F.count_distinct("sensitive").cast("long").alias("l_diversity"),
        )
        .select(
            "nation",
            "segment",
            "bal_bucket",
            "class_size",
            "l_diversity",
            (F.col("class_size") < KANON_K).alias("k_violation"),
            (F.col("l_diversity") == 1).alias("homogeneous"),
        )
    )


# --- ROC AUC of a document-quality signal ------------------------------------

AUC_POS_LANG = "en"   # positive class
AUC_BUCKET = 100      # chars per prefix bucket (value-domain bucketing,
                      # same bounded-metric-range argument as MW_BUCKET)


@query(
    "roc_auc_eval",
    oracle=f"""
WITH s AS (
    SELECT CAST(n_chars AS BIGINT) AS vc,
           CAST(lang = '{AUC_POS_LANG}' AS INTEGER) AS pos
    FROM documents
), grp AS (
    SELECT vc, CAST(COUNT(*) AS BIGINT) AS cnt,
           CAST(SUM(pos) AS BIGINT) AS npv
    FROM s GROUP BY 1
), pre AS (
    SELECT vc, cnt, npv,
           CAST(SUM(cnt) OVER (ORDER BY vc) - cnt AS BIGINT) AS prev
    FROM grp
), agg AS (
    SELECT CAST(SUM(npv) AS BIGINT) AS n_pos,
           CAST(SUM(cnt - npv) AS BIGINT) AS n_neg,
           CAST(SUM(npv * (2 * prev + cnt + 1)) AS BIGINT) AS r2x
    FROM pre
)
SELECT n_pos, n_neg,
       ROUND((r2x - n_pos * (n_pos + 1))
             / (2.0 * n_pos * n_neg), 8) AS auc,
       ROUND((r2x - n_pos * (n_pos + 1))
             / (1.0 * n_pos * n_neg) - 1.0, 8) AS gini
FROM agg
""",
)
def q_roc_auc_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC AUC (+ Gini) of ``n_chars`` as a classifier score for the
    '{AUC_POS_LANG}' class — the standard threshold-free binary-ranking
    metric, computed through the rank-statistic identity
    AUC = U / (n_pos * n_neg) with tie-averaged ranks (a tied pair
    contributes 1/2, the trapezoidal ROC convention). Complements
    ``logreg_calibration_bins`` (calibration) and ``decile_lift_table``
    (gains): this is the DISCRIMINATION axis of model eval.

    Exactness: identical machinery to ``mann_whitney_u`` — the doubled
    positive-class rank sum 2*R_pos = sum_v npv*(2*prev_v + cnt_v + 1)
    is exact int64 (long-safe to ~1e9 rows; decimal(38,0) beyond), and
    AUC/Gini are single fixed divisions of exact integers, ROUND 8.

    Plan: one scan to score-group grain, a bucketed two-phase prefix
    count over {AUC_BUCKET}-char buckets (intra-bucket window + bounded
    broadcast bucket totals — no global sort), then a single-row
    readout. 100-TB: shuffles only the distinct-score table; AUC over a
    trillion predictions costs one map-combinable group-count plus a
    distinct-score-grain prefix."""
    from pyspark.sql import Window

    from ..operators.windows import bounded_window

    s = _docs(spark, sf_dir).select(
        F.col("n_chars").cast("long").alias("vc"),
        (F.col("lang") == AUC_POS_LANG).cast("int").alias("pos"),
    )
    grp = (
        s.groupBy("vc")
        .agg(
            F.count("*").cast("long").alias("cnt"),
            F.sum("pos").cast("long").alias("npv"),
        )
        .withColumn("bucket", F.floor(F.col("vc") / AUC_BUCKET))
    )
    w_intra = (
        Window.partitionBy("bucket")
        .orderBy("vc")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    intra = grp.select(
        "vc",
        "cnt",
        "npv",
        "bucket",
        (F.sum("cnt").over(w_intra) - F.col("cnt")).alias("prev_in_bucket"),
    )
    btot = grp.groupBy("bucket").agg(F.sum("cnt").cast("long").alias("bc"))
    w_b = bounded_window(
        "bucket",
        bound=f"bucket totals: n_chars domain / {AUC_BUCKET}, bounded",
        queries=("roc_auc_eval",),
    ).rowsBetween(Window.unboundedPreceding, 0)
    bpre = btot.select(
        "bucket", (F.sum("bc").over(w_b) - F.col("bc")).alias("bucket_prev")
    )
    agg = (
        intra.join(F.broadcast(bpre), "bucket")
        .select(
            "cnt",
            "npv",
            (F.col("bucket_prev") + F.col("prev_in_bucket")).alias("prev"),
        )
        .agg(
            F.sum("npv").cast("long").alias("n_pos"),
            F.sum(F.col("cnt") - F.col("npv")).cast("long").alias("n_neg"),
            F.sum(F.col("npv") * (2 * F.col("prev") + F.col("cnt") + 1))
            .cast("long")
            .alias("r2x"),
        )
    )
    np_, nn_ = F.col("n_pos"), F.col("n_neg")
    u2x = F.col("r2x") - np_ * (np_ + 1)
    return agg.select(
        "n_pos",
        "n_neg",
        F.round(u2x / (2.0 * np_ * nn_), 8).alias("auc"),
        F.round(u2x / (1.0 * np_ * nn_) - 1.0, 8).alias("gini"),
    )


# --- character-entropy quality signal ------------------------------------------

# per-char ln(p) quantized to integer nano-nats (operators/lnq.py, the
# r11 ln-quantization rule): the per-doc entropy numerator sum(cn*units)
# is exact integer math; the per-doc entropy is then itself quantized to
# nano-nats (one bit-identical double division+round) so the per-LANG
# mean/max aggregate over varying doc lengths stays exact-integer too.
_ENT_LNU_SQL = ln_units_sql(
    "len(list_filter(chars, x -> x = c)) / CAST(len(chars) AS DOUBLE)"
)


@query(
    "char_entropy_quality",
    oracle=f"""
WITH cs AS (
    SELECT doc_id, lang,
           list_filter(string_split(regexp_replace(lower(text),
               '[^a-z]+', '', 'g'), ''), c -> c <> '') AS chars
    FROM documents
), ent AS (
    SELECT doc_id, lang,
           CAST(len(chars) AS BIGINT) AS n_alpha,
           CAST(ROUND(-CAST(list_sum(list_transform(list_distinct(chars),
                    c -> len(list_filter(chars, x -> x = c))
                         * {_ENT_LNU_SQL})) AS DOUBLE)
                / CAST(len(chars) AS DOUBLE)) AS BIGINT) AS h_units
    FROM cs WHERE len(chars) > 0
)
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       ROUND(CAST(SUM(h_units) AS DOUBLE) / COUNT(*)
             / {LN_UNIT_SCALE}.0, 8) AS mean_char_entropy,
       CAST(MAX(h_units) AS DOUBLE) / {LN_UNIT_SCALE}.0 AS max_char_entropy
FROM ent GROUP BY lang
""",
)
def q_char_entropy_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language mean/max Shannon character entropy (nats) over the
    a-z distribution of each document — the cheap gibberish/boilerplate
    detector corpus filters run next to length and stopword rules (low
    entropy = repeated characters / template residue; high = encoded
    noise). Joins ``quality_gopher`` (token-shape rules) and
    ``repetition_ratios`` (n-gram repeats) as the character-level axis.

    Determinism (r11 ln-quantization rule, operators/lnq.py): entropy
    is a sum of <= 26 per-character terms; each ln(p) is quantized to
    integer nano-nats, the per-doc numerator sum(cn*units) is exact
    integer math, and the per-doc entropy is itself quantized to
    nano-nat units via one bit-identical double division+round —
    combine-order free at every level, no decimal machinery.

    Plan & 100-TB shape: explode to char grain, then THREE
    map-combinable hash aggregates in whole-stage codegen:
    (doc, char) counts (combine to <= 26 rows per doc map-side),
    per-doc decimal term sums, per-language rollup. An earlier
    array-HOF (no-explode) form was 18x slower at 25x — interpreted
    lambda evaluation priced O(26 x n_chars) per row outside codegen;
    the oracle keeps that list form (DuckDB executes it natively).
    The shuffles carry (doc, char) partial counts and one decimal per
    doc — both tiny relative to the scan."""
    chars = F.filter(
        F.split(F.regexp_replace(F.lower(F.col("text")), "[^a-z]+", ""), ""),
        lambda c: c != "",
    )
    base = (
        _docs(spark, sf_dir)
        .select("doc_id", "lang", chars.alias("chars"))
        .where(F.size("chars") > 0)
        .select(
            "doc_id", "lang", F.size("chars").alias("n"),
            F.explode("chars").alias("c"),
        )
    )
    cnt = base.groupBy("doc_id", "lang", "n", "c").agg(
        F.count("*").alias("cn")
    )
    p = F.col("cn") / F.col("n").cast("double")
    ent = cnt.groupBy("doc_id", "lang", "n").agg(
        F.sum(F.col("cn") * ln_units(p)).alias("num")
    ).select(
        "doc_id",
        "lang",
        F.round(
            -F.col("num").cast("double") / F.col("n").cast("double"), 0
        )
        .cast("long")
        .alias("h_units"),
    )
    return ent.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.round(
            F.sum("h_units").cast("double")
            / F.count("*")
            / F.lit(LN_UNIT_SCALE_F),
            8,
        ).alias("mean_char_entropy"),
        # integer-unit readout: MAX over exact bigints, one final
        # division by the unit scale — identical nearest double both
        # engines (the r9 decimal-flatten rule satisfied by construction)
        (F.max("h_units").cast("double") / F.lit(LN_UNIT_SCALE_F)).alias(
            "max_char_entropy"
        ),
    )
