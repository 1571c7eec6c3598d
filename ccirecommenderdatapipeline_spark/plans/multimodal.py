"""Multimodal queries (north-star surface). All three are oracle-checked:
the deterministic fake codec is md5-based, so even the mapInPandas stages
(feature extraction, frame sampling) have exact DuckDB equivalents — the
payload is the utf-8 text bytes (pure ASCII in the fixture), so byte math
can be re-expressed over the string column. Array-typed outputs are
serialized to CSV strings: the driver's canonicalizer sorts columns via
pandas, which cannot hash raw list cells.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.multimodal import (
    RESIZE_TARGET_W,
    extract_features,
    media_table,
    resize_media,
    sample_frames,
)
from ..sources.tables import load_table
from .registry import query


def _media(spark: SparkSession, sf_dir: str) -> DataFrame:
    return media_table(load_table(spark, sf_dir, "documents"))


@query(
    "media_catalog",
    oracle="""
SELECT doc_id AS media_id,
       CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
            ELSE 'video' END                         AS kind,
       CAST(octet_length(encode(text)) AS BIGINT)    AS byte_len,
       md5(text)                                     AS content_hash,
       CAST(16 + n_chars % 64 AS INTEGER)            AS width,
       CAST(16 + doc_id % 32 AS INTEGER)             AS height
FROM documents
""",
)
def q_media_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed binary columns flowing through a relational plan: payload stays
    an opaque blob, the catalog projects only cheap derived columns (blobs
    never enter a shuffle)."""
    m = _media(spark, sf_dir)
    return m.select(
        "media_id", "kind",
        F.octet_length("payload").cast("long").alias("byte_len"),
        F.md5(F.decode("payload", "UTF-8")).alias("content_hash"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
    )


_HEX = "0123456789abcdef"

@query(
    "media_features",
    oracle=f"""
WITH m AS (
    SELECT doc_id AS media_id,
           ['image','audio','video'][CAST(doc_id % 3 AS INTEGER) + 1] AS kind,
           text, md5(text) AS h
    FROM documents
)
SELECT media_id, kind,
       CAST(length(text) AS BIGINT) AS byte_len,
       h                            AS content_hash,
       list_sum(list_transform(regexp_split_to_array(text, ''), c -> ord(c)))
           / length(text)           AS mean_byte,
       array_to_string(list_transform(range(0, 8), i ->
           CAST((strpos('{_HEX}', substr(h, 2*i + 1, 1)) - 1) * 16
              + (strpos('{_HEX}', substr(h, 2*i + 2, 1)) - 1) AS VARCHAR)), ',')
                                    AS feature_q
FROM m
""",
)
def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched mapInPandas feature extraction (deterministic fake
    codec — see operators/multimodal.py). The embedding-like float feature
    is emitted as its quantized byte CSV (exactly round-trippable: features
    are md5-digest bytes / 255), which the DuckDB oracle recomputes from
    md5 hex — so the whole Python codec stage is value-checked, not just
    row-counted."""
    feats = extract_features(_media(spark, sf_dir).repartition(8, "media_id"))
    return feats.select(
        "media_id", "kind", "byte_len", "content_hash", "mean_byte",
        F.array_join(
            F.transform("feature", lambda x: F.round(x * 255).cast("int").cast("string")),
            ",",
        ).alias("feature_q"),
    )


@query(
    "media_frame_sample",
    oracle="""
WITH v AS (
    SELECT doc_id AS media_id, text, length(text) AS n
    FROM documents WHERE doc_id % 3 = 2
), e AS (
    SELECT media_id, text, n,
           unnest(range(0, CAST(ceil(n / 32.0) AS BIGINT), 4)) AS idx
    FROM v
)
SELECT media_id,
       CAST(idx AS INTEGER)                         AS frame_idx,
       md5(substr(text, CAST(idx * 32 + 1 AS INTEGER), 32)) AS frame_hash,
       CAST(least(32, n - idx * 32) AS INTEGER)     AS frame_len
FROM e
""",
)
def q_media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling as a row-expanding mapInPandas (UDTF shape): every
    4th 32-byte frame of each video payload. Oracle: the fake codec's
    frames are byte slices of the (ASCII) payload, so DuckDB reproduces
    every frame hash with substr + md5 over an unnested stride range."""
    return sample_frames(_media(spark, sf_dir).repartition(8, "media_id"))


@query(
    "media_dedup",
    oracle="""
WITH docs2 AS (
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + 100000, text FROM documents
), hashed AS (
    SELECT doc_id AS media_id,
           md5(text) AS content_hash,
           CAST(octet_length(encode(text)) AS BIGINT) AS byte_len
    FROM docs2
)
SELECT content_hash,
       CAST(COUNT(*) AS BIGINT) AS n_copies,
       CAST(MIN(media_id) AS BIGINT) AS canonical_id,
       CAST(SUM(byte_len) AS BIGINT) AS total_bytes
FROM hashed
GROUP BY content_hash
HAVING COUNT(*) > 1
""",
)
def q_media_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact binary dedup by content hash — the first stage of any
    multimodal ingest (byte-identical images/clips collapse before decode
    ever runs). Only (hash, id, byte_len) projections enter the shuffle;
    the blob itself never leaves the scan stage, which is the invariant
    that matters when payloads are MB-scale at 100 TB. Runs over the
    recrawl-doubled corpus (plans/text.py:with_recrawl — every payload
    re-ingested once under a new id), so every group is a real duplicate
    set with the ORIGINAL id as canonical."""
    from .text import with_recrawl

    docs2 = with_recrawl(load_table(spark, sf_dir, "documents"))
    m = media_table(docs2)
    hashed = m.select(
        "media_id",
        F.md5(F.decode("payload", "UTF-8")).alias("content_hash"),
        F.octet_length("payload").cast("long").alias("byte_len"),
    )
    return (
        hashed.groupBy("content_hash")
        .agg(
            F.count("*").alias("n_copies"),
            F.min("media_id").alias("canonical_id"),
            F.sum("byte_len").alias("total_bytes"),
        )
        .filter(F.col("n_copies") > 1)
    )


# --- cross-modal duplicate reconciliation ------------------------------------

from pyspark.sql import Window  # noqa: E402
from ..operators.text import with_recrawl  # noqa: E402
from .registry import ORACLES  # noqa: E402
from .text import DOCS2_CTE  # noqa: E402


@query(
    "cross_modal_dedup",
    oracle=f"""
WITH {DOCS2_CTE.strip().rstrip()},
exact_pairs AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM docs2 a JOIN docs2 b
      ON md5(a.text) = md5(b.text) AND a.doc_id < b.doc_id
), near_pairs AS (
    SELECT doc_a, doc_b, jaccard FROM ({ORACLES["dedup_ngram_jaccard"]})
)
SELECT COALESCE(e.doc_a, n.doc_a) AS doc_a,
       COALESCE(e.doc_b, n.doc_b) AS doc_b,
       e.doc_a IS NOT NULL AS by_hash,
       n.doc_a IS NOT NULL AS by_text,
       n.jaccard,
       CASE WHEN e.doc_a IS NOT NULL AND n.doc_a IS NOT NULL THEN 'both'
            WHEN e.doc_a IS NOT NULL THEN 'hash_only'
            ELSE 'text_only' END AS verdict
FROM exact_pairs e
FULL OUTER JOIN near_pairs n ON n.doc_a = e.doc_a AND n.doc_b = e.doc_b
""",
)
def q_cross_modal_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modal duplicate reconciliation — the audit a multimodal ingest
    runs after its per-modality dedup stages: binary content-hash verdicts
    (stage 1, `media_dedup`'s mechanism) FULL OUTER joined with text
    near-dup verdicts (`dedup_ngram_jaccard`'s inverted index), classifying
    every candidate pair as both / hash_only / text_only. hash_only pairs
    are byte-identical blobs whose extracted text diverged (codec drift);
    text_only pairs are re-encoded media with matching content — exactly
    the two disagreement classes an ingest pipeline escalates. Reuses BOTH
    the Spark builders and the DuckDB oracle of the underlying stages (the
    oracle nests the jaccard query's SQL verbatim), so the composition
    stays hash-checked end to end. Scale: hash groups are collect_list
    bounded (identical blobs are rare); the verdict join keys on the pair."""
    from .text import q_dedup_ngram_jaccard

    docs2 = with_recrawl(load_table(spark, sf_dir, "documents"))
    groups = (
        docs2.select("doc_id", F.md5("text").alias("h"))
        .groupBy("h")
        .agg(F.array_sort(F.collect_list("doc_id")).alias("docs"))
        .filter(F.size("docs") >= 2)
    )
    exact = groups.select(
        F.explode(
            F.expr(
                "flatten(transform(sequence(1, size(docs) - 1), "
                "i -> transform(sequence(i + 1, size(docs)), "
                "j -> struct(docs[i - 1] AS doc_a, docs[j - 1] AS doc_b))))"
            )
        ).alias("p")
    ).select("p.doc_a", "p.doc_b")
    near = q_dedup_ngram_jaccard(spark, sf_dir).select("doc_a", "doc_b", "jaccard")
    e = exact.alias("e")
    n = near.alias("n")
    j = e.join(
        n,
        (F.col("e.doc_a") == F.col("n.doc_a")) & (F.col("e.doc_b") == F.col("n.doc_b")),
        "full_outer",
    )
    by_hash = F.col("e.doc_a").isNotNull()
    by_text = F.col("n.doc_a").isNotNull()
    return j.select(
        F.coalesce(F.col("e.doc_a"), F.col("n.doc_a")).alias("doc_a"),
        F.coalesce(F.col("e.doc_b"), F.col("n.doc_b")).alias("doc_b"),
        by_hash.alias("by_hash"),
        by_text.alias("by_text"),
        F.col("n.jaccard").alias("jaccard"),
        F.when(by_hash & by_text, "both")
        .when(by_hash, "hash_only")
        .otherwise("text_only")
        .alias("verdict"),
    )


@query(
    "media_resize",
    oracle=f"""
WITH img AS (
    SELECT doc_id AS media_id, text,
           CAST(16 + n_chars % 64 AS INTEGER) AS width,
           CAST(16 + doc_id % 32 AS INTEGER)  AS height,
           CAST(octet_length(encode(text)) AS INTEGER) AS n
    FROM documents WHERE CAST(doc_id % 3 AS INTEGER) = 0
), strided AS (
    SELECT media_id, width, height, n,
           hex(encode(text)) AS hx,
           CAST(greatest(1, width // {RESIZE_TARGET_W}) AS INTEGER) AS stride
    FROM img
), resized AS (
    SELECT media_id, width, height, stride,
           CAST((width + stride - 1) // stride AS INTEGER) AS new_width,
           array_to_string(
               list_transform(range(1, n + 1, stride),
                              i -> substr(hx, CAST(2 * i - 1 AS INTEGER), 2)), '')
               AS rhex
    FROM strided
)
SELECT media_id, width, height, stride, new_width,
       CAST(length(rhex) // 2 AS INTEGER) AS resized_len,
       md5(rhex)                          AS resized_hash
FROM resized
""",
)
def q_media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize stage of the media pipeline (the brief's decode → resize →
    feature-extract chain): every image payload downsampled by the fake
    codec's byte stride inside an Arrow ``mapInPandas`` batch. The oracle
    reproduces each resized payload with a stride walk over the HEX of the
    encoded bytes (2 hex chars per byte), so the check is byte-faithful for
    any payload, not just ASCII; both engines hash the uppercase hex. Blobs
    stay out of every exchange — the stage emits geometry + hash only."""
    return resize_media(_media(spark, sf_dir).repartition(8, "media_id"))
