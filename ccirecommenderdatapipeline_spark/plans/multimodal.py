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

from ..operators.multimodal import extract_features, media_table, sample_frames
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
