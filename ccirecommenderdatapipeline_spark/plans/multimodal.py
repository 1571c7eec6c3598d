"""Multimodal queries (north-star surface). ``media_catalog`` is fully
relational over the binary column and oracle-checked; the two mapInPandas
stages (feature extraction, frame sampling) are genuinely non-SQL ops —
registered without oracles (driver records rows-only checks), with their
determinism pinned by tests/test_multimodal.py instead.
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


@query("media_features", oracle=None)
def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched mapInPandas feature extraction (deterministic fake
    codec — see operators/multimodal.py). No SQL oracle: Python-side md5
    feature math isn't SQL-expressible; determinism is pinned by unit tests."""
    return extract_features(_media(spark, sf_dir).repartition(8, "media_id"))


@query("media_frame_sample", oracle=None)
def q_media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling as a row-expanding mapInPandas (UDTF shape): every
    4th 32-byte frame of each video payload."""
    return sample_frames(_media(spark, sf_dir).repartition(8, "media_id"))
