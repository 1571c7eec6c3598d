"""PySpark-native analytics engine with the query/data-processing surface of
GIMINSU/CCIRecommenderDataPipeline (see /root/reference, SURVEY.md).

The reference is an eager pandas ETL pipeline (symbol universe -> incremental
OHLCV ingest -> rolling CCI -> strategy-grid trade simulation -> best-strategy
selection -> daily recommendations -> order reconciliation). This package
re-expresses every operator of that pipeline (SURVEY.md section 2) as lazy,
declarative PySpark DataFrame programs so Catalyst/Tungsten choose the physical
strategy, plus the large-scale training-data operators (dedup, similarity
search, text analysis, multimodal columns) a 100 TB pipeline needs.

Layout:
    session.py    SparkSession builder tuned for scale (AQE, Arrow, shuffle)
    schemas.py    explicit StructTypes -- the canonical cast layer
    sources/      table loaders + the prices view derived from testdata
    functions/    scalar function surface (F1-F11)
    operators/    one module per SURVEY section-2 family
    plans/        the queries()/oracle_sql() registry (driver contract)
    streaming/    incremental merge + event-time windows
    pipeline.py   E1-E3 end-to-end jobs
"""

__version__ = "0.1.0"
