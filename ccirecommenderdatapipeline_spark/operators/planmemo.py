"""Per-session memo for shared LAZY view plans (r15 build-path fix).

~40 registered queries embed the same prices -> CCI chain (and the
simulator/covariance views on top of it), and every embedding rebuilds
the identical DataFrame: a few hundred py4j round-trips plus a Catalyst
re-analysis of the growing tree PER OP (Dataset creation analyzes
eagerly, so an n-op chain costs O(n^2) analysis). That build cost is
driver latency inside every timed bench cell (optimization guide §5:
the driver should do almost no work).

``plan_memo`` caches the BUILT DataFrame per (SparkSession, key). A
DataFrame is an immutable lazy plan — no data, no persisted partitions,
nothing keyed on input contents — so handing the same object to every
consumer changes neither results nor execution (CacheManager already
matched these subtrees by analyzed plan; the memo just skips rebuilding
the identical tree). The dict lives ON the session object, so it dies
with the session and cannot leak across engines, tests, or processes.

Persisted views must re-apply ``.persist()`` on every return (not only
on build): ``spark.catalog.clearCache()`` between queries (check_oracle,
bench --full) unregisters the cache entry, and the re-persist is what
restores the declarative marker for the next consumer — the same
behavior the rebuild-every-time path had.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession


def plan_memo(
    spark: SparkSession, key: tuple, builder: Callable[[], DataFrame]
) -> DataFrame:
    try:
        cache = spark._shared_view_plan_cache
    except AttributeError:
        cache = spark._shared_view_plan_cache = {}
    df = cache.get(key)
    if df is None:
        df = cache[key] = builder()
    return df


# every per-session plan-memo attribute (operators/literals.py owns the
# second one); reset_plan_memos must cover them all
_MEMO_ATTRS = ("_shared_view_plan_cache", "_literal_table_plan_cache")


def reset_plan_memos(spark: SparkSession) -> None:
    """Drop the per-session plan memos. For the PLAN-AUDIT harnesses only
    (tools/audit_plans.py::_iter_plans): a memo-hit plan shares exprIds
    across embeddings and skips inner-view ``persist`` re-application, so
    a query's printed plan (analyzed hash, InMemoryTableScan splice)
    would depend on which queries the session built EARLIER — full-loop,
    ``--only``, and pytest fingerprints would disagree. Resetting between
    queries pins the fingerprint to the reproducible fresh-session
    build, the shape the committed baseline was taken in. Execution
    paths (bench, check_oracle, time_queries) keep the memo: it is the
    real engine behavior being measured."""
    for attr in _MEMO_ATTRS:
        try:
            delattr(spark, attr)
        except AttributeError:
            pass
