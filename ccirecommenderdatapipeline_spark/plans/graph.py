"""Recursive / iterative graph queries (north-star surface).

Spark 4 ships ANSI ``WITH RECURSIVE`` (iterative union execution under
Catalyst), which finally covers the hierarchy-walk shapes that previously
needed driver-side loops — the same shape as `dedup_clusters`' fixed-
iteration label propagation, but with the engine owning the fixpoint.

The customer hierarchy here is the decimal-shift tree (parent =
c_custkey // 10, roots at c_custkey < 10): synthetic but structurally a
real org/BOM hierarchy — depth grows with log10(|customers|), so the
recursion is bounded (~6 levels at sf1) while the frontier at each level is
data-sized. Each recursion step is one co-partitioned hash join of the
frontier against the (small, broadcast) parent map.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from ..sources.tables import load_table
from .registry import query

_HIER_SQL = """
WITH RECURSIVE walk(c_custkey, root_key, depth) AS (
    SELECT c_custkey, c_custkey AS root_key, 0 AS depth
    FROM customer WHERE c_custkey < 10
    UNION ALL
    SELECT c.c_custkey, w.root_key, w.depth + 1
    FROM customer c JOIN walk w ON w.c_custkey = c.c_custkey // 10
    WHERE c.c_custkey >= 10
)
SELECT CAST(c_custkey AS BIGINT)  AS c_custkey,
       CAST(root_key AS BIGINT)   AS root_key,
       CAST(depth AS INTEGER)     AS depth
FROM walk
"""

_ROLLUP_SQL = """
WITH RECURSIVE walk(c_custkey, root_key, depth, acctbal) AS (
    SELECT c_custkey, c_custkey, 0, c_acctbal
    FROM customer WHERE c_custkey < 10
    UNION ALL
    SELECT c.c_custkey, w.root_key, w.depth + 1, c.c_acctbal
    FROM customer c JOIN walk w ON w.c_custkey = c.c_custkey // 10
    WHERE c.c_custkey >= 10
)
SELECT CAST(root_key AS BIGINT)  AS root_key,
       CAST(COUNT(*) AS BIGINT)  AS n_members,
       CAST(MAX(depth) AS INTEGER) AS max_depth,
       CAST(SUM(CAST(ROUND(acctbal, 2) AS DECIMAL(18,2))) AS DOUBLE)
           AS subtree_acctbal
FROM walk
GROUP BY root_key
"""


@query("hierarchy_walk", oracle=_HIER_SQL)
def q_hierarchy_walk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI WITH RECURSIVE hierarchy walk: every customer labeled with its
    root ancestor and depth in the decimal-shift tree. The Spark side IS the
    recursive CTE (Catalyst's iterative UnionLoop execution); DuckDB runs
    the identical text. Spark's `//` is implemented with DIV for integer
    division."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(_HIER_SQL.replace("// 10", "DIV 10"))


@query("hierarchy_rollup", oracle=_ROLLUP_SQL)
def q_hierarchy_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subtree rollup over the recursive walk: member count, max depth and
    exact DECIMAL subtree balance per root — the aggregate-after-fixpoint
    shape (org rollups, BOM cost explosions). One hash aggregate over the
    recursion output; the recursion itself shuffles only the per-level
    frontier."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(_ROLLUP_SQL.replace("// 10", "DIV 10"))
