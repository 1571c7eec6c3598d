"""Item co-occurrence mining — the recommender-side ops a purchase-history
pipeline runs next to the price-signal side (reference daily_function.py's
recommendation lifecycle stops at per-symbol signals; these are the
catalog-level "customers who bought X also bought Y" aggregates that feed a
candidate generator).

Two classic shapes over the order history:

* ``market_basket_pairs`` — frequent-itemset mining at pair grain
  (Agrawal & Srikant's A-priori support/confidence/lift, VLDB 1994),
  i.e. the first ECLAT/A-priori pass a basket-analysis job materializes.
* ``item_item_cosine`` — Sarwar et al. (WWW 2001) item-item collaborative
  filtering: cosine similarity between items' customer-incidence vectors,
  top-k neighbors per item.

Scale notes (100 TB): both are self-joins on a transaction key. The
fan-out per key is bounded by the ITEM VOCABULARY (25 brands here; a
catalog's brand/category dim in production), so a basket of any size
explodes to at most |V| rows and C(|V|,2) pairs — the shuffle carries the
distinct (key, item) incidence, never the raw lineitem stream, and the
pair aggregate is map-combinable. For an unbounded vocabulary (raw SKU
grain) you would block first (LSH / minhash over baskets, as
plans/text.py does for documents) — documented here rather than
implemented because the bounded-dim variant is what the oracle can prove
exactly.

Determinism: every measure is an exact BIGINT count; ratios are single
IEEE-754 divisions (and one correctly-rounded sqrt) on identical integer
inputs, so both engines produce bit-identical doubles before the final
cosmetic ROUND.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query

# Pair must appear in >= this fraction of baskets — a FRACTION, not an
# absolute count, so the selectivity survives any scale factor.
MIN_SUPPORT = 0.025

TOP_NEIGHBORS = 3


def _order_brands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct (basket, item) incidence: order -> brands it contains.

    part is projected to its 2-column (partkey, brand) dim before the
    join; at testdata scale that side broadcasts, and at warehouse scale
    the projection keeps the shuffle payload to key+brand."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .select(F.col("l_orderkey").alias("ok"), F.col("p_brand").alias("brand"))
        .distinct()
    )


@query(
    "market_basket_pairs",
    oracle=f"""
WITH ob AS (
    SELECT DISTINCT l.l_orderkey AS ok, p.p_brand AS brand
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
), n AS (
    SELECT CAST(COUNT(DISTINCT ok) AS BIGINT) AS n_orders FROM ob
), bc AS (
    SELECT brand, CAST(COUNT(*) AS BIGINT) AS c FROM ob GROUP BY 1
), pairs AS (
    SELECT a.brand AS brand_a, b.brand AS brand_b,
           CAST(COUNT(*) AS BIGINT) AS pair_cnt
    FROM ob a JOIN ob b ON a.ok = b.ok AND a.brand < b.brand
    GROUP BY 1, 2
)
SELECT pairs.brand_a, pairs.brand_b, pair_cnt,
       ROUND(pair_cnt / n.n_orders, 8) AS support,
       ROUND(pair_cnt / ca.c, 8) AS conf_a_to_b,
       ROUND((pair_cnt * n.n_orders) / (CAST(ca.c AS DOUBLE) * cb.c), 8)
           AS lift
FROM pairs
JOIN bc ca ON ca.brand = pairs.brand_a
JOIN bc cb ON cb.brand = pairs.brand_b
CROSS JOIN n
WHERE pair_cnt / n.n_orders >= {MIN_SUPPORT}
""",
)
def q_market_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-priori pair pass: brand pairs co-purchased in >= {MIN_SUPPORT:.1%}
    of orders, with support, directed confidence P(b|a), and lift
    support(ab)/(support(a)*support(b)).

    Plan: one distinct (order, brand) incidence scan feeds three
    map-combinable aggregates (basket count, per-brand counts, pair
    counts via an ok-equi self-join with brand_a < brand_b to emit each
    unordered pair once); per-brand counts and the scalar basket total
    re-enter by broadcast. lift's numerator is an exact int64 product
    (pair_cnt, n_orders both bounded by basket count) divided once as a
    double — no summation-order exposure anywhere."""
    ob = _order_brands(spark, sf_dir).persist()
    n = ob.select(F.count_distinct("ok").cast("long").alias("n_orders"))
    bc = ob.groupBy("brand").agg(F.count("*").cast("long").alias("c"))
    b = ob.select(F.col("ok"), F.col("brand").alias("brand_b"))
    pairs = (
        ob.select("ok", F.col("brand").alias("brand_a"))
        .join(b, "ok")
        .where(F.col("brand_a") < F.col("brand_b"))
        .groupBy("brand_a", "brand_b")
        .agg(F.count("*").cast("long").alias("pair_cnt"))
    )
    ca = bc.select(F.col("brand").alias("brand_a"), F.col("c").alias("c_a"))
    cb = bc.select(F.col("brand").alias("brand_b"), F.col("c").alias("c_b"))
    return (
        pairs.join(F.broadcast(ca), "brand_a")
        .join(F.broadcast(cb), "brand_b")
        .crossJoin(F.broadcast(n))
        .where(F.col("pair_cnt") / F.col("n_orders") >= F.lit(MIN_SUPPORT))
        .select(
            "brand_a",
            "brand_b",
            "pair_cnt",
            F.round(F.col("pair_cnt") / F.col("n_orders"), 8).alias("support"),
            F.round(F.col("pair_cnt") / F.col("c_a"), 8).alias("conf_a_to_b"),
            F.round(
                (F.col("pair_cnt") * F.col("n_orders"))
                / (F.col("c_a").cast("double") * F.col("c_b")),
                8,
            ).alias("lift"),
        )
    )


@query(
    "item_item_cosine",
    oracle=f"""
WITH cb AS (
    SELECT DISTINCT o.o_custkey AS ck, p.p_brand AS brand
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN part p ON p.p_partkey = l.l_partkey
), bc AS (
    SELECT brand, CAST(COUNT(*) AS BIGINT) AS c FROM cb GROUP BY 1
), pairs AS (
    SELECT a.brand AS brand_a, b.brand AS brand_b,
           CAST(COUNT(*) AS BIGINT) AS both_cnt
    FROM cb a JOIN cb b ON a.ck = b.ck AND a.brand <> b.brand
    GROUP BY 1, 2
), scored AS (
    SELECT pairs.brand_a, pairs.brand_b, both_cnt,
           ROUND(both_cnt / sqrt(CAST(ca.c AS DOUBLE) * cb2.c), 8)
               AS cosine,
           ROW_NUMBER() OVER (
               PARTITION BY pairs.brand_a
               ORDER BY both_cnt / sqrt(CAST(ca.c AS DOUBLE) * cb2.c) DESC,
                        pairs.brand_b
           ) AS rnk
    FROM pairs
    JOIN bc ca ON ca.brand = pairs.brand_a
    JOIN bc cb2 ON cb2.brand = pairs.brand_b
)
SELECT brand_a, brand_b, both_cnt, cosine, CAST(rnk AS INT) AS rnk
FROM scored WHERE rnk <= {TOP_NEIGHBORS}
""",
)
def q_item_item_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item collaborative filtering (Sarwar et al. 2001): cosine
    similarity between brands' binary customer-incidence vectors,
    |A ∩ B| / sqrt(|A| |B|), top-{TOP_NEIGHBORS} neighbors per brand.

    Directed pairs (brand_a <> brand_b) so every brand gets its own
    neighbor list; rank ties break on brand_b for a total order. The
    window partitions by brand_a — |V| partitions of <= |V|-1 rows, never
    an unpartitioned sort. sqrt is IEEE-754 correctly rounded, so
    cosine is bit-identical across engines before the cosmetic ROUND.

    100-TB shape: incidence distinct + self-join on custkey (fan-out
    bounded by the brand vocabulary as in ``market_basket_pairs``), pair
    agg map-combinable, per-brand counts broadcast back; the neighbor
    window runs over the |V|^2-bounded pair table, not the corpus."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    cb = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .select(F.col("o_custkey").alias("ck"), F.col("p_brand").alias("brand"))
        .distinct()
        .persist()
    )
    bc = cb.groupBy("brand").agg(F.count("*").cast("long").alias("c"))
    b = cb.select("ck", F.col("brand").alias("brand_b"))
    pairs = (
        cb.select("ck", F.col("brand").alias("brand_a"))
        .join(b, "ck")
        .where(F.col("brand_a") != F.col("brand_b"))
        .groupBy("brand_a", "brand_b")
        .agg(F.count("*").cast("long").alias("both_cnt"))
    )
    ca = bc.select(F.col("brand").alias("brand_a"), F.col("c").alias("c_a"))
    cb2 = bc.select(F.col("brand").alias("brand_b"), F.col("c").alias("c_b"))
    cosine = F.col("both_cnt") / F.sqrt(
        F.col("c_a").cast("double") * F.col("c_b")
    )
    w = Window.partitionBy("brand_a").orderBy(cosine.desc(), F.asc("brand_b"))
    scored = (
        pairs.join(F.broadcast(ca), "brand_a")
        .join(F.broadcast(cb2), "brand_b")
        .select(
            "brand_a",
            "brand_b",
            "both_cnt",
            F.round(cosine, 8).alias("cosine"),
            F.row_number().over(w).cast("int").alias("rnk"),
        )
    )
    return scored.where(F.col("rnk") <= TOP_NEIGHBORS)
