"""Extension query batch 3 — the remaining TPC-H query shapes (Q2, Q7,
Q9, Q11, Q12, Q20, Q21), completing all 22 TPC-H patterns in the
registry.

The driver's star schema has no ``partsupp`` table and ``lineitem``
lacks ``l_commitdate``/``l_receiptdate``/``l_shipmode``, so each query
documents its adaptation:

- part-supplier relationships come from observed ``lineitem`` pairs;
- "supply cost" is the minimum observed ``l_extendedprice`` per
  (part, supplier) — raw-double MIN, so it is bit-identical across
  engines and safe to equality-join on;
- "late" means shipped > N days after the order date;
- Q12's ship-mode classes are proxied by ``l_linestatus``.

Same registry contract and cross-engine determinism rules as
``bolson_spark.queries`` (decimal-exact money, identical aliases on
both engines, timestamps rendered as strings). Merged into ``QUERIES``
there.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bolson_spark.queries import QuerySpec, _dec, _t
from bolson_spark.queries_ext import _REV_SQL, _rev


def q_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for each STANDARD size-9 part, the ASIA
    supplier(s) offering the minimum observed price. partsupp is
    derived from lineitem pairs; "cost" is MIN(l_extendedprice) per
    (part, supplier) — a raw-double MIN, deterministic to equality-
    join against the per-part minimum (the correlated-subquery
    decorrelation). All dims broadcast; the two aggregates share one
    shuffle on l_partkey prefixes.
    """
    part = _t(spark, sf_dir, "part").where(
        (F.col("p_type") == "STANDARD") & (F.col("p_size") == 9)
    )
    sup = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    asia_sup = sup.join(
        F.broadcast(nation), sup.s_nationkey == nation.n_nationkey
    ).join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)

    li = _t(spark, sf_dir, "lineitem")
    ps = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey, "left_semi")
        .join(
            F.broadcast(asia_sup.select("s_suppkey")),
            li.l_suppkey == F.col("s_suppkey"),
            "left_semi",
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min("l_extendedprice").alias("supply_cost"))
    )
    min_cost = ps.groupBy("l_partkey").agg(
        F.min("supply_cost").alias("min_cost")
    )
    best = ps.join(
        min_cost,
        (ps.l_partkey == min_cost.l_partkey)
        & (ps.supply_cost == min_cost.min_cost),
        "left_semi",
    )
    return (
        best.join(F.broadcast(asia_sup), best.l_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(part), best.l_partkey == part.p_partkey)
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            F.col("l_partkey").alias("p_partkey"),
            "p_name",
            "supply_cost",
        )
        .orderBy(F.desc("s_acctbal"), F.asc("s_name"), F.asc("p_partkey"))
        .limit(100)
    )


O_MIN_COST_SUPPLIER = """
WITH asia_sup AS (
  SELECT s_suppkey, s_acctbal, s_name, n_name
  FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'ASIA'
),
ps AS (
  SELECT l_partkey, l_suppkey, MIN(l_extendedprice) AS supply_cost
  FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part
                      WHERE p_type = 'STANDARD' AND p_size = 9)
    AND l_suppkey IN (SELECT s_suppkey FROM asia_sup)
  GROUP BY l_partkey, l_suppkey
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_name, supply_cost
FROM ps
JOIN asia_sup ON l_suppkey = s_suppkey
JOIN part     ON l_partkey = p_partkey
WHERE supply_cost = (SELECT MIN(supply_cost) FROM ps i
                     WHERE i.l_partkey = ps.l_partkey)
ORDER BY s_acctbal DESC, s_name ASC, p_partkey ASC
LIMIT 100
"""


def q_nations_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: shipping volume between NATION_3 and NATION_8
    (both directions) per ship year, 1996-1997. Both nation dims
    broadcast; the pair filter is a residual on the broadcast joins,
    so the only shuffles are the two fact joins on their keys.
    """
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    sup = _t(spark, sf_dir, "supplier")
    n1 = _t(spark, sf_dir, "nation").alias("n1")
    n2 = _t(spark, sf_dir, "nation").alias("n2")
    pair = (
        (F.col("n1.n_name") == "NATION_3") & (F.col("n2.n_name") == "NATION_8")
    ) | ((F.col("n1.n_name") == "NATION_8") & (F.col("n2.n_name") == "NATION_3"))
    j = (
        li.join(sup, li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(n1), sup.s_nationkey == F.col("n1.n_nationkey"))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n2), cust.c_nationkey == F.col("n2.n_nationkey"))
        .where(pair)
    )
    return (
        j.select(
            F.col("n1.n_name").alias("supp_nation"),
            F.col("n2.n_name").alias("cust_nation"),
            F.year("l_shipdate").cast("int").alias("l_year"),
            _rev().alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.sum("volume").cast("double").alias("revenue"))
    )


O_NATIONS_VOLUME = f"""
SELECT supp_nation, cust_nation, l_year,
       CAST(SUM(volume) AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(EXTRACT(year FROM l_shipdate) AS INT) AS l_year,
         {_REV_SQL} AS volume
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1998-01-01'
    AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_8')
      OR (n1.n_name = 'NATION_8' AND n2.n_name = 'NATION_3'))
)
GROUP BY supp_nation, cust_nation, l_year
"""


def q_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit on 'widget' parts per supplier nation and
    order year. With no partsupp, supply cost is proxied as
    0.5 * p_retailprice * l_quantity (decimal-exact). The part-name
    LIKE filter pushes to the part scan and the filtered part dim
    broadcasts; nation broadcasts; the fact joins shuffle on their
    keys once each.
    """
    part = _t(spark, sf_dir, "part").where(F.col("p_name").like("%widget%"))
    li = _t(spark, sf_dir, "lineitem")
    sup = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders")
    nation = _t(spark, sf_dir, "nation")
    half = F.lit(0.5).cast("decimal(2,1)")
    amount = _rev() - half * _dec("p_retailprice") * _dec("l_quantity")
    j = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(sup, li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nation), sup.s_nationkey == nation.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
    )
    return (
        j.select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(F.sum("amount").cast("double").alias("sum_profit"))
    )


O_PRODUCT_TYPE_PROFIT = f"""
SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
FROM (
  SELECT n_name AS nation,
         CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
         {_REV_SQL}
           - CAST(0.5 AS DECIMAL(2,1))
             * CAST(p_retailprice AS DECIMAL(12,2))
             * CAST(l_quantity AS DECIMAL(12,2)) AS amount
  FROM lineitem
  JOIN part     ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN orders   ON l_orderkey = o_orderkey
  WHERE p_name LIKE '%widget%'
)
GROUP BY nation, o_year
"""


def q_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose shipped value from NATION_1
    suppliers exceeds 0.1% of that nation's total shipped value.
    partsupp value is proxied by sum(l_extendedprice) per part. The
    global total is a single-row aggregate broadcast into the HAVING
    filter — no second pass over the fact table.
    """
    sup = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_1")
    n1_sup = sup.join(
        F.broadcast(nation), sup.s_nationkey == nation.n_nationkey, "left_semi"
    )
    li = _t(spark, sf_dir, "lineitem")
    n1_li = li.join(
        F.broadcast(n1_sup.select("s_suppkey")),
        li.l_suppkey == F.col("s_suppkey"),
        "left_semi",
    )
    per_part = n1_li.groupBy("l_partkey").agg(
        F.sum(_dec("l_extendedprice", 18)).alias("value_dec")
    )
    total = per_part.agg(
        F.sum("value_dec").cast("double").alias("total_value")
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .where(
            F.col("value_dec").cast("double") > F.lit(0.001) * F.col("total_value")
        )
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.col("value_dec").cast("double").alias("part_value"),
        )
    )


O_IMPORTANT_STOCK = """
WITH per_part AS (
  SELECT l_partkey,
         SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS value_dec
  FROM lineitem
  WHERE l_suppkey IN (
    SELECT s_suppkey FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_1')
  GROUP BY l_partkey
)
SELECT l_partkey AS p_partkey,
       CAST(value_dec AS DOUBLE) AS part_value
FROM per_part
WHERE CAST(value_dec AS DOUBLE) >
      0.001 * (SELECT CAST(SUM(value_dec) AS DOUBLE) FROM per_part)
"""


def q_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: per line-status class (the schema's stand-in
    for ship mode), how many critical- vs normal-priority orders had
    lines shipped late (> 30 days after order date) during 1997. The
    CASE aggregation runs map-side after one shuffled join on
    orderkey; the date filter pushes to the lineitem scan.
    """
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    orders = _t(spark, sf_dir, "orders")
    j = li.join(orders, li.l_orderkey == orders.o_orderkey).where(
        F.col("l_shipdate") > F.expr("o_orderdate + INTERVAL 30 DAYS")
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return j.groupBy("l_linestatus").agg(
        F.sum(F.when(is_high, 1).otherwise(0)).alias("high_line_count"),
        F.sum(F.when(is_high, 0).otherwise(1)).alias("low_line_count"),
    )


O_LATE_SHIPMENT_PRIORITY = """
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= '1997-01-01' AND l_shipdate < '1998-01-01'
  AND l_shipdate > o_orderdate + INTERVAL 30 DAY
GROUP BY l_linestatus
"""


def q_promo_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: NATION_2 suppliers who shipped more than 40
    units of some 'blue' part during 1997. The nested IN-subqueries
    decorrelate to: part-name semi-join -> per (part, supplier)
    quantity aggregate -> threshold filter -> supplier semi-join. The
    only fact shuffle is the (partkey, suppkey) aggregate.
    """
    part = _t(spark, sf_dir, "part").where(F.col("p_name").like("blue%"))
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    qty = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey, "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(_dec("l_quantity")).cast("double").alias("shipped_qty"))
        .where(F.col("shipped_qty") > 40.0)
    )
    sup = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_2")
    return (
        sup.join(F.broadcast(nation), sup.s_nationkey == nation.n_nationkey, "left_semi")
        .join(
            F.broadcast(qty.select("l_suppkey").distinct()),
            sup.s_suppkey == F.col("l_suppkey"),
            "left_semi",
        )
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


O_PROMO_PART_SUPPLIERS = """
SELECT s_suppkey, s_name
FROM supplier
WHERE s_nationkey IN (SELECT n_nationkey FROM nation WHERE n_name = 'NATION_2')
  AND s_suppkey IN (
    SELECT l_suppkey
    FROM lineitem
    WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'blue%')
      AND l_shipdate >= '1997-01-01' AND l_shipdate < '1998-01-01'
    GROUP BY l_partkey, l_suppkey
    HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) > 40.0)
ORDER BY s_suppkey
"""


def q_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: NATION_0 suppliers who were the ONLY late
    shipper (> 60 days after order date) on a finished multi-supplier
    order. The EXISTS/NOT-EXISTS pair becomes a left-semi join (some
    other supplier on the order) and a left-anti join (no other LATE
    supplier) — both shuffled on orderkey, no cross products.
    """
    orders = _t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    li = _t(spark, sf_dir, "lineitem")
    lines = li.join(
        F.broadcast(orders.select("o_orderkey", "o_orderdate")),
        li.l_orderkey == F.col("o_orderkey"),
    ).select(
        "l_orderkey",
        "l_suppkey",
        (F.col("l_shipdate") > F.expr("o_orderdate + INTERVAL 60 DAYS")).alias(
            "is_late"
        ),
    )
    late = lines.where(F.col("is_late")).select("l_orderkey", "l_suppkey").distinct()
    l1, l2 = late.alias("l1"), lines.alias("l2")
    with_other = l1.join(
        l2,
        (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
        & (F.col("l1.l_suppkey") != F.col("l2.l_suppkey")),
        "left_semi",
    )
    l3 = late.alias("l3")
    sole_late = with_other.join(
        l3,
        (F.col("l1.l_orderkey") == F.col("l3.l_orderkey"))
        & (F.col("l1.l_suppkey") != F.col("l3.l_suppkey")),
        "left_anti",
    )
    sup = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_0")
    n0_sup = sup.join(
        F.broadcast(nation), sup.s_nationkey == nation.n_nationkey, "left_semi"
    )
    return (
        sole_late.join(F.broadcast(n0_sup), F.col("l1.l_suppkey") == n0_sup.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(100)
    )


O_WAITING_SUPPLIERS = """
WITH lines AS (
  SELECT l_orderkey, l_suppkey,
         l_shipdate > o_orderdate + INTERVAL 60 DAY AS is_late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
),
late AS (
  SELECT DISTINCT l_orderkey, l_suppkey FROM lines WHERE is_late
)
SELECT s_name, COUNT(*) AS numwait
FROM late l1
JOIN supplier ON l1.l_suppkey = s_suppkey
WHERE s_nationkey IN (SELECT n_nationkey FROM nation WHERE n_name = 'NATION_0')
  AND EXISTS (SELECT 1 FROM lines l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM late l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey)
GROUP BY s_name
ORDER BY numwait DESC, s_name ASC
LIMIT 100
"""


TPCH_QUERIES: dict[str, QuerySpec] = {
    "min_cost_supplier": QuerySpec(
        q_min_cost_supplier, O_MIN_COST_SUPPLIER, ("relational",)
    ),
    "nations_volume": QuerySpec(q_nations_volume, O_NATIONS_VOLUME, ("relational",)),
    "product_type_profit": QuerySpec(
        q_product_type_profit, O_PRODUCT_TYPE_PROFIT, ("relational",)
    ),
    "important_stock": QuerySpec(
        q_important_stock, O_IMPORTANT_STOCK, ("relational",)
    ),
    "late_shipment_priority": QuerySpec(
        q_late_shipment_priority, O_LATE_SHIPMENT_PRIORITY, ("relational",)
    ),
    "promo_part_suppliers": QuerySpec(
        q_promo_part_suppliers, O_PROMO_PART_SUPPLIERS, ("relational",)
    ),
    "waiting_suppliers": QuerySpec(
        q_waiting_suppliers, O_WAITING_SUPPLIERS, ("relational",)
    ),
}
