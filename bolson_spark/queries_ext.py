"""Extension query batch 2 — deeper relational coverage (TPC-H Q4/Q8/
Q14-Q19/Q22 shapes adapted to the testdata star schema), the as-of and
range join operators, and TF-IDF term scoring over documents.

Same registry contract and cross-engine determinism rules as
``bolson_spark.queries`` (decimal-exact money, identical aliases,
round(.,6) on derived doubles). Merged into ``QUERIES`` there.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bolson_spark.operators.asof import asof_join, range_join_count
from bolson_spark.queries import QuerySpec, _dec, _t

def _rev() -> F.Column:
    one = F.lit(1).cast("decimal(3,2)")
    return _dec("l_extendedprice") * (one - _dec("l_discount", 4))


_REV_SQL = (
    "CAST(l_extendedprice AS DECIMAL(12,2))"
    " * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))"
)


# ---------------------------------------------------------------------------
# TPC-H-shaped relational queries
# ---------------------------------------------------------------------------


def q_order_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: per-priority count of Q3'96 orders having at
    least one line shipped >90 days after the order date (EXISTS ->
    left-semi join; the date filter is pushed to the orders scan)."""
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1996-07-01") & (F.col("o_orderdate") < "1996-10-01")
    )
    li = _t(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > F.expr("o_orderdate + INTERVAL 90 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


O_ORDER_PRIORITY_CHECK = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= '1996-07-01' AND o_orderdate < '1996-10-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
GROUP BY o_orderpriority
"""


def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: NATION_5 suppliers' share of PROMO-part revenue
    sold into the ASIA market, per order year. Dim side (nation,
    region) broadcasts; both fact filters push to the scans."""
    part = _t(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    cust = _t(spark, sf_dir, "customer")
    sup = _t(spark, sf_dir, "supplier")
    n1 = _t(spark, sf_dir, "nation").alias("n1")
    n2 = _t(spark, sf_dir, "nation").alias("n2")
    region = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    base = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey, "left_semi")
        .join(orders, F.col("l_orderkey") == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), cust.c_nationkey == F.col("n1.n_nationkey"))
        .join(F.broadcast(region), F.col("n1.n_regionkey") == region.r_regionkey)
        .join(sup, F.col("l_suppkey") == sup.s_suppkey)
        .join(F.broadcast(n2), sup.s_nationkey == F.col("n2.n_nationkey"))
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            _rev().alias("volume"),
            F.col("n2.n_name").alias("supp_nation"),
        )
    )
    return base.groupBy("o_year").agg(
        F.round(
            F.sum(F.when(F.col("supp_nation") == "NATION_5", F.col("volume"))).cast(
                "double"
            )
            / F.sum("volume").cast("double"),
            6,
        ).alias("mkt_share")
    )


O_MARKET_SHARE = f"""
SELECT o_year,
       ROUND(CAST(SUM(CASE WHEN supp_nation = 'NATION_5' THEN volume END)
                  AS DOUBLE)
             / CAST(SUM(volume) AS DOUBLE), 6) AS mkt_share
FROM (
  SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
         {_REV_SQL} AS volume,
         n2.n_name AS supp_nation
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region   ON n1.n_regionkey = r_regionkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'PROMO')
    AND r_name = 'ASIA'
    AND o_orderdate >= '1996-01-01' AND o_orderdate < '1998-01-01'
)
GROUP BY o_year
"""


def q_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: percent of Sep-1997 revenue from PROMO parts.
    Single-row global aggregate; part broadcasts into the join."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1997-09-01") & (F.col("l_shipdate") < "1997-10-01")
    )
    part = _t(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    return j.agg(
        F.round(
            F.lit(100.0)
            * F.sum(F.when(F.col("p_type") == "PROMO", _rev()).otherwise(F.lit(0))).cast(
                "double"
            )
            / F.sum(_rev()).cast("double"),
            6,
        ).alias("promo_revenue_pct")
    )


O_PROMO_REVENUE = f"""
SELECT ROUND(100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                                   THEN {_REV_SQL} ELSE 0 END) AS DOUBLE)
             / CAST(SUM({_REV_SQL}) AS DOUBLE), 6) AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= '1997-09-01' AND l_shipdate < '1997-10-01'
"""


def q_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) with max Q1'97 revenue. The scalar
    max comes from a broadcast single-row aggregate (no window over a
    single unbounded partition — that would serialize at scale)."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-04-01")
    )
    rev = (
        li.groupBy("l_suppkey")
        .agg(F.sum(_rev()).cast("double").alias("total_revenue"))
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    sup = _t(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(mx), rev.total_revenue == mx.mx, "left_semi")
        .join(sup, F.col("l_suppkey") == sup.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


O_TOP_SUPPLIER = f"""
WITH rev AS (
  SELECT l_suppkey, CAST(SUM({_REV_SQL}) AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= '1997-01-01' AND l_shipdate < '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
"""


def q_parts_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct supplier count per (brand, type, size)
    over observed lineitem pairs (the schema has no partsupp), brand
    Brand#1 excluded, eight target sizes. COUNT(DISTINCT) over a
    shuffled pre-dedup — partial aggregation keeps the shuffle small."""
    sizes = [1, 3, 9, 14, 19, 23, 36, 45]
    part = _t(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1") & F.col("p_size").isin(sizes)
    )
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


O_PARTS_SUPPLIER_COUNTS = """
SELECT p_brand, p_type, p_size,
       COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1'
  AND p_size IN (1, 3, 9, 14, 19, 23, 36, 45)
GROUP BY p_brand, p_type, p_size
"""


def q_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: yearly-averaged revenue from Brand#5 lineitems
    whose quantity is below half the part's average quantity. The
    correlated scalar subquery decorrelates to a per-part aggregate
    joined back (one shuffle each side on l_partkey)."""
    part = _t(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#5")
    li = _t(spark, sf_dir, "lineitem")
    brand_li = li.join(F.broadcast(part), li.l_partkey == part.p_partkey, "left_semi")
    avg_qty = brand_li.groupBy("l_partkey").agg(
        (F.sum(_dec("l_quantity")).cast("double") / F.count(F.lit(1))).alias("avg_qty")
    )
    j = brand_li.join(avg_qty, "l_partkey").where(
        F.col("l_quantity") < 0.5 * F.col("avg_qty")
    )
    return j.agg(
        F.round(F.sum(_dec("l_extendedprice")).cast("double") / F.lit(7.0), 6).alias(
            "avg_yearly"
        )
    )


O_SMALL_QTY_REVENUE = """
WITH brand_li AS (
  SELECT l_partkey, l_quantity, l_extendedprice
  FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_brand = 'Brand#5')
),
avg_q AS (
  SELECT l_partkey,
         CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
           AS avg_qty
  FROM brand_li GROUP BY l_partkey
)
SELECT ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
             / 7.0, 6) AS avg_yearly
FROM brand_li JOIN avg_q USING (l_partkey)
WHERE l_quantity < 0.5 * avg_qty
"""


def q_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: top-20 orders whose total quantity exceeds 250
    (99th percentile of the synthetic data). HAVING on the lineitem
    aggregate runs before the orders/customer joins, so only the ~1%
    qualifying orderkeys flow into them (and broadcast)."""
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity")).cast("double").alias("total_qty"))
        .where(F.col("total_qty") > 250.0)
    )
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    return (
        orders.join(F.broadcast(big), orders.o_orderkey == big.l_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_totalprice",
            "total_qty",
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
    )


O_LARGE_VOLUME_CUSTOMERS = """
WITH big AS (
  SELECT l_orderkey,
         CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING total_qty > 250.0
)
SELECT c_name, c_custkey, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
       o_totalprice, total_qty
FROM orders
JOIN big      ON o_orderkey = big.l_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 20
"""


def q_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: single-row revenue under a disjunction of
    (brand, quantity-range, size-range) predicates. The OR-of-ANDs
    stays inside one join's residual condition — Catalyst extracts the
    common l_partkey equi-key; part broadcasts."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    cond = (
        (
            (F.col("p_brand") == "Brand#3")
            & F.col("l_quantity").between(1, 11)
            & F.col("p_size").between(1, 5)
        )
        | (
            (F.col("p_brand") == "Brand#9")
            & F.col("l_quantity").between(10, 20)
            & F.col("p_size").between(1, 10)
        )
        | (
            (F.col("p_brand") == "Brand#15")
            & F.col("l_quantity").between(20, 30)
            & F.col("p_size").between(1, 15)
        )
    )
    return j.where(cond).agg(F.sum(_rev()).cast("double").alias("revenue"))


O_DISCOUNTED_REVENUE = f"""
SELECT CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#3'  AND l_quantity BETWEEN 1  AND 11
       AND p_size BETWEEN 1 AND 5)
   OR (p_brand = 'Brand#9'  AND l_quantity BETWEEN 10 AND 20
       AND p_size BETWEEN 1 AND 10)
   OR (p_brand = 'Brand#15' AND l_quantity BETWEEN 20 AND 30
       AND p_size BETWEEN 1 AND 15)
"""


def q_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: per-nation count and balance of customers with
    above-average positive balance and no orders. Scalar subquery
    broadcasts; NOT EXISTS is a left-anti join."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    avg_bal = cust.where(F.col("c_acctbal") > 0.0).agg(
        (F.sum(_dec("c_acctbal")).cast("double") / F.count(F.lit(1))).alias("avg_bal")
    )
    rich = cust.join(F.broadcast(avg_bal)).where(F.col("c_acctbal") > F.col("avg_bal"))
    idle = rich.join(orders, rich.c_custkey == orders.o_custkey, "left_anti")
    return idle.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("numcust"),
        F.sum(_dec("c_acctbal")).cast("double").alias("totacctbal"),
    )


O_IDLE_CUSTOMERS = """
SELECT c_nationkey, COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
FROM customer
WHERE c_acctbal > (
    SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
    FROM customer WHERE c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_nationkey
"""


# ---------------------------------------------------------------------------
# As-of join / range join (custom operators, SURVEY.md §2.3 "asof")
# ---------------------------------------------------------------------------


def q_asof_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase event attributed to the same user's
    most recent at-or-before view event (union + running last() — one
    shuffle, no quadratic candidate set; see operators/asof.py)."""
    ev = _t(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts"
    )
    views = ev.where(F.col("event_type") == "view").select(
        "user_id",
        F.col("ts").alias("view_ts"),
        F.col("event_id").alias("view_id"),
    )
    out = asof_join(
        purchases,
        views,
        on="user_id",
        left_ts="ts",
        right_ts="view_ts",
        right_cols=["view_id"],
        how="left",
        tiebreak="view_id",
    )
    return out.select("purchase_id", "user_id", "view_id")


O_ASOF_ATTRIBUTION = """
WITH u AS (
  SELECT user_id, ts, event_id, 1 AS tag, CAST(NULL AS BIGINT) AS view_id
  FROM events WHERE event_type = 'purchase'
  UNION ALL
  SELECT user_id, ts, event_id, 0 AS tag, event_id AS view_id
  FROM events WHERE event_type = 'view'
),
w AS (
  SELECT user_id, event_id, tag,
         last_value(view_id IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY ts ASC, tag ASC, view_id ASC NULLS FIRST
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS view_id
  FROM u
)
SELECT event_id AS purchase_id, user_id, view_id
FROM w WHERE tag = 1
"""


def q_signup_activity_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: per signup, the count of the user's events in the
    following 7 days. Equi-key (user_id) + range residual — a normal
    shuffled join, never a cross product."""
    ev = _t(spark, sf_dir, "events")
    signups = ev.where(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_id"), "user_id", "ts"
    )
    activity = ev.select(
        "user_id", F.col("ts").alias("ats"), F.col("event_id").alias("aid")
    )
    out = range_join_count(
        signups,
        activity,
        on="user_id",
        left_ts="ts",
        right_ts="ats",
        interval=F.expr("INTERVAL 7 DAYS"),
        count_col="aid",
        alias="n_follow",
    )
    return out.select("signup_id", "user_id", "n_follow")


O_SIGNUP_ACTIVITY_7D = """
SELECT s.event_id AS signup_id, s.user_id,
       COUNT(e.event_id) AS n_follow
FROM events s
LEFT JOIN events e
  ON e.user_id = s.user_id
 AND e.ts > s.ts AND e.ts <= s.ts + INTERVAL 7 DAY
WHERE s.event_type = 'signup'
GROUP BY s.event_id, s.user_id
"""


# ---------------------------------------------------------------------------
# TF-IDF term scoring (text-analysis extension)
# ---------------------------------------------------------------------------


def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document: tokenize (lowercased [a-z]+
    runs), tf per (doc, term), document frequency per term, idf =
    ln(N/df), rank by rounded score. df and N are broadcastable
    aggregates; the only large shuffle is the (doc, term) tf groupBy."""
    docs = _t(spark, sf_dir, "documents")
    n_docs = docs.count()
    from bolson_spark.functions.text import explode_once

    terms = explode_once(
        docs,
        ["doc_id"],
        F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)"),
        ["term"],
    )
    tf = terms.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = tf.join(df, "term").select(
        "doc_id",
        "term",
        F.round(
            F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6
        ).alias("score"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= 3)
        .select("doc_id", "term", "score", "rank")
    )


O_TFIDF_TOP_TERMS = """
WITH terms AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS term
  FROM documents
),
tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM terms GROUP BY doc_id, term
),
df AS (
  SELECT term, COUNT(*) AS df FROM tf GROUP BY term
),
n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents),
scored AS (
  SELECT doc_id, tf.term,
         ROUND(tf * ln(n_docs / df), 6) AS score
  FROM tf JOIN df ON tf.term = df.term CROSS JOIN n
)
SELECT doc_id, term, score, rank FROM (
  SELECT doc_id, term, score,
         CAST(row_number() OVER (
           PARTITION BY doc_id ORDER BY score DESC, term ASC) AS INT) AS rank
  FROM scored
) WHERE rank <= 3
"""


# ---------------------------------------------------------------------------
# Training-data pipeline compositions
# ---------------------------------------------------------------------------

_SW_SQL = "'the','a','of','and','to','in','is','it','that','for'"


def q_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical LLM-corpus cleaning pipeline as ONE declarative
    plan: quality scoring + token bounds + language allowlist + exact
    dedup (keep the min-doc_id representative per fingerprint). All
    stages fuse into a scan -> project -> one shuffle (fingerprint
    window) -> filter; no Python in the hot path."""
    from bolson_spark.functions.text import (
        doc_fingerprint,
        quality_score,
        token_count,
    )

    docs = _t(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        "source",
        "lang",
        token_count(F.col("text")).cast("int").alias("n_tokens"),
        F.round(quality_score(F.col("text")), 6).alias("quality"),
        doc_fingerprint(F.col("text")).alias("fp"),
    )
    w = Window.partitionBy("fp")
    return (
        scored.withColumn("rep", F.min("doc_id").over(w))
        .where(
            (F.col("doc_id") == F.col("rep"))
            & (F.col("quality") >= 0.5)
            & (F.col("n_tokens") >= 10)
            & F.col("lang").isin("en", "de", "fr", "es")
        )
        .select("doc_id", "source", "lang", "n_tokens", "quality")
    )


O_CLEAN_CORPUS = f"""
WITH t AS (
  SELECT doc_id, source, lang,
         CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
         CAST(len(list_filter(string_split(text, ' '),
                              w -> w IN ({_SW_SQL}))) AS INT) AS n_stop,
         md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fp
  FROM documents
),
scored AS (
  SELECT doc_id, source, lang, n_tokens,
         ROUND((least(CAST(n_tokens AS DOUBLE) / 64.0, 1.0)
                + CAST(n_stop AS DOUBLE) / n_tokens) / 2.0, 6) AS quality,
         MIN(doc_id) OVER (PARTITION BY fp) AS rep
  FROM t
)
SELECT doc_id, source, lang, n_tokens, quality
FROM scored
WHERE doc_id = rep AND quality >= 0.5 AND n_tokens >= 10
  AND lang IN ('en', 'de', 'fr', 'es')
"""


def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs at hamming distance <= 3 via 4x16-bit
    band self-join. With 4 bands, any pair within hamming 3 shares at
    least one exact band (pigeonhole), so the banded plan finds
    EXACTLY the same pairs as the O(n^2) scan the oracle runs — but
    its join key is the band value: candidate generation is an
    equi-join that touches only colliding docs, the 100 TB shape."""
    from bolson_spark.functions.dedup import _spread, simhash64_vectorized

    docs = _spread(_t(spark, sf_dir, "documents"))
    sigs = docs.select(
        "doc_id", simhash64_vectorized(F.col("text")).alias("simhash")
    )
    # The 64-bit hex simhash is split into two bigint halves ONCE per
    # row before the self-join; per-pair hamming is then two xor +
    # bit_count ops in codegen instead of an interpreted 16-nibble
    # fold over hex chars (the per-candidate cost is what explodes on
    # corpora with large duplicate groups).
    bands = (
        sigs.select(
            "doc_id",
            "simhash",
            F.conv(F.substring("simhash", 1, 8), 16, 10).cast("bigint").alias("hi"),
            F.conv(F.substring("simhash", 9, 8), 16, 10).cast("bigint").alias("lo"),
            F.explode(F.array(*[F.lit(i) for i in range(4)])).alias("band"),
        )
        .withColumn("band_key", F.expr("substr(simhash, band * 4 + 1, 4)"))
        .drop("simhash")
    )
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.hi").alias("hi_a"),
            F.col("a.lo").alias("lo_a"),
            F.col("b.hi").alias("hi_b"),
            F.col("b.lo").alias("lo_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    hamming = (
        F.bit_count(F.col("hi_a").bitwiseXOR(F.col("hi_b")))
        + F.bit_count(F.col("lo_a").bitwiseXOR(F.col("lo_b")))
    ).cast("int")
    return (
        cand.withColumn("hamming", hamming)
        .where(F.col("hamming") <= 3)
        .select("doc_a", "doc_b", "hamming")
    )


def _simhash_pairs_sql() -> str:
    from bolson_spark.queries import _simhash_sql

    nib = (
        "CAST(position(substr({s}.simhash, CAST(i AS INT), 1) "
        "IN '0123456789abcdef') - 1 AS BIGINT)"
    )
    return f"""
WITH sigs AS ({_simhash_sql()}),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         list_sum(list_transform(range(1, 17), i ->
           bit_count(xor({nib.format(s='a')}, {nib.format(s='b')}))))
           AS hamming
  FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, CAST(hamming AS INT) AS hamming
FROM pairs WHERE hamming <= 3
"""


def q_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~30% hash sample of the corpus: md5 of the doc id,
    first 16 bits compared against the rate threshold. Reproducible
    across runs, engines, and cluster sizes (no RNG state), and
    composable per-source — how large-corpus pipelines downsample."""
    docs = _t(spark, sf_dir, "documents")
    bucket = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4)
    return (
        docs.withColumn("bucket", bucket)
        .where(F.col("bucket") <= "4ccc")  # 0x4ccc / 0xffff ~ 0.2999
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.min("doc_id").alias("first_doc"),
        )
    )


O_HASH_SAMPLE = """
SELECT source, COUNT(*) AS n_sampled, MIN(doc_id) AS first_doc
FROM documents
WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) <= '4ccc'
GROUP BY source
"""


def q_orders_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window aggregation frames: per-customer running spend (ROWS
    UNBOUNDED PRECEDING..CURRENT) and lag-1 previous price. One shuffle
    on the partition key; both windows share a single sort."""
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.asc("o_orderdate"), F.asc("o_orderkey")
    )
    frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        "o_totalprice",
        F.sum(_dec("o_totalprice", 14)).over(frame).cast("double").alias(
            "running_spend"
        ),
        F.lag("o_totalprice").over(w).alias("prev_price"),
    )


O_ORDERS_RUNNING_TOTAL = """
SELECT o_custkey, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
       o_totalprice,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS running_spend,
       lag(o_totalprice) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
         AS prev_price
FROM orders
"""


def q_nation_supplier_roster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered array aggregation: per-nation sorted supplier roster
    (rendered as a joined string so the cross-engine hash compares a
    scalar, not engine-specific array formatting)."""
    sup = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    return (
        sup.join(F.broadcast(nation), sup.s_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.sum(_dec("s_acctbal")).cast("double").alias("sum_acctbal"),
            F.concat_ws("|", F.sort_array(F.collect_list("s_name"))).alias(
                "roster"
            ),
        )
    )


O_NATION_SUPPLIER_ROSTER = """
SELECT n_name,
       COUNT(*) AS n_suppliers,
       CAST(SUM(CAST(s_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS sum_acctbal,
       array_to_string(list_sort(list(s_name)), '|') AS roster
FROM supplier JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name
"""


def q_segment_sales_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The explicit salting path as a first-class registry query: the
    orders->customer equi-join runs through salted_join (fact side
    salted, dim side replicated 8x), then aggregates per market
    segment. Results are identical to the unsalted join — this entry
    differentially proves it against the plain-SQL oracle, the same
    way the scalable seq impl is proven against the exact one."""
    from bolson_spark.operators.skew import salted_join

    orders = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey"), "o_totalprice"
    )
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    j = salted_join(orders, cust, on="c_custkey", salt=8)
    return j.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(_dec("o_totalprice", 14)).cast("double").alias("sum_totalprice"),
    )


O_SEGMENT_SALES_SALTED = """
SELECT c_mktsegment, COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE)
         AS sum_totalprice
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


def q_user_profile_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series similarity search (the streaming-similarity papers'
    shape, Spark-first): build each user's daily activity profile
    (sum of event values per day), then cosine between user 0's
    profile and every other user over shared days — sparse-vector
    similarity as an equi-join on the time bucket, never a dense
    cross product. Top-5 by rounded cosine, id tiebreak. At scale the
    query profile broadcasts and the profiles table is partitioned by
    bucket."""
    ev = _t(spark, sf_dir, "events")
    profiles = ev.groupBy(
        "user_id", F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(F.sum(_dec("value", 14)).cast("double").alias("v"))
    q = profiles.where(F.col("user_id") == 0).select(
        F.col("day").alias("qday"), F.col("v").alias("qv")
    )
    norms = profiles.groupBy("user_id").agg(
        F.sum(F.col("v") * F.col("v")).alias("norm2")
    )
    qnorm = norms.where(F.col("user_id") == 0).select(
        F.col("norm2").alias("qnorm2")
    )
    dots = (
        profiles.where(F.col("user_id") != 0)
        .join(F.broadcast(q), profiles.day == F.col("qday"))
        .groupBy("user_id")
        .agg(F.sum(F.col("v") * F.col("qv")).alias("dot"))
    )
    return (
        dots.join(norms, "user_id")
        .crossJoin(F.broadcast(qnorm))
        .select(
            "user_id",
            F.round(
                F.col("dot") / F.sqrt(F.col("norm2") * F.col("qnorm2")), 6
            ).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("user_id"))
        .limit(5)
    )


O_USER_PROFILE_SIMILARITY = """
WITH profiles AS (
  SELECT user_id, strftime(ts, '%Y-%m-%d') AS day,
         CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS v
  FROM events GROUP BY user_id, day
),
norms AS (
  SELECT user_id, SUM(v * v) AS norm2 FROM profiles GROUP BY user_id
),
dots AS (
  SELECT p.user_id, SUM(p.v * q.v) AS dot
  FROM profiles p JOIN profiles q ON p.day = q.day
  WHERE q.user_id = 0 AND p.user_id != 0
  GROUP BY p.user_id
)
SELECT d.user_id,
       ROUND(d.dot / sqrt(n.norm2 *
         (SELECT norm2 FROM norms WHERE user_id = 0)), 6) AS cosine
FROM dots d JOIN norms n ON d.user_id = n.user_id
ORDER BY cosine DESC, d.user_id ASC
LIMIT 5
"""


def q_order_value_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile window: global order-value quartiles with per-quartile
    stats. The total order (price, orderkey tiebreak) makes tile
    assignment deterministic across engines. NOTE an unpartitioned
    ntile is a single-reducer sort (like exact seq numbering); the
    100 TB formulation replaces it with approx-percentile cut points
    broadcast as bucket thresholds — kept exact here because quartile
    membership of tie values is position-based and must match the
    oracle bit-for-bit."""
    orders = _t(spark, sf_dir, "orders")
    w = Window.orderBy(F.asc("o_totalprice"), F.asc("o_orderkey"))
    tiled = orders.withColumn("quartile", F.ntile(4).over(w).cast("int"))
    return tiled.groupBy("quartile").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
        F.sum(_dec("o_totalprice", 14)).cast("double").alias("sum_price"),
    )


O_ORDER_VALUE_QUARTILES = """
SELECT quartile, COUNT(*) AS n_orders,
       MIN(o_totalprice) AS min_price,
       MAX(o_totalprice) AS max_price,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS sum_price
FROM (
  SELECT o_totalprice,
         CAST(ntile(4) OVER (ORDER BY o_totalprice ASC, o_orderkey ASC)
              AS INT) AS quartile
  FROM orders
)
GROUP BY quartile
"""


def q_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: potential revenue increase — single-row
    filter-aggregate with all three predicates pushed to the scan;
    the canonical whole-stage-codegen scan+agg."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1998-01-01")
        & F.col("l_discount").between(0.02, 0.04)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.sum(_dec("l_extendedprice") * _dec("l_discount", 4))
        .cast("double")
        .alias("revenue")
    )


O_REVENUE_FORECAST = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
             * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= '1997-01-01' AND l_shipdate < '1998-01-01'
  AND l_discount BETWEEN 0.02 AND 0.04
  AND l_quantity < 24
"""


def q_customer_order_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of customers by order count,
    including zero-order customers (left join, count of non-null
    keys), then a second aggregate over the counts — two shuffles,
    the second over at most max(order-count) distinct keys."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


O_CUSTOMER_ORDER_HISTOGRAM = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
)
GROUP BY c_count
"""


# ---------------------------------------------------------------------------
# Batch event analytics (round 4): gap sessionization + SCD-2 state
# intervals — the warehouse-temporal counterparts of the streaming
# session_window / stateful operators.
# ---------------------------------------------------------------------------

# minutes of inactivity that closes a session — canonical definition
# lives in the package root so the streaming twin cannot drift
from bolson_spark import SESSION_GAP_MIN  # noqa: F401,E402


def q_sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BATCH gap-based sessionization (the offline twin of the
    streaming `events_sessions` session_window query): a session
    breaks after >=60 min of user inactivity; per session emit
    boundaries (epoch micros — engine-neutral integers), event count,
    and decimal-exact value sum.

    Shape: both windows partition by user_id, so the whole query is
    ONE shuffle on user_id (lag -> running sum of session starts ->
    groupBy(user_id, session_id) reuses the same partitioning; the
    aggregation is map-side combinable within partitions). At 100 TB
    this scales as users do — per-user event sequences sort locally,
    and AQE handles a power-user skew tail."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = SESSION_GAP_MIN * 60 * 1_000_000
    sess = (
        ev.select(
            "user_id", "ts", "event_id", "value",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("_us"),
        )
        .withColumn("_prev", F.lag("_us").over(w))
        .withColumn(
            "_new",
            (
                F.col("_prev").isNull()
                | ((F.col("_us") - F.col("_prev")) > gap_us)
            ).cast("int"),
        )
        .withColumn(
            "session_id",
            F.sum("_new").over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.min("_us").alias("session_start_us"),
        F.max("_us").alias("session_end_us"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum(_dec("value")).cast("double").alias("sum_value"),
    )


O_SESSIONIZE_EVENTS = f"""
WITH s AS (
  SELECT user_id, event_id, value, epoch_us(ts) AS us,
         lag(epoch_us(ts)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
  FROM events
),
marked AS (
  SELECT user_id, event_id, value, us,
         CASE WHEN prev_us IS NULL
                   OR us - prev_us > {SESSION_GAP_MIN * 60 * 1_000_000}
              THEN 1 ELSE 0 END AS new_sess
  FROM s
),
numbered AS (
  SELECT user_id, event_id, value, us,
         CAST(SUM(new_sess) OVER (
           PARTITION BY user_id ORDER BY us, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS session_id
  FROM marked
)
SELECT user_id, session_id,
       MIN(us) AS session_start_us,
       MAX(us) AS session_end_us,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
FROM numbered
GROUP BY user_id, session_id
"""


def q_scd2_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type-2 build from an event stream:
    collapse each user's event-type sequence into change-point
    intervals [valid_from, valid_to) with a NULL-open current row —
    the standard warehouse temporal-dimension load, expressed as two
    window passes (lag to find change points, lead over the filtered
    change rows to close intervals). Both windows partition by
    user_id: one shuffle total, per-user local sorts at scale."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("_us", "event_id")
    changes = (
        ev.select(
            "user_id", "event_id", "event_type",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("_us"),
        )
        .withColumn("_prev_type", F.lag("event_type").over(w))
        .where(
            F.col("_prev_type").isNull()
            | (F.col("_prev_type") != F.col("event_type"))
        )
    )
    w2 = Window.partitionBy("user_id").orderBy("_us", "event_id")
    return changes.select(
        "user_id",
        F.col("event_type").alias("state"),
        F.col("_us").alias("valid_from_us"),
        F.lead("_us").over(w2).alias("valid_to_us"),
        F.lead("_us").over(w2).isNull().alias("is_current"),
    )


O_SCD2_USER_STATE = """
WITH ordered AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
         lag(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
  FROM events
),
changes AS (
  SELECT user_id, event_type, event_id, us
  FROM ordered
  WHERE prev_type IS NULL OR prev_type <> event_type
)
SELECT user_id, event_type AS state, us AS valid_from_us,
       lead(us) OVER (
         PARTITION BY user_id ORDER BY us, event_id) AS valid_to_us,
       lead(us) OVER (
         PARTITION BY user_id ORDER BY us, event_id) IS NULL AS is_current
FROM changes
"""


# ---------------------------------------------------------------------------
# Iterative graph algorithm: PageRank over the part co-occurrence
# graph (round 4) — the "centrality on a derived graph" family every
# large-scale curation pipeline eventually needs (popularity priors,
# link-graph quality signals).
# ---------------------------------------------------------------------------

PR_QTY_MIN = 45  # bounds the co-occurrence graph to heavy order lines
PR_ITERS = 3
PR_DAMPING = 0.85


def q_part_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (3 unrolled power iterations, damping 0.85) over the
    undirected part co-occurrence graph: parts joined by appearing in
    the same order with l_quantity > 45.

    Iterative algorithms on Spark = unrolled join/agg rounds (the
    Pregel pattern without the framework): per iteration one equi-join
    of the edge list with the score table and one map-side-combined
    sum per destination. Edge construction is an equi-self-join on
    l_orderkey (Theta(sum of per-order pairs), bounded by the quantity
    filter, which is PUSHED to the lineitem scan). At 100 TB both the
    join and the aggregation shuffle on integer keys; a power-law hub
    part is AQE skew territory — same posture as the token pipelines.

    Hash-gate float discipline: FIXED-POINT integer arithmetic.
    Scores are bigint nano-units (1.0 = 10^9); per-edge contribution
    is integer division score_e9 div deg, the damping update is
    (85 * in_sum) div 100 + 150000000 — every operation is exact
    bigint math, so the result is bit-identical on any engine,
    partition order, or cluster size. Double- and decimal-domain
    variants were both measurably 1-ulp engine-divergent at rounding
    ties (~1/5000 casts); integer fixed point has no rounding mode at
    all. The div truncation (vs true rounding) perturbs each score by
    < 1e-9*deg — far below the 4th decimal anyone reads PageRank at."""
    li = (
        _t(spark, sf_dir, "lineitem")
        .where(F.col("l_quantity") > PR_QTY_MIN)
        .select("l_orderkey", "l_partkey")
    )
    a = li.select(F.col("l_orderkey"), F.col("l_partkey").alias("pa"))
    b = li.select(F.col("l_orderkey"), F.col("l_partkey").alias("pb"))
    pairs = a.join(b, "l_orderkey").where(F.col("pa") < F.col("pb"))
    sym = pairs.select(
        F.col("pa").alias("src"), F.col("pb").alias("dst")
    ).unionByName(
        pairs.select(F.col("pb").alias("src"), F.col("pa").alias("dst"))
    )
    deg = sym.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    vertices = li.select(F.col("l_partkey").alias("part_id")).distinct()
    scores = vertices.select(
        "part_id", F.lit(1_000_000_000).cast("bigint").alias("score_e9")
    )
    edges = sym.join(deg, "src")
    for _ in range(PR_ITERS):
        contrib = (
            edges.join(
                scores.select(
                    F.col("part_id").alias("src"), "score_e9"
                ),
                "src",
            )
            .select("dst", F.expr("score_e9 div deg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("in_sum"))
        )
        scores = vertices.join(
            contrib, vertices.part_id == contrib.dst, "left"
        ).select(
            "part_id",
            (
                F.lit(150_000_000).cast("bigint")
                + F.expr("(85 * coalesce(in_sum, 0L)) div 100")
            ).alias("score_e9"),
        )
    return scores.join(
        deg.select(F.col("src").alias("part_id"), "deg"), "part_id", "left"
    ).select(
        "part_id",
        F.col("score_e9").alias("pagerank_e9"),
        F.coalesce("deg", F.lit(0)).alias("degree"),
    )


def _part_pagerank_sql() -> str:
    it = """
it{n} AS (
  SELECT v.part_id,
         CAST(150000000 + (85 * COALESCE(s.in_sum, 0)) // 100 AS BIGINT)
           AS score_e9
  FROM vertices v
  LEFT JOIN (
    SELECT e.dst, CAST(SUM(p.score_e9 // e.deg) AS BIGINT) AS in_sum
    FROM edges e JOIN it{m} p ON e.src = p.part_id
    GROUP BY e.dst
  ) s ON v.part_id = s.dst
)"""
    iters = ",".join(it.format(n=i + 1, m=i) for i in range(PR_ITERS))
    return f"""
WITH li AS (
  SELECT l_orderkey, l_partkey FROM lineitem WHERE l_quantity > {PR_QTY_MIN}
),
pairs AS (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
sym AS (
  SELECT pa AS src, pb AS dst FROM pairs
  UNION ALL
  SELECT pb AS src, pa AS dst FROM pairs
),
deg AS (SELECT src, COUNT(*) AS deg FROM sym GROUP BY src),
edges AS (SELECT sym.src, sym.dst, deg.deg FROM sym JOIN deg USING (src)),
vertices AS (SELECT DISTINCT l_partkey AS part_id FROM li),
it0 AS (
  SELECT part_id, CAST(1000000000 AS BIGINT) AS score_e9 FROM vertices
),
{iters}
SELECT v.part_id, it{PR_ITERS}.score_e9 AS pagerank_e9,
       CAST(COALESCE(deg.deg, 0) AS BIGINT) AS degree
FROM vertices v
JOIN it{PR_ITERS} ON v.part_id = it{PR_ITERS}.part_id
LEFT JOIN deg ON v.part_id = deg.src
"""


EXT_QUERIES: dict[str, QuerySpec] = {
    "order_priority_check": QuerySpec(
        q_order_priority_check, O_ORDER_PRIORITY_CHECK, ("relational",)
    ),
    "market_share": QuerySpec(q_market_share, O_MARKET_SHARE, ("relational",)),
    "promo_revenue": QuerySpec(q_promo_revenue, O_PROMO_REVENUE, ("relational",)),
    "top_supplier": QuerySpec(q_top_supplier, O_TOP_SUPPLIER, ("relational",)),
    "parts_supplier_counts": QuerySpec(
        q_parts_supplier_counts, O_PARTS_SUPPLIER_COUNTS, ("relational",)
    ),
    "small_qty_revenue": QuerySpec(
        q_small_qty_revenue, O_SMALL_QTY_REVENUE, ("relational",)
    ),
    "large_volume_customers": QuerySpec(
        q_large_volume_customers, O_LARGE_VOLUME_CUSTOMERS, ("relational",)
    ),
    "discounted_revenue": QuerySpec(
        q_discounted_revenue, O_DISCOUNTED_REVENUE, ("relational",)
    ),
    "idle_customers": QuerySpec(q_idle_customers, O_IDLE_CUSTOMERS, ("relational",)),
    "asof_attribution": QuerySpec(
        q_asof_attribution, O_ASOF_ATTRIBUTION, ("relational", "asof")
    ),
    "signup_activity_7d": QuerySpec(
        q_signup_activity_7d, O_SIGNUP_ACTIVITY_7D, ("relational", "asof")
    ),
    "tfidf_top_terms": QuerySpec(q_tfidf_top_terms, O_TFIDF_TOP_TERMS, ("text",)),
    "clean_corpus": QuerySpec(
        q_clean_corpus, O_CLEAN_CORPUS, ("text", "dedup", "pipeline")
    ),
    "simhash_pairs": QuerySpec(q_simhash_pairs, _simhash_pairs_sql(), ("dedup",)),
    "hash_sample": QuerySpec(q_hash_sample, O_HASH_SAMPLE, ("text", "pipeline")),
    "orders_running_total": QuerySpec(
        q_orders_running_total, O_ORDERS_RUNNING_TOTAL, ("relational",)
    ),
    "nation_supplier_roster": QuerySpec(
        q_nation_supplier_roster, O_NATION_SUPPLIER_ROSTER, ("relational",)
    ),
    "segment_sales_salted": QuerySpec(
        q_segment_sales_salted, O_SEGMENT_SALES_SALTED, ("relational", "skew")
    ),
    "user_profile_similarity": QuerySpec(
        q_user_profile_similarity, O_USER_PROFILE_SIMILARITY, ("similarity",)
    ),
    "order_value_quartiles": QuerySpec(
        q_order_value_quartiles, O_ORDER_VALUE_QUARTILES, ("relational",)
    ),
    "revenue_forecast": QuerySpec(
        q_revenue_forecast, O_REVENUE_FORECAST, ("relational",)
    ),
    "customer_order_histogram": QuerySpec(
        q_customer_order_histogram, O_CUSTOMER_ORDER_HISTOGRAM, ("relational",)
    ),
    "sessionize_events": QuerySpec(
        q_sessionize_events, O_SESSIONIZE_EVENTS, ("relational", "sessions")
    ),
    "scd2_user_state": QuerySpec(
        q_scd2_user_state, O_SCD2_USER_STATE, ("relational", "temporal")
    ),
    "part_pagerank": QuerySpec(
        q_part_pagerank, _part_pagerank_sql(), ("graph", "iterative")
    ),
}
