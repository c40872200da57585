"""TPC-H-shaped analytical queries adapted to the synthetic star schema
(the driver's tables carry a subset of the TPC-H columns). These are
the headline bench queries: multi-join + aggregation plans where the
broadcast/shuffle strategy decides 100 TB viability.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import dsum, sql_dsum
from .base import QuerySpec, t


def _revenue() -> F.Column:
    return dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)


_REV_SQL = sql_dsum("l_extendedprice * (1 - l_discount)", 4)


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q3: revenue of unshipped orders for one market segment.
    # customer is the small side of orders (broadcast after filter);
    # orders->lineitem is the one real shuffle, on the join key.
    cut = F.lit("1998-06-15").cast("timestamp_ntz")
    c = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cut)
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cut)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey",
                 F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
                 "o_orderpriority")
        .agg(_revenue().alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


Q3_SQL = f"""
SELECT l_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
       o_orderpriority,
       {_REV_SQL} AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-06-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-06-15 00:00:00'
GROUP BY l_orderkey, strftime(o_orderdate, '%Y-%m-%d'), o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q5: revenue by nation where customer and supplier share the
    # nation. All dimensions broadcast; the lineitem->orders shuffle is
    # the only big exchange.
    r = t(spark, sf_dir, "region")
    n = t(spark, sf_dir, "nation")
    c = t(spark, sf_dir, "customer")
    s = t(spark, sf_dir, "supplier")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    li = t(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s),
              (li.l_suppkey == s.s_suppkey)
              & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(_revenue().alias("revenue"))
    )


Q5_SQL = f"""
SELECT r_name, n_name, {_REV_SQL} AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY r_name, n_name
"""


def q6_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q6: pure filter + scalar aggregate; tests predicate
    # pushdown into the parquet scan (no join, no grouping shuffle).
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
        & (F.col("l_discount").between(0.03, 0.07))
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        dsum(F.col("l_extendedprice") * F.col("l_discount"), 4)
        .alias("revenue"),
        F.count("*").alias("matched_rows"),
    )


Q6_SQL = f"""
SELECT {sql_dsum('l_extendedprice * l_discount', 4)} AS revenue,
       count(*) AS matched_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
"""


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q10: customers who returned the most revenue.
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    n = t(spark, sf_dir, "nation")
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(_revenue().alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


Q10_SQL = f"""
SELECT c_custkey, c_name, n_name, {_REV_SQL} AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


def q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q18: orders whose total quantity exceeds a threshold --
    # aggregate-then-semi-join pattern (HAVING subquery).
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(dsum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 300)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select("c_custkey", "c_name", "l_orderkey",
                F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
                F.col("o_totalprice").alias("totalprice"),
                "total_qty")
    )


Q18_SQL = f"""
SELECT c_custkey, c_name, l_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
       o_totalprice AS totalprice, total_qty
FROM (
  SELECT l_orderkey,
         {sql_dsum('l_quantity')} AS total_qty
  FROM lineitem GROUP BY l_orderkey HAVING total_qty > 300
)
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
"""


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q14: share of revenue from promo parts in one month.
    # Conditional aggregation over a fact->dim join; part broadcasts.
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp_ntz"))
    )
    p = t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").startswith("PROMO"), rev).otherwise(F.lit(0.0))
    joined = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    return joined.agg(
        (F.lit(100.0) * dsum(promo, 4) / dsum(rev, 4)).alias("promo_pct"),
        F.count("*").alias("matched_rows"),
    )


Q14_SQL = f"""
SELECT 100.0 * ({sql_dsum("CASE WHEN p_type LIKE 'PROMO%' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END", 4)})
         / ({sql_dsum('l_extendedprice * (1 - l_discount)', 4)}) AS promo_pct,
       count(*) AS matched_rows
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-10-01 00:00:00'
"""


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q17 (adapted to available columns: p_brand instead of
    # brand+container): revenue lost to small orders -- the correlated
    # scalar subquery (per-part avg quantity) decorrelated into an
    # aggregate + join. The threshold avg is computed with exact scaled-
    # integer sums so both engines derive the identical cutoff and no
    # borderline row can flip.
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23")
    per_part = li.groupBy("l_partkey").agg(
        (dsum("l_quantity", 4) / F.count("*")).alias("avg_qty")
    )
    out = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(per_part, "l_partkey")
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
    )
    return out.agg(
        (dsum("l_extendedprice", 4) / F.lit(7.0)).alias("avg_yearly"),
        F.count("*").alias("matched_rows"),
    )


Q17_SQL = f"""
WITH per_part AS (
  SELECT l_partkey,
         {sql_dsum('l_quantity', 4)} / count(*) AS avg_qty
  FROM lineitem GROUP BY l_partkey
)
SELECT {sql_dsum('l_extendedprice', 4)} / 7.0 AS avg_yearly,
       count(*) AS matched_rows
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN per_part USING (l_partkey)
WHERE p_brand = 'Brand#23' AND l_quantity < 0.2 * avg_qty
"""


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q7 (adapted: l_shipdate year stands in for the missing
    # supp/cust nation pair filter's fixed nations -- we keep ALL nation
    # pairs where customer and supplier nations differ).
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    s = t(spark, sf_dir, "supplier")
    n1 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation",
                 F.year("l_shipdate").cast("long").alias("l_year"))
        .agg(_revenue().alias("revenue"))
    )


Q7_SQL = f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS l_year,
       {_REV_SQL} AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE n1.n_name <> n2.n_name
GROUP BY n1.n_name, n2.n_name, year(l_shipdate)
"""


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q13: distribution of customers by order count (left join
    # keeps zero-order customers; two-level aggregation).
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(
        ~F.col("o_orderpriority").startswith("4")
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count("*").alias("custdist")
    )


Q13_SQL = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer
  LEFT JOIN (SELECT * FROM orders
             WHERE o_orderpriority NOT LIKE '4%') o
    ON c_custkey = o_custkey
  GROUP BY c_custkey
)
GROUP BY c_count
"""


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q15: supplier(s) with maximum revenue in a quarter -- the
    # revenue "view" + scalar-max pattern.
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp_ntz"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        _revenue().alias("total_revenue")
    )
    max_rev = rev.agg(F.max("total_revenue").alias("m"))
    s = t(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(max_rev), rev.total_revenue == max_rev.m)
        .join(s, rev.supplier_no == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


Q15_SQL = f"""
WITH revenue0 AS (
  SELECT l_suppkey AS supplier_no, {_REV_SQL} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM revenue0 JOIN supplier ON supplier_no = s_suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue0)
"""


def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q19 (adapted to available columns): disjunctive predicate
    # groups over a fact->dim join -- the OR-of-ANDs pattern Catalyst
    # must keep push-down-able.
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    joined = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    g1 = (
        (F.col("p_brand") == "Brand#12") & (F.col("p_size").between(1, 15))
        & (F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 30)
    )
    g2 = (
        (F.col("p_brand") == "Brand#23") & (F.col("p_size").between(1, 25))
        & (F.col("l_quantity") >= 10) & (F.col("l_quantity") <= 40)
    )
    g3 = (
        (F.col("p_brand") == "Brand#34") & (F.col("p_size").between(1, 35))
        & (F.col("l_quantity") >= 20) & (F.col("l_quantity") <= 50)
    )
    return joined.filter(g1 | g2 | g3).agg(
        _revenue().alias("revenue"), F.count("*").alias("matched_rows")
    )


Q19_SQL = f"""
SELECT {_REV_SQL} AS revenue, count(*) AS matched_rows
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 30)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
       AND l_quantity BETWEEN 10 AND 40)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
       AND l_quantity BETWEEN 20 AND 50)
"""


def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q22 (adapted: nationkey stands in for the phone prefix):
    # above-average-balance customers with no orders. Scalar-subquery
    # average (exact arithmetic) + anti join + aggregation.
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    pos = c.filter(F.col("c_acctbal") > 0.0)
    avg_bal = (
        pos.agg((dsum("c_acctbal", 2) / F.count("*")).alias("a"))
        .first()["a"]
    )
    rich = c.filter(F.col("c_acctbal") > F.lit(avg_bal))
    dormant = rich.join(o, rich.c_custkey == o.o_custkey, "left_anti")
    return (
        dormant.groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            dsum("c_acctbal", 2).alias("totacctbal"),
        )
    )


Q22_SQL = f"""
WITH avg_bal AS (
  SELECT {sql_dsum('c_acctbal', 2)} / count(*) AS a
  FROM customer WHERE c_acctbal > 0.0
)
SELECT c_nationkey, count(*) AS numcust,
       {sql_dsum('c_acctbal', 2)} AS totacctbal
FROM customer
WHERE c_acctbal > (SELECT a FROM avg_bal)
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_nationkey
"""


SPECS: list[QuerySpec] = [
    QuerySpec("tpch_q3_shipping_priority", q3_shipping_priority, Q3_SQL),
    QuerySpec("tpch_q5_local_supplier", q5_local_supplier_volume, Q5_SQL),
    QuerySpec("tpch_q6_revenue_forecast", q6_revenue_forecast, Q6_SQL),
    QuerySpec("tpch_q7_volume_shipping", q7_volume_shipping, Q7_SQL),
    QuerySpec("tpch_q10_returned_items", q10_returned_items, Q10_SQL),
    QuerySpec("tpch_q13_customer_distribution", q13_customer_distribution,
              Q13_SQL),
    QuerySpec("tpch_q15_top_supplier", q15_top_supplier, Q15_SQL),
    QuerySpec("tpch_q14_promo_revenue", q14_promo_revenue, Q14_SQL),
    QuerySpec("tpch_q17_small_qty_revenue", q17_small_quantity_revenue,
              Q17_SQL),
    QuerySpec("tpch_q18_large_volume", q18_large_volume_customer, Q18_SQL),
    QuerySpec("tpch_q19_discounted_revenue", q19_discounted_revenue, Q19_SQL),
    QuerySpec("tpch_q22_dormant_customers", q22_dormant_customers, Q22_SQL),
]
