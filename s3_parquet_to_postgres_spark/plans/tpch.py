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


SPECS: list[QuerySpec] = [
    QuerySpec("tpch_q3_shipping_priority", q3_shipping_priority, Q3_SQL),
    QuerySpec("tpch_q5_local_supplier", q5_local_supplier_volume, Q5_SQL),
    QuerySpec("tpch_q6_revenue_forecast", q6_revenue_forecast, Q6_SQL),
    QuerySpec("tpch_q10_returned_items", q10_returned_items, Q10_SQL),
    QuerySpec("tpch_q18_large_volume", q18_large_volume_customer, Q18_SQL),
]
