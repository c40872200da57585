"""TPC-H-shaped analytical queries adapted to the synthetic star schema
(the driver's tables carry a subset of the TPC-H columns). These are
the headline bench queries: multi-join + aggregation plans where the
broadcast/shuffle strategy decides 100 TB viability.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions import dsum, sint, sql_dsum
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
    # The brand filter cuts lineitem to the qualifying parts FIRST
    # (broadcast join), and the per-part average is a window over that
    # reduced set -- a partkey equi-join keeps every line of a part, so
    # the windowed average equals the whole-table per-part average. The
    # aggregate-then-join-back alternative scans full lineitem twice.
    # Same scaled-integer arithmetic as the oracle for the cutoff.
    lip = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    w = Window.partitionBy("l_partkey")
    avg_qty = (
        F.sum(sint("l_quantity", 4)).over(w).cast("double") / F.lit(1e4)
        / F.count("*").over(w)
    )
    out = lip.withColumn("avg_qty", avg_qty).filter(
        F.col("l_quantity") < 0.2 * F.col("avg_qty")
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
    # Lazy checkpoint: the revenue rollup feeds both the scalar max
    # and the equality filter from one materialization of one
    # lineitem scan. The earlier global-window max put the whole
    # supplier-count table through ONE task; the broadcast-join
    # formulation without the checkpoint re-runs the scan +
    # aggregation to build the max.
    rev = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
            _revenue().alias("total_revenue")
        )
        .localCheckpoint(eager=False)
    )
    max_rev = rev.agg(F.max("total_revenue").alias("m"))
    s = t(spark, sf_dir, "supplier")
    return (
        rev.crossJoin(F.broadcast(max_rev))
        .filter(F.col("total_revenue") == F.col("m"))
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
    # TPC-H Q22 (adapted: nationkey stands in for the phone prefix,
    # and "dormant" means no orders since 2000-01-01 -- the synthetic
    # generator gives every customer at least one order overall, so
    # the unfiltered anti join would be empty by construction):
    # above-average-balance customers with no recent orders.
    # Scalar-subquery average (exact arithmetic) + anti join +
    # aggregation; the date predicate is pushed to the orders scan, so
    # the anti join's build side shrinks before any shuffle.
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp_ntz")
    )
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
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
GROUP BY c_nationkey
"""


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q2 (adapted: no partsupp table -- the part<->supplier
    # relation is derived from lineitem as DISTINCT pairs, and
    # s_acctbal stands in for ps_supplycost): for each qualifying part,
    # the European supplier(s) with the minimum balance. The correlated
    # scalar-min subquery decorrelates into a groupBy-min + join back.
    # The distinct-pairs shuffle is map-side combinable; all dims
    # broadcast.
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    s = t(spark, sf_dir, "supplier")
    eu = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_acctbal", "s_name", "n_name")
    )
    p = t(spark, sf_dir, "part").filter(F.col("p_type") == "LARGE")
    ps = (
        t(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    cand = ps.join(F.broadcast(p), ps.l_partkey == p.p_partkey).join(
        F.broadcast(eu), ps.l_suppkey == eu.s_suppkey
    )
    # Per-part min as a window over cand, not an aggregate joined back:
    # the join-back formulation re-evaluates cand -- and its lineitem
    # DISTINCT, the expensive scan -- twice, because Catalyst does not
    # deduplicate shared subplans. The window touches only the small
    # candidate set.
    min_bal = F.min("s_acctbal").over(Window.partitionBy("l_partkey"))
    return (
        cand.withColumn("min_bal", min_bal)
        .filter(F.col("s_acctbal") == F.col("min_bal"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_type")
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey"
        )
        .limit(100)
    )


Q2_SQL = """
WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
eu AS (
  SELECT s_suppkey, s_acctbal, s_name, n_name
  FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
),
cand AS (
  SELECT s_acctbal, s_name, n_name, p_partkey, p_type
  FROM ps
  JOIN part ON l_partkey = p_partkey
  JOIN eu ON l_suppkey = s_suppkey
  WHERE p_type = 'LARGE'
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_type
FROM cand c
WHERE s_acctbal = (SELECT min(s_acctbal) FROM cand c2
                   WHERE c2.p_partkey = c.p_partkey)
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q4 (adapted: no l_commitdate/l_receiptdate -- "late" is
    # modeled as EXISTS a returned lineitem): order counts by priority
    # for one quarter. The EXISTS is a left-semi join on the order key;
    # the returned-lines side is pre-filtered before the shuffle.
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp_ntz"))
    )
    ret = (
        t(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey")
    )
    return (
        o.join(ret, o.o_orderkey == ret.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


Q4_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority
"""


def q8_national_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q8 (adapted to available columns): NATION_7's share of ASIA
    # ECONOMY-part revenue by order year. Conditional numerator over
    # the full joined fact stream; single groupBy on year.
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    p = t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    c = t(spark, sf_dir, "customer")
    n1 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk")
    )
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    s = t(spark, sf_dir, "supplier")
    n2 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    target = F.when(F.col("supp_nation") == "NATION_7", rev).otherwise(
        F.lit(0.0)
    )
    joined = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), c.c_nationkey == F.col("c_nk"))
        .join(F.broadcast(r), F.col("c_rk") == r.r_regionkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), s.s_nationkey == F.col("s_nk"))
    )
    return (
        joined.groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg((dsum(target, 4) / dsum(rev, 4)).alias("mkt_share"))
        .orderBy("o_year")
    )


Q8_SQL = f"""
SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
       ({sql_dsum("CASE WHEN n2.n_name = 'NATION_7' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END", 4)})
         / ({sql_dsum('l_extendedprice * (1 - l_discount)', 4)}) AS mkt_share
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region ON n1.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE p_type = 'ECONOMY' AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY year(o_orderdate)
ORDER BY o_year
"""


def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q9 (adapted: no ps_supplycost -- unit cost modeled as
    # 0.8 * p_retailprice): profit by supplier nation and ship year for
    # one part-name family. Two broadcast dims + one conditional
    # arithmetic expression; single shuffle on the group keys.
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(F.col("p_name").contains("widget"))
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.lit(0.8) * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").cast("long").alias("o_year"),
        )
        .agg(dsum(amount, 4).alias("sum_profit"))
    )


Q9_SQL = f"""
SELECT n_name AS nation,
       CAST(year(l_shipdate) AS BIGINT) AS o_year,
       {sql_dsum('l_extendedprice * (1 - l_discount) - 0.8 * p_retailprice * l_quantity', 4)} AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%widget%'
GROUP BY n_name, year(l_shipdate)
"""


def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q11 (adapted: no partsupp -- part "stock value" is the
    # shipped value sum(l_extendedprice * l_quantity) restricted to
    # EUROPE suppliers): parts whose value exceeds a fixed fraction of
    # the total. Scalar-subquery total broadcast against the per-part
    # aggregate.
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eu_li = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    val = F.col("l_extendedprice") * F.col("l_quantity")
    # The per-part rollup is lazily checkpointed so BOTH consumers
    # (the grand-total aggregate and the filter) read one
    # materialization of one lineitem scan — the join-back without it
    # would re-run the scan + dimension joins, and the earlier global
    # window form funneled the whole part-count table (20B rows at
    # TPC-H SF100k) through ONE task. Per-part values are exact
    # multiples of 0.01 (scaled-integer sums), so re-quantizing and
    # summing them equals the direct total exactly.
    per_part = (
        eu_li.groupBy("l_partkey").agg(dsum(val, 2).alias("value"))
        .localCheckpoint(eager=False)
    )
    total = per_part.agg(
        (F.sum(sint("value", 2)).cast("double") / F.lit(100.0))
        .alias("total")
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("value") > 0.001 * F.col("total"))
        .select("l_partkey", "value")
        .orderBy(F.col("value").desc(), "l_partkey")
    )


Q11_SQL = f"""
WITH eu_li AS (
  SELECT l_partkey, l_extendedprice * l_quantity AS val
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
)
SELECT l_partkey, {sql_dsum('val', 2)} AS value
FROM eu_li
GROUP BY l_partkey
HAVING {sql_dsum('val', 2)} >
       0.001 * (SELECT {sql_dsum('val', 2)} FROM eu_li)
ORDER BY value DESC, l_partkey
"""


def q12_shipping_modes(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q12 (adapted: l_linestatus stands in for l_shipmode, ship
    # date for receipt date): high- vs low-priority order counts per
    # line status for one year. Conditional aggregation after the
    # orders<->lineitem shuffle join.
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    o = t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long")
            .alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).cast("long")
            .alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


Q12_SQL = """
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_linestatus
ORDER BY l_linestatus
"""


def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q16 (adapted: part<->supplier pairs derived from lineitem;
    # the "complaints" exclusion keys on a supplier-name suffix):
    # distinct supplier counts per (brand, type, size) bucket, with a
    # NOT-IN supplier blacklist as a broadcast anti join BEFORE the
    # distinct-count shuffle.
    excl = (
        t(spark, sf_dir, "supplier")
        .filter(F.col("s_name").endswith("7"))
        .select("s_suppkey")
    )
    p = t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 9, 13, 19, 23)
    )
    ps = (
        t(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    return (
        ps.join(F.broadcast(excl), ps.l_suppkey == excl.s_suppkey,
                "left_anti")
        .join(F.broadcast(p), ps.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type",
                 "p_size")
    )


Q16_SQL = """
SELECT p_brand, p_type, p_size,
       count(DISTINCT l_suppkey) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#5'
  AND p_type <> 'PROMO'
  AND p_size IN (1, 5, 9, 13, 19, 23)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                        WHERE s_name LIKE '%7')
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q21 (adapted: "kept the order waiting" = sole supplier
    # whose lines were returned, in a finished multi-supplier order).
    # The double correlated EXISTS / NOT EXISTS is re-expressed as ONE
    # per-order aggregate (distinct suppliers, distinct returning
    # suppliers) joined back -- one shuffle over lineitem instead of
    # two self-joins, which is the shape that survives 100 TB.
    li = t(spark, sf_dir, "lineitem")
    # Per-order supplier stats as collect_set windows over the order
    # key, NOT an aggregate joined back to a second lineitem branch:
    # that shape scans lineitem twice (Catalyst keeps shared subplans
    # separate). One scan, one shuffle; the downstream orderkey join
    # reuses the window's hash partitioning. collect_set drops nulls,
    # so size(...) == countDistinct.
    w = Window.partitionBy("l_orderkey")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = t(spark, sf_dir, "supplier")
    ret = (
        li.withColumn(
            "n_supp", F.size(F.collect_set("l_suppkey").over(w))
        )
        .withColumn(
            "n_ret_supp",
            F.size(
                F.collect_set(
                    F.when(F.col("l_returnflag") == "R",
                           F.col("l_suppkey"))
                ).over(w)
            ),
        )
        .filter(F.col("l_returnflag") == "R")
    )
    return (
        ret.filter((F.col("n_supp") > 1) & (F.col("n_ret_supp") == 1))
        .join(o, ret.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), ret.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.countDistinct("l_orderkey").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(25)
    )


Q21_SQL = """
WITH ostat AS (
  SELECT l_orderkey AS ok,
         count(DISTINCT l_suppkey) AS n_supp,
         count(DISTINCT CASE WHEN l_returnflag = 'R'
                             THEN l_suppkey END) AS n_ret_supp
  FROM lineitem GROUP BY l_orderkey
)
SELECT s_name, count(DISTINCT l_orderkey) AS numwait
FROM lineitem
JOIN ostat ON l_orderkey = ok
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
WHERE l_returnflag = 'R' AND n_supp > 1 AND n_ret_supp = 1
  AND o_orderstatus = 'F'
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 25
"""


def q20_excess_share_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 adapted (no partsupp table): suppliers who shipped an
    EXCESS SHARE of some widget part's 1996 volume -- the original's
    "availqty > half of shipped quantity" test re-expressed on the
    shipment log itself. A sum-over-window on the (supp, part)
    aggregate replaces the correlated subquery (one scan, no
    re-aggregation join); part is broadcast into the fact scan;
    supplier/nation broadcast onto the tiny excess-supplier set.
    reference: none (reference has no TPC-H surface); query text
    adapted from the public TPC-H spec."""
    y0 = F.lit("1996-01-01").cast("timestamp_ntz")
    y1 = F.lit("1997-01-01").cast("timestamp_ntz")
    p = t(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= y0) & (F.col("l_shipdate") < y1)
    )
    shipped = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("qty"))
        .withColumn(
            "part_qty", F.sum("qty").over(Window.partitionBy("l_partkey"))
        )
    )
    excess = (
        shipped.filter(F.col("qty") > 0.5 * F.col("part_qty"))
        .select("l_suppkey")
        .distinct()
    )
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_3", "NATION_7")
    )
    return (
        excess.join(F.broadcast(s), excess.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


Q20_SQL = """
WITH shipped AS (
  SELECT l_suppkey, l_partkey, sum(CAST(l_quantity AS BIGINT)) AS qty,
         sum(sum(CAST(l_quantity AS BIGINT)))
           OVER (PARTITION BY l_partkey) AS part_qty
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE '%widget%'
    AND l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1997-01-01'
  GROUP BY l_suppkey, l_partkey
), excess AS (
  SELECT DISTINCT l_suppkey AS suppkey FROM shipped
  WHERE qty > 0.5 * part_qty
)
SELECT s_name, s_acctbal FROM excess
JOIN supplier ON suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name IN ('NATION_3', 'NATION_7')
ORDER BY s_name
"""


SPECS: list[QuerySpec] = [
    QuerySpec("tpch_q2_min_cost_supplier", q2_min_cost_supplier, Q2_SQL),
    QuerySpec("tpch_q4_order_priority", q4_order_priority, Q4_SQL),
    QuerySpec("tpch_q8_market_share", q8_national_market_share, Q8_SQL),
    QuerySpec("tpch_q9_product_profit", q9_product_type_profit, Q9_SQL),
    QuerySpec("tpch_q11_important_stock", q11_important_stock, Q11_SQL),
    QuerySpec("tpch_q12_shipping_modes", q12_shipping_modes, Q12_SQL),
    QuerySpec("tpch_q16_part_supplier_counts", q16_supplier_part_counts,
              Q16_SQL),
    QuerySpec("tpch_q21_waiting_suppliers", q21_waiting_suppliers, Q21_SQL),
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
    QuerySpec("tpch_q20_excess_share", q20_excess_share_suppliers, Q20_SQL),
    QuerySpec("tpch_q22_dormant_customers", q22_dormant_customers, Q22_SQL),
]
