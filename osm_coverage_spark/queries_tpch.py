"""Classic analytics query family over the TPC-H-ish tables — exercises the
engine's scan/filter/join/agg/sort/limit surface directly (SURVEY §2.1-2.6)
and doubles as the broadcast-join / partial-aggregate performance probe.

FP discipline: every double aggregate is rounded identically on both sides,
and Spark/DuckDB expressions use the same operation order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .sources import derived

Q1_CUTOFF = "1998-09-02"
Q3_SEGMENT = "BUILDING"
Q3_DATE = "1998-03-15"
Q5_REGION = "ASIA"
Q6_LO, Q6_HI = "1997-01-01", "1998-01-01"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    derived.load_testdata(spark, sf_dir)
    return spark.table(name)


def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= Q1_CUTOFF)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == Q3_SEGMENT)
    o = spark.table("orders").filter(F.col("o_orderdate") < Q3_DATE)
    li = spark.table("lineitem").filter(F.col("l_shipdate") > Q3_DATE)
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    # No broadcast hints: orders and customer are fact-scale tables (they
    # grow with SF and would OOM executors at 100×). AQE picks broadcast at
    # runtime when the filtered side actually fits; at scale this is a
    # sort-merge join with map-side-pushed filters on both sides.
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(rev), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
        .select(
            "l_orderkey",
            F.col("o_orderdate").cast("date").cast("string").alias("o_orderdate"),
            "o_orderpriority",
            "revenue",
        )
    )


def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-supplier volume: 6-way join.

    Broadcast hints ONLY on the constant-cardinality dims (region: 5 rows,
    nation: 25 rows — fixed regardless of SF). customer / orders / supplier
    all scale linearly with SF, so their join strategy is left to AQE's
    runtime size decision; hard-coding broadcast there OOMs at 100×."""
    derived.load_testdata(spark, sf_dir)
    r = spark.table("region").filter(F.col("r_name") == Q5_REGION)
    n = spark.table("nation").join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    )
    c = spark.table("customer").join(
        F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey")
    )
    o = spark.table("orders")
    li = spark.table("lineitem")
    s = spark.table("supplier")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            s,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
    )
    return (
        joined.groupBy("n_name")
        .agg(F.round(F.sum(rev), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name").asc())
    )


def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= Q6_LO)
        & (F.col("l_shipdate") < Q6_HI)
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
            "revenue"
        ),
        F.count(F.lit(1)).alias("n_rows"),
    )


def q_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 customers by order value (orderBy+limit / TakeOrdered)."""
    o = _t(spark, sf_dir, "orders")
    c = spark.table("customer")
    # customer scales with SF — no broadcast hint; AQE decides at runtime.
    return (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy("c_custkey", "c_name")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("total_value"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy(F.col("total_value").desc(), F.col("c_custkey").asc())
        .limit(10)
    )


ORACLE: dict[str, str] = {}

ORACLE["tpch_q1"] = f"""
SELECT l_returnflag, l_linestatus,
  round(sum(l_quantity), 2) AS sum_qty,
  round(sum(l_extendedprice), 2) AS sum_base_price,
  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
  round(avg(l_quantity), 4) AS avg_qty,
  round(avg(l_discount), 4) AS avg_disc,
  CAST(count(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{Q1_CUTOFF} 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""

ORACLE["tpch_q3"] = f"""
SELECT l_orderkey,
       CAST(CAST(o_orderdate AS DATE) AS STRING) AS o_orderdate,
       o_orderpriority,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer, orders, lineitem
WHERE c_mktsegment = '{Q3_SEGMENT}'
  AND c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND o_orderdate < TIMESTAMP '{Q3_DATE} 00:00:00'
  AND l_shipdate > TIMESTAMP '{Q3_DATE} 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""

ORACLE["tpch_q5"] = f"""
SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
  AND c_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = '{Q5_REGION}'
GROUP BY n_name
ORDER BY revenue DESC, n_name ASC
"""

ORACLE["tpch_q6"] = f"""
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
       CAST(count(*) AS BIGINT) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '{Q6_LO} 00:00:00'
  AND l_shipdate < TIMESTAMP '{Q6_HI} 00:00:00'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""

ORACLE["top_customers"] = """
SELECT c_custkey, c_name,
       round(sum(o_totalprice), 2) AS total_value,
       CAST(count(*) AS BIGINT) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_custkey, c_name
ORDER BY total_value DESC, c_custkey ASC
LIMIT 10
"""

QUERIES = {
    "tpch_q1": q_tpch_q1,
    "tpch_q3": q_tpch_q3,
    "tpch_q5": q_tpch_q5,
    "tpch_q6": q_tpch_q6,
    "top_customers": q_top_customers,
}
