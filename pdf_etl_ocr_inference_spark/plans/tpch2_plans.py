"""TPC-H completion: the six queries whose predicates depend on tables
or columns the reduced fixture lacks (partsupp, l_shipmode,
l_commitdate/l_receiptdate).  Adaptations (documented per query):

- partsupp     → distinct (l_partkey, l_suppkey) pairs from lineitem,
  with SUM(l_quantity) standing in for ps_availqty and the supplier's
  account balance for ps_supplycost.
- l_shipmode   → l_returnflag classes.
- late receipt → l_shipdate more than 60 days after o_orderdate.

With these, all 22 TPC-H query *shapes* (join topology, subquery
structure, agg pattern) are covered: Q1/Q3/Q5 in relational_plans,
Q4/Q6-Q10/Q13-Q15/Q17-Q19/Q22 in tpch_plans, Q2/Q11/Q12/Q16/Q20/Q21
here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pdf_etl_ocr_inference_spark.plans.registry import register
from pdf_etl_ocr_inference_spark.sources.catalog import load_table as _t

# lineitem-derived partsupp substitute, shared across Q2/Q11/Q16/Q20
_PARTSUPP_SQL = (
    "SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey, "
    "SUM(l_quantity) AS ps_availqty FROM lineitem "
    "GROUP BY l_partkey, l_suppkey"
)


def _partsupp(spark: SparkSession, sf: str) -> DataFrame:
    return (
        _t(spark, sf, "lineitem")
        .groupBy(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("l_suppkey").alias("ps_suppkey"),
        )
        .agg(F.sum("l_quantity").alias("ps_availqty"))
    )


@register(
    "tpch_q2",
    "WITH partsupp AS (" + _PARTSUPP_SQL + ") "
    "SELECT s_acctbal, s_name, n_name, p_partkey, p_type "
    "FROM part JOIN partsupp ON p_partkey = ps_partkey "
    "JOIN supplier ON s_suppkey = ps_suppkey "
    "JOIN nation ON s_nationkey = n_nationkey "
    "JOIN region ON n_regionkey = r_regionkey "
    "WHERE p_size = 15 AND r_name = 'EUROPE' "
    "AND s_acctbal = (SELECT MIN(s2.s_acctbal) FROM partsupp ps2 "
    "  JOIN supplier s2 ON s2.s_suppkey = ps2.ps_suppkey "
    "  JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey "
    "  JOIN region r2 ON n2.n_regionkey = r2.r_regionkey "
    "  WHERE ps2.ps_partkey = p_partkey AND r2.r_name = 'EUROPE') "
    "ORDER BY s_acctbal, s_name, p_partkey LIMIT 100",
    doc="TPC-H Q2 minimum-cost supplier, adapted: partsupp = distinct "
    "lineitem (part,supp) pairs; ps_supplycost → s_acctbal (min-cost "
    "→ min-balance supplier). The correlated min subquery becomes a "
    "per-part window min computed in one pass.",
    tags=("bench",),
)
def tpch_q2(spark: SparkSession, sf: str) -> DataFrame:
    ps = _partsupp(spark, sf)
    part = _t(spark, sf, "part").filter(F.col("p_size") == 15)
    nation = _t(spark, sf, "nation")
    region = _t(spark, sf, "region").filter(F.col("r_name") == "EUROPE")
    supp = (
        _t(spark, sf, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_acctbal", "s_name", "n_name")
    )
    eligible = ps.join(supp, ps["ps_suppkey"] == supp["s_suppkey"]).join(
        part.select("p_partkey", "p_type"),
        ps["ps_partkey"] == F.col("p_partkey"),
    )
    w = Window.partitionBy("ps_partkey")
    return (
        eligible.withColumn("_min_bal", F.min("s_acctbal").over(w))
        .filter(F.col("s_acctbal") == F.col("_min_bal"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_type")
        .orderBy("s_acctbal", "s_name", "p_partkey")
        .limit(100)
    )


@register(
    "tpch_q11",
    "WITH partsupp AS (" + _PARTSUPP_SQL + ") "
    "SELECT ps_partkey, ROUND(SUM(ps_availqty * s_acctbal), 2) AS value "
    "FROM partsupp JOIN supplier ON ps_suppkey = s_suppkey "
    "JOIN nation ON s_nationkey = n_nationkey WHERE n_name = 'NATION_3' "
    "GROUP BY ps_partkey HAVING SUM(ps_availqty * s_acctbal) > ("
    "  SELECT SUM(ps_availqty * s_acctbal) * 0.001 "
    "  FROM partsupp JOIN supplier ON ps_suppkey = s_suppkey "
    "  JOIN nation ON s_nationkey = n_nationkey WHERE n_name = 'NATION_3')",
    doc="TPC-H Q11 important-stock identification, adapted: availqty "
    "from lineitem quantities, supplycost → s_acctbal, GERMANY → "
    "NATION_3. Scalar total computed once and broadcast into the "
    "HAVING comparison.",
)
def tpch_q11(spark: SparkSession, sf: str) -> DataFrame:
    nation = _t(spark, sf, "nation").filter(F.col("n_name") == "NATION_3")
    supp = _t(spark, sf, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "s_acctbal")
    ps = _partsupp(spark, sf).join(
        supp, F.col("ps_suppkey") == F.col("s_suppkey")
    )
    per_part = ps.groupBy("ps_partkey").agg(
        F.sum(F.col("ps_availqty") * F.col("s_acctbal")).alias("_value")
    )
    total = per_part.agg(
        (F.sum("_value") * 0.001).alias("_threshold")
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("_value") > F.col("_threshold"))
        .select("ps_partkey", F.round("_value", 2).alias("value"))
    )


@register(
    "tpch_q12",
    "SELECT l_returnflag AS shipmode, "
    "CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') "
    "THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count, "
    "CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') "
    "THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count "
    "FROM orders JOIN lineitem ON o_orderkey = l_orderkey "
    "WHERE l_returnflag IN ('A', 'R') "
    "AND l_shipdate >= TIMESTAMP '1997-01-01' "
    "AND l_shipdate < TIMESTAMP '1998-01-01' "
    "GROUP BY l_returnflag",
    doc="TPC-H Q12 shipping-mode priority, adapted: l_shipmode → "
    "l_returnflag classes, receipt-date window → shipdate window. "
    "Shape preserved: fact-fact join + conditional counts.",
)
def tpch_q12(spark: SparkSession, sf: str) -> DataFrame:
    li = _t(spark, sf, "lineitem").filter(
        F.col("l_returnflag").isin("A", "R")
        & (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = _t(spark, sf, "orders").select("o_orderkey", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.col("l_returnflag").alias("shipmode"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "tpch_q16",
    "WITH partsupp AS (" + _PARTSUPP_SQL + ") "
    "SELECT p_brand, p_type, p_size, "
    "COUNT(DISTINCT ps_suppkey) AS supplier_cnt "
    "FROM partsupp JOIN part ON p_partkey = ps_partkey "
    "WHERE p_brand <> 'Brand#45' AND p_type <> 'PROMO' "
    "AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45) "
    "AND ps_suppkey NOT IN ("
    "  SELECT s_suppkey FROM supplier WHERE s_acctbal < 0) "
    "GROUP BY p_brand, p_type, p_size",
    doc="TPC-H Q16 parts/supplier relationship, adapted: partsupp from "
    "lineitem; the complaints-comment exclusion → negative-balance "
    "suppliers. Anti-join before the distinct count.",
)
def tpch_q16(spark: SparkSession, sf: str) -> DataFrame:
    ps = _partsupp(spark, sf)
    part = _t(spark, sf, "part").filter(
        (F.col("p_brand") != "Brand#45")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
    )
    bad_supp = _t(spark, sf, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select(F.col("s_suppkey").alias("ps_suppkey"))
    return (
        ps.join(bad_supp, "ps_suppkey", "left_anti")
        .join(part, F.col("ps_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
    )


@register(
    "tpch_q20",
    "WITH partsupp AS (" + _PARTSUPP_SQL + ") "
    "SELECT s_name, n_name FROM supplier "
    "JOIN nation ON s_nationkey = n_nationkey "
    "WHERE n_name IN ('NATION_1', 'NATION_2') AND s_suppkey IN ("
    "  SELECT ps_suppkey FROM partsupp WHERE ps_partkey IN ("
    "    SELECT p_partkey FROM part WHERE p_name LIKE '%ring%') "
    "  AND ps_availqty > ("
    "    SELECT 0.5 * SUM(l_quantity) FROM lineitem "
    "    WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey "
    "    AND l_shipdate >= TIMESTAMP '1997-01-01' "
    "    AND l_shipdate < TIMESTAMP '1998-01-01'))",
    doc="TPC-H Q20 potential part promotion, adapted: partsupp from "
    "lineitem totals; the correlated half-of-year-volume subquery "
    "joins a pre-aggregated year slice instead of re-scanning per "
    "row. Nested IN chains become semi-joins.",
)
def tpch_q20(spark: SparkSession, sf: str) -> DataFrame:
    ps = _partsupp(spark, sf)
    wanted_parts = _t(spark, sf, "part").filter(
        F.col("p_name").like("%ring%")
    ).select(F.col("p_partkey").alias("ps_partkey"))
    year_qty = (
        _t(spark, sf, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .groupBy(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("l_suppkey").alias("ps_suppkey"),
        )
        .agg((F.sum("l_quantity") * 0.5).alias("_half_qty"))
    )
    qualified = (
        ps.join(wanted_parts, "ps_partkey", "left_semi")
        .join(year_qty, ["ps_partkey", "ps_suppkey"])
        .filter(F.col("ps_availqty") > F.col("_half_qty"))
        .select(F.col("ps_suppkey").alias("s_suppkey"))
        .distinct()
    )
    nation = _t(spark, sf, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2")
    )
    return (
        _t(spark, sf, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(qualified, "s_suppkey", "left_semi")
        .select("s_name", "n_name")
    )


@register(
    "tpch_q21",
    "SELECT s_name, COUNT(*) AS numwait FROM supplier "
    "JOIN lineitem l1 ON s_suppkey = l1.l_suppkey "
    "JOIN orders ON o_orderkey = l1.l_orderkey "
    "JOIN nation ON s_nationkey = n_nationkey "
    "WHERE o_orderstatus = 'F' AND n_name = 'NATION_1' "
    "AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY "
    "AND EXISTS (SELECT 1 FROM lineitem l2 "
    "  WHERE l2.l_orderkey = l1.l_orderkey "
    "  AND l2.l_suppkey <> l1.l_suppkey) "
    "AND NOT EXISTS (SELECT 1 FROM lineitem l3 "
    "  WHERE l3.l_orderkey = l1.l_orderkey "
    "  AND l3.l_suppkey <> l1.l_suppkey "
    "  AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY) "
    "GROUP BY s_name",
    doc="TPC-H Q21 suppliers-who-kept-orders-waiting, adapted: 'late' "
    "= shipped >60 days after order date (no receipt/commit dates). "
    "EXISTS → left-semi on other-supplier lines; NOT EXISTS → "
    "left-anti on other-supplier LATE lines; the lateness predicate "
    "needs o_orderdate, so the exists sides pre-join orders once.",
)
def tpch_q21(spark: SparkSession, sf: str) -> DataFrame:
    orders = _t(spark, sf, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    li = _t(spark, sf, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    # timestamp + interval, NOT date_add (which truncates to DATE and
    # would diverge from the oracle on any non-midnight timestamps)
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr(
        "INTERVAL 60 DAYS"
    )
    l_with_o = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
    l1 = l_with_o.filter(late).select(
        F.col("l_orderkey").alias("k1"),
        F.col("l_suppkey").alias("s1"),
    )
    others = li.select(
        F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("s2")
    )
    late_others = l_with_o.filter(late).select(
        F.col("l_orderkey").alias("k3"), F.col("l_suppkey").alias("s3")
    )
    waited = (
        l1.join(
            others,
            (F.col("k1") == F.col("k2")) & (F.col("s1") != F.col("s2")),
            "left_semi",
        )
        .join(
            late_others,
            (F.col("k1") == F.col("k3")) & (F.col("s1") != F.col("s3")),
            "left_anti",
        )
    )
    nation = _t(spark, sf, "nation").filter(F.col("n_name") == "NATION_1")
    supp = _t(spark, sf, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "s_name")
    return (
        waited.join(supp, F.col("s1") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )
