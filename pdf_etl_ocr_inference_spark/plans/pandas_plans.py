"""Grouped pandas surface (SURVEY §2.4 extension ops OP-27/28):
``applyInPandas`` grouped-map and GROUPED_AGG pandas UDAF.

The reference has no UDAF/grouped-map (its only vectorized UDF is the
scalar iterator at ``03:96-109``); these are the standard PySpark
extension points a text-analysis/dedup pipeline needs.  Both entries
compute something a SQL oracle can mirror exactly, so the Arrow
group-boundary plumbing is value-verified, not just smoke-tested.

Scale notes: applyInPandas shuffles once on the group key and each
group must fit in one executor's memory — group by bounded-cardinality
keys (segment, not customer).  GROUPED_AGG has the same shuffle but
streaming per-group state.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdf_etl_ocr_inference_spark.plans.registry import register
from pdf_etl_ocr_inference_spark.sources.catalog import load_table as _t


@register(
    "op27_applyinpandas_zscore",
    "SELECT c_custkey, ROUND((c_acctbal - AVG(c_acctbal) OVER w) / "
    "STDDEV_POP(c_acctbal) OVER w, 4) AS zscore FROM customer "
    "WINDOW w AS (PARTITION BY c_mktsegment)",
    doc="OP-27 grouped-map applyInPandas: per-market-segment z-score "
    "of account balance. One shuffle on the (bounded-cardinality) "
    "segment key; whole group per Arrow batch.",
)
def op27_applyinpandas_zscore(spark: SparkSession, sf: str) -> DataFrame:
    customer = _t(spark, sf, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )

    def _zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        bal = pdf["c_acctbal"]
        z = (bal - bal.mean()) / bal.std(ddof=0)
        return pd.DataFrame(
            {"c_custkey": pdf["c_custkey"], "zscore": z.round(4)}
        )

    return customer.groupBy("c_mktsegment").applyInPandas(
        _zscore, schema="c_custkey long, zscore double"
    )


@register(
    "op22_broadcast_lookup",
    "SELECT s_suppkey, n_name FROM supplier "
    "JOIN nation ON s_nationkey = n_nationkey",
    doc="OP-22 closure-capture lookup done right: the reference "
    "captured a driver list in a UDF closure (02:279, a broadcast-by-"
    "accident); the engine uses an explicit sc.broadcast dict inside "
    "an Arrow-batched pandas UDF. Oracle = the equi-join — which is "
    "also the better plan when the dim is joinable; the broadcast-var "
    "form exists for non-relational lookup logic.",
)
def op22_broadcast_lookup(spark: SparkSession, sf: str) -> DataFrame:
    nation_map = {
        r["n_nationkey"]: r["n_name"]
        for r in _t(spark, sf, "nation").collect()
    }
    bc = spark.sparkContext.broadcast(nation_map)

    @F.pandas_udf("string")
    def lookup(keys: pd.Series) -> pd.Series:
        m = bc.value
        return keys.map(m)

    return _t(spark, sf, "supplier").select(
        "s_suppkey", lookup("s_nationkey").alias("n_name")
    )


@register(
    "op28_grouped_agg_udaf",
    "SELECT c_mktsegment, ROUND(EXP(AVG(LN(c_acctbal))), 4) AS geo_mean "
    "FROM customer WHERE c_acctbal > 0 GROUP BY c_mktsegment",
    doc="OP-28 GROUPED_AGG pandas UDAF: geometric mean of positive "
    "balances per segment — an aggregate SQL lacks natively but the "
    "oracle can mirror (exp∘avg∘ln).",
)
def op28_grouped_agg_udaf(spark: SparkSession, sf: str) -> DataFrame:
    customer = _t(spark, sf, "customer").filter(F.col("c_acctbal") > 0)

    @F.pandas_udf("double")
    def geo_mean(v: pd.Series) -> float:
        return float(np.exp(np.log(v.to_numpy()).mean()))

    return customer.groupBy("c_mktsegment").agg(
        F.round(geo_mean("c_acctbal"), 4).alias("geo_mean")
    )
