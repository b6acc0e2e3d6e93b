"""Testdata catalog: named parquet tables with explicit schemas.

The reference relies on catalog-managed tables
(``01-download-pdfs.py:180-182`` ``saveAsTable('papers')``); our
open-source equivalent is parquet directories addressed by a
scale-factor dir plus ``spark.catalog`` temp views.  Explicit schemas
everywhere — header-only inference (``01:64``) is reproduced only via
``read_csv(..., legacy_inference=True)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# Schemas for the driver-generated tables (TESTDATA.md / FIXTURES.md §B).
TABLES: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampType()),
        ]
    ),
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}


# ts unit per resolved events path ("ns"/"us"), probed once from the
# parquet footer — driver-side metadata read, no job.
_TS_UNIT_CACHE: dict = {}


def event_ts_unit(path: str) -> str:
    """The testdata generator has produced ``events.ts`` as both
    TIMESTAMP(NANOS) and TIMESTAMP(MICROS) across rounds; probe the
    footer instead of assuming, so the read schema matches the file."""
    import os

    key = os.path.abspath(path)
    unit = _TS_UNIT_CACHE.get(key)
    if unit is None:
        import pyarrow.parquet as pq

        target = key
        if os.path.isdir(target):
            parts = sorted(
                n for n in os.listdir(target) if n.endswith(".parquet")
            )
            target = os.path.join(target, parts[0])
        unit = pq.read_schema(target).field("ts").type.unit
        _TS_UNIT_CACHE[key] = unit
    return unit


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one testdata table (OP-02).

    Plain parquet scan — Catalyst gets predicate pushdown, column
    pruning and partition pruning for free on top of this.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {sorted(TABLES)}")
    if name != "events":
        return spark.read.parquet(f"{sf_dir}/{name}.parquet")
    path = f"{sf_dir}/{name}.parquet"
    if event_ts_unit(path) != "ns":
        # Naive-micros files would otherwise infer TIMESTAMP_NTZ;
        # reading under the declared schema surfaces ts as TIMESTAMP
        # with the stored value passed through unshifted — type-stable
        # across testdata generations and independent of session tz.
        return spark.read.schema(TABLES["events"]).parquet(path)
    # TIMESTAMP(NANOS): a session built outside our factory (e.g. the
    # driver's) rejects nanos without this runtime-settable legacy
    # conf; read as long nanos, convert post-read.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return normalize_event_ts(spark.read.parquet(path))


def normalize_event_ts(df: DataFrame) -> DataFrame:
    """When events.ts is TIMESTAMP(NANOS) in parquet, Spark reads it as
    long nanos under ``spark.sql.legacy.parquet.nanosAsLong``; convert
    to a proper timestamp at micro precision (floor division — matches
    DuckDB's nano→micro truncation).  Micro-precision files arrive as
    TimestampType already and pass through untouched."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    if isinstance(df.schema["ts"].dataType, T.LongType):
        # integer div — double division would lose precision on
        # epoch-nanos (~1.7e18 > 2^53)
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def register_all(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view so ``spark.sql``
    queries can address them by name (OP-08/09 equivalent)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
