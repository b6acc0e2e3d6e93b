"""Source/sink query catalog (SURVEY §2.1: OP-01/03/04/07/08/09 and
the scalar-UDF surface OP-20/21 as a genuine BatchEvalPython entry).

Round-trip entries (CSV, partitioned parquet) exercise writer + reader
together and oracle-check against the original table — proving the
sink/source pair is lossless, not just that it runs.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pdf_etl_ocr_inference_spark.plans.registry import register
from pdf_etl_ocr_inference_spark.sources.catalog import TABLES
from pdf_etl_ocr_inference_spark.sources.catalog import load_table as _t
from pdf_etl_ocr_inference_spark.sources.readers import (
    from_rows,
    read_binary_dir,
    read_csv,
)
from pdf_etl_ocr_inference_spark.sources.writers import overwrite_parquet


def _scratch(tag: str) -> str:
    from pdf_etl_ocr_inference_spark.scratch import scratch_root

    return os.path.join(scratch_root(), tag)


@register(
    "op01_csv_roundtrip",
    "SELECT n_nationkey, n_name, n_regionkey FROM nation",
    doc="CSV sink+scan round trip with explicit schema (OP-01; ref "
    "01:64 read header-only all-string — reproduced only behind "
    "read_csv(legacy_inference=True)). Oracle = the original table, "
    "proving losslessness.",
)
def op01_csv_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    path = _scratch("nation_csv")
    nation = _t(spark, sf, "nation")
    nation.write.mode("overwrite").option("header", True).csv(path)
    return read_csv(spark, path, schema=TABLES["nation"])


@register(
    "op03_partitioned_write",
    "SELECT o_orderstatus, COUNT(*) AS n, "
    "ROUND(SUM(o_totalprice), 2) AS total FROM orders GROUP BY 1",
    doc="partitioned parquet overwrite + re-scan (OP-03; ref "
    "saveAsTable at 01:180-182). Partitioning by the query key means "
    "the re-scan prunes; at 100 TB a chunks table partitions by a "
    "stable coarse key exactly like this.",
)
def op03_partitioned_write(spark: SparkSession, sf: str) -> DataFrame:
    path = _scratch("orders_part")
    orders = _t(spark, sf, "orders")
    overwrite_parquet(orders, path, partition_by=["o_orderstatus"])
    back = spark.read.parquet(path)
    return back.groupBy("o_orderstatus").agg(
        F.count("*").alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )


@register(
    "op04_local_collection",
    "SELECT v.r_name, r.r_regionkey FROM (VALUES ('ASIA'), ('EUROPE')) "
    "v(r_name) JOIN region r USING (r_name)",
    doc="local-collection source (OP-04; ref ocr:105 createDataFrame "
    "from driver dicts) — small control data broadcast-joined against "
    "a table.",
)
def op04_local_collection(spark: SparkSession, sf: str) -> DataFrame:
    wanted = from_rows(
        spark,
        [("ASIA",), ("EUROPE",)],
        T.StructType([T.StructField("r_name", T.StringType())]),
    )
    region = _t(spark, sf, "region")
    return F.broadcast(wanted).join(region, "r_name").select(
        "r_name", "r_regionkey"
    )


def _binaryfile_listing_oracle() -> str:
    """LAZY oracle (r9): the entry's output is (relative name, byte
    length) of the sf dir's parquet files — environment-shaped only
    through the DIRECTORY, which the generator reads independently
    with os.scandir at oracle_sql() time (SPARK_GRAFT_ORACLE_SF_DIR,
    the pca_sql mechanism) and bakes as literals.  Verifies the
    distributed binaryFile listing returns exactly the files with
    exactly their sizes."""
    import os as _os

    sf_dir = _os.environ.get(
        "SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01"
    )
    rows = sorted(
        (e.name, e.stat().st_size)
        for e in _os.scandir(sf_dir)
        if e.name.endswith(".parquet")
    )
    values = ", ".join(f"('{n}', {sz})" for n, sz in rows)
    return (
        f"SELECT name, CAST(length AS BIGINT) AS length "
        f"FROM (VALUES {values}) AS t(name, length) ORDER BY name"
    )


@register(
    "op07_binaryfile_listing",
    _binaryfile_listing_oracle,  # lazy: filesystem-derived literals
    doc="binaryFile source (OP-06/07 replacement for the driver-side "
    "glob at ocr:55-61): distributed listing of *.parquet blobs with "
    "length — the LPT size key without opening files. Content column "
    "deliberately not projected (pruned scan). ORACLED since r9: the "
    "generator re-lists the directory with os.scandir and the SQL "
    "pins names and byte sizes.",
)
def op07_binaryfile_listing(spark: SparkSession, sf: str) -> DataFrame:
    files = read_binary_dir(spark, sf, glob="*.parquet")
    return files.select(
        F.element_at(F.split("path", "/"), -1).alias("name"),
        F.col("length"),
    ).orderBy("name")


@register(
    "op08_catalog_ddl",
    # the observable output is fully determined (the entry owns the
    # engine_smoke database and leaves exactly one table): a constant
    # oracle still upgrades the check from rows-only to value-exact —
    # an entry that started leaking extra tables or renaming would
    # now FAIL instead of passing on row count
    "SELECT 'region_copy' AS tableName",
    doc="DDL + catalog introspection (OP-08/09; ref CREATE "
    "DATABASE/USE/SHOW TABLES at 01:12-14, 02:107-108): create a "
    "database, save a managed table, list it back.",
)
def op08_catalog_ddl(spark: SparkSession, sf: str) -> DataFrame:
    from pdf_etl_ocr_inference_spark.sources.writers import drop_managed_table

    spark.sql("CREATE DATABASE IF NOT EXISTS engine_smoke")
    drop_managed_table(spark, "engine_smoke", "region_copy")
    (
        _t(spark, sf, "region")
        .write.mode("overwrite")
        .format("parquet")
        .saveAsTable("engine_smoke.region_copy")
    )
    tables = spark.sql("SHOW TABLES IN engine_smoke")
    # SHOW TABLES also lists the session's TEMP VIEWS (isTemporary),
    # which other entries/tests in a shared session legitimately
    # create — the introspection question is "what tables are IN the
    # database", so keep only those (also what makes the constant
    # oracle exact)
    return (
        tables.filter(~F.col("isTemporary"))
        .select("tableName")
        .orderBy("tableName")
    )


@register(
    "op98_analyze_cbo",
    "SELECT n_name, COUNT(*) AS n_orders, "
    "ROUND(SUM(o_totalprice), 2) AS total "
    "FROM orders JOIN customer ON o_custkey = c_custkey "
    "JOIN nation ON c_nationkey = n_nationkey "
    "WHERE o_orderpriority = '1-URGENT' "
    "GROUP BY n_name",
    doc="statistics-driven planning (ANALYZE TABLE + cost-based "
    "optimizer): the join's tables are saved as managed tables, "
    "ANALYZE ... COMPUTE STATISTICS FOR ALL COLUMNS writes "
    "row/column stats into the metastore, and with spark.sql.cbo "
    "enabled the optimized plan carries a derived rowCount at the "
    "ROOT (asserted in-entry: filter+join+agg selectivities "
    "propagate through the tree — None without ANALYZE). This is "
    "the same ANALYZE contract the engine's own index statistics "
    "follow (optimizer.plan_hamming_radius); at 100 TB "
    "statistics-bearing metastores are what let the planner choose "
    "broadcast sides and join orders without scanning. Result "
    "oracled against the raw tables; confs saved/restored.",
)
def op98_analyze_cbo(spark: SparkSession, sf: str) -> DataFrame:
    from pdf_etl_ocr_inference_spark.sources.writers import (
        drop_managed_table,
    )

    spark.sql("CREATE DATABASE IF NOT EXISTS engine_cbo")
    for name, src in (
        ("orders_t", "orders"),
        ("customer_t", "customer"),
        ("nation_t", "nation"),
    ):
        drop_managed_table(spark, "engine_cbo", name)
        (
            _t(spark, sf, src)
            .write.mode("overwrite")
            .format("parquet")
            .saveAsTable(f"engine_cbo.{name}")
        )
        spark.sql(
            f"ANALYZE TABLE engine_cbo.{name} "
            "COMPUTE STATISTICS FOR ALL COLUMNS"
        )
    saved = {
        k: spark.conf.get(k, None)
        for k in ("spark.sql.cbo.enabled", "spark.sql.cbo.joinReorder.enabled")
    }
    try:
        spark.conf.set("spark.sql.cbo.enabled", "true")
        spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
        out = spark.sql(
            "SELECT n_name, COUNT(*) AS n_orders, "
            "ROUND(SUM(o_totalprice), 2) AS total "
            "FROM engine_cbo.orders_t o "
            "JOIN engine_cbo.customer_t c ON o.o_custkey = c.c_custkey "
            "JOIN engine_cbo.nation_t n ON c.c_nationkey = n.n_nationkey "
            "WHERE o.o_orderpriority = '1-URGENT' "
            "GROUP BY n_name"
        )
        stats = out._jdf.queryExecution().optimizedPlan().stats()
        assert stats.rowCount().isDefined(), (
            "CBO did not derive a row count — ANALYZE statistics "
            "not reaching the planner"
        )
        # force plan + stats resolution BEFORE confs restore
        out = out.localCheckpoint(eager=True)
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    return out


@register(
    "op02b_sql_api",
    "SELECT n_name, COUNT(*) AS n_suppliers, "
    "ROUND(AVG(s_acctbal), 4) AS avg_bal "
    "FROM supplier JOIN nation ON s_nationkey = n_nationkey "
    "GROUP BY n_name",
    doc="spark.sql() front end over registered temp views (OP-02/08 "
    "SQL-string path, ref 01:188/02:129 spark.sql usage) — same "
    "Catalyst plan as the DataFrame API.",
)
def op02b_sql_api(spark: SparkSession, sf: str) -> DataFrame:
    from pdf_etl_ocr_inference_spark.sources.catalog import register_all

    register_all(spark, sf)
    return spark.sql(
        "SELECT n_name, COUNT(*) AS n_suppliers, "
        "ROUND(AVG(s_acctbal), 4) AS avg_bal "
        "FROM supplier JOIN nation ON s_nationkey = n_nationkey "
        "GROUP BY n_name"
    )


@register(
    "op21_scalar_udf",
    "SELECT doc_id, TRY_CAST(REGEXP_EXTRACT(source, '([0-9]+)$', 1) "
    "AS BIGINT) AS src_num FROM documents",
    doc="scalar Python UDF, string→nullable long (OP-20/21 shape: ref "
    "get_file_size at 01:145-160 returns null on failure). A genuine "
    "BatchEvalPython stage — kept OUT of hot paths; the engine lifts "
    "such logic to native expressions wherever possible (§2.11).",
)
def op21_scalar_udf(spark: SparkSession, sf: str) -> DataFrame:
    import re

    @F.udf(returnType=T.LongType())
    def src_num(source):
        m = re.search(r"(\d+)$", source or "")
        return int(m.group(1)) if m else None

    return _t(spark, sf, "documents").select(
        "doc_id", src_num("source").alias("src_num")
    )


@register(
    "op21b_arrow_udf",
    "SELECT doc_id, TRY_CAST(REGEXP_EXTRACT(source, '([0-9]+)$', 1) "
    "AS BIGINT) AS src_num FROM documents",
    doc="Arrow-optimized scalar Python UDF (Spark 4 useArrow=True): "
    "op21's exact semantics through the ArrowEvalPython boundary "
    "instead of pickled BatchEvalPython — rows cross to the worker "
    "as Arrow record batches (columnar, zero-copy-ish) rather than "
    "one pickled row at a time, the ~2-5× cheaper serialization for "
    "scalar UDFs that genuinely must stay Python. Same oracle as "
    "op21, proving the boundary swap is semantics-preserving "
    "(incl. the None-on-no-match nullability).",
)
def op21b_arrow_udf(spark: SparkSession, sf: str) -> DataFrame:
    import re

    @F.udf(returnType=T.LongType(), useArrow=True)
    def src_num_arrow(source):
        m = re.search(r"(\d+)$", source or "")
        return int(m.group(1)) if m else None

    return _t(spark, sf, "documents").select(
        "doc_id", src_num_arrow("source").alias("src_num")
    )


@register(
    "op74_jsonl_roundtrip",
    "SELECT doc_id, lang, source, n_chars FROM documents",
    doc="JSON-lines sink+scan round trip with explicit schema "
    "(text/jsonl is the interchange format training corpora "
    "actually arrive in). Schema is pinned on read — json inference "
    "is the csv-header trap with more types. Oracle = the original "
    "table, proving losslessness for the typed columns.",
)
def op74_jsonl_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    path = _scratch("documents_jsonl")
    docs = _t(spark, sf, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )
    docs.write.mode("overwrite").json(path)
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.IntegerType()),
        ]
    )
    return spark.read.schema(schema).json(path)


@register(
    "op75_orc_roundtrip",
    "SELECT l_orderkey, l_partkey, l_quantity, l_shipdate "
    "FROM lineitem WHERE l_orderkey < 100",
    doc="ORC sink+scan round trip (the other columnar format large "
    "warehouses hand over; Spark ships the reader/writer built in). "
    "Filter applied BEFORE the write so the oracle checks the "
    "written subset; the re-scan carries the same pruned column "
    "set.",
)
def op75_orc_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    path = _scratch("lineitem_orc")
    li = (
        _t(spark, sf, "lineitem")
        .filter(F.col("l_orderkey") < 100)
        .select("l_orderkey", "l_partkey", "l_quantity", "l_shipdate")
    )
    li.write.mode("overwrite").orc(path)
    return spark.read.orc(path)


@register(
    "op83_compaction",
    "SELECT o_orderstatus, COUNT(*) AS n, "
    "ROUND(SUM(o_totalprice), 2) AS total FROM orders GROUP BY 1",
    doc="small-file compaction: a deliberately fragmented table "
    "(64 tiny files — the debris streaming sinks and incremental "
    "refreshes leave behind) rewrites to row-budgeted files sorted "
    "on the scan key, swapped in atomically. Oracle = the same "
    "aggregate over the source table, proving the rewrite is "
    "lossless; the file-count collapse is asserted in pytest.",
)
def op83_compaction(spark: SparkSession, sf: str) -> DataFrame:
    from pdf_etl_ocr_inference_spark.sources.writers import compact_parquet

    path = _scratch("orders_fragmented")
    orders = _t(spark, sf, "orders")
    orders.repartition(64).write.mode("overwrite").parquet(path)
    compact_parquet(
        spark, path, target_rows_per_file=200_000,
        sort_cols=["o_orderstatus"],
    )
    back = spark.read.parquet(path)
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )


@register(
    "op84_corrupt_tolerance",
    "SELECT n_nationkey, n_name, n_regionkey FROM nation",
    doc="corrupt-file tolerance: a garbage .parquet file planted in "
    "the table directory is SKIPPED under "
    "the per-read ignoreCorruptFiles option (plan-scoped — no "
    "session conf leaks) instead of failing the job — at 100 TB a "
    "partially-written file from a dead writer is a when, not an "
    "if. Oracle = the clean table: tolerance must not drop or "
    "mangle valid rows.",
)
def op84_corrupt_tolerance(spark: SparkSession, sf: str) -> DataFrame:
    path = _scratch("nation_corrupt")
    nation = _t(spark, sf, "nation")
    nation.write.mode("overwrite").parquet(path)
    with open(os.path.join(path, "part-corrupt.parquet"), "wb") as f:
        f.write(b"PAR1 this is not a real parquet footer")
    # per-READ option (not session conf): the tolerance rides with
    # this plan only, so it is still in force whenever the caller
    # materializes, and no other query inherits it
    return (
        spark.read.schema(TABLES["nation"])
        .option("ignoreCorruptFiles", "true")
        .parquet(path)
    )


@register(
    "op85_schema_evolution",
    "SELECT r_regionkey, r_name, NULL::VARCHAR AS r_comment "
    "FROM region WHERE r_regionkey < 3 "
    "UNION ALL "
    "SELECT r_regionkey, r_name, 'evolved-' || r_name AS r_comment "
    "FROM region WHERE r_regionkey >= 3",
    doc="schema evolution on read: generation 1 files lack a column "
    "that generation 2 adds; mergeSchema=true unifies them with "
    "NULLs for the old files — additive evolution without a table "
    "rewrite, the only evolution shape plain parquet supports (a "
    "rename or type change IS a rewrite; that contract is the doc). "
    "Oracle replays the union with the explicit NULL fill.",
)
def op85_schema_evolution(spark: SparkSession, sf: str) -> DataFrame:
    path = _scratch("region_evolving")
    region = _t(spark, sf, "region")
    gen1 = region.filter(F.col("r_regionkey") < 3)
    gen2 = region.filter(F.col("r_regionkey") >= 3).withColumn(
        "r_comment", F.concat(F.lit("evolved-"), F.col("r_name"))
    )
    gen1.write.mode("overwrite").parquet(os.path.join(path, "g=1"))
    gen2.write.mode("overwrite").parquet(os.path.join(path, "g=2"))
    return (
        spark.read.option("mergeSchema", "true")
        .parquet(path)
        .select("r_regionkey", "r_name", "r_comment")
    )


@register(
    "op87_python_datasource",
    "SELECT bucket, COUNT(*) AS n, ROUND(SUM(score), 3) AS total "
    "FROM (SELECT i AS doc_id, i % 7 AS bucket, "
    "ROUND((i * 37 % 1000) / 1000.0, 3) AS score "
    "FROM (SELECT UNNEST(RANGE(0, 5000)) AS i)) GROUP BY bucket",
    doc="custom Python DataSource (Spark 4 extension API): a "
    "registered format string whose reader plans its own partitions "
    "and generates rows per task — the connector surface for "
    "upstream SYSTEMS (feed APIs, queues, proprietary stores) as "
    "opposed to the mapInPandas fetcher's URL-list shape. The demo "
    "source is a pure function of the row id (failed tasks "
    "regenerate identical rows), so the oracle replays the "
    "generation rule arithmetically.",
)
def op87_python_datasource(spark: SparkSession, sf: str) -> DataFrame:
    from pdf_etl_ocr_inference_spark.sources.custom_source import (
        register_synthetic_source,
    )

    register_synthetic_source(spark)
    df = (
        spark.read.format("graft_synth")
        .option("n", 5000)
        .option("partitions", 8)
        .load()
    )
    return df.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("score"), 3).alias("total"),
    )


@register(
    "op88_streaming_datasource",
    "SELECT bucket, COUNT(*) AS n, ROUND(SUM(score), 3) AS total "
    "FROM (SELECT i % 7 AS bucket, "
    "ROUND((i * 37 % 1000) / 1000.0, 3) AS score "
    "FROM (SELECT UNNEST(RANGE(0, 1000)) AS i)) GROUP BY bucket",
    doc="custom STREAMING Python DataSource (Spark 4 "
    "SimpleDataSourceStreamReader): the source advances a monotonic "
    "offset, micro-batches replay exactly between committed offsets "
    "(read is a pure function of the offset range — the exactly-once "
    "contract a queue/feed connector must honor), and the run drains "
    "4 micro-batches into a sink before aggregating. Oracle replays "
    "the generation arithmetic over the full offset range.",
)
def op88_streaming_datasource(spark: SparkSession, sf: str) -> DataFrame:
    from pdf_etl_ocr_inference_spark.scratch import scratch_dir
    from pdf_etl_ocr_inference_spark.sources.custom_source import (
        register_synthetic_stream_source,
    )

    register_synthetic_stream_source(spark)
    out_dir = scratch_dir("synth_stream_sink")
    stream = (
        spark.readStream.format("graft_synth_stream")
        .option("rows_per_batch", 300)
        .option("max_rows", 1000)
        .load()
    )
    q = (
        stream.writeStream.format("parquet")
        .option("path", f"{out_dir}/data")
        .option("checkpointLocation", f"{out_dir}/ckpt")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    back = spark.read.parquet(f"{out_dir}/data")
    return back.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("score"), 3).alias("total"),
    )


@register(
    "op89_datasource_sink",
    "SELECT doc_id, lang, n_chars FROM documents",
    doc="custom Python DataSource SINK (Spark 4 writer API) with the "
    "task-file + driver-commit protocol: tasks stage uniquely named "
    "files and return commit messages, the driver publishes an "
    "atomic manifest, and the read-back honors ONLY manifest-listed "
    "files — debris from failed/speculated attempts is invisible "
    "(job-level exactly-once). Oracle = the source table: the "
    "write→manifest→read round trip must be lossless.",
)
def op89_datasource_sink(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import types as T

    from pdf_etl_ocr_inference_spark.scratch import scratch_dir
    from pdf_etl_ocr_inference_spark.sources.custom_source import (
        read_jsonl_sink,
        register_jsonl_sink,
    )

    register_jsonl_sink(spark)
    path = scratch_dir("jsonl_sink")
    docs = _t(spark, sf, "documents").select("doc_id", "lang", "n_chars")
    (
        docs.write.format("graft_jsonl_sink")
        .option("path", path)
        .mode("append")
        .save()
    )
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("lang", T.StringType()),
            T.StructField("n_chars", T.IntegerType()),
        ]
    )
    return read_jsonl_sink(spark, path, schema)
