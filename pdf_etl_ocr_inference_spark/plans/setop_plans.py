"""Set-operation / pivot / outer-join / JSON-struct catalog — the
remaining relational surface (SURVEY §2.12 extensions beyond OP-47
union, §2.11 JSON note).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pdf_etl_ocr_inference_spark.plans.registry import register
from pdf_etl_ocr_inference_spark.sources.catalog import load_table as _t


@register(
    "op58_intersect",
    "SELECT o_custkey FROM orders WHERE o_orderstatus = 'F' "
    "INTERSECT "
    "SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'",
    doc="INTERSECT (distinct semantics) — customers with both a "
    "finished and an urgent order. Spark plans it as a left-semi over "
    "distinct inputs.",
)
def op58_intersect(spark: SparkSession, sf: str) -> DataFrame:
    orders = _t(spark, sf, "orders")
    a = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    b = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_custkey"
    )
    return a.intersect(b)


@register(
    "op58b_except",
    "SELECT o_custkey FROM orders WHERE o_orderstatus = 'F' "
    "EXCEPT "
    "SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'",
    doc="EXCEPT (distinct set semantics — subtract(), not exceptAll's "
    "bag difference) — the left-anti counterpart.",
)
def op58b_except(spark: SparkSession, sf: str) -> DataFrame:
    orders = _t(spark, sf, "orders")
    a = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    b = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_custkey"
    )
    return a.subtract(b)


@register(
    "op59_pivot",
    "SELECT user_id, "
    "COUNT(*) FILTER (event_type = 'click') AS click, "
    "COUNT(*) FILTER (event_type = 'purchase') AS purchase, "
    "COUNT(*) FILTER (event_type = 'view') AS view "
    "FROM events GROUP BY user_id",
    doc="pivot with an explicit value list (explicit values keep the "
    "plan single-pass; omitting them costs a distinct-scan first). "
    "Compiles to one hash agg with conditional counts.",
)
def op59_pivot(spark: SparkSession, sf: str) -> DataFrame:
    events = _t(spark, sf, "events")
    return (
        events.groupBy("user_id")
        .pivot("event_type", ["click", "purchase", "view"])
        .agg(F.count(F.lit(1)))
        .na.fill(0, ["click", "purchase", "view"])
    )


@register(
    "op60_full_outer_join",
    "SELECT COALESCE(f.o_custkey, u.o_custkey) AS custkey, "
    "COALESCE(f.n_f, 0) AS n_finished, COALESCE(u.n_u, 0) AS n_urgent "
    "FROM (SELECT o_custkey, COUNT(*) AS n_f FROM orders "
    "      WHERE o_orderstatus = 'F' GROUP BY 1) f "
    "FULL OUTER JOIN "
    "     (SELECT o_custkey, COUNT(*) AS n_u FROM orders "
    "      WHERE o_orderpriority = '1-URGENT' GROUP BY 1) u "
    "ON f.o_custkey = u.o_custkey",
    doc="full outer join of two aggregates with coalesced keys — the "
    "reconciliation shape (both sides shuffle once on the key).",
)
def op60_full_outer_join(spark: SparkSession, sf: str) -> DataFrame:
    orders = _t(spark, sf, "orders")
    f = (
        orders.filter(F.col("o_orderstatus") == "F")
        .groupBy(F.col("o_custkey").alias("f_key"))
        .agg(F.count("*").alias("n_f"))
    )
    u = (
        orders.filter(F.col("o_orderpriority") == "1-URGENT")
        .groupBy(F.col("o_custkey").alias("u_key"))
        .agg(F.count("*").alias("n_u"))
    )
    return f.join(u, f["f_key"] == u["u_key"], "full_outer").select(
        F.coalesce("f_key", "u_key").alias("custkey"),
        F.coalesce("n_f", F.lit(0)).alias("n_finished"),
        F.coalesce("n_u", F.lit(0)).alias("n_urgent"),
    )


@register(
    "op48b_from_json",
    "SELECT event_id, CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT) "
    "AS k, JSON_EXTRACT_STRING(props, '$.source') AS source "
    "FROM events",
    doc="from_json with an explicit struct schema (vs op48's "
    "path-extraction): one parse, N typed fields — the right shape "
    "when several props are read (get_json_object re-parses per "
    "path).",
)
def op48b_from_json(spark: SparkSession, sf: str) -> DataFrame:
    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("source", T.StringType()),
        ]
    )
    events = _t(spark, sf, "events")
    return events.select(
        "event_id", F.from_json("props", schema).alias("_p")
    ).select("event_id", F.col("_p.k").alias("k"), F.col("_p.source").alias("source"))


@register(
    "op61_collect_list",
    "SELECT o_custkey, ARRAY_TO_STRING(LIST_SORT(LIST(o_orderkey)), ',') "
    "AS orderkeys "
    "FROM orders WHERE o_totalprice > 400000 GROUP BY o_custkey",
    doc="grouped list aggregation, sorted for determinism "
    "(collect_list order is partition-dependent; array_sort makes it "
    "canonical — required for the value-hash oracle and any "
    "downstream equality). The gated column is the comma-joined "
    "STRING of the sorted list, not the array itself: the driver's "
    "canonicalizer (pandas sort_values/factorize) cannot hash array "
    "cells, so no catalog output column may be array-typed "
    "(round-4 lesson — same fix as ann_pca_project).",
)
def op61_collect_list(spark: SparkSession, sf: str) -> DataFrame:
    orders = _t(spark, sf, "orders").filter(F.col("o_totalprice") > 400000)
    return orders.groupBy("o_custkey").agg(
        F.array_join(
            F.array_sort(F.collect_list("o_orderkey")), ","
        ).alias("orderkeys")
    )


@register(
    "op43b_index_refresh",
    "SELECT status, CAST(COUNT(*) AS BIGINT) AS n FROM ("
    "SELECT CASE WHEN doc_id % 10 < 6 THEN 'kept' ELSE 'embedded' END "
    "AS status FROM documents) GROUP BY status",
    doc="incremental index refresh (ref ocr:149 TRIGGERED sync, "
    "batch-shaped): embed ONLY documents missing from the existing "
    "index (left-anti join), union with the kept entries. At 100 TB "
    "the anti-join prunes to the delta; nothing re-embeds.",
)
def op43b_index_refresh(spark: SparkSession, sf: str) -> DataFrame:
    from pdf_etl_ocr_inference_spark.operators.inference import (
        with_embeddings,
    )

    docs = _t(spark, sf, "documents")
    # pretend the first 60% of doc_ids are already indexed
    existing = docs.filter(
        F.col("doc_id") % 10 < 6
    ).select("doc_id", F.lit("kept").alias("status"))
    missing = docs.join(existing, "doc_id", "left_anti")
    embedded = with_embeddings(missing, "text", out_col="emb", dim=64).select(
        "doc_id", F.lit("embedded").alias("status")
    )
    return existing.unionByName(embedded).groupBy("status").agg(
        F.count("*").alias("n")
    )


@register(
    "op86_variant_json",
    "SELECT event_type, COUNT(*) AS n, "
    "ROUND(AVG(CAST(JSON_EXTRACT_STRING(props, '$.k') AS INT)), 4) "
    "AS avg_k, MAX(CAST(JSON_EXTRACT_STRING(props, '$.k') AS INT)) "
    "AS max_k FROM events GROUP BY event_type",
    doc="semi-structured VARIANT handling (Spark 4 parse_json + "
    "try_variant_get): the JSON props column parses once into the "
    "binary variant encoding and fields extract WITHOUT a declared "
    "schema — the open-schema complement of op48b's fixed-struct "
    "from_json (evolving event payloads keep querying as producers "
    "add fields). Extraction is native columnar; the shuffle is the "
    "one grouped agg.",
)
def op86_variant_json(spark: SparkSession, sf: str) -> DataFrame:
    ev = _t(spark, sf, "events")
    k = F.try_variant_get(F.parse_json("props"), "$.k", "int")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("k"), 4).alias("avg_k"),
            F.max("k").alias("max_k"),
        )
    )


@register(
    "op47b_union_schema_drift",
    "SELECT doc_id, lang, source, n_chars FROM ("
    "SELECT doc_id, lang, NULL AS source, n_chars "
    "FROM documents WHERE doc_id % 2 = 0 "
    "UNION ALL "
    "SELECT doc_id, NULL AS lang, source, NULL AS n_chars "
    "FROM documents WHERE doc_id % 2 = 1)",
    doc="schema-drift union (unionByName with allowMissingColumns): "
    "two feeds of the same logical table carry DIFFERENT column "
    "subsets — the ingestion reality when producers evolve at "
    "different speeds — and the union aligns by NAME, NULL-filling "
    "absences, where positional UNION would silently misalign or "
    "fail. Oracle spells out the NULL completion explicitly; at "
    "scale this is a zero-shuffle plan (union is a no-op operator).",
)
def op47b_union_schema_drift(spark: SparkSession, sf: str) -> DataFrame:
    docs = _t(spark, sf, "documents")
    a = docs.filter(F.col("doc_id") % 2 == 0).select(
        "doc_id", "lang", "n_chars"
    )
    b = docs.filter(F.col("doc_id") % 2 == 1).select("doc_id", "source")
    return a.unionByName(b, allowMissingColumns=True).select(
        "doc_id", "lang", "source", "n_chars"
    )
