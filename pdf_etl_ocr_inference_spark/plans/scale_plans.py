"""Scale-pattern catalog: the shuffle-management techniques a 100 TB
deployment leans on, each oracle-verified to produce identical results
to its naive formulation.

- salted aggregation: two-phase agg over a salted key defeats key skew
  (one hot key no longer lands on one reducer).
- bucketed co-located join: both sides pre-bucketed by the join key →
  the join runs with ZERO exchange (asserted in plan tests).
- connected-components clustering over near-dup pairs: the iterative
  small-data step that turns pairwise dedup output into groups
  (label propagation to the min id; DuckDB oracle uses a recursive
  CTE over the same pair set).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdf_etl_ocr_inference_spark.plans.registry import register
from pdf_etl_ocr_inference_spark.sources.catalog import load_table as _t


@register(
    "op56_salted_agg",
    "SELECT o_orderpriority, COUNT(*) AS n, "
    "ROUND(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) / 100.0, 2) AS total FROM orders GROUP BY 1",
    doc="skew-defeating two-phase aggregation: salt the (5-value, "
    "hence skewed at scale) group key with 16 shards, partial-agg on "
    "(key, salt), final-agg on key. Result provably identical to the "
    "plain groupBy (the oracle). At 100 TB the partial agg spreads "
    "each hot key over 16 reducers; the final agg moves only "
    "16 rows/key.",
)
def op56_salted_agg(spark: SparkSession, sf: str) -> DataFrame:
    orders = _t(spark, sf, "orders")
    n_salt = 16
    partial = (
        orders.withColumn(
            "_salt", (F.crc32(F.col("o_orderkey").cast("string")) % n_salt)
        )
        .groupBy("o_orderpriority", "_salt")
        .agg(
            F.count("*").alias("_n"),
            # exact integer cents so the two-phase accumulation order
            # (salt shards, then final) can never move a ulp
            F.sum(
                F.round(F.col("o_totalprice") * 100, 0).cast("long")
            ).alias("_sum"),
        )
    )
    return partial.groupBy("o_orderpriority").agg(
        F.sum("_n").alias("n"),
        F.round(F.sum("_sum") / 100.0, 2).alias("total"),
    )


@register(
    "op57_bucketed_join",
    "SELECT o.o_orderkey, o.o_totalprice, x.n_items FROM orders o JOIN ("
    "  SELECT l_orderkey, COUNT(*) AS n_items FROM lineitem "
    "  GROUP BY l_orderkey) x ON o.o_orderkey = x.l_orderkey",
    doc="bucketed co-located join: both sides written bucketed by the "
    "join key (16 buckets), so the join needs no exchange on either "
    "side — the pattern for repeatedly-joined 100 TB fact tables. "
    "Plan test asserts zero Exchange under the join.",
)
def op57_bucketed_join(spark: SparkSession, sf: str) -> DataFrame:
    spark.sql("CREATE DATABASE IF NOT EXISTS engine_buckets")
    orders = _t(spark, sf, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    items = (
        _t(spark, sf, "lineitem")
        .groupBy(F.col("l_orderkey").alias("o_orderkey"))
        .agg(F.count("*").alias("n_items"))
    )
    from pdf_etl_ocr_inference_spark.sources.writers import drop_managed_table

    for name, df in [("orders_b", orders), ("items_b", items)]:
        drop_managed_table(spark, "engine_buckets", name)
        (
            df.write.mode("overwrite")
            .format("parquet")
            .bucketBy(16, "o_orderkey")
            .sortBy("o_orderkey")
            .saveAsTable(f"engine_buckets.{name}")
        )
    ob = spark.table("engine_buckets.orders_b")
    ib = spark.table("engine_buckets.items_b")
    # force sort-merge (small fixtures would auto-broadcast, hiding
    # the point): with both sides bucketed+sorted on the key, SMJ
    # runs with zero exchange and zero sort
    return ob.hint("merge").join(ib, "o_orderkey").select(
        "o_orderkey", "o_totalprice", "n_items"
    )


@register(
    "op69_observed_metrics",
    "SELECT COUNT(*) AS rows_seen, ROUND(SUM(l_quantity), 2) AS qty_seen "
    "FROM lineitem WHERE l_returnflag = 'R'",
    doc="pipeline observability: Observation metrics ride the SAME "
    "scan as the real work (zero extra passes) — the production "
    "pattern for row-count/quality counters on every job. The query "
    "returns the observed values; the oracle recomputes them "
    "relationally, proving the observation channel is exact.",
)
def op69_observed_metrics(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Observation

    obs = Observation("etl_metrics")
    li = (
        _t(spark, sf, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .observe(
            obs,
            F.count(F.lit(1)).alias("rows_seen"),
            F.round(F.sum("l_quantity"), 2).alias("qty_seen"),
        )
    )
    li.write.format("noop").mode("overwrite").save()  # the "real work"
    got = obs.get
    return spark.createDataFrame(
        [(got["rows_seen"], got["qty_seen"])],
        "rows_seen long, qty_seen double",
    )


@register(
    "op68_merge_upsert",
    "SELECT status, COUNT(*) AS n, ROUND(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) / 100.0, 2) AS total "
    "FROM ("
    "  SELECT CASE WHEN o_orderkey % 5 = 0 THEN 'updated' ELSE 'kept' END "
    "  AS status, CASE WHEN o_orderkey % 5 = 0 "
    "  THEN o_totalprice + 1000.0 ELSE o_totalprice END AS o_totalprice "
    "  FROM orders "
    "  UNION ALL SELECT 'inserted', 123.45 "
    "  FROM range(10)) "
    "GROUP BY status",
    doc="MERGE INTO (upsert) as a single full-outer reconciliation: "
    "matched rows take the source's values, unmatched-source rows "
    "insert, unmatched-target rows persist — one shuffle per side, "
    "no per-row lookups. The lakehouse write idiom behind the "
    "reference's Delta tables, engine-native.",
)
def op68_merge_upsert(spark: SparkSession, sf: str) -> DataFrame:
    orders = _t(spark, sf, "orders").select("o_orderkey", "o_totalprice")
    # source: updates for keys %5==0 (price bump) + 10 brand-new rows
    updates = (
        orders.filter(F.col("o_orderkey") % 5 == 0)
        .select(
            "o_orderkey",
            (F.col("o_totalprice") + 1000.0).alias("o_totalprice"),
        )
    )
    max_key = 10_000_000_000
    inserts = spark.range(10).select(
        (F.col("id") + max_key).alias("o_orderkey"),
        F.lit(123.45).alias("o_totalprice"),
    )
    source = updates.unionByName(inserts)
    t = orders.select(
        F.col("o_orderkey").alias("t_key"),
        F.col("o_totalprice").alias("t_price"),
    )
    s = source.select(
        F.col("o_orderkey").alias("s_key"),
        F.col("o_totalprice").alias("s_price"),
    )
    merged = t.join(s, t["t_key"] == s["s_key"], "full_outer").select(
        F.coalesce("s_key", "t_key").alias("o_orderkey"),
        F.coalesce("s_price", "t_price").alias("o_totalprice"),
        F.when(F.col("t_key").isNull(), "inserted")
        .when(F.col("s_key").isNull(), "kept")
        .otherwise("updated")
        .alias("status"),
    )
    return merged.groupBy("status").agg(
        F.count("*").alias("n"),
        F.round(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
            / 100.0,
            2,
        ).alias("total"),
    )


@register(
    "op56b_salted_join",
    "SELECT n_name, COUNT(*) AS n_customers FROM customer "
    "JOIN nation ON c_nationkey = n_nationkey GROUP BY n_name",
    doc="skew-defeating salted join: the fact side's hot key space is "
    "split 8 ways (key, salt) and the dimension side replicates once "
    "per salt, so one hot nation no longer lands on one reducer. "
    "Result provably identical to the plain join (the oracle). Used "
    "when AQE's skew splitting can't help (e.g. aggregation follows "
    "the join on the same key).",
)
def op56b_salted_join(spark: SparkSession, sf: str) -> DataFrame:
    n_salt = 8
    cust = _t(spark, sf, "customer").withColumn(
        "_salt", (F.crc32(F.col("c_custkey").cast("string")) % n_salt)
    )
    nation = _t(spark, sf, "nation").withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    return (
        cust.join(
            nation,
            (cust["c_nationkey"] == nation["n_nationkey"])
            & (cust["_salt"] == nation["_salt"]),
        )
        .groupBy("n_name")
        .agg(F.count("*").alias("n_customers"))
    )


# Recursive-CTE ground truth for connected components over the
# exact-duplicate pair graph; shared by both CC implementations so the
# O(diameter) and O(log n) variants are verified against the identical
# answer.
_CC_ORACLE = (
    "WITH RECURSIVE pairs AS ("
    "  SELECT a.doc_id AS id_a, b.doc_id AS id_b FROM ("
    "    SELECT doc_id, MD5(TRIM(REGEXP_REPLACE(REGEXP_REPLACE(LOWER(text),"
    " '[^a-z0-9\\s]', '', 'g'), '\\s+', ' ', 'g'))) AS fp FROM documents) a "
    "  JOIN ("
    "    SELECT doc_id, MD5(TRIM(REGEXP_REPLACE(REGEXP_REPLACE(LOWER(text),"
    " '[^a-z0-9\\s]', '', 'g'), '\\s+', ' ', 'g'))) AS fp FROM documents) b "
    "  ON a.fp = b.fp AND a.doc_id <> b.doc_id), "
    "reach AS ("
    "  SELECT doc_id, doc_id AS root FROM documents "
    "  UNION "
    "  SELECT p.id_a AS doc_id, r.root FROM pairs p "
    "  JOIN reach r ON p.id_b = r.doc_id) "
    "SELECT doc_id, MIN(root) AS cluster_id FROM reach GROUP BY doc_id"
)


@register(
    "dedup_clusters",
    _CC_ORACLE,
    doc="connected-components clustering over exact-duplicate pairs, "
    "CLOSED FORM (r12 perf pass): the exact-dup pair graph is a "
    "union of fingerprint-group cliques, so every component IS a "
    "fingerprint group and its min label IS the group's min doc_id — "
    "one window shuffle on the fingerprint, no propagation rounds. "
    "The step that turns pairwise dedup output into keep/drop "
    "groups. Oracle = recursive CTE over the clique pairs, so the "
    "closed form is value-checked against the graph-reachability "
    "semantics every gate run; the ITERATIVE engines for pair "
    "graphs that are NOT fingerprint cliques (near-dup output, "
    "arbitrary edges) remain dedup_clusters_sv (Shiloach–Vishkin "
    "hook+shortcut), operators/dedup.connected_components, and "
    "op90_recursive_cte — all held to this same oracle.",
)
def dedup_clusters(spark: SparkSession, sf: str) -> DataFrame:
    from pdf_etl_ocr_inference_spark.functions.text import doc_fingerprint

    docs = _t(spark, sf, "documents")
    # r8 shrank the edge set from clique to star (every member wired
    # to the group min) because a clique's components equal a star's;
    # r12 takes the same argument one step further: the star's
    # component labeling is ALREADY the star construction's window
    # min, so materializing edges and propagating labels over them
    # (2 rounds × [neighbor-min shuffle + label join + checkpoint +
    # convergence-probe job] in the r11 shape) computed nothing the
    # window had not.  At 100 TB this removes every per-round
    # pair-graph shuffle; generic-graph CC stays available in
    # dedup_clusters_sv / connected_components for inputs where the
    # component structure is genuinely unknown.
    from pyspark.sql import Window

    return docs.select(
        "doc_id",
        doc_fingerprint("text").alias("fp"),
    ).select(
        "doc_id",
        F.min("doc_id")
        .over(Window.partitionBy("fp"))
        .alias("cluster_id"),
    )


@register(
    "dedup_clusters_sv",
    _CC_ORACLE,
    doc="log-round connected components (Shiloach–Vishkin hook + "
    "pointer-jump shortcut, operators/dedup.connected_components) over "
    "the same exact-dup pair graph as dedup_clusters. Plain propagation "
    "is O(diameter) rounds; the shortcut halves label-chain length "
    "every round → O(log n) rounds on chain-shaped near-dup graphs, "
    "the shape that matters at 100 TB. Oracle identical to "
    "dedup_clusters (same recursive CTE) ⇒ both variants provably "
    "agree.",
)
def dedup_clusters_sv(spark: SparkSession, sf: str) -> DataFrame:
    from pdf_etl_ocr_inference_spark.functions.text import doc_fingerprint
    from pdf_etl_ocr_inference_spark.operators.dedup import (
        connected_components,
    )
    docs = _t(spark, sf, "documents")
    # star edges per fingerprint group — see dedup_clusters (r8)
    from pyspark.sql import Window

    fp = docs.select("doc_id", doc_fingerprint("text").alias("fp"))
    marked = fp.withColumn(
        "_root", F.min("doc_id").over(Window.partitionBy("fp"))
    )
    pairs = marked.filter(F.col("doc_id") != F.col("_root")).select(
        F.col("doc_id").alias("id_a"), F.col("_root").alias("id_b")
    )
    labels, _rounds = connected_components(pairs)
    return docs.select("doc_id").join(
        labels.withColumnRenamed("node", "doc_id")
        .withColumnRenamed("component", "_cc"),
        "doc_id",
        "left",
    ).select(
        "doc_id", F.coalesce("_cc", F.col("doc_id")).alias("cluster_id")
    )


# ------------------------------------------------------------------
# Multi-dimensional layout + runtime join pruning
# ------------------------------------------------------------------


def _zorder_scratch(sf: str) -> str:
    import os

    from pdf_etl_ocr_inference_spark.scratch import scratch_root

    tag = os.path.basename(os.path.normpath(sf))
    return os.path.join(scratch_root(), f"zorder_orders_{tag}")


@register(
    "op70_zorder_layout",
    "SELECT COUNT(*) AS n, ROUND(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) / 100.0, 2) AS total "
    "FROM orders WHERE o_custkey BETWEEN 100 AND 299 "
    "AND o_orderdate >= TIMESTAMP '1996-01-01' "
    "AND o_orderdate < TIMESTAMP '1997-01-01'",
    doc="Z-order (Morton) clustered layout: orders rewritten sorted by "
    "the bit-interleaving of (o_custkey, days-since-1995) — "
    "operators/layout.zorder_key — via repartitionByRange + "
    "sortWithinPartitions, then a 2-D box predicate is answered from "
    "the clustered copy. Oracle = same predicate on the original "
    "table, proving the rewrite is content-preserving. The point at "
    "100 TB: row-group min/max stats prune for BOTH dimensions "
    "(measured in tests/test_zorder.py), where a linear sort serves "
    "only its leading column; the write itself is one range shuffle.",
)
def op70_zorder_layout(spark: SparkSession, sf: str) -> DataFrame:
    from pdf_etl_ocr_inference_spark.operators.layout import zorder_key

    orders = _t(spark, sf, "orders")
    x = F.col("o_custkey").bitwiseAND(F.lit(4095))
    y = (
        F.datediff(
            F.to_date("o_orderdate"), F.to_date(F.lit("1995-01-01"))
        ).bitwiseAND(F.lit(4095))
    )
    path = _zorder_scratch(sf)
    (
        orders.withColumn("_z", zorder_key([x, y], bits=12))
        .repartitionByRange(16, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
    zo = spark.read.parquet(path)
    return zo.filter(
        F.col("o_custkey").between(100, 299)
        & (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    ).agg(
        F.count("*").alias("n"),
        F.round(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
            / 100.0,
            2,
        ).alias("total"),
    )


@register(
    "op96_result_cache",
    "SELECT o_orderpriority, COUNT(*) AS n, "
    "ROUND(AVG(o_totalprice), 2) AS avg_total "
    "FROM orders GROUP BY o_orderpriority",
    doc="persistent query-result cache (the warehouse result-reuse "
    "feature, engine-native): the aggregate's result is keyed by a "
    "semantic fingerprint — Catalyst's CANONICALIZED plan + "
    "semanticHash + the source file inventory with sizes/mtimes — and "
    "published atomically (manifest last). The entry computes through "
    "the cache twice in-process: the second call is a HIT (asserted) "
    "and serves the identical rows from the result parquet without "
    "re-running the plan. Any rewrite of any input file changes the "
    "key, so a stale hit is impossible by construction "
    "(tests/test_result_cache.py proves plan-spelling invariance, "
    "mtime invalidation, and crash-safe publish). At 100 TB this "
    "turns repeated dashboard/agg queries into one small parquet "
    "read; the fingerprint is driver-side metadata work.",
)
def op96_result_cache(spark: SparkSession, sf: str) -> DataFrame:
    from pdf_etl_ocr_inference_spark.operators.result_cache import (
        cached_result,
        invalidate,
    )

    def q():
        return (
            _t(spark, sf, "orders")
            .groupBy("o_orderpriority")
            .agg(
                F.count("*").alias("n"),
                F.round(F.avg("o_totalprice"), 2).alias("avg_total"),
            )
        )

    invalidate(q())  # hermetic: prior runs of this entry don't leak in
    first, hit1 = cached_result(q())
    first.count()
    again, hit2 = cached_result(q())
    assert not hit1 and hit2, (hit1, hit2)
    return again


@register(
    "op70b_stats_pruned_scan",
    "SELECT o_orderpriority, COUNT(*) AS n, "
    "ROUND(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) / 100.0, 2) AS total "
    "FROM orders WHERE o_custkey BETWEEN 100 AND 299 "
    "AND o_orderdate >= TIMESTAMP '1996-01-01' "
    "AND o_orderdate < TIMESTAMP '1997-01-01' "
    "GROUP BY o_orderpriority",
    doc="FILE-level data skipping over the Z-ordered layout: a per-file "
    "min/max sidecar is built from parquet FOOTERS only (distributed "
    "mapInPandas over the listing — cost ∝ file count, not bytes; the "
    "skipping index Delta/Iceberg maintain, for plain parquet) and "
    "PERSISTED + manifest-stamped (load_or_refresh_file_stats), then "
    "the 2-D box predicate schedules scan tasks ONLY for overlapping "
    "files and re-applies the exact filters to surviving rows. Since "
    "r10 the keep-list comes from the executor-pinned chunk probe "
    "under manifest-digest coverage — O(keep·cols) driver rows, no "
    "O(files) listing or fingerprint collect per query (the same "
    "treatment scan_point_lookup got in r9). Correctness never rests "
    "on the stats (kept files re-filter row-wise; oracle = same "
    "predicate on the pristine table); tests/test_zorder.py asserts "
    "files_read < files_total, i.e. the skip actually engages on the "
    "clustered copy. At 100 TB this is the difference between "
    "touching ~1% of files and listing-scanning all of them when the "
    "query's box is small.",
)
def op70b_stats_pruned_scan(spark: SparkSession, sf: str) -> DataFrame:
    import datetime as dt
    import os

    from pdf_etl_ocr_inference_spark.operators.layout import (
        scan_with_skipping,
        zorder_key,
    )
    from pdf_etl_ocr_inference_spark.scratch import scratch_root

    orders = _t(spark, sf, "orders")
    x = F.col("o_custkey").bitwiseAND(F.lit(4095))
    y = (
        F.datediff(
            F.to_date("o_orderdate"), F.to_date(F.lit("1995-01-01"))
        ).bitwiseAND(F.lit(4095))
    )
    tag = os.path.basename(os.path.normpath(sf))
    path = os.path.join(scratch_root(), f"zorder_stats_orders_{tag}")
    (
        orders.withColumn("_z", zorder_key([x, y], bits=12))
        .repartitionByRange(16, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
    epoch = dt.datetime(1970, 1, 1)
    lo = (dt.datetime(1996, 1, 1) - epoch).total_seconds()
    hi = (dt.datetime(1997, 1, 1) - epoch).total_seconds()
    # stats=None: the operator builds/refreshes the persisted sidecar
    # itself and serves the keep-list from the manifest-verified
    # executor-pinned probe (cold here — the layout was just
    # rewritten — warm on every later scan of an unchanged layout)
    pruned, _n_read, _n_total = scan_with_skipping(
        spark, path,
        {"o_custkey": (100, 299), "o_orderdate": (lo, hi)},
    )
    return (
        pruned.filter(
            F.col("o_custkey").between(100, 299)
            & (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.round(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
            / 100.0,
            2,
        ).alias("total"),
        )
    )


@register(
    "op70c_bloom_point_lookup",
    "SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 2) AS total "
    "FROM orders WHERE o_orderkey IN "
    "(SELECT o_orderkey FROM orders ORDER BY o_orderkey LIMIT 5)",
    doc="per-FILE Bloom-filter point lookup — the skipping index for "
    "the case min/max stats cannot serve: the table is laid out by "
    "customer, the probe is 5 order ids, so every file's orderkey "
    "RANGE covers the probe and range-skipping keeps all of them; the "
    "Bloom sidecar (distributed one-column build, k-bit membership "
    "per file, ~1% fpp) keeps only files that might contain a probed "
    "id. False positives cost an extra file read, never a wrong row — "
    "the exact IN predicate re-applies row-wise (oracle = the same "
    "IN on the pristine table). tests/test_zorder.py asserts the "
    "bloom prunes where min/max provably cannot. The 5 probe ids are "
    "the 5 lowest orderkeys (driver-side bounded control data, the "
    "IN-list-probe precedent), so the entry is SF-independent.",
)
def op70c_bloom_point_lookup(spark: SparkSession, sf: str) -> DataFrame:
    import os

    from pdf_etl_ocr_inference_spark.operators.layout import (
        build_file_bloom,
        scan_point_lookup,
    )
    from pdf_etl_ocr_inference_spark.scratch import scratch_root

    orders = _t(spark, sf, "orders")
    tag = os.path.basename(os.path.normpath(sf))
    path = os.path.join(scratch_root(), f"bloom_orders_{tag}")
    (
        orders.repartitionByRange(16, "o_custkey")
        .sortWithinPartitions("o_custkey")
        .write.mode("overwrite")
        .parquet(path)
    )
    build_file_bloom(spark, path, "o_orderkey")
    probe = [
        r["o_orderkey"]
        for r in orders.select("o_orderkey")
        .orderBy("o_orderkey")
        .limit(5)
        .collect()
    ]
    hit, _n_read, _n_total = scan_point_lookup(
        spark, path, "o_orderkey", probe
    )
    return hit.select(
        "o_orderkey",
        "o_custkey",
        F.round("o_totalprice", 2).alias("total"),
    )


@register(
    "op71_bloom_join",
    "SELECT o_orderpriority, COUNT(*) AS n, "
    "ROUND(SUM(l_extendedprice), 2) AS total "
    "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
    "WHERE o_orderpriority = '1-URGENT' GROUP BY o_orderpriority",
    doc="runtime Bloom-filter join pruning: Catalyst's "
    "InjectRuntimeFilter plants a bloom_filter_agg of the selective "
    "build side's join keys as a might_contain pre-filter on the "
    "probe-side SCAN, so at 100 TB most lineitem rows die at the scan "
    "instead of crossing the join shuffle (~5× fewer shuffled rows "
    "for a 1-of-5 priority filter). Injection thresholds are tuned "
    "for fixture sizes during planning only (saved/restored); the "
    "plan test asserts might_contain sits on the probe side. "
    "Result provably identical to the plain join (the oracle).",
)
def op71_bloom_join(spark: SparkSession, sf: str) -> DataFrame:
    li = _t(spark, sf, "lineitem").select("l_orderkey", "l_extendedprice")
    orders = _t(spark, sf, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    saved = {}
    tuned = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        # fixture scans are far below the 10 GB production default
        "spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold": "0",
        # keep the join a shuffle join at planning time: a broadcast
        # build side would get DPP/no filter and hide the mechanism
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    for k, v in tuned.items():
        saved[k] = spark.conf.get(k, None)
        spark.conf.set(k, v)
    try:
        out = (
            li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
            .groupBy("o_orderpriority")
            .agg(
                F.count("*").alias("n"),
                F.round(F.sum("l_extendedprice"), 2).alias("total"),
            )
        )
        # materialize logical optimization + physical planning NOW so
        # the bloom filter is baked into this DataFrame's plan before
        # the thresholds are restored (plans are lazy vals on the
        # Dataset's QueryExecution — later actions reuse them)
        out._jdf.queryExecution().executedPlan()
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    return out


@register(
    "op73_skew_stats",
    "WITH c AS (SELECT user_id, COUNT(*) AS cnt FROM events "
    "GROUP BY user_id) "
    "SELECT COUNT(*) AS n_keys, MAX(cnt) AS max_cnt, "
    "ROUND(AVG(cnt), 4) AS avg_cnt, "
    "ROUND(MAX(cnt) * 1.0 / AVG(cnt), 4) AS skew_ratio, "
    "ROUND(QUANTILE_CONT(cnt, 0.99), 4) AS p99_cnt FROM c",
    doc="shuffle-key skew diagnostic: per-key cardinality profile "
    "(max/avg ratio + p99) for a prospective groupBy/join key — the "
    "pre-flight check that tells you whether a key needs salting "
    "(op56) or AQE skew-join before you pay for the full job.  Two "
    "combinable aggregations; the per-key layer is exactly the "
    "shuffle the real query would do, the summary is one row.",
)
def op73_skew_stats(spark: SparkSession, sf: str) -> DataFrame:
    c = (
        _t(spark, sf, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return c.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.max("cnt").alias("max_cnt"),
        F.round(F.avg("cnt"), 4).alias("avg_cnt"),
        F.round(F.max("cnt") / F.avg("cnt"), 4).alias("skew_ratio"),
        F.round(F.expr("percentile(cnt, 0.99)"), 4).alias("p99_cnt"),
    )


_PR_GRAPH = (
    # exact-duplicate docs collapse to their min-id survivor BEFORE
    # pair derivation: d identical docs would otherwise contribute
    # d^2/2 edges per shared gram (the LSH hot-bucket regime); clique
    # members are interchangeable for reuse-centrality, so the
    # survivor represents them
    "surv AS (SELECT MIN(doc_id) AS doc_id FROM ("
    "SELECT doc_id, MD5(TRIM(REGEXP_REPLACE(REGEXP_REPLACE(LOWER(text),"
    " '[^a-z0-9\\s]', '', 'g'), '\\s+', ' ', 'g'))) AS fp "
    "FROM documents) GROUP BY fp), "
    "d AS (SELECT doc_id, text FROM documents JOIN surv USING (doc_id)), "
    "toks AS (SELECT doc_id, STRING_SPLIT_REGEX(TRIM(text), '\\s+') "
    "AS t FROM d), "
    "occ AS (SELECT doc_id, ARRAY_TO_STRING(t[i+1:i+6], ' ') AS gram "
    "FROM toks, UNNEST(RANGE(0, GREATEST(LEN(t) - 5, 0))) AS r(i)), "
    "dup AS (SELECT gram FROM occ GROUP BY gram "
    "HAVING COUNT(DISTINCT doc_id) >= 2), "
    "dp AS (SELECT DISTINCT a.doc_id AS ia, b.doc_id AS ib "
    "FROM occ a JOIN occ b ON a.gram = b.gram AND a.doc_id < b.doc_id "
    "JOIN dup d ON d.gram = a.gram), "
    "edges AS (SELECT ia AS s, ib AS t FROM dp "
    "UNION ALL SELECT ib, ia FROM dp), "
    "deg AS (SELECT s, COUNT(*) AS outd FROM edges GROUP BY s), "
    "nn AS (SELECT COUNT(DISTINCT s) AS c FROM edges)"
)

_PR_STEP = (
    "{next} AS (SELECT e.t AS id, "
    "0.15::DOUBLE / (SELECT c FROM nn) + 0.85::DOUBLE * "
    "SUM(r.r / d.outd) AS r FROM edges e "
    "JOIN {prev} r ON r.id = e.s JOIN deg d ON d.s = e.s GROUP BY e.t)"
)


@register(
    "graph_pagerank",
    "WITH " + _PR_GRAPH + ", "
    "r0 AS (SELECT DISTINCT s AS id, "
    "1.0::DOUBLE / (SELECT c FROM nn) AS r FROM edges), "
    + _PR_STEP.format(next="r1", prev="r0") + ", "
    + _PR_STEP.format(next="r2", prev="r1") + ", "
    + _PR_STEP.format(next="r3", prev="r2") + " "
    "SELECT id, ROUND(r, 6) AS rank_score FROM r3",
    doc="PageRank (3 fixed power iterations, d=0.85) over the "
    "span-share graph: docs are linked when they share a cross-doc "
    "duplicated 6-gram — reuse-centrality for corpus curation (a "
    "doc whose passages echo through many others is boilerplate-"
    "like even below pair-dedup thresholds). Exact-dup cliques "
    "collapse to their survivor BEFORE pair derivation, so mass "
    "duplication cannot go quadratic in the edge build (the LSH "
    "hot-bucket lesson, applied here too). Per iteration: one "
    "edge-list shuffle + one combinable agg; the corpus never "
    "enters the loop. Oracle unrolls the identical 3 iterations.",
)
def graph_pagerank(spark: SparkSession, sf: str) -> DataFrame:
    from pdf_etl_ocr_inference_spark.operators.graph import pagerank
    from pdf_etl_ocr_inference_spark.operators.span_dedup import (
        positional_ngrams,
    )

    from pdf_etl_ocr_inference_spark.operators.dedup import exact_dedup

    docs = exact_dedup(
        _t(spark, sf, "documents").select("doc_id", "text"),
        "text",
        "doc_id",
    )
    occ = positional_ngrams(docs, "text", "doc_id", 6).select(
        "id", "gram"
    )
    dp = _gram_share_pairs(occ)
    # symmetrize via explode, not a two-branch union (r12 perf pass):
    # the union evaluated the gram-share pair generation twice even
    # inside pagerank's one-time edge checkpoint pass
    edges = dp.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("ia").alias("src"), F.col("ib").alias("dst")
                ),
                F.struct(
                    F.col("ib").alias("src"), F.col("ia").alias("dst")
                ),
            )
        ).alias("_e")
    ).select("_e.src", "_e.dst")
    return pagerank(edges, iterations=3, damping=0.85)


def _gram_share_pairs(occ: DataFrame) -> DataFrame:
    """Distinct cross-doc pairs (ia < ib) sharing a gram: ONE gram
    shuffle — per-gram sorted distinct-id lists, pairs via chained
    explodes (the r8 dedup bucket shape) — replacing the r1-r7
    dup-filter + two-sided self-join, which shuffled the occurrence
    table three times for the same pair set."""
    buckets = (
        occ.groupBy("gram")
        .agg(
            F.sort_array(F.array_distinct(F.collect_list("id"))).alias(
                "_ids"
            )
        )
        .filter(F.size("_ids") >= 2)
    )
    with_a = buckets.select(
        "_ids", F.posexplode("_ids").alias("_i", "ia")
    )
    return (
        with_a.select(
            "ia",
            F.explode(
                F.slice("_ids", F.col("_i") + 2, F.size("_ids"))
            ).alias("ib"),
        )
        .distinct()
    )


@register(
    "op90_recursive_cte",
    _CC_ORACLE,
    doc="recursive CTE (Spark 4 WITH RECURSIVE): exact-duplicate "
    "cluster reachability expressed as pure SQL recursion — the "
    "declarative twin of dedup_clusters' iterative DataFrame "
    "propagation, and the THIRD engine-checked expression of the "
    "same semantics (DataFrame loop, DuckDB recursive oracle, now "
    "Spark recursion). Spark supports UNION ALL recursion only, so "
    "the depth is bounded by a level counter sized to the component "
    "diameter (exact-dup components are cliques: diameter 1, bound "
    "2 with margin) — UNION-fixpoint semantics need the operator or "
    "a dedup step per level. At 100 TB the recursion iterates the "
    "pair graph like the operator does, with the engine managing "
    "the loop.",
)
def op90_recursive_cte(spark: SparkSession, sf: str) -> DataFrame:
    docs = _t(spark, sf, "documents").select("doc_id", "text")
    safe = sf.strip("/").replace("/", "_").replace(".", "_")
    view = f"docs_rcte_{safe}"
    docs.createOrReplaceTempView(view)
    norm = (
        "trim(regexp_replace(regexp_replace(lower(text), "
        "'[^a-z0-9\\\\s]', ''), '\\\\s+', ' '))"
    )
    return spark.sql(f"""
      WITH RECURSIVE reach(doc_id, root, lvl) AS (
        SELECT doc_id, doc_id AS root, 0 AS lvl FROM {view}
        UNION ALL
        SELECT p.id_a AS doc_id, r.root, r.lvl + 1 FROM (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b FROM
            (SELECT doc_id, md5({norm}) AS fp FROM {view}) a
          JOIN
            (SELECT doc_id, md5({norm}) AS fp FROM {view}) b
          ON a.fp = b.fp AND a.doc_id <> b.doc_id
        ) p JOIN reach r ON p.id_b = r.doc_id
        WHERE r.lvl < 2
      )
      SELECT doc_id, MIN(root) AS cluster_id FROM reach GROUP BY doc_id
    """)


@register(
    "graph_triangles",
    "WITH " + _PR_GRAPH + " "
    "SELECT "
    "(SELECT COUNT(*) FROM dp e1 "
    " JOIN dp e2 ON e2.ia = e1.ib "
    " JOIN dp e3 ON e3.ia = e1.ia AND e3.ib = e2.ib) AS n_triangles, "
    "(SELECT COUNT(*) FROM dp) AS n_edges, "
    "(SELECT COUNT(DISTINCT x) FROM "
    " (SELECT ia AS x FROM dp UNION SELECT ib FROM dp)) AS n_nodes",
    doc="exact triangle census of the span-share graph via DEGREE "
    "ORIENTATION (Chiba-Nishizeki): edges orient from the lower-"
    "(degree, id) endpoint, bounding the wedge self-join at "
    "O(m^1.5) total work even under power-law hubs — the naive "
    "edge^3 join the ORACLE runs explodes quadratically on a hub's "
    "D^2 wedges. Same exact-dup clique collapse before pair "
    "derivation as PageRank. Triangle density is the curation "
    "signal: tightly inter-quoting doc clusters are template "
    "families (operators/graph.py).",
)
def graph_triangles(spark: SparkSession, sf: str) -> DataFrame:
    from pdf_etl_ocr_inference_spark.operators.dedup import exact_dedup
    from pdf_etl_ocr_inference_spark.operators.graph import (
        triangle_count,
    )
    from pdf_etl_ocr_inference_spark.operators.span_dedup import (
        positional_ngrams,
    )

    docs = exact_dedup(
        _t(spark, sf, "documents").select("doc_id", "text"),
        "text",
        "doc_id",
    )
    occ = positional_ngrams(docs, "text", "doc_id", 6).select(
        "id", "gram"
    )
    return triangle_count(_gram_share_pairs(occ))


@register(
    "op70d_skipping_rewrite",
    "SELECT o_orderpriority, COUNT(*) AS n, "
    "ROUND(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) / 100.0, 2) AS total "
    "FROM orders WHERE o_custkey BETWEEN 100 AND 299 "
    "AND o_orderdate >= TIMESTAMP '1996-01-01' "
    "AND o_orderdate < TIMESTAMP '1997-01-01' "
    "GROUP BY o_orderpriority",
    doc="OPTIMIZER-integrated data skipping (optimizer rule #5, "
    "rewrite_skipping_scan): the user writes the plain brute "
    "scan.filter(box) — no helper call — and because a clustered "
    "layout is REGISTERED for the table "
    "(layout.register_clustered_layout: Z-ordered copy + footer-stats "
    "sidecar + source-inventory fingerprint), optimize() rewrites the "
    "scan onto the clustered copy with file-level pruning, re-applies "
    "the exact original predicate row-wise, and restores the original "
    "projection. The entry ASSERTS the rule fired and a stale-guard "
    "property backs it (tests/test_skipping_rewrite.py: inventory "
    "drift → brute-scan fall-through, never a stale answer; "
    "append-only refresh re-syncs at cost ∝ new files). Oracle = the "
    "same predicate+agg on the pristine table, proving the rewrite "
    "is semantically invisible. At 100 TB this is op70b's ~1%-of-"
    "files scan behind the same zero-query-change entry point as the "
    "similarity/BM25/matview rules.",
)
def op70d_skipping_rewrite(spark: SparkSession, sf: str) -> DataFrame:
    import os

    from pdf_etl_ocr_inference_spark.operators.layout import (
        layout_key,
        register_clustered_layout,
    )
    from pdf_etl_ocr_inference_spark.optimizer import (
        IndexCatalog,
        optimize,
    )

    src = os.path.join(sf, "orders.parquet")
    cat = IndexCatalog()
    if cat.lookup(layout_key(src)) is None:
        register_clustered_layout(
            spark,
            src,
            [
                {"col": "o_custkey", "kind": "int"},
                {"col": "o_orderdate", "kind": "days",
                 "origin": "1995-01-01"},
            ],
        )
    brute = spark.read.parquet(src).filter(
        F.col("o_custkey").between(100, 299)
        & (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    # min_saved_bytes=0 pins the cost gate OFF for this demo entry so
    # the rewrite fires (and its plan shape stays identical) at every
    # test SF; the DEFAULT policy declines on tables this small —
    # saved bytes can't pay the fixed rewrite overhead (r5 cost gate).
    routed = optimize(brute, min_saved_bytes=0)
    assert routed is not brute, "skipping rewrite did not fire"
    return routed.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        F.round(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
            / 100.0,
            2,
        ).alias("total"),
    )


@register(
    "op70e_bloom_rewrite",
    "SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 2) AS total "
    "FROM orders WHERE o_orderkey IN "
    "(SELECT o_orderkey FROM orders ORDER BY o_orderkey LIMIT 5)",
    doc="IN-list point lookups through the SAME optimizer rule as "
    "op70d: the registered layout also carries a per-file Bloom "
    "sidecar (bloom_cols), and a plain scan.filter(isin(...)) on "
    "that column — which min/max range stats provably cannot serve, "
    "since the layout clusters by customer/date — is routed onto the "
    "Bloom-pruned point-lookup scan (op70c's mechanism) with the "
    "exact IN predicate re-applied row-wise. The entry ASSERTS the "
    "rule fired; probe ids are the 5 lowest orderkeys (bounded "
    "driver-side control data, SF-independent). Same stale-inventory "
    "guard as the range path; an append-only refresh safely lags the "
    "bloom (uncovered files are kept conservatively).",
)
def op70e_bloom_rewrite(spark: SparkSession, sf: str) -> DataFrame:
    import os

    from pdf_etl_ocr_inference_spark.operators.layout import (
        layout_key,
        register_clustered_layout,
    )
    from pdf_etl_ocr_inference_spark.optimizer import (
        IndexCatalog,
        optimize,
    )

    src = os.path.join(sf, "orders.parquet")
    cat = IndexCatalog()
    meta = cat.lookup(layout_key(src))
    if meta is None or not meta.get("bloom_cols"):
        register_clustered_layout(
            spark,
            src,
            [
                {"col": "o_custkey", "kind": "int"},
                {"col": "o_orderdate", "kind": "days",
                 "origin": "1995-01-01"},
            ],
            bloom_cols=["o_orderkey"],
        )
    orders = spark.read.parquet(src)
    probe = [
        r["o_orderkey"]
        for r in orders.select("o_orderkey")
        .orderBy("o_orderkey")
        .limit(5)
        .collect()
    ]
    brute = orders.filter(F.col("o_orderkey").isin(probe))
    # demo entry: cost gate pinned off, same rationale as op70d
    routed = optimize(brute, min_saved_bytes=0)
    assert routed is not brute, "bloom rewrite did not fire"
    return routed.select(
        "o_orderkey",
        "o_custkey",
        F.round("o_totalprice", 2).alias("total"),
    )


@register(
    "op70f_partitioned_layout",
    "SELECT o_orderpriority, COUNT(*) AS n, "
    "ROUND(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) / 100.0, 2) "
    "AS total "
    "FROM orders WHERE o_custkey BETWEEN 200 AND 499 "
    "AND o_orderdate >= TIMESTAMP '1996-07-01' "
    "AND o_orderdate < TIMESTAMP '1997-07-01' "
    "GROUP BY o_orderpriority",
    doc="MULTI-LEVEL clustered layout through the same optimizer "
    "rule as op70d: the registered copy adds a coarse hive "
    "partition level (90-day buckets of o_orderdate, "
    "partition_spec) above the fine Z-order, so the rewrite prunes "
    "at TWO granularities — whole zpart=<bucket> DIRECTORIES by a "
    "pure path-string filter first (exact: every row in a dir has "
    "that bucket, bucket is monotone in the column), then files "
    "within surviving dirs by the min/max sidecar.  At 100 TB the "
    "dir level is what bounds per-query CONTROL data: stats rows "
    "are ∝ files, but a date-bounded dashboard query touches only "
    "its buckets' stats.  The source is copied to scratch so "
    "op70d/op70e's flat registration of the pristine table is not "
    "clobbered; the oracle replays the same predicate+agg on the "
    "pristine table, proving the partitioned rewrite semantically "
    "invisible.",
)
def op70f_partitioned_layout(spark: SparkSession, sf: str) -> DataFrame:
    import os

    from pdf_etl_ocr_inference_spark.operators.layout import (
        layout_key,
        register_clustered_layout,
    )
    from pdf_etl_ocr_inference_spark.optimizer import (
        IndexCatalog,
        optimize,
    )
    from pdf_etl_ocr_inference_spark.scratch import scratch_dir

    from pdf_etl_ocr_inference_spark.operators.layout import (
        layout_fresh,
    )

    safe = sf.strip("/").replace("/", "_").replace(".", "_")
    # wipe=False: the default wipe would delete and re-copy the source
    # on every call, drifting its mtimes away from the registered
    # inventory so the rewrite (correctly) declines — bench runs each
    # entry three passes and hit exactly that on pass 2
    src = f"{scratch_dir(f'partsrc_{safe}', wipe=False)}/orders"
    if not os.path.isdir(src):
        (
            spark.read.parquet(os.path.join(sf, "orders.parquet"))
            .repartition(4)
            .write.mode("overwrite")
            .parquet(src)
        )
    cat = IndexCatalog()
    meta = cat.lookup(layout_key(src))
    if (
        meta is None
        or not meta.get("partition_spec")
        or not layout_fresh(src, meta)
    ):
        register_clustered_layout(
            spark,
            src,
            [
                {"col": "o_custkey", "kind": "int"},
                {"col": "o_orderdate", "kind": "days",
                 "origin": "1995-01-01"},
            ],
            partition_spec={
                "col": "o_orderdate", "kind": "days",
                "origin": "1995-01-01", "width": 90,
            },
        )
    brute = spark.read.parquet(src).filter(
        F.col("o_custkey").between(200, 499)
        & (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    # demo entry: cost gate pinned off, same rationale as op70d
    routed = optimize(brute, min_saved_bytes=0)
    assert routed is not brute, "partitioned rewrite did not fire"
    return routed.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        F.round(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
            / 100.0,
            2,
        ).alias("total"),
    )


@register(
    "op70g_multiaxis_partitioned_layout",
    "SELECT o_orderpriority, COUNT(*) AS n, "
    "ROUND(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) / 100.0, 2) "
    "AS total "
    "FROM orders WHERE o_custkey BETWEEN 100 AND 399 "
    "AND o_orderdate >= TIMESTAMP '1996-07-01' "
    "AND o_orderdate < TIMESTAMP '1997-01-01' "
    "GROUP BY o_orderpriority",
    doc="MULTI-AXIS partitioned layout (verdict-r5 #6): TWO nested "
    "hive levels — 180-day o_orderdate buckets over o_custkey "
    "buckets (zpart=…/zpart1=…) — above the fine Z-order, through "
    "the same optimizer rule as op70f.  A query bounding BOTH axes "
    "prunes whole directories twice by pure path-string filters "
    "before any sidecar row is consulted: at 100 TB, per-query "
    "control data is bounded by the CROSS-SECTION of the touched "
    "buckets, not either axis alone.  The spec itself is what "
    "suggest_clustered_layout proposes for a two-axis workload "
    "(tested in test_skipping_rewrite).  Oracle replays the same "
    "predicate+agg on the pristine table — the nested rewrite is "
    "semantically invisible.",
)
def op70g_multiaxis_partitioned_layout(
    spark: SparkSession, sf: str
) -> DataFrame:
    import os

    from pdf_etl_ocr_inference_spark.operators.layout import (
        layout_fresh,
        layout_key,
        register_clustered_layout,
    )
    from pdf_etl_ocr_inference_spark.optimizer import (
        IndexCatalog,
        optimize,
    )
    from pdf_etl_ocr_inference_spark.scratch import scratch_dir

    safe = sf.strip("/").replace("/", "_").replace(".", "_")
    # wipe=False + idempotent copy: see op70f (bench repeat passes)
    src = f"{scratch_dir(f'partsrc2_{safe}', wipe=False)}/orders"
    if not os.path.isdir(src):
        (
            spark.read.parquet(os.path.join(sf, "orders.parquet"))
            .repartition(4)
            .write.mode("overwrite")
            .parquet(src)
        )
    two_level = [
        {"col": "o_orderdate", "kind": "days",
         "origin": "1995-01-01", "width": 180},
        {"col": "o_custkey", "kind": "int", "width": 500},
    ]
    cat = IndexCatalog()
    meta = cat.lookup(layout_key(src))
    if (
        meta is None
        or meta.get("partition_spec") != two_level
        or not layout_fresh(src, meta)
    ):
        register_clustered_layout(
            spark,
            src,
            [
                {"col": "o_custkey", "kind": "int"},
                {"col": "o_orderdate", "kind": "days",
                 "origin": "1995-01-01"},
            ],
            partition_spec=two_level,
        )
    brute = spark.read.parquet(src).filter(
        F.col("o_custkey").between(100, 399)
        & (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    # demo entry: cost gate pinned off, same rationale as op70d
    routed = optimize(brute, min_saved_bytes=0)
    assert routed is not brute, "multi-axis partitioned rewrite did not fire"
    return routed.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        F.round(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
            / 100.0,
            2,
        ).alias("total"),
    )


def _kcore_oracle_sql(k: int = 2, rounds: int = 8) -> str:
    """Chained-CTE peel: a0 = all nodes, a{i} = nodes with >= k
    neighbors inside a{i-1}.  The k-core fixpoint is unique and the
    peel is idempotent once converged, so running a FIXED number of
    rounds >= the peel depth replays the Spark loop (which detects
    convergence and raises past its cap) value-for-value.

    Every peel CTE is ``AS MATERIALIZED``: each round references the
    previous one TWICE (both endpoints), so DuckDB's default inlining
    re-evaluates the whole upstream gram pipeline 2^rounds times —
    measured as a 19-minute hang at 8 rounds vs 0.2 s materialized."""
    parts = ["a0 AS MATERIALIZED (SELECT DISTINCT s FROM em)"]
    for i in range(1, rounds + 1):
        parts.append(
            f"a{i} AS MATERIALIZED (SELECT e.s FROM em e "
            f"JOIN a{i - 1} x ON e.s = x.s "
            f"JOIN a{i - 1} y ON e.t = y.s "
            f"GROUP BY e.s HAVING COUNT(*) >= {k})"
        )
    return (
        "WITH "
        + _PR_GRAPH
        + ", em AS MATERIALIZED (SELECT s, t FROM edges), "
        + ", ".join(parts)
        + f" SELECT e.s AS doc_id, COUNT(*) AS core_degree "
        f"FROM em e JOIN a{rounds} x ON e.s = x.s "
        f"JOIN a{rounds} y ON e.t = y.s GROUP BY e.s"
    )


@register(
    "graph_kcore",
    _kcore_oracle_sql(k=2, rounds=8),
    doc="k-core decomposition (Seidman 1983, k=2) of the span-share "
    "graph: iteratively peel docs with fewer than k within-core "
    "neighbors until fixpoint — the dense knot that survives is the "
    "heavily-templated/boilerplate cluster worth auditing as a "
    "GROUP (pagerank flags individual hubs; the core flags the "
    "mutually-reinforcing set). Same collapsed-clique edge build as "
    "graph_pagerank; each peel round is one semi-join + one "
    "combinable degree count over the (shrinking) edge list, the "
    "corpus never enters the loop, and non-convergence raises "
    "rather than returning a non-core. Oracle: fixed 8-round "
    "chained-CTE peel (idempotent past the fixpoint, depth 2 on "
    "this corpus).",
)
def graph_kcore(spark: SparkSession, sf: str) -> DataFrame:
    from pdf_etl_ocr_inference_spark.operators.dedup import exact_dedup
    from pdf_etl_ocr_inference_spark.operators.graph import k_core
    from pdf_etl_ocr_inference_spark.operators.span_dedup import (
        positional_ngrams,
    )

    docs = exact_dedup(
        _t(spark, sf, "documents").select("doc_id", "text"),
        "text",
        "doc_id",
    )
    occ = positional_ngrams(docs, "text", "doc_id", 6).select("id", "gram")
    dp = _gram_share_pairs(occ)
    edges = dp.select(
        F.col("ia").alias("s"), F.col("ib").alias("t")
    ).unionByName(
        dp.select(F.col("ib").alias("s"), F.col("ia").alias("t"))
    )
    return k_core(edges, k=2, max_rounds=8).select(
        F.col("s").alias("doc_id"), "core_degree"
    )
