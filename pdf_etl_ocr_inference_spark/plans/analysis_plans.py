"""Second-wave analysis catalog: batch similarity serving, BPE-ish
tokenization, rolling-hash fingerprints, ranking-window and arg-min/max
aggregate surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pdf_etl_ocr_inference_spark.functions.vector import cosine_similarity
from pdf_etl_ocr_inference_spark.plans.registry import register
from pdf_etl_ocr_inference_spark.sources.catalog import load_table as _t


@register(
    "op44b_topk_batch",
    "SELECT qid, vec_id, score FROM ("
    "  SELECT q.vec_id AS qid, e.vec_id AS vec_id, "
    "  ROUND(LIST_COSINE_SIMILARITY(e.embedding::DOUBLE[], q.embedding::DOUBLE[]), 4) AS score, "
    "  ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY "
    "    LIST_COSINE_SIMILARITY(e.embedding::DOUBLE[], q.embedding::DOUBLE[]) DESC, e.vec_id) "
    "    AS rn "
    "  FROM (SELECT * FROM embeddings WHERE vec_id < 10) q "
    "  JOIN embeddings e ON e.vec_id >= 10) "
    "WHERE rn <= 5",
    doc="batch top-k similarity serving: 10 query vectors against the "
    "corpus in ONE pass — broadcast the query batch, score every "
    "(query, corpus) pair, per-query window top-5. The corpus scans "
    "once regardless of batch size (vs once per query).",
)
def op44b_topk_batch(spark: SparkSession, sf: str) -> DataFrame:
    emb = _t(spark, sf, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("q_emb")
    )
    corpus = emb.filter(F.col("vec_id") >= 10)
    scored = corpus.crossJoin(F.broadcast(queries)).select(
        "qid",
        "vec_id",
        cosine_similarity("embedding", "q_emb").alias("_raw"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("_raw"), "vec_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("qid", "vec_id", F.round("_raw", 4).alias("score"))
    )


@register(
    "text_token_count_bpe",
    "SELECT doc_id, LEN(REGEXP_EXTRACT_ALL(text, "
    "'[A-Za-z0-9]+|[^A-Za-z0-9\\s]')) AS n_tokens FROM documents",
    doc="BPE-ish regex tokenization (word pieces + standalone "
    "punctuation — the pre-tokenizer split BPE vocabularies assume) "
    "vs text_token_count's whitespace split.",
)
def text_token_count_bpe(spark: SparkSession, sf: str) -> DataFrame:
    return _t(spark, sf, "documents").select(
        "doc_id",
        F.size(
            F.regexp_extract_all(
                "text", F.lit(r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"), F.lit(0)
            )
        ).alias("n_tokens"),
    )


@register(
    "text_rolling_hash",
    "SELECT doc_id, LIST_REDUCE(LIST_PREPEND(CAST(0 AS BIGINT), "
    "LIST_TRANSFORM(STRING_SPLIT_REGEX(TRIM(text), '\\s+'), "
    "t -> CAST(LENGTH(t) AS BIGINT))), "
    "(a, b) -> (a * 31 + b) % 1000000007) AS rhash FROM documents",
    doc="order-sensitive rolling (polynomial) fingerprint over the "
    "token stream — unlike the md5 canonical fingerprint, token "
    "REORDERING changes it. Modulus keeps the fold in cross-engine "
    "exact integer range.",
)
def text_rolling_hash(spark: SparkSession, sf: str) -> DataFrame:
    toks = F.split(F.trim(F.col("text")), r"\s+")
    rolled = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: (acc * 31 + F.length(t).cast("long")) % 1000000007,
    )
    return _t(spark, sf, "documents").select(
        "doc_id", rolled.alias("rhash")
    )


@register(
    "op34c_window_ranks",
    "SELECT c_custkey, "
    "NTILE(4) OVER w AS quartile, "
    "ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank, "
    "ROUND(CUME_DIST() OVER w, 6) AS cume "
    "FROM customer WINDOW w AS (ORDER BY c_acctbal, c_custkey)",
    doc="ranking-window surface beyond row_number: ntile / "
    "percent_rank / cume_dist over a global tie-free order. Scale "
    "note: an UNPARTITIONED window is a deliberate single-task "
    "bottleneck — acceptable for bounded sets (this one ranks "
    "customers); at 100 TB rank within partitions, or derive global "
    "percentiles from approx_percentile instead.",
)
def op34c_window_ranks(spark: SparkSession, sf: str) -> DataFrame:
    w = Window.orderBy("c_acctbal", "c_custkey")
    return _t(spark, sf, "customer").select(
        "c_custkey",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


@register(
    "op34d_scalable_ranks",
    # SAME oracle as op34c — the scalable formulation must be
    # value-identical to the single-task window
    "SELECT c_custkey, "
    "NTILE(4) OVER w AS quartile, "
    "ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank, "
    "ROUND(CUME_DIST() OVER w, 6) AS cume "
    "FROM customer WINDOW w AS (ORDER BY c_acctbal, c_custkey)",
    doc="op34c's runnable scale substitute: global ntile/percent_rank/"
    "cume_dist WITHOUT a single-task window — quantile-bucket the sort "
    "key (approxQuantile, one pass), rank within buckets in parallel, "
    "add broadcast per-bucket offsets, derive the metrics "
    "arithmetically. Oracle-identical to op34c; plan-tested to run "
    ">1 task.",
)
def op34d_scalable_ranks(spark: SparkSession, sf: str) -> DataFrame:
    from pdf_etl_ocr_inference_spark.operators.ranking import (
        global_rank_metrics,
    )

    out = global_rank_metrics(
        _t(spark, sf, "customer"),
        order_cols=["c_acctbal", "c_custkey"],
        ntiles=4,
        num_buckets=32,
    )
    return out.select("c_custkey", "quartile", "pct_rank", "cume")


@register(
    "op65_udtf",
    "SELECT doc_id, pos, tok FROM ("
    "  SELECT doc_id, UNNEST(GENERATE_SERIES(1, LEAST(5, LEN(w)))) AS i, w "
    "  FROM (SELECT doc_id, STRING_SPLIT_REGEX(TRIM(text), '\\s+') AS w "
    "        FROM documents)) t(doc_id, i, w), "
    "LATERAL (SELECT i - 1 AS pos, w[i] AS tok)",
    doc="Python UDTF (table function) surface: lead-token extractor "
    "emitting (pos, tok) rows per document via LATERAL join — the "
    "generalization of explode to arbitrary Python row generators "
    "(the reference's only TVF is explode, SURVEY §2.4 note).",
)
def op65_udtf(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos: int, tok: string")
    class LeadTokens:
        def eval(self, text: str):
            toks = [t for t in (text or "").split() if t]
            for i, t in enumerate(toks[:5]):
                yield i, t

    spark.udtf.register("lead_tokens", LeadTokens)
    _t(spark, sf, "documents").createOrReplaceTempView("_docs_udtf")
    return spark.sql(
        "SELECT doc_id, pos, tok FROM _docs_udtf, "
        "LATERAL lead_tokens(text)"
    )


@register(
    "op63_summary_stats",
    "SELECT 'l_quantity' AS col, COUNT(*) AS n, "
    "ROUND(AVG(l_quantity), 4) AS mean, "
    "ROUND(STDDEV_SAMP(l_quantity), 4) AS std, "
    "MIN(l_quantity) AS min_v, MAX(l_quantity) AS max_v FROM lineitem "
    "UNION ALL "
    "SELECT 'l_discount', COUNT(*), ROUND(AVG(l_discount), 4), "
    "ROUND(STDDEV_SAMP(l_discount), 4), MIN(l_discount), MAX(l_discount) "
    "FROM lineitem",
    doc="describe()-style column statistics as one pass over the scan "
    "(all stats partial-aggregate map-side; no per-column rescans).",
)
def op63_summary_stats(spark: SparkSession, sf: str) -> DataFrame:
    li = _t(spark, sf, "lineitem")
    stats = li.agg(
        *[
            agg
            for c in ("l_quantity", "l_discount")
            for agg in (
                F.count(c).alias(f"n_{c}"),
                F.round(F.avg(c), 4).alias(f"mean_{c}"),
                F.round(F.stddev_samp(c), 4).alias(f"std_{c}"),
                F.min(c).alias(f"min_{c}"),
                F.max(c).alias(f"max_{c}"),
            )
        ]
    )
    # explode, not union: a union of per-column selects re-computes
    # the aggregate subtree per branch (2 scans); exploding the 1-row
    # aggregate keeps the doc's one-pass claim true in the PLAN too
    return stats.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("col"),
                        F.col(f"n_{c}").alias("n"),
                        F.col(f"mean_{c}").alias("mean"),
                        F.col(f"std_{c}").alias("std"),
                        F.col(f"min_{c}").alias("min_v"),
                        F.col(f"max_{c}").alias("max_v"),
                    )
                    for c in ("l_quantity", "l_discount")
                ]
            )
        ).alias("_s")
    ).select("_s.*")


@register(
    "op92b_udtf_table_arg",
    "SELECT user_id, COUNT(*) AS n_events, "
    "MIN(first_type) AS first_type, MIN(last_type) AS last_type, "
    "COALESCE(MAX(gap_us), 0) AS max_gap_us FROM ("
    "  SELECT user_id, "
    "  FIRST_VALUE(event_type) OVER w AS first_type, "
    "  LAST_VALUE(event_type) OVER w AS last_type, "
    "  EPOCH_US(ts - LAG(ts) OVER (PARTITION BY user_id "
    "    ORDER BY ts, event_id)) AS gap_us FROM events "
    "  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id "
    "    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)) "
    "GROUP BY user_id",
    doc="Python UDTF with a TABLE argument (Spark 4 table-valued "
    "function over a relation): the per-user event profile streams "
    "through `profile(TABLE(events) PARTITION BY user_id ORDER BY "
    "ts, event_id)` — the engine shuffles by the partition key, "
    "ORDERS rows within each partition, and feeds them to one UDTF "
    "instance per key (eval per row, terminate emits the summary). "
    "This is the per-key ordered-iteration surface applyInPandas "
    "cannot give without materializing the whole group as one pandas "
    "frame — the UDTF sees rows one at a time, O(1) state here. "
    "Oracle replays first/last/ max-gap with window functions. "
    "The gap is emitted as exact integer MICROSECONDS (timedelta "
    "arithmetic, no float, no rounding): a hash-gated column must "
    "never be a rounded double — Python round() is half-even on "
    "binary floats while SQL ROUND is half-away, and one ulp flips "
    "the driver's full-precision hash (round-4 lesson).",
)
def op92b_udtf_table_arg(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(
        returnType="user_id bigint, n_events bigint, first_type string, "
        "last_type string, max_gap_us bigint"
    )
    class UserProfile:
        def __init__(self):
            self.user = None
            self.n = 0
            self.first = None
            self.last = None
            self.prev_ts = None
            self.max_gap_us = 0

        def eval(self, row):
            self.user = row["user_id"]
            self.n += 1
            if self.first is None:
                self.first = row["event_type"]
            self.last = row["event_type"]
            ts = row["ts"]
            if self.prev_ts is not None:
                td = ts - self.prev_ts
                gap_us = (
                    td.days * 86_400_000_000
                    + td.seconds * 1_000_000
                    + td.microseconds
                )
                self.max_gap_us = max(self.max_gap_us, gap_us)
            self.prev_ts = ts

        def terminate(self):
            if self.user is not None:
                yield (
                    self.user,
                    self.n,
                    self.first,
                    self.last,
                    self.max_gap_us,
                )

    spark.udtf.register("user_profile_tvf", UserProfile)
    safe = sf.strip("/").replace("/", "_").replace(".", "_")
    view = f"events_tvf_{safe}"
    _t(spark, sf, "events").createOrReplaceTempView(view)
    return spark.sql(
        f"SELECT * FROM user_profile_tvf(TABLE({view}) "
        "PARTITION BY user_id ORDER BY (ts, event_id))"
    )


@register(
    "op63b_correlation",
    "SELECT pair, ROUND(r, 4) AS r, ROUND(cov_s, 4) AS cov_s, n FROM ("
    "  SELECT 'quantity_extendedprice' AS pair, "
    "  CORR(l_quantity, l_extendedprice) AS r, "
    "  COVAR_SAMP(l_quantity, l_extendedprice) AS cov_s, "
    "  COUNT(*) AS n FROM lineitem "
    "  UNION ALL SELECT 'quantity_discount', "
    "  CORR(l_quantity, l_discount), COVAR_SAMP(l_quantity, l_discount), "
    "  COUNT(*) FROM lineitem "
    "  UNION ALL SELECT 'extendedprice_discount', "
    "  CORR(l_extendedprice, l_discount), "
    "  COVAR_SAMP(l_extendedprice, l_discount), COUNT(*) FROM lineitem)",
    doc="pairwise correlation profile (Pearson r + sample covariance "
    "for every column pair) in ONE scan: all three pairs' moments are "
    "partial-aggregatable, so the profile costs one map-side-combined "
    "pass regardless of how many pairs are requested — the "
    "feature-selection / drift-detection preflight over a numeric "
    "table. At 100 TB the alternative (one scan per pair, or a "
    "driver-side pandas corr) is respectively O(p²) scans and a "
    "non-starter.",
)
def op63b_correlation(spark: SparkSession, sf: str) -> DataFrame:
    li = _t(spark, sf, "lineitem")
    pairs = [
        ("quantity_extendedprice", "l_quantity", "l_extendedprice"),
        ("quantity_discount", "l_quantity", "l_discount"),
        ("extendedprice_discount", "l_extendedprice", "l_discount"),
    ]
    stats = li.agg(
        *[
            agg
            for name, a, b in pairs
            for agg in (
                F.corr(a, b).alias(f"r_{name}"),
                F.covar_samp(a, b).alias(f"c_{name}"),
            )
        ],
        F.count("*").alias("n"),
    )
    # explode the 1-row aggregate into one row per pair INSTEAD of a
    # union of three selects: a union re-computes the whole aggregate
    # subtree per branch (Catalyst does not CSE across Union children
    # — 3 scans), while the explode keeps ONE scan + ONE aggregate
    # (asserted in tests/test_plans_physical.py)
    return stats.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("pair"),
                        F.round(F.col(f"r_{name}"), 4).alias("r"),
                        F.round(F.col(f"c_{name}"), 4).alias("cov_s"),
                        F.col("n").alias("n"),
                    )
                    for name, _, _ in pairs
                ]
            )
        ).alias("_p")
    ).select("_p.*")


@register(
    "op63c_entropy_profile",
    "SELECT 'lang' AS col, COUNT(DISTINCT lang) AS n_distinct, "
    "ROUND(ENTROPY(lang), 4) AS h_bits FROM documents "
    "UNION ALL SELECT 'source', COUNT(DISTINCT source), "
    "ROUND(ENTROPY(source), 4) FROM documents",
    doc="Shannon-entropy column profile (bits): the categorical-skew "
    "diagnostic for prospective partition/join keys — near-zero "
    "entropy flags a column whose hash partitions will collapse onto "
    "few reducers no matter the partition count (complements "
    "op73_skew_stats' per-key counts with a single scale-free "
    "number). Two-phase: per-value counts (map-side combinable), "
    "then -Σ p·log2 p over the value histogram — the second phase "
    "aggregates value-cardinality-sized data, not the corpus.",
)
def op63c_entropy_profile(spark: SparkSession, sf: str) -> DataFrame:
    docs = _t(spark, sf, "documents")
    # one scan for ALL profiled columns: explode to (col, val) pairs,
    # one combinable (col, val) count shuffle, then a value-histogram-
    # sized per-col aggregate — vs one scan+shuffle per column
    pairs = docs.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("lang").alias("col"), F.col("lang").alias("val")
                ),
                F.struct(
                    F.lit("source").alias("col"),
                    F.col("source").alias("val"),
                ),
            )
        ).alias("_p")
    ).select("_p.*")
    counts = pairs.groupBy("col", "val").count()
    return counts.groupBy("col").agg(
        F.count("*").alias("n_distinct"),
        F.round(
            F.log2(F.sum("count"))
            - F.sum(F.col("count") * F.log2("count")) / F.sum("count"),
            4,
        ).alias("h_bits"),
    )


def _op64_oracle() -> str:
    from pdf_etl_ocr_inference_spark.functions.splits import hash_split_sql

    return (
        "SELECT split, lang, COUNT(*) AS n FROM ("
        f"  SELECT lang, {hash_split_sql('doc_id')} AS split "
        "FROM documents) GROUP BY split, lang"
    )


@register(
    "op64_train_test_split",
    _op64_oracle,
    doc="deterministic hash-based train/eval split (md5 of the stable "
    "id, bucket mod 10; THE rule lives in functions/splits.py, shared "
    "with its auditor train_split_leakage) — reproducible across "
    "engines, runs, and cluster sizes, unlike sample()'s "
    "partition-dependent RNG. The pattern for stable dataset splits "
    "at any scale.",
)
def op64_train_test_split(spark: SparkSession, sf: str) -> DataFrame:
    from pdf_etl_ocr_inference_spark.functions.splits import hash_split

    docs = _t(spark, sf, "documents")
    return (
        docs.withColumn("split", hash_split("doc_id"))
        .groupBy("split", "lang")
        .agg(F.count("*").alias("n"))
    )


@register(
    "op66_quality_checks",
    "SELECT 'null_text' AS check_name, "
    "COUNT(*) FILTER (text IS NULL) AS violations FROM documents "
    "UNION ALL SELECT 'empty_text', COUNT(*) FILTER (LENGTH(TRIM(text)) = 0) "
    "FROM documents "
    "UNION ALL SELECT 'bad_n_chars', COUNT(*) FILTER (n_chars <> LENGTH(text)) "
    "FROM documents "
    "UNION ALL SELECT 'dup_doc_id', COUNT(*) - COUNT(DISTINCT doc_id) "
    "FROM documents",
    doc="dataset validation pass: null/empty/consistency/uniqueness "
    "checks as ONE scan with conditional aggregates (not one scan per "
    "rule) — the pre-training-data quality gate.",
)
def op66_quality_checks(spark: SparkSession, sf: str) -> DataFrame:
    docs = _t(spark, sf, "documents")
    agg = docs.agg(
        F.count(F.when(F.col("text").isNull(), 1)).alias("null_text"),
        F.count(F.when(F.length(F.trim("text")) == 0, 1)).alias("empty_text"),
        F.count(
            F.when(F.col("n_chars") != F.length("text"), 1)
        ).alias("bad_n_chars"),
        (F.count("doc_id") - F.countDistinct("doc_id")).alias("dup_doc_id"),
    )
    checks = ["null_text", "empty_text", "bad_n_chars", "dup_doc_id"]
    out = None
    for c in checks:
        row = agg.select(
            F.lit(c).alias("check_name"), F.col(c).alias("violations")
        )
        out = row if out is None else out.unionByName(row)
    return out


@register(
    "op67_histogram",
    # DuckDB 1.0 has no width_bucket — the oracle spells out the
    # same edge semantics (below range → 0, at-or-above max → 13)
    "SELECT CASE WHEN o_totalprice < 0 THEN 0 "
    "WHEN o_totalprice >= 600000 THEN 13 "
    "ELSE CAST(FLOOR(o_totalprice / 50000) AS BIGINT) + 1 END AS bucket, "
    "COUNT(*) AS n FROM orders GROUP BY bucket",
    doc="equi-width histogram via width_bucket — single-pass "
    "distribution profiling for numeric columns.",
)
def op67_histogram(spark: SparkSession, sf: str) -> DataFrame:
    return (
        _t(spark, sf, "orders")
        .groupBy(
            F.width_bucket("o_totalprice", F.lit(0), F.lit(600000), F.lit(12))
            .alias("bucket")
        )
        .agg(F.count("*").alias("n"))
    )


@register(
    "op30e_argminmax",
    # DuckDB arg_max can't take a composite ordering key, so the
    # tie-free oracle is expressed with rank-1 window rows instead.
    "WITH ranked AS (SELECT c_mktsegment, c_name, "
    "ROW_NUMBER() OVER (PARTITION BY c_mktsegment "
    "ORDER BY c_acctbal DESC, c_name DESC) AS r_max, "
    "ROW_NUMBER() OVER (PARTITION BY c_mktsegment "
    "ORDER BY c_acctbal ASC, c_name ASC) AS r_min FROM customer) "
    "SELECT c_mktsegment, "
    "MAX(CASE WHEN r_max = 1 THEN c_name END) AS richest, "
    "MAX(CASE WHEN r_min = 1 THEN c_name END) AS poorest "
    "FROM ranked GROUP BY c_mktsegment",
    doc="max_by/min_by aggregates (DuckDB arg_max/arg_min) — the "
    "pick-the-row-attaining-the-extreme idiom without a self-join. "
    "The ordering key is (c_acctbal, c_name), not bare c_acctbal: "
    "max_by tie-breaking is engine-specific, so a duplicate balance "
    "within a segment would otherwise be nondeterministic.",
)
def op30e_argminmax(spark: SparkSession, sf: str) -> DataFrame:
    tie_free = F.struct("c_acctbal", "c_name")
    return _t(spark, sf, "customer").groupBy("c_mktsegment").agg(
        F.max_by("c_name", tie_free).alias("richest"),
        F.min_by("c_name", tie_free).alias("poorest"),
    )


@register(
    "op92_udtf_analyze",
    "SELECT doc_id, lang AS f_lang, source AS f_source FROM documents",
    doc="Python UDTF with analyze() (Spark 4 dynamic output schema): "
    "the table function's columns are COMPUTED from a constant "
    "argument at plan time (a 'lang,source' field list becomes "
    "f_lang/f_source string columns) — the polymorphic-TVF surface "
    "schema-on-read connectors need, vs op65's fixed returnType. "
    "The kv payload round-trips through the parser, so the oracle "
    "is the source projection.",
)
def op92_udtf_analyze(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import StringType, StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    @udtf
    class ParseKv:
        @staticmethod
        def analyze(kv: AnalyzeArgument, fields: AnalyzeArgument):
            if not fields.isConstantExpression:
                raise ValueError("fields must be a constant string")
            st = StructType()
            for name in str(fields.value).split(","):
                st = st.add(f"f_{name.strip()}", StringType())
            return AnalyzeResult(schema=st)

        def eval(self, kv: str, fields: str):
            d = dict(
                pair.split("=", 1) for pair in (kv or "").split(",") if pair
            )
            yield tuple(
                d.get(name.strip()) for name in fields.split(",")
            )

    spark.udtf.register("parse_kv", ParseKv)
    safe = sf.strip("/").replace("/", "_").replace(".", "_")
    view = f"docs_kv_{safe}"
    _t(spark, sf, "documents").selectExpr(
        "doc_id",
        "concat('lang=', lang, ',source=', source) AS kv",
    ).createOrReplaceTempView(view)
    return spark.sql(
        f"SELECT doc_id, f_lang, f_source FROM {view}, "
        "LATERAL parse_kv(kv, 'lang,source')"
    )
