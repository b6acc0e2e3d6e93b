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
    "  ROUND(LIST_COSINE_SIMILARITY(e.embedding, q.embedding), 4) AS score, "
    "  ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY "
    "    LIST_COSINE_SIMILARITY(e.embedding, q.embedding) DESC, e.vec_id) "
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
    "percent_rank / cume_dist over a global tie-free order.",
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
    "op30e_argminmax",
    "SELECT c_mktsegment, "
    "ARG_MAX(c_name, c_acctbal) AS richest, "
    "ARG_MIN(c_name, c_acctbal) AS poorest "
    "FROM customer GROUP BY c_mktsegment",
    doc="max_by/min_by aggregates (DuckDB arg_max/arg_min) — the "
    "pick-the-row-attaining-the-extreme idiom without a self-join.",
)
def op30e_argminmax(spark: SparkSession, sf: str) -> DataFrame:
    return _t(spark, sf, "customer").groupBy("c_mktsegment").agg(
        F.max_by("c_name", "c_acctbal").alias("richest"),
        F.min_by("c_name", "c_acctbal").alias("poorest"),
    )
