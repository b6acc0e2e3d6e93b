"""Incremental span-level (substring) dedup: a persisted gram-stats
index so new arrivals get scrubbed against the accumulated corpus
WITHOUT re-tokenizing it.

``operators/span_dedup.py`` detects duplicated token n-gram spans in
one batch pass over the whole corpus.  A daily-ingest pipeline cannot
afford that: the corpus side of the gram join is static, so we persist
it once — (gram, df) rows, ``df`` = distinct-doc count — and each
arriving batch probes with only ITS grams.

Layout: partitioned by ``_pb = pmod(xxhash64(gram), 64)`` so a probe
prunes to the batch's partitions; the gram STRING is a sorted data
column inside each partition for row-group pruning.  (Fixture scale
keeps the string as the join key so the DuckDB oracle can replay the
semantics; production would key on the 64-bit hash and shrink the
shuffle — same switch documented for ``dup_span_stats``.)

Refresh appends per-batch (gram, df) deltas; probes SUM dfs per gram.
That sum equals the true distinct-doc count under the append-only
ingest contract: batches carry ONLY new doc ids (no doc appears in
two batches), which is exactly what a change-feed of inserts
provides.  Updates/deletes require compaction (``build`` again) —
the same ANALYZE-style contract as the MinHash index stats.

Incrementality semantics: the probe emits duplicated-span intervals
for the BATCH docs only.  A corpus doc that becomes duplicated
because the batch re-introduced its phrasing is NOT retroactively
re-emitted — that back-scrub is a compaction-time job, the standard
trade every at-ingest dedup makes.  For the batch itself the result
provably equals the full recompute restricted to batch ids (a gram's
dup status is global and the stored dfs sum to the true counts) —
asserted in tests/test_span_index.py and by the catalog oracle.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdf_etl_ocr_inference_spark.operators.span_dedup import (
    merge_islands,
    positional_ngrams,
)
from pdf_etl_ocr_inference_spark.scratch import atomic_write_json

_PARTITION_BUCKETS = 64
_META = "_spanindex_meta.json"


def _gram_df(df: DataFrame, text_col: str, id_col: str, n: int) -> DataFrame:
    # ``mn`` (min doc id per gram, r12) rides the same combinable
    # shuffle as ``df``: MIN folds across versions exactly like SUM
    # does, so the keep-first probe's canonical owner — the minimum
    # over ALL docs seen so far — is stable under any fold order
    return (
        positional_ngrams(df, text_col, id_col, n)
        .groupBy("gram")
        .agg(
            F.countDistinct("id").alias("df"),
            F.min("id").alias("mn"),
        )
    )


def _with_pb(grams: DataFrame) -> DataFrame:
    return grams.withColumn(
        "_pb", F.pmod(F.xxhash64("gram"), F.lit(_PARTITION_BUCKETS))
    )


def build_span_gram_index(
    spark: SparkSession,
    docs: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 6,
) -> str:
    """Materialize the corpus gram-stats index: one combinable shuffle
    over the corpus (the same aggregation the batch op pays), written
    once."""
    rows = _with_pb(_gram_df(docs, text_col, id_col, n)).withColumn(
        "v", F.lit(0)
    )
    (
        rows.repartition("_pb")
        .sortWithinPartitions("_pb", "gram")
        .write.mode("overwrite")
        .partitionBy("v", "_pb")
        .parquet(path)
    )
    atomic_write_json(os.path.join(path, _META), {"n": n, "last_version": 0})
    return path


def refresh_span_gram_index(
    spark: SparkSession,
    path: str,
    batch: DataFrame,
    version: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """Fold a batch's gram dfs in, append-only.  Idempotent per
    version: the meta watermark skips re-applied commits, AND the
    rows land under a ``v=<version>`` partition that a retry first
    clears — so a crash BETWEEN the parquet append and the meta bump
    cannot double-count the batch (the failure mode version-column-
    free append-then-watermark schemes have)."""
    import shutil

    mp = os.path.join(path, _META)
    with open(mp) as f:
        meta = json.load(f)
    if version <= meta["last_version"]:
        return
    # refuse to fold into a pre-mn index (review-r12): appending
    # batches WITH the mn column to an index whose base rows lack it
    # makes a mixed-schema dataset where the keep-first guard flips
    # on which footer the reader samples — and where it passes, the
    # base generation's mins read as NULL and the probe mis-exempts.
    # Loud rebuild beats nondeterministic drift (the same doctrine
    # as the insert-only contract below).
    if "mn" not in spark.read.parquet(path).columns:
        raise ValueError(
            "span gram index predates the per-gram min-id column:"
            " folding would create a mixed-schema index whose"
            " keep-first probes mis-exempt — rebuild with"
            " build_span_gram_index first"
        )
    # clear any partial/orphaned copy of THIS version from a crashed
    # previous attempt before re-appending
    vdir = os.path.join(path, f"v={version}")
    shutil.rmtree(vdir, ignore_errors=True)
    rows = _with_pb(
        _gram_df(batch, text_col, id_col, meta["n"])
    ).withColumn("v", F.lit(version))
    (
        rows.repartition("_pb")
        .sortWithinPartitions("_pb", "gram")
        .write.mode("append")
        .partitionBy("v", "_pb")
        .parquet(path)
    )
    meta["last_version"] = version
    atomic_write_json(mp, meta)


def incremental_span_intervals(
    spark: SparkSession,
    path: str,
    batch: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    policy: str = "symmetric",
) -> DataFrame:
    """Duplicated-span intervals for the BATCH docs, judged against
    corpus ∪ batch: (id, span_start, span_end).

    The index side is partition-pruned to the batch grams' ``_pb``
    dirs (≤ 64, fewer for small batches) and the batch gram set joins
    in broadcast — the corpus is never re-tokenized and never
    shuffled; probe cost ∝ batch size + matched index rows.

    ``policy="keepfirst"`` (r11 verdict #3) exempts the CANONICAL
    occurrence — the gram's minimum doc id over ALL DOCS SEEN SO FAR
    (the index's folded per-version MINs, min'd with the current
    batch): a total order that is stable across batches because MIN
    is fold-order-independent.  When a new batch doc has a SMALLER
    id than the current canonical owner, the exemption moves to the
    new doc and the displaced owner is NOT retroactively re-scrubbed
    (exemption-stickiness): the probe's contract is batch-docs-only
    output, and back-scrubbing published corpus docs is a
    compaction-time job — the same trade this module's symmetric
    path already documents for retroactive duplication.  For the
    batch itself the result still equals the keep-first full
    recompute restricted to batch ids (the canonical-owner rule only
    compares ids, and the folded mn IS the global min)."""
    with open(os.path.join(path, _META)) as f:
        n = json.load(f)["n"]
    if policy not in ("symmetric", "keepfirst"):
        raise ValueError(f"unknown policy {policy!r}")
    idx_raw = spark.read.parquet(path)
    if policy == "keepfirst" and "mn" not in idx_raw.columns:
        raise ValueError(
            "keep-first probe needs the per-gram min-id column; this"
            " index predates it — rebuild with build_span_gram_index"
        )
    occ = positional_ngrams(batch, text_col, id_col, n)
    batch_df = occ.groupBy("gram").agg(
        F.countDistinct("id").alias("_bdf"),
        F.min("id").alias("_bmn"),
    )
    probe = _with_pb(batch_df)
    pbs = [r["_pb"] for r in probe.select("_pb").distinct().collect()]
    has_mn = "mn" in idx_raw.columns
    idx = (
        idx_raw.filter(F.col("_pb").isin(pbs))
        .groupBy("gram")
        .agg(
            F.sum("df").alias("_cdf"),
            (
                F.min("mn") if has_mn else F.lit(None).cast("long")
            ).alias("_cmn"),
        )
    )
    totals = idx.join(F.broadcast(probe.drop("_pb")), "gram").select(
        "gram",
        (F.col("_cdf") + F.col("_bdf")).alias("_tdf"),
        F.least(
            F.coalesce("_cmn", "_bmn"), F.col("_bmn")
        ).alias("_tmn"),
    )
    # grams absent from the index count only their batch df
    batch_only = batch_df.join(idx.select("gram"), "gram", "left_anti").select(
        "gram",
        F.col("_bdf").alias("_tdf"),
        F.col("_bmn").alias("_tmn"),
    )
    dup = (
        totals.unionByName(batch_only)
        .filter(F.col("_tdf") >= 2)
        .select("gram", "_tmn")
    )
    hits = occ.join(dup, "gram")
    if policy == "keepfirst":
        hits = hits.filter(F.col("id") > F.col("_tmn"))
    return merge_islands(
        hits.select("id", "pos", (F.col("pos") + n).alias("end"))
    )


def span_index_refresh_fn(path: str):
    """Adapter for ``optimizer.sync_index_from_feed``: folds a change
    feed's INSERT rows into the gram index.

    The index is insert-only by contract — an update's postimage is a
    RE-insert of an existing doc id, which would double-count that
    doc's grams (the stored dfs sum), and a delete needs gram
    decrements only a full rebuild can supply.  Both raise here
    instead of drifting silently; rebuild is the compaction escape
    hatch (the ``minmax_delta`` contract)."""

    def fn(spark, table_key, changes, version, catalog=None):
        bad = (
            changes.filter(F.col("_change_type") != "insert")
            .limit(1)
            .count()
        )
        if bad:
            raise ValueError(
                "span gram index is insert-only: updates/deletes in the"
                " feed require a rebuild (build_span_gram_index), not a"
                " fold — refusing to drift the stored df counts"
            )
        refresh_span_gram_index(
            spark, path, changes.drop("_change_type"), version
        )

    return fn


def batch_novel_gram_counts(
    spark: SparkSession,
    path: str,
    batch: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-BATCH-doc novelty against the corpus gram index:
    ``(id, n_grams, n_new)`` over each doc's DISTINCT n-grams, where
    ``n_new`` counts grams ABSENT from the index — the net-new-text
    rate an ingest pipeline reports per batch (a batch that re-crawls
    known pages adds tokens but no novelty).

    Same probe shape as ``incremental_span_intervals``: the index side
    is partition-pruned to the batch grams' ``_pb`` dirs and
    restricted to the (broadcast) batch gram set, so probe cost ∝
    batch size + matched index rows — the corpus is never
    re-tokenized and never shuffled."""
    with open(os.path.join(path, _META)) as f:
        n = json.load(f)["n"]
    occ = (
        positional_ngrams(batch, text_col, id_col, n)
        .select("id", "gram")
        .distinct()
    )
    grams = occ.select("gram").distinct()
    probe = _with_pb(grams)
    pbs = [r["_pb"] for r in probe.select("_pb").distinct().collect()]
    known = (
        spark.read.parquet(path)
        .filter(F.col("_pb").isin(pbs))
        .select("gram")
        .join(F.broadcast(grams), "gram", "leftsemi")
        .distinct()
        .withColumn("_k", F.lit(1))
    )
    return (
        occ.join(known, "gram", "left")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(
                F.when(F.col("_k").isNull(), 1).otherwise(0)
            ).alias("n_new"),
        )
    )
