"""Physical-layout helpers: partition-count guarantees for CPU-heavy
operators.

Spark sizes file-scan partitions by bytes (``spark.sql.files.
maxPartitionBytes``), which is right for I/O-bound scans but wrong for
CPU-bound per-row work: a 10 MB parquet file arrives as ONE partition,
so shingling / hashing / Python inference over it runs as ONE task
while 31 cores idle.  The reference hit the same mismatch between
data-intensive and compute-intensive work and solved it with Ray
(``01-download-pdfs.py:193-204`` discussion); the Spark-native answer
is simply to guarantee a minimum partition count before the heavy
stage.

At 100 TB this is a no-op: the scan already has thousands of
partitions, so ``ensure_min_parallelism`` adds no shuffle.  It only
fires on narrow inputs, where the data being shuffled is small by
construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_min_parallelism(
    df: DataFrame, min_partitions: int | None = None
) -> DataFrame:
    """Round-robin repartition iff the plan has fewer partitions than
    ``min_partitions`` (default ``sc.defaultParallelism``).

    Call immediately before CPU-heavy per-row work (shingling, sim/min
    hashing, Python UDF inference).  The partition probe is driver-side
    plan inspection — no job runs.
    """
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def truncate_lineage(df: DataFrame) -> DataFrame:
    """Checkpoint an iterative algorithm's intermediate state, cutting
    the growing lineage.

    Durability follows the session: if ``sc.setCheckpointDir`` was
    called (production — HDFS/object store), use a RELIABLE checkpoint
    that survives executor loss; otherwise fall back to
    ``localCheckpoint`` (executor-local blocks — fine on local[n],
    where executor loss means process death anyway).  Iterative
    drivers (label propagation, IVF training) call this per round, so
    at 100 TB with preemptible executors the reliable path is the
    difference between a retried stage and a restarted job.
    """
    sc = df.sparkSession.sparkContext
    if sc._jsc.sc().getCheckpointDir().isDefined():
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=True)


def zorder_key(cols, bits: int = 12):
    """Morton (Z-order) key: interleave the low ``bits`` bits of each
    column, column ``i`` occupying bit positions ``i, i+n, i+2n, ...``.

    Inputs must already be non-negative integers scaled into
    ``[0, 2**bits)`` (callers clamp with ``% 2**bits`` or a min-max
    rescale).  Sorting the table by this key clusters rows that are
    close in EVERY dimension, so parquet row-group min/max stats become
    selective for *all* interleaved columns at once — a multi-dim scan
    can then prune row groups regardless of which dimension the
    predicate hits, where a linear sort only serves its leading column.
    Pure bit arithmetic (shift/or), fully inside whole-stage codegen.
    """
    from pyspark.sql import functions as F

    n = len(cols)
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, c in enumerate(cols):
            bit = F.shiftright(c.cast("long"), b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, b * n + i))
    return z
