"""Scalable global ranking (the runnable scale substitute for
unpartitioned ranking windows — SCALE.md §windows, op34c's note).

An unpartitioned ``Window.orderBy(...)`` funnels the whole table
through ONE task.  This module computes the same global ranks fully in
parallel:

1. bucket every row by approximate quantile ranges of the sort key
   (``approxQuantile`` — one pass, driver gets ≤ num_buckets scalars);
   bucket assignment is monotone in the key, so bucket order == global
   order and equal keys always share a bucket;
2. rank WITHIN each bucket with an ordinary partitioned window
   (parallel across buckets; one hash shuffle on the bucket id —
   the same shuffle count as the single-task plan);
3. add per-bucket rank offsets (a tiny count-per-bucket aggregate,
   collected as control data and broadcast-joined back);
4. derive ntile / percent_rank / cume_dist arithmetically from the
   global rank and total count.

The derivations assume a TIE-FREE total order (pass tiebreak columns),
which is also what makes the result deterministic and oracle-checkable:
with ties, cume_dist/percent_rank need per-key group counts instead.

Skew note: quantile buckets equalize row counts per bucket by
construction, so a heavy-hitter sort key degrades gracefully (all its
rows share one bucket — cap bucket width by adding tiebreak columns to
the BUCKETING key only if the key is pathologically concentrated).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_global_rank(
    df: DataFrame,
    order_cols: list[str],
    num_buckets: int = 32,
    rank_col: str = "_global_rn",
) -> tuple[DataFrame, int]:
    """Add a tie-free global row number without a single-task window.

    ``order_cols[0]`` must be numeric (quantile-bucketable); the rest
    are tiebreakers.  Returns (df + rank_col, total_row_count).
    """
    key = order_cols[0]
    probs = [i / num_buckets for i in range(1, num_buckets)]
    bounds = sorted(set(df.approxQuantile(key, probs, 0.001)))
    if bounds:
        barr = F.array(*[F.lit(b) for b in bounds])
        bucket = F.aggregate(
            barr,
            F.lit(0),
            lambda acc, b: acc + F.when(F.col(key) > b, 1).otherwise(0),
        )
    else:
        bucket = F.lit(0)
    bucketed = df.withColumn("_b", bucket)

    counts = bucketed.groupBy("_b").count().collect()  # ≤ num_buckets rows
    counts_sorted = sorted((r["_b"], r["count"]) for r in counts)
    total = sum(c for _, c in counts_sorted)
    offsets, acc = {}, 0
    for b, c in counts_sorted:
        offsets[b] = acc
        acc += c
    # offsets as a literal map projection (≤ num_buckets entries):
    # cheaper than a broadcast join — no join node, no shuffle, and the
    # lookup folds into the same projection as the rank arithmetic
    off_map = F.create_map(
        *[F.lit(x) for bo in offsets.items() for x in bo]
    )

    w = Window.partitionBy("_b").orderBy(*order_cols)
    ranked = (
        bucketed.withColumn(
            rank_col,
            (
                F.row_number().over(w)
                + F.coalesce(off_map[F.col("_b")], F.lit(0))
            ).cast("long"),
        )
        .drop("_b")
    )
    return ranked, total


def global_rank_metrics(
    df: DataFrame,
    order_cols: list[str],
    ntiles: int = 4,
    num_buckets: int = 32,
) -> DataFrame:
    """ntile / percent_rank / cume_dist over a tie-free global order,
    computed from the bucketed global rank (no single-task stage).

    Matches SQL window semantics exactly for tie-free orders:
    ``percent_rank = (rn-1)/(n-1)``, ``cume_dist = rn/n``, and ntile's
    uneven-bucket rule (first ``n % k`` tiles get one extra row).
    """
    ranked, n = with_global_rank(df, order_cols, num_buckets=num_buckets)
    rn = F.col("_global_rn")
    q, r = divmod(n, ntiles)
    if q == 0:  # fewer rows than tiles: tile == rank
        tile = rn.cast("int")
    else:
        big = r * (q + 1)  # rows covered by the (q+1)-sized tiles
        tile = (
            F.when(rn <= big, ((rn - 1) / (q + 1)).cast("int") + 1)
            .otherwise(r + ((rn - big - 1) / q).cast("int") + 1)
            .cast("int")
        )
    pct = (
        F.lit(0.0) if n <= 1 else (rn - 1).cast("double") / F.lit(n - 1)
    )
    return (
        ranked.withColumn("quartile", tile)
        .withColumn("pct_rank", F.round(pct, 6))
        .withColumn("cume", F.round(rn.cast("double") / F.lit(n), 6))
        .drop("_global_rn")
    )
