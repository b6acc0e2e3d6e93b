"""Join operators (SURVEY.md §2.3, OP-17/18/19).

The reference's single join is positional: two reads of ``papers``
both ordered ``filesize DESC``, aligned by ``row_number() over
monotonically_increasing_id`` and a closure UDF indexing a driver list
(``02-parallel-ocr-with-ray.py:277-282``).  That alignment is fragile
(ties in the sort key make it nondeterministic) and the driver list is
a broadcast-by-accident.

Engine defaults:
- key joins (``key_join``) — Catalyst picks broadcast-hash /
  shuffled-hash / sort-merge; AQE switches strategy at runtime.
- ``positional_join`` keeps the reference *capability* but implements
  it as ``row_number`` on BOTH sides over an explicit total order +
  an equi-join on the index — deterministic given a tie-free order
  spec, no driver round-trip, no closure capture.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def key_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str] | Column,
    how: str = "inner",
    broadcast_right: bool = False,
) -> DataFrame:
    """OP-18/19: equi / semi / anti join.

    ``broadcast_right=True`` pins a broadcast-hash join for known-small
    dimension tables (nation/region-sized) instead of relying on the
    size estimator — at 100 TB the fact side must never shuffle for a
    dimension join.
    """
    r = F.broadcast(right) if broadcast_right else right
    return left.join(r, on=on, how=how)


def zip_with_index(
    df: DataFrame, order_by: list[Column], index_col: str = "_pos"
) -> DataFrame:
    """1-based dense position over an explicit total order.

    Single window over a global sort — the range-partitioned sort is
    the unavoidable cost of positional semantics; callers that can use
    a key join should (SURVEY OP-17 note).
    """
    w = Window.orderBy(*order_by)
    return df.withColumn(index_col, F.row_number().over(w))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    strict: bool = False,
    direction: str = "backward",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """As-of join: for each left row, attach the latest right row with
    ``right_ts <= left_ts`` (``<`` when ``strict``) for the same key —
    or, with ``direction="forward"``, the EARLIEST right row with
    ``right_ts >= left_ts`` (``>`` when strict).

    ``tolerance_seconds`` nulls the match when the matched row is
    farther than the tolerance from ``left_ts``.  That equals
    "nearest within tolerance": the as-of match is the nearest
    qualifying row, and every other candidate is farther out, so a
    too-far match means NO candidate is in range.

    Spark has no native as-of join; the naive formulation (range join +
    per-left-row max) explodes quadratically per key.  This is the
    union-scan construction instead: tag both sides, union on (key,
    ts), and carry right values forward with ``last(ignorenulls)`` over
    a key-partitioned time window — ONE shuffle on the key, linear in
    rows, skew-bounded by the busiest key (same bound as any
    partitioned window).

    Ties: a right row at exactly ``left_ts`` is visible to the left row
    unless ``strict`` (right sorts before left within a timestamp via
    the side tag).

    The right side is carried as ONE struct (timestamp + all value
    columns), so every emitted value comes from the SAME matched right
    row: a NULL value on the matched row stays NULL (DuckDB-ASOF
    semantics) instead of falling back to an older row, and the
    tolerance gap is always measured against the row the values came
    from.

    Output: all left columns + ``value_cols`` from the matched right
    row (null when no prior right row exists).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    lcols = left.columns
    # Within one timestamp the carry window includes rows up to and
    # including the current one, so visibility of a same-ts right row
    # is decided by sort order.  Backward (carry PAST values forward):
    # non-strict → right first (visible), strict → left first.
    # Forward (carry FUTURE values backward) mirrors it.
    if direction == "backward":
        side_order = 0 if strict else 1  # left's tag; right gets the other
    else:
        side_order = 1 if strict else 0
    r_tagged = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(1 - side_order).alias("_side"),
        F.lit(None)
        .cast(
            left.select(F.struct(*lcols).alias("_l")).schema["_l"].dataType
        )
        .alias("_l"),
        F.struct(
            F.col(right_ts).alias("_rts"),
            *[F.col(c).alias(c) for c in value_cols],
        ).alias("_rv"),
    )
    l_tagged = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(side_order).alias("_side"),
        F.struct(*lcols).alias("_l"),
        F.lit(None).cast(r_tagged.schema["_rv"].dataType).alias("_rv"),
    )
    if direction == "backward":
        w = (
            Window.partitionBy("_k")
            .orderBy("_ts", "_side")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        matched = F.last("_rv", ignorenulls=True).over(w)
    else:
        w = (
            Window.partitionBy("_k")
            .orderBy("_ts", "_side")
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        matched = F.first("_rv", ignorenulls=True).over(w)
    carried = l_tagged.unionByName(r_tagged).select(
        "_l",
        F.col("_ts").alias("_lts"),
        matched.alias("_m"),
    )
    out = carried.filter(F.col("_l").isNotNull())
    if tolerance_seconds is not None:
        gap = F.abs(
            F.col("_lts").cast("double") - F.col("_m._rts").cast("double")
        )
        in_tol = F.col("_m").isNotNull() & (gap <= tolerance_seconds)
        out = out.select(
            "_l",
            F.when(in_tol, F.col("_m")).otherwise(F.lit(None)).alias("_m"),
        )
    return out.select(
        *[F.col(f"_l.{c}").alias(c) for c in lcols],
        *[F.col(f"_m.{c}").alias(c) for c in value_cols],
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    condition: Column,
) -> DataFrame:
    """Interval/range join: equi-join on ``key`` plus an arbitrary
    range ``condition`` over the two sides' columns.

    The equi-key keeps this a hash/sort-merge join (the range predicate
    evaluates post-match), so cost is per-key pair count — callers
    must supply a key selective enough to bound that; a pure theta join
    (no key) would be a broadcast-nested-loop and is refused at 100 TB.
    """
    return left.join(right, (left[key] == right[key]) & condition)


def positional_join(
    left: DataFrame,
    right: DataFrame,
    left_order: list[Column],
    right_order: list[Column],
    how: str = "inner",
) -> DataFrame:
    """OP-17: align two DataFrames by row position under explicit
    orders and join on the position index.

    Faithful to ``02:277-282`` semantics but deterministic: the caller
    must supply tie-free order specs (add a unique key as the last
    sort column — the reference's ``filesize DESC`` alone is not
    tie-free, SURVEY §7 hard part b).
    """
    li = zip_with_index(left, left_order, "_lpos")
    ri = zip_with_index(right, right_order, "_rpos")
    joined = li.join(ri, li["_lpos"] == ri["_rpos"], how=how)
    return joined.drop("_lpos", "_rpos")
