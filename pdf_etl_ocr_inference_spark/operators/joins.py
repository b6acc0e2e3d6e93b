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
