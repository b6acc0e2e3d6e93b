"""Incremental materialized-aggregate maintenance over the change feed.

The reference's only incremental consumer is the TRIGGERED delta-sync
vector index (``ocr-tesseract-unstructured.py:145-153``) — a *special
case* of maintaining derived state from a table's change feed.  This
module provides the general case for distributive aggregates
(COUNT / SUM, and AVG derived from them): given the change rows a
``streaming.changefeed`` table emits, produce a keyed delta and merge
it into the previously materialized aggregate — no rescan of the base
table.

Why this matters at 100 TB: a grouped aggregate over the full corpus
is a full scan + shuffle.  With ``agg_delta`` the refresh cost is
proportional to the *change volume* only (change feed reads prune to
new ``v=N`` directories), and the merge is a join on the group key
against the (much smaller) aggregate table.

Correctness model: inserts / update_postimages contribute +1, deletes
/ update_preimages contribute -1 — so an update contributes the
*difference* of its post- and pre-image, and the maintained aggregate
is exactly the aggregate of the current snapshot (proved in
``tests/test_ivm.py`` against ``changefeed.snapshot`` recomputation).
Only distributive/algebraic aggregates are maintainable this way;
holistic ones (MEDIAN, exact DISTINCT) need their own sketch or a
recompute — documented, not hidden.

Delta interop: Delta Lake's Change Data Feed emits the SAME
``_change_type`` vocabulary (insert / update_preimage /
update_postimage / delete), so these helpers work unchanged on
``spark.read.format("delta").option("readChangeFeed", "true")``
output when delta-spark is on the classpath (see
``sources.delta_interop``) — no adapter needed.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Change types that add a row to the snapshot vs remove one.
_ADDS = ("insert", "update_postimage")
_REMOVES = ("delete", "update_preimage")


def agg_delta(
    changes: DataFrame,
    keys: Sequence[str],
    sum_cols: dict[str, str],
    count_col: str = "n_rows",
) -> DataFrame:
    """Keyed aggregate delta from change rows.

    ``sum_cols`` maps output column name -> source column to SUM.
    Output schema: ``keys + [count_col] + list(sum_cols)`` where each
    value is the signed contribution of the change batch (may be
    negative, and zero-sum groups are retained so ``merge_delta`` can
    cancel them).
    """
    sign = F.when(F.col("_change_type").isin(*_ADDS), F.lit(1)).when(
        F.col("_change_type").isin(*_REMOVES), F.lit(-1)
    )
    aggs = [F.sum(sign).alias(count_col)]
    aggs += [
        F.sum(sign * F.col(src)).alias(out) for out, src in sum_cols.items()
    ]
    return changes.groupBy(*keys).agg(*aggs)


def merge_delta(
    base: DataFrame,
    delta: DataFrame,
    keys: Sequence[str],
    value_cols: Sequence[str],
    count_col: str = "n_rows",
) -> DataFrame:
    """Merge a signed delta into a materialized aggregate.

    Full-outer join on the group key (new groups appear via the delta
    side, vanished groups cancel to zero and are dropped).  The join's
    build side is two *aggregate* tables — group-cardinality sized,
    not corpus sized — so this stays cheap regardless of base-table
    scale.
    """
    cols = [count_col, *value_cols]
    b = base.select(*keys, *[F.col(c).alias(f"_b_{c}") for c in cols])
    d = delta.select(*keys, *[F.col(c).alias(f"_d_{c}") for c in cols])
    merged = b.join(d, on=list(keys), how="full_outer").select(
        *keys,
        *[
            (
                F.coalesce(F.col(f"_b_{c}"), F.lit(0))
                + F.coalesce(F.col(f"_d_{c}"), F.lit(0))
            ).alias(c)
            for c in cols
        ],
    )
    return merged.filter(F.col(count_col) > 0)


def minmax_delta(
    changes: DataFrame,
    keys: Sequence[str],
    min_cols: dict[str, str] | None = None,
    max_cols: dict[str, str] | None = None,
) -> DataFrame:
    """Keyed MIN/MAX delta from an INSERT-ONLY change batch.

    MIN/MAX are not signed-delta maintainable: a delete of the current
    extreme needs the runner-up, which only the base data knows.  They
    ARE monotonically maintainable under inserts (the new extreme is
    min/max of old and batch), which covers append-only corpora — the
    common case for ingest pipelines.  Any delete / update_preimage in
    the batch raises: silently wrong extremes are worse than a
    recompute, and the caller is told which escape hatch to take
    (full recompute is the compaction, same contract as the index
    stats).
    """
    removes = changes.filter(
        F.col("_change_type").isin(*_REMOVES)
    ).limit(1).count()
    if removes:
        raise ValueError(
            "minmax_delta: change batch contains deletes/update_preimages;"
            " MIN/MAX cannot be delta-maintained through removals —"
            " recompute the aggregate from the snapshot instead"
        )
    aggs = []
    for out, src in (min_cols or {}).items():
        aggs.append(F.min(src).alias(out))
    for out, src in (max_cols or {}).items():
        aggs.append(F.max(src).alias(out))
    if not aggs:
        raise ValueError("minmax_delta: no min_cols/max_cols given")
    return changes.groupBy(*keys).agg(*aggs)


def merge_minmax(
    base: DataFrame,
    delta: DataFrame,
    keys: Sequence[str],
    min_cols: Sequence[str] = (),
    max_cols: Sequence[str] = (),
) -> DataFrame:
    """Merge an insert-only MIN/MAX delta: full-outer join on the
    group key, LEAST/GREATEST of the two sides (nulls fall through to
    the surviving side).  Aggregate-table sized, like merge_delta."""
    cols = [*min_cols, *max_cols]
    b = base.select(*keys, *[F.col(c).alias(f"_b_{c}") for c in cols])
    d = delta.select(*keys, *[F.col(c).alias(f"_d_{c}") for c in cols])
    picks = []
    for c in min_cols:
        picks.append(F.least(F.col(f"_b_{c}"), F.col(f"_d_{c}")).alias(c))
    for c in max_cols:
        picks.append(
            F.greatest(F.col(f"_b_{c}"), F.col(f"_d_{c}")).alias(c)
        )
    return b.join(d, on=list(keys), how="full_outer").select(*keys, *picks)
