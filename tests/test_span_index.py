"""Incremental span-dedup index: probe ≡ batch-restricted full
recompute, refresh ≡ rebuild, version idempotence."""

from __future__ import annotations

from pyspark.sql import functions as F

from pdf_etl_ocr_inference_spark.operators.span_dedup import (
    dup_span_intervals,
)
from pdf_etl_ocr_inference_spark.operators.span_index import (
    build_span_gram_index,
    incremental_span_intervals,
    refresh_span_gram_index,
)

BOILER = "all rights reserved by the original author of this work"


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


CORPUS = [
    (0, f"alpha beta gamma {BOILER} delta epsilon zeta"),
    (1, "one two three four five six seven eight nine ten"),
    (2, "red orange yellow green blue indigo violet pad1 pad2 pad3"),
]
BATCH1 = [
    # re-introduces the corpus boilerplate -> dup vs index
    (100, f"prefix words here {BOILER} suffix words"),
    # two batch docs sharing a NEW 6-gram run -> dup within batch
    (101, "nova lyra orion vega sirius rigel tail1 tail2"),
    (102, "head0 nova lyra orion vega sirius rigel end"),
    # clean doc
    (103, "totally fresh content with no repeats at all whatsoever"),
]
BATCH2 = [
    # duplicates BATCH1's new run -> needs the refreshed index
    (200, "zz nova lyra orion vega sirius rigel yy"),
]


def _ivals(df):
    return sorted(
        (r["id"], r["span_start"], r["span_end"]) for r in df.collect()
    )


def test_probe_equals_full_recompute(spark, tmp_path):
    path = str(tmp_path / "idx")
    build_span_gram_index(spark, _docs(spark, CORPUS), path, n=6)
    got = _ivals(
        incremental_span_intervals(spark, path, _docs(spark, BATCH1))
    )
    full = _ivals(
        dup_span_intervals(
            _docs(spark, CORPUS + BATCH1), "text", "doc_id", n=6
        ).filter(F.col("id") >= 100)
    )
    assert got == full
    ids = {i for i, _, _ in got}
    assert 100 in ids and 101 in ids and 102 in ids and 103 not in ids


def test_refresh_equals_rebuild(spark, tmp_path):
    p_inc = str(tmp_path / "inc")
    p_full = str(tmp_path / "full")
    build_span_gram_index(spark, _docs(spark, CORPUS), p_inc, n=6)
    refresh_span_gram_index(
        spark, p_inc, _docs(spark, BATCH1), version=1
    )
    build_span_gram_index(
        spark, _docs(spark, CORPUS + BATCH1), p_full, n=6
    )
    got_inc = _ivals(
        incremental_span_intervals(spark, p_inc, _docs(spark, BATCH2))
    )
    got_full = _ivals(
        incremental_span_intervals(spark, p_full, _docs(spark, BATCH2))
    )
    assert got_inc == got_full
    # BATCH2 duplicates BATCH1's run — visible only via the refresh
    assert any(i == 200 for i, _, _ in got_inc)


def test_refresh_version_idempotent(spark, tmp_path):
    path = str(tmp_path / "idx")
    build_span_gram_index(spark, _docs(spark, CORPUS), path, n=6)
    refresh_span_gram_index(spark, path, _docs(spark, BATCH1), version=1)
    before = _ivals(
        incremental_span_intervals(spark, path, _docs(spark, BATCH2))
    )
    # at-least-once feed re-delivers the same commit: must be a no-op
    refresh_span_gram_index(spark, path, _docs(spark, BATCH1), version=1)
    after = _ivals(
        incremental_span_intervals(spark, path, _docs(spark, BATCH2))
    )
    assert before == after


def test_refresh_crash_between_append_and_meta_heals(spark, tmp_path):
    """Simulate the crash window: rows appended but meta not bumped.
    The retry must NOT double-count the batch's dfs."""
    import json
    import os

    path = str(tmp_path / "idx")
    build_span_gram_index(spark, _docs(spark, CORPUS), path, n=6)
    refresh_span_gram_index(spark, path, _docs(spark, BATCH1), version=1)
    clean = _ivals(
        incremental_span_intervals(spark, path, _docs(spark, BATCH2))
    )
    # roll the watermark back as if the process died pre-bump
    mp = os.path.join(path, "_spanindex_meta.json")
    with open(mp) as f:
        meta = json.load(f)
    meta["last_version"] = 0
    with open(mp, "w") as f:
        json.dump(meta, f)
    refresh_span_gram_index(spark, path, _docs(spark, BATCH1), version=1)
    healed = _ivals(
        incremental_span_intervals(spark, path, _docs(spark, BATCH2))
    )
    assert healed == clean
