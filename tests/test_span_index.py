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
    # the per-gram MIN folds like the df sum (r12): refreshed index
    # stores mn per (gram, version), and the probe's folded min must
    # equal the rebuilt index's — assert via the keep-first probe
    got_inc_kf = _ivals(
        incremental_span_intervals(
            spark, p_inc, _docs(spark, BATCH2), policy="keepfirst"
        )
    )
    got_full_kf = _ivals(
        incremental_span_intervals(
            spark, p_full, _docs(spark, BATCH2), policy="keepfirst"
        )
    )
    assert got_inc_kf == got_full_kf
    # 200 > 101 (BATCH1's canonical owner of the run) -> scrubbed
    # under keep-first too
    assert any(i == 200 for i, _, _ in got_inc_kf)


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


def test_keepfirst_probe_equals_full_recompute(spark, tmp_path):
    """keepfirst probe ≡ keep-first full recompute restricted to
    batch ids: canonical occurrences (gram's global min doc id) are
    exempt, repeats emit intervals."""
    path = str(tmp_path / "idxkf")
    build_span_gram_index(spark, _docs(spark, CORPUS), path, n=6)
    got = _ivals(
        incremental_span_intervals(
            spark, path, _docs(spark, BATCH1), policy="keepfirst"
        )
    )
    full = _ivals(
        dup_span_intervals(
            _docs(spark, CORPUS + BATCH1), "text", "doc_id", n=6,
            policy="keepfirst",
        ).filter(F.col("id") >= 100)
    )
    assert got == full
    ids = {i for i, _, _ in got}
    # 100 repeats corpus doc 0's boilerplate -> scrubbed; 101 is the
    # canonical owner of the new run -> EXEMPT; 102 repeats it
    assert 100 in ids and 102 in ids
    assert 101 not in ids and 103 not in ids


def test_keepfirst_canonical_stable_across_batches(spark, tmp_path):
    """r11 verdict #3's semantic wrinkle, pinned: the canonical owner
    is the min doc id over ALL DOCS SEEN SO FAR.  A new batch doc
    with a SMALLER id than the current owner takes the exemption
    (and the displaced owner is NOT re-emitted — batch-docs-only
    output, exemption-stickiness); a later batch doc with an id
    between the two is still scrubbed against the NEW canonical."""
    path = str(tmp_path / "idxstab")
    # corpus owner of the boilerplate run is doc 50
    corpus = [(50, f"aa bb cc {BOILER} dd ee")]
    build_span_gram_index(spark, _docs(spark, corpus), path, n=6)

    # batch A: doc 10 < 50 re-introduces the run -> 10 becomes the
    # global min => EXEMPT, and nothing else is emitted (the
    # displaced owner 50 is a corpus doc, not a batch doc)
    batch_a = [(10, f"xx {BOILER} yy")]
    got_a = _ivals(
        incremental_span_intervals(
            spark, path, _docs(spark, batch_a), policy="keepfirst"
        )
    )
    assert got_a == []

    # fold batch A, then batch B: doc 30 sits BETWEEN the displaced
    # owner (50) and the new canonical (10) -> must be scrubbed,
    # proving the canonical moved to 10 and stayed there
    refresh_span_gram_index(spark, path, _docs(spark, batch_a), 1)
    batch_b = [(30, f"pp {BOILER} qq")]
    got_b = _ivals(
        incremental_span_intervals(
            spark, path, _docs(spark, batch_b), policy="keepfirst"
        )
    )
    assert len(got_b) == 1 and got_b[0][0] == 30

    # symmetric policy on the same probe still scrubs everything
    got_sym = _ivals(
        incremental_span_intervals(
            spark, path, _docs(spark, batch_b), policy="symmetric"
        )
    )
    assert got_sym == got_b


def test_keepfirst_legacy_index_without_mn_fails_loud(spark, tmp_path):
    """An index built before the mn column exists must refuse a
    keep-first probe (rebuild required), not silently mis-exempt."""
    import pytest

    path = str(tmp_path / "idxleg")
    build_span_gram_index(spark, _docs(spark, CORPUS), path, n=6)
    # simulate the pre-r12 layout: strip the mn column in place
    legacy = spark.read.parquet(path).drop("mn")
    import json
    import os

    with open(os.path.join(path, "_spanindex_meta.json")) as f:
        meta = json.load(f)
    legacy.write.mode("overwrite").parquet(str(tmp_path / "legacy"))
    import shutil

    shutil.rmtree(path)
    shutil.copytree(str(tmp_path / "legacy"), path)
    with open(os.path.join(path, "_spanindex_meta.json"), "w") as f:
        json.dump(meta, f)
    with pytest.raises(ValueError, match="rebuild"):
        incremental_span_intervals(
            spark, path, _docs(spark, BATCH1), policy="keepfirst"
        )
    # a REFRESH must refuse too (review-r12): folding an mn-bearing
    # batch into the legacy layout would create a mixed-schema index
    # whose keep-first guard flips on footer sampling order
    with pytest.raises(ValueError, match="rebuild"):
        refresh_span_gram_index(
            spark, path, _docs(spark, BATCH1), version=1
        )
    # the symmetric probe still works on the legacy layout
    got = incremental_span_intervals(
        spark, path, _docs(spark, BATCH1), policy="symmetric"
    )
    assert got.count() > 0
