"""Incremental materialized-aggregate maintenance (streaming/ivm.py):
the maintained aggregate must equal a from-scratch aggregation of
``changefeed.snapshot`` after every commit, across a mutation sequence
covering inserts, updates (both value and group-key moves), deletes,
group disappearance, and group (re)appearance.
"""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from pdf_etl_ocr_inference_spark.streaming.changefeed import (
    commit_changes,
    diff_snapshots,
    read_changes,
    snapshot,
)
from pdf_etl_ocr_inference_spark.streaming.ivm import agg_delta, merge_delta

KEYS = ["grp"]
SUMS = {"total": "val"}


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _recompute(snap):
    return snap.groupBy("grp").agg(
        F.count("*").alias("n_rows"), F.sum("val").alias("total")
    )


@pytest.fixture()
def cdf_dir():
    d = tempfile.mkdtemp(prefix="ivm_test_")
    shutil.rmtree(d, ignore_errors=True)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_incremental_equals_recompute_across_commits(spark, cdf_dir):
    def df(rows):
        return spark.createDataFrame(rows, "id long, grp string, val long")

    # v0: two groups
    s0 = df([(1, "a", 10), (2, "a", 20), (3, "b", 5)])
    commit_changes(s0.withColumn("_change_type", F.lit("insert")), cdf_dir, 0)
    # v1: value update, group-move update (b->c), delete, insert
    s1 = df([(1, "a", 11), (3, "c", 5), (4, "b", 7)])
    commit_changes(diff_snapshots(s0, s1, "id"), cdf_dir, 1)
    # v2: delete the whole 'b' group, re-insert into 'a'
    s2 = df([(1, "a", 11), (3, "c", 5), (5, "a", -3)])
    commit_changes(diff_snapshots(s1, s2, "id"), cdf_dir, 2)

    mat = agg_delta(
        read_changes(spark, cdf_dir, since_version=-1).filter(
            F.col("_commit_version") == 0
        ),
        KEYS,
        SUMS,
    )
    for v in (1, 2):
        delta = agg_delta(
            read_changes(spark, cdf_dir, since_version=v - 1).filter(
                F.col("_commit_version") == v
            ),
            KEYS,
            SUMS,
        )
        mat = merge_delta(mat, delta, KEYS, value_cols=["total"])
        expected = _recompute(snapshot(spark, cdf_dir, "id", as_of_version=v))
        assert _rows(mat) == _rows(expected), f"diverged at v{v}"
    # vanished group must be dropped, not kept at zero
    assert "b" not in {r[0] for r in mat.collect()}


def test_batched_delta_equals_per_commit_deltas(spark, cdf_dir):
    # applying v1+v2 as ONE delta batch must equal applying them
    # one-by-one (consumer that catches up after lagging)
    def df(rows):
        return spark.createDataFrame(rows, "id long, grp string, val long")

    s0 = df([(1, "a", 1), (2, "b", 2)])
    commit_changes(s0.withColumn("_change_type", F.lit("insert")), cdf_dir, 0)
    s1 = df([(1, "a", 5), (3, "c", 3)])
    commit_changes(diff_snapshots(s0, s1, "id"), cdf_dir, 1)
    s2 = df([(1, "b", 5), (3, "c", 4)])
    commit_changes(diff_snapshots(s1, s2, "id"), cdf_dir, 2)

    base = agg_delta(
        read_changes(spark, cdf_dir, since_version=-1).filter(
            F.col("_commit_version") == 0
        ),
        KEYS,
        SUMS,
    )
    batched = merge_delta(
        base,
        agg_delta(read_changes(spark, cdf_dir, since_version=0), KEYS, SUMS),
        KEYS,
        value_cols=["total"],
    )
    expected = _recompute(snapshot(spark, cdf_dir, "id"))
    assert _rows(batched) == _rows(expected)


def test_random_commit_sequence(spark, cdf_dir):
    # seeded random 4-commit history over a small key domain: every
    # prefix of the feed must maintain to the snapshot recompute
    import random

    rng = random.Random(20260813)

    def df(rows):
        return spark.createDataFrame(rows, "id long, grp string, val long")

    state = {
        i: (rng.choice("abc"), rng.randrange(-50, 50)) for i in range(12)
    }
    s_prev = df([(i, g, v) for i, (g, v) in state.items()])
    commit_changes(
        s_prev.withColumn("_change_type", F.lit("insert")), cdf_dir, 0
    )
    for v in range(1, 4):
        for i in list(state):
            roll = rng.random()
            if roll < 0.2:
                del state[i]
            elif roll < 0.5:
                state[i] = (rng.choice("abc"), rng.randrange(-50, 50))
        nxt = max(state, default=-1) + 1
        for i in range(nxt, nxt + rng.randrange(0, 3)):
            state[i] = (rng.choice("abcd"), rng.randrange(-50, 50))
        s_cur = df([(i, g, x) for i, (g, x) in state.items()])
        commit_changes(diff_snapshots(s_prev, s_cur, "id"), cdf_dir, v)
        s_prev = s_cur

    mat = agg_delta(
        read_changes(spark, cdf_dir, since_version=-1).filter(
            F.col("_commit_version") == 0
        ),
        KEYS,
        SUMS,
    )
    for v in range(1, 4):
        delta = agg_delta(
            read_changes(spark, cdf_dir, since_version=v - 1).filter(
                F.col("_commit_version") == v
            ),
            KEYS,
            SUMS,
        )
        mat = merge_delta(mat, delta, KEYS, value_cols=["total"])
        expected = _recompute(snapshot(spark, cdf_dir, "id", as_of_version=v))
        assert _rows(mat) == _rows(expected), f"diverged at v{v}"


def test_minmax_delta_refuses_removals(spark):
    import pytest as _pytest
    from pyspark.sql import functions as F

    from pdf_etl_ocr_inference_spark.streaming.ivm import minmax_delta

    changes = spark.createDataFrame(
        [(1, 5.0, "insert"), (1, 9.0, "delete")],
        ["k", "v", "_change_type"],
    )
    with _pytest.raises(ValueError, match="cannot be delta-maintained"):
        minmax_delta(changes, ["k"], min_cols={"mn": "v"})


def test_minmax_merge_handles_new_and_existing_groups(spark):
    from pyspark.sql import functions as F

    from pdf_etl_ocr_inference_spark.streaming.ivm import (
        merge_minmax,
        minmax_delta,
    )

    base = spark.createDataFrame(
        [(1, 2.0, 8.0), (2, 1.0, 4.0)], ["k", "mn", "mx"]
    )
    batch = spark.createDataFrame(
        [(1, 0.5, "insert"), (3, 7.0, "insert")],
        ["k", "v", "_change_type"],
    )
    delta = minmax_delta(
        batch, ["k"], min_cols={"mn": "v"}, max_cols={"mx": "v"}
    )
    got = {
        r["k"]: (r["mn"], r["mx"])
        for r in merge_minmax(
            base, delta, ["k"], min_cols=["mn"], max_cols=["mx"]
        ).collect()
    }
    # k=1: new lower min, max unchanged; k=2: untouched; k=3: new group
    assert got == {1: (0.5, 8.0), 2: (1.0, 4.0), 3: (7.0, 7.0)}
