"""CLI smoke tests (subprocess — the real user surface)."""

from __future__ import annotations

import json
import subprocess
import sys

from .conftest import REPO


def _cli(*args: str) -> subprocess.CompletedProcess:
    return subprocess.run(
        [sys.executable, "-m", "pdf_etl_ocr_inference_spark", *args],
        capture_output=True,
        text=True,
        cwd=str(REPO),
        timeout=300,
    )


def test_cli_list():
    r = _cli("list")
    assert r.returncode == 0
    assert "tpch_q1" in r.stdout and "dedup_minhash_lsh" in r.stdout


def test_cli_oracle():
    r = _cli("oracle", "tpch_q6")
    assert r.returncode == 0
    assert r.stdout.strip().startswith("SELECT")


def test_cli_unknown_query():
    r = _cli("oracle", "no_such_query")
    assert r.returncode == 2
    assert "unknown query" in r.stderr


def test_jsonl_sink_manifest_hides_uncommitted_debris(spark, tmp_path):
    """The custom sink's exactly-once story: a staged file NOT in the
    manifest (a failed/speculated attempt) must be invisible to the
    read-back."""
    from pyspark.sql import types as T

    from pdf_etl_ocr_inference_spark.sources.custom_source import (
        read_jsonl_sink,
        register_jsonl_sink,
    )

    register_jsonl_sink(spark)
    path = str(tmp_path / "sink")
    df = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"])
    df.write.format("graft_jsonl_sink").option("path", path).mode(
        "append"
    ).save()
    # plant debris from a "failed attempt"
    with open(f"{path}/part-deadbeef.jsonl", "w") as f:
        f.write('{"k": 99, "v": "ghost"}\n')
    schema = T.StructType(
        [T.StructField("k", T.LongType()), T.StructField("v", T.StringType())]
    )
    got = sorted(
        (r["k"], r["v"]) for r in read_jsonl_sink(spark, path, schema).collect()
    )
    assert got == [(1, "a"), (2, "b")]


def test_jsonl_sink_overwrite_removes_stale_generations(spark, tmp_path):
    """ADVICE r3: mode('overwrite') previously left every prior
    generation's data files on disk forever (hidden only by the
    manifest).  commit() must physically sweep files absent from the
    new manifest."""
    import os

    from pyspark.sql import types as T

    from pdf_etl_ocr_inference_spark.sources.custom_source import (
        read_jsonl_sink,
        register_jsonl_sink,
    )

    register_jsonl_sink(spark)
    path = str(tmp_path / "sink")
    gen1 = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"])
    gen1.write.format("graft_jsonl_sink").option("path", path).mode(
        "overwrite"
    ).save()
    n_gen1 = len(
        [f for f in os.listdir(path) if f.endswith(".jsonl")]
    )
    assert n_gen1 >= 1

    gen2 = spark.createDataFrame([(3, "c")], ["k", "v"])
    gen2.write.format("graft_jsonl_sink").option("path", path).mode(
        "overwrite"
    ).save()
    import json

    with open(f"{path}/_MANIFEST.json") as f:
        manifest = json.load(f)
    on_disk = sorted(f for f in os.listdir(path) if f.endswith(".jsonl"))
    assert on_disk == sorted(manifest["files"])

    schema = T.StructType(
        [T.StructField("k", T.LongType()), T.StructField("v", T.StringType())]
    )
    got = sorted(
        (r["k"], r["v"])
        for r in read_jsonl_sink(spark, path, schema).collect()
    )
    assert got == [(3, "c")]
