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
