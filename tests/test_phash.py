"""Perceptual-hash near-dup (operators/multimodal.py): Spark dHash ==
pure-Python reference, block-join pair set == brute-force hamming
scan, and locality of the fingerprint under small edits.
"""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from pdf_etl_ocr_inference_spark.operators.dedup import hamming_near_pairs
from pdf_etl_ocr_inference_spark.operators.multimodal import (
    _dhash_one,
    perceptual_hash,
    phash_near_pairs,
    with_media_column,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def doc_payloads():
    tbl = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    return {
        int(i): t.encode("utf-8")
        for i, t in zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist())
    }


def test_spark_matches_python_reference(spark, doc_payloads):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = {
        r["media_id"]: r["phash"]
        for r in perceptual_hash(with_media_column(docs)).collect()
    }
    assert len(got) == len(doc_payloads)
    for mid, payload in doc_payloads.items():
        assert got[mid] == _dhash_one(payload), mid


def test_pairs_equal_brute_force(spark, doc_payloads):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = sorted(
        (r["id_a"], r["id_b"], r["hamming"])
        for r in phash_near_pairs(with_media_column(docs)).collect()
    )
    hashes = {mid: _dhash_one(p) & ((1 << 64) - 1) for mid, p in doc_payloads.items()}
    ids = sorted(hashes)
    expect = sorted(
        (a, b, bin(hashes[a] ^ hashes[b]).count("1"))
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if bin(hashes[a] ^ hashes[b]).count("1") <= 6
    )
    assert got == expect
    assert expect, "fixture should contain at least one near-dup pair"


def test_locality_under_small_edit(spark):
    # flipping a handful of bytes must flip few fingerprint bits,
    # while unrelated payloads differ widely
    rng = np.random.default_rng(7)
    base = rng.integers(0, 256, size=4096, dtype=np.uint8).tobytes()
    edited = bytearray(base)
    for off in (100, 2000, 3500):
        edited[off] ^= 0xFF
    other = rng.integers(0, 256, size=4096, dtype=np.uint8).tobytes()

    h_base = _dhash_one(base) & ((1 << 64) - 1)
    h_edit = _dhash_one(bytes(edited)) & ((1 << 64) - 1)
    h_other = _dhash_one(other) & ((1 << 64) - 1)
    assert bin(h_base ^ h_edit).count("1") <= 6
    assert bin(h_base ^ h_other).count("1") > 10


def test_hamming_near_pairs_guardrails(spark):
    df = spark.createDataFrame([(1, 5), (2, 5)], "id long, h long")
    with pytest.raises(ValueError, match="complete candidate"):
        hamming_near_pairs(df, "h", "id", max_hamming=4, num_blocks=4)
    with pytest.raises(ValueError, match="divide 64"):
        hamming_near_pairs(df, "h", "id", max_hamming=2, num_blocks=6)


def test_hamming_near_pairs_single_block_exact_dupes(spark):
    # num_blocks=1 / max_hamming=0: the exact-duplicate configuration —
    # the 64-bit mask must not overflow a long literal
    df = spark.createDataFrame(
        [(1, -5), (2, -5), (3, 9)], "id long, h long"
    )
    got = sorted(
        (r["id_a"], r["id_b"], r["hamming"])
        for r in hamming_near_pairs(
            df, "h", "id", max_hamming=0, num_blocks=1
        ).collect()
    )
    assert got == [(1, 2, 0)]
