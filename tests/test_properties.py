"""Hypothesis property tests (SURVEY §5.3): invariants that hold for
ALL inputs, not just the fixtures.

Spark-session-touching properties use a module-scoped example budget
(max_examples small, deadline off) — each example costs a Spark job.
Pure-Python properties (the chunker) run at full budget.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from pdf_etl_ocr_inference_spark.operators.documents import (
    token_window_chunks,
)
from pdf_etl_ocr_inference_spark.operators.inference import hash_embed_texts

# ------------------------------------------------------------------
# Pure-Python: chunker + stub embedder
# ------------------------------------------------------------------

texts = st.text(
    alphabet=st.characters(
        whitelist_categories=("Lu", "Ll", "Nd", "Zs"), max_codepoint=0x7F
    ),
    max_size=400,
)


@given(texts, st.integers(min_value=1, max_value=50))
def test_chunks_preserve_all_tokens(text, window):
    toks = [t for t in text.split(" ") if t]
    chunks = token_window_chunks(text, window=window, stride=window)
    rejoined = [t for c in chunks for t in c.split(" ") if t]
    assert rejoined == toks


@given(texts, st.integers(min_value=1, max_value=50))
def test_chunk_count_formula(text, window):
    toks = [t for t in text.split(" ") if t]
    chunks = token_window_chunks(text, window=window, stride=window)
    expected = (len(toks) + window - 1) // window
    assert len(chunks) == expected


@given(st.lists(texts, max_size=8), st.integers(min_value=4, max_value=64))
def test_hash_embedder_unit_norm_and_deterministic(batch, dim):
    a = hash_embed_texts(batch, dim=dim)
    b = hash_embed_texts(batch, dim=dim)
    assert a == b
    for vec in a:
        n2 = sum(v * v for v in vec)
        assert n2 == 0 or abs(n2 - 1.0) < 1e-6


# ------------------------------------------------------------------
# Spark-backed: positional join ≡ key join on unique keys
# ------------------------------------------------------------------


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(st.integers(0, 1000), st.integers(-5, 5)),
        min_size=1,
        max_size=30,
        unique_by=lambda t: t[0],
    )
)
def test_positional_join_equals_key_join(spark, rows):
    from pdf_etl_ocr_inference_spark.operators.joins import positional_join

    df = spark.createDataFrame(rows, "k int, v int")
    left = df.select("k")
    right = df.select(F.col("k").alias("rk"), "v")
    out = positional_join(
        left,
        right,
        left_order=[F.col("k")],
        right_order=[F.col("rk")],
    )
    got = {(r["k"], r["v"]) for r in out.select("k", "v").collect()}
    assert got == set(rows)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.floats(-100, 100)),
        min_size=1,
        max_size=40,
    )
)
def test_salted_agg_equals_plain_agg(spark, rows):
    df = spark.createDataFrame(
        [(k, float(v)) for k, v in rows], "k int, v double"
    )
    plain = {
        (r["k"], r["n"], round(r["s"], 6))
        for r in df.groupBy("k")
        .agg(F.count("*").alias("n"), F.sum("v").alias("s"))
        .collect()
    }
    salted_partial = (
        df.withColumn("_salt", F.crc32(F.col("v").cast("string")) % 8)
        .groupBy("k", "_salt")
        .agg(F.count("*").alias("pn"), F.sum("v").alias("ps"))
    )
    salted = {
        (r["k"], r["n"], round(r["s"], 6))
        for r in salted_partial.groupBy("k")
        .agg(F.sum("pn").alias("n"), F.sum("ps").alias("s"))
        .collect()
    }
    assert salted == plain


@given(
    st.lists(
        st.integers(min_value=-(2**62), max_value=2**62),
        min_size=1,
        max_size=200,
        unique=True,
    ),
    st.integers(min_value=64, max_value=4096),
    st.integers(min_value=1, max_value=8),
)
def test_bloom_membership_has_no_false_negatives(members, m, k):
    """The file-skipping Bloom (layout._bloom_positions) must NEVER
    miss a present value — a false negative would silently drop rows
    from the pruned scan; false positives only cost an extra read."""
    import numpy as np

    from pdf_etl_ocr_inference_spark.operators.layout import (
        _bloom_positions,
    )

    vals = np.asarray(members, dtype="int64")
    bits = np.zeros(m, dtype=bool)
    bits[_bloom_positions(vals, k, m)] = True
    hit = bits[_bloom_positions(vals, k, m)].reshape(len(vals), k).all(axis=1)
    assert hit.all()


def test_bloom_positions_deterministic_across_calls():
    import numpy as np

    from pdf_etl_ocr_inference_spark.operators.layout import (
        _bloom_positions,
    )

    v = np.asarray([0, 1, -1, 2**62, -(2**62)], dtype="int64")
    a = _bloom_positions(v, 5, 1024)
    b = _bloom_positions(v.copy(), 5, 1024)
    assert (a == b).all()
    assert a.max() < 1024 and a.min() >= 0


@given(
    st.lists(
        st.lists(
            st.floats(
                min_value=-4.0, max_value=4.0,
                allow_nan=False, allow_infinity=False, width=32,
            ),
            min_size=8, max_size=8,
        ),
        min_size=1, max_size=20,
    ),
    st.integers(min_value=0, max_value=3),
)
@settings(max_examples=20, deadline=None)
def test_lsh_signature_spark_equals_python(spark, vecs, seed_off):
    """The r7 fixed-point LSH core: the Spark-plan signature and the
    driver-side Python signature must agree BIT-FOR-BIT on arbitrary
    float32 vectors — this is what makes driver-computed Hamming
    probes (and the DuckDB oracle replay) hit exactly the buckets the
    plan wrote.  floor(x·2^20) is exact for any IEEE double, so no
    magnitude regime should break it."""
    from pyspark.sql import types as T

    from pdf_etl_ocr_inference_spark.operators.similarity import (
        lsh_signature,
        signature_int,
    )

    seed = 42 + 1000 * seed_off
    schema = T.StructType(
        [
            T.StructField("i", T.IntegerType()),
            T.StructField("v", T.ArrayType(T.FloatType())),
        ]
    )
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)], schema
    )
    got = {
        r["i"]: r["sig"]
        for r in df.select(
            "i", lsh_signature("v", 8, 8, seed).alias("sig")
        ).collect()
    }
    import struct as _struct

    for i, v in enumerate(vecs):
        # replicate float32 storage: the plan reads float32 values
        v32 = [
            _struct.unpack("f", _struct.pack("f", x))[0] for x in v
        ]
        assert got[i] == signature_int(v32, 8, seed), (i, v)
