"""Deterministic distributed PCA over the embedding corpus.

Reference parity: the reference's vector workflow consumes embeddings
as-is; dimensionality reduction (PCA whitening / compression before
indexing, the OPQ rotation's unsupervised cousin) is a standard step
a training-data pipeline adds.  Same numeric doctrine as the
deterministic k-means (operators/clustering.py): float sums are
partition-order dependent, so every cross-partition aggregate here is
an INTEGER sum of fixed-point quantized values — bit-identical
results for any partitioning, and SQL-replayable for the oracle.

Quantization: q(x) = floor(x * 2^20) as int64.  floor (not round)
because float->double promotion, the double multiply, and floor are
all exactly specified IEEE/integer ops that Spark, DuckDB, and numpy
agree on bit-for-bit; round() differs in half-way tie rules across
engines.  The PCA is *of the quantized vectors* — a defined,
reproducible operator, with quantization error 2^-20 per component,
orders below embedding noise.

Scale shape: ONE narrow pass — each partition reduces to a single
(d + d*d + 1)-integer partial (component sums, Gram matrix, count)
via mapInPandas, the driver sums partials with arbitrary-precision
Python ints (no cross-partition overflow), eigendecomposes the d x d
covariance (numpy, deterministic, sign-canonicalized), and the
projection broadcasts the k x d component matrix back through an
Arrow-batched matmul.  Driver traffic is parts * d^2 int64 — at
d=64 and 10k partitions, ~300 MB of control data, independent of
corpus row count.  Within-partition Gram sums use Python ints too,
so there is no int64 overflow bound on partition size.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_SCALE = 1 << 20


def _quantize(mat):
    import numpy as np

    return np.floor(mat.astype(np.float64) * _SCALE).astype(object)


def gram_partials(df: DataFrame, vec_col: str) -> DataFrame:
    """Per-partition integer partials: one row per partition with
    (n, sums[d], gram[d*d] flattened row-major) of the quantized
    vectors.  Object-dtype (Python int) accumulation — exact at any
    partition size."""

    def run(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        n = 0
        sums = None
        gram = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.stack(pdf[vec_col].to_numpy())
            q = _quantize(mat)
            n += len(q)
            s = q.sum(axis=0)
            g = (q.T @ q)
            sums = s if sums is None else sums + s
            gram = g if gram is None else gram + g
        if n == 0:
            return
        from decimal import Decimal

        yield pd.DataFrame(
            {
                "n": [n],
                "sums": [[Decimal(int(v)) for v in sums]],
                "gram": [[Decimal(int(v)) for v in gram.ravel()]],
            }
        )

    schema = T.StructType(
        [
            T.StructField("n", T.LongType(), False),
            T.StructField("sums", T.ArrayType(T.DecimalType(38, 0)), False),
            T.StructField("gram", T.ArrayType(T.DecimalType(38, 0)), False),
        ]
    )
    return df.select(vec_col).mapInPandas(run, schema=schema)


def eigh_from_ints(n: int, sums: list, gram: list, k: int):
    """(comps k×d float64 sign-canonicalized, evals) from the EXACT
    integer Gram pass — the single shared eigh code path.  Both
    ``fit_pca`` (distributed partials) and the oracle generator
    (direct parquet replay, plans/pca_sql.py) call THIS function on
    identical integers, so the float covariance, numpy eigh, ordering
    and sign rules are bit-identical by construction."""
    import numpy as np

    d = len(sums)
    s = np.array(sums, dtype=np.float64)
    g = np.array(gram, dtype=np.float64).reshape(d, d)
    mean = s / n
    cov = g / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T  # k x d
    for row in comps:
        j = int(np.argmax(np.abs(row)))
        if row[j] < 0:
            row *= -1.0
    return comps, evals[order]


def _sum_partials(parts):
    """(n, sums ints, gram ints) from collected gram_partials rows —
    arbitrary-precision Python int accumulation."""
    n = sum(p["n"] for p in parts)
    d = len(parts[0]["sums"])
    sums = [0] * d
    gram = [0] * (d * d)
    for p in parts:
        for i, v in enumerate(p["sums"]):
            sums[i] += int(v)
        for i, v in enumerate(p["gram"]):
            gram[i] += int(v)
    return n, sums, gram


def fit_pca(df: DataFrame, vec_col: str, k: int):
    """Covariance of the quantized vectors -> top-k eigenvectors.
    Returns (components k x d float64, eigenvalues, mean).  Sign
    canonicalization: each component's largest-|value| entry is made
    positive (ties to the lowest index), so the decomposition is a
    pure function of the corpus."""
    import numpy as np

    parts = gram_partials(df, vec_col).collect()
    if not parts:
        raise ValueError("fit_pca: empty input")
    n, sums, gram = _sum_partials(parts)
    comps, evals = eigh_from_ints(n, sums, gram, k)
    # eigenvalues are variances of the q = x*2^20 scaled data; return
    # them in raw-embedding units (components are unit vectors either
    # way)
    mean = np.array(sums, dtype=np.float64) / n
    return comps, evals / float(_SCALE) ** 2, mean / _SCALE


def quantize_pca_model(n: int, sums: list, comps) -> tuple:
    """(cq k×d ints, mq d ints): the floor(comp·2^20) quantized
    rotation and the floor-div quantized mean — the shared literals
    of the native integer projection (:func:`project_pca_q`) and its
    SQL oracle.  floor of an IEEE double and integer floor-div are
    exactly specified, so engine and oracle agree bit-for-bit."""
    import math

    cq = [
        [int(math.floor(float(c) * _SCALE)) for c in row] for row in comps
    ]
    mq = [s // n for s in sums]  # Python // floors; SQL uses pmod form
    return cq, mq


def fit_pca_q(df: DataFrame, vec_col: str, k: int) -> tuple:
    """Distributed integer Gram pass → driver eigh → quantized model
    (cq, mq) ready for :func:`project_pca_q`."""
    parts = gram_partials(df, vec_col).collect()
    if not parts:
        raise ValueError("fit_pca_q: empty input")
    n, sums, gram = _sum_partials(parts)
    comps, _evals = eigh_from_ints(n, sums, gram, k)
    return quantize_pca_model(n, sums, comps)


def project_pca_q(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    cq: list,
    mq: list,
    out_prefix: str = "pc",
) -> DataFrame:
    """JVM-native EXACT-INTEGER PCA projection: xq_j = floor(x_j·2^20),
    residual r_j = xq_j − mq_j, P_i = Σ_j r_j·cq_ij (exact int64 —
    with |x| ≤ 1-ish and unit-vector components, |P| ≪ 2^53), then
    pc_i = P_i / 2^40 as ONE division of an exact integer (correctly
    rounded identically by Spark and DuckDB).  No Python in the data
    plane — this replaced the r1-r7 mapInPandas float matmul, and it
    is what made the entry oracle-able."""
    xq = F.transform(
        F.col(vec_col),
        lambda v: F.floor(v.cast("double") * F.lit(float(_SCALE))).cast(
            "long"
        ),
    )
    out = df.select(id_col, xq.alias("_xq"))
    cols = []
    for i, row in enumerate(cq):
        term = None
        for j, c in enumerate(row):
            t = (F.col("_xq")[j] - F.lit(int(mq[j]))) * F.lit(int(c))
            term = t if term is None else term + t
        cols.append(
            (term.cast("double") / F.lit(float(_SCALE) ** 2)).alias(
                f"{out_prefix}{i}"
            )
        )
    return out.select(id_col, *cols)


def project_pca(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    components,
    mean,
    round_to: int = 6,
) -> DataFrame:
    """(id, proj array<double>): Arrow-batched centered matmul onto
    the broadcast k x d component matrix.  Projections are rounded
    (they are float dot products — partition-order safe since each
    row's product is computed alone, but rounding keeps downstream
    consumers honest about precision)."""
    import numpy as np

    comps = np.asarray(components, dtype=np.float64)
    mu = np.asarray(mean, dtype=np.float64)

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            proj = np.round((mat - mu) @ comps.T, round_to)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "proj": [list(map(float, row)) for row in proj],
                }
            )

    schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField(
                "proj", T.ArrayType(T.DoubleType(), False), False
            ),
        ]
    )
    return df.select(id_col, vec_col).mapInPandas(run, schema=schema)


def gram_table(df: DataFrame, vec_col: str, dims: int) -> DataFrame:
    """Integer-exact upper-triangle Gram sums over the first ``dims``
    components as (i, j, s) rows — the ORACLED slice of the
    covariance pass (the full-dim path is the same integers; DuckDB
    replays this directly with floor/cast arithmetic)."""
    parts = gram_partials(
        df.withColumn(vec_col, F.slice(F.col(vec_col), 1, dims)), vec_col
    )
    exploded = parts.select(
        F.posexplode("gram").alias("pos", "s")
    ).select(
        (F.col("pos") / dims).cast("int").alias("i"),
        F.pmod("pos", F.lit(dims)).cast("int").alias("j"),
        "s",
    )
    return (
        exploded.filter(F.col("i") <= F.col("j"))
        .groupBy("i", "j")
        .agg(F.sum("s").cast("long").alias("s"))
    )
