"""Product quantization (PQ) for embedding search (Jégou et al. 2011,
"Product quantization for nearest neighbor search" — public method).

The memory-bound scale path: a 64-float embedding (256 B) compresses
to M=8 one-byte codes (32×).  The ADC (asymmetric distance
computation) scan then reads ONLY the code column — at 100 TB of
embeddings the scan shrinks by the same 32×, and the exact re-rank
touches full vectors for just the top candidates.

Division of labor (deliberate):

- **training** (:func:`train_pq_codebooks`): driver-side numpy
  k-means per subspace on a hash-sampled, L2-normalized subset —
  codebooks are control data (M × K × dim/M floats), the standard PQ
  practice; cost is constant in corpus size.
- **encoding** (:func:`pq_encode`): Arrow-vectorized pandas UDF — one
  numpy distance matrix per subspace per batch.  Index-BUILD time
  (once per corpus), where vectorized Python beats 128 interpreted
  per-row aggregate expressions.
- **query** (:func:`topk_pq`): pure JVM — the query's M×K lookup
  table is embedded as a literal array-of-arrays and the approximate
  distance is a native ``transform``+``aggregate`` over the code
  array; top ``rerank`` candidates by ADC distance re-rank with exact
  cosine.  No Python in the per-query hot path.

Vectors are L2-normalized before encode/train, so squared L2 on unit
vectors is monotone with cosine (d² = 2 − 2·cos) and ADC ranking
agrees with the cosine ranking it approximates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pdf_etl_ocr_inference_spark.functions.vector import l2_norm
from pdf_etl_ocr_inference_spark.operators.similarity import topk_exact


def _normalize(vec):
    import numpy as np

    v = np.asarray(vec, dtype="float64")
    n = float(np.sqrt((v * v).sum()))
    return v / n if n > 0 else v


def _collect_sample(df, embedding_col, id_col, sample_mod, m):
    """Driver-side normalized sample matrix, SORTED by id so training
    is independent of partition layout (collect() row order is not
    deterministic).  Shared by PQ and OPQ training."""
    import numpy as np

    rows = (
        df.filter(F.col(id_col) % sample_mod == 0)
        .select(id_col, embedding_col)
        .collect()
    )
    rows.sort(key=lambda r: r[id_col])
    x = np.stack([_normalize(r[embedding_col]) for r in rows])
    if x.shape[1] % m:
        raise ValueError(f"dim {x.shape[1]} not divisible by m={m}")
    return x


def train_pq_codebooks(
    df: DataFrame,
    embedding_col: str,
    id_col: str,
    m: int = 8,
    k: int = 16,
    sample_mod: int = 4,
    iters: int = 10,
    seed: int = 42,
) -> list:
    """k-means codebooks per subspace, trained driver-side on the
    ``id % sample_mod == 0`` hash sample (deterministic; constant cost
    as the corpus grows).  Returns ``m`` lists of ``k`` centroids."""
    import numpy as np

    x = _collect_sample(df, embedding_col, id_col, sample_mod, m)
    rng = np.random.RandomState(seed)
    return _train_books(x, m, k, iters, rng)


def _train_books(x, m, k, iters, rng) -> list:
    """numpy k-means per subspace over a sample matrix (driver-side)."""
    import numpy as np

    sub = x.shape[1] // m
    books = []
    for j in range(m):
        xs = x[:, j * sub : (j + 1) * sub]
        # k-means++-ish init: distinct random sample rows
        cents = xs[rng.choice(len(xs), size=k, replace=False)].copy()
        for _ in range(iters):
            d2 = ((xs[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(k):
                mask = assign == c
                if mask.any():
                    cents[c] = xs[mask].mean(axis=0)
        books.append([[float(v) for v in c] for c in cents])
    return books


def _reconstruct(x, books) -> "object":
    """Quantize-then-decode: each subvector replaced by its nearest
    centroid — the reconstruction PQ's ADC distance is exact for."""
    import numpy as np

    m = len(books)
    sub = x.shape[1] // m
    y = np.empty_like(x)
    for j in range(m):
        xs = x[:, j * sub : (j + 1) * sub]
        cents = np.asarray(books[j], dtype="float64")
        d2 = ((xs[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        y[:, j * sub : (j + 1) * sub] = cents[d2.argmin(axis=1)]
    return y


def train_opq(
    df: DataFrame,
    embedding_col: str,
    id_col: str,
    m: int = 8,
    k: int = 16,
    sample_mod: int = 4,
    iters: int = 10,
    opq_iters: int = 5,
    seed: int = 42,
) -> tuple:
    """Optimized PQ (Ge et al. 2013, OPQ-NP): learn an orthonormal
    rotation R that minimizes quantization error before the subspace
    split, by alternating (a) codebook training in the rotated space
    with (b) the orthogonal-Procrustes solve R = U Vᵀ from
    SVD(Xᵀ·quantized(XR)).  Correlated/unbalanced dimensions get mixed
    across subspaces, which plain PQ's fixed split cannot do.

    Driver-side on the same hash sample as ``train_pq_codebooks``
    (control data, constant cost).  Returns ``(rotation, codebooks)``
    where ``rotation`` is a dim×dim list-of-lists; pass both to
    :func:`pq_encode` / :func:`topk_pq`.
    """
    import numpy as np

    x = _collect_sample(df, embedding_col, id_col, sample_mod, m)
    dim = x.shape[1]
    rng = np.random.RandomState(seed)
    r_mat = np.eye(dim)
    books = None
    for _ in range(opq_iters):
        xr = x @ r_mat
        books = _train_books(xr, m, k, iters, rng)
        y = _reconstruct(xr, books)
        u, _, vt = np.linalg.svd(x.T @ y)
        r_mat = u @ vt
    xr = x @ r_mat
    books = _train_books(xr, m, k, iters, rng)
    return [[float(v) for v in row] for row in r_mat], books


def pq_encode(
    df: DataFrame,
    embedding_col: str,
    codebooks: list,
    out_col: str = "pq_codes",
    rotation: list | None = None,
) -> DataFrame:
    """Append the M-byte PQ code array (Arrow-vectorized; build-time).
    ``rotation`` (from :func:`train_opq`) is applied after
    normalization, before the subspace split."""
    import numpy as np
    import pandas as pd

    m = len(codebooks)
    sub = len(codebooks[0][0])
    books = [np.asarray(b, dtype="float64") for b in codebooks]
    r_mat = None if rotation is None else np.asarray(rotation, dtype="float64")

    # NB: no type hints — under `from __future__ import annotations`
    # they are strings PySpark's hint resolver can't evaluate here
    @F.pandas_udf("array<int>")
    def encode(batch):
        mat = np.stack([_normalize(v) for v in batch])
        if r_mat is not None:
            mat = mat @ r_mat
        codes = np.empty((len(mat), m), dtype="int32")
        for j in range(m):
            xs = mat[:, j * sub : (j + 1) * sub]
            d2 = ((xs[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
            codes[:, j] = d2.argmin(axis=1)
        return pd.Series(list(codes))

    return df.withColumn(out_col, encode(embedding_col))


def adc_distance(
    codes_col: Column | str,
    query_vec: list,
    codebooks: list,
    rotation: list | None = None,
) -> Column:
    """Native ADC: Σⱼ lut[j][code_j], lut built driver-side from the
    (normalized, optionally rotated) query — squared L2 to each
    centroid per subspace."""
    import numpy as np

    q = _normalize(query_vec)
    if rotation is not None:
        q = q @ np.asarray(rotation, dtype="float64")
    return _adc_raw(codes_col, q, codebooks)


def _adc_raw(codes_col: Column | str, q, codebooks: list) -> Column:
    """ADC against an ALREADY-transformed query vector (no
    normalization applied here — IVF-PQ passes per-cell residuals)."""
    import numpy as np

    m = len(codebooks)
    sub = len(codebooks[0][0])
    lut = []
    for j in range(m):
        qs = q[j * sub : (j + 1) * sub]
        cents = np.asarray(codebooks[j], dtype="float64")
        lut.append(((cents - qs[None, :]) ** 2).sum(axis=1))
    lut_lit = F.array(
        *[F.array(*[F.lit(float(v)) for v in row]) for row in lut]
    )
    codes = F.col(codes_col) if isinstance(codes_col, str) else codes_col
    # let-bind the literal LUT via a 1-element array wrapper (it is
    # materialized once per row, not once per code element), then map
    # each (code, subspace-index) to its table cell and fold
    return F.transform(
        F.array(lut_lit),
        lambda t: F.aggregate(
            F.transform(codes, lambda c, j: t[j][c]),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
    )[0]


def topk_pq(
    encoded: DataFrame,
    embedding_col: str,
    query_vec: list,
    codebooks: list,
    k: int = 5,
    rerank: int = 50,
    id_col: str = "vec_id",
    codes_col: str = "pq_codes",
    rotation: list | None = None,
) -> DataFrame:
    """ADC scan over codes (native, 32×-smaller read) → top ``rerank``
    candidates by approximate distance → exact cosine top-k.  The
    exact re-rank uses ORIGINAL vectors, so the rotation only affects
    which candidates reach it."""
    cand = (
        encoded.select(
            id_col,
            embedding_col,
            adc_distance(
                codes_col, query_vec, codebooks, rotation=rotation
            ).alias("_adc"),
        )
        .orderBy(F.asc("_adc"), id_col)  # TakeOrderedAndProject
        .limit(rerank)
    )
    return topk_exact(cand, embedding_col, query_vec, k=k, id_col=id_col)


# ------------------------------------------------------------------ #
# IVF-PQ (IVFADC, Jégou et al. 2011 §IV): coarse cell quantizer +    #
# PQ over the RESIDUAL x − c(x).  Residuals concentrate around the   #
# origin regardless of which cell a vector lives in, so one shared   #
# residual codebook quantizes far more accurately than PQ on raw     #
# vectors at equal code size — this is the layout billion-scale      #
# ANN systems actually ship.                                         #
#                                                                    #
# Scale shape: the probe scans ONLY the n_probe cells' code columns  #
# (cell partition pruning + 32× column shrink compose); rerank       #
# touches full vectors for the top candidates only.                  #
# ------------------------------------------------------------------ #


def train_ivfpq_codebooks(
    df: DataFrame,
    embedding_col: str,
    id_col: str,
    centroids: list,
    m: int = 8,
    k: int = 16,
    sample_mod: int = 4,
    iters: int = 10,
    seed: int = 42,
) -> list:
    """Residual PQ codebooks: the hash sample is normalized, assigned
    to its nearest coarse centroid (by dot product, matching
    ``ivf_assign``), and the per-subspace k-means trains on
    ``x − c(x)``.  Driver-side control data, constant in corpus size."""
    import numpy as np

    x = _collect_sample(df, embedding_col, id_col, sample_mod, m)
    cents = np.asarray(centroids, dtype="float64")
    assign = (x @ cents.T).argmax(axis=1)
    resid = x - cents[assign]
    rng = np.random.RandomState(seed)
    return _train_books(resid, m, k, iters, rng)


def ivfpq_encode(
    assigned: DataFrame,
    embedding_col: str,
    centroids: list,
    codebooks: list,
    cell_col: str = "cell",
    out_col: str = "pq_codes",
) -> DataFrame:
    """Append residual PQ codes to an ``ivf_assign``-ed frame
    (Arrow-vectorized; build-time only)."""
    import numpy as np
    import pandas as pd

    m = len(codebooks)
    sub = len(codebooks[0][0])
    books = [np.asarray(b, dtype="float64") for b in codebooks]
    cents = np.asarray(centroids, dtype="float64")

    @F.pandas_udf("array<int>")
    def encode(emb, cell):
        mat = np.stack([_normalize(v) for v in emb])
        mat = mat - cents[cell.to_numpy(dtype="int64")]
        codes = np.empty((len(mat), m), dtype="int32")
        for j in range(m):
            xs = mat[:, j * sub : (j + 1) * sub]
            d2 = ((xs[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
            codes[:, j] = d2.argmin(axis=1)
        return pd.Series(list(codes))

    return assigned.withColumn(out_col, encode(embedding_col, cell_col))


def topk_ivfpq(
    encoded: DataFrame,
    embedding_col: str,
    query_vec: list,
    centroids: list,
    codebooks: list,
    k: int = 5,
    n_probe: int = 3,
    rerank: int = 50,
    id_col: str = "vec_id",
    cell_col: str = "cell",
    codes_col: str = "pq_codes",
) -> DataFrame:
    """IVFADC query: probe the ``n_probe`` best cells, each with its
    OWN residual LUT (the ADC target is ``q − c_cell``), union the
    per-cell candidate scans, keep the global top ``rerank`` by
    approximate distance, exact-cosine re-rank to top ``k``.

    Each per-cell branch is a cell-pruned code-column scan — written
    partitioned by cell, the probe reads n_probe partitions; the
    union is a no-shuffle concat and TakeOrderedAndProject bounds
    what reaches the exact re-rank."""
    import numpy as np

    q = _normalize(query_vec)
    order = sorted(
        range(len(centroids)),
        key=lambda ci: -float(
            np.dot(q, np.asarray(centroids[ci], dtype="float64"))
        ),
    )
    probes = order[:n_probe]
    branches = []
    for ci in probes:
        q_res = q - np.asarray(centroids[ci], dtype="float64")
        branches.append(
            encoded.filter(F.col(cell_col) == ci).select(
                id_col,
                embedding_col,
                _adc_raw(codes_col, q_res, codebooks).alias("_adc"),
            )
        )
    cand = branches[0]
    for b in branches[1:]:
        cand = cand.unionByName(b)
    cand = cand.orderBy(F.asc("_adc"), id_col).limit(rerank)
    return topk_exact(cand, embedding_col, query_vec, k=k, id_col=id_col)
