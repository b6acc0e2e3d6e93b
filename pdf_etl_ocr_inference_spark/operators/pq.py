"""Product quantization (PQ) for embedding search (Jégou et al. 2011,
"Product quantization for nearest neighbor search" — public method).

The memory-bound scale path: a 64-float embedding (256 B) compresses
to M=8 one-byte codes (32×).  The ADC (asymmetric distance
computation) scan then reads ONLY the code column — at 100 TB of
embeddings the scan shrinks by the same 32×, and the exact re-rank
touches full vectors for just the top candidates.

Division of labor (deliberate):

- **training** (:func:`train_pq_codebooks`): driver-side numpy
  k-means per subspace on a FIXED-SIZE id-keyed sample (the modulus
  is derived from a cheap distributed count so the collected row
  count is bounded by ~2·``PQ_TRAIN_TARGET`` at ANY corpus size —
  a fixed fraction would be a corpus-proportional driver collect);
  codebooks are control data (M × K × dim/M floats), the standard
  PQ practice.
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


# Training-sample size target.  The sample modulus is DERIVED from a
# corpus count (``max(1, n // PQ_TRAIN_TARGET)``), so the number of
# vectors collected to the driver is bounded by ~2·PQ_TRAIN_TARGET no
# matter how large the corpus grows (n // (n // t) < 2t for n ≥ t).
# A fixed fraction (the pre-r8 ``sample_mod=4``) would have been a
# corpus-proportional driver collect — 2.5×10⁸ vectors at 10⁹ rows.
PQ_TRAIN_TARGET = 2048


def derive_sample_mod(
    df: DataFrame, id_col: str, target: int = PQ_TRAIN_TARGET
) -> int:
    """Sample modulus for a ~``target``-vector id-keyed training
    sample: one cheap distributed ``count()`` (no data collected),
    then ``max(1, n // target)``.  Deterministic given the corpus;
    assumes roughly dense ids (TESTDATA's ``vec_id`` is 0..n−1).  The
    DuckDB oracles replay the same derivation as
    ``GREATEST(1, (SELECT COUNT(*) ...) // target)``."""
    return max(1, df.count() // target)


def _collect_sample(df, embedding_col, id_col, sample_mod, m):
    """Driver-side normalized sample matrix, SORTED by id so training
    is independent of partition layout (collect() row order is not
    deterministic).  Shared by PQ and OPQ training.
    ``sample_mod=None`` derives the fixed-size-sample modulus."""
    import numpy as np

    if sample_mod is None:
        sample_mod = derive_sample_mod(df, id_col)
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
    sample_mod: int | None = None,
    iters: int = 10,
    seed: int = 42,
) -> list:
    """k-means codebooks per subspace, trained driver-side on the
    ``id % sample_mod == 0`` id-keyed sample (deterministic; with the
    default derived modulus the collected sample is FIXED-SIZE —
    bounded by ~2·``PQ_TRAIN_TARGET`` vectors at any corpus size).
    Returns ``m`` lists of ``k`` centroids."""
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
    sample_mod: int | None = None,
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

    Driver-side on the same fixed-size id-keyed sample as
    ``train_pq_codebooks``.  Returns ``(rotation, codebooks)``
    where ``rotation`` is a dim×dim list-of-lists; pass both to
    :func:`pq_encode` / :func:`topk_pq`.
    """
    x = _collect_sample(df, embedding_col, id_col, sample_mod, m)
    r_mat, books = _train_opq_mat(x, m, k, iters, opq_iters, seed)
    return [[float(v) for v in row] for row in r_mat], books


def _train_opq_mat(x, m: int, k: int, iters: int, opq_iters: int, seed: int):
    """OPQ alternation over an ALREADY-collected sample matrix — the
    shared code path of :func:`train_opq` (Spark collect) and the
    lazy oracle generator (direct parquet replay, plans/opq_sql.py):
    identical float input ⇒ identical numpy SVD/k-means ⇒ identical
    rotation, the eigh_from_ints doctrine applied to OPQ."""
    import numpy as np

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
    return r_mat, books


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
    sample_mod: int | None = None,
    iters: int = 10,
    seed: int = 42,
) -> list:
    """Residual PQ codebooks: the fixed-size id-keyed sample is
    normalized, assigned to its nearest coarse centroid (by dot
    product, matching ``ivf_assign``), and the per-subspace k-means
    trains on ``x − c(x)``.  Driver-side control data, bounded
    collect (see ``derive_sample_mod``)."""
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


# ------------------------------------------------------------------ #
# Fixed-point PQ (r7): the ann_pq_topk path, engine-exact end to end #
# ------------------------------------------------------------------ #
#
# Every stage is integer arithmetic or a single correctly-rounded
# float op on engine-identical inputs, so DuckDB replays the WHOLE
# pipeline — codebook k-means included (plans/pq_sql.py):
#
# - quantize-normalize: xq = floor(x·2^20) (exact for any double);
#   norm = sqrt(Σ xq², exact int < 2^53 cast to double); coordinate
#   xn = floor(xq/norm · 2^17) — divide is correctly rounded on
#   identical inputs, ×2^17 is exact, floor is deterministic.
# - k-means: init = the first k id-ordered sample rows (deterministic,
#   no RNG); assignment argmin of exact-int squared L2 (ties → lowest
#   centroid index); update = floor-div integer means (empty clusters
#   keep their centroid).
# - encode/ADC: integer argmin per subspace; integer LUT distances.
#
# The float path above stays for OPQ/IVF-PQ (SVD rotations and
# residual training are deliberately rows-only).

PQ_COORD_SCALE = float(1 << 20)
PQ_NORM_SCALE = float(1 << 17)


def _quantize_normalize_py(vec) -> list[int]:
    import math

    xq = [math.floor(float(v) * PQ_COORD_SCALE) for v in vec]
    nsq = sum(v * v for v in xq)
    if nsq == 0:
        return [0] * len(xq)
    norm = math.sqrt(float(nsq))
    return [math.floor(float(v) / norm * PQ_NORM_SCALE) for v in xq]


def train_pq_codebooks_q(
    df: DataFrame,
    embedding_col: str,
    id_col: str,
    m: int = 8,
    k: int = 16,
    sample_mod: int | None = None,
    iters: int = 10,
) -> list:
    """Fixed-point PQ codebooks (integer centroids at the xn scale).
    Driver-side on the id-ordered fixed-size sample, like the float
    trainer — but exactly replayable in SQL."""
    if sample_mod is None:
        sample_mod = derive_sample_mod(df, id_col)
    rows = (
        df.filter(F.col(id_col) % sample_mod == 0)
        .select(id_col, embedding_col)
        .collect()
    )
    rows.sort(key=lambda r: r[id_col])
    x = [_quantize_normalize_py(r[embedding_col]) for r in rows]
    return _train_books_q(x, m, k, iters)


def _train_books_q(
    x: list, m: int, k: int, iters: int
) -> list:
    """Integer k-means per subspace over an already-quantized matrix
    (id-ordered rows).  First-k init, argmin ties to the lowest
    centroid index, floor-div means, empty clusters keep their
    centroid — each rule chosen to be SQL-replayable."""
    import numpy as np

    if not x or len(x[0]) % m:
        raise ValueError("bad sample / dim not divisible by m")
    X = np.asarray(x, dtype=np.int64)
    sub = X.shape[1] // m
    books = []
    for j in range(m):
        xs = X[:, j * sub : (j + 1) * sub]
        cents = xs[: min(k, len(xs))].copy()  # first-k id-ordered init
        for _ in range(iters):
            # exact int64 throughout: |vals| ≤ 2·2^17 ⇒ d2 ≤ ~2^38
            diff = xs[:, None, :] - cents[None, :, :]
            d2 = (diff * diff).sum(axis=2)
            assign = d2.argmin(axis=1)  # first min = lowest index
            for ci in range(len(cents)):
                mask = assign == ci
                if mask.any():
                    ssum = xs[mask].sum(axis=0)
                    n = int(mask.sum())
                    # np.floor_divide floors like Python //
                    cents[ci] = np.floor_divide(ssum, n)
        books.append([[int(v) for v in c] for c in cents])
    return books


def pq_encode_q(
    df: DataFrame,
    embedding_col: str,
    codebooks_q: list,
    out_col: str = "pq_codes",
) -> DataFrame:
    """Arrow-vectorized encode against integer codebooks — the same
    quantize-normalize arithmetic, numpy int64 (exact)."""
    import numpy as np
    import pandas as pd

    m = len(codebooks_q)
    sub = len(codebooks_q[0][0])
    books = [np.asarray(b, dtype="int64") for b in codebooks_q]

    def _qn(vec) -> "object":
        import numpy as np

        xq = np.floor(
            np.asarray(vec, dtype="float64") * PQ_COORD_SCALE
        ).astype("int64")
        nsq = int((xq * xq).sum())
        if nsq == 0:
            return np.zeros(len(xq), dtype="int64")
        norm = float(np.sqrt(float(nsq)))
        return np.floor(
            xq.astype("float64") / norm * PQ_NORM_SCALE
        ).astype("int64")

    @F.pandas_udf("array<int>")
    def encode(batch):
        mat = np.stack([_qn(v) for v in batch])
        codes = np.empty((len(mat), m), dtype="int32")
        for j in range(m):
            xs = mat[:, j * sub : (j + 1) * sub]
            d2 = ((xs[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
            codes[:, j] = d2.argmin(axis=1)  # first min = lowest index
        return pd.Series(list(codes))

    return df.withColumn(out_col, encode(embedding_col))


def adc_distance_q(
    codes_col: Column | str, query_vec: list, codebooks_q: list
) -> Column:
    """Integer ADC: Σⱼ lut[j][code_j] with an exact-int LUT from the
    quantize-normalized query."""
    return adc_from_ints_q(
        codes_col, _quantize_normalize_py(query_vec), codebooks_q
    )


def adc_from_ints_q(
    codes_col: Column | str, q: list, codebooks_q: list
) -> Column:
    """Integer ADC against an ALREADY-quantized (and possibly
    rotated) integer query vector ``q``."""
    m = len(codebooks_q)
    sub = len(codebooks_q[0][0])
    lut = []
    for j in range(m):
        qs = q[j * sub : (j + 1) * sub]
        lut.append(
            [
                sum((a - b) * (a - b) for a, b in zip(qs, c))
                for c in codebooks_q[j]
            ]
        )
    lut_lit = F.array(
        *[
            F.array(*[F.lit(int(v)).cast("long") for v in row])
            for row in lut
        ]
    )
    codes = F.col(codes_col) if isinstance(codes_col, str) else codes_col
    return F.transform(
        F.array(lut_lit),
        lambda t: F.aggregate(
            F.transform(codes, lambda c, j: t[j][c]),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        ),
    )[0]


def topk_pq_q(
    encoded: DataFrame,
    embedding_col: str,
    query_vec: list,
    codebooks_q: list,
    k: int = 5,
    rerank: int = 50,
    id_col: str = "vec_id",
    codes_col: str = "pq_codes",
) -> DataFrame:
    """Fixed-point ADC scan → top ``rerank`` by exact-int distance
    (id tie-break) → exact cosine top-k."""
    cand = (
        encoded.select(
            id_col,
            embedding_col,
            adc_distance_q(codes_col, query_vec, codebooks_q).alias(
                "_adc"
            ),
        )
        .orderBy(F.asc("_adc"), id_col)
        .limit(rerank)
    )
    return topk_exact(cand, embedding_col, query_vec, k=k, id_col=id_col)


# ------------------------------------------------------------------ #
# Fixed-point OPQ (r8): float SVD rotation learned driver-side (the  #
# genuinely non-SQL step, shared with the oracle generator via       #
# _train_opq_mat), then an ALL-INTEGER data plane — quantized        #
# rotation applied to xn vectors, floor-div rescale, integer         #
# k-means codebooks, integer ADC.  DuckDB replays everything after   #
# the SVD from the quantized-rotation literals (plans/opq_sql.py),   #
# which is what moved ann_opq_topk from rows-only to oracled.        #
#                                                                    #
# Scales: xn at 2^17 (PQ_NORM_SCALE); Rq = floor(R*2^20), |Rq| ≤     #
# 2^20 (orthonormal R); rx_j = Σ_i xn_i*Rq_ij ≤ 64*2^18*2^20 = 2^44  #
# (exact int64); rxs = floor-div(rx, 2^20) back at the xn scale so   #
# the k-means/ADC integers reuse plain PQ's bounds.                  #
# ------------------------------------------------------------------ #


def quantize_rotation(r_mat) -> list:
    """floor(R·2^20) integer rotation (exact floor of IEEE doubles —
    identical in numpy, Python, and SQL literals)."""
    import math

    return [
        [int(math.floor(float(v) * PQ_COORD_SCALE)) for v in row]
        for row in r_mat
    ]


def _rotate_xn_py(xn: list, rq: list) -> list:
    """Integer rotate-and-rescale: rxs_j = (Σ_i xn_i·rq_ij) // 2^20
    (Python // floors; the SQL twin uses the nonneg-mod form)."""
    scale = int(PQ_COORD_SCALE)
    dim = len(xn)
    return [
        sum(xn[i] * rq[i][j] for i in range(dim)) // scale
        for j in range(dim)
    ]


def train_opq_q(
    df: DataFrame,
    embedding_col: str,
    id_col: str,
    m: int = 8,
    k: int = 16,
    sample_mod: int | None = None,
    iters: int = 10,
    opq_iters: int = 5,
    seed: int = 42,
) -> tuple:
    """(rq, books_q): float OPQ rotation from the id-ordered
    fixed-size sample (driver SVD, :func:`_train_opq_mat`), quantized
    to integers, plus integer codebooks trained on the ROTATED
    quantized sample — fully SQL-replayable given the rq literals."""
    import numpy as np

    if sample_mod is None:
        sample_mod = derive_sample_mod(df, id_col)
    rows = (
        df.filter(F.col(id_col) % sample_mod == 0)
        .select(id_col, embedding_col)
        .collect()
    )
    rows.sort(key=lambda r: r[id_col])
    x = np.stack([_normalize(r[embedding_col]) for r in rows])
    if x.shape[1] % m:
        raise ValueError(f"dim {x.shape[1]} not divisible by m={m}")
    r_mat, _books_f = _train_opq_mat(x, m, k, iters, opq_iters, seed)
    rq = quantize_rotation(r_mat)
    rxs = [
        _rotate_xn_py(_quantize_normalize_py(r[embedding_col]), rq)
        for r in rows
    ]
    return rq, _train_books_q(rxs, m, k, iters)


def opq_encode_q(
    df: DataFrame,
    embedding_col: str,
    rq: list,
    codebooks_q: list,
    out_col: str = "pq_codes",
) -> DataFrame:
    """Arrow-vectorized encode in the rotated integer space — exact
    int64 numpy throughout (same arithmetic as ``_rotate_xn_py``)."""
    import numpy as np
    import pandas as pd

    m = len(codebooks_q)
    sub = len(codebooks_q[0][0])
    books = [np.asarray(b, dtype="int64") for b in codebooks_q]
    rq_mat = np.asarray(rq, dtype="int64")
    scale = int(PQ_COORD_SCALE)

    def _qn(vec):
        xq = np.floor(
            np.asarray(vec, dtype="float64") * PQ_COORD_SCALE
        ).astype("int64")
        nsq = int((xq * xq).sum())
        if nsq == 0:
            return np.zeros(len(xq), dtype="int64")
        norm = float(np.sqrt(float(nsq)))
        return np.floor(
            xq.astype("float64") / norm * PQ_NORM_SCALE
        ).astype("int64")

    @F.pandas_udf("array<int>")
    def encode(batch):
        xn = np.stack([_qn(v) for v in batch])
        # exact int64: |xn| ≤ 2^18, |rq| ≤ 2^20, d=64 → |rx| ≤ 2^44
        rxs = np.floor_divide(xn @ rq_mat, scale)
        codes = np.empty((len(rxs), m), dtype="int32")
        for j in range(m):
            xs = rxs[:, j * sub : (j + 1) * sub]
            d2 = ((xs[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
            codes[:, j] = d2.argmin(axis=1)  # first min = lowest index
        return pd.Series(list(codes))

    return df.withColumn(out_col, encode(embedding_col))


def topk_opq_q(
    encoded: DataFrame,
    embedding_col: str,
    query_vec: list,
    rq: list,
    codebooks_q: list,
    k: int = 5,
    rerank: int = 50,
    id_col: str = "vec_id",
    codes_col: str = "pq_codes",
) -> DataFrame:
    """Rotated fixed-point ADC scan → top ``rerank`` by exact-int
    distance (id tie-break) → exact cosine top-k on ORIGINAL
    vectors."""
    q_rxs = _rotate_xn_py(_quantize_normalize_py(query_vec), rq)
    cand = (
        encoded.select(
            id_col,
            embedding_col,
            adc_from_ints_q(codes_col, q_rxs, codebooks_q).alias("_adc"),
        )
        .orderBy(F.asc("_adc"), id_col)
        .limit(rerank)
    )
    return topk_exact(cand, embedding_col, query_vec, k=k, id_col=id_col)


# ------------------------------------------------------------------ #
# Fixed-point IVF-PQ (r7): coarse cells + residual codebooks, all    #
# integer — the ann_ivfpq_topk path, SQL-replayable like plain PQ.   #
# ------------------------------------------------------------------ #


def xn_frame(
    df: DataFrame, embedding_col: str, out_col: str = "_xn"
) -> DataFrame:
    """Append the quantize-normalized integer vector as a COLUMN
    (materialized once per row — the per-element lambda must not
    re-evaluate the norm aggregate per element)."""
    xq = F.transform(
        F.col(embedding_col),
        lambda v: F.floor(v.cast("double") * F.lit(PQ_COORD_SCALE)).cast(
            "long"
        ),
    )
    out = df.withColumn("_xq", xq).withColumn(
        "_nsq",
        F.aggregate(
            "_xq", F.lit(0).cast("long"), lambda acc, v: acc + v * v
        ),
    )
    xn = F.when(
        F.col("_nsq") == 0,
        F.transform("_xq", lambda v: F.lit(0).cast("long")),
    ).otherwise(
        F.transform(
            "_xq",
            lambda v: F.floor(
                v.cast("double")
                / F.sqrt(F.col("_nsq").cast("double"))
                * F.lit(PQ_NORM_SCALE)
            ).cast("long"),
        )
    )
    return out.withColumn(out_col, xn).drop("_xq", "_nsq")


def ivfpq_coarse_kmeans_q(
    df: DataFrame,
    embedding_col: str,
    id_col: str = "vec_id",
    n_cells: int = 10,
    iters: int = 10,
    sample_mod: int | None = None,
) -> dict[int, list[int]]:
    """Coarse cells LEARNED by whole-vector integer k-means over the
    fixed-size sample (m=1 run of ``_train_books_q``) — real Voronoi
    cells in the xn space.  r8 replaced the label-mean coarse
    quantizer with this: label means of near-isotropic embeddings are
    noise-scale vectors, so the dot-product probe ranked cells
    essentially at random and recall collapsed (measured 0.0 at
    sf0.1); learned centroids lie in data directions and the same
    3-of-10 probe measures 0.8–1.0 across all three SFs.
    SQL-replayable via the pq_sql k-means chain run at m=1."""
    if sample_mod is None:
        sample_mod = derive_sample_mod(df, id_col)
    rows = (
        df.filter(F.col(id_col) % sample_mod == 0)
        .select(id_col, embedding_col)
        .collect()
    )
    rows.sort(key=lambda r: r[id_col])
    xn = [_quantize_normalize_py(r[embedding_col]) for r in rows]
    coarse = _train_books_q(xn, 1, n_cells, iters)[0]
    return {i: [int(v) for v in c] for i, c in enumerate(coarse)}


def train_ivfpq_codebooks_q(
    df: DataFrame,
    embedding_col: str,
    id_col: str,
    centroids_q: dict,
    m: int = 8,
    k: int = 16,
    sample_mod: int | None = None,
    iters: int = 10,
) -> list:
    """Residual codebooks, fixed-point: the id-ordered fixed-size
    sample's xn vectors, assigned by exact-int dot (ties → smallest
    label), residual = xn − c(xn), integer k-means."""
    if sample_mod is None:
        sample_mod = derive_sample_mod(df, id_col)
    rows = (
        df.filter(F.col(id_col) % sample_mod == 0)
        .select(id_col, embedding_col)
        .collect()
    )
    rows.sort(key=lambda r: r[id_col])
    import numpy as np

    labels = sorted(centroids_q)
    cmat = np.asarray([centroids_q[lbl] for lbl in labels], dtype=np.int64)
    xn = np.asarray(
        [_quantize_normalize_py(r[embedding_col]) for r in rows],
        dtype=np.int64,
    )
    # exact int dots; argmax first occurrence = smallest label
    assign = (xn @ cmat.T).argmax(axis=1)
    resid = xn - cmat[assign]
    return _train_books_q([list(map(int, r)) for r in resid], m, k, iters)


def ivfpq_assign_q(
    df: DataFrame,
    embedding_col: str,
    centroids_q: dict,
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, embedding, _xn, cell): nearest coarse cell by exact int64
    dot over the materialized xn column; ties → smallest label."""
    labels = sorted(centroids_q)
    with_xn = xn_frame(df, embedding_col)
    dots = F.array(
        *[
            F.aggregate(
                F.zip_with(
                    "_xn",
                    F.array(
                        *[
                            F.lit(int(v)).cast("long")
                            for v in centroids_q[lbl]
                        ]
                    ),
                    lambda x, c: x * c,
                ),
                F.lit(0).cast("long"),
                lambda acc, v: acc + v,
            )
            for lbl in labels
        ]
    )
    label_arr = F.array(*[F.lit(int(lbl)) for lbl in labels])
    return with_xn.select(
        F.col(id_col),
        F.col(embedding_col),
        "_xn",
        F.element_at(
            label_arr, F.array_position(dots, F.array_max(dots)).cast("int")
        ).alias("cell"),
    )


def ivfpq_encode_q(
    assigned: DataFrame,
    centroids_q: dict,
    books_q: list,
    out_col: str = "pq_codes",
    xn_col: str = "_xn",
    cell_col: str = "cell",
) -> DataFrame:
    """Residual codes (Arrow-vectorized, exact numpy int64)."""
    import numpy as np
    import pandas as pd

    m = len(books_q)
    sub = len(books_q[0][0])
    books = [np.asarray(b, dtype="int64") for b in books_q]
    cents = {
        int(lbl): np.asarray(v, dtype="int64")
        for lbl, v in centroids_q.items()
    }

    @F.pandas_udf("array<int>")
    def encode(xns, cells):
        out = []
        for xn, cell in zip(xns, cells):
            r = np.asarray(xn, dtype="int64") - cents[int(cell)]
            codes = np.empty(m, dtype="int32")
            for j in range(m):
                rs = r[j * sub : (j + 1) * sub]
                d2 = ((books[j] - rs[None, :]) ** 2).sum(axis=1)
                codes[j] = int(d2.argmin())
            out.append(codes)
        return pd.Series(out)

    return assigned.withColumn(out_col, encode(xn_col, cell_col))


def topk_ivfpq_q(
    encoded: DataFrame,
    embedding_col: str,
    query_vec: list,
    centroids_q: dict,
    books_q: list,
    k: int = 5,
    n_probe: int = 3,
    rerank: int = 50,
    id_col: str = "vec_id",
    codes_col: str = "pq_codes",
    cell_col: str = "cell",
) -> DataFrame:
    """Probe the best cells by exact int dot, per-cell integer
    residual LUT, ADC over the probed cells only, exact cosine
    re-rank."""
    qn = _quantize_normalize_py(query_vec)
    qdot = {
        lbl: sum(a * b for a, b in zip(qn, c))
        for lbl, c in centroids_q.items()
    }
    probe = sorted(centroids_q, key=lambda lbl: (-qdot[lbl], lbl))[
        :n_probe
    ]
    m = len(books_q)
    sub = len(books_q[0][0])
    branches = []
    for lbl in probe:
        qr = [a - b for a, b in zip(qn, centroids_q[lbl])]
        lut = [
            [
                sum(
                    (a - b) * (a - b)
                    for a, b in zip(qr[j * sub : (j + 1) * sub], c)
                )
                for c in books_q[j]
            ]
            for j in range(m)
        ]
        lut_lit = F.array(
            *[
                F.array(*[F.lit(int(v)).cast("long") for v in row])
                for row in lut
            ]
        )
        codes = F.col(codes_col)
        dist = F.transform(
            F.array(lut_lit),
            lambda t: F.aggregate(
                F.transform(codes, lambda c, j: t[j][c]),
                F.lit(0).cast("long"),
                lambda acc, v: acc + v,
            ),
        )[0]
        branches.append(F.when(F.col(cell_col) == int(lbl), dist))
    # unmatched whens are NULL; the cell filter below guarantees one hits
    adc_by_cell = F.coalesce(*branches)
    cand = (
        encoded.filter(F.col(cell_col).isin([int(v) for v in probe]))
        .select(id_col, embedding_col, adc_by_cell.alias("_adc"))
        .orderBy(F.asc("_adc"), id_col)
        .limit(rerank)
    )
    return topk_exact(cand, embedding_col, query_vec, k=k, id_col=id_col)
