"""Vector scalar functions over ``array<float>`` embedding columns.

All native higher-order functions (``zip_with`` + ``aggregate``) —
JVM-side, no Python in the hot path (SURVEY.md OP-44 guidance).  The
accumulators are double-precision regardless of the float32 element
type, matching what DuckDB's list functions do.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def dot_product(a: Column | str, b: Column | str) -> Column:
    """Σ aᵢ·bᵢ via zip_with + aggregate (double accumulator)."""
    prods = F.zip_with(
        _c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double")
    )
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def l2_norm(a: Column | str) -> Column:
    """‖a‖₂."""
    return F.sqrt(
        F.aggregate(
            _c(a),
            F.lit(0.0),
            lambda acc, v: acc + v.cast("double") * v.cast("double"),
        )
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """cos(a,b) = a·b / (‖a‖‖b‖); null-safe on zero vectors."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom > 0, dot_product(a, b) / denom)


def make_cosine_to_query_udf(query_vec: list[float]):
    """Vectorized (Arrow/numpy) cosine-vs-fixed-query UDF — the
    pandas-UDF alternative to the native HOF formulation.

    The HOF version is JVM-side but *interpreted* per element; this
    one moves Arrow batches to numpy and computes a whole batch with
    one matrix-vector product.  Crossover favors numpy once
    dim × rows per batch is large (wide embeddings, big corpora);
    for small fixtures the JVM version wins on transfer overhead.
    Both are value-identical (proven against the same DuckDB oracle).
    """
    import numpy as np
    import pandas as pd

    q = np.asarray(query_vec, dtype="float64")
    qn = float(np.sqrt((q * q).sum()))

    # NB: no type hints — under `from __future__ import annotations`
    # they are strings PySpark's hint resolver can't evaluate here
    @F.pandas_udf("double")
    def cos_to_query(batch):
        m = np.stack([np.asarray(v, dtype="float64") for v in batch])
        norms = np.sqrt((m * m).sum(axis=1)) * qn
        dots = m @ q
        with_zero = np.where(norms > 0, dots / np.where(norms > 0, norms, 1.0), np.nan)
        return pd.Series(with_zero)

    return cos_to_query


def l2_distance(a: Column | str, b: Column | str) -> Column:
    """Euclidean distance (IVF / LSH bucketing metric)."""
    diffs = F.zip_with(
        _c(a), _c(b), lambda x, y: (x.cast("double") - y.cast("double")) ** 2
    )
    return F.sqrt(F.aggregate(diffs, F.lit(0.0), lambda acc, v: acc + v))
