"""Trainable document-quality classifier: deterministic distributed
logistic regression over native text features.

The static heuristic filter (``functions.text.quality_score``) is a
fixed rule; production pretraining pipelines LEARN the filter from
labeled examples (fastText-style quality classifiers in the public
data-curation literature).  This is the distributed trainer for that
shape, built on the repo's deterministic-aggregation doctrine
(operators/clustering.py k-means, operators/pca.py):

- FEATURES are native Column expressions (no Python in the row path):
  log-length, alpha ratio, digit ratio, mean word length, stopword
  rate, uppercase ratio — computed once, cached for the training
  loop.
- Each gradient step is ONE narrow pass: every row's per-example
  gradient contribution (sigma(w.x) - y) * x is QUANTIZED to
  floor(g * 2^24) int64 and summed per partition (mapInPandas,
  Python-int accumulation -> no overflow), partials summed on the
  driver.  Integer sums are partition-order independent, so the
  learned weights are bit-identical for any layout of the corpus —
  asserted against a single-machine numpy replica in tests.
- The weight update runs on the driver in float64 (deterministic:
  same integer gradient -> same weights), fixed learning rate and
  iteration count.

Scale: per-iteration driver traffic is parts * (d+1) int64 — at 10k
partitions and d=6, negligible.  The loop is
iterations-many scans of the cached feature frame; features are a
handful of doubles per row, so the cache is ~50 bytes/row — 5 TB at
100 G rows, spillable, or recomputed from the scan when memory-tight.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_GSCALE = 1 << 24

_STOPWORDS = ["the", "and", "of", "to", "in", "a", "is", "that"]


def quality_features(text: Column) -> list[Column]:
    """Six native feature expressions (order is the weight order).
    Bounded ranges (ratios / log) keep the fixed-point gradient
    quantization well-conditioned."""
    n = F.length(text)
    safe_n = F.greatest(n, F.lit(1))
    ntok = F.size(F.split(F.trim(text), r"\s+"))
    safe_tok = F.greatest(ntok, F.lit(1))
    alpha = F.length(F.regexp_replace(text, r"[^a-zA-Z]", ""))
    digit = F.length(F.regexp_replace(text, r"[^0-9]", ""))
    upper = F.length(F.regexp_replace(text, r"[^A-Z]", ""))
    low = F.lower(text)
    stop_hits = sum(
        (
            F.size(F.split(low, rf"\b{w}\b")) - 1
            for w in _STOPWORDS
        ),
        F.lit(0),
    )
    return [
        F.log(safe_n.cast("double")) / F.lit(10.0),
        alpha / safe_n.cast("double"),
        digit / safe_n.cast("double"),
        ((n - ntok + 1) / safe_tok.cast("double")) / F.lit(12.0),
        stop_hits / safe_tok.cast("double"),
        upper / safe_n.cast("double"),
    ]


FEATURE_NAMES = [
    "log_len",
    "alpha_ratio",
    "digit_ratio",
    "mean_word_len",
    "stopword_rate",
    "upper_ratio",
]


def feature_frame(
    df: DataFrame, text_col: str, label_col: Column, id_col: str
) -> DataFrame:
    """(id, f0..f5, label) — all native expressions."""
    feats = quality_features(F.col(text_col))
    cols = [F.col(id_col)] + [
        f.alias(f"f{i}") for i, f in enumerate(feats)
    ] + [label_col.cast("double").alias("label")]
    return df.select(*cols)


def _grad_partials(feats: DataFrame, w, b: float, d: int) -> DataFrame:
    """One row per partition: quantized int64 gradient sums
    (d weights + bias) and the partition's example count + quantized
    log-loss sum."""
    import numpy as np

    wv = np.asarray(w, dtype=np.float64)
    bias = float(b)

    def run(batches: Iterator) -> Iterator:
        from decimal import Decimal

        import numpy as np
        import pandas as pd

        gsum = [0] * d
        gb = 0
        loss = 0
        n = 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = pdf[[f"f{i}" for i in range(d)]].to_numpy(
                dtype=np.float64
            )
            y = pdf["label"].to_numpy(dtype=np.float64)
            # LEFT-TO-RIGHT accumulation, one column at a time — NOT
            # x @ wv: BLAS dgemv's SIMD multi-accumulator reduction
            # order is unspecified, and the oracle's SQL z is parsed
            # strictly left-to-right (f0*w0 + ... + f5*w5 + b); a
            # differently-rounded z can flip floor(err*2^24) when the
            # product lands within an ulp of an integer.  d=6, so the
            # column loop costs nothing.
            z = x[:, 0] * wv[0]
            for _i in range(1, x.shape[1]):
                z = z + x[:, _i] * wv[_i]
            z = z + bias
            p = 1.0 / (1.0 + np.exp(-z))
            err = p - y
            g = np.floor(err[:, None] * x * _GSCALE).astype(np.int64)
            gbq = np.floor(err * _GSCALE).astype(np.int64)
            # per-example clipped log-loss, quantized for exact sums
            eps = 1e-12
            ll = -(
                y * np.log(np.maximum(p, eps))
                + (1 - y) * np.log(np.maximum(1 - p, eps))
            )
            lq = np.floor(ll * _GSCALE).astype(np.int64)
            gsum = [a + int(v) for a, v in zip(gsum, g.sum(axis=0))]
            gb += int(gbq.sum())
            loss += int(lq.sum())
            n += len(y)
        if n == 0:
            return
        yield pd.DataFrame(
            {
                "n": [n],
                "g": [[Decimal(v) for v in gsum]],
                "gb": [Decimal(gb)],
                "loss": [Decimal(loss)],
            }
        )

    schema = T.StructType(
        [
            T.StructField("n", T.LongType(), False),
            T.StructField("g", T.ArrayType(T.DecimalType(38, 0)), False),
            T.StructField("gb", T.DecimalType(38, 0), False),
            T.StructField("loss", T.DecimalType(38, 0), False),
        ]
    )
    return feats.mapInPandas(run, schema=schema)


def fit_quality_lr(
    feats: DataFrame,
    d: int = 6,
    iterations: int = 15,
    lr: float = 1.0,
):
    """Full-batch gradient descent; returns (weights, bias, history).
    ``feats`` is a feature_frame output — cache it before calling if
    it derives from an expensive scan."""
    import numpy as np

    w = np.zeros(d, dtype=np.float64)
    b = 0.0
    history = []
    for it in range(iterations):
        parts = _grad_partials(feats, w, b, d).collect()
        n = sum(p["n"] for p in parts)
        if n == 0:
            raise ValueError("fit_quality_lr: empty input")
        gi = [0] * d
        gb = 0
        loss = 0
        for p in parts:
            for i, v in enumerate(p["g"]):
                gi[i] += int(v)
            gb += int(p["gb"])
            loss += int(p["loss"])
        # exact int accumulation first (partition-order free), one
        # float conversion after
        g = np.array([float(v) for v in gi], dtype=np.float64)
        g = g / (_GSCALE * n)
        gbf = gb / (_GSCALE * n)
        lossf = loss / (_GSCALE * n)
        w = w - lr * g
        b = b - lr * gbf
        history.append(lossf)
    return w, b, history


def score_quality_lr(
    feats: DataFrame,
    w,
    b: float,
    id_col: str,
    round_to: int = 4,
    quantized: bool = False,
) -> DataFrame:
    """(id, p_good) — native-expression sigmoid over the learned
    weights; no Python in the scoring path, so the trained filter
    deploys as a plain Column predicate.

    ``quantized=True`` emits ``p_q4`` = floor(p·10⁴) as BIGINT
    instead: given bit-identical inputs, floor of the same float op
    sequence is engine-independent (no rounding-tie semantics), which
    is what lets the catalog entry carry a DuckDB oracle
    (plans/quality_lr_sql.py)."""
    z = F.lit(float(b))
    for i, wi in enumerate(w):
        z = z + F.lit(float(wi)) * F.col(f"f{i}")
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    if quantized:
        return feats.select(
            F.col(id_col),
            F.floor(p * F.lit(10000.0)).cast("long").alias("p_q4"),
        )
    return feats.select(
        F.col(id_col), F.round(p, round_to).alias("p_good")
    )
