"""DuckDB-SQL generator replaying the quality-LR trainer.

``operators/quality_model.fit_quality_lr`` is deterministic by
construction: every gradient step sums floor(g·2^24)-quantized int64
per-example contributions (partition-order independent), and the
weight update is a fixed float op sequence on those exact sums.  That
makes the WHOLE 10-iteration training loop replayable as a CTE chain
— the k-means-chain pattern (clustering_plans.kmeans_chain_sql)
applied to gradient descent.  Every CTE is MATERIALIZED: w{k}
references both w{k-1} and g{k}, so an inlining planner would double
the expression tree per iteration (measured: 2× wall per added
iteration before the hint).

Transcendental note: the per-example sigmoid/log features run through
each engine's own libm (Java vs C), which can differ in the last ulp;
the floor(·2^24) quantization absorbs a 1-ulp input wobble unless the
product sits within ~2^-28 of an integer — odds ~1e-6 across the
whole fixture, and the correctness gate re-verifies every round.

Reduction-order note (r8): the trainer computes z with an EXPLICIT
left-to-right column loop (quality_model._grad_partials), not BLAS
dgemv, precisely so `_z_expr`'s left-to-right SQL parse is the same
float op sequence — dgemv's SIMD multi-accumulator order is
unspecified and was a second (never-observed) wobble channel beside
libm.
"""

from __future__ import annotations

_STOPWORDS = ["the", "and", "of", "to", "in", "a", "is", "that"]
_GS = float(1 << 24)  # gradient quantization scale (quality_model._GSCALE)


def features_sql(source: str = "documents") -> str:
    """CTE body computing (doc_id, f0..f5, label) exactly like
    ``quality_model.feature_frame`` over the documents table (weak
    labels: lang = 'en')."""
    ntok = "GREATEST(len(regexp_split_to_array(TRIM(text), '\\s+')), 1)"
    n = "GREATEST(LENGTH(text), 1)"
    stop_hits = " + ".join(
        f"(len(regexp_split_to_array(lower(text), '\\b{w}\\b')) - 1)"
        for w in _STOPWORDS
    )
    return (
        f"SELECT doc_id, "
        f"LN({n}::DOUBLE)/10.0 AS f0, "
        f"LENGTH(regexp_replace(text, '[^a-zA-Z]', '', 'g'))"
        f" / {n}::DOUBLE AS f1, "
        f"LENGTH(regexp_replace(text, '[^0-9]', '', 'g'))"
        f" / {n}::DOUBLE AS f2, "
        f"((LENGTH(text) - len(regexp_split_to_array(TRIM(text), '\\s+'))"
        f" + 1) / {ntok}::DOUBLE)/12.0 AS f3, "
        f"({stop_hits}) / {ntok}::DOUBLE AS f4, "
        f"LENGTH(regexp_replace(text, '[^A-Z]', '', 'g'))"
        f" / {n}::DOUBLE AS f5, "
        f"CAST(CAST(lang = 'en' AS INT) AS DOUBLE) AS label "
        f"FROM {source}"
    )


def _z_expr(wk: str, d: int) -> str:
    """z = x·w + b with the same left-to-right add order as the
    trainer's per-column accumulation."""
    terms = " + ".join(f"f.f{i} * {wk}.w{i}" for i in range(d))
    return f"({terms} + {wk}.b)"


def train_chain_ctes(
    iterations: int = 10, lr: float = 1.0, d: int = 6
) -> str:
    """CTE chain: feats, w0 (zeros), g1, w1, ..., g{T}, w{T} — w{T}
    holds the learned weights + bias as scalar columns."""
    parts = [f"feats AS MATERIALIZED ({features_sql()})"]
    zero_cols = ", ".join(f"0.0 AS w{i}" for i in range(d))
    parts.append(f"w0 AS MATERIALIZED (SELECT {zero_cols}, 0.0 AS b)")
    for k in range(1, iterations + 1):
        prev = f"w{k - 1}"
        z = _z_expr(prev, d)
        err = f"(1.0/(1.0 + EXP(-{z})) - f.label)"
        gcols = ", ".join(
            f"SUM(CAST(FLOOR({err} * f.f{i} * {_GS}) AS BIGINT)) AS g{i}"
            for i in range(d)
        )
        parts.append(
            f"g{k} AS MATERIALIZED (SELECT {gcols}, "
            f"SUM(CAST(FLOOR({err} * {_GS}) AS BIGINT)) AS gb, "
            f"COUNT(*) AS n FROM feats f, {prev})"
        )
        wcols = ", ".join(
            f"{prev}.w{i} - {lr} * (g{k}.g{i} / ({_GS} * g{k}.n)) AS w{i}"
            for i in range(d)
        )
        parts.append(
            f"w{k} AS MATERIALIZED (SELECT {wcols}, "
            f"{prev}.b - {lr} * (g{k}.gb / ({_GS} * g{k}.n)) AS b "
            f"FROM {prev}, g{k})"
        )
    return ", ".join(parts)


def lr_train_sql(iterations: int = 10, lr: float = 1.0, d: int = 6) -> str:
    """Oracle for ``text_quality_lr_train``: (feature, micro_weight)
    rows, weights exact floor(w·10⁶) ints (identical doubles on both
    sides ⇒ identical floor — no rounded-double hash hazard)."""
    names = [
        "log_len", "alpha_ratio", "digit_ratio",
        "mean_word_len", "stopword_rate", "upper_ratio",
    ]
    wt = f"w{iterations}"
    sels = [
        f"SELECT '{names[i]}' AS feature, "
        f"CAST(FLOOR(w{i} * 1000000.0) AS BIGINT) AS micro_weight "
        f"FROM {wt}"
        for i in range(d)
    ]
    sels.append(
        f"SELECT 'bias' AS feature, "
        f"CAST(FLOOR(b * 1000000.0) AS BIGINT) AS micro_weight FROM {wt}"
    )
    return (
        "WITH " + train_chain_ctes(iterations, lr, d) + " "
        + " UNION ALL ".join(sels)
    )


def lr_score_sql(iterations: int = 10, lr: float = 1.0, d: int = 6) -> str:
    """Oracle for ``text_quality_lr_score``: every doc's
    floor(sigmoid(z)·10⁴) under the trained weights.  NB the scorer
    (``score_quality_lr``) adds the BIAS FIRST (z = b + Σ wᵢfᵢ,
    left-to-right) while the trainer's numpy path adds it last —
    float addition is not associative, so the replay mirrors each
    order where it occurs."""
    wt = f"w{iterations}"
    terms = " + ".join(f"f.f{i} * {wt}.w{i}" for i in range(d))
    z = f"({wt}.b + {terms})"
    return (
        "WITH " + train_chain_ctes(iterations, lr, d) + " "
        f"SELECT f.doc_id, CAST(FLOOR((1.0/(1.0 + EXP(-{z}))) * 10000.0) "
        f"AS BIGINT) AS p_q4 FROM feats f, {wt}"
    )
