"""Mergeable distinct-count sketches (KMV) and exact two-phase heavy
hitters — the bounded-state cardinality/frequency tools a 100 TB
profiling pass needs.

Reference parity note: the reference pipeline profiles corpus
cardinalities ad hoc with full GROUP BYs inside its notebooks; these
operators re-express that as bounded-communication primitives.

**KMV (k minimum values)** [Bar-Yossef et al. 2002]: keep the k
smallest values of a uniform hash of the DISTINCT elements; the kth
smallest, as a fraction u_k of the hash space, estimates distinct
count as (k-1)/u_k.  Properties engineered here:

- DETERMINISTIC and ENGINE-REPLAYABLE: the hash is the first 12 hex
  digits of md5 folded into a 48-bit integer — both Spark and DuckDB
  compute it with exact integer arithmetic, and the estimate uses
  only IEEE basic ops (*, /), which are correctly rounded in every
  IEEE-754 engine, so even the floating-point estimate matches
  bit-for-bit across engines.  (That is why it is md5, not
  xxhash64: xxhash64 has no DuckDB twin, which is what keeps the
  MinHash entries rows-only.)
- MERGEABLE: the k smallest hashes of A ∪ B are a subset of
  (k smallest of A) ∪ (k smallest of B), so unioning two sketches
  and re-taking the k smallest IS the sketch of the union — the
  incremental-stats path stores one tiny sketch per partition/day
  and merges on read, no re-scan.
- BOUNDED: sketch size is k rows regardless of corpus size; the
  build is one distinct-shuffle + TakeOrdered (per-partition heap,
  driver merge of k·parts rows).

**Heavy hitters, exact, without a full-key shuffle**: a full
``GROUP BY key HAVING count >= eps*N`` shuffles every distinct key —
at 100 TB with billions of distinct keys that is the dominant cost
even though the answer has at most 1/eps rows.  The two-phase
operator here:

1. local pass (mapInPandas, no shuffle): each partition emits the
   keys with LOCAL count >= eps * local_rows.  By averaging, any key
   with GLOBAL count >= eps*N must clear that bar in at least one
   partition, so the union of local candidates is a SUPERSET of the
   true heavy hitters — and each partition emits at most 1/eps keys,
   so the candidate set is bounded by parts/eps, independent of the
   corpus' distinct-key count.
2. exact pass: semi-join the corpus to the (broadcast) candidate
   set, then an exact GROUP BY over candidate rows only; filter to
   the global threshold.

The result is EXACT (keys and counts), which is what lets the
catalog entry be fully oracled against the naive SQL.

Honest local measurement (local[32], 4M rows / 2.4M distinct keys):
the naive JVM hash-aggregate WINS (1.8 s vs 3.7 s) — map-side combine
over a few million keys is cheap, and the two-phase pays a Python
scan.  The crossover is where the two-phase is designed to live: when
the distinct-key space is too large for executor hash maps /
shuffle-spills dominate (billions of keys at 100 TB), phase 1's
output stays bounded at parts/eps while the naive plan's shuffle
grows with the key space.  Use the naive aggregate until the key
cardinality hurts; this operator is the escape hatch, not the
default.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HEX = "0123456789abcdef"
_U48_SPACE = float(1 << 48)  # exactly representable in double


def md5_u48(col: Column) -> Column:
    """Fold the first 12 hex digits of ``md5(col)`` into a 48-bit
    BIGINT — a uniform value hash both Spark and DuckDB compute with
    exact integer arithmetic (see ``md5_u48_sql`` for the oracle
    twin)."""
    h = F.md5(col.cast("string"))
    v = F.lit(0).cast("long")
    for i in range(1, 13):
        digit = (F.instr(F.lit(_HEX), F.substring(h, i, 1)) - 1).cast(
            "long"
        )
        v = v * F.lit(16) + digit
    return v


def md5_u48_sql(expr: str) -> str:
    """DuckDB spelling of :func:`md5_u48` over SQL expression
    ``expr`` — digit-by-digit STRPOS fold, exact BIGINT."""
    out = "CAST(0 AS BIGINT)"
    for i in range(1, 13):
        digit = (
            f"(STRPOS('{_HEX}', SUBSTR(md5(CAST({expr} AS VARCHAR)),"
            f" {i}, 1)) - 1)"
        )
        out = f"({out} * 16 + {digit})"
    return out


# ------------------------------------------------------------------
# Portable HyperLogLog (Flajolet et al. 2007) on the md5_u48 hash —
# the engine-owned twin of Spark's datasketches hll_* built-ins.
# Registers are EXACT integers both engines replay (shift/mask/
# bit-length on the 48-bit hash); only the final estimate is float,
# and it is computed by ONE shared pure-Python function
# (hll_estimate) — the entry calls it driver-side over the collected
# register rows (bounded: ≤ m rows per group), the lazy oracle
# generator calls the SAME function over a DuckDB register replay
# and emits the result as literals (the graph_sql shared-kernel
# doctrine), so the estimate cannot drift between engines.
# ------------------------------------------------------------------

HLL_P = 10  # 2^10 = 1024 registers: ±~3.25% std error — measured
# ≤4.7% on every fixture SF, inside the entry's historical 5% floor.
# The fixture cardinalities (≤1500 < 2.5·m) all land in the
# linear-counting branch; the raw harmonic branch is unit-tested in
# pure Python (tests/test_sketch.py) since no fixture reaches it.
HLL_M = 1 << HLL_P
_HLL_WBITS = 48 - HLL_P  # bits of the hash left after the index


def hll_rho(h: Column) -> Column:
    """Rank of the first set bit of the hash's top ``_HLL_WBITS``
    bits (1-based; all-zero word → wbits+1) — exact integer ops:
    ``bit_length(w)`` spelled ``length(bin(w))``, identical in
    DuckDB (:func:`hll_registers_sql`)."""
    w = F.shiftright(h, HLL_P)
    return F.when(
        w > 0, F.lit(_HLL_WBITS + 1) - F.length(F.bin(w))
    ).otherwise(F.lit(_HLL_WBITS + 1))


def hll_register_index(h: Column) -> Column:
    return h.bitwiseAND(F.lit(HLL_M - 1))


def hll_registers_sql(expr: str) -> str:
    """DuckDB spelling of the (j, rho) register pair for hash
    expression ``expr`` — emit as ``SELECT {fragment}`` columns."""
    h = md5_u48_sql(expr)
    w = f"({h} >> {HLL_P})"
    rho = (
        f"CASE WHEN {w} > 0 THEN {_HLL_WBITS + 1} - LENGTH(BIN({w})) "
        f"ELSE {_HLL_WBITS + 1} END"
    )
    return f"({h} & {HLL_M - 1}) AS j, {rho} AS rho"


def hll_estimate(registers: dict) -> int:
    """Cardinality estimate from ``{j: max rho}`` — THE single
    estimator definition (entry driver-side AND oracle generator).
    The harmonic sum is computed in EXACT integer arithmetic
    (Σ 2^(wbits+1−rho) ≤ m·2^41 < 2^50) with one float division at
    the end; the linear-counting branch (V zero registers,
    E ≤ 2.5 m) uses CPython's libm log — deterministic because both
    sides call THIS function."""
    import math

    m = HLL_M
    scale = 1 << (_HLL_WBITS + 1)
    # each register contributes 2^-rho, scaled exact: scale >> rho
    # (rho ≤ wbits+1 ⇒ the smallest term is exactly 1)
    s = sum(scale >> rho for rho in registers.values())
    v = m - len(registers)
    s += v * scale
    alpha = 0.7213 / (1.0 + 1.079 / m)
    e = alpha * m * m * float(scale) / float(s)
    if v > 0 and e <= 2.5 * m:
        e = m * math.log(m / v)
    return int(round(e))


def kmv_sketch(df: DataFrame, col: str, k: int) -> DataFrame:
    """The KMV sketch of ``col``'s distinct values: the ``k``
    smallest 48-bit hashes, one column ``h``.  Distinct-shuffle on
    the hash (combinable), then TakeOrdered — never a global sort."""
    return (
        df.select(md5_u48(F.col(col)).alias("h"))
        .distinct()
        .orderBy("h")
        .limit(k)
    )


def kmv_merge(*sketches: DataFrame) -> DataFrame:
    """Sketch of the union of the sketched sets: union the sketches,
    re-take the k smallest (k = the smallest input size cap keeps the
    guarantee; callers pass same-k sketches)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionAll(s)
    # k is not carried on the DataFrame; caller re-limits.  Dedup is
    # required: the same value may appear in several sketches.
    return out.distinct()


def kmv_estimate(sketch: DataFrame, k: int) -> DataFrame:
    """One row ``(n_hashes, est_distinct)``.  If the sketch holds
    fewer than ``k`` hashes the count is EXACT (every distinct value
    is present); otherwise (k-1)/u_k with u_k = max(h)/2^48.  The
    expression uses only IEEE *, / → bit-identical across engines."""
    return sketch.agg(
        F.count(F.lit(1)).alias("n_hashes"),
        F.round(
            F.when(
                F.count(F.lit(1)) < k,
                F.count(F.lit(1)).cast("double"),
            ).otherwise(
                F.lit(float(k - 1))
                / (F.max("h").cast("double") / F.lit(_U48_SPACE))
            ),
            2,
        ).alias("est_distinct"),
    )


def heavy_hitters(
    df: DataFrame, key_col: str, eps: float
) -> DataFrame:
    """Exact keys (and exact counts) occurring in >= ``eps`` fraction
    of rows, computed WITHOUT shuffling the full key space: local
    candidate pass (bounded at 1/eps keys per partition) + exact
    count of candidate rows only.  Returns (key_col, n_rows),
    identical to the naive GROUP BY ... HAVING."""
    n_total = df.count()
    threshold = math.ceil(eps * n_total)

    def local_candidates(batches: Iterator) -> Iterator:
        import pandas as pd

        counts: dict = {}
        local_n = 0
        for pdf in batches:
            local_n += len(pdf)
            vc = pdf[key_col].value_counts()
            for key, c in vc.items():
                counts[key] = counts.get(key, 0) + int(c)
        bar = eps * local_n
        keys = [key for key, c in counts.items() if c >= bar]
        yield pd.DataFrame({key_col: keys})

    schema = df.select(key_col).schema
    cands = (
        df.select(key_col)
        .mapInPandas(local_candidates, schema=schema)
        .distinct()
    )
    return (
        df.join(F.broadcast(cands), on=key_col, how="leftsemi")
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .filter(F.col("n_rows") >= threshold)
    )
