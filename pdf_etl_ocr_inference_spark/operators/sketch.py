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
