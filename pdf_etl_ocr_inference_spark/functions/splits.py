"""Deterministic hash-based dataset splitting.

THE single definition of the train/eval split rule: md5 of the stable
id, first 4 hex digits, bucket mod 10, buckets 0-7 → 'train', 8-9 →
'eval'.  `op64_train_test_split` applies it and `train_split_leakage`
audits it — both import from here (and the SQL mirror below), so the
rule cannot drift between the splitter and its auditor.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TRAIN_BUCKETS = 8  # of 10


def hash_split(id_col: Column | str) -> Column:
    """'train' / 'eval' from a stable integer id — reproducible across
    engines, runs, and cluster sizes, unlike sample()'s
    partition-dependent RNG."""
    col = F.col(id_col) if isinstance(id_col, str) else id_col
    bucket = (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 4), 16, 10)
        .cast("long")
        % 10
    )
    return F.when(bucket < TRAIN_BUCKETS, "train").otherwise("eval")


def hash_split_sql(id_expr: str) -> str:
    """DuckDB mirror of :func:`hash_split` for oracle SQL."""
    return (
        "CASE WHEN "
        f"CAST(('0x' || SUBSTRING(MD5(CAST({id_expr} AS VARCHAR)), 1, 4)) "
        f"AS INTEGER) % 10 < {TRAIN_BUCKETS} "
        "THEN 'train' ELSE 'eval' END"
    )
