"""Shared DuckDB fragment for the temperature-scaled mix fill.

Mirrors ``operators/sampling.temperature_mix`` (p ∝ n^alpha quotas
derived from the source's own group counts, md5 reproducible-shuffle
fill) — THE single SQL definition, consumed by the
``train_temperature_mix`` oracle (over the raw corpus) and the
``pipeline_curated_mix`` oracle (over the dedup survivors), so the
rule cannot drift between the standalone entry and the pipeline.
"""

from __future__ import annotations


def temperature_mix_sql(
    src: str, group: str, id_: str, budget: int, alpha: float
) -> str:
    """CTE chain ``c, w, r`` + final SELECT: selected (id, group)
    rows of ``src``.  Callers prefix ``WITH `` (or splice after their
    own CTEs with a trailing comma)."""
    return f"""c AS (
      SELECT {group}, COUNT(*) AS n FROM {src} GROUP BY {group}
    ), w AS (
      SELECT {group}, POWER(n, {alpha}) AS w,
             SUM(POWER(n, {alpha})) OVER () AS tot FROM c
    ), r AS (
      SELECT {id_}, {group}, ROW_NUMBER() OVER (
        PARTITION BY {group} ORDER BY MD5({id_}::VARCHAR)) AS rk
      FROM {src}
    )
    SELECT r.{id_}, r.{group} FROM r JOIN w USING ({group})
    WHERE r.rk <= {budget} * w.w / w.tot"""
