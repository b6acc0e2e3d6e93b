"""Machine-check of the temperature-mix float-threshold invariant.

Both mix entries (``train_temperature_mix`` over the raw corpus,
``pipeline_curated_mix`` over the dedup survivors) filter with
``rk <= budget * n^alpha / tot`` where rk is an integer rank — a
compare that is cross-engine stable ONLY while every quota sits a
safe distance from every achievable integer rank.  The docstrings
state a >=0.08 margin; this suite ENFORCES >=0.05 at every SF, so a
fixture regen or an alpha/budget change that lands a quota within
float error of an integer fails loudly here instead of as a silent
Spark-vs-DuckDB hash mismatch (ADVICE r9, operators/sampling.py).

Pure DuckDB + Python — no SparkSession, so the suite stays cheap and
the margin is computed from the same group counts the oracle SQL
sees.
"""

from __future__ import annotations

import duckdb
import pytest

from pdf_etl_ocr_inference_spark.plans.text_plans import (
    _TEMP_ALPHA,
    _TEMP_BUDGET,
)
from pdf_etl_ocr_inference_spark.plans.train_plans import (
    _CURATED_MIX_ALPHA,
    _CURATED_MIX_BUDGET,
)

SFS = ["sf0.001", "sf0.01", "sf0.1"]
MARGIN = 0.05


def _quota_margin(counts: dict[str, int], budget: int, alpha: float):
    """Min distance of any group's quota from its nearest ACHIEVABLE
    integer rank.  A quota saturated past the group count by >= the
    margin is safe regardless of its fractional part (no rank beyond
    the count exists to compare against)."""
    tot = sum(n**alpha for n in counts.values())
    worst = float("inf")
    quotas = {}
    for g, n in counts.items():
        q = budget * (n**alpha) / tot
        quotas[g] = q
        if q >= n + MARGIN:
            continue  # saturates with margin: every rank 1..n passes
        worst = min(worst, abs(q - round(q)))
    return worst, quotas


def _lang_counts(con) -> dict[str, int]:
    return dict(
        con.execute(
            "SELECT lang, COUNT(*) FROM documents GROUP BY lang"
        ).fetchall()
    )


@pytest.fixture(scope="module", params=SFS)
def con(request):
    c = duckdb.connect()
    c.execute(
        "CREATE VIEW documents AS SELECT * FROM read_parquet("
        f"'/root/testdata/{request.param}/documents.parquet')"
    )
    yield c
    c.close()


def test_raw_corpus_quota_margins(con):
    counts = _lang_counts(con)
    worst, quotas = _quota_margin(counts, _TEMP_BUDGET, _TEMP_ALPHA)
    assert worst > MARGIN, (
        f"train_temperature_mix quota within {MARGIN} of an integer "
        f"rank: {quotas}"
    )


def test_survivor_quota_margins(con):
    # Survivor set = corpus minus the rk>1 members of the quality-
    # ranked clusters — replayed with the SAME shared SQL fragment
    # the pipeline oracle splices, so this margin is computed over
    # exactly the counts the oracle's POWER quotas see.
    from pdf_etl_ocr_inference_spark.plans.dedup_plans import (
        _cc_quality_ranked_sql,
    )

    counts = dict(
        con.execute(
            f"""WITH RECURSIVE {_cc_quality_ranked_sql()}
            SELECT d.lang, COUNT(*) FROM documents d
            WHERE d.doc_id NOT IN (
              SELECT doc_id FROM ranked WHERE rk > 1)
            GROUP BY d.lang"""
        ).fetchall()
    )
    worst, quotas = _quota_margin(
        counts, _CURATED_MIX_BUDGET, _CURATED_MIX_ALPHA
    )
    assert worst > MARGIN, (
        f"pipeline_curated_mix quota within {MARGIN} of an integer "
        f"rank: {quotas}"
    )
