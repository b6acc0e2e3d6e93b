"""BM25 ranked retrieval: exact parity with a pure-python reference
implementation, plus ranking-property checks.
"""

from __future__ import annotations

import math

import pytest

from pdf_etl_ocr_inference_spark.operators.search import B, K1, bm25_topk

DOCS = [
    (0, "spark join spark join spark"),              # high tf, short
    (1, "spark join"),                                # both terms, tiny
    (2, "spark alpha beta gamma delta epsilon zeta eta theta iota "
        "kappa lam mu nu xi omicron pi rho sigma tau"),  # 1 term, long
    (3, "unrelated words only here nothing matches at all"),
    (4, "join join join join join join join join"),   # one hot term
    (5, "spark vector join vector spark"),            # all three
]
TERMS = ["spark", "vector", "join"]


def _brute():
    toks = {i: t.split() for i, t in DOCS}
    n = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n
    df = {
        q: sum(1 for t in toks.values() if q in t) for q in TERMS
    }
    out = {}
    for i, t in toks.items():
        s = 0.0
        for q in TERMS:
            tf = t.count(q)
            if not tf:
                continue
            idf = math.log(1 + (n - df[q] + 0.5) / (df[q] + 0.5))
            s += idf * tf * (K1 + 1) / (
                tf + K1 * (1 - B + B * len(t) / avgdl)
            )
        if s > 0:
            out[i] = s
    return out


@pytest.fixture(scope="module")
def result(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    return bm25_topk(df, "text", "doc_id", TERMS, k=10).collect()


def test_scores_match_brute(result):
    brute = _brute()
    got = {r["id"]: r["score"] for r in result}
    assert set(got) == set(brute)  # doc 3 absent: no matching term
    for i, s in brute.items():
        assert got[i] == pytest.approx(round(s, 4), abs=1e-4)


def test_ranking_properties(result):
    order = [r["id"] for r in result]
    brute = _brute()
    assert order == sorted(brute, key=lambda i: (-round(brute[i], 6), i))
    # all-three-terms doc must outrank the single-rare-term long doc
    assert order.index(5) < order.index(2)


def test_topk_truncates(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    assert bm25_topk(df, "text", "doc_id", TERMS, k=2).count() == 2
