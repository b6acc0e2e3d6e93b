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


def test_hybrid_rrf_fuses_and_ranks(spark):
    """RRF parity with a python replica: leg ranks, missing-leg docs,
    fusion ordering."""
    from pdf_etl_ocr_inference_spark.operators.search import (
        bm25_scores,
        hybrid_rrf,
    )

    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    lex = bm25_scores(docs, "text", "doc_id", TERMS)
    # synthetic vector leg: doc 3 (lexically absent) is the best
    # vector hit; doc 0 missing from the vector leg entirely
    vec = spark.createDataFrame(
        [(3, 0.99), (5, 0.80), (1, 0.60), (2, 0.40), (4, 0.20)],
        ["id", "_score"],
    )
    out = hybrid_rrf(lex, vec, k_each=4, k_out=10).collect()
    got = {r["id"]: (r["lex_rank"], r["vec_rank"], r["rrf"]) for r in out}

    brute_lex = _brute()
    lex_order = sorted(brute_lex, key=lambda i: (-round(brute_lex[i], 6), i))[:4]
    vec_order = [3, 5, 1, 2]
    exp = {}
    for i in set(lex_order) | set(vec_order):
        lr = lex_order.index(i) + 1 if i in lex_order else None
        vr = vec_order.index(i) + 1 if i in vec_order else None
        rrf = (1 / (60 + lr) if lr else 0) + (1 / (60 + vr) if vr else 0)
        exp[i] = (lr, vr, round(rrf, 6))
    assert got == exp
    # doc 3 fused in purely via the vector leg
    assert got[3][0] is None and got[3][1] == 1


def test_rerank_pipeline_reorders_and_bounds_python(spark):
    """The rerank stage must (a) reproduce the stub scorer exactly,
    (b) be able to REORDER the BM25 candidate list, (c) never score
    docs outside the candidate cut."""
    from pdf_etl_ocr_inference_spark.operators.search import (
        rerank_topk,
        stub_cross_score,
    )

    rows = DOCS + [
        # BM25-weak but rerank-strong: short, term-dense
        (10, "spark join"),
        # BM25-matched but outside a k=3 candidate cut
        (11, "spark alpha beta gamma delta epsilon zeta eta theta "
             "iota kappa lam mu nu xi omicron pi rho sigma tau "
             "upsilon phi chi psi omega aa bb cc dd ee ff gg hh"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = rerank_topk(
        df, "text", "doc_id", TERMS, candidates_k=3, k=3
    ).collect()
    texts = {i: t for i, t in rows}
    for r in out:
        exp = stub_cross_score(TERMS, [texts[r["id"]]])[0]
        assert r["score"] == pytest.approx(round(exp, 4), abs=1e-4)
    # candidate cut is 3: at most 3 docs scored, each with bm25_rank <= 3
    assert all(r["bm25_rank"] <= 3 for r in out)


def test_postings_index_serves_and_refreshes(spark, tmp_path):
    """Indexed BM25 == batch BM25; refresh folds a batch (stats AND
    postings) and the version guard makes redelivery a no-op."""
    from pdf_etl_ocr_inference_spark.operators.search import (
        bm25_topk_indexed,
        build_postings_index,
        refresh_postings_index,
    )

    base = spark.createDataFrame(DOCS, ["doc_id", "text"])
    batch = spark.createDataFrame(
        [(50, "spark vector spark vector join"),
         (51, "nothing relevant here at all")],
        ["doc_id", "text"],
    )
    path = str(tmp_path / "postings")
    build_postings_index(spark, base, path)
    served = bm25_topk_indexed(spark, path, TERMS, k=10).collect()
    batch_ref = bm25_topk(base, "text", "doc_id", TERMS, k=10).collect()
    assert [tuple(r) for r in served] == [tuple(r) for r in batch_ref]

    refresh_postings_index(spark, path, batch, version=1)
    refresh_postings_index(spark, path, batch, version=1)  # redelivery
    after = bm25_topk_indexed(spark, path, TERMS, k=10).collect()
    full = bm25_topk(
        base.unionByName(batch), "text", "doc_id", TERMS, k=10
    ).collect()
    assert [tuple(r) for r in after] == [tuple(r) for r in full]
    assert any(r["id"] == 50 for r in after)


def test_postings_refresh_crash_retry_heals(spark, tmp_path):
    """Crash between postings append and meta bump: the retry clears
    its own version dir, so postings are not duplicated (stats would
    double-drift silently otherwise)."""
    import json
    import os

    from pdf_etl_ocr_inference_spark.operators.search import (
        bm25_topk_indexed,
        build_postings_index,
        refresh_postings_index,
    )

    base = spark.createDataFrame(DOCS, ["doc_id", "text"])
    batch = spark.createDataFrame(
        [(50, "spark vector spark vector join")], ["doc_id", "text"]
    )
    path = str(tmp_path / "postings")
    build_postings_index(spark, base, path)
    refresh_postings_index(spark, path, batch, version=1)
    clean = [
        tuple(r) for r in bm25_topk_indexed(spark, path, TERMS).collect()
    ]
    mp = os.path.join(path, "_postings_meta.json")
    with open(mp) as f:
        meta = json.load(f)
    meta["last_version"] = 0
    # roll stats back too, as the crashed attempt never bumped them
    meta["n_docs"] -= 1
    meta["sum_dl"] -= 5
    with open(mp, "w") as f:
        json.dump(meta, f)
    refresh_postings_index(spark, path, batch, version=1)
    healed = [
        tuple(r) for r in bm25_topk_indexed(spark, path, TERMS).collect()
    ]
    assert healed == clean


def test_serve_bm25_matches_indexed_and_invalidates(spark, tmp_path):
    """Pinned lexical serving: batch of queries equals the indexed
    scorer per query; a refresh bumps the version and the served path
    sees the new doc without a rebuild."""
    from pdf_etl_ocr_inference_spark.operators.search import (
        bm25_topk_indexed,
        build_postings_index,
        refresh_postings_index,
        serve_bm25,
    )

    base = spark.createDataFrame(DOCS, ["doc_id", "text"])
    path = str(tmp_path / "postings")
    build_postings_index(spark, base, path)
    queries = [(0, TERMS), (1, ["spark"])]
    served = serve_bm25(spark, path, queries, k=10).collect()
    by_q = {}
    for r in served:
        by_q.setdefault(r["qid"], []).append((r["id"], r["score"]))
    for qid, terms in queries:
        ref = [
            (r["id"], r["score"])
            for r in bm25_topk_indexed(spark, path, terms, k=10).collect()
        ]
        assert by_q[qid] == ref, (qid, by_q[qid], ref)

    batch = spark.createDataFrame(
        [(50, "spark vector spark vector join")], ["doc_id", "text"]
    )
    refresh_postings_index(spark, path, batch, version=1)
    after = serve_bm25(spark, path, [(0, TERMS)], k=10).collect()
    assert any(r["id"] == 50 for r in after)


def test_serve_bm25_rebuild_same_path_invalidates(spark, tmp_path):
    """ADVICE r3: rebuilding an index at the SAME path restarts
    last_version at 0, so the worker shard cache — formerly keyed
    (path, pb, version) — would keep serving the pre-rebuild
    postings from long-lived executors.  The build_id nonce in the
    cache key must force a miss after a rebuild."""
    from pdf_etl_ocr_inference_spark.operators.search import (
        build_postings_index,
        serve_bm25,
    )

    base = spark.createDataFrame(DOCS, ["doc_id", "text"])
    path = str(tmp_path / "postings")
    build_postings_index(spark, base, path)
    # warm the worker caches
    before = serve_bm25(spark, path, [(0, TERMS)], k=10).collect()
    assert before

    # full rebuild at the same path: doc 7 replaces the corpus
    rebuilt = spark.createDataFrame(
        [(7, "spark vector join spark vector join")], ["doc_id", "text"]
    )
    build_postings_index(spark, rebuilt, path)
    after = serve_bm25(spark, path, [(0, TERMS)], k=10).collect()
    assert [r["id"] for r in after] == [7], after


def test_postings_meta_has_build_nonce(spark, tmp_path):
    import json

    from pdf_etl_ocr_inference_spark.operators.search import (
        build_postings_index,
    )

    base = spark.createDataFrame(DOCS, ["doc_id", "text"])
    p1 = str(tmp_path / "a")
    p2 = str(tmp_path / "b")
    build_postings_index(spark, base, p1)
    build_postings_index(spark, base, p2)
    ids = []
    for p in (p1, p2):
        import glob

        (mp,) = glob.glob(f"{p}/_postings_meta.json")
        with open(mp) as f:
            ids.append(json.load(f)["build_id"])
    assert ids[0] and ids[1] and ids[0] != ids[1]
