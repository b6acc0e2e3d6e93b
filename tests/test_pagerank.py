"""PageRank: parity with a dense numpy power iteration, hub-node
centrality, and determinism across partition layouts."""

from __future__ import annotations

import numpy as np
import pytest

from pdf_etl_ocr_inference_spark.operators.graph import pagerank

# star (0 is hub of 1-4) + a separate triangle (10, 11, 12)
UNDIRECTED = [(0, 1), (0, 2), (0, 3), (0, 4), (10, 11), (11, 12), (10, 12)]


def _edges(spark, pairs, parts=1):
    sym = pairs + [(b, a) for a, b in pairs]
    df = spark.createDataFrame(sym, ["src", "dst"])
    return df.repartition(parts) if parts > 1 else df


def _numpy_pr(pairs, iters=3, d=0.85):
    sym = pairs + [(b, a) for a, b in pairs]
    ids = sorted({x for e in sym for x in e})
    idx = {v: i for i, v in enumerate(ids)}
    n = len(ids)
    out = np.zeros(n)
    for s, _ in sym:
        out[idx[s]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        nxt = np.full(n, (1 - d) / n)
        for s, t in sym:
            nxt[idx[t]] += d * r[idx[s]] / out[idx[s]]
        r = nxt
    return {v: r[idx[v]] for v in ids}


def test_matches_numpy_power_iteration(spark):
    got = {
        r["id"]: r["rank_score"]
        for r in pagerank(_edges(spark, UNDIRECTED)).collect()
    }
    exp = _numpy_pr(UNDIRECTED)
    assert set(got) == set(exp)
    for v, r in exp.items():
        assert got[v] == pytest.approx(round(r, 6), abs=1e-6)


def test_hub_outranks_leaves_and_triangle_uniform(spark):
    got = {
        r["id"]: r["rank_score"]
        for r in pagerank(_edges(spark, UNDIRECTED)).collect()
    }
    assert got[0] > got[1]  # star hub beats its leaves
    assert got[1] == got[2] == got[3] == got[4]  # leaves symmetric
    assert got[10] == got[11] == got[12]  # regular triangle uniform


def _numpy_pr_directed(pairs, iters=3, d=0.85):
    """Dense reference for DIRECTED edges: node universe src ∪ dst,
    dangling mass redistributed uniformly."""
    ids = sorted({x for e in pairs for x in e})
    idx = {v: i for i, v in enumerate(ids)}
    n = len(ids)
    out = np.zeros(n)
    for s, _ in pairs:
        out[idx[s]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        dangling = r[out == 0].sum()
        nxt = np.full(n, (1 - d) / n) + d * dangling / n
        for s, t in pairs:
            nxt[idx[t]] += d * r[idx[s]] / out[idx[s]]
        r = nxt
    return {v: r[idx[v]] for v in ids}


# chain into a sink plus a source-only feeder: 0→1→2 (2 is a sink,
# dst-only), 3→1 (3 is src-only, no in-edges)
DIRECTED = [(0, 1), (1, 2), (3, 1)]


def test_directed_sinks_and_sources(spark):
    """dst-only sinks are IN the universe and ranked; src-only nodes
    keep contributing after iteration 1; total mass is conserved."""
    df = spark.createDataFrame(DIRECTED, ["src", "dst"])
    got = {r["id"]: r["rank_score"] for r in pagerank(df).collect()}
    exp = _numpy_pr_directed(DIRECTED)
    assert set(got) == {0, 1, 2, 3}  # sink 2 present, source 3 present
    for v, r in exp.items():
        assert got[v] == pytest.approx(round(r, 6), abs=1e-6)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-4)


def test_partition_layout_invariance(spark):
    a = sorted(map(tuple, pagerank(_edges(spark, UNDIRECTED)).collect()))
    b = sorted(
        map(tuple, pagerank(_edges(spark, UNDIRECTED, parts=7)).collect())
    )
    assert a == b


def test_mass_duplication_stays_linear(spark):
    """The entry's edge derivation collapses exact-dup cliques to a
    survivor before pairing — verify at operator level: with d
    identical docs planted, the span-share pair count on SURVIVORS is
    independent of d (no quadratic edge blowup)."""
    from pyspark.sql import functions as F

    from pdf_etl_ocr_inference_spark.operators.dedup import exact_dedup
    from pdf_etl_ocr_inference_spark.operators.span_dedup import (
        positional_ngrams,
    )

    boiler = "common boilerplate sentence repeated across many documents"

    def pairs(n_dups):
        rows = [(i, boiler) for i in range(n_dups)]
        rows += [
            (1000, f"unique one with {boiler} inside it"),
            (1001, "totally unrelated text that matches nothing at all"),
        ]
        docs = exact_dedup(
            spark.createDataFrame(rows, ["doc_id", "text"]),
            "text",
            "doc_id",
        )
        occ = positional_ngrams(docs, "text", "doc_id", 6).select(
            "id", "gram"
        )
        dup = (
            occ.groupBy("gram")
            .agg(F.min("id").alias("_mn"), F.max("id").alias("_mx"))
            .filter(F.col("_mn") < F.col("_mx"))
            .select("gram")
        )
        a = occ.join(dup, "gram").select("gram", F.col("id").alias("ia"))
        b = occ.join(dup, "gram").select("gram", F.col("id").alias("ib"))
        return (
            a.join(b, "gram")
            .filter(F.col("ia") < F.col("ib"))
            .select("ia", "ib")
            .distinct()
            .count()
        )

    assert pairs(5) == pairs(50)  # clique depth doesn't grow edges


def test_triangle_count_brute_force_parity(spark):
    """Degree-oriented count must equal a brute-force triple check on
    a deterministic pseudo-random graph with planted hubs."""
    import itertools

    from pdf_etl_ocr_inference_spark.operators.graph import (
        triangle_count,
    )

    # 60 nodes; edge iff (i*31 + j*17) % 7 == 0 — plus a hub joined
    # to everyone (degree-orientation's worst case)
    nodes = list(range(60))
    edges = {
        (i, j)
        for i, j in itertools.combinations(nodes, 2)
        if (i * 31 + j * 17) % 7 == 0
    }
    edges |= {(i, 99) for i in nodes}
    eset = edges
    ref = sum(
        1
        for x, y, z in itertools.combinations(sorted({n for e in eset for n in e}), 3)
        if ((x, y) in eset or (y, x) in eset)
        and ((y, z) in eset or (z, y) in eset)
        and ((x, z) in eset or (z, x) in eset)
    )
    df = spark.createDataFrame(sorted(eset), ["ia", "ib"])
    got = triangle_count(df).first()
    assert got["n_triangles"] == ref
    assert got["n_edges"] == len(eset)
