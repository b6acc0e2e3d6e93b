"""Log-round connected components (Shiloach–Vishkin hook+shortcut).

The property that matters at 100 TB: convergence in O(log n) rounds on
chain-shaped pair graphs, where plain neighbor-min propagation needs
O(diameter) rounds. Verified against a driver-side union-find ground
truth on chains, cliques, and a mixed random graph.
"""

from __future__ import annotations

from pdf_etl_ocr_inference_spark.operators.dedup import connected_components


def _union_find(n_nodes: set[int], edges: list[tuple[int, int]]) -> dict[int, int]:
    parent = {v: v for v in n_nodes}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # component id = min node id of the component
    comp: dict[int, list[int]] = {}
    for v in n_nodes:
        comp.setdefault(find(v), []).append(v)
    out = {}
    for members in comp.values():
        m = min(members)
        for v in members:
            out[v] = m
    return out


def _check(spark, edges: list[tuple[int, int]], max_rounds: int = 20):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    labels, rounds = connected_components(df, max_rounds=max_rounds)
    got = {r["node"]: r["component"] for r in labels.collect()}
    nodes = {a for a, _ in edges} | {b for _, b in edges}
    want = _union_find(nodes, edges)
    assert got == want
    return rounds


def test_chain_converges_in_log_rounds(spark):
    # diameter-64 chain: plain propagation needs 64 rounds; the
    # shortcut variant must finish in O(log n) — assert a hard bound.
    edges = [(i, i + 1) for i in range(64)]
    rounds = _check(spark, edges)
    assert rounds <= 10, f"expected log-round convergence, took {rounds}"


def test_two_components_and_reversed_edges(spark):
    # two chains, one given in descending orientation; ids interleaved
    # so component membership isn't contiguous.
    edges = [(i + 2, i) for i in range(0, 20, 2)]  # evens: 0..22
    edges += [(i, i + 2) for i in range(1, 21, 2)]  # odds: 1..23
    rounds = _check(spark, edges)
    assert rounds <= 10


def test_clique_single_round_shape(spark):
    # exact-dup components are cliques: must converge almost instantly.
    clique = [(a, b) for a in range(5, 10) for b in range(5, 10) if a < b]
    rounds = _check(spark, clique)
    assert rounds <= 2


def test_mixed_random_graph_matches_union_find(spark):
    # deterministic pseudo-random sparse graph over 120 nodes: star +
    # chain + cross links, exercising merge of unequal-depth trees.
    edges = []
    for i in range(120):
        edges.append((i, (i * 37 + 11) % 120))
    edges = [(a, b) for a, b in edges if a != b]
    _check(spark, edges)


def test_self_loops_ignored(spark):
    edges = [(1, 1), (1, 2), (3, 3)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    labels, _ = connected_components(df)
    got = {r["node"]: r["component"] for r in labels.collect()}
    # 3 has only a self-loop -> not incident to a real edge -> absent
    assert got == {1: 1, 2: 1}
