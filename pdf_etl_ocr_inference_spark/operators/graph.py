"""Link-analysis over derived document graphs: PageRank.

Joins the graph family started by connected components
(``plans/scale_plans.py``): where CC answers "which docs form one
duplication clique", PageRank answers "which docs sit at the CENTER
of content reuse" — a reuse-centrality signal for corpus curation
(a page whose passages echo through many otherwise-unrelated docs is
boilerplate-like even when no single pair crosses a dedup
threshold).

Spark-first shape: the rank vector and the edge list are DataFrames;
one iteration = edges ⋈ ranks (co-partitioned on the source key) →
contribution groupBy on the destination.  The iteration count is
FIXED (power iteration converges geometrically; fixed-k is also what
makes the computation oracle-replayable by unrolling), and
intermediate lineage is truncated so plan depth stays constant.

Scale: per-iteration cost is one shuffle of the EDGE list keyed by
src plus one combinable agg keyed by dst — the corpus never enters;
at 100 TB the pair graph is orders of magnitude smaller than the
corpus (same argument as connected components).  Skewed hub nodes
partial-aggregate map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """Fixed-iteration power PageRank: (id, rank_score).

    ``edges`` is DIRECTED.  The node universe is src UNION dst, so
    sink nodes (dst-only) rank and source-only nodes keep emitting
    mass every iteration; dangling (no-out-edge) mass is
    redistributed uniformly, the standard treatment.  On a
    symmetrized edge list there are no dangling nodes and every node
    receives contributions, so this reduces exactly to the plain
    base + d·Σ update the in-repo callers rely on.  The node count is
    a bounded driver scalar (one count job over the distinct node
    set, the same control-data class as k-means' centroid count); the
    per-iteration dangling total stays distributed (1-row broadcast
    crossJoin, no driver round-trip)."""
    from pdf_etl_ocr_inference_spark.operators.layout import (
        truncate_lineage,
    )

    # Materialize the LOOP-INVARIANT frames once (r12 perf pass,
    # guide §5 caching / §1.2 "don't compute things you throw away"):
    # `edges`, `nodes` and `deg` are referenced in EVERY iteration
    # (contribs join, dangling anti-join, rank re-attach), and Spark
    # re-computes a referenced frame's whole subtree per use — for
    # the catalog caller that subtree is exact-dedup + the positional
    # 6-gram explode + the gram-bucket pair generation, re-run ~4×
    # per iteration (the r11 pagerank attribution read "full 6.8 s /
    # edges 0.3 s": the gap was exactly this recompute).  One
    # checkpoint pass each bounds the loop body to the joins it
    # actually performs; ranks were already truncated per round.
    edges = truncate_lineage(
        edges.select(F.col(src).alias(src), F.col(dst).alias(dst))
    )
    nodes = truncate_lineage(
        edges.select(F.col(src).alias("id"))
        .union(edges.select(F.col(dst).alias("id")))
        .distinct()
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank_score", F.lit(0.0))
    deg = truncate_lineage(
        edges.groupBy(src).agg(F.count(F.lit(1)).alias("_outd"))
    )
    ranks = nodes.withColumn("_r", F.lit(1.0 / n))
    base = (1.0 - damping) / n
    for _ in range(iterations):
        contribs = (
            edges.join(ranks, edges[src] == ranks["id"])
            .join(deg, src)
            .select(
                F.col(dst).alias("id"),
                (F.col("_r") / F.col("_outd")).alias("_c"),
            )
        )
        summed = contribs.groupBy("id").agg(F.sum("_c").alias("_sc"))
        dangling = ranks.join(
            deg.select(F.col(src).alias("id")), "id", "left_anti"
        ).agg(F.coalesce(F.sum("_r"), F.lit(0.0)).alias("_dm"))
        ranks = (
            nodes.join(summed, "id", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "id",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("_sc"), F.lit(0.0))
                        + F.col("_dm") / F.lit(float(n))
                    )
                ).alias("_r"),
            )
        )
        ranks = truncate_lineage(ranks)
    return ranks.select("id", F.round("_r", 6).alias("rank_score"))


def triangle_count(
    pairs: DataFrame, a_col: str = "ia", b_col: str = "ib"
) -> DataFrame:
    """Exact global triangle count by DEGREE ORIENTATION — the
    standard scalable formulation [Chiba–Nishizeki 1985; the
    node-iterator++ of Schank 2007].

    Input: undirected edges as distinct (a, b) pairs with a != b
    (one row per edge, either order).  Naively joining the edge list
    with itself explodes on high-degree nodes (a degree-D hub yields
    D^2 wedge rows).  Orienting every edge from its lower-(degree,
    id) endpoint to the higher one turns the graph into a DAG whose
    max out-degree is O(sqrt(m)) — so the wedge self-join is bounded
    by m^1.5 total work regardless of hub size, the property that
    survives power-law degree distributions at 100 TB.  Each triangle
    x<y<z (by the (deg, id) total order) is counted exactly once: as
    the wedge (y, z) at its minimum vertex x, closed by the oriented
    edge y->z.

    Returns one row: (n_triangles, n_edges, n_nodes)."""
    from pdf_etl_ocr_inference_spark.operators.layout import (
        truncate_lineage,
    )

    # Materialize the edge list and the oriented DAG once (r12 perf
    # pass — pagerank's loop-invariant treatment applied to a DAG of
    # reuses): `und` feeds four subtrees (both degree-count sides,
    # the orientation join, the edge-count stat) and `oriented`
    # three (both wedge sides, the closing semi-join), and Spark
    # re-computes a referenced frame's whole subtree per use — for
    # the catalog caller that subtree is the positional-6-gram
    # explode + gram-bucket pair generation, re-run ~7× per query.
    und = truncate_lineage(
        pairs.select(F.col(a_col).alias("a"), F.col(b_col).alias("b"))
    )
    deg = truncate_lineage(
        und.select(F.col("a").alias("node"))
        .unionAll(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    e = (
        und.join(
            deg.select(
                F.col("node").alias("a"), F.col("deg").alias("da")
            ),
            "a",
        ).join(
            deg.select(
                F.col("node").alias("b"), F.col("deg").alias("db")
            ),
            "b",
        )
    )
    swap = (F.col("db") < F.col("da")) | (
        (F.col("db") == F.col("da")) & (F.col("b") < F.col("a"))
    )
    oriented = truncate_lineage(
        e.select(
            F.when(swap, F.col("b")).otherwise(F.col("a")).alias("src"),
            F.when(swap, F.col("a")).otherwise(F.col("b")).alias("dst"),
            F.when(swap, F.col("da")).otherwise(F.col("db")).alias(
                "ddst"
            ),
        )
    )
    o1 = oriented.select(
        "src", F.col("dst").alias("v"), F.col("ddst").alias("dv")
    )
    o2 = oriented.select(
        "src", F.col("dst").alias("w"), F.col("ddst").alias("dw")
    )
    wedges = o1.join(o2, "src").filter(
        (F.col("dv") < F.col("dw"))
        | ((F.col("dv") == F.col("dw")) & (F.col("v") < F.col("w")))
    )
    closed = wedges.join(
        oriented.select(
            F.col("src").alias("v"), F.col("dst").alias("w")
        ),
        ["v", "w"],
        "leftsemi",
    )
    stats = und.agg(
        F.count(F.lit(1)).alias("n_edges"),
    ).crossJoin(
        deg.agg(F.count(F.lit(1)).alias("n_nodes"))
    )
    return (
        closed.agg(F.count(F.lit(1)).alias("n_triangles"))
        .crossJoin(stats)
    )


def k_core(
    edges: DataFrame,
    k: int,
    max_rounds: int = 8,
) -> DataFrame:
    """The k-core of an undirected graph: iteratively peel nodes of
    degree < k until fixpoint (Seidman 1983).  ``edges`` must already
    be symmetric (both directions present, like ``pagerank``'s input).

    Returns ``(node, core_degree)`` — the surviving nodes with their
    degree WITHIN the core.  Each round is one semi-join of the edge
    list against the alive set + one combinable degree count; the
    corpus never enters the loop, and the edge list only shrinks.
    Converges in at most O(peel depth) rounds; raises past
    ``max_rounds`` rather than returning a non-core (the
    dedup_clusters loud-failure convention).
    """
    from pdf_etl_ocr_inference_spark.operators.layout import truncate_lineage

    live = truncate_lineage(edges.select("s", "t"))
    # The edge list only shrinks (each round semi-joins it against a
    # subset of the previous alive set), so an UNCHANGED EDGE COUNT is
    # exactly the fixpoint test — a plain count, no distinct shuffle.
    # Do NOT switch this to a node count: a peel round can in principle
    # drop edges without dropping nodes, which a node count would
    # misread as convergence one round early.
    prev = live.count()
    # range(max_rounds + 1): detecting convergence costs one extra
    # no-change round, so a peel of depth == max_rounds still lands
    # inside the loop — keeping the budget aligned with the oracle's
    # fixed max_rounds-round CTE chain (which needs no detection).
    for _ in range(max_rounds + 1):
        deg = live.groupBy("s").agg(F.count(F.lit(1)).alias("d"))
        alive = deg.filter(F.col("d") >= k).select("s")
        live = truncate_lineage(
            live.join(alive, "s", "leftsemi").join(
                alive.select(F.col("s").alias("t")), "t", "leftsemi"
            )
        )
        n = live.count()
        if n == prev:
            return live.groupBy("s").agg(
                F.count(F.lit(1)).alias("core_degree")
            )
        prev = n
    raise RuntimeError(
        f"k_core: peeling did not converge in {max_rounds} rounds"
    )
