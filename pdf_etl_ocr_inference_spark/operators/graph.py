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

    nodes = (
        edges.select(F.col(src).alias("id"))
        .union(edges.select(F.col(dst).alias("id")))
        .distinct()
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank_score", F.lit(0.0))
    deg = edges.groupBy(src).agg(F.count(F.lit(1)).alias("_outd"))
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
