"""Recall floors for the ANN paths vs exact top-k ground truth —
the same metric bench.py emits (bench.ann_recall), asserted here so a
recall regression fails CI, not just drifts in a report.

Floors are set below the measured fixture values (lsh/rewrite 0.8,
ivf 0.6-0.8 at sf0.01/sf0.1) with margin: the fixture's vectors are
near-orthogonal (max pairwise cos ≈ 0.51), far outside sign-LSH's
design regime, so these floors guard the OR-amplified bucketing
machinery, not production recall (design-regime recall == 1.0 is
asserted in test_optimizer.py).
"""

from __future__ import annotations

import bench


def test_ann_recall_floors_gate_sf(spark):
    recalls = bench.ann_recall(spark, "/root/testdata/sf0.01")
    assert recalls["lsh"] >= 0.6, recalls
    assert recalls["rewrite"] >= 0.6, recalls
    assert recalls["ivf"] >= 0.4, recalls
    # measured 0.8 / 1.0 / 1.0 at sf0.01; floors leave fixture margin
    assert recalls["pq"] >= 0.6, recalls
    assert recalls["opq"] >= 0.6, recalls
    assert recalls["nsw"] >= 0.6, recalls
    # the hierarchical walk must hold the single-layer family's floor
    assert recalls["hnsw"] >= 0.6, recalls
    assert recalls["hnsw"] >= recalls["nsw"] - 0.2, recalls
    # residual quantization + 3-cell probe must hold the PQ floor
    assert recalls["ivfpq"] >= 0.6, recalls
    # MLlib BRP-LSH (euclidean, vs exact euclidean top-5): the one
    # rows-only ANN entry — this floor is its only quality gate
    # (r10 verdict #4), so a seed/MLlib drift fails here, not
    # silently in a report
    assert recalls["mllib_brp"] >= 0.6, recalls
