"""The similarity top-k rewrite rule (optimizer.py):

- plan match: the rewritten PHYSICAL plan probes signature partitions
  (PartitionFilters on the index scan) and never touches the corpus;
- guard rails: no hint / no index / wrong shape / wrong dim → the
  original plan is returned untouched;
- semantics: rewritten results are a SUBSET of the corpus with exact
  scores (every returned (id, score) matches brute force), and
  recall@k hits 1.0 in the design regime (clustered near-dup vectors).
"""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from pdf_etl_ocr_inference_spark.operators.similarity import topk_exact
from pdf_etl_ocr_inference_spark.optimizer import (
    IndexCatalog,
    build_lsh_index,
    optimize,
    rewrite_similarity_topk,
)

from .conftest import SF0001


def _explain(spark, df, mode: str = "formatted") -> str:
    return spark._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), mode
    )


@pytest.fixture()
def corpus(spark):
    return spark.read.parquet(f"{SF0001}/embeddings.parquet")


@pytest.fixture()
def indexed(spark, corpus, tmp_path):
    """LSH index over the sf0.001 embeddings in an isolated catalog."""
    cat = IndexCatalog(root=str(tmp_path / "idx"))
    key = "test/embeddings"
    build_lsh_index(
        spark, corpus, key, id_col="vec_id", embedding_col="embedding",
        n_planes=8, seed=42, catalog=cat,
    )
    return cat, key


def _qvec(corpus):
    return [
        float(v)
        for v in corpus.filter(F.col("vec_id") == 0).first()["embedding"]
    ]


def test_rewrite_probes_partitions_not_corpus(spark, corpus, indexed):
    cat, key = indexed
    qvec = _qvec(corpus)
    brute = topk_exact(
        corpus, "embedding", qvec, k=5, table_key=key, exclude_ids=[0]
    )
    opt = rewrite_similarity_topk(brute, catalog=cat)
    plan = _explain(spark, opt)
    # bucket probe: directory pruning on (_table, _pb), row/row-group
    # filtering on the full signature; index scan only
    assert "PartitionFilters" in plan
    assert "_pb" in plan and "_sig" in plan
    assert "embeddings.parquet" not in plan  # corpus never scanned
    # brute force, by contrast, scans the corpus with no _sig pruning
    brute_plan = _explain(spark, brute)
    assert "embeddings.parquet" in brute_plan


def test_rewrite_requires_hint_index_and_shape(spark, corpus, indexed):
    cat, key = indexed
    qvec = _qvec(corpus)
    # no hint (no table_key) → unchanged object
    plain = topk_exact(corpus, "embedding", qvec, k=5)
    assert rewrite_similarity_topk(plain, catalog=cat) is plain
    # hinted but index catalog has no entry for the key → unchanged
    hinted_unknown = topk_exact(
        corpus, "embedding", qvec, k=5, table_key="nope/missing"
    )
    assert rewrite_similarity_topk(hinted_unknown, catalog=cat) is hinted_unknown
    # hinted but the top-k shape was broken (extra filter ABOVE the
    # limit changes semantics) → unchanged
    broken = topk_exact(
        corpus, "embedding", qvec, k=5, table_key=key
    ).filter(F.col("vec_id") > 3)
    assert rewrite_similarity_topk(broken, catalog=cat) is broken
    # ascending re-sort (not a "top"-k anymore) → unchanged
    asc = (
        topk_exact(corpus, "embedding", qvec, k=5, table_key=key)
        .orderBy("score")
        .limit(3)
    )
    assert rewrite_similarity_topk(asc, catalog=cat) is asc
    # dimension mismatch vs the registered index → unchanged
    wrong_dim = topk_exact(
        corpus, "embedding", [1.0, 2.0], k=5, table_key=key
    )
    assert rewrite_similarity_topk(wrong_dim, catalog=cat) is wrong_dim


def test_rewrite_scores_are_exact_subset(spark, corpus, indexed):
    """Every (id, score) the rewritten plan returns must equal the
    brute-force score for that id — the probe changes WHICH rows are
    considered, never their scores (no false positives)."""
    cat, key = indexed
    qvec = _qvec(corpus)
    opt = optimize(
        topk_exact(
            corpus, "embedding", qvec, k=10, table_key=key, exclude_ids=[0]
        ),
        catalog=cat,
    )
    got = {r["vec_id"]: r["score"] for r in opt.collect()}
    assert 0 < len(got) <= 10 and 0 not in got
    full = {
        r["vec_id"]: r["score"]
        for r in topk_exact(
            corpus, "embedding", qvec, k=600, exclude_ids=[0]
        ).collect()
    }
    for vid, score in got.items():
        assert full[vid] == pytest.approx(score, abs=1e-4)


def test_rewrite_recall_in_design_regime(spark, tmp_path):
    """Clustered corpus (true near-dups, cos >= ~0.95): the probe must
    recover the exact top-k perfectly — sign-LSH disagreement decays
    with the angle, and radius-2 multi-probe covers the residue."""
    rng = random.Random(7)
    dim = 32

    def unit(v):
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v]

    def randv():
        return unit([rng.gauss(0, 1) for _ in range(dim)])

    base = randv()

    def near(v, eps):
        return unit([x + rng.gauss(0, eps) for x in v])

    # eps=0.02 per coordinate → noise norm ≈ 0.11 → cos ≈ 0.994
    # (a TRUE near-dup; eps=0.12 would give cos≈0.83, outside the
    # regime where radius-2 multi-probe guarantees recovery)
    rows = [(0, base)] + [(i, near(base, 0.02)) for i in range(1, 6)]
    rows += [(i, randv()) for i in range(6, 200)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cat = IndexCatalog(root=str(tmp_path / "idx2"))
    key = "test/clustered"
    build_lsh_index(
        spark, df, key, id_col="vec_id", embedding_col="embedding",
        n_planes=8, seed=42, catalog=cat,
    )
    exact = [
        r["vec_id"]
        for r in topk_exact(
            df, "embedding", base, k=5, exclude_ids=[0]
        ).collect()
    ]
    assert set(exact) == {1, 2, 3, 4, 5}  # sanity: cluster dominates
    opt = optimize(
        topk_exact(
            df, "embedding", base, k=5, table_key=key, exclude_ids=[0]
        ),
        catalog=cat,
    )
    got = [r["vec_id"] for r in opt.collect()]
    recall = len(set(got) & set(exact)) / len(exact)
    assert recall == 1.0, f"recall {recall}: {got} vs {exact}"


def test_incremental_refresh_equals_rebuild(spark, tmp_path):
    """Folding a change commit with refresh_lsh_index must leave the
    index probe-equivalent to a full rebuild on the new snapshot:
    moved ids surface with their NEW embedding, deleted ids vanish,
    inserted ids appear."""
    from pdf_etl_ocr_inference_spark.optimizer import (
        probe_lsh_index,
        refresh_lsh_index,
    )
    from pdf_etl_ocr_inference_spark.streaming.changefeed import (
        diff_snapshots,
    )

    rng = random.Random(11)
    dim = 16

    def randv():
        return [rng.gauss(0, 1) for _ in range(dim)]

    v0_rows = [(i, randv()) for i in range(120)]
    v0 = spark.createDataFrame(v0_rows, "vec_id long, embedding array<double>")
    # v1: ids %10==3 re-embedded (bucket moves), %10==7 deleted,
    # ids 200-204 inserted
    v1 = (
        v0.filter(F.col("vec_id") % 10 != 7)
        .withColumn(
            "embedding",
            F.when(
                F.col("vec_id") % 10 == 3,
                F.transform("embedding", lambda v: -v),
            ).otherwise(F.col("embedding")),
        )
        .unionByName(
            spark.createDataFrame(
                [(200 + j, randv()) for j in range(5)],
                "vec_id long, embedding array<double>",
            )
        )
    )

    cat_a = IndexCatalog(root=str(tmp_path / "a"))
    build_lsh_index(
        spark, v0, "k", id_col="vec_id", embedding_col="embedding",
        n_planes=6, seed=42, n_tables=2, catalog=cat_a,
    )
    refresh_lsh_index(
        spark, "k", diff_snapshots(v0, v1, "vec_id"), version=1,
        catalog=cat_a,
    )
    cat_b = IndexCatalog(root=str(tmp_path / "b"))
    build_lsh_index(
        spark, v1, "k", id_col="vec_id", embedding_col="embedding",
        n_planes=6, seed=42, n_tables=2, catalog=cat_b,
    )

    qvec = v0_rows[0][1]
    for radius in (1, 2):
        got_a = {
            (r["vec_id"], tuple(round(x, 9) for x in r["embedding"]))
            for r in probe_lsh_index(
                spark, cat_a.lookup("k"), qvec, hamming_radius=radius
            ).collect()
        }
        got_b = {
            (r["vec_id"], tuple(round(x, 9) for x in r["embedding"]))
            for r in probe_lsh_index(
                spark, cat_b.lookup("k"), qvec, hamming_radius=radius
            ).collect()
        }
        assert got_a == got_b and got_a
    # refresh is idempotent on re-delivery of the same version
    refresh_lsh_index(
        spark, "k", diff_snapshots(v0, v1, "vec_id"), version=1,
        catalog=cat_a,
    )
    again = {
        r["vec_id"]
        for r in probe_lsh_index(
            spark, cat_a.lookup("k"), qvec, hamming_radius=2
        ).collect()
    }
    assert again == {v for v, _ in got_a}


def test_refresh_same_bucket_update_tie(spark, tmp_path):
    """An update whose embedding keeps its signature lands the
    tombstone (preimage) and the live row (postimage) in the SAME
    bucket at the SAME version — the live row must win the tie."""
    from pdf_etl_ocr_inference_spark.optimizer import (
        probe_lsh_index,
        refresh_lsh_index,
    )

    dim = 8
    base = [1.0] * dim
    v0 = spark.createDataFrame(
        [(1, base), (2, [-x for x in base])],
        "vec_id long, embedding array<double>",
    )
    cat = IndexCatalog(root=str(tmp_path / "c"))
    build_lsh_index(
        spark, v0, "k", id_col="vec_id", embedding_col="embedding",
        n_planes=4, seed=42, n_tables=1, catalog=cat,
    )
    # identical embedding in pre and post → same buckets, same version
    changes = spark.createDataFrame(
        [(1, base, "update_preimage"), (1, base, "update_postimage")],
        "vec_id long, embedding array<double>, _change_type string",
    )
    refresh_lsh_index(spark, "k", changes, version=1, catalog=cat)
    got = {
        r["vec_id"]
        for r in probe_lsh_index(
            spark, cat.lookup("k"), base, hamming_radius=4
        ).collect()
    }
    assert 1 in got  # the live row survived the same-bucket tie
    # and a pure delete at a later version really removes the id
    refresh_lsh_index(
        spark,
        "k",
        spark.createDataFrame(
            [(1, base, "delete")],
            "vec_id long, embedding array<double>, _change_type string",
        ),
        version=2,
        catalog=cat,
    )
    got2 = {
        r["vec_id"]
        for r in probe_lsh_index(
            spark, cat.lookup("k"), base, hamming_radius=4
        ).collect()
    }
    assert 1 not in got2 and 2 in got2


def test_near_pairs_rewrite_subset_and_plan(spark, corpus, indexed):
    """Rule #2: rewritten pairs must be a verified SUBSET of brute
    force with identical sims (no false positives), and the rewritten
    plan must join on buckets, not cross-join the corpus."""
    from pdf_etl_ocr_inference_spark.operators.similarity import (
        near_pairs_exact,
    )
    from pdf_etl_ocr_inference_spark.optimizer import rewrite_near_pairs

    cat, key = indexed
    brute = near_pairs_exact(
        corpus, "embedding", "vec_id", threshold=0.35, table_key=key
    )
    opt = rewrite_near_pairs(brute, catalog=cat)
    assert opt is not brute  # rule fired
    plan = _explain(spark, opt)
    assert "CartesianProduct" not in plan and "embeddings.parquet" not in plan
    brute_pairs = {
        (r["id_a"], r["id_b"]): r["sim"]
        for r in near_pairs_exact(
            corpus, "embedding", "vec_id", threshold=0.35
        ).collect()
    }
    got = {(r["id_a"], r["id_b"]): r["sim"] for r in opt.collect()}
    assert set(got) <= set(brute_pairs)
    for pair, sim in got.items():
        assert brute_pairs[pair] == pytest.approx(sim, abs=1e-4)
    # guard rails: no hint / no join shape → unchanged
    plain = near_pairs_exact(corpus, "embedding", "vec_id", threshold=0.35)
    assert rewrite_near_pairs(plain, catalog=cat) is plain
    unknown = near_pairs_exact(
        corpus, "embedding", "vec_id", threshold=0.35, table_key="no/idx"
    )
    assert rewrite_near_pairs(unknown, catalog=cat) is unknown


def test_near_pairs_rewrite_recall_design_regime(spark, tmp_path):
    """Constructed near-dup pairs (cos ≈ 0.99) must all survive the
    bucket-join rewrite — same regime contract as dedup_embedding_lsh."""
    from pdf_etl_ocr_inference_spark.operators.similarity import (
        near_pairs_exact,
    )
    from pdf_etl_ocr_inference_spark.optimizer import optimize

    rng = random.Random(13)
    dim = 32

    def unit(v):
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v]

    rows, expected = [], set()
    for i in range(8):  # 8 near-dup pairs: ids (2i, 2i+1)
        base = unit([rng.gauss(0, 1) for _ in range(dim)])
        twin = unit([x + rng.gauss(0, 0.02) for x in base])
        rows += [(2 * i, base), (2 * i + 1, twin)]
        expected.add((2 * i, 2 * i + 1))
    rows += [
        (100 + j, unit([rng.gauss(0, 1) for _ in range(dim)]))
        for j in range(100)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cat = IndexCatalog(root=str(tmp_path / "np"))
    build_lsh_index(
        spark, df, "k", id_col="vec_id", embedding_col="embedding",
        n_planes=8, seed=42, n_tables=3, catalog=cat,
    )
    opt = optimize(
        near_pairs_exact(
            df, "embedding", "vec_id", threshold=0.9, table_key="k"
        ),
        catalog=cat,
    )
    got = {(r["id_a"], r["id_b"]) for r in opt.collect()}
    assert expected <= got, f"missed {expected - got}"


def test_streaming_index_sync(spark, tmp_path):
    """availableNow sync over a change feed folds unseen commits into
    the index (same end state as direct refresh) and a re-run with the
    same checkpoint ingests nothing new."""
    from pyspark.sql import types as T

    from pdf_etl_ocr_inference_spark.optimizer import (
        probe_lsh_index,
        sync_index_from_feed,
    )
    from pdf_etl_ocr_inference_spark.streaming.changefeed import (
        commit_changes,
        diff_snapshots,
    )

    rng = random.Random(17)
    dim = 16
    v0 = spark.createDataFrame(
        [(i, [rng.gauss(0, 1) for _ in range(dim)]) for i in range(60)],
        "vec_id long, embedding array<double>",
    )
    feed = str(tmp_path / "feed")
    commit_changes(v0.withColumn("_change_type", F.lit("insert")), feed, 0)
    v1 = (
        v0.filter(F.col("vec_id") % 10 != 7)
        .withColumn(
            "embedding",
            F.when(
                F.col("vec_id") % 10 == 3,
                F.transform("embedding", lambda x: -x),
            ).otherwise(F.col("embedding")),
        )
    )
    commit_changes(diff_snapshots(v0, v1, "vec_id"), feed, 1)

    cat = IndexCatalog(root=str(tmp_path / "idx"))
    build_lsh_index(
        spark, v0, "k", id_col="vec_id", embedding_col="embedding",
        n_planes=6, seed=42, n_tables=2, catalog=cat,
    )
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.DoubleType())),
            T.StructField("_change_type", T.StringType()),
        ]
    )
    ckpt = str(tmp_path / "ckpt")
    sync_index_from_feed(spark, feed, "k", schema, ckpt, catalog=cat)
    assert cat.lookup("k")["last_version"] == 1

    qvec = [1.0] * dim
    after_sync = {
        (r["vec_id"], tuple(round(x, 9) for x in r["embedding"]))
        for r in probe_lsh_index(
            spark, cat.lookup("k"), qvec, hamming_radius=6
        ).collect()
    }
    # reference state: fresh index built directly on the v1 snapshot
    cat2 = IndexCatalog(root=str(tmp_path / "idx2"))
    build_lsh_index(
        spark, v1, "k", id_col="vec_id", embedding_col="embedding",
        n_planes=6, seed=42, n_tables=2, catalog=cat2,
    )
    rebuilt = {
        (r["vec_id"], tuple(round(x, 9) for x in r["embedding"]))
        for r in probe_lsh_index(
            spark, cat2.lookup("k"), qvec, hamming_radius=6
        ).collect()
    }
    assert after_sync == rebuilt and after_sync
    # re-run with the same checkpoint: stream sees no new files
    import os as _os

    files_before = sum(len(fs) for _, _, fs in _os.walk(cat.root))
    sync_index_from_feed(spark, feed, "k", schema, ckpt, catalog=cat)
    files_after = sum(len(fs) for _, _, fs in _os.walk(cat.root))
    assert files_after == files_before
