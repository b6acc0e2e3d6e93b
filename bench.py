#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced with a cheap count() action after a first
warm-up-free timed run; time includes plan + execution (cold cache per
query, shared session).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: scan-agg, multiway join, window, explode-heavy text,
# dedup (exact + minhash + clustering), similarity, chunk pipeline,
# temporal (as-of, sessionize), multimodal, streaming.
BENCH_QUERIES = [
    "tpch_q1",
    "tpch_q3",
    "tpch_q5",
    "tpch_q6",
    "tpch_q9",
    "tpch_q13",
    "tpch_q18",
    "op30_explode",
    "op34_window_rank",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_clusters",
    "op44_topk_cosine",
    "op25_chunk_mapinpandas",
    "op49_asof_join",
    "op51_sessionize",
    "mm_frame_sample",
    "op45_stream_tumbling",
    # round-3 continuation additions: substring dedup, lexical +
    # two-stage retrieval, event analytics
    "dedup_span_intervals",
    "text_bm25_topk",
    "text_rerank_pipeline",
    "op76_funnel",
    "pipeline_span_clean_corpus",
    # round-4 continuation additions: optimizer-routed data skipping,
    # domain-targeted corpus construction
    "op70d_skipping_rewrite",
    "pipeline_dsir_corpus",
    # round-5 addition: multi-level (hive dir + Z-order) layout prune
    "op70f_partitioned_layout",
]


def ann_recall(spark, sf_dir: str, specs=None) -> dict[str, float]:
    """recall@5 of each ANN path vs the exact top-5 (op44's ground
    truth) on the same corpus — the quality axis the latency numbers
    alone hide.  Imported by pytest, which asserts floors."""
    if specs is None:
        from pdf_etl_ocr_inference_spark.plans import all_specs

        specs = all_specs()
    exact = {r["vec_id"] for r in specs["op44_topk_cosine"].fn(spark, sf_dir).collect()}
    out = {}
    for label, qname in (
        ("lsh", "ann_lsh_topk"),
        ("ivf", "ann_ivf_topk"),
        ("rewrite", "ann_rewrite_topk"),
        ("pq", "ann_pq_topk"),
        ("opq", "ann_opq_topk"),
        ("nsw", "ann_nsw_topk"),
        ("hnsw", "ann_hnsw_topk"),
        ("ivfpq", "ann_ivfpq_topk"),
    ):
        got = {r["vec_id"] for r in specs[qname].fn(spark, sf_dir).collect()}
        out[label] = round(len(got & exact) / len(exact), 3)
    # MLlib BucketedRandomProjectionLSH is EUCLIDEAN, so its ground
    # truth is the exact euclidean top-5 (on non-normalized vectors
    # cosine and euclidean neighbor sets differ) — the only ANN path
    # that had no recall floor (r10 verdict #4): a seed or MLlib
    # version drift could silently degrade its rows-only entry.
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{sf_dir.rstrip('/')}/embeddings.parquet")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    qarr = F.array(*[F.lit(float(x)) for x in qvec])
    d2 = F.aggregate(
        F.zip_with(
            F.col("embedding").cast("array<double>"),
            qarr,
            lambda a, b: (a - b) * (a - b),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    exact_euc = {
        r["vec_id"]
        for r in emb.filter(F.col("vec_id") != 0)
        .select("vec_id", d2.alias("_d2"))
        .orderBy("_d2", "vec_id")
        .limit(5)
        .collect()
    }
    got = {
        r["vec_id"]
        for r in specs["ann_mllib_brp_lsh"].fn(spark, sf_dir).collect()
    }
    out["mllib_brp"] = round(len(got & exact_euc) / len(exact_euc), 3)
    return out


def filtered_ann_recall(
    spark, sf_dir: str, mods=(2, 7, 29, 97)
) -> dict[str, float]:
    """Selectivity sweep for metadata-filtered IVF search (r11
    verdict #1): recall@5 of the pre-filter + probe-widening path vs
    the exact FILTERED ground truth, at predicates from ~50% down to
    ~1% selectivity (tenant = id mod m).  The claim under test:
    recall HOLDS as the predicate tightens, because the probe set
    widens (shortest cell prefix with ≥ k·4 filtered survivors,
    floored at 4) instead of starving.  Imported by pytest, which
    asserts floors."""
    from pyspark.sql import functions as F

    from pdf_etl_ocr_inference_spark.operators.similarity import (
        ivf_assign_quantized,
        ivf_centroids_quantized,
        topk_ivf_quantized_prefiltered,
    )

    emb = spark.read.parquet(f"{sf_dir.rstrip('/')}/embeddings.parquet")
    train = emb.filter(F.col("vec_id") % 4 == 0)
    centroids = ivf_centroids_quantized(train, "embedding")
    qvec = [
        float(v)
        for v in emb.filter(F.col("vec_id") == 0).first()["embedding"]
    ]
    corpus = emb.filter(F.col("vec_id") != 0)
    # stage the UNFILTERED assignment once: the four mods then filter
    # a staged scan instead of re-quantizing per mod (the staged
    # layout is what the production index stores anyway)
    import os as _os

    from pdf_etl_ocr_inference_spark.scratch import scratch_root

    _tag = _os.path.basename(sf_dir.rstrip("/"))
    _stage = _os.path.join(scratch_root(), f"ivf_sweep_asg_{_tag}")
    ivf_assign_quantized(corpus, "embedding", centroids).write.mode(
        "overwrite"
    ).parquet(_stage)
    assigned = spark.read.parquet(_stage)
    from pdf_etl_ocr_inference_spark.functions.vector import (
        cosine_similarity,
    )

    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q_embedding")
    )
    out = {}
    for mod in mods:
        pred = F.col("vec_id") % mod == 1
        got = {
            r["vec_id"]
            for r in topk_ivf_quantized_prefiltered(
                assigned.filter(pred), "embedding", qvec, centroids,
                k=5, n_probe_min=4, oversample=4,
                stage_tag=f"sweep_{_tag}_m{mod}",
            ).collect()
        }
        exact = {
            r["vec_id"]
            for r in corpus.filter(pred)
            .crossJoin(F.broadcast(q))
            .select(
                "vec_id",
                cosine_similarity("embedding", "q_embedding").alias(
                    "_raw"
                ),
            )
            .orderBy(F.desc("_raw"), "vec_id")
            .limit(5)
            .collect()
        }
        out[f"mod{mod}"] = round(len(got & exact) / max(len(exact), 1), 3)
    return out


def probe_speedup(spark) -> dict:
    """Brute-force cosine top-k vs the optimizer's LSH bucket probe on
    a deterministic 1M×64 synthetic corpus — the corpus size where the
    access-path choice becomes visible (the 500-row fixture can't show
    it).

    The corpus PLANTS near neighbors (100k base patterns × 10 jittered
    copies, sibling cosine ≈ 0.999): a corpus with no true near
    neighbors — e.g. uniform random vectors — is the regime where no
    ANN structure can help and recall is meaningless noise, so it
    benchmarks nothing.  Probe runs at Hamming radius 1: with 3
    OR-amplified tables that's the recall-preserving narrow probe
    (radius 2 reads ~31% of the bucket dirs and loses the I/O win).
    Reports recall@10 of the probe vs the brute-force ground truth it
    is timed against.  Corpus parquet and index are cached in scratch;
    only the first run pays the build (~60 s)."""
    import time as _t

    from pyspark.sql import functions as F

    from pdf_etl_ocr_inference_spark.operators.similarity import topk_exact
    from pdf_etl_ocr_inference_spark.optimizer import (
        INDEX_FORMAT_VERSION,
        IndexCatalog,
        build_lsh_index,
        optimize,
    )

    n, dim = 1_000_000, 64
    corpus_path = "/tmp/spark_graft_scratch/probe_corpus_1m_planted"
    key = "bench/probe_corpus_1m_planted"
    if not os.path.exists(corpus_path):
        gid = (F.col("id") / 10).cast("long")  # 10 siblings per base
        emb = F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda j: (
                # base pattern of the group: uniform in [-1, 1)
                F.pmod(F.xxhash64(gid, j), F.lit(2000)).cast("double")
                / 1000.0
                - 1.0
                # per-row jitter: uniform in [-0.1, 0.1)
                + F.pmod(F.xxhash64(F.col("id"), j, F.lit(1)), F.lit(2000))
                .cast("double")
                / 10000.0
                - 0.1
            ),
        )
        (
            spark.range(0, n, 1, 32)
            .select(F.col("id").alias("vec_id"), emb.alias("embedding"))
            .write.mode("overwrite")
            .parquet(corpus_path)
        )
    corpus = spark.read.parquet(corpus_path)
    cat = IndexCatalog()
    meta = cat.lookup(key)
    if meta is None or meta.get("format_version") != INDEX_FORMAT_VERSION:
        build_lsh_index(
            spark, corpus, key, n_planes=12, seed=42, n_tables=3,
            catalog=cat,
        )
    qvec = [
        float(v)
        for v in corpus.filter(F.col("vec_id") == 0).first()["embedding"]
    ]
    brute = topk_exact(
        corpus, "embedding", qvec, k=10, table_key=key, exclude_ids=[0]
    )
    opt = optimize(brute, catalog=cat, hamming_radius=1)

    def best(df, reps: int = 3):
        out, rows = [], None
        for _ in range(reps):
            t0 = _t.perf_counter()
            rows = df.collect()
            out.append(_t.perf_counter() - t0)
        return round(min(out), 3), rows

    tb, brows = best(brute)
    tp, prows = best(opt)
    truth = {r["vec_id"] for r in brows}
    got = {r["vec_id"] for r in prows}
    return {
        "corpus_rows": n,
        "brute_sec": tb,
        "probe_sec": tp,
        "speedup": round(tb / tp, 1) if tp > 0 else None,
        "probe_recall_at_10": round(len(truth & got) / len(truth), 2),
    }


def incremental_dedup_speedup(spark) -> dict:
    """Incremental probe (refresh + batch-vs-index) vs full-corpus
    re-dedup when 1k new docs arrive on a 200k-doc corpus of ~100-word
    documents — the daily-ingest scenario the MinHash index exists
    for.  The corpus PLANTS near-dup families (2 docs share 99 of 100
    words; each batch doc near-dups one family), so both paths find
    real pairs.  Doc length matters for honesty: the full pipeline
    re-shingles every document (cost ∝ corpus TEXT volume) while the
    index probe reads only compact band rows (cost ∝ corpus ROW
    count) — exactly the asymmetry that pays at 100 TB.

    The index build is cached in scratch (first run pays ~once); the
    full-pipeline side is the measurement, re-run each time.
    """
    import time as _t

    from pyspark.sql import functions as F

    from pdf_etl_ocr_inference_spark.operators.dedup import (
        minhash_dedup_pairs,
    )
    from pdf_etl_ocr_inference_spark.operators.dedup_index import (
        MINHASH_INDEX_FORMAT,
        build_minhash_index,
        dedup_against_index,
        refresh_minhash_index,
    )
    from pdf_etl_ocr_inference_spark.optimizer import IndexCatalog

    n, n_batch, fams, n_words = 200_000, 1_000, 100_000, 100

    def _docs(ids, fam_expr):
        body = F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(0), F.lit(n_words - 2)),
                lambda j: F.concat(
                    F.lit("w"), fam_expr.cast("string"), F.lit("q"),
                    j.cast("string"),
                ),
            ),
        )
        uniq = F.concat(F.lit("u"), F.col("id").cast("string"))
        return ids.select(
            F.col("id").alias("doc_id"),
            F.concat(body, F.lit(" "), uniq).alias("text"),
        )

    corpus = _docs(spark.range(0, n, 1, 32), F.col("id") % fams)
    batch = _docs(
        spark.range(n, n + n_batch, 1, 8), F.col("id") % fams
    )
    cat = IndexCatalog()
    key = "bench/minhash_corpus_200k_100w"
    meta = cat.lookup(key)
    if (
        meta is None
        or meta.get("format_version") != MINHASH_INDEX_FORMAT
        or not os.path.isdir(meta.get("data_path", ""))
    ):
        build_minhash_index(spark, corpus, key, catalog=cat)

    # fold the batch as a genuinely NEW commit each run so the
    # append cost is really measured (re-folding the same rows at a
    # later version is result-identical: liveness picks the latest
    # version of each unchanged (id, band, bucket))
    next_v = cat.lookup(key)["last_version"] + 1
    t0 = _t.perf_counter()
    refresh_minhash_index(
        spark, key,
        batch.withColumn("_change_type", F.lit("insert")),
        version=next_v, catalog=cat,
    )
    t_refresh = _t.perf_counter() - t0

    # best-of-2 (same policy as the headline queries): the first run
    # pays one-time codegen compilation for the 32-way min-agg, which
    # a daily-ingest deployment amortizes across batches
    t_probe, inc_pairs = None, None
    for _ in range(2):
        t0 = _t.perf_counter()
        inc_pairs = dedup_against_index(
            spark, key, batch, corpus.unionByName(batch), catalog=cat
        ).count()
        el = _t.perf_counter() - t0
        t_probe = el if t_probe is None else min(t_probe, el)

    t0 = _t.perf_counter()
    full_pairs = minhash_dedup_pairs(
        corpus.unionByName(batch), "text", "doc_id"
    ).count()
    t_full = _t.perf_counter() - t0
    t_inc = t_refresh + t_probe
    return {
        "corpus_rows": n,
        "batch_rows": n_batch,
        "words_per_doc": n_words,
        "refresh_sec": round(t_refresh, 3),
        "probe_sec": round(t_probe, 3),
        "incremental_sec": round(t_inc, 3),
        "full_rededup_sec": round(t_full, 3),
        "speedup": round(t_full / t_inc, 1) if t_inc > 0 else None,
        "incremental_pairs": inc_pairs,
        "full_pairs": full_pairs,
    }


def graph_build(spark) -> dict:
    """Sharded graph-index construction wall time at 100k x 64 over
    32 shards — tracks the vectorized VecStore walk (r3: the insert
    loop scores whole adjacency lists via one gemv instead of a
    Python dot per neighbor; 12.1s -> ~9.8s NSW, 13.0s -> ~9.9s
    HNSW on this block)."""
    import shutil
    import time as _t

    from pyspark.sql import functions as F

    from pdf_etl_ocr_inference_spark.operators.graph_ann import (
        build_nsw_index,
    )
    from pdf_etl_ocr_inference_spark.operators.hnsw import build_hnsw_index
    from pdf_etl_ocr_inference_spark.scratch import scratch_dir

    root = scratch_dir("bench_graph_build")
    n, dim = 100_000, 64
    corpus = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(dim)),
            lambda p: F.sin(F.col("id") * p * 0.7),
        ).alias("embedding"),
    ).cache()
    corpus.count()
    t0 = _t.perf_counter()
    build_nsw_index(spark, corpus, f"{root}/nsw", n_shards=32)
    t_nsw = _t.perf_counter() - t0
    t0 = _t.perf_counter()
    build_hnsw_index(spark, corpus, f"{root}/hnsw", n_shards=32)
    t_hnsw = _t.perf_counter() - t0

    # Fixed-SHARD-SIZE scaling (r10, verdict #2): with n_shards
    # DERIVED (ceil(rows / GRAPH_SHARD_TARGET_ROWS)), growing the
    # corpus grows the shard COUNT while every shard stays ~target
    # rows — so build wall time per shard is flat, and total wall
    # time is flat too while the shard count fits one task wave
    # (scale-out: more data -> more parallel bounded builds, never a
    # bigger sequential one).
    from pdf_etl_ocr_inference_spark.operators.graph_ann import (
        _read_meta,
        derive_n_shards,
    )

    derived = {}
    for rows in (25_000, 100_000):
        sub = corpus.filter(F.col("vec_id") < rows)
        p = f"{root}/nsw_derived_{rows}"
        t0 = _t.perf_counter()
        build_nsw_index(spark, sub, p)  # n_shards derived
        dt = _t.perf_counter() - t0
        ns = _read_meta(p)["n_shards"]
        assert ns == derive_n_shards(rows)
        derived[f"rows_{rows}"] = {
            "n_shards_derived": ns,
            "build_sec": round(dt, 2),
            "sec_per_shard": round(dt / ns, 3),
        }
    d25, d100 = derived["rows_25000"], derived["rows_100000"]
    derived["wall_ratio_4x_rows"] = round(
        d100["build_sec"] / d25["build_sec"], 2
    )
    corpus.unpersist()
    shutil.rmtree(root, ignore_errors=True)
    return {
        "corpus_rows": n,
        "dim": dim,
        "n_shards": 32,
        "nsw_build_sec": round(t_nsw, 2),
        "hnsw_build_sec": round(t_hnsw, 2),
        "fixed_shard_size_scaling": derived,
    }


def serving_latency(spark) -> dict:
    """Pinned-index serving vs per-query shard re-read (r3 item).

    Builds a 48k x 64 sharded NSW graph, then measures: the COLD
    served query (workers parse + pin their shards), WARM served
    queries 2..6 (cache hits — no parquet touched), and the unpinned
    batch path (``topk_nsw``: full graph scan + shuffle per query,
    the ocr:167-170 online shape done wrong).  The headline number is
    warm vs unpinned — what pinning buys a repeated-query workload.
    """
    import time as _t

    from pyspark.sql import functions as F

    from pdf_etl_ocr_inference_spark.operators.graph_ann import (
        build_nsw_index,
        topk_nsw,
    )
    from pdf_etl_ocr_inference_spark.operators.serving import serve_topk
    from pdf_etl_ocr_inference_spark.scratch import scratch_dir

    n, dim, shards = 100_000, 128, 16
    corpus = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda j: F.pmod(F.xxhash64(F.col("id"), j), F.lit(2000)).cast(
                "double"
            )
            / 1000.0
            - 1.0,
        ).alias("embedding"),
    )
    path = f"{scratch_dir('serving_bench')}/graph"
    t0 = _t.monotonic()
    build_nsw_index(
        spark, corpus, path, n_shards=shards, m_neighbors=6,
        ef_construction=16,
    )
    build_s = _t.monotonic() - t0

    qrows = corpus.filter(F.col("vec_id") < 27).collect()
    qs = [(r["vec_id"], [float(v) for v in r["embedding"]]) for r in qrows]

    t0 = _t.monotonic()
    serve_topk(spark, path, [qs[0]], k=5, kind="nsw").collect()
    cold_s = _t.monotonic() - t0
    warm = []
    for q in qs[1:6]:
        t0 = _t.monotonic()
        serve_topk(spark, path, [q], k=5, kind="nsw").collect()
        warm.append(_t.monotonic() - t0)
    warm_s = sum(warm) / len(warm)
    # the online-server shape: 20 concurrent requests in one job —
    # per-query latency amortizes the fixed job overhead the
    # single-query warm number is floored by
    t0 = _t.monotonic()
    serve_topk(spark, path, qs[6:26], k=5, kind="nsw").collect()
    batch20_per_q = (_t.monotonic() - t0) / 20
    unp = []
    for q in qs[25:27]:
        t0 = _t.monotonic()
        topk_nsw(spark, path, q[1], k=5).collect()
        unp.append(_t.monotonic() - t0)
    unpinned_s = sum(unp) / len(unp)
    return {
        "corpus": n,
        "dim": dim,
        "build_s": round(build_s, 2),
        "cold_s": round(cold_s, 3),
        "warm_s": round(warm_s, 3),
        "warm_batch20_per_query_s": round(batch20_per_q, 3),
        "unpinned_s": round(unpinned_s, 3),
        "warm_vs_unpinned_speedup": round(unpinned_s / warm_s, 1),
        "batch_vs_unpinned_speedup": round(unpinned_s / batch20_per_q, 1),
    }


def dedup_family_attribution(spark) -> dict:
    """Attribute the dedup-family r3→r5 residual (verdict-r5 #4).

    Components measured at SF_DIR, median of 3:
    - ``exact_s``: exact dedup after the r6 perf pass (the round-robin
      full-text exchange before a cheap md5 projection is gone —
      recovers the r3→r5 regression on this entry);
    - ``minhash_xxhash64_s`` vs ``minhash_md5_s``: the cost of the
      DuckDB-replayable hash family that bought the real entries an
      oracle (the remaining delta vs r3 is the r4 clique-collapse
      stage — bought quadratic-proofing under mass duplication);
    - ``clusters_s`` + ``cc_control_jobs``: the iterative CC entry is
      driver-round bound — per round one neighbor-min shuffle, one
      checkpoint materialization, one convergence probe (the r6 pass
      removed the per-round labels re-join from the probe).
    """
    import statistics as _st
    import time as _t

    from pdf_etl_ocr_inference_spark.operators.dedup import (
        minhash_dedup_pairs,
    )
    from pdf_etl_ocr_inference_spark.plans import query_map

    qm = query_map()

    def med(fn):
        ts = []
        for _ in range(3):
            t0 = _t.perf_counter()
            fn()
            ts.append(_t.perf_counter() - t0)
        return round(_st.median(ts), 3)

    docs_sf = SF_DIR
    exact_s = med(lambda: qm["dedup_exact"](spark, docs_sf).collect())
    clusters_s = med(lambda: qm["dedup_clusters"](spark, docs_sf).collect())

    from pdf_etl_ocr_inference_spark.sources.catalog import load_table

    docs = load_table(spark, docs_sf, "documents")
    fam = {}
    for family in ("xxhash64", "md5"):
        fam[family] = med(
            lambda fam_=family: minhash_dedup_pairs(
                docs, "text", "doc_id", num_hashes=32, num_bands=8,
                jaccard_threshold=0.5, hash_family=fam_,
            ).collect()
        )
    return {
        "exact_s": exact_s,
        "clusters_s": clusters_s,
        "minhash_xxhash64_s": fam["xxhash64"],
        "minhash_md5_s": fam["md5"],
        "md5_family_cost_x": round(
            fam["md5"] / max(fam["xxhash64"], 1e-9), 2
        ),
    }


def load_reference(spark) -> float:
    """Fixed-work pure-CPU reference job (verdict-r6 #7): 6×10⁸
    xxhash64-sum over an in-memory range — no I/O, no shuffle, no
    Python workers — timed identically every round (≈1 s of work;
    the first 2×10⁸ sizing was too short to time steadily).  Its wall time
    moves ONLY with host load/frequency, so the ratio against the
    pinned calibration constant separates environmental drift from
    real regressions when comparing BENCH_r{N} files."""
    from pyspark.sql import functions as SF

    from pdf_etl_ocr_inference_spark.session import _cpus

    def run(n: int) -> float:
        t0 = time.perf_counter()
        (
            spark.range(0, n, 1, _cpus())
            # pmod bounds the summand so the ANSI sum can't overflow
            .select(SF.sum(SF.pmod(SF.xxhash64("id"), SF.lit(1_000_000))))
            .collect()
        )
        return time.perf_counter() - t0

    run(1_000_000)  # absorb codegen/JIT so the probe times pure work
    return round(run(600_000_000), 3)


# Calibration constant: median warm load_reference() on the build
# host while otherwise idle (r7).  load_normalizer ≈ 1.0 on an idle
# host; > 1 means the round ran on a loaded/slower machine and
# headline times should be discounted by roughly that factor.
LOAD_REF_BASELINE_S = 0.48


def load_reference_parallel(spark) -> float:
    """FULL-WIDTH Python-worker CPU reference (r10 verdict #3): one
    fixed numpy kernel per core, dispatched as a single mapInPandas
    wave, timed wall-clock.  The JVM-burst reference above provably
    underestimates multi-core co-tenant contention (r10: every
    headline query uniformly ~1.9× at normalizer only ~1.18): a
    co-tenant stealing k of 32 cores barely stretches a short
    JVM burst (tasks timeshare), but stretches a full wave of
    pinned single-core Python kernels ~1:1 — which is the shape the
    headline queries' mapInPandas/window stages actually run.
    Report BOTH normalizers; quote round-over-round deltas against
    the parallel one."""
    import pandas as _pd  # noqa: F401 (worker-side import check)

    from pdf_etl_ocr_inference_spark.session import _cpus

    n_tasks = _cpus()

    def kernel(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            x = np.arange(1_000_000, dtype=np.uint64)
            for _ in range(60):  # ~0.3 s of pure ALU work per core
                x = x * np.uint64(0x9E3779B97F4A7C15) + np.uint64(1)
                x ^= x >> np.uint64(31)
            yield pd.DataFrame(
                {"r": [int(x[0] & np.uint64(0x7FFFFFFF))] * len(pdf)}
            )

    def run() -> float:
        t0 = time.perf_counter()
        (
            spark.range(0, n_tasks, 1, n_tasks)
            .mapInPandas(kernel, schema="r long")
            .collect()
        )
        return time.perf_counter() - t0

    run()  # absorb worker-pool spawn + numpy import
    return round(min(run(), run()), 3)


# Pinned baseline for load_reference_parallel: the wave is
# memory-BANDWIDTH-bound by design (32 concurrent 8 MB-array
# kernels saturate the socket even when idle — that shared-resource
# sensitivity is what makes it see co-tenant contention the JVM
# burst misses), so its idle value is NOT 32× ALU math (0.19 s
# kernel + dispatch ≈ 0.5) but the bandwidth-saturated wave.
# r12 re-pin (r11 verdict #5): the r11 constant 1.42 was "best
# observed on a never-idle host"; this round measured the wave in a
# VERIFIED calm window (1-min loadavg 0.50 before the session, the
# r10 uptime-polling practice): min-of-4 runs (each itself min-of-2)
# = 0.704 s.  Pinned at 0.70 so the normalizer reads ≈1.0 on this
# idle host; round-over-round RATIOS divide the constant out either
# way.  NOTE for cross-round reads: this host's memory subsystem is
# ~2× faster on the wave than the r11 build host (same calm window
# read single-thread load_reference 0.696 vs ITS 0.48 pin — slower
# single-thread, faster bandwidth), so quote r11→r12 deltas through
# the normalizers, not raw.
#
# r13 (ADVICE-r12): the pin is recorded PER HOST TAG so cross-round
# ratio claims never silently mix pins from different machines — the
# published JSON carries pin_host beside the constant; a bench run on
# an unpinned host falls back to the last pin and the mismatch is
# visible in the metadata.  The r12 0.70 pin was measured on this
# "vm" image (calm-window min-of-4, see above).
LOAD_REF_PARALLEL_PINS = {"vm": 0.70}


def _parallel_pin() -> float:
    import platform

    return LOAD_REF_PARALLEL_PINS.get(platform.node(), 0.70)


LOAD_REF_PARALLEL_BASELINE_S = _parallel_pin()


def op45_attribution(spark) -> dict:
    """Stage-level attribution for op45_stream_tumbling (r10 verdict
    #1: 2.06× round-over-round on byte-unchanged code — the largest
    unexplained number in BENCH_r10; availableNow micro-batch jobs
    put checkpoint + state store on /tmp, the most fs-contention-
    sensitive shape in the headline set).  Median of 3 per stage at
    SF_DIR:

    - ``batch_equiv_s``      : the SAME windowed agg as a plain batch
      query — the pure data-plane cost, no streaming machinery;
    - ``stream_passthrough_s``: an availableNow pass-through (raw
      events → memory sink, append, no stateful agg) — adds
      micro-batch planning, source listing, query start/stop and
      sink, but NO state store;
    - ``full_s``             : the whole entry (stateful complete-mode
      agg; checkpoint + state store on the r11 tmpfs default) — the
      delta over passthrough is state-store update + complete-mode
      emission + checkpoint IO;
    - ``full_tmp_s``         : the whole entry with its checkpoint +
      state store FORCED onto /tmp (the pre-r11 shape) — if /tmp IO
      contention is the drift mechanism (r10's 2.06×), this arm
      shows it while full_s stays flat.
    """
    import statistics as _st

    from pyspark.sql import functions as SF

    from pdf_etl_ocr_inference_spark.sources.catalog import TABLES
    from pdf_etl_ocr_inference_spark.streaming.incremental import (
        run_available_now,
        stream_events_raw,
        stream_events_tumbling,
    )

    events_path = f"{SF_DIR}/events.parquet"

    def med(fn):
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        return round(_st.median(ts), 3)

    def batch_equiv():
        ev = spark.read.parquet(events_path)
        (
            ev.groupBy(
                SF.window("ts", "10 minutes").alias("w"), "event_type"
            )
            .agg(
                SF.count("*").alias("n"),
                SF.round(
                    SF.sum(
                        SF.round(SF.col("value") * 100, 0).cast("long")
                    )
                    / 100.0,
                    2,
                ).alias("sum_value"),
            )
            .collect()
        )

    def passthrough():
        stream = stream_events_raw(spark, events_path, TABLES["events"])
        run_available_now(stream, output_mode="append").count()

    def full(checkpoint_dir=None):
        streaming = stream_events_tumbling(
            spark,
            events_path,
            TABLES["events"],
            window="10 minutes",
            watermark="30 minutes",
        )
        run_available_now(
            streaming,
            output_mode="complete",
            checkpoint_dir=checkpoint_dir,
        ).count()

    import shutil as _sh
    import uuid as _uuid

    out = {
        "batch_equiv_s": med(batch_equiv),
        "stream_passthrough_s": med(passthrough),
        "full_s": med(full),
    }
    tmp_root = f"/tmp/spark_graft_ckpt_ab_{_uuid.uuid4().hex[:8]}"

    def full_tmp():
        full(f"{tmp_root}/{_uuid.uuid4().hex[:8]}")

    try:
        out["full_tmp_s"] = med(full_tmp)
    finally:
        _sh.rmtree(tmp_root, ignore_errors=True)
    return out


def q13_attribution(spark) -> dict:
    """Stage-level attribution for tpch_q13 (verdict-r6 #3: +66% in
    r6 with untouched code).  Median of 3 per stage at SF_DIR:

    - ``scans_s``     : both input scans alone (filter + projection);
    - ``preagg_s``    : + the per-custkey COUNT below the join;
    - ``full_s``      : the whole query (join + final distribution).

    The deltas localize any future drift to scan / agg-shuffle /
    join, the way dedup_family_attribution settled the dedup family.
    """
    import statistics as _st

    from pyspark.sql import functions as SF

    from pdf_etl_ocr_inference_spark.plans import query_map
    from pdf_etl_ocr_inference_spark.sources.catalog import load_table

    def med(fn):
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        return round(_st.median(ts), 3)

    def scans():
        load_table(spark, SF_DIR, "customer").select("c_custkey").count()
        (
            load_table(spark, SF_DIR, "orders")
            .filter(SF.col("o_orderpriority") != "5-LOW")
            .select("o_custkey", "o_orderkey")
            .count()
        )

    def preagg():
        (
            load_table(spark, SF_DIR, "orders")
            .filter(SF.col("o_orderpriority") != "5-LOW")
            .groupBy("o_custkey")
            .agg(SF.count("o_orderkey").alias("_n"))
            .count()
        )

    qm = query_map()
    return {
        "scans_s": med(scans),
        "preagg_s": med(preagg),
        "full_s": med(lambda: qm["tpch_q13"](spark, SF_DIR).count()),
    }


def minhash_attribution(spark) -> dict:
    """Stage-level attribution for dedup_minhash_lsh (verdict-r7 #3:
    the most expensive headline query at ~3 s, drifted +4.6% under
    load with untouched code).  Median of 3 per cumulative stage at
    SF_DIR with the entry's exact parameters (md5 family, 32 hashes,
    8 bands, threshold 0.5):

    - ``cliques_s``   : shingle pass + set-fingerprint clique
      collapse (reps + survivor map materialized);
    - ``signature_s`` : + the 32 affine-md5 min-aggregates over the
      representative shingle sets;
    - ``band_s``      : + banding and the bucket-group pair
      generation (sorted-id chained explodes) to deduped candidate
      pairs;
    - ``full_s``      : the whole entry (Jaccard verify + clique
      re-expansion included).

    The deltas localize any future md5-family cost drift to
    shingle/collapse vs hash family vs band join vs verify/expand —
    the q13_attribution pattern applied to the dedup headline.
    """
    import statistics as _st

    from pyspark.sql import functions as SF

    from pdf_etl_ocr_inference_spark.operators.dedup import (
        minhash_dedup_pairs,
        minhash_lsh_candidates,
        seeded_hashes,
        shingle_cliques,
    )
    from pdf_etl_ocr_inference_spark.sources.catalog import load_table

    def med(fn):
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        return round(_st.median(ts), 3)

    def docs():
        return load_table(spark, SF_DIR, "documents")

    def cliques():
        reps, smap = shingle_cliques(docs(), "text", "doc_id")
        smap.count()
        reps.count()

    def sigs_df():
        reps, _smap = shingle_cliques(docs(), "text", "doc_id")
        exploded = reps.select(
            SF.col("doc_id"), SF.explode("shingles").alias("_sh")
        )
        hs = seeded_hashes("_sh", 32, "md5")
        per_doc = exploded.groupBy("doc_id").agg(
            *[SF.min(h).alias(f"_h{i}") for i, h in enumerate(hs)]
        )
        return per_doc.select(
            SF.col("doc_id"),
            SF.array(*[SF.col(f"_h{i}") for i in range(32)]).alias("sig"),
        )

    def signature():
        sigs_df().count()

    def band():
        minhash_lsh_candidates(
            sigs_df(), "doc_id", 8, rows_per_band=4, hash_family="md5"
        ).count()

    def full():
        minhash_dedup_pairs(
            docs(), "text", "doc_id", num_hashes=32, num_bands=8,
            jaccard_threshold=0.5, hash_family="md5",
        ).count()

    out = {
        "cliques_s": med(cliques),
        "signature_s": med(signature),
        "band_s": med(band),
        "full_s": med(full),
    }
    # shingle_cliques persists its one-pass frame per call; drop the
    # 12 accumulated cache entries before the next bench block
    spark.catalog.clearCache()
    return out


def pagerank_attribution(spark) -> dict:
    """Stage-level attribution for graph_pagerank (r9 verdict #6: at
    ~9.4 s in the sf0.1 sweep it is the repo's most expensive entry
    and had no breakdown — a future regression should localize in
    minutes, the q13/minhash pattern).  Median of 3 per CUMULATIVE
    stage at SF_DIR with the entry's exact parameters (6-gram share
    graph, 3 iterations, d=0.85):

    - ``dedup_s`` : exact-dup clique collapse to survivors;
    - ``grams_s`` : + the positional 6-gram pass over survivors;
    - ``edges_s`` : + the gram-bucket pair generation and edge
      symmetrization (the one gram-keyed shuffle — the data-bound
      stage, ∝ cross-doc duplication);
    - ``full_s``  : the whole entry (node count + 3 power
      iterations + dangling redistribution — the iteration-bound
      tail, flat in data per the sweep's ratio_10x_data 1.4).
    """
    import statistics as _st

    from pyspark.sql import functions as SF

    from pdf_etl_ocr_inference_spark.operators.dedup import exact_dedup
    from pdf_etl_ocr_inference_spark.operators.span_dedup import (
        positional_ngrams,
    )
    from pdf_etl_ocr_inference_spark.plans.scale_plans import (
        _gram_share_pairs,
        graph_pagerank,
    )
    from pdf_etl_ocr_inference_spark.sources.catalog import load_table

    def med(fn):
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        return round(_st.median(ts), 3)

    def docs():
        return exact_dedup(
            load_table(spark, SF_DIR, "documents").select(
                "doc_id", "text"
            ),
            "text",
            "doc_id",
        )

    def occ():
        return positional_ngrams(docs(), "text", "doc_id", 6).select(
            "id", "gram"
        )

    def edges():
        dp = _gram_share_pairs(occ())
        return dp.select(
            SF.col("ia").alias("src"), SF.col("ib").alias("dst")
        ).unionByName(
            dp.select(SF.col("ib").alias("src"), SF.col("ia").alias("dst"))
        )

    return {
        "dedup_s": med(lambda: docs().count()),
        "grams_s": med(lambda: occ().count()),
        "edges_s": med(lambda: edges().count()),
        "full_s": med(lambda: graph_pagerank(spark, SF_DIR).count()),
    }


def minhash_family_premium(spark) -> dict:
    """The headline ``dedup_minhash_lsh`` entry pins the md5 hash
    family purely for DuckDB value-replay (~1.23x vs xxhash64 per
    the r8 verdict); library callers get the xxhash64 default.  This
    block runs the SAME parameters under both families at SF_DIR so
    the published headline number carries its production counterpart
    (r9, verdict #2) — the answers themselves agree
    (tests/test_hash_family_parity.py pins pair-set equality)."""
    import statistics as _st

    from pdf_etl_ocr_inference_spark.operators.dedup import (
        minhash_dedup_pairs,
    )
    from pdf_etl_ocr_inference_spark.sources.catalog import load_table

    docs = load_table(spark, SF_DIR, "documents")

    def med(fam):
        outs = []
        for _ in range(3):
            t0 = time.perf_counter()
            minhash_dedup_pairs(
                docs, "text", "doc_id",
                num_hashes=32, num_bands=8, jaccard_threshold=0.5,
                hash_family=fam,
            ).count()
            outs.append(time.perf_counter() - t0)
        return round(_st.median(outs), 3)

    md5_s = med("md5")
    xx_s = med("xxhash64")
    return {
        "gate_md5_s": md5_s,
        "production_xxhash64_s": xx_s,
        "gate_premium": round(md5_s / xx_s, 2),
    }


def dedup_dup_scaling(spark) -> dict:
    """Candidate volume under mass duplication stays LINEAR (r3 fix).

    Plants a boilerplate clique of growing depth d inside a 5k-doc
    distinct corpus and measures (a) rows entering the band join
    (`shingle_cliques` representatives — the candidate-volume
    driver), (b) wall time of the verified near-dup pipeline through
    the expansion.  Pre-collapse the band join cost grew ∝ d² (one
    bucket of depth d per band); post-collapse the rep count is
    CONSTANT in d and only the irreducible pair OUTPUT grows.
    """
    import time as _t

    from pyspark.sql import functions as F

    from pdf_etl_ocr_inference_spark.operators.dedup import (
        minhash_dedup_pairs,
        shingle_cliques,
    )

    def _corpus(d):
        distinct = spark.range(5_000).select(
            F.col("id").alias("doc_id"),
            F.concat_ws(
                " ",
                F.transform(
                    F.sequence(F.lit(0), F.lit(30)),
                    lambda j: F.concat(
                        F.lit("w"),
                        (F.col("id") * 31 + j * 7).cast("string"),
                    ),
                ),
            ).alias("text"),
        )
        clique = spark.range(d).select(
            (F.col("id") + 100_000).alias("doc_id"),
            F.lit(
                "terms of service apply to every visitor of this "
                "mirrored page and always will apply here"
            ).alias("text"),
        )
        return distinct.unionByName(clique)

    out = {}
    for d in (1_000, 4_000):
        docs = _corpus(d)
        reps, _ = shingle_cliques(docs, "text", "doc_id")
        t0 = _t.monotonic()
        n_reps = reps.count()
        t1 = _t.monotonic()
        n_pairs = minhash_dedup_pairs(
            docs, "text", "doc_id", jaccard_threshold=0.5
        ).count()
        t2 = _t.monotonic()
        out[f"d{d}"] = {
            "banded_reps": n_reps,
            "pairs": n_pairs,
            "collapse_s": round(t1 - t0, 2),
            "pipeline_s": round(t2 - t1, 2),
        }
    out["reps_constant"] = (
        out["d1000"]["banded_reps"] == out["d4000"]["banded_reps"]
    )
    return out



def bm25_index_speedup(spark) -> dict:
    """Postings-index BM25 vs the corpus-scan path on a synthetic
    200k-doc corpus: the scan re-tokenizes every document per query;
    the probe reads only the query terms' partition dirs and scores
    from the index meta.  Headline = per-query scan/probe ratio over
    5 repeated queries (the served-search workload shape)."""
    import time as _t

    from pyspark.sql import functions as F

    from pdf_etl_ocr_inference_spark.operators.search import (
        bm25_topk,
        bm25_topk_indexed,
        build_postings_index,
    )
    from pdf_etl_ocr_inference_spark.scratch import scratch_dir

    n = 200_000
    # filler vocabulary EXCLUDES the query terms; ~2% of docs carry
    # them as a suffix — selective-term retrieval, the workload shape
    # an index exists for (a stopword query degenerates every path to
    # corpus-sized candidate sets and benchmarks nothing)
    words = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
             "filter merge sort scan hash".split())
    body = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(0), F.lit(39)),
            lambda j: F.element_at(
                F.array(*[F.lit(w) for w in words]),
                (F.pmod(F.xxhash64(F.col("id"), j), F.lit(len(words)))
                 + 1).cast("int"),
            ),
        ),
    )
    corpus = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(
            F.col("id") % 53 == 0,
            F.concat(body, F.lit(" spark vector join")),
        ).otherwise(body).alias("text"),
    )
    corpus = corpus.cache()
    corpus.count()
    path = f"{scratch_dir('postings_bench')}/index"
    t0 = _t.monotonic()
    build_postings_index(spark, corpus, path)
    build_s = _t.monotonic() - t0
    terms = ["spark", "vector", "join"]

    t0 = _t.monotonic()
    for _ in range(5):
        bm25_topk(corpus, "text", "doc_id", terms, k=10).collect()
    scan_s = (_t.monotonic() - t0) / 5

    bm25_topk_indexed(spark, path, terms, k=10).collect()  # warm cache
    t0 = _t.monotonic()
    for _ in range(5):
        bm25_topk_indexed(spark, path, terms, k=10).collect()
    probe_s = (_t.monotonic() - t0) / 5

    from pdf_etl_ocr_inference_spark.operators.search import serve_bm25

    serve_bm25(spark, path, [(0, terms)], k=10).collect()  # pin shards
    t0 = _t.monotonic()
    for _ in range(5):
        serve_bm25(spark, path, [(0, terms)], k=10).collect()
    served_s = (_t.monotonic() - t0) / 5
    corpus.unpersist()
    return {
        "corpus_rows": n,
        "build_s": round(build_s, 2),
        "scan_per_query_s": round(scan_s, 3),
        "probe_per_query_s": round(probe_s, 3),
        "served_warm_per_query_s": round(served_s, 3),
        "probe_speedup": round(scan_s / probe_s, 1),
        "served_speedup": round(scan_s / served_s, 1),
    }


def file_skipping_speedup(spark) -> dict:
    """File-level data skipping at 4M rows × 64 files: a range box on
    the CLUSTERED column via the footer-stats sidecar, and a 5-id
    point lookup on an UNCLUSTERED column via the per-file Bloom
    sidecar (min/max provably keeps all 64 files there — every file
    spans ~the full id range).  Reports files read and wall-time
    ratios vs the full scan; the file-count ratio is the number that
    scales (at 100 TB the same plan reads ~1/16 resp. ~1/64 of the
    files)."""
    import time as _t

    from pyspark.sql import functions as F

    from pdf_etl_ocr_inference_spark.operators.layout import (
        build_file_bloom,
        collect_file_stats,
        scan_point_lookup,
        scan_with_skipping,
    )

    n, n_files = 4_000_000, 64
    path = "/tmp/spark_graft_scratch/skipping_table_4m"
    if not os.path.exists(path):
        (
            spark.range(0, n, 1, 32)
            .select(
                F.col("id"),
                F.pmod(F.xxhash64("id"), F.lit(1_000_000)).alias("ckey"),
                (F.col("id") % 997).cast("double").alias("val"),
            )
            .repartitionByRange(n_files, "ckey")
            .sortWithinPartitions("ckey")
            .write.mode("overwrite")
            .parquet(path)
        )
    stats = collect_file_stats(spark, path, ["ckey"])
    stats.cache().count()
    build_file_bloom(spark, path, "id")
    probe_ids = [7, 1_234_567, 2_000_001, 3_333_333, 3_999_999]

    def best(fn, reps=3):
        out = []
        for _ in range(reps):
            t0 = _t.perf_counter()
            fn()
            out.append(_t.perf_counter() - t0)
        return round(min(out), 3)

    box = (F.col("ckey") >= 500_000) & (F.col("ckey") < 562_500)  # 1/16
    t_full_range = best(
        lambda: spark.read.parquet(path)
        .filter(box)
        .agg(F.sum("val"))
        .collect()
    )
    pruned, range_read, range_total = scan_with_skipping(
        spark, path, {"ckey": (500_000, 562_499)}, stats=stats
    )
    t_pruned_range = best(
        lambda: pruned.filter(box).agg(F.sum("val")).collect()
    )

    t_full_point = best(
        lambda: spark.read.parquet(path)
        .filter(F.col("id").isin(probe_ids))
        .collect()
    )
    hit, bloom_read, bloom_total = scan_point_lookup(
        spark, path, "id", probe_ids
    )
    t_bloom_point = best(lambda: hit.collect())
    stats.unpersist()
    return {
        "rows": n,
        "n_files": n_files,
        "range_files_read": range_read,
        "range_scan_sec": t_full_range,
        "range_pruned_sec": t_pruned_range,
        "range_speedup": round(t_full_range / t_pruned_range, 1),
        "bloom_files_read": bloom_read,
        "point_scan_sec": t_full_point,
        "point_bloom_sec": t_bloom_point,
        "point_speedup": round(t_full_point / t_bloom_point, 1),
    }


def layout_rewrite_served(spark) -> dict:
    """The optimizer-routed skipping rewrite end-to-end at 4M rows —
    and, since r5, the COST GATE that keeps it honest at this scale:
    the table is ~120 MB, so the pruned-away bytes cannot pay the
    fixed rewrite overhead (r4 measured warm_speedup_vs_brute 0.8),
    and the DEFAULT policy now declines — warm_speedup_vs_brute is
    computed for the default policy and must sit at ~1.0 (brute plan
    + a declined-decision overhead of a few ms).  The routed path is
    still measured under an explicit ``min_saved_bytes=0`` so the
    pruning machinery's cold/warm cost stays visible; the file-count
    ratio (5/64 read) remains the quantity that scales to 100 TB,
    where savings are TBs and the gate always fires."""
    import time as _t

    from pyspark.sql import functions as F

    from pdf_etl_ocr_inference_spark.operators.layout import (
        register_clustered_layout,
    )
    from pdf_etl_ocr_inference_spark.optimizer import (
        rewrite_skipping_scan,
    )

    path = "/tmp/spark_graft_scratch/skipping_table_4m"
    t0 = _t.perf_counter()
    register_clustered_layout(
        spark, path, [{"col": "ckey", "kind": "int"}], bits=20,
        n_files=64, bloom_cols=["id"],
    )
    t_register = round(_t.perf_counter() - t0, 3)

    box = (F.col("ckey") >= 500_000) & (F.col("ckey") < 562_500)

    def q():
        return spark.read.parquet(path).filter(box)

    def run(df):
        return df.agg(F.sum("val")).collect()

    t_brutes = []
    for _ in range(3):
        t0 = _t.perf_counter()
        brute = run(q())
        t_brutes.append(_t.perf_counter() - t0)
    t_brute = round(min(t_brutes), 3)

    # default policy: the gate declines here (savings < threshold) —
    # measure the decision overhead and express the default-policy
    # cost as brute + decision
    decide = []
    default_declines = True
    for _ in range(3):
        probe_df = q()
        t0 = _t.perf_counter()
        ddf = rewrite_skipping_scan(probe_df)
        decide.append(_t.perf_counter() - t0)
        default_declines = default_declines and ddf is probe_df
    t_decide = min(decide)

    t0 = _t.perf_counter()
    cold_df = rewrite_skipping_scan(q(), min_saved_bytes=0)
    t_rewrite_cold = round(_t.perf_counter() - t0, 3)
    t0 = _t.perf_counter()
    cold = run(cold_df)
    t_cold = round(_t.perf_counter() - t0 + t_rewrite_cold, 3)

    warm_total, rewrite_warm = [], []
    for _ in range(3):
        t0 = _t.perf_counter()
        wdf = rewrite_skipping_scan(q(), min_saved_bytes=0)
        rewrite_warm.append(_t.perf_counter() - t0)
        run(wdf)
        warm_total.append(_t.perf_counter() - t0)
    # float SUM reduction order differs across scan schedules: compare
    # with relative tolerance, not equality
    b, c = brute[0][0], cold[0][0]
    assert abs(b - c) <= 1e-9 * max(abs(b), 1.0), (b, c)
    t_default = t_brute + t_decide
    return {
        "rows": 4_000_000,
        "register_s": t_register,
        "brute_s": t_brute,
        "default_policy_declines": bool(default_declines),
        "decline_decision_ms": round(t_decide * 1000, 1),
        "default_s": round(t_default, 3),
        # the headline: with the cost gate, the optimizer-routed query
        # pays brute + decision — no longer the r4 28% LOSS.  New key
        # name (advice-r5): r4's warm_speedup_vs_brute measured the
        # forced-on routed path; this measures decision overhead only
        # and is ≤ 1.0 by construction — comparing the two under one
        # key would be apples-to-oranges across rounds.
        "default_policy_speedup_vs_brute": round(t_brute / t_default, 1),
        "routed_cold_s": t_cold,
        "routed_warm_s": round(min(warm_total), 3),
        "rewrite_warm_ms": round(min(rewrite_warm) * 1000, 1),
        "routed_warm_speedup_vs_brute": round(
            t_brute / min(warm_total), 1
        ),
    }


def partitioned_prune(spark) -> dict:
    """Multi-level layout at 4M rows x 64 files: 16 coarse hive dirs
    (ckey buckets of 62.5k) + fine Z-order within.  The 1/16 box
    query keeps exactly its bucket's DIRECTORY via the pure
    path-string filter, so only that dir's stats rows are even
    relevant — the quantity that matters at 100 TB, where the stats
    sidecar is rows ∝ files (~100k) but a bounded query touches one
    bucket's worth.  Reports dirs/files kept at each level plus
    end-to-end result parity through the optimizer rule.  Runs AFTER
    layout_rewrite_served (both register the same scratch source; the
    last registration wins within a bench pass)."""
    import time as _t

    from pyspark.sql import functions as F

    from pdf_etl_ocr_inference_spark.operators.layout import (
        _file_partition_value,
        _live_stat_map,
        layout_key,
        partition_keep_files,
        register_clustered_layout,
        stats_keep_files,
    )
    from pdf_etl_ocr_inference_spark.optimizer import (
        IndexCatalog,
        rewrite_skipping_scan,
    )

    path = "/tmp/spark_graft_scratch/skipping_table_4m"
    pspec = {"col": "ckey", "kind": "int", "width": 62_500}
    t0 = _t.perf_counter()
    register_clustered_layout(
        spark, path, [{"col": "ckey", "kind": "int"}], bits=20,
        n_files=64, partition_spec=pspec,
    )
    t_register = round(_t.perf_counter() - t0, 3)
    meta = IndexCatalog().lookup(layout_key(path))

    live = set(_live_stat_map(meta["layout_path"]))
    ranges = {"ckey": (500_000.0, 562_499.0)}
    dir_kept = partition_keep_files(live, pspec, ranges)
    skeep, scov = stats_keep_files(spark, meta, ranges)
    final = dir_kept & ((skeep & scov) | (live - scov))
    dirs_total = len({_file_partition_value(f) for f in live})
    dirs_kept = len({_file_partition_value(f) for f in dir_kept})

    box = (F.col("ckey") >= 500_000) & (F.col("ckey") < 562_500)
    brute = (
        spark.read.parquet(path).filter(box).agg(F.sum("val")).collect()
    )
    opt_df = rewrite_skipping_scan(
        spark.read.parquet(path).filter(box), min_saved_bytes=0
    )
    routed = opt_df.agg(F.sum("val")).collect()
    b, r = brute[0][0], routed[0][0]
    assert abs(b - r) <= 1e-9 * max(abs(b), 1.0), (b, r)
    return {
        "rows": 4_000_000,
        "register_s": t_register,
        "dirs_total": dirs_total,
        "dirs_kept_by_path_filter": dirs_kept,
        "files_total": len(live),
        "files_after_dir_prune": len(dir_kept),
        "files_scheduled": len(final),
        "stats_rows_relevant_fraction": round(
            len(dir_kept) / max(len(live), 1), 3
        ),
    }


def pinned_sidecar_serving(spark) -> dict:
    """Executor-pinned sidecar keep-lists at 4M rows / 64 files
    (verdict-r7 #4): the over-driver-budget serving path now parses
    sidecar chunks ONCE per worker per layout version (the pre-r8
    fallback re-scanned the sidecar parquet every query).  Reports
    cold (first parse) vs warm (worker-cache) keep-list wall for the
    range-stats and Bloom probes, keep-list parity with the
    driver-pinned path, and the driver-side sidecar payload reads
    during the warm runs — the contract number, which must be 0."""
    import statistics as _st
    import time as _t

    from pdf_etl_ocr_inference_spark.operators import layout as L
    from pdf_etl_ocr_inference_spark.operators.layout import (
        layout_key,
        register_clustered_layout,
    )
    from pdf_etl_ocr_inference_spark.optimizer import IndexCatalog

    path = "/tmp/spark_graft_scratch/skipping_table_4m"
    register_clustered_layout(
        spark, path, [{"col": "ckey", "kind": "int"}], bits=20,
        n_files=64, bloom_cols=["id"],
    )
    meta = IndexCatalog().lookup(layout_key(path))
    ranges = {"ckey": (500_000.0, 562_500.0)}
    probe_ids = [7, 1_234_567, 2_000_001, 3_333_333, 3_999_999]

    def timed(fn):
        t0 = _t.perf_counter()
        out = fn()
        return out, _t.perf_counter() - t0

    drv_keep, drv_cov = L.stats_keep_files(spark, meta, ranges)
    # every call below is the executor-pinned path: the read counter
    # must not move from here on
    reads_before = L.DRIVER_SIDECAR_READS
    (keep_cold, cov_cold), stats_cold = timed(
        lambda: L._stats_keep_executor_pinned(spark, meta, ranges)
    )
    warms = []
    for _ in range(3):
        (k, c), el = timed(
            lambda: L._stats_keep_executor_pinned(spark, meta, ranges)
        )
        assert (k, c) == (keep_cold, cov_cold)
        warms.append(el)
    (bkeep_cold, _bc), bloom_cold = timed(
        lambda: L._bloom_keep_executor_pinned(spark, meta, "id", probe_ids)
    )
    bwarms = []
    for _ in range(3):
        (bk, _c), el = timed(
            lambda: L._bloom_keep_executor_pinned(
                spark, meta, "id", probe_ids
            )
        )
        assert bk == bkeep_cold
        bwarms.append(el)
    return {
        "files": 64,
        "stats_cold_s": round(stats_cold, 3),
        "stats_warm_s": round(_st.median(warms), 3),
        "bloom_cold_s": round(bloom_cold, 3),
        "bloom_warm_s": round(_st.median(bwarms), 3),
        "keep_matches_driver_pinned": (keep_cold, cov_cold)
        == (drv_keep, drv_cov),
        "files_kept_range": len(keep_cold),
        "files_kept_bloom": len(bkeep_cold),
        # the contract: warm executor-pinned serving reads ZERO
        # sidecar payloads on the driver
        "driver_sidecar_reads_during_warm": L.DRIVER_SIDECAR_READS
        - reads_before,
    }


def skipping_attribution(spark) -> dict:
    """Stage attribution for the layout-routed skipping entries (r9:
    op70d/op70f drifted +20-25% in the r9 driver band and were
    A/B-attributed to host load — this block makes the NEXT drift
    triage mechanical, the q13/minhash pattern).  Cumulative medians
    on op70d's exact table/predicates:

    - ``keep_ms``   : keep-list computation alone (driver python
      over pinned sidecar rows + the O(1) freshness probe — zero
      Spark jobs);
    - ``scan_s``    : + the pruned parquet scan of the kept files;
    - ``full_s``    : the whole routed entry (optimize() rewrite,
      predicate re-application, projection restore).
    """
    import os as _os
    import statistics as _st
    import time as _t

    from pyspark.sql import functions as SF

    from pdf_etl_ocr_inference_spark.operators import layout as L
    from pdf_etl_ocr_inference_spark.optimizer import (
        IndexCatalog,
        optimize,
    )

    src = _os.path.join(SF_DIR, "orders.parquet")
    cat = IndexCatalog()
    meta = cat.lookup(L.layout_key(src))
    if meta is None:
        L.register_clustered_layout(
            spark, src,
            [
                {"col": "o_custkey", "kind": "int"},
                {"col": "o_orderdate", "kind": "days",
                 "origin": "1995-01-01"},
            ],
        )
        meta = cat.lookup(L.layout_key(src))
    ranges = {"o_custkey": (100.0, 299.0)}

    def med(fn, reps=3):
        out = []
        for _ in range(reps):
            t0 = _t.perf_counter()
            fn()
            out.append(_t.perf_counter() - t0)
        return _st.median(out)

    keep_ms = med(lambda: L.stats_keep_files(spark, meta, ranges)) * 1000

    def scan():
        keep, covered = L.stats_keep_files(spark, meta, ranges)
        current = set(L.cached_live_stat_map(meta))
        files = sorted(((keep & covered) | (current - covered)) & current)
        if files:
            spark.read.parquet(*files).count()

    scan_s = med(scan)

    brute = spark.read.parquet(src).filter(
        SF.col("o_custkey").between(100, 299)
        & (SF.col("o_orderdate") >= SF.lit("1996-01-01").cast("timestamp"))
        & (SF.col("o_orderdate") < SF.lit("1997-01-01").cast("timestamp"))
    )
    full_s = med(
        lambda: optimize(brute, catalog=cat, min_saved_bytes=0).count()
    )
    return {
        "keep_ms": round(keep_ms, 1),
        "scan_s": round(scan_s, 3),
        "full_s": round(full_s, 3),
    }


def _tiny_file_table(spark, n_files: int) -> str:
    """A metadata-dominated table: ``n_files`` parquet files of 4
    ascending ids each (file i holds ids 4i..4i+3) — the fixture both
    manifest scale blocks share.  Idempotent across bench runs."""
    from pdf_etl_ocr_inference_spark.operators import layout as L

    path = f"/tmp/spark_graft_scratch/manifest_lookup_{n_files}"
    have = 0
    if os.path.isdir(path):
        have = sum(
            1
            for f in os.listdir(path)
            if f.endswith(".parquet") and not f.startswith(("_", "."))
        )
    if have != n_files:
        import shutil

        shutil.rmtree(path, ignore_errors=True)
        os.makedirs(path)

        def _writer(batches):
            import pandas as _pd
            import pyarrow as _pa
            import pyarrow.parquet as _pq

            for pdf in batches:
                for i in pdf["id"]:
                    i = int(i)
                    t = _pa.table(
                        {
                            "id": _pa.array(
                                [i * 4 + j for j in range(4)],
                                _pa.int64(),
                            )
                        }
                    )
                    _pq.write_table(t, f"{path}/f{i:06d}.parquet")
                yield _pd.DataFrame({"n": [len(pdf)]})

        spark.range(n_files).repartition(32).mapInPandas(
            _writer, schema="n long"
        ).count()
    if not os.path.isdir(f"{path}/_bloom_id") or (
        L._read_manifest_doc(path, "bloom_id") is None
    ):
        # fpp is per (file, value): at 64k 4-row files the default
        # 1% would leak ~650 false-positive file reads per probe
        # and drown the control-plane number this block measures —
        # tight fpp is the production knob for many-small-file
        # tables (16 bytes/file here)
        L.build_file_bloom(spark, path, "id", fpp=1e-6)
    return path


def manifest_point_lookup_scale(spark) -> dict:
    """Warm point-lookup control-plane cost vs FILE COUNT (r9,
    verdict #1): two tiny-file tables (4k and 64k files, 4 rows
    each — metadata-dominated by construction), Bloom sidecars +
    inventory manifests, then:

    - ``warm_s``: the manifest fast path — probe-verified inventory,
      worker-pinned Bloom chunks, driver collect = HIT files only.
      Ratio across 16x the files is the flatness claim (residual
      growth is probe-task scheduling, not listing or row volume).
    - ``legacy_s``: the same lookup with the manifest docs moved
      aside — the pre-r9 shape: per-call sidecar re-scan, O(files)
      reconciliation collect, O(files) live listing sweep.
    - the contract counters: ZERO driver sidecar payload reads and
      ZERO live-listing sweeps during the warm runs.
    """
    import statistics as _st
    import time as _t

    from pdf_etl_ocr_inference_spark.operators import layout as L

    def _tiny_table(n_files: int) -> str:
        return _tiny_file_table(spark, n_files)

    def med(fn, reps=5):
        out = []
        for _ in range(reps):
            t0 = _t.perf_counter()
            fn()
            out.append(_t.perf_counter() - t0)
        return _st.median(out)

    out: dict = {}
    sweeps = {"n": 0}
    real_live = L._live_stat_map

    def counting_live(*a, **k):
        sweeps["n"] += 1
        return real_live(*a, **k)

    for n_files in (4096, 65536):
        path = _tiny_table(n_files)
        probe = [4 * (n_files // 2) + 1]  # hits exactly one file
        # cold: prime the manifest-doc cache and the worker pins
        df, n_read, n_total = L.scan_point_lookup(spark, path, "id", probe)
        assert n_total == n_files and df.count() == 1
        reads_before = L.DRIVER_SIDECAR_READS
        L._live_stat_map = counting_live
        sweeps["n"] = 0
        try:
            warm = med(
                lambda: L.scan_point_lookup(spark, path, "id", probe)[
                    0
                ].count()
            )
            warm_sweeps = sweeps["n"]
        finally:
            L._live_stat_map = real_live
        warm_reads = L.DRIVER_SIDECAR_READS - reads_before
        # legacy shape: hide the manifest docs → slow path per call.
        # A stale hidden dir from a killed previous run would make
        # os.replace raise forever — clear it first (crash-safe;
        # _tiny_table already re-stamped the live manifest above)
        mdir = L._manifest_dir(path)
        hidden = f"{path}/_hidden_manifest"
        import shutil as _sh

        _sh.rmtree(hidden, ignore_errors=True)
        os.replace(mdir, hidden)
        L._MANIFEST_DOC_CACHE.pop(path, None)
        try:
            legacy = med(
                lambda: L.scan_point_lookup(spark, path, "id", probe)[
                    0
                ].count(),
                reps=3,
            )
        finally:
            os.replace(hidden, mdir)
            # the rename dance bumped the root dir mtime: re-stamp
            # the manifest probe (files unchanged → same digest, so
            # the bloom marker stays valid) or the NEXT invocation's
            # "warm" path would silently run legacy
            L.write_inventory_manifest(path)
        out[f"files_{n_files}"] = {
            "warm_s": round(warm, 3),
            "legacy_s": round(legacy, 3),
            "legacy_over_warm": round(legacy / warm, 1),
            "driver_sidecar_reads_warm": warm_reads,
            "live_listing_sweeps_warm": warm_sweeps,
        }
    w4, w64 = out["files_4096"]["warm_s"], out["files_65536"]["warm_s"]
    out["warm_ratio_16x_files"] = round(w64 / w4, 2)
    return out


def manifest_stats_scan_scale(spark) -> dict:
    """Warm RANGE-scan control-plane cost vs FILE COUNT (r10,
    verdict #1 — the point-lookup treatment applied to
    scan_with_skipping): same tiny-file tables, min/max stats
    sidecars + manifests, then:

    - ``warm_s``: the manifest fast path — probe-verified inventory
      + stats-marker digest equality, worker-pinned stats chunks,
      driver collect = PASSING (file, col) rows only.
    - ``legacy_s``: the pre-r10 entry shape — an explicit stats
      DataFrame, so every call pays the keep-list Spark filter, the
      O(files) covered-fingerprint collect, and the file-map
      reconciliation.
    - contract counters: ZERO driver sidecar payload reads and ZERO
      live-listing sweeps during the warm runs.
    """
    import statistics as _st
    import time as _t

    from pyspark.sql import functions as F

    from pdf_etl_ocr_inference_spark.operators import layout as L

    def med(fn, reps=5):
        ts = []
        for _ in range(reps):
            t0 = _t.perf_counter()
            fn()
            ts.append(_t.perf_counter() - t0)
        return _st.median(ts)

    out: dict = {}
    sweeps = {"n": 0}
    real_live = L._live_stat_map

    def counting_live(*a, **k):
        sweeps["n"] += 1
        return real_live(*a, **k)

    for n_files in (4096, 65536):
        path = _tiny_file_table(spark, n_files)
        mid = 4 * (n_files // 2) + 1
        box = {"id": (float(mid), float(mid + 9))}  # ~3 files overlap
        # cold: builds/refreshes + stamps the _stats sidecar, then
        # serves this very call from the fast path
        df, n_read, n_total = L.scan_with_skipping(spark, path, box)
        assert n_total == n_files and 0 < n_read <= 4, (n_read, n_total)
        # callers re-apply the exact predicate (op70b's shape)
        assert (
            df.filter(
                (F.col("id") >= mid) & (F.col("id") <= mid + 9)
            ).count()
            == 10
        )
        reads_before = L.DRIVER_SIDECAR_READS
        L._live_stat_map = counting_live
        sweeps["n"] = 0
        try:
            warm = med(
                lambda: L.scan_with_skipping(spark, path, box)[0].count()
            )
            warm_sweeps = sweeps["n"]
        finally:
            L._live_stat_map = real_live
        warm_reads = L.DRIVER_SIDECAR_READS - reads_before
        stats_df = spark.read.parquet(
            L._stats_phys_dir(path) or f"{path}/_stats"
        )
        legacy = med(
            lambda: L.scan_with_skipping(spark, path, box, stats=stats_df)[
                0
            ].count(),
            reps=3,
        )
        out[f"files_{n_files}"] = {
            "warm_s": round(warm, 3),
            "legacy_s": round(legacy, 3),
            "legacy_over_warm": round(legacy / warm, 1),
            "driver_sidecar_reads_warm": warm_reads,
            "live_listing_sweeps_warm": warm_sweeps,
        }
    w4, w64 = out["files_4096"]["warm_s"], out["files_65536"]["warm_s"]
    out["warm_ratio_16x_files"] = round(w64 / w4, 2)
    return out


def sf_scaling_sweep(spark) -> dict:
    """Wall time of four representative shapes across the three
    fixture scales (100× data span): the ratio t(sf0.1)/t(sf0.01)
    against the 10× data growth is the measured answer to "does this
    plan survive a scale-up" — ~10 means data-bound linear scaling,
    ≪10 means the local run is still fixed-overhead-bound (headroom,
    not danger). Best-of-2 per point; the sweep reuses the shared
    session so JVM/codegen warmup is amortized like production.

    The sweep starts from a CLEAN cache (r9): it runs last in a
    ~25-minute bench process whose earlier blocks legitimately leave
    large frames cached (1M-row ANN corpora, layout sidecars), and
    storage-memory eviction churn against those was measured
    inflating the sf0.1 minhash point ~3x over the same entry's
    headline median minutes earlier — the sweep's question is plan
    scaling, not cache-pressure interference, so it measures like
    the isolated run a user would do."""
    import time as _t

    from pdf_etl_ocr_inference_spark.plans import all_specs

    spark.catalog.clearCache()

    specs = all_specs()
    # r9 (verdict #5): the r8 bucket-group pair-generation rewrite
    # landed at the simhash/phash/span sites and the graph kernels —
    # certify its one-pass/one-shuffle scaling claim where it landed,
    # not just where it was first measured
    names = [
        "tpch_q1",
        "dedup_exact",
        "dedup_minhash_lsh",
        "op51_sessionize",
        "dedup_simhash",
        "mm_phash_neardup",
        "graph_pagerank",
        "graph_triangles",
        "dedup_span_scrub",
        # continuation-session additions: the two NEW plan shapes
        # (first-occurrence gram attribution; pair-graph CC + argmax
        # collapse + derived-quota mix) — the other new entries reuse
        # already-swept shapes (minhash pair set, pagerank edge build)
        "text_novelty_rate",
        "pipeline_curated_mix",
        # r12 (r11 verdict #6): the keep-first span-clean pipeline —
        # oracled in r11 but unbenched; one sweep row proves the
        # one-extra-filter-clause claim vs pipeline_span_clean_corpus
        # at scale and guards the shared fragments against plan drift
        "pipeline_span_clean_corpus_keepfirst",
    ]
    sfs = ["sf0.001", "sf0.01", "sf0.1"]
    out: dict = {}
    for name in names:
        row = {}
        for sf in sfs:
            d = f"/root/testdata/{sf}"
            if not os.path.isdir(d):
                continue
            best = None
            for _ in range(2):
                t0 = _t.perf_counter()
                specs[name].fn(spark, d).count()
                el = _t.perf_counter() - t0
                best = el if best is None else min(best, el)
            row[sf] = round(best, 3)
        if "sf0.1" in row and "sf0.01" in row and row["sf0.01"] > 0:
            row["ratio_10x_data"] = round(row["sf0.1"] / row["sf0.01"], 1)
        out[name] = row
    return out


# The 5 heaviest headline entries (r12 driver PERF numbers), re-run
# against a 10× row-multiplied input so the 32-vs-8-core driver runs
# can SHOW data-parallel scaling (r12 verdict #1/#2: at sf0.1 every
# headline query is sub-3-seconds and overhead-bound, so low/high-core
# ratios read ≈1 whatever the plan does).  op45 is kept although it is
# lifecycle-bound — a ratio ≈1 there is the honest reading the
# attribution block predicts, and a plan regression would surface as
# the ratio moving.
SCALED_HEADLINE_QUERIES = [
    "dedup_minhash_lsh",
    "pipeline_dsir_corpus",
    "pipeline_span_clean_corpus",
    "op45_stream_tumbling",
    "dedup_span_intervals",
]
_SCALED_MULT = 10


def build_scaled_dir(spark, mult: int = _SCALED_MULT) -> str:
    """Materialize a deterministic ``mult``× row-multiplied copy of
    the tables the scaled headline block reads (documents, events)
    under process scratch, shaped like an sf dir.

    Replica k shifts ids by k·stride and prefixes every TOKEN of
    ``text`` with ``r<k>·`` so replicas share no shingles, grams or
    fingerprints: within-replica duplication structure is preserved
    exactly and cross-replica duplication is zero, so work AND output
    scale ~linearly (plain replication would plant mult-deep cliques
    everywhere and grow pair output quadratically — a different
    workload, not a bigger one).  Pure function of the sf parquet
    inputs, rebuilt by every bench invocation — input preparation,
    not result caching; build time is excluded from query timing like
    any other fixture load."""
    from pyspark.sql import functions as SF

    from pdf_etl_ocr_inference_spark.scratch import scratch_root
    from pdf_etl_ocr_inference_spark.sources.catalog import load_table

    tag = os.path.basename(os.path.normpath(SF_DIR))
    out = os.path.join(scratch_root(), f"scaled{mult}x_{tag}")
    stride = 100_000_000
    rep = SF.explode(
        SF.sequence(SF.lit(0), SF.lit(mult - 1)).cast("array<long>")
    ).alias("_rep")

    docs = load_table(spark, SF_DIR, "documents")
    docs_scaled = docs.select("*", rep).select(
        (SF.col("doc_id") + SF.col("_rep") * SF.lit(stride)).alias(
            "doc_id"
        ),
        SF.regexp_replace(
            SF.col("text"),
            SF.lit(r"(\S+)"),
            SF.concat(
                SF.lit("r"), SF.col("_rep").cast("string"), SF.lit("·$1")
            ),
        ).alias("text"),
        "lang",
        "source",
        "n_chars",
    )
    docs_scaled.write.mode("overwrite").parquet(
        f"{out}/documents.parquet"
    )

    # write µs timestamps (Spark's parquet default is legacy INT96,
    # which the loader's ns-unit probe would misread as nanos)
    _OTT = "spark.sql.parquet.outputTimestampType"
    ott_prev = spark.conf.get(_OTT)
    spark.conf.set(_OTT, "TIMESTAMP_MICROS")
    events = load_table(spark, SF_DIR, "events")
    events_scaled = events.select("*", rep).select(
        (SF.col("event_id") + SF.col("_rep") * SF.lit(stride)).alias(
            "event_id"
        ),
        "ts",
        (SF.col("user_id") + SF.col("_rep") * SF.lit(stride)).alias(
            "user_id"
        ),
        "event_type",
        "value",
        "props",
    )
    try:
        events_scaled.write.mode("overwrite").parquet(
            f"{out}/events.parquet"
        )
    finally:
        spark.conf.set(_OTT, ott_prev)
    return out


def scaled_headline(spark, specs) -> dict:
    """Per-query seconds for SCALED_HEADLINE_QUERIES at the 10×
    row-multiplied input — same count() action as the headline block,
    best-of-2 (the block runs once per bench invocation; the min
    bounds one contention burst).  Returned keys are prefixed
    ``scaled10x_`` and ADDED to the published queries dict (the
    headline total keeps summing the original 26 entries for
    round-over-round continuity)."""
    spark.catalog.clearCache()
    sdir = build_scaled_dir(spark)
    out = {}
    for name in SCALED_HEADLINE_QUERIES:
        best = None
        for _ in range(2):
            spark.sparkContext.setJobDescription(f"scaled10x: {name}")
            t0 = time.perf_counter()
            specs[name].fn(spark, sdir).count()
            el = time.perf_counter() - t0
            best = el if best is None else min(best, el)
        out[f"scaled10x_{name}"] = round(best, 3)
    # the minhash entries persist their clique-group frame per call;
    # release before the next block
    spark.catalog.clearCache()
    return out


def kmeans_scale(spark) -> dict:
    """One deterministic Lloyd round on the cached 1M×64 corpus (built
    by probe_speedup): times the per-round assignment scan and the
    full round (assignment + exact-int centroid shuffle) — the two
    costs that multiply by rounds at 100 TB.  Centroids = the 8
    lowest-id vectors, same rule as the catalog entry.
    """
    import time as _t

    from pdf_etl_ocr_inference_spark.operators.clustering import (
        assign_clusters,
        init_centroids,
        kmeans_fit,
    )

    corpus_path = "/tmp/spark_graft_scratch/probe_corpus_1m_planted"
    if not os.path.exists(corpus_path):
        return {"skipped": "probe corpus not built"}
    corpus = spark.read.parquet(corpus_path)
    centroids = init_centroids(corpus, "embedding", "vec_id", 8)

    t0 = _t.perf_counter()
    n_assigned = (
        assign_clusters(corpus, "embedding", centroids)
        .groupBy("cluster_id")
        .count()
        .count()
    )
    t_assign = _t.perf_counter() - t0
    t0 = _t.perf_counter()
    res = kmeans_fit(corpus, "embedding", "vec_id", k=8, rounds=1)
    t_round = _t.perf_counter() - t0
    return {
        "corpus_rows": 1_000_000,
        "dim": 64,
        "k": 8,
        "clusters_nonempty": n_assigned,
        "assign_scan_sec": round(t_assign, 3),
        "full_round_sec": round(t_round, 3),
        "inertia_round0": round(res.inertia_per_round[0], 1),
    }


def main() -> None:
    from pdf_etl_ocr_inference_spark.plans import all_specs
    from pdf_etl_ocr_inference_spark.session import _cpus, get_spark

    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_specs()

    # Warm up JVM / codegen / parquet footer cache and the Python
    # worker pool (pandas import + Arrow init per worker) so
    # session-startup cost isn't charged to the first query that
    # happens to hit each path.
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()
    spark.range(0, 1024, 1, _cpus()).mapInPandas(
        lambda it: it, schema="id long"
    ).count()

    # Host-load probe, taken before AND after the timed section (the
    # bench runs ~10 min; load can drift within it).  BOTH normalizer
    # shapes (r10 verdict #3): the JVM burst and the full-width
    # Python-worker wave — the wave is the one that sees multi-core
    # co-tenant contention.
    load_ref_start = load_reference(spark)
    load_par_start = load_reference_parallel(spark)

    # Per-query MEDIAN of three FULL passes (not back-to-back reps):
    # the host shows multi-second contention bursts, and a burst that
    # covers one pass of a query is unlikely to cover the same query
    # again a full pass (~30s) later.  r4's driver run came in 25-45%
    # above the builder's own clean run UNIFORMLY (no plan changed);
    # medians over interleaved passes are the variance-robust answer —
    # a single loaded pass moves the median of 3 by at most the gap to
    # the second-loaded pass, where a single timed run moves 1:1.  The
    # per-query min is published alongside as the low-noise floor.
    import statistics as _stats

    raw: dict[str, list[float]] = {q: [] for q in BENCH_QUERIES}
    counts: dict[str, int] = {}
    for _pass in range(3):
        for name in BENCH_QUERIES:
            t0 = time.perf_counter()
            df = specs[name].fn(spark, SF_DIR)
            counts[name] = df.count()
            raw[name].append(time.perf_counter() - t0)
    timings = {q: round(_stats.median(v), 3) for q, v in raw.items()}
    mins = {q: round(min(v), 3) for q, v in raw.items()}
    for name in BENCH_QUERIES:
        print(
            f"# {name}: median {timings[name]}s / min {mins[name]}s "
            f"({counts[name]} rows)",
            file=sys.stderr,
        )

    # Reproduce the baseline's parallel-OCR scaling claim (BASELINE.md:
    # ~5h serial → ~15min on 24 cores, "nearly linear") with a
    # sleep-stub parser through the real mapInPandas path, scaled to
    # benchmark time (0.1s/doc instead of ~3min/doc).
    from pyspark.sql import functions as SF

    from pdf_etl_ocr_inference_spark.operators.documents import (
        chunk_map_in_pandas,
    )
    from pdf_etl_ocr_inference_spark.sources.catalog import load_table

    def _slow_parse(text: str) -> list[str]:
        time.sleep(0.2)
        return [text[:80]]

    def _docs(n: int):
        return (
            load_table(spark, SF_DIR, "documents")
            .filter(SF.col("doc_id") < n)
            .select("doc_id", "text")
        )

    def _ocr_run(n_docs: int, parts: int) -> float:
        t0 = time.perf_counter()
        chunk_map_in_pandas(
            _docs(n_docs), parse_fn=_slow_parse, min_chars=1,
            num_partitions=parts,
        ).count()
        return time.perf_counter() - t0

    # r4 lesson: 64 docs on 32 cores is 2 waves — the fixed
    # mapInPandas job overhead (~0.3 s) eats 60% of the budget and the
    # published "12.4x of 32" READ as a missed baseline when it was a
    # wave-regime artifact.  320 docs (10 waves) at 0.2 s/doc matches
    # the regime of the reference's claim (100 multi-minute docs on
    # 24 cores, ~20x, 02:4-8) — per-doc work dominates the fixed
    # overhead there by ~1000x, so even 0.2 s/doc UNDERSTATES the
    # amortization the claim enjoyed.  Serial is measured at 64 docs
    # and scaled 5x — the stub sleeps a fixed 0.2 s/doc, so sleep
    # time is exactly linear and the scaling error is the
    # (measured-at-64) sub-1% overhead.
    n_par = 320
    serial64 = _ocr_run(64, 1)
    serial = serial64 * (n_par / 64)
    par = min(_ocr_run(n_par, 32), _ocr_run(n_par, 32))
    ocr_speedup = round(serial / par, 1)
    import math as _math

    # LPT/wave lower bound on the MEASURED per-doc cost (sleep plus
    # the real pandas/parse per-row work the serial run exposes —
    # using the nominal 0.2 s would overstate the bound): no schedule
    # of n equal tasks on p machines beats ceil(n/p) * task_cost.
    per_doc = serial64 / 64
    waves = _math.ceil(n_par / 32)
    wave_bound_sec = waves * per_doc
    ocr_eff_vs_bound = round(wave_bound_sec / par, 2)
    print(
        f"# ocr stub: serial(64x5) {serial:.2f}s, parallel({n_par} docs) "
        f"{par:.2f}s, wave bound {wave_bound_sec:.2f}s, "
        f"efficiency vs bound {ocr_eff_vs_bound}",
        file=sys.stderr,
    )

    recalls = ann_recall(spark, SF_DIR, specs)
    print(f"# ann recall@5 vs exact: {recalls}", file=sys.stderr)
    filt_recalls = filtered_ann_recall(spark, SF_DIR)
    print(
        f"# filtered-ivf recall@5 vs exact filtered (selectivity "
        f"sweep, pre-filter + probe widening): {filt_recalls}",
        file=sys.stderr,
    )
    probe = probe_speedup(spark)
    print(f"# ann probe vs brute @1M: {probe}", file=sys.stderr)
    dattr = dedup_family_attribution(spark)
    print(f"# dedup family attribution: {dattr}", file=sys.stderr)
    q13attr = q13_attribution(spark)
    print(f"# tpch_q13 stage attribution: {q13attr}", file=sys.stderr)
    mhattr = minhash_attribution(spark)
    print(f"# dedup_minhash stage attribution: {mhattr}", file=sys.stderr)
    prattr = pagerank_attribution(spark)
    print(f"# graph_pagerank stage attribution: {prattr}", file=sys.stderr)
    op45attr = op45_attribution(spark)
    print(f"# op45_stream_tumbling attribution: {op45attr}", file=sys.stderr)
    mhfam = minhash_family_premium(spark)
    print(f"# minhash hash-family premium: {mhfam}", file=sys.stderr)
    inc_dedup = incremental_dedup_speedup(spark)
    print(f"# incremental dedup @200k: {inc_dedup}", file=sys.stderr)
    dup_scale = dedup_dup_scaling(spark)
    print(f"# dedup mass-dup scaling: {dup_scale}", file=sys.stderr)
    serving = serving_latency(spark)
    print(f"# pinned-index serving: {serving}", file=sys.stderr)
    km = kmeans_scale(spark)
    print(f"# kmeans round @1M: {km}", file=sys.stderr)
    bmidx = bm25_index_speedup(spark)
    print(f"# bm25 postings index @200k: {bmidx}", file=sys.stderr)
    fskip = file_skipping_speedup(spark)
    lserved = layout_rewrite_served(spark)
    ppart = partitioned_prune(spark)
    psrv = pinned_sidecar_serving(spark)
    mscale = manifest_point_lookup_scale(spark)
    msscan = manifest_stats_scan_scale(spark)
    skipattr = skipping_attribution(spark)
    print(f"# file skipping @4M/64 files: {fskip}", file=sys.stderr)
    print(f"# partitioned layout prune @4M: {ppart}", file=sys.stderr)
    print(f"# executor-pinned sidecar serving: {psrv}", file=sys.stderr)
    print(f"# manifest point lookup scale: {mscale}", file=sys.stderr)
    print(f"# manifest stats scan scale: {msscan}", file=sys.stderr)
    print(f"# skipping-rewrite attribution: {skipattr}", file=sys.stderr)
    sweep = sf_scaling_sweep(spark)
    print(f"# sf scaling sweep: {sweep}", file=sys.stderr)
    scaled = scaled_headline(spark, specs)
    print(f"# scaled 10x headline block: {scaled}", file=sys.stderr)
    gb = graph_build(spark)
    print(f"# graph build @100k: {gb}", file=sys.stderr)

    load_ref_end = load_reference(spark)
    load_par_end = load_reference_parallel(spark)
    load_ref = round(min(load_ref_start, load_ref_end), 3)
    load_par = round(min(load_par_start, load_par_end), 3)

    total = round(sum(timings.values()), 3)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    # Detail blocks go on their own stdout line: the driver keeps only
    # the last ~2 KB of stdout and parses the FINAL line as the metric
    # JSON, so that line must stay small (r3's combined line overflowed
    # the tail buffer and recorded parsed=null).
    print(
        json.dumps(
            {
                "metric": "measurement_blocks",
                "headline_query_mins_of_3": mins,
                "ann_probe_speedup_1m": probe,
                "dedup_family_attribution": dattr,
                "tpch_q13_attribution": q13attr,
                "dedup_minhash_attribution": mhattr,
                "graph_pagerank_attribution": prattr,
                "op45_stream_tumbling_attribution": op45attr,
                "minhash_family_premium": mhfam,
                "incremental_dedup_speedup_200k": inc_dedup,
                "dedup_mass_dup_scaling": dup_scale,
                "pinned_serving_latency": serving,
                "kmeans_round_1m": km,
                "bm25_index_speedup_200k": bmidx,
                "file_skipping_4m": fskip,
                "layout_rewrite_served_4m": lserved,
                "partitioned_prune_4m": ppart,
                "pinned_sidecar_serving_4m": psrv,
                "manifest_point_lookup_scale": mscale,
                "manifest_stats_scan_scale": msscan,
                "skipping_attribution": skipattr,
                "sf_scaling_sweep": sweep,
                "scaled10x_headline": scaled,
                "graph_build_100k": gb,
            }
        )
    )
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                # value stays the sum of the ORIGINAL 26 headline
                # entries (round-over-round continuity); the
                # scaled10x_* additions ride the queries dict only,
                # so the driver's low/high-core runs can ratio them
                "value": total,
                "unit": "sec",
                "queries": {**timings, **scaled},
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "total_min_of_3": round(sum(mins.values()), 3),
                # serial baseline measured at 64 docs and extrapolated
                # linearly to 320 (the stub's 0.2 s/doc sleep makes
                # extrapolation exact to the measured sub-1% overhead)
                # — key says so (advice-r5)
                "ocr_stub_speedup_vs_extrapolated_serial": ocr_speedup,
                "ocr_efficiency_vs_wave_bound": ocr_eff_vs_bound,
                "ann_recall_at_5": recalls,
                # metadata-filtered IVF vs exact FILTERED ground
                # truth across selectivities (~50% → ~1%): the
                # probe-widening claim, measured
                "ann_filtered_recall_at_5": filt_recalls,
                # fixed-work CPU reference vs the pinned idle-host
                # constant: ≈1.0 idle, >1 loaded — divide headline
                # drift by this before calling it a regression
                "load_normalizer": round(
                    load_ref / LOAD_REF_BASELINE_S, 3
                ),
                "load_reference_s": {
                    "start": load_ref_start,
                    "end": load_ref_end,
                    "pinned_baseline": LOAD_REF_BASELINE_S,
                },
                # full-width Python-worker wave (r10 verdict #3):
                # quote round-over-round deltas against THIS one —
                # the JVM burst above misses multi-core co-tenant
                # contention
                "load_normalizer_parallel": round(
                    load_par / LOAD_REF_PARALLEL_BASELINE_S, 3
                ),
                "load_reference_parallel_s": {
                    "start": load_par_start,
                    "end": load_par_end,
                    "pinned_baseline": LOAD_REF_PARALLEL_BASELINE_S,
                    "pin_host": __import__("platform").node(),
                },
            },
            separators=(",", ":"),
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
