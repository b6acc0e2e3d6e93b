"""Pinned-index serving for the graph ANN families (NSW / HNSW).

The batch query paths (``topk_nsw`` / ``topk_hnsw``) re-read their
shard parquet on every query — fine for analytics, wrong for the
reference's ONLINE similarity call (``ocr-tesseract-unstructured.py:
167-170``, a managed-index query endpoint).  This module pins parsed
per-shard graphs in EXECUTOR memory across queries:

- the query job iterates a tiny shard-id DataFrame (``range(n_shards)``
  pre-split one row per partition, so each task owns one shard with
  no shuffle), NOT the graph table — Spark schedules no parquet scan
  at all;
- each task calls ``_load_shard(path, shard, version)``, which parses
  the shard's parquet into (vectors, adjacency) dicts ONCE per worker
  process and caches it module-level.  Spark's Python workers are
  reused across tasks/jobs (``spark.python.worker.reuse``, default
  on), so query 2..n hit the cache and pay only the walk;
- the cache key includes the index VERSION (``last_version`` from the
  index meta, bumped by ``refresh_nsw_index``), so a refresh
  invalidates pinned state by construction — stale entries age out of
  the bounded LRU rather than being served.

This is the standard sharded-serving split: layout/build stays the
batch engine's job; serving pins the derived structure.  On a real
cluster the same code pins one shard per executor; local[32] shares
one machine's workers, which is exactly the single-node serving
shape the reference's endpoint runs.
"""

from __future__ import annotations

from collections import OrderedDict

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_CACHE_MAX = 64  # shard entries per worker process (bounded memory)
_shard_cache: OrderedDict[tuple, tuple] = OrderedDict()


def _load_shard(path: str, shard: int, version: int, kind: str):
    """Parse one shard's graph parquet into in-memory search state,
    cached per (path, shard, version, kind) in this worker process."""
    import numpy as np
    import pyarrow.dataset as ds

    from pdf_etl_ocr_inference_spark.operators.graph_ann import VecStore

    key = (path, int(shard), int(version), kind)
    hit = _shard_cache.get(key)
    if hit is not None:
        _shard_cache.move_to_end(key)
        return hit
    import os

    shard_dir = f"{path}/shard={int(shard)}"
    if not os.path.isdir(shard_dir):  # empty shard/cell: no members
        novecs = VecStore([], np.empty((0, 0), dtype="float64"))
        empty = {
            "nsw": (novecs, {}, []),
            "hnsw": (novecs, [], {}, []),
            "pq": (
                np.empty(0, dtype="int64"),
                np.empty((0, 0)),
                np.empty((0, 0), dtype="int64"),
                [],
                None,
            ),
            "ivf": (np.empty(0, dtype="int64"), np.empty((0, 0))),
            "ivfpq": (
                np.empty(0, dtype="int64"),
                np.empty((0, 0)),
                np.empty((0, 0), dtype="int64"),
                [],
            ),
        }[kind]
        _shard_cache[key] = empty
        return empty
    tbl = ds.dataset(shard_dir, format="parquet").to_table()
    ids = tbl["vec_id"].to_numpy(zero_copy_only=False)
    if kind == "ivf":
        embcol = tbl["embedding"].combine_chunks()
        flat = (
            embcol.flatten().to_numpy(zero_copy_only=False).astype("float64")
        )
        dim = len(flat) // max(len(ids), 1)
        m = flat.reshape(len(ids), dim) if len(ids) else flat.reshape(0, 0)
        norms = np.sqrt((m * m).sum(axis=1))
        norms[norms == 0] = 1.0
        m = m / norms[:, None]
        state = (ids.astype("int64"), m)
        _shard_cache[key] = state
        if len(_shard_cache) > _CACHE_MAX:
            _shard_cache.popitem(last=False)
        return state
    if kind == "ivfpq":
        import json
        import os

        embcol = tbl["embedding"].combine_chunks()
        flat = (
            embcol.flatten().to_numpy(zero_copy_only=False).astype("float64")
        )
        dim = len(flat) // max(len(ids), 1)
        m = flat.reshape(len(ids), dim) if len(ids) else flat.reshape(0, 0)
        norms = np.sqrt((m * m).sum(axis=1))
        norms[norms == 0] = 1.0
        m = m / norms[:, None]
        codecol = tbl["pq_codes"].combine_chunks()
        cflat = codecol.flatten().to_numpy(zero_copy_only=False)
        nsub = len(cflat) // max(len(ids), 1)
        codes = (
            cflat.reshape(len(ids), nsub) if len(ids) else cflat.reshape(0, 0)
        )
        with open(os.path.join(path, "_ivfpqserve_meta.json")) as f:
            meta = json.load(f)
        books = [np.asarray(b, dtype="float64") for b in meta["codebooks"]]
        state = (ids.astype("int64"), m, codes, books)
        _shard_cache[key] = state
        if len(_shard_cache) > _CACHE_MAX:
            _shard_cache.popitem(last=False)
        return state
    if kind == "pq":
        import json
        import os

        embcol = tbl["embedding"].combine_chunks()
        flat = (
            embcol.flatten().to_numpy(zero_copy_only=False).astype("float64")
        )
        dim = len(flat) // max(len(ids), 1)
        m = flat.reshape(len(ids), dim) if len(ids) else flat.reshape(0, 0)
        norms = np.sqrt((m * m).sum(axis=1))
        norms[norms == 0] = 1.0
        m = m / norms[:, None]
        codecol = tbl["pq_codes"].combine_chunks()
        cflat = codecol.flatten().to_numpy(zero_copy_only=False)
        nsub = len(cflat) // max(len(ids), 1)
        codes = (
            cflat.reshape(len(ids), nsub) if len(ids) else cflat.reshape(0, 0)
        )
        with open(os.path.join(path, "_pqserve_meta.json")) as f:
            meta = json.load(f)
        books = [np.asarray(b, dtype="float64") for b in meta["codebooks"]]
        rot = (
            None
            if meta.get("rotation") is None
            else np.asarray(meta["rotation"], dtype="float64")
        )
        state = (ids.astype("int64"), m, codes, books, rot)
        _shard_cache[key] = state
        if len(_shard_cache) > _CACHE_MAX:
            _shard_cache.popitem(last=False)
        return state
    # vectorized embedding parse: one flatten + reshape + row-normalize
    # instead of a python loop building 10^5 tiny arrays (the parse was
    # the cold-load bottleneck)
    embcol = tbl["embedding"].combine_chunks()
    flat = embcol.flatten().to_numpy(zero_copy_only=False).astype("float64")
    dim = len(flat) // max(len(ids), 1)
    m = flat.reshape(len(ids), dim) if len(ids) else flat.reshape(0, 0)
    norms = np.sqrt((m * m).sum(axis=1))
    norms[norms == 0] = 1.0
    m = m / norms[:, None]
    # contiguous VecStore (not a dict of row views): the greedy walk
    # scores whole adjacency lists in one vectorized call
    mat = VecStore(ids, m)
    nbcol = "neighbors" if kind == "nsw" else "layers"
    d = tbl.select(["vec_id", nbcol]).to_pydict()
    if kind == "nsw":
        adj = {int(i): list(nb) for i, nb in zip(d["vec_id"], d["neighbors"])}
        state = (mat, adj, sorted(mat))
    else:  # hnsw
        levels = {
            int(i): len(ls) - 1 for i, ls in zip(d["vec_id"], d["layers"])
        }
        layered: list[dict] = [
            {} for _ in range(max(levels.values(), default=0) + 1)
        ]
        for i, ls in zip(d["vec_id"], d["layers"]):
            for lv, nb in enumerate(ls):
                layered[lv][int(i)] = list(nb)
        state = (mat, layered, levels, sorted(mat))
    _shard_cache[key] = state
    if len(_shard_cache) > _CACHE_MAX:
        _shard_cache.popitem(last=False)
    return state


_OUT_SCHEMA = T.StructType(
    [
        T.StructField("qid", T.LongType()),
        T.StructField("vec_id", T.LongType()),
        T.StructField("score", T.DoubleType()),
    ]
)


# ------------------------------------------------------------------
# PQ serving index: sharded (id, embedding, pq_codes) + pinned
# codebooks — the ADC scan and exact re-rank run on cached arrays
# ------------------------------------------------------------------

# rows per PQ serving shard when n_shards is derived: bounds the
# per-worker pin (codes + float64 vectors ≈ 70 MB at d=64) — much
# larger than the graph target because an ADC scan is a vectorized
# numpy pass, not a sequential insert loop
_PQ_SHARD_TARGET_ROWS = 65536


def build_pq_serving_index(
    spark: SparkSession,
    corpus: DataFrame,
    path: str,
    codebooks: list,
    rotation: list | None = None,
    id_col: str = "vec_id",
    embedding_col: str = "embedding",
    n_shards: int | None = 8,
) -> str:
    """Materialize the PQ serving layout: (vec_id, embedding,
    pq_codes) partitioned by shard = id % n_shards, with the
    codebooks/rotation persisted in the index meta — the worker-side
    cache pins codes + vectors as dense numpy matrices and the
    codebooks once per process.  ``embedding`` is kept for the exact
    re-rank (the scan itself reads only the 32×-smaller codes).

    ``n_shards=None`` derives the count from the corpus size at
    ``_PQ_SHARD_TARGET_ROWS`` rows per shard (the graph_ann
    derivation doctrine applied to the PIN: a fixed count at 10⁹
    rows would pin ~100M-row matrices per worker).  Unlike the NSW/
    HNSW graphs, sharding here is RESULT-NEUTRAL — the ADC scan +
    exact re-rank merge per-shard top-k exactly — so the explicit
    default stays for the serving-matrix entries."""
    import json
    import os

    from pdf_etl_ocr_inference_spark.operators.graph_ann import (
        derive_n_shards,
    )
    from pdf_etl_ocr_inference_spark.operators.pq import pq_encode

    if n_shards is None:
        n_shards = derive_n_shards(
            corpus.count(), target=_PQ_SHARD_TARGET_ROWS
        )

    encoded = pq_encode(
        corpus.select(
            (F.col(id_col) % n_shards).cast("int").alias("shard"),
            F.col(id_col).cast("long").alias("vec_id"),
            F.col(embedding_col).cast("array<double>").alias("embedding"),
        ),
        "embedding",
        codebooks,
        out_col="pq_codes",
        rotation=rotation,
    )
    (
        encoded.repartition("shard")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )
    with open(os.path.join(path, "_pqserve_meta.json"), "w") as f:
        json.dump(
            {
                "n_shards": n_shards,
                "codebooks": codebooks,
                "rotation": rotation,
                "last_version": 0,
            },
            f,
        )
    return path


def refresh_pq_serving_index(
    spark: SparkSession,
    path: str,
    changes: DataFrame,
    version: int,
    id_col: str = "vec_id",
    embedding_col: str = "embedding",
) -> list[int]:
    """Fold one change-feed commit into the PQ serving index —
    touched shards re-encode their member sets with the PERSISTED
    codebooks (quantizer retraining is a rebuild, not a refresh);
    same crash-safe swap + version watermark as the graph families
    (``graph_ann.refresh_sharded_graph``), so the serving cache
    invalidates by key."""
    import json
    import os

    from pdf_etl_ocr_inference_spark.operators.graph_ann import (
        refresh_sharded_graph,
    )

    mp = os.path.join(path, "_pqserve_meta.json")
    with open(mp) as f:
        meta = json.load(f)

    def _write(m):
        with open(mp, "w") as f:
            json.dump(m, f)

    def _rebuild(members, tmp):
        build_pq_serving_index(
            spark,
            members,
            tmp,
            codebooks=meta["codebooks"],
            rotation=meta["rotation"],
            n_shards=meta["n_shards"],
        )

    return refresh_sharded_graph(
        spark, path, changes, version, id_col, embedding_col,
        meta, _write, _rebuild,
    )


# ------------------------------------------------------------------
# IVF serving index: cells ARE the shards — a query schedules tasks
# only for its probed cells
# ------------------------------------------------------------------


def _ivf_shard_col(centroids):
    """Centroid-argmax as a Column (cell id), evaluated per row with
    each dot computed once (array-argmax, not a when-chain)."""
    dots = F.array(
        *[
            F.aggregate(
                F.zip_with(
                    "embedding",
                    F.array(*[F.lit(float(v)) for v in c]),
                    lambda a, b: a * b,
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            for c in centroids
        ]
    )
    return (F.array_position(dots, F.array_max(dots)) - 1).cast("int")


def build_ivf_serving_index(
    spark: SparkSession,
    corpus: DataFrame,
    path: str,
    centroids: list,
    id_col: str = "vec_id",
    embedding_col: str = "embedding",
) -> str:
    """Materialize the IVF serving layout: rows partitioned by their
    nearest-centroid CELL (shard = cell), centroids persisted in the
    meta.  A query then schedules tasks ONLY for its ``n_probe``
    nearest cells — the serving twin of ``topk_ivf``'s partition-
    pruned scan."""
    import json
    import os

    from pdf_etl_ocr_inference_spark.operators.similarity import ivf_assign

    assigned = ivf_assign(
        corpus.select(
            F.col(id_col).cast("long").alias("vec_id"),
            F.col(embedding_col).cast("array<double>").alias("embedding"),
        ),
        "embedding",
        centroids,
        id_col="vec_id",
    ).select(
        F.col("cell").cast("int").alias("shard"), "vec_id", "embedding"
    )
    (
        assigned.repartition("shard")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )
    with open(os.path.join(path, "_ivfserve_meta.json"), "w") as f:
        json.dump(
            {
                "n_shards": len(centroids),
                "centroids": centroids,
                "last_version": 0,
            },
            f,
        )
    return path


def refresh_ivf_serving_index(
    spark: SparkSession,
    path: str,
    changes: DataFrame,
    version: int,
    id_col: str = "vec_id",
    embedding_col: str = "embedding",
) -> list[int]:
    """Fold one change-feed commit into the IVF layout.  The shard
    function is the centroid argmax, so an update that moves a vector
    between cells touches BOTH (preimage rows carry the old
    embedding); same atomic swap + version watermark as the other
    families."""
    import json
    import os

    from pdf_etl_ocr_inference_spark.operators.graph_ann import (
        refresh_sharded_graph,
    )

    mp = os.path.join(path, "_ivfserve_meta.json")
    with open(mp) as f:
        meta = json.load(f)
    cents = meta["centroids"]

    def _write(m):
        with open(mp, "w") as f:
            json.dump(m, f)

    def _rebuild(members, tmp):
        build_ivf_serving_index(spark, members, tmp, centroids=cents)

    return refresh_sharded_graph(
        spark, path, changes, version, id_col, embedding_col,
        meta, _write, _rebuild,
        shard_col=lambda df: _ivf_shard_col(cents),
    )


def build_ivfpq_serving_index(
    spark: SparkSession,
    corpus: DataFrame,
    path: str,
    centroids: list,
    codebooks: list,
    id_col: str = "vec_id",
    embedding_col: str = "embedding",
) -> str:
    """Materialize the IVF-PQ serving layout: cells are the shards
    (like ``ivf``), rows carry RESIDUAL PQ codes (like ``pq``), and
    both the centroids and the residual codebooks persist in the
    meta.  A query schedules tasks only for its probed cells, and
    each task's ADC runs against that cell's residual LUT on pinned
    arrays — IVFADC end to end with no parquet scan per query."""
    import json
    import os

    from pdf_etl_ocr_inference_spark.operators.pq import ivfpq_encode
    from pdf_etl_ocr_inference_spark.operators.similarity import ivf_assign

    assigned = ivf_assign(
        corpus.select(
            F.col(id_col).cast("long").alias("vec_id"),
            F.col(embedding_col).cast("array<double>").alias("embedding"),
        ),
        "embedding",
        centroids,
        id_col="vec_id",
    )
    encoded = ivfpq_encode(
        assigned, "embedding", centroids, codebooks
    ).select(
        F.col("cell").cast("int").alias("shard"),
        "vec_id",
        "embedding",
        "pq_codes",
    )
    (
        encoded.repartition("shard")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )
    with open(os.path.join(path, "_ivfpqserve_meta.json"), "w") as f:
        json.dump(
            {
                "n_shards": len(centroids),
                "centroids": centroids,
                "codebooks": codebooks,
                "last_version": 0,
            },
            f,
        )
    return path


def refresh_ivfpq_serving_index(
    spark: SparkSession,
    path: str,
    changes: DataFrame,
    version: int,
    id_col: str = "vec_id",
    embedding_col: str = "embedding",
) -> list[int]:
    """Fold one change-feed commit into the IVF-PQ layout: touched
    cells re-encode their member sets with the PERSISTED centroids
    and residual codebooks (quantizer retraining is a rebuild);
    cross-cell moves touch both cells via the centroid-argmax shard
    column; same crash-safe swap + version watermark as the other
    serving families."""
    import json
    import os

    from pdf_etl_ocr_inference_spark.operators.graph_ann import (
        refresh_sharded_graph,
    )

    mp = os.path.join(path, "_ivfpqserve_meta.json")
    with open(mp) as f:
        meta = json.load(f)
    cents = meta["centroids"]
    books = meta["codebooks"]

    def _write(m):
        with open(mp, "w") as f:
            json.dump(m, f)

    def _rebuild(members, tmp):
        build_ivfpq_serving_index(
            spark, members, tmp, centroids=cents, codebooks=books
        )

    return refresh_sharded_graph(
        spark, path, changes, version, id_col, embedding_col,
        meta, _write, _rebuild,
        shard_col=lambda df: _ivf_shard_col(cents),
    )


def _ivfpq_answer(state, qu, cell_centroid, k, rerank, excl, pred=None):
    """Residual ADC + exact re-rank within one pinned cell: the LUT
    target is ``q − c_cell`` (IVFADC), everything else mirrors
    ``_pq_answer`` — including the predicate's PRE-filter rerank
    widening (the ADC LUT is computed once; only the window grows)."""
    import numpy as np

    ids, emb, codes, books = state
    if len(ids) == 0:
        return []
    qr = qu - cell_centroid
    m = len(books)
    sub = books[0].shape[1]
    adc = np.zeros(len(ids), dtype="float64")
    for j in range(m):
        lut = ((books[j] - qr[j * sub : (j + 1) * sub]) ** 2).sum(axis=1)
        adc += lut[codes[:, j]]
    window = max(rerank, k + len(excl))
    full = np.lexsort((ids, adc))
    while True:
        order = full[:window]
        scores = emb[order] @ qu
        rows = [
            (int(ids[i]), float(s))
            for i, s in zip(order, scores)
            if int(ids[i]) not in excl
            and (pred is None or pred(int(ids[i])))
        ]
        if len(rows) >= k or window >= len(ids):
            break
        window = min(window * 2, len(ids))
    rows.sort(key=lambda t: (-t[1], t[0]))
    return rows[:k]


def _ivf_answer(state, qu, k, excl, pred=None):
    """Exact cosine top-k within one pinned cell (the predicate needs
    no widening here — the whole cell is scanned exactly)."""
    ids, m = state
    if len(ids) == 0:
        return []
    scores = m @ qu
    rows = [
        (int(i), float(s))
        for i, s in zip(ids, scores)
        if int(i) not in excl and (pred is None or pred(int(i)))
    ]
    rows.sort(key=lambda t: (-t[1], t[0]))
    return rows[:k]


def _pq_answer(state, qu, k, rerank, excl, pred=None):
    """ADC scan + exact re-rank on pinned arrays, deterministic ties
    by (distance, id) like ``operators.pq.topk_pq``."""
    import numpy as np

    ids, emb, codes, books, rot = state
    if len(ids) == 0:
        return []
    qr = qu @ rot if rot is not None else qu
    m = len(books)
    sub = books[0].shape[1]
    # LUT[j][c] = squared distance of the query's j-th subvector to
    # centroid c; ADC = sum over subspaces of LUT lookups
    adc = np.zeros(len(ids), dtype="float64")
    for j in range(m):
        lut = ((books[j] - qr[j * sub : (j + 1) * sub]) ** 2).sum(axis=1)
        adc += lut[codes[:, j]]
    window = max(rerank, k + len(excl))
    full = np.lexsort((ids, adc))
    while True:
        cand = full[:window]
        scores = emb[cand] @ qu
        rows = [
            (int(ids[i]), float(s))
            for i, s in zip(cand, scores)
            if int(ids[i]) not in excl
            and (pred is None or pred(int(ids[i])))
        ]
        if len(rows) >= k or window >= len(ids):
            break
        window = min(window * 2, len(ids))
    rows.sort(key=lambda t: (-t[1], t[0]))
    return rows[:k]


def serve_topk(
    spark: SparkSession,
    path: str,
    queries: list[tuple[int, list[float]]],
    k: int = 5,
    ef_search: int = 32,
    exclude_ids: list | None = None,
    kind: str = "nsw",
    rerank: int = 50,
    n_probe: int = 2,
    predicate=None,
) -> DataFrame:
    """Top-k for a BATCH of (qid, vector) queries against the pinned
    sharded index (``kind``: ``nsw``/``hnsw`` graph walk, ``pq`` ADC
    scan + exact re-rank with pinned codebooks, or ``ivf`` exact scan
    of the ``n_probe`` nearest pinned cells).  One job: every shard
    task answers every query from its cached state (IVF tasks run
    only for probed cells); global per-qid merge.  Output
    ``(qid, vec_id, score)`` — ``score`` is exact cosine.

    ``predicate`` (``Callable[[int], bool]``, optional) is a metadata
    filter resolved to id level by the caller (tenant = id mod T, a
    broadcast membership sketch, …) with PRE-filter semantics — it
    restricts the CANDIDATE FETCH, never post-filters a finished
    top-k (ref serving: the vector-search API's ``filters`` arg; the
    ocr:166-172 notebook passes none): graph kinds widen the layer-0
    beam (ef doubling, in-task) until k survivors pass; PQ kinds
    widen the ADC re-rank window the same way; IVF kinds widen the
    PROBE — still-starved queries double their probed-cell prefix,
    one extra job per doubling over only the newly probed cells, so
    a tight filter reads more cells instead of starving.

    The query list is bounded control data (an online request batch),
    shipped in the task closure — there is deliberately no corpus-
    sized query-side DataFrame here; for corpus-scale two-table top-k
    use ``optimizer.knn_join``.
    """
    import json
    import os

    metas = {
        "nsw": "_nsw_meta.json",
        "hnsw": "_hnsw_meta.json",
        "pq": "_pqserve_meta.json",
        "ivf": "_ivfserve_meta.json",
        "ivfpq": "_ivfpqserve_meta.json",
    }
    if kind not in metas:
        raise ValueError(
            f"kind must be nsw|hnsw|pq|ivf|ivfpq, got {kind!r}"
        )
    with open(os.path.join(path, metas[kind])) as f:
        meta = json.load(f)
    n_shards = meta["n_shards"]
    version = meta.get("last_version", 0)
    excl = set(exclude_ids or [])
    ef = max(ef_search, k + len(excl))

    import numpy as np

    qnorm = []
    for qid, vec in queries:
        q = np.asarray(vec, dtype="float64")
        n = float(np.sqrt(np.dot(q, q)))
        qnorm.append((int(qid), (q / n if n > 0 else q).tolist()))

    # IVF: the cells ARE the shards — compute each query's n_probe
    # nearest cells driver-side from the pinned centroids (tiny) and
    # schedule tasks ONLY for the probed union; per cell, answer only
    # the queries that probed it.
    probes: dict[int, set] = {}
    cents_np = None
    if kind in ("ivf", "ivfpq"):
        cents_np = np.asarray(meta["centroids"], dtype="float64")
        if predicate is not None:
            # filtered cell kinds take the multi-round widening path:
            # each round probes only the NEW cells of still-starved
            # queries, so the no-filter fast path below stays a
            # single job
            return _serve_cells_prefiltered(
                spark, path, version, kind, qnorm, cents_np,
                k, rerank, excl, predicate, n_probe,
            )
        for qid, qv in qnorm:
            dots = cents_np @ np.asarray(qv, dtype="float64")
            top = sorted(
                range(len(cents_np)), key=lambda ci: (-dots[ci], ci)
            )[:n_probe]
            probes[qid] = set(top)
        task_shards = sorted(set().union(*probes.values())) if probes else []
    else:
        task_shards = list(range(n_shards))

    from pdf_etl_ocr_inference_spark.operators.graph_ann import (
        _greedy_search,
    )

    def _answer(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for idx in pdf["shard"]:
                sh = task_shards[int(idx)]
                state = _load_shard(path, int(sh), version, kind)
                for qid, qv in qnorm:
                    qu = np.asarray(qv, dtype="float64")
                    if kind == "nsw":
                        mat, adj, ids_sorted = state
                        eff = ef
                        while True:
                            near = _greedy_search(
                                mat, adj, ids_sorted, qu, eff
                            )
                            local = []
                            for _, i in near:
                                if i in excl or (
                                    predicate is not None
                                    and not predicate(i)
                                ):
                                    continue
                                local.append(
                                    (qid, i, float(np.dot(qu, mat[i])))
                                )
                            if (
                                predicate is None
                                or len(local) >= k
                                or eff >= len(ids_sorted)
                            ):
                                break
                            eff = min(eff * 2, len(ids_sorted))
                        local.sort(key=lambda t: (-t[2], t[1]))
                        rows.extend(local[:k])
                    elif kind == "pq":
                        got = _pq_answer(
                            state, qu, k, rerank, excl, pred=predicate
                        )
                        rows.extend((qid, i, s) for i, s in got)
                    elif kind == "ivf":
                        if sh not in probes.get(qid, ()):
                            continue
                        got = _ivf_answer(state, qu, k, excl)
                        rows.extend((qid, i, s) for i, s in got)
                    elif kind == "ivfpq":
                        if sh not in probes.get(qid, ()):
                            continue
                        got = _ivfpq_answer(
                            state, qu, cents_np[sh], k, rerank, excl
                        )
                        rows.extend((qid, i, s) for i, s in got)
                    else:
                        mat, layered, levels, ids_sorted = state
                        got = _hnsw_walk(
                            mat, layered, levels, ids_sorted, qu, k, ef,
                            excl, pred=predicate,
                        )
                        rows.extend((qid, i, s) for i, s in got)
            yield pd.DataFrame(rows, columns=["qid", "vec_id", "score"])

    # one shard per partition WITHOUT a shuffle: range(n) split into
    # n partitions puts row i in partition i; the task maps the index
    # through task_shards (for IVF, only the probed cells get tasks).
    # The query job is a single python stage + the k-row merge (every
    # job stage is fixed overhead on an online path).
    n_tasks = max(len(task_shards), 1)
    shards = spark.range(0, len(task_shards), 1, n_tasks).select(
        F.col("id").cast("int").alias("shard")
    )
    local = shards.mapInPandas(_answer, _OUT_SCHEMA)
    from pyspark.sql import Window

    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("vec_id"))
    # ≤ n_shards·k rows per query survive the shard merge — collapse
    # to one partition (repartition, NOT coalesce: coalesce would
    # serialize the shard tasks themselves) so the per-qid window
    # doesn't pay a shuffle.partitions-wide exchange on control data
    return (
        local.repartition(1)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select("qid", "vec_id", F.round("score", 4).alias("score"))
    )


def _serve_cells_prefiltered(
    spark, path, version, kind, qnorm, cents_np,
    k, rerank, excl, predicate, n_probe,
):
    """Multi-round probe widening for filtered IVF/IVFPQ serving:
    round 1 probes each query's ``n_probe`` nearest cells with the
    predicate applied IN-CELL (pre-filter); any query with fewer
    than k survivors doubles its probed-cell prefix and the next
    round dispatches tasks ONLY for the newly probed cells.  At most
    ``log2(n_cells)`` extra jobs, each smaller than the first — a
    tight filter reads more cells instead of starving, and the
    result is deterministic (cell ranking by (-dot, cell), exact
    per-cell answers, per-qid (-score, id) merge)."""
    import numpy as np

    n_cells = len(cents_np)
    qids = [qid for qid, _ in qnorm]
    rank_by_q: dict[int, list[int]] = {}
    for qid, qv in qnorm:
        dots = cents_np @ np.asarray(qv, dtype="float64")
        rank_by_q[qid] = sorted(
            range(n_cells), key=lambda ci: (-dots[ci], ci)
        )
    probed: dict[int, set] = {qid: set() for qid in qids}
    acc: dict[int, list] = {qid: [] for qid in qids}
    cur = {qid: max(min(n_probe, n_cells), 1) for qid in qids}

    while True:
        round_probes = {}
        for qid in qids:
            new = [
                c
                for c in rank_by_q[qid][: cur[qid]]
                if c not in probed[qid]
            ]
            if new:
                round_probes[qid] = set(new)
        if not round_probes:
            break
        cells = sorted(set().union(*round_probes.values()))

        def _answer(batches, _cells=cells, _rp=round_probes):
            import pandas as pd

            for pdf in batches:
                rows = []
                for idx in pdf["shard"]:
                    sh = _cells[int(idx)]
                    state = _load_shard(path, sh, version, kind)
                    for qid, qv in qnorm:
                        if sh not in _rp.get(qid, ()):
                            continue
                        qu = np.asarray(qv, dtype="float64")
                        if kind == "ivf":
                            got = _ivf_answer(
                                state, qu, k, excl, pred=predicate
                            )
                        else:
                            got = _ivfpq_answer(
                                state, qu, cents_np[sh], k, rerank,
                                excl, pred=predicate,
                            )
                        rows.extend((qid, i, s) for i, s in got)
                yield pd.DataFrame(
                    rows, columns=["qid", "vec_id", "score"]
                )

        n_tasks = max(len(cells), 1)
        shards = spark.range(0, len(cells), 1, n_tasks).select(
            F.col("id").cast("int").alias("shard")
        )
        for r in shards.mapInPandas(_answer, _OUT_SCHEMA).collect():
            acc[int(r["qid"])].append((int(r["vec_id"]), float(r["score"])))
        for qid, cs in round_probes.items():
            probed[qid].update(cs)
        starved = [
            qid
            for qid in qids
            if len(acc[qid]) < k and cur[qid] < n_cells
        ]
        if not starved:
            break
        for qid in starved:
            cur[qid] = min(cur[qid] * 2, n_cells)

    final = []
    for qid in qids:
        best = sorted(acc[qid], key=lambda t: (-t[1], t[0]))[:k]
        final.extend((qid, i, s) for i, s in best)
    # F.round (HALF_UP), not Python round (half-even): the same
    # (query, vector) pair must report the same score with and
    # without a predicate (review-r12)
    return spark.createDataFrame(final, _OUT_SCHEMA).select(
        "qid", "vec_id", F.round("score", 4).alias("score")
    )


def serving_refresh_fn(path: str, kind: str):
    """Adapter: a ``refresh_fn`` for ``optimizer.sync_index_from_feed``
    that folds change-feed commits into a SERVING index — the same
    TRIGGERED availableNow maintenance loop the LSH/MinHash indexes
    use (streaming checkpoint + per-index version watermark =
    at-least-once ingestion with idempotent folds), pointed at the
    pinned-serving layouts.  Each fold bumps ``last_version``, so
    executor caches invalidate as commits land."""
    from pdf_etl_ocr_inference_spark.operators.graph_ann import (
        refresh_nsw_index,
    )
    from pdf_etl_ocr_inference_spark.operators.hnsw import (
        refresh_hnsw_index,
    )

    refreshers = {
        "nsw": refresh_nsw_index,
        "hnsw": refresh_hnsw_index,
        "pq": refresh_pq_serving_index,
        "ivf": refresh_ivf_serving_index,
        "ivfpq": refresh_ivfpq_serving_index,
    }
    if kind not in refreshers:
        raise ValueError(f"kind must be one of {sorted(refreshers)}")
    refresh = refreshers[kind]

    def fn(spark, table_key, changes, version, catalog=None):
        refresh(spark, path, changes, version)

    return fn


def _hnsw_walk(mat, layered, levels, ids_sorted, qu, k, ef, excl, pred=None):
    """Layered descent + layer-0 beam on pre-parsed state (the cached
    twin of ``hnsw._search_shard``, which parses pandas rows).  With a
    ``pred``icate the layer-0 beam WIDENS (ef doubling, up to the
    shard size) until k survivors pass — filtered-HNSW walks the
    unfiltered graph (filtering edges would disconnect it) and
    filters at collection."""
    import numpy as np

    from pdf_etl_ocr_inference_spark.operators.graph_ann import (
        _greedy_search,
    )

    if not ids_sorted:
        return []
    ep = min(mat, key=lambda i: (-levels[i], i))
    cur = ep
    for lv in range(levels[ep], 0, -1):
        near = _greedy_search(mat, layered[lv], ids_sorted, qu, 1, entry=cur)
        if near:
            cur = near[0][1]
    eff = ef
    while True:
        near = _greedy_search(
            mat, layered[0], ids_sorted, qu, eff, entry=cur
        )
        rows = []
        for _, i in near:
            if i in excl or (pred is not None and not pred(i)):
                continue
            rows.append((i, float(np.dot(qu, mat[i]))))
        # pred=None must walk exactly once — the pre-predicate
        # behavior (review-r12: a thin beam on a degenerate shard
        # would otherwise re-walk and could return different rows)
        if pred is None or len(rows) >= k or eff >= len(ids_sorted):
            break
        eff = min(eff * 2, len(ids_sorted))
    rows.sort(key=lambda t: (-t[1], t[0]))
    return rows[:k]
