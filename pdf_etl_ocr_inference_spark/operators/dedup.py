"""Deduplication operators for large-scale training-data pipelines.

All-native Column implementations (no Python UDFs): hashing uses
``xxhash64``/``md5`` built-ins, shingling uses higher-order array
functions, candidate generation is a band-bucket self-join — the
standard MinHash-LSH construction (Broder 1997; Leskovec et al.,
"Mining of Massive Datasets" ch.3), expressed Spark-first.

Scale notes (100 TB):
- exact dedup = hash-groupBy: one shuffle on a 32-byte key, heavily
  combinable map-side.
- MinHash-LSH: cost is the band-bucket shuffle;  bucket ids are
  (band_idx, hash-of-band-signature) so the self-join key space is
  huge → no skew.  Candidate verification re-joins shingle sets only
  for candidate pairs (tiny vs corpus).
- SimHash: 64-bit fingerprint per doc; near-dup = identical fingerprint
  per rotated band table (Manku et al. WWW'07 style), again join-based.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pdf_etl_ocr_inference_spark.functions.text import (
    doc_fingerprint,
    word_ngrams,
)
from pdf_etl_ocr_inference_spark.operators.layout import ensure_min_parallelism

# ------------------------------------------------------------------
# Exact dedup
# ------------------------------------------------------------------


def exact_dedup_keys(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Group by canonical fingerprint; keep min id as survivor.

    Output: ``fingerprint, keep_id, n_dups`` — the survivor map a
    downstream anti-join uses to drop duplicates.
    """
    return (
        ensure_min_parallelism(df)
        .select(F.col(id_col), doc_fingerprint(text_col).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count("*").alias("n_dups"),
        )
    )


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Return the deduplicated rows (survivor per fingerprint)."""
    keys = exact_dedup_keys(df, text_col, id_col).select(
        F.col("keep_id").alias(id_col)
    )
    return df.join(keys, on=id_col, how="left_semi")


# ------------------------------------------------------------------
# MinHash + LSH near-dedup
# ------------------------------------------------------------------


def minhash_signatures(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 32,
    shingle_n: int = 3,
) -> DataFrame:
    """id + MinHash signature (array<long>) per document.

    Hash family: xxhash64(shingle, seed=i) — independent seeds give
    independent permutation approximations; all JVM-native.

    Formulation: explode distinct shingles → ``num_hashes`` seeded
    min-aggregates → repack as array.  One shuffle keyed by doc id
    with full map-side combine (partial mins), and every hash stays
    inside whole-stage codegen.  The alternative — nested
    ``array_min(transform(...))`` once per seed — builds a lambda
    expression per hash that is interpreted per array element and
    bloats codegen compile time by seconds per query.

    Documents with zero shingles (shorter than ``shingle_n`` words)
    drop out here, which is correct for dedup: they collide with
    nothing.
    """
    exploded = ensure_min_parallelism(df).select(
        F.col(id_col),
        F.explode(F.array_distinct(word_ngrams(text_col, shingle_n))).alias(
            "_sh"
        ),
    )
    per_doc = exploded.groupBy(id_col).agg(
        *[
            F.min(F.xxhash64("_sh", F.lit(i))).alias(f"_h{i}")
            for i in range(num_hashes)
        ]
    )
    return per_doc.select(
        F.col(id_col),
        F.array(*[F.col(f"_h{i}") for i in range(num_hashes)]).alias("sig"),
    )


def minhash_lsh_candidates(
    sigs: DataFrame,
    id_col: str,
    num_bands: int = 8,
    rows_per_band: int | None = None,
) -> DataFrame:
    """Band the signatures and self-join on (band, band-hash) buckets.

    Output: candidate pairs ``id_a < id_b`` with the number of bands
    in which they collided (dedup over bands built in).

    No barrier needed: ``minhash_signatures`` ends in an aggregation,
    so the band projections reference post-shuffle attributes rather
    than re-inlining the signature expression per band.
    """
    if rows_per_band is not None:
        rpb = F.lit(rows_per_band)
    else:
        rpb = (F.size("sig") / num_bands).cast("int")
    banded = sigs.select(
        id_col,
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(num_bands - 1)),
                lambda b: F.xxhash64(
                    F.slice(F.col("sig"), b * rpb + 1, rpb).cast("string"), b
                ),
            )
        ).alias("band", "bucket"),
    )
    a = banded.select(
        F.col(id_col).alias("id_a"), "band", "bucket"
    )
    b = banded.select(
        F.col(id_col).alias("id_b"), "band", "bucket"
    )
    return (
        a.join(b, on=["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_bands"))
    )


def minhash_dedup_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 32,
    num_bands: int = 8,
    shingle_n: int = 3,
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline → verified duplicate pairs.

    Candidates from LSH buckets, then exact n-gram Jaccard verification
    on the candidate pairs only (join back the shingle sets).
    Output: ``id_a, id_b, jaccard`` (rounded 4) for pairs ≥ threshold.
    """
    shingled = ensure_min_parallelism(df).select(
        F.col(id_col),
        F.array_distinct(word_ngrams(text_col, shingle_n)).alias("shingles"),
    )
    if num_hashes % num_bands:
        raise ValueError("num_bands must divide num_hashes")
    sigs = minhash_signatures(df, text_col, id_col, num_hashes, shingle_n)
    cands = minhash_lsh_candidates(
        sigs, id_col, num_bands, rows_per_band=num_hashes // num_bands
    )
    sa = shingled.select(
        F.col(id_col).alias("id_a"), F.col("shingles").alias("sh_a")
    )
    sb = shingled.select(
        F.col(id_col).alias("id_b"), F.col("shingles").alias("sh_b")
    )
    verified = (
        cands.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.size(F.array_union("sh_a", "sh_b")),
        )
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return verified


# ------------------------------------------------------------------
# n-gram Jaccard (exact, pairwise — oracle-checkable on small scopes)
# ------------------------------------------------------------------


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    shingle_n: int = 3,
    threshold: float = 0.2,
) -> DataFrame:
    """Exact pairwise n-gram Jaccard ≥ threshold.

    O(n²) — the brute-force baseline MinHash-LSH approximates; callers
    scope it to a bounded subset.  Output ``id_a, id_b, jaccard``.
    """
    sh = ensure_min_parallelism(df).select(
        F.col(id_col),
        F.array_distinct(word_ngrams(text_col, shingle_n)).alias("sh"),
    )
    a = sh.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.size(F.array_union("sh_a", "sh_b")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ------------------------------------------------------------------
# SimHash
# ------------------------------------------------------------------


def simhash(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """64-bit SimHash fingerprint per document (Charikar 2002).

    For each bit position, sum +1/−1 votes of token hashes; bit = 1 if
    the sum is positive.  Formulation: explode tokens → one xxhash64
    per token → 64 conditional-sum aggregates → recombine bits.  One
    shuffle keyed by doc id with map-side partial sums, everything in
    whole-stage codegen.  (64 ``F.aggregate`` lambdas over a token
    array would each be interpreted per element — seconds of codegen
    and a Python-free but JVM-interpreted hot path.)

    Token frequency weights votes (tokens are not deduplicated),
    matching the standard construction.
    """
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    exploded = ensure_min_parallelism(df).select(
        F.col(id_col), F.explode(toks).alias("_t")
    )
    h = F.xxhash64("_t")
    votes = exploded.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(
                    F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1
                ).otherwise(-1)
            ).alias(f"_v{b}")
            for b in range(64)
        ]
    )
    bits = [
        F.when(
            F.col(f"_v{b}") > 0,
            F.lit(2**b if b < 63 else -(2**63)).cast("long"),
        ).otherwise(F.lit(0).cast("long"))
        for b in range(64)
    ]
    fingerprint = bits[0]
    for c in bits[1:]:
        fingerprint = fingerprint + c
    return votes.select(F.col(id_col), fingerprint.alias("simhash"))


def hamming_near_pairs(
    fps: DataFrame,
    hash_col: str,
    id_col: str,
    max_hamming: int = 3,
    num_blocks: int = 4,
) -> DataFrame:
    """Near pairs among 64-bit fingerprints by hamming ≤ max_hamming.

    Block-permutation candidate generation (Manku et al., WWW'07):
    split the 64-bit fingerprint into ``num_blocks`` 16-bit blocks; two
    fingerprints within hamming r < num_blocks must agree on ≥1 block →
    join per block, verify with bit_count(xor).  Works for any 64-bit
    locality-preserving hash (SimHash over text, dHash over images).

    Completeness requires ``max_hamming < num_blocks`` (pigeonhole);
    rejected otherwise instead of silently losing recall.  Wider radii
    → more, narrower blocks (e.g. 8 blocks of 8 bits for radius ≤ 7),
    which also widens the candidate join — the usual LSH trade.
    """
    if max_hamming >= num_blocks:
        raise ValueError(
            f"max_hamming={max_hamming} needs num_blocks>{max_hamming} "
            "for complete candidate generation"
        )
    if 64 % num_blocks:
        raise ValueError("num_blocks must divide 64")
    width = 64 // num_blocks
    # width=64 (num_blocks=1): 2^64-1 overflows a long literal; the
    # all-bits mask in signed-64 arithmetic is -1
    mask = (1 << width) - 1 if width < 64 else -1
    blocked = fps.select(
        id_col,
        hash_col,
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col(hash_col), width * i).bitwiseAND(
                        F.lit(mask)
                    )
                    for i in range(num_blocks)
                ]
            )
        ).alias("block_idx", "block_val"),
    )
    a = blocked.select(
        F.col(id_col).alias("id_a"),
        F.col(hash_col).alias("sh_a"),
        "block_idx",
        "block_val",
    )
    b = blocked.select(
        F.col(id_col).alias("id_b"),
        F.col(hash_col).alias("sh_b"),
        "block_idx",
        "block_val",
    )
    return (
        a.join(b, on=["block_idx", "block_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sh_a", "sh_b")
        .distinct()
        .withColumn("hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def simhash_near_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_hamming: int = 3,
    num_blocks: int = 4,
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance ≤ max_hamming."""
    fps = simhash(df, text_col, id_col)
    return hamming_near_pairs(
        fps, "simhash", id_col, max_hamming=max_hamming, num_blocks=num_blocks
    )


# ------------------------------------------------------------------
# Connected components (log-round)
# ------------------------------------------------------------------


def connected_components(
    edges: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_rounds: int = 20,
) -> tuple[DataFrame, int]:
    """Log-round connected components over an undirected pair graph.

    Shiloach–Vishkin-style alternation, per round:

    1. **hook** — every node takes the minimum label among itself and
       its neighbors (plain HashMin step);
    2. **shortcut** — one pointer jump: ``label := label(label)``,
       compressing label chains so distances to the component minimum
       halve every round.

    Plain neighbor-min propagation (``dedup_clusters``) needs
    O(diameter) rounds — fine for exact-dup cliques, hopeless for the
    chain-shaped similarity graphs near-dup dedup produces at 100 TB.
    The hook+shortcut alternation converges in O(log n) rounds on any
    graph shape, so ``max_rounds=20`` covers components of ~10^6-hop
    diameter.  Labels only decrease and are always node ids from the
    same component, so the fixpoint label is the component minimum.

    ``edges`` need not be symmetric (symmetrized internally) and rows
    with ``id_a == id_b`` are ignored.  Returns ``(labels, rounds)``:
    ``labels(node, component)`` covers every node incident to an edge
    (isolated nodes are their own component by definition and should
    be handled by the caller's final left join — propagating them
    through every round would scale with the corpus, not the pair
    graph).  Raises if ``max_rounds`` is hit without convergence.
    """
    from pdf_etl_ocr_inference_spark.operators.layout import truncate_lineage

    pairs = edges.select(
        F.col(id_a).alias("src"), F.col(id_b).alias("dst")
    ).filter(F.col("src") != F.col("dst"))
    sym = truncate_lineage(
        pairs.unionByName(
            pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ).distinct()
    )
    labels = truncate_lineage(
        sym.select(F.col("src").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("component"))
    )
    for rounds in range(1, max_rounds + 1):
        nmin = (
            sym.join(labels, sym["dst"] == labels["node"])
            .groupBy("src")
            .agg(F.min("component").alias("_nmin"))
        )
        hooked = labels.join(
            nmin, labels["node"] == nmin["src"], "left"
        ).select(
            "node",
            F.least(
                F.col("component"),
                F.coalesce(F.col("_nmin"), F.col("component")),
            ).alias("component"),
        )
        parent = hooked.select(
            F.col("node").alias("_pnode"), F.col("component").alias("_pcomp")
        )
        shortcut = hooked.join(
            parent, hooked["component"] == parent["_pnode"], "left"
        ).select(
            "node",
            F.least(
                F.col("component"),
                F.coalesce(F.col("_pcomp"), F.col("component")),
            ).alias("component"),
        )
        shortcut = truncate_lineage(shortcut)
        changed = (
            shortcut.join(
                labels.withColumnRenamed("component", "_old"), "node"
            )
            .filter(F.col("component") != F.col("_old"))
            .limit(1)
            .count()
        )
        labels = shortcut
        if changed == 0:
            return labels, rounds
    raise RuntimeError(
        f"connected_components: no convergence in {max_rounds} rounds "
        "(theoretically impossible for max_rounds >= log2(n) + 2; "
        "check the edge set for instability)"
    )
