"""Multimodal query catalog: binary media columns derived from the
documents fixture (payload = utf-8 bytes standing in for an encoded
image), exercising the blob+metadata layout, the mapInPandas decode
boundary, native frame sampling, and feature extraction.

Oracle notes: payload derivation is deterministic (ENCODE(text)), so
metadata and the SQL-derivable parts of the fake decode are value-
checked in DuckDB; the Python decode/feature stages are rows-only and
property-tested in pytest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdf_etl_ocr_inference_spark.operators.multimodal import (
    audio_features,
    byte_histogram_features,
    decode_media,
    sample_frames,
    with_media_column,
)
from pdf_etl_ocr_inference_spark.plans import phash_sql as _phash_sql
from pdf_etl_ocr_inference_spark.plans.registry import register
from pdf_etl_ocr_inference_spark.sources.catalog import load_table as _t


@register(
    "mm_media_metadata",
    # DuckDB's md5 takes VARCHAR only; the fixture text is pure ASCII
    # (verified octet_length == length at every SF), so md5(text) ==
    # Spark's md5(encode(text,'utf-8')).
    "SELECT doc_id AS media_id, 'image/fake' AS mime, "
    "OCTET_LENGTH(ENCODE(text)) AS n_bytes, MD5(text) AS checksum "
    "FROM documents",
    doc="opaque binary media column + typed metadata struct; metadata "
    "predicates prune without reading payload bytes (parquet column "
    "pruning).",
)
def mm_media_metadata(spark: SparkSession, sf: str) -> DataFrame:
    media = with_media_column(_t(spark, sf, "documents"))
    return media.select(
        "media_id",
        F.col("meta.mime").alias("mime"),
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.checksum").alias("checksum"),
    )


@register(
    "mm_decode_stub",
    "SELECT doc_id AS media_id, "
    "1 + (OCTET_LENGTH(ENCODE(text)) % 512) AS width, "
    "OCTET_LENGTH(ENCODE(text)) AS n_bytes FROM documents",
    doc="mapInPandas decode boundary with the deterministic fake "
    "decoder (real codecs are an injection point, absent here — "
    "SURVEY §7 hard-part-a pattern). The SQL-derivable outputs "
    "(width, n_bytes) are oracle-checked; brightness/height are "
    "pytest-checked.",
)
def mm_decode_stub(spark: SparkSession, sf: str) -> DataFrame:
    media = with_media_column(_t(spark, sf, "documents"))
    return decode_media(media).select("media_id", "width", "n_bytes")


@register(
    "mm_byte_histogram",
    "SELECT doc_id AS media_id, 16 AS n_bins, "
    "CAST(LENGTH(REGEXP_REPLACE(text, '[^\\x00-\\x0F]', '', 'g')) "
    "AS BIGINT) AS count_b0, "
    "CAST(LENGTH(REGEXP_REPLACE(text, '[^ -/]', '', 'g')) "
    "AS BIGINT) AS count_b2, "
    "CAST(LENGTH(REGEXP_REPLACE(text, '[^0-?]', '', 'g')) "
    "AS BIGINT) AS count_b3, "
    "CAST(LENGTH(REGEXP_REPLACE(text, '[^@-O]', '', 'g')) "
    "AS BIGINT) AS count_b4, "
    "CAST(LENGTH(REGEXP_REPLACE(text, '[^P-_]', '', 'g')) "
    "AS BIGINT) AS count_b5, "
    "CAST(LENGTH(REGEXP_REPLACE(text, '[^`-o]', '', 'g')) "
    "AS BIGINT) AS count_b6, "
    "CAST(LENGTH(REGEXP_REPLACE(text, '[^p-\\x7F]', '', 'g')) "
    "AS BIGINT) AS count_b7 "
    "FROM documents",
    doc="byte-histogram feature extraction (16-bin, L1-normalized) — "
    "the image-embedding-shaped mapInPandas stage (id + "
    "array<float>).  ORACLED since r5: the fixture corpus is pure "
    "ASCII (octet_length == length, verified at every SF), so each "
    "16-wide byte bin is an exact character-class count DuckDB "
    "replays with REGEXP_REPLACE; the entry reconstructs the integer "
    "counts from the normalized float32 features (feat*n_bytes "
    "rounds exactly below 2^23) — a histogram bug that moves any "
    "mass between bins now hash-mismatches.  The features array "
    "itself stays out of the output (array cells are unhashable to "
    "the driver canonicalizer).",
)
def mm_byte_histogram(spark: SparkSession, sf: str) -> DataFrame:
    media = with_media_column(_t(spark, sf, "documents"))
    feats = byte_histogram_features(media)
    joined = feats.join(
        media.select("media_id", F.col("meta.n_bytes").alias("n_bytes")),
        "media_id",
    )
    counts = [
        F.round(
            F.element_at("features", b + 1).cast("double")
            * F.col("n_bytes")
        )
        .cast("long")
        .alias(f"count_b{b}")
        for b in (0, 2, 3, 4, 5, 6, 7)
    ]
    return joined.select(
        "media_id", F.size("features").alias("n_bins"), *counts
    )


@register(
    "mm_audio_features",
    # the SQL-derivable half of the decode (sample count & duration
    # from byte length) is oracle-checked; rms/peak are pytest-checked
    "SELECT doc_id AS media_id, "
    "OCTET_LENGTH(ENCODE(text)) // 2 AS n_samples, "
    "ROUND((OCTET_LENGTH(ENCODE(text)) // 2) / 16000.0, 6) "
    "AS duration_s FROM documents",
    doc="audio modality: blob as 16-bit PCM mono → n_samples / "
    "duration / RMS / peak via numpy-frombuffer mapInPandas (codec "
    "injection point, same pattern as image decode).",
)
def mm_audio_features(spark: SparkSession, sf: str) -> DataFrame:
    media = with_media_column(_t(spark, sf, "documents"))
    feats = audio_features(media, sample_rate=16_000)
    return feats.select(
        "media_id", "n_samples", F.round("duration_s", 6).alias("duration_s")
    )


@register(
    "mm_byte_stats_arrow",
    "SELECT doc_id AS media_id, OCTET_LENGTH(ENCODE(text)) AS n_bytes, "
    "LENGTH(REPLACE(text, ' ', '')) AS n_nonspace FROM documents",
    doc="mapInArrow variant of the blob-stats stage: operates on raw "
    "pyarrow RecordBatches (no pandas materialization — lower "
    "overhead than mapInPandas when the logic is already columnar). "
    "Oracle derives the same byte stats relationally.",
)
def mm_byte_stats_arrow(spark: SparkSession, sf: str) -> DataFrame:
    import pyarrow as pa

    from pdf_etl_ocr_inference_spark.operators.layout import (
        ensure_min_parallelism,
    )

    media = with_media_column(_t(spark, sf, "documents"))

    def _stats(batches):
        for batch in batches:
            ids = batch.column("media_id")
            payloads = batch.column("payload")
            n_bytes = []
            n_nonspace = []
            for p in payloads:
                b = p.as_py()
                n_bytes.append(len(b))
                n_nonspace.append(len(b) - b.count(b" "))
            yield pa.RecordBatch.from_arrays(
                [ids, pa.array(n_bytes, pa.int64()), pa.array(n_nonspace, pa.int64())],
                names=["media_id", "n_bytes", "n_nonspace"],
            )

    work = ensure_min_parallelism(media.select("media_id", "payload"))
    return work.mapInArrow(
        _stats, schema="media_id long, n_bytes long, n_nonspace long"
    )


@register(
    "mm_frame_sample",
    # DuckDB can't slice BLOBs; ASCII fixture text makes character
    # substring ≡ byte substring, so the oracle slices the VARCHAR.
    "SELECT media_id, frame_idx, "
    "MD5(SUBSTRING(payload, frame_idx * 256 + 1, 256)) AS frame_checksum "
    "FROM ("
    "  SELECT doc_id AS media_id, text AS payload, "
    "  UNNEST(LIST_FILTER(GENERATE_SERIES(0, "
    "    CAST(CEIL(LENGTH(text) / 256.0) AS INT) - 1), "
    "    i -> i % 4 = 0)) AS frame_idx "
    "  FROM documents)",
    doc="native frame sampling over a 'video' blob: every 4th 256-byte "
    "frame, one row per sampled frame with an md5 fingerprint — byte "
    "slicing stays JVM-side (no Python).",
)
def mm_frame_sample(spark: SparkSession, sf: str) -> DataFrame:
    media = with_media_column(_t(spark, sf, "documents"))
    return sample_frames(media, frame_bytes=256, every_nth=4)


@register(
    "mm_phash",
    _phash_sql.phash_sql(),
    doc="64-bit perceptual hash (dHash) per media blob: block-mean "
    "downsample to an 8x9 grid, difference bits — the fingerprint "
    "step of image near-dup dedup. Arrow-batched pandas UDF for the "
    "pixel work; output is 8 bytes/row, so everything downstream is "
    "native. ORACLED (r7): block means are exact rationals (integer "
    "sums < 2^53 are exact in float64 under any summation order, one "
    "correctly-rounded division), so DuckDB replays the hash "
    "bit-for-bit from hex-sliced payload bytes "
    "(plans/phash_sql.py).",
)
def mm_phash(spark: SparkSession, sf: str) -> DataFrame:
    from pdf_etl_ocr_inference_spark.operators.multimodal import (
        perceptual_hash,
    )

    media = with_media_column(_t(spark, sf, "documents"))
    return perceptual_hash(media)


@register(
    "mm_phash_neardup",
    _phash_sql.phash_neardup_sql(max_hamming=6),
    # ORACLED (r7): the oracle is the COMPLETE brute-force hamming
    # scan over SQL-replayed fingerprints — the Manku block join must
    # reproduce it exactly (pigeonhole completeness at radius < blocks)
    doc="image near-duplicate pairs: dHash hamming <= 6 via the Manku "
    "block join (8 blocks of 8 bits -> complete candidates at radius "
    "6), exact bit_count verify on candidates only — the SimHash "
    "dedup machinery reused across modalities. Sub-quadratic: "
    "candidate volume tracks block-bucket sizes, not n^2. The media "
    "fixture PLANTS deterministic twins for every 50th blob (an "
    "identical re-encode at id+1e6 and a one-byte-appended variant "
    "at id+2e6), so the entry returns stable non-zero pairs at every "
    "SF — the fixture's organic blobs alone share no near hashes, "
    "which made the r2 rows-only check vacuous (0 rows).",
)
def mm_phash_neardup(spark: SparkSession, sf: str) -> DataFrame:
    from pdf_etl_ocr_inference_spark.operators.multimodal import (
        phash_near_pairs,
    )

    docs = _t(spark, sf, "documents").select("doc_id", "text")
    planted = docs.filter(F.col("doc_id") % 50 == 0)
    twins_ident = planted.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    twins_pert = planted.select(
        (F.col("doc_id") + 2_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" ")).alias("text"),
    )
    media = with_media_column(
        docs.unionByName(twins_ident).unionByName(twins_pert)
    )
    return phash_near_pairs(media)
