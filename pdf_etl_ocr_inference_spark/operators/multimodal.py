"""Multimodal (image/audio/video) column operators.

Design: media are opaque ``binary`` columns plus a typed metadata
struct, the layout a large-scale training-data pipeline uses (payload
stays a blob; everything queryable lives in typed columns).  The
container has no image/audio codecs, so the *decode* step is an
injection point exactly like the OCR ``parse_fn`` (SURVEY §7 hard
part a): production injects PIL/ffmpeg; tests and the testdata path
use a deterministic byte-level fake.  All Spark-side plumbing —
schemas, Arrow batching, partitioning, UDF signatures — is real and
exercised.

Scale notes (100 TB of media):
- blobs ride ``spark.read.format("binaryFile")`` or parquet binary
  columns; metadata predicates prune without touching payload bytes
  (parquet column pruning — a filter on ``meta.width`` never reads
  the blob column).
- decode/feature-extract are ``mapInPandas`` stages behind
  ``ensure_min_parallelism``; one Arrow batch of blobs per task.
- frame sampling emits (media_id, frame_idx) rows — explode-shaped,
  so downstream per-frame work distributes.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pdf_etl_ocr_inference_spark.operators.layout import ensure_min_parallelism

# A real deployment would gate the codec import like this and inject
# `decode_fn`; the container has no codec libs, so the default stays
# the deterministic fake below.
try:  # pragma: no cover - codec libs absent in this container
    import PIL.Image  # noqa: F401

    _HAS_CODECS = True
except Exception:
    _HAS_CODECS = False


def real_decode_unavailable(payload: bytes) -> dict:
    """Marker for the production decode path."""
    raise NotImplementedError(
        "image/audio codecs are not installed in this environment; "
        "inject decode_fn=<your codec> into decode_media()"
    )


def fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in decoder: derives image-like metadata
    purely from the bytes, so tests are hermetic and repeatable.

    width  = 1 + (len % 512); height = 1 + (first byte); channels = 3;
    brightness = mean byte value.
    """
    n = len(payload)
    return {
        "width": 1 + (n % 512),
        "height": 1 + (payload[0] if n else 0),
        "channels": 3,
        "n_bytes": n,
        "brightness": (sum(payload) / n) if n else 0.0,
    }


DECODED_SCHEMA = T.StructType(
    [
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("brightness", T.DoubleType()),
    ]
)


def with_media_column(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Derive an opaque media column from the documents fixture: the
    UTF-8 bytes stand in for an encoded image payload, plus a typed
    metadata struct.  (The testdata has no true binary table; the
    derivation is deterministic so oracles can mirror it.)
    """
    payload = F.encode(F.col(text_col), "utf-8")
    return df.select(
        F.col(id_col).alias("media_id"),
        payload.alias("payload"),
        F.struct(
            F.lit("image/fake").alias("mime"),
            F.octet_length(payload).alias("n_bytes"),
            F.md5(payload).alias("checksum"),
        ).alias("meta"),
    )


DecodeFn = Callable[[bytes], dict]


def decode_media(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    decode_fn: DecodeFn | None = None,
) -> DataFrame:
    """Decode blobs → typed feature columns via ``mapInPandas``.

    One Arrow batch of blobs per iteration; ``decode_fn`` runs
    per-payload inside the batch loop (the codec boundary).  Output is
    (id, decoded-struct columns flattened) — blob dropped, so
    downstream stages never shuffle payload bytes.
    """
    fn = fake_decode if decode_fn is None else decode_fn
    out_schema = T.StructType(
        [df.schema[id_col]] + list(DECODED_SCHEMA.fields)
    )

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [fn(p) for p in pdf[payload_col]]
            out = pd.DataFrame(decoded)
            out.insert(0, id_col, pdf[id_col].to_numpy())
            yield out

    work = ensure_min_parallelism(df.select(id_col, payload_col))
    return work.mapInPandas(_decode, schema=out_schema)


def byte_histogram_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    n_bins: int = 16,
) -> DataFrame:
    """Feature-extract: normalized byte histogram (``n_bins`` buckets)
    per blob — the deterministic stand-in for an image-embedding
    model, shaped exactly like one (id + ``array<float>``).
    """
    out_schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField("features", T.ArrayType(T.FloatType())),
        ]
    )

    def _hist(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            feats = []
            for p in pdf[payload_col]:
                arr = np.frombuffer(p, dtype=np.uint8)
                if arr.size:
                    hist = np.bincount(arr >> (8 - n_bins.bit_length() + 1),
                                       minlength=n_bins)[:n_bins]
                    feats.append((hist / arr.size).astype("float32").tolist())
                else:
                    feats.append([0.0] * n_bins)
            yield pd.DataFrame({id_col: pdf[id_col].to_numpy(), "features": feats})

    work = ensure_min_parallelism(df.select(id_col, payload_col))
    return work.mapInPandas(_hist, schema=out_schema)


def audio_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    sample_rate: int = 16_000,
) -> DataFrame:
    """Audio-modality features: interpret the blob as 16-bit PCM mono
    and compute duration / RMS / peak per clip — the audio analogue of
    ``decode_media`` (numpy ``frombuffer`` inside ``mapInPandas``; a
    real deployment injects an actual audio codec the same way the
    image path injects PIL).
    """
    out_schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField("n_samples", T.LongType()),
            T.StructField("duration_s", T.DoubleType()),
            T.StructField("rms", T.DoubleType()),
            T.StructField("peak", T.IntegerType()),
        ]
    )

    def _feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = {k: [] for k in ("n_samples", "duration_s", "rms", "peak")}
            for p in pdf[payload_col]:
                samples = np.frombuffer(
                    p[: len(p) - (len(p) % 2)], dtype="<i2"
                ).astype("float64")
                n = samples.size
                out["n_samples"].append(n)
                out["duration_s"].append(n / sample_rate)
                out["rms"].append(
                    float(np.sqrt((samples**2).mean())) if n else 0.0
                )
                out["peak"].append(
                    int(np.abs(samples).max()) if n else 0
                )
            res = pd.DataFrame(out)
            res.insert(0, id_col, pdf[id_col].to_numpy())
            yield res

    work = ensure_min_parallelism(df.select(id_col, payload_col))
    return work.mapInPandas(_feats, schema=out_schema)


def sample_frames(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    frame_bytes: int = 256,
    every_nth: int = 4,
) -> DataFrame:
    """Frame-sample a "video" blob: treat each ``frame_bytes`` slice as
    a frame, keep every ``every_nth`` one, emit one row per sampled
    frame with a content fingerprint.  Native (no Python): sequence +
    substr over the binary — frame extraction is byte slicing, which
    Spark does JVM-side.
    """
    n_frames = F.ceil(F.octet_length(payload_col) / F.lit(frame_bytes)).cast(
        "int"
    )
    idxs = F.filter(
        F.sequence(F.lit(0), n_frames - 1),
        lambda i: i % every_nth == 0,
    )
    return (
        df.select(
            F.col(id_col),
            F.col(payload_col),
            F.explode(idxs).alias("frame_idx"),
        )
        .select(
            id_col,
            "frame_idx",
            F.md5(
                F.expr(
                    f"substring({payload_col}, frame_idx * {frame_bytes} + 1, "
                    f"{frame_bytes})"
                )
            ).alias("frame_checksum"),
        )
    )


# ------------------------------------------------------------------
# Perceptual hashing (image near-duplicate detection)
# ------------------------------------------------------------------

_DHASH_ROWS, _DHASH_COLS = 8, 9  # 8x8 comparison bits


def _dhash_one(payload: bytes) -> int:
    """dHash (difference hash) of one blob's pixel plane.

    The blob's bytes stand in for the decoded grayscale image (the
    same injection-point convention as ``fake_decode``; production
    swaps in a real decode + resize).  Block-mean downsample to an
    8x9 grid, then bit (i,j) = grid[i][j] < grid[i][j+1] — a 64-bit
    locality-preserving fingerprint: small payload edits flip few
    bits, so near-dup images land within a small hamming radius.
    Pure integer/float arithmetic on the byte values — deterministic.
    """
    import numpy as np

    if not payload:  # None (NULL column) and b'' degrade alike
        payload = b"\x00"
    b = np.frombuffer(payload, dtype=np.uint8)
    if b.size == 0:
        b = np.zeros(1, dtype=np.uint8)
    grid = [
        [
            (float(cell.mean()) if cell.size else 0.0)
            for cell in np.array_split(row, _DHASH_COLS)
        ]
        for row in np.array_split(b, _DHASH_ROWS)
    ]
    h = 0
    for i in range(_DHASH_ROWS):
        for j in range(_DHASH_COLS - 1):
            h = (h << 1) | int(grid[i][j] < grid[i][j + 1])
    return h - (1 << 64) if h >= (1 << 63) else h


def perceptual_hash(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """(id, phash): 64-bit dHash per blob via an Arrow-batched pandas
    UDF — the per-pixel work is the codec boundary (Python by
    necessity), everything after the 8-byte hash is native Spark.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(T.LongType())
    def _dhash(payloads: pd.Series) -> pd.Series:
        return pd.Series(
            [_dhash_one(p) for p in payloads], dtype="int64"
        )

    work = ensure_min_parallelism(df.select(id_col, payload_col))
    return work.select(
        F.col(id_col), _dhash(F.col(payload_col)).alias("phash")
    )


def phash_near_pairs(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    max_hamming: int = 6,
    num_blocks: int = 8,
) -> DataFrame:
    """Image near-duplicate pairs: dHash fingerprints + the same
    Manku block-join used for SimHash text dedup (``operators.dedup.
    hamming_near_pairs``).  Defaults use 8 blocks of 8 bits so the
    radius-6 candidate generation is complete (pigeonhole needs
    ``max_hamming < num_blocks``); narrower blocks mean a wider
    candidate join — the usual LSH recall/cost trade.
    """
    from pdf_etl_ocr_inference_spark.operators.dedup import hamming_near_pairs

    fps = perceptual_hash(df, payload_col=payload_col, id_col=id_col)
    return hamming_near_pairs(
        fps, "phash", id_col, max_hamming=max_hamming, num_blocks=num_blocks
    )
