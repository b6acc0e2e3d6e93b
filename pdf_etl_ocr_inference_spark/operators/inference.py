"""Batched model-inference operator (SURVEY.md §2.4/2.10, OP-23/42).

Template = the reference's iterator pandas UDF
(``03-model-inference-on-chunks.py:96-109``): Arrow-batched, client
initialized once per iterator (amortized across batches), requests
sub-batched to ``batch_size`` texts (ref cap 150 at ``03:103``).

``embed_fn`` is the injection point: production wires an HTTP model
client; tests and the testdata path use the deterministic hash
embedder below, so top-k neighbors are reproducible (FIXTURES.md A4).
"""

from __future__ import annotations

import hashlib
import math
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pdf_etl_ocr_inference_spark.operators.layout import ensure_min_parallelism

EmbedFn = Callable[[list[str]], list[list[float]]]

DEFAULT_BATCH_SIZE = 150  # ref 03:103


def hash_embed_texts(texts: list[str], dim: int = 64) -> list[list[float]]:
    """Deterministic stub embedder: token-hash bag-of-words.

    Each token hashes (md5) to a dimension and a sign; the vector is
    L2-normalized.  Similar token multisets → similar vectors, so
    similarity queries behave meaningfully in tests.
    """
    out: list[list[float]] = []
    for text in texts:
        vec = [0.0] * dim
        for tok in text.split():
            h = int.from_bytes(
                hashlib.md5(tok.encode("utf-8")).digest()[:8], "big"
            )
            idx = h % dim
            sign = 1.0 if (h >> 8) % 2 == 0 else -1.0
            vec[idx] += sign
        norm = math.sqrt(sum(v * v for v in vec))
        if norm > 0:
            vec = [v / norm for v in vec]
        out.append(vec)
    return out


def hash_embed_counts(texts: list[str], dim: int = 64) -> list[list[float]]:
    """UNNORMALIZED variant of :func:`hash_embed_texts`: signed token
    counts per hashed dimension, no L2 normalization.

    Every coordinate is a small integer (|v| ≤ token count), which
    float32 represents exactly — so a plan that casts the embedding
    back to BIGINT and scores with integer arithmetic is bit-exact
    and DuckDB-replayable (``MD5`` is shared by both engines), unlike
    the normalized float path.  Cosine over these counts equals
    cosine over the normalized vectors, so ranking is unchanged.
    Tokenization is ``split(" ")`` + drop-empties, exactly the
    token-window chunker's convention (documents.py:42), so the
    oracle replays one tokenizer, not two.
    """
    out: list[list[float]] = []
    for text in texts:
        vec = [0.0] * dim
        for tok in text.split(" "):
            if not tok:
                continue
            h = int.from_bytes(
                hashlib.md5(tok.encode("utf-8")).digest()[:8], "big"
            )
            vec[h % dim] += 1.0 if (h >> 8) % 2 == 0 else -1.0
        out.append(vec)
    return out


def make_inference_udf(
    embed_fn: EmbedFn | None = None,
    dim: int = 64,
    batch_size: int = DEFAULT_BATCH_SIZE,
) -> Callable[..., Column]:
    """Build the iterator pandas UDF (OP-23 template).

    The iterator form exists so per-executor state (a model client,
    a loaded tokenizer) is created once per task stream, not once per
    batch — the reference's explicit rationale (``03:70-83``).
    """

    def _default_fn(texts: list[str]) -> list[list[float]]:
        return hash_embed_texts(texts, dim)

    fn = embed_fn or _default_fn

    @F.pandas_udf(T.ArrayType(T.FloatType()))
    def infer(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        # client/tokenizer init would happen HERE, once per stream
        for series in it:
            results: list[list[float]] = []
            texts = series.tolist()
            for i in range(0, len(texts), batch_size):
                results.extend(fn(texts[i : i + batch_size]))
            yield pd.Series(results)

    return infer


def with_embeddings(
    df: DataFrame,
    text_col: str,
    out_col: str = "inference",
    embed_fn: EmbedFn | None = None,
    dim: int = 64,
    batch_size: int = DEFAULT_BATCH_SIZE,
) -> DataFrame:
    """OP-42: append an embedding column (ref ``03:131`` withColumn)."""
    udf = make_inference_udf(embed_fn, dim, batch_size)
    return ensure_min_parallelism(df).withColumn(out_col, udf(F.col(text_col)))
