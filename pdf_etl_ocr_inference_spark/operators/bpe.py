"""Distributed BPE vocabulary induction + tokenization.

Reference parity: the reference pipeline tokenizes with a FIXED
pretrained vocabulary; a training-data engine also needs to LEARN one
from the corpus (the fertility/vocab-coverage diagnostics already in
the catalog presuppose it).

Scale shape — the part that matters at 100 TB: classic BPE training
(Sennrich et al. 2016) operates on the WORD HISTOGRAM, not the
corpus.  So the distributed part is exactly one combinable shuffle
(pre-tokenize -> explode -> count by word), the histogram is capped
to the top-V words BY COUNT with a logged drop (no silent caps), and
the merge-learning loop runs on that bounded driver state — identical
to how production BPE trainers work, and the histogram's size is a
function of the LANGUAGE (Heaps' law), not the corpus byte count.
Truncation is principled for the same reason: BPE merge decisions are
driven by high-frequency words; the dropped tail is exactly the mass
that cannot flip a merge ranking until V is far larger than any
practical vocab.

Application (``apply_bpe``) broadcasts the merge ranks and runs an
Arrow-batched pandas UDF with a per-batch word memo — each DISTINCT
word per batch is segmented once regardless of its frequency.

Determinism: pair-count ties break lexicographically; histogram
truncation ties break by word; the merge table is a pure function of
the corpus.
"""

from __future__ import annotations

import logging
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

log = logging.getLogger(__name__)

# the BPE-ish pre-tokenizer the token-count entries already use:
# word pieces + standalone punctuation
_PRETOKEN_RE = r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"
_EOW = "</w>"


def word_histogram(
    df: DataFrame, text_col: str, top_v: int
) -> list[tuple[str, int]]:
    """Top ``top_v`` (word, count) pairs by count (word tie-break),
    one combinable shuffle.  Logs how many distinct words were
    dropped by the cap."""
    counts = (
        df.select(
            F.explode(
                F.regexp_extract_all(
                    text_col, F.lit(_PRETOKEN_RE), F.lit(0)
                )
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    counts = counts.persist()
    total = counts.count()  # materializes the agg once into cache
    top = (
        counts.orderBy(F.desc("n"), "word").limit(top_v).collect()
    )
    counts.unpersist()
    if total > top_v:
        log.warning(
            "bpe word histogram capped: kept %d of %d distinct words "
            "(dropped %d low-frequency tail words)",
            top_v,
            total,
            total - top_v,
        )
    return [(r["word"], r["n"]) for r in top]


def learn_bpe_from_histogram(
    histogram: list[tuple[str, int]], num_merges: int
) -> list[tuple[int, str, str]]:
    """Classic BPE merge learning over a (word, count) histogram:
    repeatedly merge the most frequent adjacent symbol pair
    (count-weighted; lexicographic tie-break).  Pure function —
    no RNG, no dict-order dependence.  Returns
    [(rank, left, right), ...]."""
    words = {
        tuple(word) + (_EOW,): n for word, n in histogram if word
    }
    merges: list[tuple[int, str, str]] = []
    for rank in range(num_merges):
        pairs: dict[tuple[str, str], int] = {}
        for syms, n in words.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + n
        if not pairs:
            break
        (left, right), best_n = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0])
        )
        if best_n < 2:
            break
        merges.append((rank, left, right))
        merged = left + right
        new_words = {}
        for syms, n in words.items():
            out = []
            i = 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == left
                    and syms[i + 1] == right
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_words[tuple(out)] = new_words.get(tuple(out), 0) + n
        words = new_words
    return merges


def learn_bpe(
    spark: SparkSession,
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 200,
    top_v: int = 20000,
) -> DataFrame:
    """End-to-end induction: histogram shuffle + driver merge loop.
    Returns a DataFrame (merge_rank, left, right)."""
    hist = word_histogram(df, text_col, top_v)
    merges = learn_bpe_from_histogram(hist, num_merges)
    schema = T.StructType(
        [
            T.StructField("merge_rank", T.IntegerType(), False),
            T.StructField("left", T.StringType(), False),
            T.StructField("right", T.StringType(), False),
        ]
    )
    return spark.createDataFrame(merges, schema)


def segment_word(word: str, rank_of: dict[tuple[str, str], int]) -> list[str]:
    """Apply merges to one word greedily by rank — the standard BPE
    inference order (lowest-rank applicable merge first)."""
    syms = list(word) + [_EOW]
    while len(syms) > 1:
        best_rank = None
        best_i = -1
        for i, (a, b) in enumerate(zip(syms, syms[1:])):
            r = rank_of.get((a, b))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def apply_bpe(
    df: DataFrame,
    merges: list[tuple[int, str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize with a learned merge table: (id, n_words, n_pieces).
    The merge ranks ship to workers inside the UDF closure (bounded:
    num_merges rows); each Arrow batch memoizes per distinct word, so
    hot words segment once per batch."""
    import re

    rank_of = {(left, right): rank for rank, left, right in merges}
    pat = re.compile(_PRETOKEN_RE)

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        memo: dict[str, int] = {}
        for pdf in batches:
            n_words = []
            n_pieces = []
            for text in pdf[text_col]:
                words = pat.findall(text or "")
                total = 0
                for w in words:
                    k = memo.get(w)
                    if k is None:
                        k = len(segment_word(w, rank_of))
                        memo[w] = k
                    total += k
                n_words.append(len(words))
                n_pieces.append(total)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_words": n_words,
                    "n_pieces": n_pieces,
                }
            )

    schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField("n_words", T.IntegerType(), False),
            T.StructField("n_pieces", T.IntegerType(), False),
        ]
    )
    return df.select(id_col, text_col).mapInPandas(run, schema=schema)
