"""Full-text ranked retrieval: distributed BM25 (Okapi) scoring.

The reference's retrieval story is embedding-vector search
(``ocr-tesseract-unstructured.py:145-170``); lexical ranked retrieval
is the standard complement (hybrid search re-ranks the union of BM25
and ANN candidates), and at corpus-build time BM25 doubles as a
relevance filter for query-conditioned corpus selection.

Shape (no Python UDFs, no driver round-trips):

1. tokenize + doc lengths                       narrow map
2. explode tokens, FILTER TO THE QUERY'S TERMS  — the predicate lands
   right after the generator, so only matching postings ever enter a
   shuffle; the corpus-sized token stream is never shuffled
3. tf per (doc, term)                           ONE combinable shuffle
4. df per term (tiny: |query| rows)             broadcast back
5. corpus stats (N, avgdl)                      1-row agg, broadcast
   cross-join — never collected to the driver
6. per-doc score sum, quantized rank, top-k

Scoring: idf = ln(1 + (N - df + ½)/(df + ½)), Robertson-Sparck-Jones
with the +1 floor (Lucene's variant — keeps idf positive for terms in
more than half the corpus); tf saturation k1=1.2, length
normalization b=0.75.

Determinism: ranking compares ROUND(score, 6), ties broken by doc id,
so engines that differ in the last float ulp still rank identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

K1 = 1.2
B = 0.75


def bm25_topk(
    df: DataFrame,
    text_col: str,
    id_col: str,
    query_terms: list[str],
    k: int = 20,
) -> DataFrame:
    """Top-k documents for a bag-of-words query: (id, score)."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    docs = df.select(F.col(id_col).alias("id"), toks.alias("_toks"))
    dl = docs.select("id", F.size("_toks").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    tf = (
        docs.select("id", F.explode("_toks").alias("term"))
        .filter(F.col("term").isin(query_terms))
        .groupBy("id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(F.broadcast(dfq), "term")
        .join(dl, "id")
        .crossJoin(F.broadcast(stats))
        .select(
            "id",
            (
                F.log(
                    1.0
                    + (F.col("n_docs") - F.col("df") + 0.5)
                    / (F.col("df") + 0.5)
                )
                * F.col("tf")
                * (K1 + 1.0)
                / (
                    F.col("tf")
                    + K1 * (1.0 - B + B * F.col("dl") / F.col("avgdl"))
                )
            ).alias("_s"),
        )
        .groupBy("id")
        .agg(F.sum("_s").alias("_score"))
    )
    return (
        scored.orderBy(F.round("_score", 6).desc(), "id")
        .limit(k)
        .select("id", F.round("_score", 4).alias("score"))
    )
