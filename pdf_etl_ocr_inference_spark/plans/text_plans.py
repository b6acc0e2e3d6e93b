"""Text-analysis query catalog (training-data pipeline extensions:
token counting, quality scoring, language-ID, fingerprinting).

Every op here is implemented natively in Spark AND mirrored in DuckDB
SQL, so the driver's oracle verifies them value-for-value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdf_etl_ocr_inference_spark.functions.text import (
    _LANG_MARKERS,
    doc_fingerprint,
    language_id,
    quality_score,
    token_count,
)
from pdf_etl_ocr_inference_spark.plans import bpe_sql as _bpe_sql
from pdf_etl_ocr_inference_spark.plans import (
    quality_lr_sql as _quality_lr_sql,
)
from pdf_etl_ocr_inference_spark.plans.registry import register
from pdf_etl_ocr_inference_spark.sources.catalog import load_table as _t


@register(
    "text_token_count",
    "SELECT doc_id, "
    "LEN(STRING_SPLIT_REGEX(TRIM(text), '\\s+')) AS n_tokens "
    "FROM documents",
    doc="whitespace token counting over the documents table.",
)
def text_token_count(spark: SparkSession, sf: str) -> DataFrame:
    return _t(spark, sf, "documents").select(
        "doc_id", token_count("text").alias("n_tokens")
    )


@register(
    "text_quality_score",
    """
    SELECT doc_id, (
        (LENGTH(REGEXP_REPLACE(text, '[^a-zA-Z]', '', 'g'))
         / GREATEST(LENGTH(text), 1))
      + (CASE WHEN LENGTH(text) BETWEEN 50 AND 100000 THEN 1.0 ELSE 0.0 END)
      + (CASE WHEN
            (LENGTH(text) - LEN(STRING_SPLIT_REGEX(TRIM(text), '\\s+')) + 1)
              / GREATEST(LEN(STRING_SPLIT_REGEX(TRIM(text), '\\s+')), 1)
            BETWEEN 2.0 AND 12.0
         THEN 1.0 ELSE 0.0 END)
    ) / 3.0 AS quality FROM documents
    """,
    doc="heuristic quality score (alpha ratio + length + word-length "
    "sanity), C4/Gopher-style rules done natively.",
)
def text_quality_score(spark: SparkSession, sf: str) -> DataFrame:
    return _t(spark, sf, "documents").select(
        "doc_id", quality_score("text").alias("quality")
    )


def _lang_score_sql(markers: list[str]) -> str:
    inlist = ", ".join(f"'{m}'" for m in markers)
    return (
        "LEN(LIST_FILTER(STRING_SPLIT_REGEX(TRIM(LOWER(text)), '\\s+'), "
        f"t -> t IN ({inlist})))"
    )


_LANG_SQL_SCORES = {
    lang: _lang_score_sql(markers) for lang, markers in sorted(_LANG_MARKERS.items())
}
_LANG_BEST = "GREATEST(" + ", ".join(f"s_{lang}" for lang in _LANG_SQL_SCORES) + ")"
_LANG_CASE = (
    "CASE WHEN " + _LANG_BEST + " = 0 THEN 'und' "
    + " ".join(
        f"WHEN s_{lang} = {_LANG_BEST} THEN '{lang}'" for lang in _LANG_SQL_SCORES
    )
    + " ELSE 'und' END"
)

@register(
    "text_language_id",
    "SELECT doc_id, " + _LANG_CASE + " AS lang_pred FROM ("
    "SELECT doc_id, "
    + ", ".join(f"{sql} AS s_{lang}" for lang, sql in _LANG_SQL_SCORES.items())
    + " FROM documents)",
    doc="stopword-overlap language heuristic; ties break by language-"
    "code order.",
)
def text_language_id(spark: SparkSession, sf: str) -> DataFrame:
    return _t(spark, sf, "documents").select(
        "doc_id", language_id("text").alias("lang_pred")
    )


@register(
    "text_stopword_ratio",
    "SELECT doc_id, ROUND(LEN(LIST_FILTER("
    "STRING_SPLIT_REGEX(TRIM(LOWER(text)), '\\s+'), "
    "t -> t IN ('the', 'and', 'of', 'to', 'in'))) * 1.0 / "
    "GREATEST(LEN(STRING_SPLIT_REGEX(TRIM(text), '\\s+')), 1), 6) "
    "AS stopword_ratio FROM documents",
    doc="stopword-density signal (C4/Gopher-style: too-low ratio "
    "flags non-prose) using the 'en' marker lexicon.",
)
def text_stopword_ratio(spark: SparkSession, sf: str) -> DataFrame:
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    hits = F.size(
        F.filter(toks, lambda t: t.isin("the", "and", "of", "to", "in"))
    )
    total = F.greatest(F.size(F.split(F.trim(F.col("text")), r"\s+")), F.lit(1))
    return _t(spark, sf, "documents").select(
        "doc_id", F.round(hits / total, 6).alias("stopword_ratio")
    )


@register(
    "text_repetition_ratio",
    "SELECT doc_id, ROUND(1.0 - LEN(LIST_DISTINCT("
    "STRING_SPLIT_REGEX(TRIM(LOWER(text)), '\\s+'))) * 1.0 / "
    "GREATEST(LEN(STRING_SPLIT_REGEX(TRIM(LOWER(text)), '\\s+')), 1), 6) "
    "AS repetition FROM documents",
    doc="repetition signal: 1 - distinct/total token ratio (Gopher's "
    "duplicate-fraction family) — high values flag boilerplate/spam.",
)
def text_repetition_ratio(spark: SparkSession, sf: str) -> DataFrame:
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    rep = 1.0 - F.size(F.array_distinct(toks)) / F.greatest(
        F.size(toks), F.lit(1)
    )
    return _t(spark, sf, "documents").select(
        "doc_id", F.round(rep, 6).alias("repetition")
    )


@register(
    "text_fingerprint",
    "SELECT doc_id, MD5(TRIM(REGEXP_REPLACE(REGEXP_REPLACE(LOWER(text), "
    "'[^a-z0-9\\s]', '', 'g'), '\\s+', ' ', 'g'))) AS fingerprint "
    "FROM documents",
    doc="document fingerprint = md5(normalized text); the exact-dedup key.",
)
def text_fingerprint(spark: SparkSession, sf: str) -> DataFrame:
    return _t(spark, sf, "documents").select(
        "doc_id", doc_fingerprint("text").alias("fingerprint")
    )


# ------------------------------------------------------------------
# PII scrubbing
# ------------------------------------------------------------------
# The fixture corpus contains no PII, so the op first plants
# deterministic PII (email / IPv4 / phone derived from doc_id) into
# every document — identically on both engines — then scrubs it.
# Patterns use only regex constructs with identical semantics in Java
# (Spark) and RE2 (DuckDB): char classes, bounded repeats, \b, \d.

_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_IP = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
_PII_PHONE = r"\b\d{3}-\d{3}-\d{4}\b"

_PII_SYNTH_SQL = (
    "text || ' contact user' || doc_id::VARCHAR || "
    "'@mail.example.com or 10.0.' || (doc_id % 256)::VARCHAR || '.' || "
    "(doc_id % 100)::VARCHAR || ' tel 555-' || "
    "LPAD((doc_id % 1000)::VARCHAR, 3, '0') || '-' || "
    "LPAD((doc_id % 10000)::VARCHAR, 4, '0')"
)


@register(
    "text_pii_scrub",
    "SELECT doc_id, "
    f"LEN(REGEXP_EXTRACT_ALL(t, '{_PII_EMAIL}'))::INT AS n_emails, "
    f"LEN(REGEXP_EXTRACT_ALL(REGEXP_REPLACE(t, '{_PII_EMAIL}', "
    f"'<EMAIL>', 'g'), '{_PII_IP}'))::INT AS n_ips, "
    f"LEN(REGEXP_EXTRACT_ALL(REGEXP_REPLACE(REGEXP_REPLACE(t, "
    f"'{_PII_EMAIL}', '<EMAIL>', 'g'), '{_PII_IP}', '<IP>', 'g'), "
    f"'{_PII_PHONE}'))::INT AS n_phones, "
    f"REGEXP_REPLACE(REGEXP_REPLACE(REGEXP_REPLACE(t, '{_PII_EMAIL}', "
    f"'<EMAIL>', 'g'), '{_PII_IP}', '<IP>', 'g'), '{_PII_PHONE}', "
    "'<PHONE>', 'g') AS clean_text "
    f"FROM (SELECT doc_id, {_PII_SYNTH_SQL} AS t FROM documents)",
    doc="PII redaction (email → IPv4 → phone, in that order so earlier "
    "redactions can't be re-matched) with per-kind counts. All native "
    "regexp_replace/regexp_count — stays in whole-stage codegen, no "
    "shuffle at all: the 100 TB cost is exactly one scan+rewrite.",
)
def text_pii_scrub(spark: SparkSession, sf: str) -> DataFrame:
    d = F.col("doc_id")
    synth = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        d.cast("string"),
        F.lit("@mail.example.com or 10.0."),
        (d % 256).cast("string"),
        F.lit("."),
        (d % 100).cast("string"),
        F.lit(" tel 555-"),
        F.lpad((d % 1000).cast("string"), 3, "0"),
        F.lit("-"),
        F.lpad((d % 10000).cast("string"), 4, "0"),
    )
    no_email = F.regexp_replace(synth, _PII_EMAIL, "<EMAIL>")
    no_ip = F.regexp_replace(no_email, _PII_IP, "<IP>")
    no_phone = F.regexp_replace(no_ip, _PII_PHONE, "<PHONE>")
    return _t(spark, sf, "documents").select(
        "doc_id",
        F.regexp_count(synth, F.lit(_PII_EMAIL)).alias("n_emails"),
        F.regexp_count(no_email, F.lit(_PII_IP)).alias("n_ips"),
        F.regexp_count(no_ip, F.lit(_PII_PHONE)).alias("n_phones"),
        no_phone.alias("clean_text"),
    )


# ------------------------------------------------------------------
# Boilerplate-line removal
# ------------------------------------------------------------------
# Classic scraped-corpus cleaning: a line whose normalized form occurs
# in many distinct documents is boilerplate (nav bars, cookie banners,
# license footers) and is dropped from every document. The fixture
# docs are single-line, so a shared header/footer is planted first —
# identically on both engines — turning every doc into 3 lines of
# which exactly the header and footer cross the frequency threshold.

_BP_HEADER = "generated header do not edit"
_BP_FOOTER = "copyright footer all rights reserved"
_BP_MIN_DOCS = 10


@register(
    "text_boilerplate_lines",
    "WITH d AS (SELECT doc_id, "
    f"'{_BP_HEADER}' || CHR(10) || text || CHR(10) || '{_BP_FOOTER}' AS t "
    "FROM documents), "
    "split AS (SELECT doc_id, STRING_SPLIT(t, CHR(10)) AS parts FROM d), "
    "lines AS (SELECT doc_id, "
    "UNNEST(GENERATE_SERIES(1, LEN(parts))) AS i, parts FROM split), "
    "lines2 AS (SELECT doc_id, i - 1 AS pos, parts[i] AS line FROM lines), "
    "boiler AS (SELECT line FROM lines2 GROUP BY line "
    f"HAVING COUNT(DISTINCT doc_id) >= {_BP_MIN_DOCS}) "
    "SELECT doc_id, COUNT(*) AS n_lines, "
    "COUNT(*) - COUNT(b.line) AS n_kept, "
    "STRING_AGG(CASE WHEN b.line IS NULL THEN l.line END, CHR(10) "
    "ORDER BY l.pos) AS clean_text "
    "FROM lines2 l LEFT JOIN boiler b USING (line) GROUP BY doc_id",
    doc="corpus-frequency boilerplate-line removal: explode lines with "
    "position, count distinct docs per line (map-side combinable "
    "shuffle), broadcast the (by-definition tiny) frequent-line set "
    "back as an anti-indicator, reassemble each doc in one grouped "
    "pass. At 100 TB: one agg shuffle + one broadcast join + one "
    "groupBy — the frequent-line set stays small no matter the corpus.",
)
def text_boilerplate_lines(spark: SparkSession, sf: str) -> DataFrame:
    docs = _t(spark, sf, "documents")
    synth = F.concat_ws(
        "\n", F.lit(_BP_HEADER), F.col("text"), F.lit(_BP_FOOTER)
    )
    lines = docs.select(
        "doc_id", F.posexplode(F.split(synth, "\n")).alias("pos", "line")
    )
    boiler = (
        lines.groupBy("line")
        .agg(F.countDistinct("doc_id").alias("_nd"))
        .filter(F.col("_nd") >= _BP_MIN_DOCS)
        .select("line", F.lit(1).alias("_b"))
    )
    marked = lines.join(F.broadcast(boiler), "line", "left")
    items = F.array_sort(
        F.collect_list(F.struct("pos", "line", F.col("_b").alias("b")))
    )
    kept_lines = F.transform(
        F.filter(items, lambda x: x["b"].isNull()), lambda x: x["line"]
    )
    return marked.groupBy("doc_id").agg(
        F.count("*").alias("n_lines"),
        (F.count("*") - F.count("_b")).alias("n_kept"),
        F.array_join(kept_lines, "\n").alias("clean_text"),
    )


# ------------------------------------------------------------------
# Weighted training-mix construction
# ------------------------------------------------------------------

_MIX_WEIGHTS = {"src0": 0.4, "src1": 0.3, "src2": 0.2, "src3": 0.1}
_MIX_BUDGET = 50
_MIX_QUOTAS = {
    s: int(_MIX_BUDGET * w) for s, w in sorted(_MIX_WEIGHTS.items())
}


@register(
    "train_mix_weighted",
    "SELECT doc_id, source FROM ("
    "  SELECT doc_id, source, ROW_NUMBER() OVER ("
    "    PARTITION BY source ORDER BY MD5(doc_id::VARCHAR)) AS rk "
    "  FROM documents WHERE source IN ("
    + ", ".join(f"'{s}'" for s in sorted(_MIX_QUOTAS))
    + ")) WHERE rk <= CASE source "
    + " ".join(f"WHEN '{s}' THEN {q}" for s, q in sorted(_MIX_QUOTAS.items()))
    + " END",
    doc="weighted training-mix construction: per-source quotas from "
    "target weights, filled by ranking docs on a deterministic "
    "pseudo-random key (md5 of doc_id — reproducible shuffle, no RNG "
    "state). Per-source top-k via a source-partitioned window; md5 is "
    "collision-free on ids so selection is tie-free. At 100 TB a "
    "billion-doc source makes one window partition a straggler — the "
    "op34d_scalable_ranks bucketed-ranking substitute applies "
    "per-source verbatim.",
)
def train_mix_weighted(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql.window import Window

    quota = F.create_map(
        *[F.lit(x) for sq in sorted(_MIX_QUOTAS.items()) for x in sq]
    )
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string"))
    )
    return (
        _t(spark, sf, "documents")
        .filter(F.col("source").isin(*sorted(_MIX_QUOTAS)))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= quota[F.col("source")])
        .select("doc_id", "source")
    )


# Temperature-scaled mixing: p_l ∝ n_l^alpha with alpha = 1/T — the
# mT5/UniMax-style rebalance that upweights low-resource languages
# relative to their raw share.  alpha=0.5 (T=2) over the corpus's
# skewed `lang` column; quotas are DERIVED from corpus counts (one
# combinable groupBy), unlike train_mix_weighted's fixed weights.
_TEMP_ALPHA = 0.5
_TEMP_BUDGET = 100


def _temperature_mix_oracle() -> str:
    from pdf_etl_ocr_inference_spark.plans.mix_sql import (
        temperature_mix_sql,
    )

    return "WITH " + temperature_mix_sql(
        "documents", "lang", "doc_id", _TEMP_BUDGET, _TEMP_ALPHA
    )


@register(
    "train_temperature_mix",
    _temperature_mix_oracle,
    doc="temperature-scaled language mixing (mT5 §3.1 / UniMax-style "
    "rebalance): per-language sampling mass ∝ count^alpha "
    f"(alpha={_TEMP_ALPHA}, i.e. T=2), quotas DERIVED from corpus "
    "counts in one combinable groupBy (train_mix_weighted's quotas "
    "are fixed constants), filled by ranking docs on md5(doc_id) — "
    "the same deterministic reproducible-shuffle fill. The en-heavy "
    "corpus demotes en from ~40% of docs to ~28% of the mix. "
    "Thresholds sit ≥0.08 from every integer rank at all three SFs "
    "(verified), so the float rk<=quota compare is cross-engine "
    "stable. A quota above a language's count self-saturates at the "
    "count — UniMax's one-epoch cap. At 100 TB the per-lang window "
    "rank swaps for op34d's bucketed scalable ranks verbatim.",
)
def train_temperature_mix(spark: SparkSession, sf: str) -> DataFrame:
    from pdf_etl_ocr_inference_spark.operators.sampling import (
        temperature_mix,
    )

    return temperature_mix(
        _t(spark, sf, "documents"),
        "lang",
        "doc_id",
        budget=_TEMP_BUDGET,
        alpha=_TEMP_ALPHA,
    )


# ------------------------------------------------------------------
# Benchmark-contamination detection
# ------------------------------------------------------------------

# 5-gram shingle list, SQL side (mirrors functions.text.word_ngrams
# with n=5: shingles i = join(tokens[i:i+5]) for i in 1..max(len-4,1))
_GRAMS5 = (
    "LIST_DISTINCT(LIST_TRANSFORM("
    "GENERATE_SERIES(1, GREATEST(LEN(toks) - 4, 1)), "
    "i -> ARRAY_TO_STRING(toks[i:i+4], ' ')))"
)


@register(
    "text_contamination",
    "WITH g AS ("
    "  SELECT doc_id, " + _GRAMS5 + " AS grams FROM ("
    "    SELECT doc_id, STRING_SPLIT_REGEX(TRIM(text), '\\s+') AS toks "
    "    FROM documents)), "
    "bg AS (SELECT DISTINCT UNNEST(grams) AS gram FROM g "
    "       WHERE doc_id % 97 = 3), "
    "dg AS (SELECT doc_id, UNNEST(grams) AS gram FROM g "
    "       WHERE doc_id % 97 <> 3) "
    "SELECT dg.doc_id, COUNT(*) AS n_grams, COUNT(bg.gram) AS n_matched, "
    "ROUND(COUNT(bg.gram) * 1.0 / COUNT(*), 6) AS contamination "
    "FROM dg LEFT JOIN bg USING (gram) GROUP BY dg.doc_id",
    doc="benchmark-contamination detection: word-5-gram overlap of "
    "every corpus doc against a held-out benchmark set (GPT-3 appendix "
    "C method). The benchmark n-gram set is schema-bounded (eval "
    "suites don't grow with the corpus) so it broadcasts — the corpus "
    "never shuffles, only the per-doc agg does. Fixture benchmark = "
    "docs with doc_id % 97 == 3.",
)
def text_contamination(spark: SparkSession, sf: str) -> DataFrame:
    from pdf_etl_ocr_inference_spark.operators.contamination import (
        contamination_report,
    )

    docs = _t(spark, sf, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 3)
    corpus = docs.filter(F.col("doc_id") % 97 != 3)
    return contamination_report(corpus, bench, "text", "doc_id", n=5)


# ------------------------------------------------------------------
# TF-IDF top terms
# ------------------------------------------------------------------

_NORM_SQL = (
    "TRIM(REGEXP_REPLACE(REGEXP_REPLACE(LOWER(text), '[^a-z0-9\\s]', '', "
    "'g'), '\\s+', ' ', 'g'))"
)


@register(
    "text_tfidf_terms",
    "WITH tf AS ("
    "  SELECT doc_id, term, COUNT(*) AS tf FROM ("
    "    SELECT doc_id, UNNEST(STRING_SPLIT_REGEX(" + _NORM_SQL + ", "
    "'\\s+')) AS term FROM documents) GROUP BY doc_id, term), "
    "dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term), "
    "n AS (SELECT COUNT(*) AS n_docs FROM documents) "
    "SELECT doc_id, term, tfidf FROM ("
    "  SELECT tf.doc_id, tf.term, "
    "  ROUND(tf * LN((n_docs + 1.0) / (df + 1.0)), 6) AS tfidf, "
    "  ROW_NUMBER() OVER (PARTITION BY tf.doc_id ORDER BY "
    "    tf * LN((n_docs + 1.0) / (df + 1.0)) DESC, tf.term) AS rk "
    "  FROM tf, dfreq, n WHERE tf.term = dfreq.term) WHERE rk <= 3",
    doc="per-document top-3 TF-IDF terms: normalized tokens → "
    "(doc,term) counts → term document-frequency → idf via a "
    "broadcast scalar doc count (no driver collect) → per-doc window "
    "top-k, tie-broken by term so ranking is deterministic. Two "
    "combinable shuffles ((doc,term) then term); the per-doc window "
    "partitions by doc_id — millions of small partitions, no "
    "straggler.",
)
def text_tfidf_terms(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql.window import Window

    from pdf_etl_ocr_inference_spark.functions.text import (
        normalize_text,
        tokens,
    )

    docs = _t(spark, sf, "documents")
    terms = docs.select(
        "doc_id", F.explode(tokens(normalize_text("text"))).alias("term")
    )
    tf = terms.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = docs.agg(F.count("*").alias("n_docs"))
    score = F.col("tf") * F.log(
        (F.col("n_docs") + F.lit(1.0)) / (F.col("df") + F.lit(1.0))
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("_score"), F.asc("term"))
    return (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("_score", score)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("doc_id", "term", F.round("_score", 6).alias("tfidf"))
    )


# ------------------------------------------------------------------
# Corpus boilerplate-phrase mining
# ------------------------------------------------------------------


@register(
    "text_repeated_phrases",
    "WITH g AS ("
    "  SELECT doc_id, " + _GRAMS5 + " AS grams FROM ("
    "    SELECT doc_id, STRING_SPLIT_REGEX(TRIM(text), '\\s+') AS toks "
    "    FROM documents)) "
    "SELECT gram, COUNT(*) AS df FROM ("
    "  SELECT doc_id, UNNEST(grams) AS gram FROM g) "
    "GROUP BY gram HAVING COUNT(*) >= 2",
    doc="corpus boilerplate-phrase mining: word-5-grams appearing in "
    ">= 2 distinct documents, with their document frequency — the "
    "phrase-level complement of text_boilerplate_lines (cookie "
    "banners and license headers repeat as phrases, not always as "
    "whole lines). One explode + one combinable count shuffle; "
    "per-doc shingles are deduplicated before the explode so df "
    "counts documents, not occurrences.",
)
def text_repeated_phrases(spark: SparkSession, sf: str) -> DataFrame:
    from pdf_etl_ocr_inference_spark.functions.text import word_ngrams

    docs = _t(spark, sf, "documents")
    grams = docs.select(
        F.explode(F.array_distinct(word_ngrams("text", 5))).alias("gram")
    )
    return (
        grams.groupBy("gram")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") >= 2)
    )


_BM25_TERMS = ("spark", "vector", "join")

# Shared BM25 oracle: the same SQL verifies the batch scorer, the
# postings-index-served scorer, and the incrementally-refreshed
# index — all three must produce the identical ranked list.
_BM25_ORACLE = (
    "WITH toks AS (SELECT doc_id, "
    "STRING_SPLIT_REGEX(TRIM(text), '\\s+') AS t FROM documents), "
    "dl AS (SELECT doc_id, LEN(t) AS dl FROM toks), "
    "stats AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM dl), "
    "tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM "
    "(SELECT doc_id, UNNEST(t) AS term FROM toks) "
    "WHERE term IN ('spark', 'vector', 'join') GROUP BY doc_id, term), "
    "dfq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term), "
    "scored AS (SELECT tf.doc_id AS id, "
    "SUM(LN(1 + (s.n_docs - dfq.df + 0.5) / (dfq.df + 0.5)) "
    "* tf.tf * 2.2 / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl))"
    ") AS sc FROM tf JOIN dfq USING (term) "
    "JOIN dl USING (doc_id) CROSS JOIN stats s GROUP BY tf.doc_id) "
    "SELECT id, ROUND(sc, 4) AS score FROM scored "
    "ORDER BY ROUND(sc, 6) DESC, id LIMIT 20"
)


@register(
    "text_bm25_topk",
    _BM25_ORACLE,
    doc="Okapi BM25 ranked retrieval (k1=1.2, b=0.75, Lucene idf "
    "floor) for a 3-term query, top-20.  Postings are filtered to "
    "the query's terms BEFORE any shuffle; df/corpus stats are "
    "broadcast 1-row/|query|-row sides; rank quantized to 6 "
    "decimals + id tie-break for cross-engine determinism.  The "
    "lexical complement of the ann_* retrieval family (hybrid "
    "search re-ranks the union).",
)
def text_bm25_topk(spark: SparkSession, sf: str) -> DataFrame:
    from pdf_etl_ocr_inference_spark.operators.search import bm25_topk

    return bm25_topk(
        _t(spark, sf, "documents"), "text", "doc_id",
        list(_BM25_TERMS), k=20,
    )


@register(
    "text_hybrid_rrf",
    "WITH toks AS (SELECT doc_id, "
    "STRING_SPLIT_REGEX(TRIM(text), '\\s+') AS t FROM documents), "
    "dl AS (SELECT doc_id, LEN(t) AS dl FROM toks), "
    "stats AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM dl), "
    "tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM "
    "(SELECT doc_id, UNNEST(t) AS term FROM toks) "
    "WHERE term IN ('spark', 'vector', 'join') GROUP BY doc_id, term), "
    "dfq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term), "
    "scored AS (SELECT tf.doc_id AS id, "
    "SUM(LN(1 + (s.n_docs - dfq.df + 0.5) / (dfq.df + 0.5)) "
    "* tf.tf * 2.2 / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl))"
    ") AS sc FROM tf JOIN dfq USING (term) "
    "JOIN dl USING (doc_id) CROSS JOIN stats s GROUP BY tf.doc_id), "
    "lexk AS (SELECT id, ROW_NUMBER() OVER "
    "(ORDER BY ROUND(sc, 6) DESC, id) AS lex_rank FROM "
    "(SELECT id, sc FROM scored ORDER BY ROUND(sc, 6) DESC, id "
    "LIMIT 20)), "
    "vs AS (SELECT e.vec_id AS id, LIST_COSINE_SIMILARITY("
    "e.embedding::DOUBLE[], q.embedding::DOUBLE[]) AS v "
    "FROM embeddings e, (SELECT embedding FROM embeddings "
    "WHERE vec_id = 0) q WHERE e.vec_id > 0), "
    "veck AS (SELECT id, ROW_NUMBER() OVER "
    "(ORDER BY ROUND(v, 6) DESC, id) AS vec_rank FROM "
    "(SELECT id, v FROM vs ORDER BY ROUND(v, 6) DESC, id LIMIT 20)), "
    "fused AS (SELECT COALESCE(l.id, v.id) AS id, l.lex_rank, "
    "v.vec_rank, COALESCE(1.0::DOUBLE / (60 + l.lex_rank), 0.0) + "
    "COALESCE(1.0::DOUBLE / (60 + v.vec_rank), 0.0) AS rrf "
    "FROM lexk l FULL OUTER JOIN veck v ON l.id = v.id) "
    "SELECT id, lex_rank, vec_rank, ROUND(rrf, 6) AS rrf FROM fused "
    "ORDER BY ROUND(rrf, 6) DESC, id LIMIT 10",
    doc="hybrid retrieval: reciprocal-rank fusion (Cormack SIGIR'09, "
    "c=60) of the BM25 lexical leg and a cosine vector leg (query = "
    "vec_id 0 against the rest; doc_id/vec_id share the id domain). "
    "Each leg's top-k cut is a distributed TakeOrderedAndProject; "
    "rank windows run over k rows only; ranks quantized to 6 "
    "decimals for cross-engine stability.",
)
def text_hybrid_rrf(spark: SparkSession, sf: str) -> DataFrame:
    from pdf_etl_ocr_inference_spark.functions.vector import (
        cosine_similarity,
    )
    from pdf_etl_ocr_inference_spark.operators.search import (
        bm25_scores,
        hybrid_rrf,
    )

    docs = _t(spark, sf, "documents")
    emb = _t(spark, sf, "embeddings")
    lex = bm25_scores(docs, "text", "doc_id", ["spark", "vector", "join"])
    query = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q_emb")
    )
    vec = (
        emb.filter(F.col("vec_id") > 0)
        .crossJoin(F.broadcast(query))
        .select(
            F.col("vec_id").alias("id"),
            cosine_similarity("embedding", "q_emb").alias("_score"),
        )
    )
    return hybrid_rrf(lex, vec, k_each=20, k_out=10)


@register(
    "text_vocab_coverage",
    "WITH toks AS (SELECT doc_id, "
    "STRING_SPLIT_REGEX(TRIM(text), '\\s+') AS t FROM documents), "
    "term AS (SELECT doc_id, UNNEST(t) AS term FROM toks), "
    "vocab AS (SELECT term FROM (SELECT term, COUNT(*) AS cnt "
    "FROM term GROUP BY term ORDER BY cnt DESC, term LIMIT 50)), "
    "hit AS (SELECT t.doc_id, COUNT(*) AS n_tokens, "
    "COUNT(v.term) AS in_vocab FROM term t "
    "LEFT JOIN vocab v USING (term) GROUP BY t.doc_id) "
    "SELECT doc_id, n_tokens, "
    "ROUND(1.0 - in_vocab * 1.0 / n_tokens, 6) AS oov_rate FROM hit",
    doc="vocabulary coverage / OOV profiling: induce the top-50 "
    "corpus vocabulary by frequency (tie-break on the term for "
    "determinism) and report each doc's out-of-vocabulary token "
    "rate — the tokenizer-design signal (vocab size vs coverage "
    "curve) and a quality filter (high-OOV docs are noise/foreign). "
    "One combinable term-count shuffle; the induced vocab is a "
    "broadcast side; per-doc hit counting is the only other "
    "shuffle.",
)
def text_vocab_coverage(spark: SparkSession, sf: str) -> DataFrame:
    docs = _t(spark, sf, "documents")
    term = docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("term"),
    )
    vocab = (
        term.groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), "term")
        .limit(50)
        .select("term")
    )
    hit = (
        term.join(F.broadcast(vocab.withColumn("_v", F.lit(1))), "term", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.count("_v").alias("in_vocab"),
        )
    )
    return hit.select(
        "doc_id",
        "n_tokens",
        F.round(1.0 - F.col("in_vocab") / F.col("n_tokens"), 6).alias(
            "oov_rate"
        ),
    )


@register(
    "text_rerank_pipeline",
    "WITH toks AS (SELECT doc_id, "
    "STRING_SPLIT_REGEX(TRIM(text), '\\s+') AS t FROM documents), "
    "dl AS (SELECT doc_id, LEN(t) AS dl FROM toks), "
    "stats AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM dl), "
    "tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM "
    "(SELECT doc_id, UNNEST(t) AS term FROM toks) "
    "WHERE term IN ('spark', 'vector', 'join') GROUP BY doc_id, term), "
    "dfq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term), "
    "scored AS (SELECT tf.doc_id AS id, "
    "SUM(LN(1 + (s.n_docs - dfq.df + 0.5) / (dfq.df + 0.5)) "
    "* tf.tf * 2.2 / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl))"
    ") AS sc FROM tf JOIN dfq USING (term) "
    "JOIN dl USING (doc_id) CROSS JOIN stats s GROUP BY tf.doc_id), "
    "cand AS (SELECT id, ROW_NUMBER() OVER "
    "(ORDER BY ROUND(sc, 6) DESC, id) AS bm25_rank FROM "
    "(SELECT id, sc FROM scored ORDER BY ROUND(sc, 6) DESC, id "
    "LIMIT 50)), "
    "rr AS (SELECT c.id, c.bm25_rank, "
    "(LEN(LIST_FILTER(t.t, x -> x = 'spark')) + "
    "LEN(LIST_FILTER(t.t, x -> x = 'vector')) + "
    "LEN(LIST_FILTER(t.t, x -> x = 'join'))) / SQRT(LEN(t.t)) AS r "
    "FROM cand c JOIN toks t ON t.doc_id = c.id) "
    "SELECT id, bm25_rank, ROUND(r, 4) AS score FROM rr "
    "ORDER BY ROUND(r, 6) DESC, id LIMIT 10",
    doc="two-stage retrieval: BM25 top-50 candidate generation "
    "(distributed, corpus-wide) -> cross-encoder rerank over ONLY "
    "the candidates via the OP-23 iterator pandas UDF template "
    "(client init once per stream; the stub scorer is deterministic "
    "and SQL-replayed by the oracle, a real model drops into "
    "score_fn) -> top-10. The reranker's cost is O(candidates) "
    "regardless of corpus size — the split that makes expensive "
    "models affordable at retrieval time.",
)
def text_rerank_pipeline(spark: SparkSession, sf: str) -> DataFrame:
    from pdf_etl_ocr_inference_spark.operators.search import rerank_topk

    return rerank_topk(
        _t(spark, sf, "documents"), "text", "doc_id",
        ["spark", "vector", "join"], candidates_k=50, k=10,
    )


@register(
    "text_bm25_indexed",
    _BM25_ORACLE,
    doc="BM25 served FROM the persisted postings index: (term, id, "
    "dl, tf) rows partitioned by pmod(xxhash64(term), 64), corpus "
    "stats (N, sum dl) in the index meta. The query scans only its "
    "terms' partition dirs + matching sorted term rows — no corpus "
    "pass, no full-index scan. SAME oracle as text_bm25_topk: the "
    "served ranking must equal the batch ranking exactly.",
)
def text_bm25_indexed(spark: SparkSession, sf: str) -> DataFrame:
    from pdf_etl_ocr_inference_spark.operators.search import (
        bm25_topk_indexed,
        build_postings_index,
    )
    from pdf_etl_ocr_inference_spark.scratch import scratch_dir

    docs = _t(spark, sf, "documents")
    safe = sf.strip("/").replace("/", "_")
    path = f"{scratch_dir(f'postings_{safe}')}/index"
    build_postings_index(spark, docs, path)
    return bm25_topk_indexed(spark, path, list(_BM25_TERMS), k=20)


@register(
    "text_bm25_index_incremental",
    _BM25_ORACLE,
    doc="incrementally-maintained postings index: built on the base "
    "corpus (doc_id % 97 != 3), the arrivals batch folds in via "
    "refresh_postings_index (postings append + N/sum-dl stat bump "
    "under a version watermark). SAME oracle as the batch scorer "
    "over the FULL corpus — passing proves the refresh maintained "
    "both the postings and the global stats exactly.",
)
def text_bm25_index_incremental(spark: SparkSession, sf: str) -> DataFrame:
    from pdf_etl_ocr_inference_spark.operators.search import (
        bm25_topk_indexed,
        build_postings_index,
        refresh_postings_index,
    )
    from pdf_etl_ocr_inference_spark.scratch import scratch_dir

    docs = _t(spark, sf, "documents")
    base = docs.filter(F.col("doc_id") % 97 != 3)
    batch = docs.filter(F.col("doc_id") % 97 == 3)
    safe = sf.strip("/").replace("/", "_")
    path = f"{scratch_dir(f'postings_inc_{safe}')}/index"
    build_postings_index(spark, base, path)
    refresh_postings_index(spark, path, batch, version=1)
    return bm25_topk_indexed(spark, path, list(_BM25_TERMS), k=20)


@register(
    "text_bm25_rewrite",
    # the hinted plan ranks on the ROUNDED-4 score attribute (so the
    # rewrite rule can match the sort key structurally) — the oracle
    # replays that exact ordering
    _BM25_ORACLE.replace(
        "ORDER BY ROUND(sc, 6) DESC, id", "ORDER BY ROUND(sc, 4) DESC, id"
    ),
    doc="the ENGINE REWRITE routing lexical top-k onto the postings "
    "index: bm25_topk(table_key=...) rides a hint on the score "
    "column; rewrite_bm25_topk matches the analyzed "
    "GlobalLimit>LocalLimit>Sort plan and substitutes the "
    "partition-pruned postings probe (scored from index-meta corpus "
    "stats — no corpus pass). Guard rails leave unhinted/unindexed "
    "plans object-identical. Lexical twin of ann_rewrite_topk; "
    "oracled because the probe must reproduce the scan's ranking "
    "exactly.",
)
def text_bm25_rewrite(spark: SparkSession, sf: str) -> DataFrame:
    from pdf_etl_ocr_inference_spark.operators.search import (
        bm25_topk,
        build_postings_index,
    )
    from pdf_etl_ocr_inference_spark.optimizer import (
        IndexCatalog,
        rewrite_bm25_topk,
    )
    from pdf_etl_ocr_inference_spark.scratch import scratch_dir

    docs = _t(spark, sf, "documents")
    safe = sf.strip("/").replace("/", "_")
    path = f"{scratch_dir(f'postings_rw_{safe}')}/index"
    build_postings_index(spark, docs, path)
    cat = IndexCatalog()
    key = f"postings/documents/{safe}"
    cat.register(key, {"kind": "postings", "path": path})
    plan = bm25_topk(
        docs, "text", "doc_id", list(_BM25_TERMS), k=20, table_key=key
    )
    return rewrite_bm25_topk(plan, catalog=cat)


@register(
    "train_length_buckets",
    "WITH lens AS (SELECT doc_id, "
    "LEN(STRING_SPLIT_REGEX(TRIM(text), '\\s+')) AS n_tokens "
    "FROM documents), "
    "b AS (SELECT doc_id, n_tokens, NTILE(4) OVER "
    "(ORDER BY n_tokens, doc_id) AS bucket FROM lens) "
    "SELECT bucket, COUNT(*) AS n_docs, MIN(n_tokens) AS min_len, "
    "MAX(n_tokens) AS max_len, ROUND(AVG(n_tokens), 4) AS avg_len "
    "FROM b GROUP BY bucket",
    doc="length-bucketed inference layout: quartile buckets over "
    "token counts (tie-free order) so Arrow batches entering a "
    "model UDF see near-uniform sequence lengths — padding waste in "
    "a batch is set by its LONGEST member, so mixing a 2k-token doc "
    "into a batch of 100-token docs wastes ~95%% of the compute; "
    "bucketing is the standard fix. Reports per-bucket length "
    "stats; repartition by bucket before the UDF to apply it.",
)
def train_length_buckets(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    lens = _t(spark, sf, "documents").select(
        "doc_id", token_count("text").alias("n_tokens")
    )
    w = Window.orderBy("n_tokens", "doc_id")
    b = lens.withColumn("bucket", F.ntile(4).over(w))
    return b.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("n_tokens").alias("min_len"),
        F.max("n_tokens").alias("max_len"),
        F.round(F.avg("n_tokens"), 4).alias("avg_len"),
    )


@register(
    "text_zipf_spectrum",
    "WITH tf AS (SELECT term, COUNT(*) AS freq FROM ("
    "SELECT UNNEST(STRING_SPLIT_REGEX(TRIM(text), '\\s+')) AS term "
    "FROM documents) GROUP BY term), "
    "ranked AS (SELECT term, freq, ROW_NUMBER() OVER "
    "(ORDER BY freq DESC, term) AS rnk FROM tf), "
    "top AS (SELECT * FROM ranked WHERE rnk <= 100), "
    "fit AS (SELECT COUNT(*) AS n, SUM(LN(rnk)) AS sx, "
    "SUM(LN(freq)) AS sy, SUM(LN(rnk) * LN(freq)) AS sxy, "
    "SUM(LN(rnk) * LN(rnk)) AS sxx FROM top) "
    "SELECT n AS n_terms, "
    "ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 4) AS zipf_slope "
    "FROM fit",
    doc="corpus Zipf diagnostic: least-squares slope of the log-log "
    "rank-frequency curve over the top-100 terms. Natural-language "
    "corpora sit near -1; a flat slope flags synthetic/templated "
    "text, a cliff flags boilerplate domination — a one-row corpus "
    "health check. One combinable term-count shuffle; the fit runs "
    "on 100 rows.",
)
def text_zipf_spectrum(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    tf = (
        _t(spark, sf, "documents")
        .select(
            F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("term")
        )
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    w = Window.orderBy(F.desc("freq"), "term")
    top = tf.withColumn("rnk", F.row_number().over(w)).filter(
        F.col("rnk") <= 100
    )
    lx = F.log(F.col("rnk").cast("double"))
    ly = F.log(F.col("freq").cast("double"))
    fit = top.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(lx).alias("sx"),
        F.sum(ly).alias("sy"),
        F.sum(lx * ly).alias("sxy"),
        F.sum(lx * lx).alias("sxx"),
    )
    return fit.select(
        F.col("n").alias("n_terms"),
        F.round(
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")),
            4,
        ).alias("zipf_slope"),
    )


@register(
    "text_bm25_served",
    _BM25_ORACLE,
    doc="the PINNED lexical serving path: postings sharded BY TERM "
    "bucket parse once per executor worker (keyed by path/shard/"
    "index version — a refresh invalidates by key), a query batch "
    "schedules tasks ONLY for its terms' shards, each task computes "
    "complete per-term score contributions locally (a term's "
    "postings live wholly in one shard, so df is shard-local), and "
    "the merge sums candidates per (query, doc). Query 2..n never "
    "touches parquet — the search-engine term-sharded serving "
    "shape, lexical twin of ann_served_topk. SAME oracle as the "
    "batch scorer: served ranking must equal it exactly.",
)
def text_bm25_served(spark: SparkSession, sf: str) -> DataFrame:
    from pdf_etl_ocr_inference_spark.operators.search import (
        build_postings_index,
        serve_bm25,
    )
    from pdf_etl_ocr_inference_spark.scratch import scratch_dir

    docs = _t(spark, sf, "documents")
    safe = sf.strip("/").replace("/", "_")
    path = f"{scratch_dir(f'postings_srv_{safe}')}/index"
    build_postings_index(spark, docs, path)
    return serve_bm25(spark, path, [(0, list(_BM25_TERMS))], k=20).select(
        "id", "score"
    )


@register(
    "text_bpe_vocab",
    _bpe_sql.bpe_vocab_sql(num_merges=80, top_v=5000),
    # ORACLED (r7): pair counts are exact integers and every
    # tie-break is lexicographic, so the whole 80-merge loop replays
    # as a DuckDB CTE chain (plans/bpe_sql.py — the LR/k-means chain
    # pattern applied to Sennrich BPE; gaps-and-islands reproduces
    # the left-to-right non-overlapping merge scan)
    doc="BPE vocabulary induction (Sennrich 2016) with the 100 TB "
    "shape: ONE combinable shuffle to the word histogram (capped "
    "top-5000 with a LOGGED drop count — merge decisions are "
    "frequency-driven, so the tail can't flip a ranking), then the "
    "classic merge loop over that bounded driver state. "
    "Deterministic: count ties break lexicographically "
    "(operators/bpe.py).",
)
def text_bpe_vocab(spark: SparkSession, sf: str) -> DataFrame:
    from pdf_etl_ocr_inference_spark.operators.bpe import learn_bpe

    return learn_bpe(
        spark,
        _t(spark, sf, "documents"),
        num_merges=80,
        top_v=5000,
    )


@register(
    "text_bpe_fertility",
    _bpe_sql.bpe_fertility_sql(num_merges=80, top_v=5000, seg_rounds=16),
    # ORACLED (r7): training replays via the bpe_vocab_sql chain, and
    # segmentation unrolls segment_word's lowest-rank/leftmost loop
    # over DISTINCT words (16 rounds — a word of L symbols merges at
    # most L-1 times, fixture max pretoken is 8 chars; an undersized
    # unroll fails LOUD as a gate mismatch, never silently)
    doc="tokenize with the corpus-learned BPE merges: per-doc word "
    "and piece counts (fertility = pieces/words, the vocab-quality "
    "metric). Merge ranks ship in the UDF closure (bounded by "
    "num_merges); each Arrow batch memoizes per DISTINCT word so "
    "hot words segment once per batch (operators/bpe.py).",
)
def text_bpe_fertility(spark: SparkSession, sf: str) -> DataFrame:
    from pdf_etl_ocr_inference_spark.operators.bpe import (
        apply_bpe,
        learn_bpe,
        word_histogram,
        learn_bpe_from_histogram,
    )

    docs = _t(spark, sf, "documents")
    hist = word_histogram(docs, "text", top_v=5000)
    merges = learn_bpe_from_histogram(hist, num_merges=80)
    return apply_bpe(docs, merges)


def _lr_feats(spark, sf):
    from pdf_etl_ocr_inference_spark.operators.quality_model import (
        feature_frame,
    )

    docs = _t(spark, sf, "documents")
    # weak labels: treat English docs as in-domain positives — the
    # standard bootstrap for a fastText-style quality classifier
    return feature_frame(
        docs, "text", (F.col("lang") == "en").cast("int"), "doc_id"
    )


@register(
    "text_quality_lr_train",
    _quality_lr_sql.lr_train_sql(iterations=10),
    doc="trainable quality classifier (fastText-style): full-batch "
    "logistic regression where each gradient step is ONE narrow "
    "pass emitting floor(g*2^24)-quantized int64 partial sums per "
    "partition — learned weights are bit-identical for any corpus "
    "layout, same numeric doctrine as the deterministic k-means "
    "and PCA. Emits (feature, micro_weight=floor(w*1e6)) + bias "
    "(operators/quality_model.py). ORACLED (r7): the exact integer "
    "gradient sums make the whole 10-step loop a DuckDB CTE chain "
    "(plans/quality_lr_sql.py, the kmeans-chain pattern applied to "
    "gradient descent); floor-scaled integer weights avoid the "
    "rounded-double hash hazard.",
)
def text_quality_lr_train(spark: SparkSession, sf: str) -> DataFrame:
    import math

    from pdf_etl_ocr_inference_spark.operators.quality_model import (
        FEATURE_NAMES,
        fit_quality_lr,
    )

    feats = _lr_feats(spark, sf).cache()
    try:
        w, b, _hist = fit_quality_lr(feats, iterations=10)
    finally:
        feats.unpersist()
    rows = [
        (name, math.floor(float(wi) * 1e6))
        for name, wi in zip(FEATURE_NAMES, w)
    ]
    rows.append(("bias", math.floor(float(b) * 1e6)))
    return spark.createDataFrame(rows, ["feature", "micro_weight"])


@register(
    "text_quality_lr_score",
    _quality_lr_sql.lr_score_sql(iterations=10),
    doc="score every document with the corpus-trained quality "
    "classifier: native-expression sigmoid over the learned "
    "weights — no Python in the scoring path, so the trained "
    "filter composes into any pipeline as a Column predicate. "
    "ORACLED (r7): emits p_q4=floor(sigmoid(z)*1e4) as BIGINT; the "
    "oracle replays training (quality_lr_sql chain) then scores "
    "with the scorer's own bias-first add order (float addition is "
    "not associative).",
)
def text_quality_lr_score(spark: SparkSession, sf: str) -> DataFrame:
    from pdf_etl_ocr_inference_spark.operators.quality_model import (
        fit_quality_lr,
        score_quality_lr,
    )

    feats = _lr_feats(spark, sf).cache()
    try:
        w, b, _hist = fit_quality_lr(feats, iterations=10)
        return score_quality_lr(feats, w, b, "doc_id", quantized=True)
    finally:
        feats.unpersist()


@register(
    "text_ccnet_buckets",
    """
    WITH tok AS (
      SELECT doc_id,
             UNNEST(STRING_SPLIT_REGEX(TRIM(LOWER(text)), '\\s+')) AS tok
      FROM documents),
    freq AS (SELECT tok, COUNT(*) AS tf FROM tok GROUP BY tok),
    total AS (SELECT SUM(tf) AS n FROM freq),
    lp AS (
      SELECT doc_id, AVG(LN(tf / (SELECT n FROM total))) AS logprob
      FROM tok JOIN freq USING (tok) GROUP BY doc_id),
    b AS (
      SELECT d.lang, lp.logprob,
             NTILE(3) OVER (PARTITION BY d.lang
               ORDER BY ROUND(lp.logprob, 6) DESC, lp.doc_id) AS t
      FROM lp JOIN documents d USING (doc_id))
    SELECT lang,
           CASE t WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
                  ELSE 'tail' END AS bucket,
           COUNT(*) AS n_docs, ROUND(AVG(logprob), 4) AS avg_lp
    FROM b GROUP BY lang, t
    """,
    doc="CCNet-style perplexity bucketing (Wenzek et al. 2020): "
    "per-LANGUAGE terciles of the corpus-LM document score — 'head' "
    "is the most-fluent third each language keeps preferentially, "
    "'tail' the candidate discard. Buckets cut on the score ROUNDED "
    "to 6 decimals with a doc_id tie-break so both engines' float "
    "accumulation orders agree on the boundary. One corpus-LM "
    "scoring pass + a per-language ntile window (bounded partitions "
    "— languages, not docs).",
)
def text_ccnet_buckets(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    from pdf_etl_ocr_inference_spark.functions.text import tokens

    docs = _t(spark, sf, "documents")
    tok = docs.select(
        "doc_id", F.explode(tokens(F.lower(F.col("text")))).alias("tok")
    )
    freq = tok.groupBy("tok").agg(F.count("*").alias("tf"))
    total = freq.agg(F.sum("tf").alias("n"))
    lp = (
        tok.join(freq, "tok")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(F.avg(F.log(F.col("tf") / F.col("n"))).alias("logprob"))
    )
    w = Window.partitionBy("lang").orderBy(
        F.round("logprob", 6).desc(), F.col("doc_id")
    )
    b = (
        lp.join(docs.select("doc_id", "lang"), "doc_id")
        .withColumn("t", F.ntile(3).over(w))
    )
    return b.groupBy("lang", "t").agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg("logprob"), 4).alias("avg_lp"),
    ).select(
        "lang",
        F.when(F.col("t") == 1, "head")
        .when(F.col("t") == 2, "middle")
        .otherwise("tail")
        .alias("bucket"),
        "n_docs",
        "avg_lp",
    )


@register(
    "text_gopher_rules",
    """
    WITH f AS (
      SELECT doc_id,
        LEN(STRING_SPLIT_REGEX(TRIM(text), '\\s+')) AS ntok,
        LENGTH(text) AS n,
        LENGTH(REGEXP_REPLACE(text, '[a-zA-Z]', '', 'g')) AS nonalpha,
        CASE WHEN LOWER(text) LIKE '% the %' OR LOWER(text) LIKE '% and %'
             OR LOWER(text) LIKE '% to %' OR LOWER(text) LIKE '% of %'
             THEN 1 ELSE 0 END AS has_stopword
      FROM documents),
    r AS (
      SELECT doc_id,
        CASE WHEN ntok BETWEEN 50 AND 100000 THEN 1 ELSE 0 END AS word_count_ok,
        CASE WHEN (n - ntok + 1.0) / GREATEST(ntok, 1) BETWEEN 3 AND 10
             THEN 1 ELSE 0 END AS mean_word_len_ok,
        CASE WHEN nonalpha * 1.0 / GREATEST(n, 1) <= 0.6 THEN 1 ELSE 0 END
          AS symbol_ratio_ok,
        has_stopword AS stopword_ok
      FROM f)
    SELECT COUNT(*) AS n_docs,
           CAST(SUM(word_count_ok) AS BIGINT) AS pass_word_count,
           CAST(SUM(mean_word_len_ok) AS BIGINT) AS pass_mean_word_len,
           CAST(SUM(symbol_ratio_ok) AS BIGINT) AS pass_symbol_ratio,
           CAST(SUM(stopword_ok) AS BIGINT) AS pass_stopword,
           CAST(SUM(word_count_ok * mean_word_len_ok * symbol_ratio_ok
               * stopword_ok) AS BIGINT) AS pass_all
    FROM r
    """,
    doc="Gopher-style quality rule set (Rae et al. 2021, Table A1 "
    "family) as individual per-rule pass counts + the all-rules "
    "survivor count, in ONE conditional-aggregate scan (op66's "
    "shape): word-count bounds, mean-word-length bounds, "
    "symbol-to-text ratio, must-contain-a-stopword. The per-rule "
    "breakdown is what a curation run actually reads — which rule "
    "is eating the corpus — vs the single fused score of "
    "text_quality_score.",
)
def text_gopher_rules(spark: SparkSession, sf: str) -> DataFrame:
    docs = _t(spark, sf, "documents")
    text = F.col("text")
    ntok = token_count(text)
    n = F.length(text)
    nonalpha = F.length(F.regexp_replace(text, "[a-zA-Z]", ""))
    mean_wl = (n - ntok + F.lit(1.0)) / F.greatest(ntok, F.lit(1))
    low = F.lower(text)
    has_stop = (
        low.contains(" the ")
        | low.contains(" and ")
        | low.contains(" to ")
        | low.contains(" of ")
    ).cast("int")
    r = docs.select(
        F.when(ntok.between(50, 100_000), 1).otherwise(0).alias("wc"),
        F.when(mean_wl.between(3, 10), 1).otherwise(0).alias("mwl"),
        F.when(nonalpha / F.greatest(n, F.lit(1)) <= 0.6, 1)
        .otherwise(0)
        .alias("sym"),
        has_stop.alias("stw"),
    )
    return r.agg(
        F.count("*").alias("n_docs"),
        F.sum("wc").alias("pass_word_count"),
        F.sum("mwl").alias("pass_mean_word_len"),
        F.sum("sym").alias("pass_symbol_ratio"),
        F.sum("stw").alias("pass_stopword"),
        F.sum(
            F.col("wc") * F.col("mwl") * F.col("sym") * F.col("stw")
        ).alias("pass_all"),
    )


@register(
    "text_k_anonymity",
    "SELECT lang, source, CAST(FLOOR(n_chars / 500) AS BIGINT) "
    "AS len_bucket, COUNT(*) AS n, (COUNT(*) < 5) AS at_risk "
    "FROM documents GROUP BY lang, source, "
    "CAST(FLOOR(n_chars / 500) AS BIGINT)",
    doc="k-anonymity audit over quasi-identifiers (lang, source, "
    "length bucket): every combination occurring fewer than k=5 "
    "times is flagged — the re-identification risk screen a "
    "training-data release runs next to PII scrubbing "
    "(text_pii_scrub): a rare QI combination can identify a "
    "contributor even with direct identifiers removed (Sweeney "
    "2002). ONE combinable groupBy on the QI tuple at any scale; "
    "generalization (coarser buckets) re-runs the same plan.",
)
def text_k_anonymity(spark: SparkSession, sf: str) -> DataFrame:
    d = _t(spark, sf, "documents")
    bucket = F.floor(F.col("n_chars") / 500).cast("long").alias("len_bucket")
    return (
        d.groupBy("lang", "source", bucket)
        .agg(F.count("*").alias("n"))
        .withColumn("at_risk", F.col("n") < 5)
    )


@register(
    "text_novelty_rate",
    f"""
    WITH tokd AS (
      SELECT doc_id, STRING_SPLIT_REGEX(TRIM(text), '\\s+') AS toks
      FROM documents),
    g AS (SELECT doc_id, UNNEST({_GRAMS5}) AS gram FROM tokd),
    f AS (SELECT gram, MIN(doc_id) AS first_doc FROM g GROUP BY gram)
    SELECT g.doc_id, COUNT(*) AS n_grams,
           CAST(SUM(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_novel
    FROM g JOIN f USING (gram) GROUP BY g.doc_id
    """,
    doc="per-document n-gram NOVELTY rate: of a doc's distinct "
    "5-gram shingles, how many first appear (min doc_id over the "
    "corpus) in THIS doc — the corpus-freshness / redundancy signal "
    "behind dedup prioritization and memorization-risk triage (a "
    "doc whose grams are all re-runs contributes little new text; "
    "cf. Lee et al. 2022's repeated-substring analysis). Exact "
    "integer counts (n_novel/n_grams is the rate — computed by the "
    "caller, never a cross-engine float). ONE gram-keyed window "
    "shuffle (the span-dedup machinery's shape) + one per-doc "
    "combinable agg; at 100 TB the gram key is the same partitioner "
    "dedup_span_hotspots already scales on.",
)
def text_novelty_rate(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    from pdf_etl_ocr_inference_spark.functions.text import word_ngrams

    g = (
        _t(spark, sf, "documents")
        .select(
            "doc_id",
            F.explode(F.array_distinct(word_ngrams("text", 5))).alias(
                "gram"
            ),
        )
    )
    first = F.min("doc_id").over(Window.partitionBy("gram"))
    return (
        g.withColumn("first_doc", first)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(
                F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(
                    0
                )
            ).alias("n_novel"),
        )
    )


@register(
    "text_novelty_incremental",
    """
    WITH tokd AS (
      SELECT doc_id, STRING_SPLIT_REGEX(TRIM(text), '\\s+') AS t
      FROM documents),
    occ AS (
      SELECT doc_id, ARRAY_TO_STRING(t[i+1:i+6], ' ') AS gram
      FROM tokd, UNNEST(RANGE(0, GREATEST(LEN(t) - 5, 0))) AS r(i)),
    b AS (SELECT DISTINCT doc_id, gram FROM occ WHERE doc_id % 10 = 7),
    corp AS (SELECT DISTINCT gram FROM occ WHERE doc_id % 10 != 7)
    SELECT b.doc_id AS id, COUNT(*) AS n_grams,
           CAST(SUM(CASE WHEN corp.gram IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_new
    FROM b LEFT JOIN corp ON corp.gram = b.gram GROUP BY b.doc_id
    """,
    doc="INCREMENTAL batch novelty: each new-arrivals doc's distinct "
    "6-grams probed against the persisted corpus gram index "
    "(operators/span_index.py — built once on the base corpus, never "
    "re-tokenized); n_new counts grams the corpus has never seen — "
    "the net-new-text rate an ingest pipeline reports per batch "
    "before deciding to keep, dedup, or down-weight it. Probe cost "
    "∝ batch (_pb partition pruning + broadcast gram set, the "
    "dedup_span_incremental shape). Both branches exercised at "
    "every SF (237/2276, 247/2630, 1941/23676 known/total batch "
    "grams). Docs under 6 tokens yield no grams and no row — the "
    "span-family convention, replayed by the oracle.",
)
def text_novelty_incremental(spark: SparkSession, sf: str) -> DataFrame:
    from pdf_etl_ocr_inference_spark.operators.span_index import (
        batch_novel_gram_counts,
        build_span_gram_index,
    )
    from pdf_etl_ocr_inference_spark.scratch import scratch_dir

    docs = _t(spark, sf, "documents").select("doc_id", "text")
    base = docs.filter(F.col("doc_id") % 10 != 7)
    batch = docs.filter(F.col("doc_id") % 10 == 7)
    safe = sf.strip("/").replace("/", "_")
    path = f"{scratch_dir(f'novidx_{safe}')}/index"
    build_span_gram_index(spark, base, path, n=6)
    return batch_novel_gram_counts(spark, path, batch).select(
        "id", "n_grams", "n_new"
    )
