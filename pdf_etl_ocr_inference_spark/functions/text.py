"""Text scalar functions — all native Column expressions.

Engine rule (SURVEY.md §4.4): anything the reference computed inside a
Python UDF body (``01:122-160`` filename building, date slicing,
replace) is lifted to native ``pyspark.sql.functions`` so it stays
inside whole-stage codegen and Catalyst can push/prune around it.
Python appears nowhere in this module's hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# --------------------------------------------------------------------
# Lifted reference expressions (OP-36..41)
# --------------------------------------------------------------------


def iso_date_prefix(c: Column | str) -> Column:
    """``date[:10]`` (``01:135``) done natively."""
    return F.substring(F.col(c) if isinstance(c, str) else c, 1, 10)


def underscored(c: Column | str) -> Column:
    """``title.replace(' ', '_')`` (``01:136``)."""
    return F.regexp_replace(F.col(c) if isinstance(c, str) else c, " ", "_")


def pdf_filename(volume: str, published: Column, title: Column) -> Column:
    """``"%spdfs/%s_%s.pdf" % (volume, date, title_)`` (``01:136``)."""
    return F.format_string(
        f"{volume}pdfs/%s_%s.pdf", iso_date_prefix(published), underscored(title)
    )


def scrub_newlines(c: Column | str) -> Column:
    """``s.replace("\\n", " ")`` (``01:49-55``) as a column op (OP-40)."""
    return F.regexp_replace(F.col(c) if isinstance(c, str) else c, r"\s+", " ")


# --------------------------------------------------------------------
# Text-analysis extension surface (training-data pipeline ops)
# --------------------------------------------------------------------


def normalize_text(c: Column | str) -> Column:
    """Lowercase, strip punctuation, collapse whitespace, trim.

    The canonicalization step used by exact-dedup fingerprinting; kept
    SQL-expressible so the DuckDB oracle can reproduce it.
    """
    col = F.col(c) if isinstance(c, str) else c
    cleaned = F.regexp_replace(F.lower(col), r"[^a-z0-9\s]", "")
    return F.trim(F.regexp_replace(cleaned, r"\s+", " "))


def tokens(c: Column | str) -> Column:
    """Whitespace tokenization → array<string>."""
    col = F.col(c) if isinstance(c, str) else c
    return F.split(F.trim(col), r"\s+")


def token_count(c: Column | str) -> Column:
    """Token count (whitespace tokenizer)."""
    return F.size(tokens(c))


def word_ngrams(c: Column | str, n: int = 3) -> Column:
    """Word n-gram shingles → array<string> (MinHash/Jaccard input).

    Built from native ``transform`` + ``slice`` over the token array —
    no UDF, so it vectorizes JVM-side.  Documents shorter than ``n``
    tokens yield a single shingle of all their tokens.

    The token array is let-bound via a 1-element array wrapper: HOF
    lambda bodies are evaluated per element with no common
    subexpression elimination, so referencing the split expression
    directly inside the inner lambda would re-run the regex split per
    shingle (O(tokens²) per document).  Binding it to a lambda
    variable evaluates it exactly once.
    """
    return F.transform(
        F.array(tokens(c)),
        lambda t: F.transform(
            F.sequence(
                F.lit(1), F.greatest(F.size(t) - F.lit(n - 1), F.lit(1))
            ),
            lambda i: F.concat_ws(" ", F.slice(t, i, n)),
        ),
    )[0]


def quality_score(c: Column | str) -> Column:
    """Heuristic document quality in [0,1] — length, alpha ratio,
    mean word length sanity.  All native; SQL-expressible for the
    oracle.  Mirrors common LLM-data-pipeline quality filters
    (C4/Gopher-style rules, public literature)."""
    col = F.col(c) if isinstance(c, str) else c
    n = F.length(col)
    alpha = F.length(F.regexp_replace(col, r"[^a-zA-Z]", ""))
    alpha_ratio = alpha / F.greatest(n, F.lit(1))
    ntok = token_count(col)
    mean_wl = (n - ntok + 1) / F.greatest(ntok, F.lit(1))
    len_ok = F.when((n >= 50) & (n <= 100_000), F.lit(1.0)).otherwise(F.lit(0.0))
    wl_ok = F.when((mean_wl >= 2.0) & (mean_wl <= 12.0), F.lit(1.0)).otherwise(
        F.lit(0.0)
    )
    # Unrounded: per-row IEEE ops are bit-identical across engines,
    # whereas decimal rounding of doubles is not (Spark rounds the
    # shortest decimal repr, DuckDB the binary value).
    return (alpha_ratio + len_ok + wl_ok) / F.lit(3.0)


# Tiny per-language marker lexicons for the n-gram/stopword language
# heuristic.  Deliberately small and deterministic (SQL-expressible).
_LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "la", "los", "que", "de"],
}


def language_id(c: Column | str) -> Column:
    """Stopword-overlap language heuristic → best language code or
    'und'.  Score = count of marker-word hits per language; ties break
    by language-code order (deterministic)."""
    t = tokens(F.lower(F.col(c) if isinstance(c, str) else c))

    def _in_markers(markers: list[str]):
        # closure factory (a 2-param lambda would receive the array
        # index as its 2nd arg); isin takes plain literals
        return lambda x: x.isin(*markers)

    scores = [
        (lang, F.size(F.filter(t, _in_markers(markers))))
        for lang, markers in sorted(_LANG_MARKERS.items())
    ]
    best_score = F.greatest(*[s for _, s in scores])
    result = F.lit("und")
    # Build reverse so earlier languages win ties (first match kept).
    for lang, score in reversed(scores):
        result = F.when((score == best_score) & (best_score > 0), F.lit(lang)).otherwise(
            result
        )
    return result


def doc_fingerprint(c: Column | str) -> Column:
    """Deterministic document fingerprint: md5 of normalized text.

    The exact-dedup key.  md5 agrees between Spark and DuckDB, so the
    oracle can verify it byte-for-byte.
    """
    return F.md5(normalize_text(c))
