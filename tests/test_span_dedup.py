"""Span-level (substring) dedup: positional n-grams, interval merge,
scrub reconstruction — brute-force parity on a planted corpus plus
partition-layout invariance.
"""

from __future__ import annotations

import itertools

import pytest

from pdf_etl_ocr_inference_spark.operators.span_dedup import (
    dup_span_intervals,
    dup_span_stats,
    positional_ngrams,
    scrub_dup_spans,
)

BOILER = "all rights reserved by the original author of this work"

DOCS = [
    # 0/1 share the boilerplate sentence at different offsets
    (0, f"alpha beta gamma {BOILER} delta epsilon zeta"),
    (1, f"{BOILER} one two three four five six seven eight nine"),
    # 2 shares a different 6-gram run with 3 (overlapping occurrences
    # within 2 → interval merge exercised)
    (2, "red orange yellow green blue indigo violet red orange yellow "
        "green blue indigo violet end"),
    (3, "start red orange yellow green blue indigo violet finish pad "
        "pad2 pad3 pad4"),
    # 4: fully unique, long enough for grams
    (4, "q w e r t y u i o p a s d f g h j k l z x c v b"),
    # 5: shorter than n=6 tokens → contributes no grams
    (5, "tiny doc here"),
]


def _brute(n=6, min_docs=2):
    """Pure-python ground truth: gram -> occurrences, dup grams,
    merged intervals, scrubbed texts."""
    occ = []  # (id, pos, gram)
    toks = {i: t.split() for i, t in DOCS}
    for i, tk in toks.items():
        for p in range(len(tk) - n + 1):
            occ.append((i, p, " ".join(tk[p : p + n])))
    by_gram = {}
    for i, p, g in occ:
        by_gram.setdefault(g, []).append((i, p))
    dup = {g for g, o in by_gram.items()
           if len({i for i, _ in o}) >= min_docs}
    # merged intervals per doc
    ivs = {}
    for i, p, g in occ:
        if g in dup:
            ivs.setdefault(i, []).append((p, p + n))
    merged = {}
    for i, spans in ivs.items():
        spans.sort()
        out = []
        for s, e in spans:
            if out and s <= out[-1][1]:
                out[-1] = (out[-1][0], max(out[-1][1], e))
            else:
                out.append((s, e))
        merged[i] = out
    scrubbed = {}
    for i, tk in toks.items():
        cov = set(
            itertools.chain.from_iterable(
                range(s, e) for s, e in merged.get(i, [])
            )
        )
        kept = [t for p, t in enumerate(tk) if p not in cov]
        scrubbed[i] = (len(kept), len(tk) - len(kept), " ".join(kept))
    return dup, merged, scrubbed


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_positional_ngrams_short_doc_empty(spark, docs_df):
    out = positional_ngrams(docs_df, "text", "doc_id", n=6)
    assert out.filter("id = 5").count() == 0
    # doc 0 has 10 tokens + BOILER(10) = 20? count = len - n + 1
    n0 = len(DOCS[0][1].split()) - 5
    assert out.filter("id = 0").count() == n0


def test_dup_stats_match_brute(spark, docs_df):
    dup, _, _ = _brute()
    got = {
        r["gram"]
        for r in dup_span_stats(docs_df, "text", "doc_id", n=6).collect()
    }
    assert got == dup


def test_intervals_match_brute_and_merge(spark, docs_df):
    _, merged, _ = _brute()
    rows = dup_span_intervals(docs_df, "text", "doc_id", n=6).collect()
    got = {}
    for r in rows:
        got.setdefault(r["id"], []).append((r["span_start"], r["span_end"]))
    got = {i: sorted(v) for i, v in got.items()}
    assert got == {i: v for i, v in merged.items() if v}
    # doc 2's repeated run must have merged into ONE interval
    assert len(got[2]) == 1


def test_scrub_matches_brute(spark, docs_df):
    _, _, scrubbed = _brute()
    rows = scrub_dup_spans(docs_df, "text", "doc_id", n=6).collect()
    got = {r["id"]: (r["n_kept"], r["n_removed"], r["scrubbed"]) for r in rows}
    assert got == scrubbed
    # unique + short docs unchanged
    assert got[4][1] == 0 and got[5][1] == 0


def test_partition_layout_invariance(spark, docs_df):
    base = sorted(
        map(tuple, dup_span_intervals(docs_df, "text", "doc_id").collect())
    )
    shuffled = sorted(
        map(
            tuple,
            dup_span_intervals(
                docs_df.repartition(7, "doc_id"), "text", "doc_id"
            ).collect(),
        )
    )
    assert base == shuffled


def test_max_doc_freq_cap_drops_hot_grams(spark):
    hot = "common boiler plate line repeated everywhere okay"
    rows = [(i, f"doc {i} marker{i} filler{i} {hot}") for i in range(8)]
    rows += [(100, f"pair one {hot} tail"), ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    uncapped = dup_span_stats(df, "text", "doc_id", n=6).count()
    capped = dup_span_stats(
        df, "text", "doc_id", n=6, max_doc_freq=3
    ).count()
    assert capped < uncapped

def _brute_keepfirst(n=6):
    """Ground truth for the keep-first policy: an occurrence is a hit
    only when its doc_id exceeds the gram's minimum doc_id (the
    canonical copy is exempt)."""
    occ = []
    toks = {i: t.split() for i, t in DOCS}
    for i, tk in toks.items():
        for p in range(len(tk) - n + 1):
            occ.append((i, p, " ".join(tk[p : p + n])))
    by_gram = {}
    for i, p, g in occ:
        by_gram.setdefault(g, []).append((i, p))
    first = {
        g: min(i for i, _ in o)
        for g, o in by_gram.items()
        if len({i for i, _ in o}) >= 2
    }
    ivs = {}
    for i, p, g in occ:
        if g in first and i > first[g]:
            ivs.setdefault(i, []).append((p, p + n))
    merged = {}
    for i, spans in ivs.items():
        spans.sort()
        out = []
        for s, e in spans:
            if out and s <= out[-1][1]:
                out[-1] = (out[-1][0], max(out[-1][1], e))
            else:
                out.append((s, e))
        merged[i] = out
    scrubbed = {}
    for i, tk in toks.items():
        cov = set(
            itertools.chain.from_iterable(
                range(s, e) for s, e in merged.get(i, [])
            )
        )
        kept = [t for p, t in enumerate(tk) if p not in cov]
        scrubbed[i] = (len(kept), len(tk) - len(kept), " ".join(kept))
    return merged, scrubbed


def test_keepfirst_intervals_match_brute(spark, docs_df):
    merged, _ = _brute_keepfirst()
    rows = dup_span_intervals(
        docs_df, "text", "doc_id", n=6, policy="keepfirst"
    ).collect()
    got = {}
    for r in rows:
        got.setdefault(r["id"], []).append(
            (r["span_start"], r["span_end"])
        )
    got = {i: sorted(v) for i, v in got.items()}
    assert got == {i: v for i, v in merged.items() if v}
    # doc 0 (min id of the boilerplate pair) must carry NO interval
    assert 0 not in got


def test_keepfirst_scrub_matches_brute_and_conserves(spark, docs_df):
    _, kf = _brute_keepfirst()
    _, _, sym = _brute()
    rows = scrub_dup_spans(
        docs_df, "text", "doc_id", n=6, policy="keepfirst"
    ).collect()
    got = {
        r["id"]: (r["n_kept"], r["n_removed"], r["scrubbed"])
        for r in rows
    }
    assert got == kf
    # conservation: keep-first never removes more than symmetric,
    # and the corpus-min doc (first for every gram it has) is
    # unscathed modulo whitespace canonicalization
    for i in got:
        assert got[i][1] <= sym[i][1]
    assert got[0][1] == 0
    assert got[0][2] == " ".join(DOCS[0][1].split())
    # the policy is not vacuous on this fixture: the repeat copies
    # (docs 1 and 3) still lose their duplicated spans
    assert got[1][1] > 0 and got[3][1] > 0
    # doc 2 hosts the canonical copy of the 2/3-shared run but also
    # REPEATS it internally — keep-first exempts the whole min doc
    # for that gram family, symmetric scrubs it: strict inequality
    assert got[2][1] < sym[2][1]


def test_keepfirst_generic_path_matches_fast_path(spark, docs_df):
    """min_docs=2 takes the window fast path; max_doc_freq forces the
    generic join path — both must implement the same keep-first
    exemption."""
    fast = sorted(
        map(
            tuple,
            dup_span_intervals(
                docs_df, "text", "doc_id", n=6, policy="keepfirst"
            ).collect(),
        )
    )
    generic = sorted(
        map(
            tuple,
            dup_span_intervals(
                docs_df, "text", "doc_id", n=6,
                policy="keepfirst", max_doc_freq=10**6,
            ).collect(),
        )
    )
    assert fast == generic


def test_unknown_policy_raises(spark, docs_df):
    with pytest.raises(ValueError):
        dup_span_intervals(
            docs_df, "text", "doc_id", n=6, policy="keep-one"
        )
