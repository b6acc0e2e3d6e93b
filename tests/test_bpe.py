"""BPE induction: parity with an independent naive reference,
determinism, cap logging, and segmentation invariants."""

import logging

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def naive_bpe(texts, num_merges):
    """Independent reference: operate on the raw token stream (no
    histogram), count pairs over every word occurrence."""
    import re

    pat = re.compile(r"[A-Za-z0-9]+|[^A-Za-z0-9\s]")
    corpus = [tuple(w) + ("</w>",) for t in texts for w in pat.findall(t)]
    merges = []
    for rank in range(num_merges):
        pairs = {}
        for syms in corpus:
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + 1
        if not pairs:
            break
        (left, right), n = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if n < 2:
            break
        merges.append((rank, left, right))
        out_corpus = []
        for syms in corpus:
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            out_corpus.append(tuple(out))
        corpus = out_corpus
    return merges


def test_histogram_bpe_equals_streamwise_reference():
    """Learning from the (word, count) histogram must equal learning
    from the raw occurrence stream — the identity that makes the
    one-shuffle design exact, not approximate."""
    from pdf_etl_ocr_inference_spark.operators.bpe import (
        learn_bpe_from_histogram,
    )

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox, again and again!",
        "lazy lazy dogs dog the fox",
        "pack my box with five dozen liquor jugs",
    ] * 3
    import re

    pat = re.compile(r"[A-Za-z0-9]+|[^A-Za-z0-9\s]")
    hist = {}
    for t in texts:
        for w in pat.findall(t):
            hist[w] = hist.get(w, 0) + 1
    got = learn_bpe_from_histogram(sorted(hist.items()), 30)
    ref = naive_bpe(texts, 30)
    assert got == ref


def test_learn_bpe_deterministic_and_capped(spark, caplog):
    from pdf_etl_ocr_inference_spark.operators.bpe import learn_bpe

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    a = learn_bpe(spark, docs, num_merges=20, top_v=5000).collect()
    b = learn_bpe(
        spark, docs.repartition(13), num_merges=20, top_v=5000
    ).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    assert len(a) == 20

    with caplog.at_level(logging.WARNING):
        learn_bpe(spark, docs, num_merges=1, top_v=10)
    assert any("capped" in r.message for r in caplog.records)


def test_apply_bpe_invariants(spark):
    """pieces >= merges-free char segmentation lower bound is wrong
    to assert directly; assert the two safe bounds: n_pieces >=
    n_words (every word is >= 1 piece) and fewer merges => more
    pieces (monotonicity)."""
    from pdf_etl_ocr_inference_spark.operators.bpe import (
        apply_bpe,
        learn_bpe_from_histogram,
        word_histogram,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(50)
    hist = word_histogram(docs, "text", top_v=5000)
    merges = learn_bpe_from_histogram(hist, 60)
    full = {
        r["doc_id"]: (r["n_words"], r["n_pieces"])
        for r in apply_bpe(docs, merges).collect()
    }
    some = {
        r["doc_id"]: r["n_pieces"]
        for r in apply_bpe(docs, merges[:10]).collect()
    }
    assert full and set(full) == set(some)
    for d, (nw, np_) in full.items():
        assert np_ >= nw
        assert some[d] >= np_  # fewer merges can't produce fewer pieces
