"""The unstructured-backed parse adapter, exercised hermetically.

The real OCR stack is absent in this sandbox, so these tests verify
(a) the capability gate fails fast with a clear error, and (b) with a
fake ``unstructured`` injected, the adapter reproduces the reference's
call chain — partition_pdf(strategy=...) → chunk_by_title → str —
including the bytes-vs-path calling conventions and the end-to-end
mapInPandas plumbing.
"""

from __future__ import annotations

import sys
import types

import pytest

from pdf_etl_ocr_inference_spark.operators.ocr_adapter import (
    OcrUnavailableError,
    ocr_available,
    unstructured_parse_fn,
)


@pytest.fixture
def fake_unstructured(monkeypatch):
    """Install a minimal fake `unstructured` whose partition step
    records its kwargs and whose chunker titles-cases the text."""
    calls = {}

    def partition_pdf(filename=None, file=None, strategy=None, **kw):
        calls.update(
            filename=filename, file=file, strategy=strategy, extra=kw
        )
        text = (
            file.read().decode("utf-8")
            if file is not None
            else f"contents of {filename}"
        )
        # "elements": one per word, like unstructured's per-element list
        return text.split()

    def chunk_by_title(elements):
        # join pairs of elements into chunk objects (str()-able)
        return [
            " ".join(elements[i : i + 2]) for i in range(0, len(elements), 2)
        ]

    pkg = types.ModuleType("unstructured")
    part_pkg = types.ModuleType("unstructured.partition")
    part_pdf = types.ModuleType("unstructured.partition.pdf")
    part_pdf.partition_pdf = partition_pdf
    chunk_pkg = types.ModuleType("unstructured.chunking")
    chunk_title = types.ModuleType("unstructured.chunking.title")
    chunk_title.chunk_by_title = chunk_by_title
    for name, mod in {
        "unstructured": pkg,
        "unstructured.partition": part_pkg,
        "unstructured.partition.pdf": part_pdf,
        "unstructured.chunking": chunk_pkg,
        "unstructured.chunking.title": chunk_title,
    }.items():
        monkeypatch.setitem(sys.modules, name, mod)
    return calls


def test_unavailable_raises_with_instructions():
    if ocr_available():  # pragma: no cover - sandbox has no OCR stack
        pytest.skip("real unstructured present")
    with pytest.raises(OcrUnavailableError, match="unstructured"):
        unstructured_parse_fn()


def test_path_mode_reference_semantics(fake_unstructured):
    parse = unstructured_parse_fn()  # defaults: ocr_only, path
    out = parse("/data/a.pdf")
    assert fake_unstructured["filename"] == "/data/a.pdf"
    assert fake_unstructured["file"] is None
    assert fake_unstructured["strategy"] == "ocr_only"
    # words of "contents of /data/a.pdf" paired then str()'d
    assert out == ["contents of", "/data/a.pdf"]
    assert all(isinstance(c, str) for c in out)


def test_bytes_mode_and_partition_kwargs(fake_unstructured):
    parse = unstructured_parse_fn(
        strategy="hi_res",
        source="bytes",
        partition_kwargs={"languages": ["eng"]},
    )
    out = parse(b"alpha beta gamma")
    assert fake_unstructured["filename"] is None
    assert fake_unstructured["strategy"] == "hi_res"
    assert fake_unstructured["extra"] == {"languages": ["eng"]}
    assert out == ["alpha beta", "gamma"]


def test_bad_source_rejected():
    with pytest.raises(ValueError, match="source"):
        unstructured_parse_fn(source="url")


def test_mapinpandas_end_to_end(spark, fake_unstructured):
    """The built parse_fn rides chunk_map_in_pandas exactly like the
    token chunker does — proving the production wiring, not just the
    factory."""
    from pdf_etl_ocr_inference_spark.operators.documents import (
        chunk_map_in_pandas,
    )

    docs = spark.createDataFrame(
        [(1, "/pdfs/one.pdf"), (2, "/pdfs/two.pdf")], "doc_id long, text string"
    )
    parse = unstructured_parse_fn()
    rows = (
        chunk_map_in_pandas(docs, parse_fn=parse, min_chars=5)
        .orderBy("doc_id", "chunk_idx")
        .collect()
    )
    # each doc: "contents of /pdfs/<x>.pdf" → chunks ["contents of",
    # "/pdfs/<x>.pdf"]; min_chars=5 keeps both
    assert [(r.doc_id, r.chunk) for r in rows] == [
        (1, "contents of"),
        (1, "/pdfs/one.pdf"),
        (2, "contents of"),
        (2, "/pdfs/two.pdf"),
    ]
