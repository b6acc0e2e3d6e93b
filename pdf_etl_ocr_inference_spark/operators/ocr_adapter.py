"""Production OCR parse adapter: ``unstructured`` → ``parse_fn``.

The reference's OCR step is ``partition_pdf(location,
strategy="ocr_only")`` → ``chunk_by_title(elements)`` → ``str`` per
chunk (``02-parallel-ocr-with-ray.py:223-230``), fanned out with Ray.
Our engine's fan-out is ``chunk_map_in_pandas`` (operators/documents.py)
with an injected ``parse_fn``; this module builds that ``parse_fn``
from ``unstructured`` when the library is present.

The OCR stack is NOT installed in the build sandbox (SURVEY §7 hard
part a), so everything is capability-gated: the factory raises
``OcrUnavailableError`` with install instructions when the import
fails, and tests exercise the full call plumbing with an injected fake
``unstructured`` module instead.

Scale note: the adapter is pure per-document Python — no state, no
driver round-trip — so it parallelizes linearly with task count
exactly like the reference's Ray fan-out, but scheduled by Spark
(LPT layout + AQE skew handling come from ``chunk_map_in_pandas``'s
``size_col``).
"""

from __future__ import annotations

import io
from collections.abc import Callable


class OcrUnavailableError(RuntimeError):
    """Raised when the ``unstructured`` OCR stack is not importable."""


def _import_unstructured():
    try:
        from unstructured.chunking.title import chunk_by_title
        from unstructured.partition.pdf import partition_pdf
    except ImportError as exc:  # pragma: no cover - exercised via fake
        raise OcrUnavailableError(
            "the `unstructured[pdf]` package (plus its tesseract/poppler "
            "system deps) is required for real PDF OCR; install it on "
            "driver and executors, or inject a custom parse_fn"
        ) from exc
    return partition_pdf, chunk_by_title


def ocr_available() -> bool:
    """True iff the real OCR stack imports in this environment."""
    try:
        _import_unstructured()
        return True
    except OcrUnavailableError:
        return False


def unstructured_parse_fn(
    strategy: str = "ocr_only",
    source: str = "path",
    partition_kwargs: dict | None = None,
) -> Callable[[object], list[str]]:
    """Build a ``parse_fn`` for ``chunk_map_in_pandas`` backed by
    ``unstructured``.

    - ``strategy``: passed through to ``partition_pdf`` — the
      reference uses ``"ocr_only"`` and notes ``"hi_res"`` as the
      layout-aware alternative (ref ``02:224-225``).
    - ``source``: ``"path"`` (cell value is a filesystem path, the
      reference's calling convention) or ``"bytes"`` (cell value is
      the PDF payload, e.g. a ``binary`` column fetched by OP-06 —
      parsed in memory, no temp file).
    - ``partition_kwargs``: extra keyword arguments forwarded to
      ``partition_pdf`` (languages, OCR agent config, ...).

    Returns document → ``[str(chunk), ...]``; the >``min_chars``
    filter stays in ``chunk_map_in_pandas`` (ref ``02:230`` applies
    ``len > 50`` post-chunk, which is that operator's default).

    The import resolves at factory time so a missing stack fails fast
    on the driver, not per-task on the executors.
    """
    if source not in ("path", "bytes"):
        raise ValueError(f"source must be 'path' or 'bytes', got {source!r}")
    partition_pdf, chunk_by_title = _import_unstructured()
    extra = dict(partition_kwargs or {})

    def parse(doc) -> list[str]:
        if source == "bytes":
            elements = partition_pdf(
                file=io.BytesIO(doc), strategy=strategy, **extra
            )
        else:
            elements = partition_pdf(
                filename=doc, strategy=strategy, **extra
            )
        return [str(c) for c in chunk_by_title(elements)]

    return parse
