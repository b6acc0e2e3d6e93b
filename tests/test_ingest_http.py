"""Hermetic tests for the production HTTP fetcher (OP-06 injection
point): 200 / 404 / transient-5xx retry / timeout / retry-idempotence,
against a local threaded HTTP server.  Matches the reference's
null-on-failure contract (``01-download-pdfs.py:89-120``).
"""

from __future__ import annotations

import http.server
import os
import threading
import time
from collections import Counter

import pytest

from pdf_etl_ocr_inference_spark.operators.ingest import (
    HttpStatusError,
    fetch_blobs,
    make_http_fetch,
)


class _Handler(http.server.BaseHTTPRequestHandler):
    def log_message(self, *args):  # keep pytest output clean
        pass

    def _send(self, body: bytes, status: int = 200) -> None:
        self.send_response(status)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        hits = self.server.hits  # type: ignore[attr-defined]
        hits[self.path] += 1
        if self.path.startswith("/ok/"):
            self._send(f"payload:{self.path}".encode())
        elif self.path.startswith("/flaky/"):
            # two transient 503s, then success
            if hits[self.path] <= 2:
                self.send_error(503)
            else:
                self._send(b"recovered")
        elif self.path.startswith("/slow/"):
            time.sleep(1.5)
            self._send(b"late")
        else:
            self.send_error(404)


@pytest.fixture()
def http_server():
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    srv.hits = Counter()  # type: ignore[attr-defined]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        yield srv
    finally:
        srv.shutdown()
        t.join(timeout=5)


def _base(srv) -> str:
    host, port = srv.server_address
    return f"http://{host}:{port}"


def test_http_fetch_200_writes_body(http_server, tmp_path):
    fetch = make_http_fetch(timeout=5, retries=0)
    dest = str(tmp_path / "a.bin")
    fetch(f"{_base(http_server)}/ok/a", dest)
    assert open(dest, "rb").read() == b"payload:/ok/a"
    assert http_server.hits["/ok/a"] == 1
    # no .part leftovers
    assert os.listdir(tmp_path) == ["a.bin"]


def test_http_fetch_404_raises_without_retry(http_server, tmp_path):
    fetch = make_http_fetch(timeout=5, retries=3, backoff_s=0.01)
    dest = str(tmp_path / "gone.bin")
    with pytest.raises(HttpStatusError) as ei:
        fetch(f"{_base(http_server)}/nope", dest)
    assert ei.value.status == 404
    assert http_server.hits["/nope"] == 1  # permanent: exactly one hit
    assert not os.path.exists(dest)


def test_http_fetch_retries_transient_5xx(http_server, tmp_path):
    fetch = make_http_fetch(timeout=5, retries=3, backoff_s=0.01)
    dest = str(tmp_path / "f.bin")
    fetch(f"{_base(http_server)}/flaky/x", dest)
    assert open(dest, "rb").read() == b"recovered"
    assert http_server.hits["/flaky/x"] == 3  # 503, 503, 200


def test_http_fetch_5xx_exhausts_retries(http_server, tmp_path):
    fetch = make_http_fetch(timeout=5, retries=1, backoff_s=0.01)
    dest = str(tmp_path / "f.bin")
    with pytest.raises(HttpStatusError) as ei:
        fetch(f"{_base(http_server)}/flaky/y", dest)  # needs 3 attempts
    assert ei.value.status == 503
    assert http_server.hits["/flaky/y"] == 2  # initial + 1 retry
    assert not os.path.exists(dest)


def test_http_fetch_timeout_retries_then_fails(http_server, tmp_path):
    fetch = make_http_fetch(timeout=0.3, retries=1, backoff_s=0.01)
    dest = str(tmp_path / "s.bin")
    t0 = time.monotonic()
    with pytest.raises(Exception) as ei:
        fetch(f"{_base(http_server)}/slow/z", dest)
    assert not isinstance(ei.value, HttpStatusError)  # transport error
    assert time.monotonic() - t0 < 5  # 2 attempts × ~0.3s + backoff
    assert not os.path.exists(dest)


def test_http_fetch_connection_refused_retries(tmp_path):
    # port 1 refuses connections; transient class → retried
    fetch = make_http_fetch(timeout=0.5, retries=2, backoff_s=0.01)
    with pytest.raises(Exception) as ei:
        fetch("http://127.0.0.1:1/ok/a", str(tmp_path / "x.bin"))
    assert not isinstance(ei.value, HttpStatusError)


def test_fetch_blobs_http_end_to_end(http_server, tmp_path, spark):
    """fetch_blobs + HTTP fetcher: ok rows get (path, size, True),
    404 rows get (null, null, False) — failure is data, not exception."""
    base = _base(http_server)
    rows = [
        (1, f"{base}/ok/one", str(tmp_path / "one.txt")),
        (2, f"{base}/missing/two", str(tmp_path / "two.txt")),
        (3, f"{base}/ok/three", str(tmp_path / "three.txt")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string, dest string")
    out = fetch_blobs(
        df,
        url_col="url",
        dest_col="dest",
        id_cols=("doc_id",),
        fetch_fn=make_http_fetch(timeout=5, retries=1, backoff_s=0.01),
    )
    got = {r["doc_id"]: r for r in out.collect()}
    assert got[1]["fetch_ok"] and got[3]["fetch_ok"]
    assert got[1]["filesize"] == len(b"payload:/ok/one")
    assert not got[2]["fetch_ok"]
    assert got[2]["filename"] is None and got[2]["filesize"] is None
    assert open(tmp_path / "three.txt", "rb").read() == b"payload:/ok/three"


def test_fetch_blobs_http_idempotent_on_existing_dest(
    http_server, tmp_path, spark
):
    """Retry-idempotence: an existing dest is NOT re-fetched (the
    exists-check guard, ref 01:100-101) — zero server hits."""
    base = _base(http_server)
    dest = tmp_path / "done.txt"
    dest.write_bytes(b"already here")
    df = spark.createDataFrame(
        [(7, f"{base}/ok/done", str(dest))],
        "doc_id long, url string, dest string",
    )
    out = fetch_blobs(
        df,
        url_col="url",
        dest_col="dest",
        id_cols=("doc_id",),
        fetch_fn=make_http_fetch(timeout=5),
    ).collect()
    assert out[0]["fetch_ok"] and out[0]["filesize"] == len(b"already here")
    assert http_server.hits["/ok/done"] == 0
    assert dest.read_bytes() == b"already here"
