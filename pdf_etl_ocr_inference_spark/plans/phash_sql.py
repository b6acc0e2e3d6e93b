"""DuckDB-SQL replay of the dHash perceptual-hash pipeline.

``operators/multimodal._dhash_one`` is deterministic arithmetic over
the payload bytes: np.array_split block means (exact — integer sums
below 2^53 are exact in float64 under ANY summation order, and the
one division is correctly rounded), then 64 mean-vs-neighbor
comparisons.  Every step is replayable in SQL:

- bytes come from ``hex(encode(text))`` two-hex-digit slices (the
  media fixture derives payloads from document text);
- np.array_split's section sizes (first ``len % k`` sections get one
  extra element) invert to a closed-form (row, col) assignment per
  byte index;
- grid means compare as the same IEEE doubles both engines compute;
- the 64-bit hash assembles with the top bit contributing −2^63
  (two's-complement), matching the Python ``h - 2^64`` adjustment.
"""

from __future__ import annotations

_ROWS, _COLS = 8, 9  # operators/multimodal._DHASH_ROWS/_DHASH_COLS


def _split_index(pos: str, total: str, k: int, out: str) -> str:
    """SQL expr: which of ``k`` np.array_split sections does element
    ``pos`` of a ``total``-length array fall into (named ``out`` via
    the caller's alias)."""
    base = f"({total} // {k})"
    rem = f"({total} % {k})"
    cut = f"({rem} * ({base} + 1))"
    return (
        f"CASE WHEN {pos} < {cut} THEN {pos} // ({base} + 1) "
        f"ELSE {rem} + ({pos} - {cut}) // GREATEST({base}, 1) END AS {out}"
    )


def _section_start(sec: str, total: str, k: int) -> str:
    base = f"({total} // {k})"
    rem = f"({total} % {k})"
    return (
        f"(CASE WHEN {sec} < {rem} THEN {sec} * ({base} + 1) "
        f"ELSE {rem} * ({base} + 1) + ({sec} - {rem}) * {base} END)"
    )


def _section_len(sec: str, total: str, k: int) -> str:
    base = f"({total} // {k})"
    rem = f"({total} % {k})"
    return f"({base} + CASE WHEN {sec} < {rem} THEN 1 ELSE 0 END)"


def phash_ctes(src: str) -> str:
    """CTE text computing ``ph(media_id, phash)`` for every row of
    ``src``, which must provide (media_id, text)."""
    top_neg = -(1 << 63)
    return (
        # payload bytes as hex; empty payloads degrade to b'\\x00'
        # exactly like _dhash_one
        f"blobs AS (SELECT media_id, "
        f"CASE WHEN octet_length(encode(text)) = 0 THEN '00' "
        f"ELSE hex(encode(text)) END AS hx, "
        f"GREATEST(octet_length(encode(text)), 1) AS n FROM {src}), "
        f"bytes AS (SELECT media_id, n, CAST(i AS BIGINT) AS p, "
        f"CAST('0x' || substr(hx, CAST(i * 2 + 1 AS BIGINT), 2) AS BIGINT) "
        f"AS v FROM blobs, UNNEST(GENERATE_SERIES(0, n - 1)) AS r(i)), "
        f"rowed AS (SELECT media_id, n, p, v, "
        + _split_index("p", "n", _ROWS, "rw")
        + " FROM bytes), "
        f"placed AS (SELECT media_id, rw, v, "
        + _split_index(
            f"(p - {_section_start('rw', 'n', _ROWS)})",
            _section_len("rw", "n", _ROWS),
            _COLS,
            "cl",
        )
        + " FROM rowed), "
        f"cells AS (SELECT media_id, rw, cl, "
        f"CAST(SUM(v) AS DOUBLE) / COUNT(*) AS g "
        f"FROM placed GROUP BY media_id, rw, cl), "
        f"grid AS (SELECT m.media_id, gi.i AS rw, gj.j AS cl, "
        f"COALESCE(c.g, 0.0) AS g "
        f"FROM (SELECT DISTINCT media_id FROM blobs) m "
        f"CROSS JOIN UNNEST(GENERATE_SERIES(0, {_ROWS - 1})) AS gi(i) "
        f"CROSS JOIN UNNEST(GENERATE_SERIES(0, {_COLS - 1})) AS gj(j) "
        f"LEFT JOIN cells c ON c.media_id = m.media_id "
        f"AND c.rw = gi.i AND c.cl = gj.j), "
        f"bits AS (SELECT a.media_id, a.rw AS i, a.cl AS j, "
        f"CASE WHEN a.g < b.g THEN 1 ELSE 0 END AS bit "
        f"FROM grid a JOIN grid b ON a.media_id = b.media_id "
        f"AND a.rw = b.rw AND b.cl = a.cl + 1 "
        f"WHERE a.cl <= {_COLS - 2}), "
        # bit (0,0) is the MSB: weight 2^63 == -2^63 two's-complement
        f"ph AS (SELECT media_id, CAST(SUM(CASE "
        f"WHEN i = 0 AND j = 0 THEN bit * CAST({top_neg} AS BIGINT) "
        f"ELSE bit * (CAST(1 AS BIGINT) << (63 - (i * {_ROWS} + j))) "
        f"END) AS BIGINT) AS phash FROM bits GROUP BY media_id)"
    )


def phash_sql() -> str:
    """Oracle for ``mm_phash``: dHash of every document-derived blob."""
    src = "(SELECT doc_id AS media_id, text FROM documents) d"
    return f"WITH {phash_ctes(src)} SELECT media_id, phash FROM ph"


def phash_neardup_sql(max_hamming: int = 6) -> str:
    """Oracle for ``mm_phash_neardup``: the planted-twin corpus
    (identical re-encode at id+1e6, one-byte-appended at id+2e6 for
    every 50th doc), then ALL pairs within hamming ≤ r by brute
    bit_count(xor) — the complete set the Manku block join must
    reproduce exactly (pigeonhole completeness at r < blocks)."""
    src = (
        "(SELECT doc_id AS media_id, text FROM documents "
        "UNION ALL SELECT doc_id + 1000000, text FROM documents "
        "WHERE doc_id % 50 = 0 "
        "UNION ALL SELECT doc_id + 2000000, text || ' ' FROM documents "
        "WHERE doc_id % 50 = 0) d"
    )
    return (
        f"WITH {phash_ctes(src)} "
        f"SELECT a.media_id AS id_a, b.media_id AS id_b, "
        f"CAST(bit_count(xor(a.phash, b.phash)) AS INT) AS hamming "
        f"FROM ph a JOIN ph b ON a.media_id < b.media_id "
        f"WHERE bit_count(xor(a.phash, b.phash)) <= {max_hamming}"
    )
