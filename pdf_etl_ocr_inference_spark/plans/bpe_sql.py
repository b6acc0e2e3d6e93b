"""DuckDB-SQL replay of BPE vocabulary induction.

``operators/bpe.learn_bpe`` is deterministic by construction (pure
integer pair counts over the capped word histogram; lexicographic
tie-breaks), so the whole merge loop is expressible as a CTE chain —
the quality-LR/k-means chain pattern applied to Sennrich-2016 BPE:

- ``hist``/``w0``: the top-V word histogram and its char+EOW symbol
  sequences (grouped by sequence, counts summed — the trainer's
  ``words`` dict);
- per merge k: ``p{k}`` exact pair counts, ``m{k}`` the argmax pair
  (count desc, pair lexicographic; EMPTY when best < 2 — the
  trainer's break, after which every later round no-ops), ``w{k}``
  the rewritten sequences.  The left-to-right non-overlapping merge
  scan is gaps-and-islands: within each maximal run of consecutive
  matching positions, even offsets merge (a merged symbol is
  strictly longer than ``left``, so it can never re-match inside the
  same round — the scan-equivalence the trainer's index-skip loop
  relies on too);
- every CTE MATERIALIZED (each references the previous round twice;
  inlining would double the tree per round).
"""

from __future__ import annotations

# rendered verbatim into a standard-SQL single-quoted literal (no
# backslash processing), so this must be the exact RE2 text
PRETOKEN_RE = r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"
EOW = "</w>"


def _hist_ctes(top_v: int, source: str = "documents") -> str:
    return (
        f"hist AS MATERIALIZED (SELECT word, CAST(COUNT(*) AS BIGINT) AS n "
        f"FROM (SELECT UNNEST(regexp_extract_all(text, '{PRETOKEN_RE}')) "
        f"AS word FROM {source}) GROUP BY word "
        f"ORDER BY n DESC, word LIMIT {top_v}), "
        f"w0 AS MATERIALIZED (SELECT syms, CAST(SUM(n) AS BIGINT) AS n "
        f"FROM (SELECT list_append(list_transform("
        f"range(1, length(word) + 1), "
        f"i -> substr(word, CAST(i AS BIGINT), 1)), '{EOW}') AS syms, n "
        f"FROM hist WHERE word <> '') GROUP BY syms)"
    )


def _round_ctes(k: int) -> str:
    prev = f"w{k - 1}"
    return (
        # exact pair counts over the previous state
        f"p{k} AS MATERIALIZED (SELECT syms[i + 1] AS a, syms[i + 2] AS b, "
        f"CAST(SUM(n) AS BIGINT) AS cnt FROM {prev}, "
        f"UNNEST(range(0, len(syms) - 1)) AS r(i) GROUP BY a, b), "
        # the trainer's argmax with its break: empty when best < 2
        f"m{k} AS MATERIALIZED (SELECT a, b FROM p{k} WHERE cnt >= 2 "
        f"ORDER BY cnt DESC, a, b LIMIT 1), "
        # positions with match flags vs the (single or absent) merge
        f"e{k} AS (SELECT wid, n, CAST(i AS BIGINT) AS pos, "
        f"syms[i + 1] AS s, syms[i + 2] AS nxt, "
        f"(m.a IS NOT NULL AND syms[i + 1] = m.a "
        f"AND syms[i + 2] IS NOT DISTINCT FROM m.b) AS mt "
        f"FROM (SELECT ROW_NUMBER() OVER () AS wid, syms, n FROM {prev}) w, "
        f"UNNEST(range(0, len(syms))) AS r(i) LEFT JOIN m{k} m ON TRUE), "
        # gaps-and-islands: even offsets inside each run of matches merge
        f"f{k} AS (SELECT wid, n, pos, s, nxt, CASE WHEN mt THEN "
        f"((pos - MIN(pos) OVER (PARTITION BY wid, grp, mt)) % 2 = 0) "
        f"ELSE FALSE END AS mg FROM (SELECT *, pos - ROW_NUMBER() OVER "
        f"(PARTITION BY wid, mt ORDER BY pos) AS grp FROM e{k})), "
        # rebuild: merged positions emit left||right, successors drop
        f"w{k} AS MATERIALIZED (SELECT syms, CAST(SUM(n) AS BIGINT) AS n "
        f"FROM (SELECT wid, MIN(n) AS n, "
        f"list(CASE WHEN mg THEN s || nxt ELSE s END ORDER BY pos) AS syms "
        f"FROM (SELECT *, COALESCE(LAG(mg) OVER (PARTITION BY wid "
        f"ORDER BY pos), FALSE) AS skip FROM f{k}) "
        f"WHERE NOT skip GROUP BY wid) GROUP BY syms)"
    )


def bpe_vocab_sql(
    num_merges: int = 80, top_v: int = 5000, source: str = "documents"
) -> str:
    """Oracle for ``text_bpe_vocab``: the (merge_rank, left, right)
    table of executed merges."""
    parts = [_hist_ctes(top_v, source)]
    sels = []
    for k in range(1, num_merges + 1):
        parts.append(_round_ctes(k))
        sels.append(
            f"SELECT CAST({k - 1} AS INT) AS merge_rank, "
            f'a AS "left", b AS "right" FROM m{k}'
        )
    return "WITH " + ", ".join(parts) + " " + " UNION ALL ".join(sels)


def _segment_ctes(rounds: int) -> str:
    """CTEs segmenting every DISTINCT corpus word under the learned
    merge table ``mg(rank, a, b)``: per round, apply the SINGLE
    lowest-rank (then leftmost) applicable merge per word — exactly
    ``segment_word``'s while-loop, unrolled.  ``rounds`` bounds the
    loop: a word of L symbols needs at most L-1 merges, so any value
    ≥ the corpus' max pretoken length is exact (extra rounds no-op).
    """
    parts = [
        "dw AS MATERIALIZED (SELECT DISTINCT word FROM "
        f"(SELECT UNNEST(regexp_extract_all(text, '{PRETOKEN_RE}')) "
        "AS word FROM documents) WHERE word <> '')",
        "s0 AS MATERIALIZED (SELECT word, list_append(list_transform("
        "range(1, length(word) + 1), "
        f"i -> substr(word, CAST(i AS BIGINT), 1)), '{EOW}') AS syms "
        "FROM dw)",
    ]
    for r in range(1, rounds + 1):
        prev = f"s{r - 1}"
        parts.append(
            # the lowest-rank, leftmost applicable merge per word
            f"c{r} AS MATERIALIZED (SELECT word, pos FROM ("
            f"SELECT w.word, CAST(i AS BIGINT) AS pos, mg.merge_rank, "
            f"ROW_NUMBER() OVER (PARTITION BY w.word "
            f"ORDER BY mg.merge_rank, i) AS rn "
            f"FROM {prev} w, UNNEST(range(0, len(syms) - 1)) AS r(i) "
            f"JOIN mg ON mg.a = syms[i + 1] AND mg.b = syms[i + 2]) "
            f"WHERE rn = 1), "
            # rewrite that one pair (words with no candidate no-op)
            f"s{r} AS MATERIALIZED (SELECT word, "
            f"list(CASE WHEN pos = cpos THEN s || nxt ELSE s END "
            f"ORDER BY pos) AS syms FROM ("
            f"SELECT w.word, CAST(i AS BIGINT) AS pos, syms[i + 1] AS s, "
            f"syms[i + 2] AS nxt, c.pos AS cpos "
            f"FROM {prev} w LEFT JOIN c{r} c USING (word), "
            f"UNNEST(range(0, len(syms))) AS r(i)) "
            f"WHERE cpos IS NULL OR pos <> cpos + 1 GROUP BY word)"
        )
    return ", ".join(parts)


def bpe_fertility_sql(
    num_merges: int = 80,
    top_v: int = 5000,
    seg_rounds: int = 10,
) -> str:
    """Oracle for ``text_bpe_fertility``: learn the merge table (the
    ``bpe_vocab_sql`` chain), segment every distinct word, then per
    doc count words and sum piece counts — matching ``apply_bpe``'s
    (doc_id, n_words, n_pieces) with zero-word docs at (0, 0)."""
    parts = [_hist_ctes(top_v)]
    merge_sels = []
    for k in range(1, num_merges + 1):
        parts.append(_round_ctes(k))
        merge_sels.append(
            f"SELECT CAST({k - 1} AS INT) AS merge_rank, a, b FROM m{k}"
        )
    parts.append(
        "mg AS MATERIALIZED (" + " UNION ALL ".join(merge_sels) + ")"
    )
    parts.append(_segment_ctes(seg_rounds))
    final = f"s{seg_rounds}"
    return (
        "WITH " + ", ".join(parts) + ", "
        f"pieces AS (SELECT word, len(syms) AS n_pieces FROM {final}), "
        f"docwords AS (SELECT doc_id, UNNEST(regexp_extract_all(text, "
        f"'{PRETOKEN_RE}')) AS word FROM documents), "
        f"perdoc AS (SELECT doc_id, CAST(COUNT(*) AS INT) AS n_words, "
        f"CAST(SUM(n_pieces) AS INT) AS n_pieces "
        f"FROM docwords JOIN pieces USING (word) GROUP BY doc_id) "
        f"SELECT d.doc_id, COALESCE(p.n_words, 0) AS n_words, "
        f"COALESCE(p.n_pieces, 0) AS n_pieces "
        f"FROM documents d LEFT JOIN perdoc p USING (doc_id)"
    )
