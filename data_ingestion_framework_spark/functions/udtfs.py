"""Spark 4 Python user-defined table functions (UDTFs).

The SQL-callable table-function surface: once registered, ANY SQL user
can expand rows without touching the DataFrame API —

    spark.udtf.register("chunk_windows", ChunkWindows)
    spark.sql(\"\"\"
      SELECT d.doc_id, c.*
      FROM documents d,
           LATERAL chunk_windows(d.doc_id, d.text, 40, 10) c
    \"\"\")

``ChunkWindows`` mirrors ``operators/text.py chunk_documents`` exactly
(same normalization, same start grid, same pure-overlap suppression) —
pinned by a parity test — so the two surfaces can never drift. The
expression-based operator remains the fast path (JVM, no Python
worker); the UDTF is the integration surface for SQL-only callers and
pays one Arrow-batched Python hop by design.

UDTFs here declare a STATIC ``returnType`` (no ``analyze()``
round-trip) and are stateless per-row generators, so Spark can
pipeline them with the scan — no shuffle, no state store.
"""

from __future__ import annotations

import re

from pyspark.sql.functions import udtf


def _normalize(text: str) -> str:
    """Python twin of ``operators/text.py normalize_text`` (lowercase,
    whitespace collapsed, trimmed) — keep in lockstep."""
    return re.sub(r"\s+", " ", text).strip().lower()


@udtf(returnType="chunk_id bigint, chunk_text string, n_tokens bigint")
class ChunkWindows:
    """Overlapping token-window chunks of one document — the UDTF twin
    of ``chunk_documents`` (`chunk_id` is 0-based position in the start
    grid; blank docs yield nothing; no chunk is pure overlap)."""

    def eval(self, doc_id, text: str, chunk_tokens: int, overlap: int):
        if text is None or not text.strip():
            return
        if overlap >= chunk_tokens:
            raise ValueError("overlap must be smaller than chunk_tokens")
        words = [w for w in _normalize(text).split(" ") if w != ""]
        step = chunk_tokens - overlap
        n = len(words)
        last_start = max(n - overlap, 1)
        chunk_id = 0
        for start in range(1, last_start + 1, step):
            piece = words[start - 1 : start - 1 + chunk_tokens]
            yield (chunk_id, " ".join(piece), len(piece))
            chunk_id += 1


@udtf(returnType="token string, tf bigint")
class TermFrequencies:
    """Per-document term frequencies — the explode+count idiom as a
    SQL-callable table function (one row per distinct token)."""

    def eval(self, text: str):
        if text is None:
            return
        counts: dict[str, int] = {}
        for w in _normalize(text).split(" "):
            if w:
                counts[w] = counts.get(w, 0) + 1
        for token in sorted(counts):
            yield (token, counts[token])


def register_udtfs(spark) -> None:
    """Register every packaged UDTF on the session (idempotent)."""
    spark.udtf.register("chunk_windows", ChunkWindows)
    spark.udtf.register("term_frequencies", TermFrequencies)
