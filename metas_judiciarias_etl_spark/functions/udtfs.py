"""Python user-defined table functions (Spark 4 UDTF API) — the
extensibility surface for row-expanding operators that genuinely need
imperative logic.

Design posture (same as the multimodal codecs): the package's query
surface stays ZERO-UDF — every registered query is pure Catalyst
expressions — and the UDTF here exists to prove the extension point
works end-to-end (registration, SQL invocation, LATERAL join, analyzer
schema) with a function whose output can be CHECKED against a
pure-expression twin (operators/prep.py::chunk_documents). A real
deployment would reach for this surface when the per-row expansion
logic can't be expressed as sequence()/explode() — e.g. a streaming
tokenizer with carry-over state or a sentence splitter with a
model-backed boundary detector.

At 100 TB: a UDTF runs in the Python worker per partition (Arrow
transfer when arrow-enabled) — a map-stage expansion with no shuffle,
exactly like the expression form; the cost difference is the
Python-worker round trip, which is why the expression form stays the
registered query.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf

from ..operators.prep import CHUNK_STRIDE, CHUNK_TOKENS


@udtf(returnType="chunk_idx: bigint, n_tok: bigint, n_chunks: bigint")
class ChunkWindows:
    """Overlapping token-window chunker: same boundary math as
    chunk_documents (CHUNK_TOKENS-token windows, CHUNK_STRIDE stride,
    short docs collapse to one chunk). eval() yields one row per chunk.
    """

    def eval(self, text: str):  # noqa: D102 — contract in class docstring
        if text is None:
            # The expression twin's F.size(F.split(NULL)) yields NULL →
            # the row drops out of its aggregation; yielding nothing is
            # the matching semantics (ADVICE r4: '' would count 1 token).
            return
        n_tok = len(text.split(" "))
        if n_tok <= CHUNK_TOKENS:
            n_chunks = 1
        else:
            n_chunks = (n_tok - CHUNK_TOKENS + CHUNK_STRIDE - 1) // CHUNK_STRIDE + 1
        for i in range(n_chunks):
            yield (i, n_tok, n_chunks)


def register_udtfs(spark) -> None:
    """Register the package's UDTFs on a session (idempotent)."""
    spark.udtf.register("chunk_windows", ChunkWindows)
