"""Python UDTF surface (Spark 4): table functions for logic that genuinely
needs imperative row fan-out.

The engine's stance (README "UDFs are the slow path") still holds — every
UDTF here has a pure-Catalyst twin that the hot path uses
(``functions.text.chunk_tokens``), and the tests assert the two produce
IDENTICAL rows. The UDTF form exists because it is the extension surface a
user reaches for when the expression language runs out; registering one
end-to-end (class -> spark.udtf.register -> LATERAL join -> hash-checked
against the DuckDB oracle) proves that path works.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf

CHUNK_SIZE = 40
OVERLAP = 8
_STEP = CHUNK_SIZE - OVERLAP


@udtf(returnType="doc_id bigint, chunk_idx int, chunk string, n_tokens int")
class ChunkDocs:
    """Overlapping token chunking as a UDTF — row-identical to
    ``chunk_tokens(chunk_size=40, overlap=8)`` (asserted in
    tests/test_llm_ops.py and by sharing the doc_chunks oracle)."""

    def eval(self, doc_id, text):  # noqa: ANN001 - UDTF contract
        toks = [t for t in (text or "").lower().split() if t]
        n = len(toks)
        for st in range(1, max(n - OVERLAP, 1) + 1, _STEP):
            seg = toks[st - 1 : st - 1 + CHUNK_SIZE]
            yield (
                doc_id,
                (st - 1) // _STEP,
                " ".join(seg),
                min(n - st + 1, CHUNK_SIZE),
            )


def register_udtfs(spark) -> None:
    """Make the UDTFs SQL-addressable (LATERAL chunk_docs(...))."""
    spark.udtf.register("chunk_docs", ChunkDocs)
