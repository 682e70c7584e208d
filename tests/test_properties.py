"""Property-based tests (hypothesis) for the text/dedup function layer.

These check engine invariants no example-based test pins down: the
tokenizer/shingler/chunker contracts hold for ARBITRARY unicode input, and
redaction is idempotent. Spark evaluation is batched per property (one
createDataFrame per example set, not per example) to keep runtime sane.
"""

from __future__ import annotations

import re

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from bigdatapipelne_spark.functions.text import (
    chunk_tokens,
    redact_pii,
    shingles_from_tokens,
    tokens,
)

# Text with whitespace runs, punctuation, digits and non-ascii. "Cn"
# (unassigned) is excluded alongside surrogates: the JVM (Unicode 16 in
# Spark 4's JDK 17+) assigns case mappings to codepoints CPython 3.11's str
# model (Unicode 14) still treats as unassigned — e.g. U+10D50 GARAY, where
# JVM lower() maps to U+10D70 and Python's lower() is a no-op — so the
# Python reference model below is only valid over codepoints assigned in
# Python's own Unicode version (case mappings of assigned characters are
# stable across Unicode versions).
TEXT = st.text(
    alphabet=st.characters(blacklist_categories=("Cs", "Cn")), max_size=200
)


def _eval(spark, texts, expr):
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    return [r[0] for r in df.select(expr).collect()]


@settings(max_examples=30, deadline=None)
@given(st.lists(TEXT, min_size=1, max_size=8))
def test_tokens_never_empty_strings_and_match_python(spark, texts):
    got = _eval(spark, texts, tokens("text"))
    for raw, toks in zip(texts, got):
        # The contract is Java/RE2 \s+ (what both Spark and the DuckDB
        # oracles split on), NOT Python str.split() — Python calls \x1f
        # etc. whitespace, the engines do not.
        model = [w for w in re.split("[ \t\n\x0b\f\r]+", raw.lower()) if w]
        assert toks == model
        assert "" not in toks


@settings(max_examples=30, deadline=None)
@given(st.lists(st.lists(st.text(st.characters(blacklist_categories=("Cs", "Zs"),
                                               blacklist_characters="\t\n\r\x0b\x0c"),
                                 min_size=1, max_size=8),
                         max_size=30),
                min_size=1, max_size=6))
def test_shingle_count_bound(spark, token_lists):
    # shingles(n=3) over k tokens yields max(k-2, 1) shingles, each of <= 3
    # tokens joined by single spaces.
    df = spark.createDataFrame([(t,) for t in token_lists], "toks array<string>")
    got = [r[0] for r in df.select(shingles_from_tokens("toks", 3)).collect()]
    for toks, sh in zip(token_lists, got):
        assert len(sh) == max(len(toks) - 2, 1)
        if toks:
            assert sh[0] == " ".join(toks[:3])


@settings(max_examples=20, deadline=None)
@given(st.lists(st.lists(st.text(st.characters(blacklist_categories=("Cs", "Zs"),
                                               blacklist_characters="\t\n\r\x0b\x0c"),
                                 min_size=1, max_size=5),
                         min_size=1, max_size=120),
                min_size=1, max_size=4))
def test_chunking_covers_every_token_in_order(spark, token_lists):
    # Every token lands in some chunk; concatenating non-overlap heads
    # reconstructs the document exactly.
    size, overlap = 20, 5
    step = size - overlap
    df = spark.createDataFrame([(t,) for t in token_lists], "toks array<string>")
    got = [r[0] for r in df.select(chunk_tokens("toks", size, overlap)).collect()]
    for toks, chunks in zip(token_lists, got):
        rebuilt: list[str] = []
        for i, ch in enumerate(chunks):
            assert ch.chunk_idx == i
            words = ch.chunk.split(" ") if ch.chunk else []
            assert ch.n_tokens == len(words)
            rebuilt.extend(words if i == len(chunks) - 1 else words[:step])
        assert rebuilt == toks


@settings(max_examples=30, deadline=None)
@given(st.lists(TEXT, min_size=1, max_size=8))
def test_redact_pii_idempotent(spark, texts):
    once = _eval(spark, texts, redact_pii("text"))
    df = spark.createDataFrame([(t,) for t in once], "text string")
    twice = [r[0] for r in df.select(redact_pii("text")).collect()]
    assert once == twice
