"""Text-analysis column builders: tokenization, shingling, fingerprinting,
language/quality signals.

All pure Catalyst expressions (split/transform/slice/md5/...) — the per-row
work stays inside whole-stage codegen, and the only shuffles are whatever
aggregation the caller adds on top. Cross-engine determinism notes (these
functions back duckdb-oracled queries):

- tokenization is ``split(lower(text), '\\s+')`` — mirrored in SQL as
  ``string_split_regex(lower(text), '\\s+')``;
- hashes are md5 hex strings (identical definition everywhere); min/compare
  on them is plain lexicographic string order;
- ratios are int/int double divisions (exact same operands -> same double).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny English function-word list; enough to separate English-ish text from
# noise deterministically (the classic n-gram/stopword LID heuristic).
EN_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it", "for", "on")


def tokens(text: Column | str) -> Column:
    """Whitespace tokens of the lowercased text. Empty strings (leading /
    trailing / all-whitespace input) are filtered, so empty text yields an
    empty array, not ``['']`` — SQL mirror:
    ``list_filter(string_split_regex(lower(text),'\\s+'), x -> x <> '')``."""
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(F.lower(c), r"\s+"), lambda x: x != "")


def distinct_tokens(text: Column | str) -> Column:
    return F.array_distinct(tokens(text))


def normalize_text(text: Column | str) -> Column:
    """Canonical form for exact-dedup: lowercase, collapse whitespace, trim."""
    c = F.col(text) if isinstance(text, str) else text
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def fingerprint(text: Column | str) -> Column:
    """Document fingerprint: md5 of the normalized text (stable 128-bit id
    usable as a dedup/join key at any scale)."""
    return F.md5(normalize_text(text))


def shingles_from_tokens(tok_col: Column | str, n: int = 3) -> Column:
    """Word n-gram shingles from an already-materialized token array column.

    Hot paths must tokenize into a real column first and shingle from the
    column reference: expressions inlined into a higher-order-function
    lambda are re-evaluated per element (no CSE across the lambda
    boundary), so ``shingles(tokens(text))`` would re-split the text once
    per shingle (~tokens× slowdown on long documents).
    """
    w = F.col(tok_col) if isinstance(tok_col, str) else tok_col
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(w) - (n - 1), F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(w, i, n)),
    )


def shingles(text: Column | str, n: int = 3) -> Column:
    """Word n-gram shingles as an array<string>.

    ``transform(sequence(1, greatest(size-n+1, 1)), i -> concat_ws(' ',
    slice(words, i, n)))`` — documents shorter than ``n`` words yield one
    shingle (the whole text). Duplicates are kept: downstream min-hashing is
    multiset-safe (min over duplicates == min over the set), which saves an
    ``array_distinct`` pass on the hot path.

    NOTE: convenience form — the token expression is inlined and
    re-evaluated per element inside the lambda. Operators on the hot path
    should materialize ``tokens()`` as a column and use
    ``shingles_from_tokens`` (see that docstring).
    """
    return shingles_from_tokens(tokens(text), n)


def en_stopword_ratio(text: Column | str) -> Column:
    """Fraction of tokens that are English function words; NULL for empty
    text (never a 0/0).

    Convenience form — tokenizes inline (twice: filter + size). Hot paths
    that also need other token-derived signals should materialize
    ``tokens()`` as a column and use ``stopword_ratio_from_tokens`` (see
    shingles_from_tokens on the lambda-boundary CSE hazard)."""
    return stopword_ratio_from_tokens(tokens(text))


def stopword_ratio_from_tokens(tok_col: Column | str) -> Column:
    """``en_stopword_ratio`` over an already-materialized token array
    column: the split/lower/filter tokenize pass runs ONCE per row in the
    projection that built the column, instead of once per consuming
    expression. Identical operands -> identical doubles, so oracles are
    unaffected."""
    w = F.col(tok_col) if isinstance(tok_col, str) else tok_col
    hits = F.size(F.filter(w, lambda x: x.isin(*EN_STOPWORDS)))
    n = F.size(w)
    return F.when(n > 0, hits.cast("double") / n.cast("double"))


def avg_token_len(text: Column | str) -> Column:
    """Mean token length = non-space chars / token count (exact int/int);
    NULL for empty text."""
    c = F.col(text) if isinstance(text, str) else text
    tok = tokens(text)
    non_space = F.length(F.regexp_replace(F.lower(c), r"\s", ""))
    n = F.size(tok)
    return F.when(n > 0, non_space.cast("double") / n.cast("double"))


# BPE-ish subword segmentation: runs of letters, runs of digits, or a single
# other (punctuation) character — the classic pre-tokenizer split, countable
# with one regexp scan in any engine.
SUBWORD_RE = r"[a-z]+|[0-9]+|[^a-z0-9\s]"


def subword_count(text: Column | str) -> Column:
    """Number of BPE-ish subword pieces (letter runs / digit runs / single
    punctuation chars) in the lowercased text."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_count(F.lower(c), F.lit(SUBWORD_RE)).cast("bigint")


def punct_ratio(text: Column | str) -> Column:
    """Fraction of characters that are neither alphanumeric nor whitespace;
    NULL for empty text."""
    c = F.col(text) if isinstance(text, str) else text
    n = F.length(c)
    punct = F.length(F.regexp_replace(F.lower(c), r"[a-z0-9\s]", ""))
    return F.when(n > 0, punct.cast("double") / n.cast("double"))


def lang_id_en(text: Column | str, threshold: float = 0.05) -> Column:
    """N-gram-heuristic language ID, binary form: 'en' when the stopword
    ratio clears ``threshold``, else 'other' (empty text -> 'other')."""
    return F.when(en_stopword_ratio(text) >= F.lit(threshold), F.lit("en")).otherwise(
        F.lit("other")
    )


def quality_score(text: Column | str) -> Column:
    """Composite quality signal in [0, 1]: rewards English-function-word
    density, penalizes punctuation noise. Pure double arithmetic on exact
    int/int ratios — identical in any engine given the same operands.

    Convenience form (tokenizes inline). Hot paths combining several
    token signals should materialize ``tokens()`` and compose
    ``quality_from_ratios(stopword_ratio_from_tokens(toks),
    punct_ratio(text))`` so the tokenize pass runs once per row."""
    return quality_from_ratios(en_stopword_ratio(text), punct_ratio(text))


def quality_from_ratios(sr: Column, pr: Column) -> Column:
    """The quality combiner on pre-computed stopword / punctuation ratio
    columns — byte-identical arithmetic to ``quality_score`` (same operand
    order, same literals), so hash-checked oracles see the same doubles."""
    return sr * F.lit(0.5) + (F.lit(1.0) - pr) * F.lit(0.5)


def chunk_tokens(tok_col: Column | str, chunk_size: int = 50, overlap: int = 10) -> Column:
    """Overlapping fixed-size token chunks — the context-window splitter of
    a training-data pipeline. Returns array<struct<chunk_idx int, chunk
    string, n_tokens int>>: chunks start every ``chunk_size - overlap``
    tokens, each spanning up to ``chunk_size`` tokens, so consecutive
    chunks share ``overlap`` tokens and every token lands in a chunk.

    Pure codegen (sequence stride + slice); pass a MATERIALIZED token
    column (see shingles_from_tokens on lambda-boundary CSE).
    """
    if overlap >= chunk_size:
        raise ValueError("overlap must be < chunk_size")
    step = chunk_size - overlap
    w = F.col(tok_col) if isinstance(tok_col, str) else tok_col
    starts = F.sequence(
        F.lit(1), F.greatest(F.size(w) - overlap, F.lit(1)), F.lit(step)
    )
    return F.transform(
        starts,
        lambda st: F.struct(
            ((st - 1) / step).cast("int").alias("chunk_idx"),
            F.concat_ws(" ", F.slice(w, st, chunk_size)).alias("chunk"),
            F.least(
                F.size(w) - st + 1, F.lit(chunk_size)
            ).cast("int").alias("n_tokens"),
        ),
    )


def collapse_repeat_tokens(tok_col: Column | str) -> Column:
    """Collapse immediate token repetitions ("batch batch batch" ->
    "batch") — the de-repetition cleanup for stutter/boilerplate runs in
    scraped or generated text. Keeps a token when it differs from its
    predecessor; pure codegen via the indexed filter lambda.

    Index handling: Spark's lambda index is 0-based and ``F.get`` is
    0-based null-on-miss, so the first element's predecessor lookup
    yields NULL and ``true OR null`` keeps it — no ANSI out-of-bounds
    error. The DuckDB mirror is the same shape with 1-based indexing:
    ``list_filter(w, (x, i) -> i = 1 OR x <> w[i-1])``.

    Pass a MATERIALIZED token column (see shingles_from_tokens on the
    lambda-boundary CSE hazard).
    """
    w = F.col(tok_col) if isinstance(tok_col, str) else tok_col
    return F.filter(w, lambda x, i: (i == F.lit(0)) | (x != F.get(w, i - 1)))


# PII patterns kept to syntax both Java regex (Spark) and RE2 (DuckDB)
# accept identically: no backreferences, no lookaround.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?[0-9][0-9()\-. ]{6,}[0-9]"


def redact_pii(text: Column | str) -> Column:
    """Redact emails then phone-shaped digit runs to ``<EMAIL>`` /
    ``<PHONE>`` placeholders — the text-side PII scrub (the structured-side
    analog is operators/project.py drop_fields). Order matters: emails go
    first so their digits can't be half-eaten by the phone pattern. Pure
    codegen (two regexp_replace passes); SQL mirror uses the same patterns
    with the 'g' flag."""
    c = F.col(text) if isinstance(text, str) else text
    c = F.regexp_replace(c, EMAIL_RE, "<EMAIL>")
    return F.regexp_replace(c, PHONE_RE, "<PHONE>")
