"""North-star LLM-pipeline queries: dedup, similarity search, text analysis
over the driver's ``documents`` / ``embeddings`` tables (BASELINE.json
north_star). Registered in the same ``QUERIES``/``ORACLE`` registry as the
parity queries so the driver's duckdb gate certifies them.

Every oracle replicates the engine's md5-based pipelines exactly (same
tokenization, same seeded rehash "permutations", same band keys), so a green
row is evidence the *operator*, not a lookalike, is right.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigdatapipelne_spark.operators.checkpoint import (
    eager_checkpoint,
    release_checkpoint,
)

from bigdatapipelne_spark.operators.dedup import (
    BANDS,
    _widen_narrow_input,
    decontaminate,
    NUM_PERM,
    ROWS_PER_BAND,
    SIMHASH_BITS,
    exact_duplicates,
    minhash_near_duplicates,
    ngram_jaccard_duplicates,
    simhash_near_duplicates,
    simhash_signatures,
    winnowed_pairs,
)
from bigdatapipelne_spark.operators.similarity import (
    brute_force_topk,
    near_duplicate_pairs,
    srp_bucket_ann,
    srp_near_duplicate_pairs,
)
from bigdatapipelne_spark.functions.text import (
    SUBWORD_RE,
    fingerprint,
    lang_id_en,
    punct_ratio,
    quality_score,
    redact_pii,
    subword_count,
    tokens,
    EN_STOPWORDS,
)
from bigdatapipelne_spark.queries import query
from bigdatapipelne_spark.sources.testdata import load_table as t

# ---------------------------------------------------------------------------
# Shared SQL fragments mirroring functions/text.py exactly.
# ---------------------------------------------------------------------------

# tokens(): lowercase, split on whitespace, drop empty strings.
_SQL_TOKS = "list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')"
# shingles(n=3): word trigrams; documents shorter than 3 words yield one
# shingle (the whole text) — same greatest(size-2, 1) bound as Spark.
_SQL_SHINGLES = (
    "list_transform(generate_series(1, greatest(len(w) - 2, 1)),"
    " i -> array_to_string(list_slice(w, i, i + 2), ' '))"
)
_SQL_FINGERPRINT = "md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))"
_SQL_STOPWORD_LIST = "[" + ", ".join(f"'{s}'" for s in EN_STOPWORDS) + "]"

# Synthetic-copy / re-crawl ids must land on doc_ids no scale factor can
# produce while staying LARGER than every real id (canonical-first-id
# semantics keep originals canonical). Fixed "+100000"/"+200000"/"+400000"
# offsets collided with live doc_ids at the 100x corpus (500k docs) — same
# bug class as customer_merge's "+1000000". 2^40 is beyond any plausible
# testdata id space.
_RECRAWL_OFF_1 = 1 << 40
_RECRAWL_OFF_2 = 1 << 41


# ---------------------------------------------------------------------------
# Deduplication
# ---------------------------------------------------------------------------


@query(
    "exact_dedup",
    oracle=f"""
    WITH docs2 AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + {_RECRAWL_OFF_1} AS doc_id, text FROM documents
    ),
    keyed AS (SELECT doc_id, {_SQL_FINGERPRINT} AS fp FROM docs2),
    groups AS (
      SELECT fp, MIN(doc_id) AS canonical_id, COUNT(*) AS group_size
      FROM keyed GROUP BY fp
    )
    SELECT k.doc_id, g.canonical_id, g.group_size
    FROM keyed k JOIN groups g USING (fp)
    """,
)
def exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: canonical-id mapping over md5(normalized text). The
    corpus is unioned with a re-keyed copy of itself so every group has a
    true duplicate — the raw documents table has none at small SF, which
    would make the check trivially all-singletons."""
    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    dup = docs.withColumn("doc_id", F.col("doc_id") + F.lit(_RECRAWL_OFF_1))
    return exact_duplicates(docs.unionByName(dup), "doc_id", "text")


def _minhash_mins_sql() -> str:
    """The 12 degree-2-polynomial minimums, mirroring operators/dedup.py
    _minhash_exprs exactly: x = first-15-hex of the shingle md5 as BIGINT
    (bit-equal to Spark's conv(...,16,10) — verified), reduced mod the
    Mersenne prime, then min((a_i*(x^2 mod p) + b_i*x + c_i) mod p) per
    permutation, with each product reduced mod p before the sum (both
    engines' BIGINT would overflow on the raw sum of two ~2^62 terms)."""
    from bigdatapipelne_spark.operators.dedup import MINHASH_PRIME, _perm_consts

    p = MINHASH_PRIME
    x = f"(CAST(concat('0x', substr(md5(s), 1, 15)) AS BIGINT) % {p})"
    x2 = f"(({x} * {x}) % {p})"
    return ",\n           ".join(
        f"min((({a} * {x2}) % {p} + ({b} * {x}) % {p} + {c}) % {p})"
        f" AS mh{seed}"
        for seed in range(NUM_PERM)
        for a, b, c in [_perm_consts(seed)]
    )


def _minhash_band_rows_sql() -> str:
    """Band keys over the now-BIGINT minhashes (explicit VARCHAR casts —
    Spark's concat_ws casts longs implicitly, DuckDB's || does not)."""
    return "\n      UNION ALL\n      ".join(
        f"SELECT doc_id, {b} AS band, "
        f"md5(CAST(mh{b * ROWS_PER_BAND} AS VARCHAR) || '|' || "
        f"CAST(mh{b * ROWS_PER_BAND + 1} AS VARCHAR)) AS band_key "
        "FROM sigs"
        for b in range(BANDS)
    )


def _minhash_oracle(threshold: float = 0.5) -> str:
    mins = _minhash_mins_sql()
    band_rows = _minhash_band_rows_sql()
    return f"""
    WITH toks AS (SELECT doc_id, text, {_SQL_TOKS} AS w FROM documents),
    sh AS (SELECT doc_id, {_SQL_SHINGLES} AS shingles FROM toks),
    ex AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
    sigs AS (
      SELECT doc_id,
           {mins}
      FROM ex GROUP BY doc_id
    ),
    bands AS (
      {band_rows}
    ),
    cands AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
      WHERE a.doc_id < b.doc_id
    ),
    sets AS (SELECT doc_id, list_distinct(shingles) AS ss FROM sh),
    scored AS (
      SELECT id_a, id_b,
             CAST(len(list_intersect(sa.ss, sb.ss)) AS DOUBLE) /
             CAST(len(sa.ss) + len(sb.ss) - len(list_intersect(sa.ss, sb.ss)) AS DOUBLE)
               AS jaccard
      FROM cands
      JOIN sets sa ON sa.doc_id = id_a
      JOIN sets sb ON sb.doc_id = id_b
    )
    SELECT id_a, id_b, jaccard FROM scored WHERE jaccard >= {threshold}
    """


@query("minhash_near_dups", oracle=_minhash_oracle())
def minhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(12) + LSH(6x2) candidates, exact trigram-Jaccard verify at
    0.5 — the full fuzzy-dedup pipeline (operators/dedup.py). The oracle
    re-derives the identical seeded-md5 signatures and band keys in SQL."""
    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    return minhash_near_duplicates(docs, "doc_id", "text", n=3, threshold=0.5)


@query(
    "ngram_jaccard_pairs",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_SQL_TOKS} AS w FROM documents),
    sh AS (SELECT doc_id, {_SQL_SHINGLES} AS shingles FROM toks),
    hashed AS (
      SELECT doc_id, md5(s) AS sh
      FROM (SELECT doc_id, unnest(list_distinct(shingles)) AS s FROM sh)
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM hashed GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
      FROM hashed a JOIN hashed b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           CAST(i AS DOUBLE) / CAST(sa.sz + sb.sz - i AS DOUBLE) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE CAST(i AS DOUBLE) / CAST(sa.sz + sb.sz - i AS DOUBLE) >= 0.05
    """,
)
def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT trigram-Jaccard near-dup pairs at a low 0.05 threshold via the
    shingle-hash inverted index (operators/dedup.py:ngram_jaccard_duplicates)
    — the ground-truth companion to minhash_near_dups: it surfaces the
    weak-overlap pairs LSH banding is allowed to miss (4 extra pairs at
    sf0.01). Intersections are join-aggregates over fixed-width md5 rows;
    no shingle arrays ever shuffle."""
    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    return ngram_jaccard_duplicates(docs, "doc_id", "text", n=3, threshold=0.05)


def _winnow_kg_sql(k: int = 20) -> str:
    """The k-gram polynomial-hash expression of operators/dedup.py
    winnow_fingerprints, as DuckDB SQL: h(gram at i) = sum_j
    byte[i+j] * BASE^j mod MOD, with ``ord()`` code points standing in
    for UTF-8 bytes (identical on this all-ASCII corpus; asserted in
    tests/test_llm_ops.py). Per-term products are < 2^39 and the k-term
    sum < 2^44, so plain BIGINT arithmetic is exact."""
    from bigdatapipelne_spark.operators.dedup import WINNOW_MOD, winnow_hash_powers

    terms = " + ".join(
        f"(CASE WHEN i + {j} <= length(s) THEN CAST(ord(substring(s, i + {j}, 1)) "
        f"AS BIGINT) ELSE 0 END) * {p}"
        for j, p in enumerate(winnow_hash_powers(k))
    )
    return (
        f"list_transform(generate_series(1, greatest(length(s) - {k - 1}, 1)), "
        f"i -> ({terms}) % {WINNOW_MOD})"
    )


@query(
    "winnowed_doc_pairs",
    oracle=f"""
    WITH norm AS (
      SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS s
      FROM documents
    ),
    kg AS (
      SELECT doc_id, {_winnow_kg_sql(20)} AS hs
      FROM norm
    ),
    win AS (
      SELECT doc_id,
             list_distinct(list_transform(
               generate_series(1, greatest(len(hs) - 9, 1)),
               i -> list_aggregate(list_slice(hs, i, i + 9), 'min'))) AS fps
      FROM kg
    ),
    ex AS (SELECT doc_id, unnest(fps) AS fp FROM win)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS shared
    FROM ex a JOIN ex b ON a.fp = b.fp AND a.doc_id < b.doc_id
    GROUP BY 1, 2
    HAVING COUNT(*) >= 2
    """,
)
def winnowed_doc_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing (MOSS rolling-hash) fingerprint overlap: pairs sharing >= 2
    selected 20-char-gram min-hashes (operators/dedup.py:winnow_fingerprints)
    — the contained-copy detector that whole-document Jaccard dilutes away.
    The oracle re-derives the identical polynomial k-gram hashes, window
    minima, and inverted-index counts in SQL."""
    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    return winnowed_pairs(docs, "doc_id", "text", k=20, window=10, min_shared=2)


def _simhash_sigs_cte() -> str:
    """CTE text computing (doc_id, simhash) exactly as simhash_signatures."""
    votes = []
    for p in range(16):
        digit = f"(strpos('0123456789abcdef', substring(h, {p + 1}, 1)) - 1)"
        for i in range(4):
            j = p * 4 + i
            votes.append(
                f"SUM(CASE WHEN (({digit} >> {i}) & 1) = 1 THEN 1 ELSE -1 END) AS v{j}"
            )
    votes_sql = ",\n             ".join(votes)
    sig = " || ".join(
        f"CASE WHEN v{j} > 0 THEN '1' ELSE '0' END" for j in range(SIMHASH_BITS)
    )
    return f"""
    toks AS (
      SELECT doc_id, list_distinct({_SQL_TOKS}) AS w FROM documents
    ),
    ex AS (SELECT doc_id, md5(unnest(w)) AS h FROM toks),
    votes AS (
      SELECT doc_id,
             {votes_sql}
      FROM ex GROUP BY doc_id
    ),
    sigs AS (SELECT doc_id, {sig} AS simhash FROM votes)
    """


@query("simhash_sigs", oracle=f"WITH {_simhash_sigs_cte()} SELECT doc_id, simhash FROM sigs")
def simhash_sigs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash signature per document (operators/dedup.py:
    simhash_signatures); oracle recomputes all 64 bit-votes in SQL."""
    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    return simhash_signatures(docs, "doc_id", "text")


def _simhash_pairs_oracle(max_hamming: int = 3, bands: int = 8) -> str:
    width = SIMHASH_BITS // bands
    band_rows = "\n      UNION ALL\n      ".join(
        f"SELECT doc_id, simhash, {b} AS band, "
        f"substring(simhash, {b * width + 1}, {width}) AS band_key FROM sigs"
        for b in range(bands)
    )
    ham = (
        "len(list_filter(generate_series(1, 64),"
        " i -> substring(sig_a, i, 1) <> substring(sig_b, i, 1)))"
    )
    return f"""
    WITH {_simhash_sigs_cte()},
    banded AS (
      {band_rows}
    ),
    cands AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
                      a.simhash AS sig_a, b.simhash AS sig_b
      FROM banded a JOIN banded b ON a.band = b.band AND a.band_key = b.band_key
      WHERE a.doc_id < b.doc_id
    )
    SELECT id_a, id_b, CAST({ham} AS BIGINT) AS hamming
    FROM cands WHERE {ham} <= {max_hamming}
    """


@query("simhash_near_dups", oracle=_simhash_pairs_oracle())
def simhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash matching: pairs within hamming<=3 via 8-band pigeonhole
    bucketing (never all-pairs), exact hamming verify."""
    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    pairs = simhash_near_duplicates(docs, "doc_id", "text", max_hamming=3, bands=8)
    return pairs.withColumn("hamming", F.col("hamming").cast("bigint"))


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------


@query(
    "text_stats",
    oracle=f"""
    WITH base AS (SELECT doc_id, text, {_SQL_TOKS} AS toks FROM documents)
    SELECT doc_id,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
           CAST(len(regexp_extract_all(lower(text), '{SUBWORD_RE}')) AS BIGINT) AS n_subword,
           CASE WHEN len(toks) > 0 THEN
             CAST(len(list_filter(toks, x -> list_contains({_SQL_STOPWORD_LIST}, x))) AS DOUBLE)
             / CAST(len(toks) AS DOUBLE) END AS stopword_ratio,
           CASE WHEN len(toks) > 0 THEN
             CAST(length(regexp_replace(lower(text), '\\s', '', 'g')) AS DOUBLE)
             / CAST(len(toks) AS DOUBLE) END AS avg_token_len,
           {_SQL_FINGERPRINT} AS fingerprint
    FROM base
    """,
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting (whitespace + BPE-ish regex), distinct counts,
    stopword ratio, mean token length, md5 content fingerprint — the quality
    /statistics pass of a training-data pipeline (functions/text.py). No
    shuffle beyond the conditional narrow-input widening.

    Tokenizes ONCE per row (the naive five-signal form re-split the text
    per signal — interpreted HOF lambdas get no CSE; same rewrite as
    doc_quality, round 6). Identical operands -> identical values, so the
    oracle is unchanged."""
    from bigdatapipelne_spark.operators.dedup import _widen_narrow_input
    from bigdatapipelne_spark.functions.text import stopword_ratio_from_tokens

    docs = _widen_narrow_input(t(spark, sf_dir, "documents"))
    base = docs.select("doc_id", "text", tokens("text").alias("toks"))
    n = F.size("toks")
    return base.select(
        "doc_id",
        n.cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct(F.col("toks"))).cast("bigint").alias("n_distinct"),
        subword_count("text").alias("n_subword"),
        stopword_ratio_from_tokens("toks").alias("stopword_ratio"),
        F.when(
            n > 0,
            F.length(F.regexp_replace(F.lower(F.col("text")), r"\s", "")).cast(
                "double"
            )
            / n.cast("double"),
        ).alias("avg_token_len"),
        fingerprint("text").alias("fingerprint"),
    )


@query(
    "doc_quality",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, text, lang, {_SQL_TOKS} AS toks FROM documents
    ),
    sig AS (
      SELECT doc_id, lang,
             CASE WHEN len(toks) > 0 THEN
               CAST(len(list_filter(toks, x -> list_contains({_SQL_STOPWORD_LIST}, x))) AS DOUBLE)
               / CAST(len(toks) AS DOUBLE) END AS sr,
             CASE WHEN length(text) > 0 THEN
               CAST(length(regexp_replace(lower(text), '[a-z0-9\\s]', '', 'g')) AS DOUBLE)
               / CAST(length(text) AS DOUBLE) END AS pr
      FROM base
    )
    SELECT doc_id, lang,
           CASE WHEN sr >= 0.05 THEN 'en' ELSE 'other' END AS lang_pred,
           pr AS punct_ratio,
           sr * 0.5 + (1.0 - pr) * 0.5 AS quality
    FROM sig
    """,
)
def doc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic + punctuation ratio + composite quality score
    per document, alongside the ground-truth lang column.

    Tokenizes ONCE per row: the naive form (lang_id_en + quality_score as
    independent expressions) re-ran the split/filter tokenize ~6x per row
    because interpreted higher-order functions get no CSE — measured 9.4x
    cost at 10x data (round-5 sf1 sweep outlier). Materializing ``toks``
    then ``sr``/``pr`` in stacked projections (CollapseProject declines to
    inline non-cheap aliases referenced more than once) plus widening the
    single-row-group scan brings it in line with the other text queries.
    Same operands -> same doubles, so the oracle is unchanged."""
    from bigdatapipelne_spark.operators.dedup import _widen_narrow_input
    from bigdatapipelne_spark.functions.text import (
        quality_from_ratios,
        stopword_ratio_from_tokens,
    )

    docs = _widen_narrow_input(t(spark, sf_dir, "documents"))
    base = docs.select("doc_id", "lang", "text", tokens("text").alias("toks"))
    sig = base.select(
        "doc_id",
        "lang",
        stopword_ratio_from_tokens("toks").alias("sr"),
        punct_ratio("text").alias("pr"),
    )
    return sig.select(
        "doc_id",
        "lang",
        F.when(F.col("sr") >= F.lit(0.05), F.lit("en"))
        .otherwise(F.lit("other"))
        .alias("lang_pred"),
        F.col("pr").alias("punct_ratio"),
        quality_from_ratios(F.col("sr"), F.col("pr")).alias("quality"),
    )


# ---------------------------------------------------------------------------
# Similarity search
# ---------------------------------------------------------------------------

_SQL_DOT = (
    "list_sum(list_transform(generate_series(1, len({a})),"
    " i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
)
_SQL_NORM = (
    "sqrt(list_sum(list_transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
)


def _sql_cosine(a: str, b: str) -> str:
    dot = _SQL_DOT.format(a=a, b=b)
    na = _SQL_NORM.format(a=a)
    nb = _SQL_NORM.format(a=b)
    return f"({dot} / ({na} * {nb}))"


@query(
    "embedding_topk",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 10),
    c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
    scored AS (
      SELECT query_id, neighbor_id, {_sql_cosine('qv', 'cv')} AS score
      FROM q, c WHERE query_id <> neighbor_id
    ),
    ranked AS (
      SELECT query_id, neighbor_id, score,
             row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rnk
      FROM scored
    )
    SELECT query_id, neighbor_id, score, CAST(rnk AS INTEGER) AS rank
    FROM ranked WHERE rnk <= 5
    """,
)
def embedding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 for a 10-vector query set against the full corpus
    (operators/similarity.py: brute_force_topk — query side broadcast,
    corpus never shuffled)."""
    # corpus side widened: the embeddings table is also a single row
    # group, so the dim-wide cosine folds otherwise run one-core
    emb = _widen_narrow_input(t(spark, sf_dir, "embeddings"))
    q = emb.filter(F.col("vec_id") < 10)
    return brute_force_topk(q, emb, "vec_id", "embedding", k=5)


# Deterministic input bound for the REGISTERED exact near-dup query: below
# near_duplicate_pairs' O(N^2) guard (100k rows), so the gate can never hit
# the guard's ValueError at higher SF. At sf<=0.1 every vec_id is < 2500,
# so the bound is a no-op there and the result matches earlier rounds.
EXACT_NEAR_DUP_CAP = 50_000


@query(
    "embedding_near_dup",
    oracle=f"""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           {_sql_cosine('a.embedding', 'b.embedding')} AS cosine
    FROM embeddings a, embeddings b
    WHERE a.vec_id < b.vec_id
      AND a.vec_id < {EXACT_NEAR_DUP_CAP} AND b.vec_id < {EXACT_NEAR_DUP_CAP}
      AND {_sql_cosine('a.embedding', 'b.embedding')} >= 0.42
    """,
)
def embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs — the exact all-pairs baseline
    (guarded against corpus-scale inputs; the scale path is embedding_ann).
    Threshold 0.42 sits in the top ~0.03% of the synthetic corpus's cosine
    distribution (max ~0.51), so the result is small but non-empty at every
    SF — a discriminating check. Input is bounded at EXACT_NEAR_DUP_CAP on
    both sides (Spark + oracle) so the registered query stays inside the
    operator's quadratic guard at any SF; the unbounded exact form remains
    available as the operator itself for recall tests."""
    emb = t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < EXACT_NEAR_DUP_CAP)
    return near_duplicate_pairs(emb, "vec_id", "embedding", threshold=0.42)


@query("embedding_near_dup_ann")  # approximate candidates -> rows-only check
def embedding_near_dup_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scale path for embedding_near_dup: SRP-bucketed candidate pairs
    (8 OR-amplified tables, multi-probe) scored per-bucket as one numpy
    matmul (Arrow scorer) and thresholded — never O(N^2), and no
    interpreted per-pair expression either. The 88 sign bits themselves
    are also one matmul per Arrow batch (hasher="arrow"): the interpreted
    HOF fold form was the dominant — and JIT-bimodal — stage of the
    round-8 sf10 cell. Recall vs the exact baseline and hasher agreement
    are asserted in tests/test_llm_ops.py; the recall bound is also
    driver-gated via embedding_ann_recall below (same arrow hasher,
    Catalyst scorer for exact thresholding)."""
    emb = t(spark, sf_dir, "embeddings")
    return srp_near_duplicate_pairs(
        emb, "vec_id", "embedding", dim=EMBEDDING_DIM, threshold=0.42,
        n_tables=8, scorer="arrow", hasher="arrow",
    )


# Recall floor the gate asserts for the SRP scale path. With 8 independent
# 4-bit tables + 1-bit multi-probe at threshold 0.42 (per-bit split prob
# arccos(.42)/pi ~ 0.36), the per-pair miss probability is ~(0.455)^8 ~
# 0.2%; observed recall is 1.0 at sf0.001 and sf0.01. 0.9 leaves margin
# for corpus drift without letting a real regression (single-table recall
# is 0.55-0.7) slip through.
ANN_RECALL_FLOOR = 0.9


@query(
    "embedding_ann_recall",
    oracle=f"""
    SELECT (SELECT COUNT(*)
            FROM embeddings a, embeddings b
            WHERE a.vec_id < b.vec_id
              AND a.vec_id < {EXACT_NEAR_DUP_CAP} AND b.vec_id < {EXACT_NEAR_DUP_CAP}
              AND {_sql_cosine('a.embedding', 'b.embedding')} >= 0.42
           ) AS n_exact_pairs,
           TRUE AS recall_ge_floor
    """,
)
def embedding_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-checked recall bound for the SRP ANN scale path: the oracle
    computes the exact near-dup pair count in SQL and asserts
    recall_ge_floor = TRUE; the Spark side emits TRUE only if the SRP
    candidate pairs (semi-joined against the exact pair set, so the claim
    never trusts subset-ness) cover >= ANN_RECALL_FLOOR of it. A recall
    regression flips the boolean and the driver's hash check fails —
    converting the ANN path's evidence from rows-only to value-checked."""
    from bigdatapipelne_spark.operators.similarity import (
        near_duplicate_pairs_fast,
    )

    emb = t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < EXACT_NEAR_DUP_CAP)
    # Checkpoint the exact pair set: it feeds both the semi-join and the
    # n_exact_pairs count, and without the barrier the O(N^2) Catalyst
    # scoring subtree is planned (and executed) twice — guide §7.2.
    # The _fast form is bit-identical to near_duplicate_pairs (arrow
    # candidate matmul + exact Catalyst rescore at the boundary) without
    # the interpreted per-pair fold — guide §4.2.
    exact = eager_checkpoint(
        near_duplicate_pairs_fast(emb, "vec_id", "embedding", threshold=0.42)
    )
    # hasher AND scorer match the production path (embedding_near_dup_ann)
    # so the certificate bounds the candidates that path actually
    # generates. The arrow scorer is safe HERE because the claim never
    # trusts subset-ness: candidates are semi-joined against the exact
    # set (a boundary-ulp extra is dropped by the join; a boundary-ulp
    # miss costs 1/n of recall against a floor with 10% margin), and the
    # emitted row is the floor boolean. semdedup_recall's subset_ok twin
    # keeps the Catalyst boundary decision — that one IS a subset claim.
    ann = srp_near_duplicate_pairs(
        emb, "vec_id", "embedding", dim=EMBEDDING_DIM, threshold=0.42,
        n_tables=8, hasher="arrow", scorer="arrow",
    )
    found = ann.join(exact, ["id_a", "id_b"], "left_semi")
    ne = exact.agg(F.count(F.lit(1)).alias("n_exact_pairs"))
    nf = found.agg(F.count(F.lit(1)).alias("n_found"))
    out = ne.crossJoin(nf).select(
        "n_exact_pairs",
        (F.col("n_found") >= F.lit(ANN_RECALL_FLOOR) * F.col("n_exact_pairs")).alias(
            "recall_ge_floor"
        ),
    )
    # Materialize the 1-row verdict, release the pair checkpoint (§5):
    # the returned frame is local rows — no leaked RDD blocks.
    rows = out.collect()
    release_checkpoint(exact)
    return spark.createDataFrame(rows, out.schema)


# Certificate floor for the SemDeDup cluster-scoped pair miner. Measured
# recall vs the exact pair set at n_clusters=8 / n_probe=3: 1.000 at
# sf0.001, 1.000 at sf0.01, 0.964 at sf0.1 — this synthetic corpus's
# 0.42-threshold pairs are WIDE-angle (max cosine ~0.51, ~65 degrees), the
# hard case for cluster-scoped scoring (real SemDeDup thresholds ~0.99 are
# narrow-angle and co-cluster almost surely). 0.85 leaves margin without
# letting single-probe-grade recall (0.30-0.44 measured) pass.
SEMDEDUP_RECALL_FLOOR = 0.85


@query(
    "semdedup_recall",
    oracle=f"""
    SELECT (SELECT COUNT(*)
            FROM embeddings a, embeddings b
            WHERE a.vec_id < b.vec_id
              AND a.vec_id < {EXACT_NEAR_DUP_CAP} AND b.vec_id < {EXACT_NEAR_DUP_CAP}
              AND {_sql_cosine('a.embedding', 'b.embedding')} >= 0.42
           ) AS n_exact_pairs,
           TRUE AS subset_ok,
           TRUE AS recall_ge_floor
    """,
)
def semdedup_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-checked certificate for the SemDeDup path
    (operators/similarity.py semdedup_pairs — cluster-scoped exact cosine,
    Abbas et al. 2023): the oracle computes the exact near-dup pair count
    in SQL; the Spark side emits subset_ok = TRUE only if EVERY SemDeDup
    pair is in the exact pair set (the Catalyst scorer makes the scores
    bit-identical to near_duplicate_pairs, so this is a strict claim at
    the threshold boundary) and recall_ge_floor = TRUE only if the
    cluster-scoped pairs cover >= SEMDEDUP_RECALL_FLOOR of it. A recall
    or containment regression flips a boolean and the driver's hash check
    fails — the same certificate pattern as embedding_ann_recall."""
    from bigdatapipelne_spark.operators.similarity import (
        near_duplicate_pairs_fast as _exact_pairs,
        semdedup_pairs,
    )

    emb = t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < EXACT_NEAR_DUP_CAP)
    emb = _widen_narrow_input(emb)
    # Both pair sets are consumed by multiple branches (found/extra/counts);
    # checkpoint each once or the O(N^2) exact scoring runs 3x and the
    # cluster-scoped scoring 2x inside one plan (guide §7.2 — the before
    # plan held 10 CartesianProduct nodes; after: 1 exact + 1 sem pass).
    exact = eager_checkpoint(
        _exact_pairs(emb, "vec_id", "embedding", threshold=0.42)
    )
    sem = eager_checkpoint(
        semdedup_pairs(
            emb, "vec_id", "embedding",
            threshold=0.42, n_clusters=8, n_probe=3, scorer="catalyst",
        )
    )
    found = sem.join(exact, ["id_a", "id_b"], "left_semi")
    extra = sem.join(exact, ["id_a", "id_b"], "left_anti")
    ne = exact.agg(F.count(F.lit(1)).alias("n_exact_pairs"))
    nf = found.agg(F.count(F.lit(1)).alias("n_found"))
    nx = extra.agg(F.count(F.lit(1)).alias("n_extra"))
    out = ne.crossJoin(nf).crossJoin(nx).select(
        "n_exact_pairs",
        (F.col("n_extra") == 0).alias("subset_ok"),
        (
            F.col("n_found")
            >= F.lit(SEMDEDUP_RECALL_FLOOR) * F.col("n_exact_pairs")
        ).alias("recall_ge_floor"),
    )
    # Materialize the 1-row verdict, release BOTH pair checkpoints (§5):
    # the returned frame is local rows — no leaked RDD blocks.
    rows = out.collect()
    release_checkpoint(sem)
    release_checkpoint(exact)
    return spark.createDataFrame(rows, out.schema)


@query("embedding_semdedup")  # cluster-scoped approximation -> rows-only;
# value-bounded by the hash-checked semdedup_recall certificate twin
def embedding_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup survivors over the full embeddings table — the production
    semantic-dedup path (operators/similarity.py semdedup_prune):
    deterministic k-means cells (~sqrt(N) clusters), within-cell exact
    cosine via one Arrow matmul per cell, keep-lowest-id per duplicate
    relation. Cost is sum of cell^2, never N^2; recall and strict
    subset-ness vs the exact pair set are driver-gated via
    semdedup_recall."""
    from bigdatapipelne_spark.operators.similarity import semdedup_prune

    emb = _widen_narrow_input(t(spark, sf_dir, "embeddings"))
    survivors = semdedup_prune(
        emb, "vec_id", "embedding", threshold=0.42, n_probe=2
    )
    return survivors.select("vec_id", "label")


# ---------------------------------------------------------------------------
# Multimodal columns
# ---------------------------------------------------------------------------


@query(
    "multimodal_metadata",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS byte_len,
           sha256(text) AS sha256,
           'unknown' AS format
    FROM documents
    """,
)
def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary media column -> Arrow-batched metadata extraction
    (operators/multimodal.py: mapInPandas, one Python call per Arrow batch).
    The payload here is the documents' UTF-8 bytes, so the oracle can verify
    the batch path end-to-end: byte length, sha256, and the magic-number
    sniff (no magic header -> 'unknown')."""
    from bigdatapipelne_spark.operators.multimodal import extract_media_metadata

    docs = t(spark, sf_dir, "documents")
    media = docs.select("doc_id", F.encode("text", "UTF-8").alias("data"))
    return extract_media_metadata(media, id_col="doc_id", data_col="data")


@query(
    "multimodal_features",
    oracle="""
    SELECT doc_id,
           CAST(8 AS INTEGER) AS height, CAST(8 AS INTEGER) AS width,
           CAST(3 AS INTEGER) AS channels,
           TRUE AS means_ok, TRUE AS emb0_ok
    FROM documents
    """,
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode → block-mean resize → feature-extract in one Arrow-batched
    mapInPandas stage (operators/multimodal.py:image_features). Decode is
    the documented deterministic fake (sha256-derived pixels — no codecs in
    this environment); the known-answer unit test re-derives the features
    independently in numpy (tests/test_multimodal.py).

    Gated as a CERTIFICATE (the bounded-error pattern, here with EXACT
    equality): a Catalyst-side recompute from ``sha2(data, 256)`` derives
    what the numpy pipeline must produce, and the emitted booleans flip —
    failing the oracle hash — if the Arrow stage misaligns batches,
    permutes columns, or drifts numerically. The fake decode tiles the
    32-byte digest over 8x8x3 pixels; gcd(3,32)=1 makes every channel
    mean exactly sum(digest)/32, and embedding[0] (the (0,0,ch0) 2x2
    block mean) exactly (b0+b3+b24+b27)/4 — all dyadic rationals, exact
    in float32 and float64 alike, so the equality is bitwise, not
    tolerance-based. Typed-array consumers use image_features directly."""
    from bigdatapipelne_spark.operators.multimodal import (
        attach_fake_media,
        image_features,
    )

    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    media = attach_fake_media(docs, media_format="png")
    feats = image_features(media, id_col="doc_id", data_col="data")

    hexd = F.sha2("data", 256)
    def byte_at(j: int):
        return F.conv(F.substring(hexd, 2 * j + 1, 2), 16, 10).cast("double")
    digest_sum = sum((byte_at(j) for j in range(1, 32)), byte_at(0))
    expected = media.select(
        "doc_id",
        (digest_sum / F.lit(32.0)).alias("_exp_mean"),
        (
            (byte_at(0) + byte_at(3) + byte_at(24) + byte_at(27)) / F.lit(4.0)
        ).alias("_exp_emb0"),
    )
    return feats.join(expected, "doc_id").select(
        "doc_id",
        "height",
        "width",
        "channels",
        (
            (F.col("channel_means")[0] == F.col("_exp_mean"))
            & (F.col("channel_means")[1] == F.col("_exp_mean"))
            & (F.col("channel_means")[2] == F.col("_exp_mean"))
        ).alias("means_ok"),
        (F.col("embedding")[0] == F.col("_exp_emb0")).alias("emb0_ok"),
    )


EMBEDDING_DIM = 64  # driver testdata embeddings are fixed 64-d


@query("embedding_ann")  # approximate by design -> rows-only check
def embedding_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SRP-LSH approximate neighbor search: adaptive code width + 1-bit
    multi-probe + capped buckets + 4 OR-amplified tables
    (operators/similarity.py: srp_bucket_ann) — top-5 recall 0.93 vs brute
    force on this corpus (0.51 single-table), asserted with a floor in
    tests/test_llm_ops.py."""
    emb = t(spark, sf_dir, "embeddings")
    return srp_bucket_ann(
        emb, "vec_id", "embedding", dim=EMBEDDING_DIM, k=5, n_tables=4,
        scorer="arrow", hasher="arrow",
    )


@query("embedding_ivf")  # approximate by design -> rows-only check
def embedding_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate neighbor search: deterministic k-means cells +
    2-probe exact rescoring (operators/similarity.py: ivf_topk) — the
    inverted-file scale path alongside the LSH one. Recall vs brute force
    is asserted in tests/test_llm_ops.py."""
    from bigdatapipelne_spark.operators.similarity import ivf_topk

    emb = t(spark, sf_dir, "embeddings")
    # sqrt(N) cells (the default) + one Lloyd pass: cell population then
    # scales as sqrt(N), keeping candidates at N*sqrt(N)*probes. A pinned
    # cell count is a scale bug — the round-6 sf10 rehearsal measured the
    # old 32-cell form at 6k-vector cells, ~2.5B interpreted pair scores.
    # Arrow scorer: one numpy matmul per cell instead of the interpreted
    # per-pair HOF fold (the certified-exact paths keep the Catalyst fold;
    # this rows-only path takes the 10-100x batch win).
    return ivf_topk(emb, "vec_id", "embedding", k=5, iters=1, scorer="arrow")


# ---------------------------------------------------------------------------
# Top-k ANN recall certificates. embedding_ann / embedding_ivf above are
# rows-only by nature (approximate output, no SQL twin); these two convert
# their evidence to value-checked: the oracle computes the EXACT top-k pair
# count in SQL and asserts recall_ge_floor = TRUE, the Spark side emits
# TRUE only if the ANN pairs (semi-joined against an in-plan exact top-k
# twin) cover >= the floor. A recall regression flips the boolean and the
# driver's hash check fails. Same pattern as embedding_ann_recall, applied
# to the top-k paths.
# ---------------------------------------------------------------------------

# Deterministic input bound: keeps the exact twin's O(C^2) scoring capped at
# any SF (no-op at the test SFs, where the corpus has <= 2048 vectors).
TOPK_RECALL_CAP = 2048

# Floors measured on the synthetic corpus across sf0.001/0.01/0.1:
# SRP 8-table top-5 recall 0.978-0.996 (single table ~0.5) -> 0.9 leaves
# drift margin without letting a table-construction regression through.
# IVF 16-cell/4-probe scans 25% of the corpus and measures 0.531-0.572 ->
# 0.4 is decisively above the 0.25 random-scan baseline a broken assignment
# would produce.
ANN_TOPK_RECALL_FLOOR = 0.9
IVF_TOPK_RECALL_FLOOR = 0.4


def _topk_recall_certificate(
    emb: DataFrame, ann: DataFrame, floor: float
) -> DataFrame:
    """(n_exact_pairs, recall_ge_floor) from an exact in-plan top-5 twin.

    The twin scores via the Arrow matmul path (scorer="arrow"): the
    certificate compares pair SETS against a floor with margin, so the
    fold-vs-BLAS final-ulp rank swaps that forbid Arrow on score-hashed
    queries are harmless here — and the interpreted per-pair fold would
    otherwise dominate the whole sweep (49 s -> ~4 s at sf0.1)."""
    # The exact twin (O(C^2) matmul) feeds BOTH the semi-join probe and
    # the n_exact_pairs count; without a materialization barrier Catalyst
    # plans it as two independent subtrees and the quadratic scoring runs
    # twice per certificate (guide §7.2, duplicated subtrees — the
    # "before" plans in plans/r14/ show the doubled CartesianProduct).
    # One eager localCheckpoint of the k*C-row pair set halves the cell.
    exact = eager_checkpoint(
        brute_force_topk(
            emb, emb, "vec_id", "embedding", k=5, scorer="arrow"
        ).select("query_id", "neighbor_id")
    )
    found = ann.select("query_id", "neighbor_id").join(
        exact, ["query_id", "neighbor_id"], "left_semi"
    )
    ne = exact.agg(F.count(F.lit(1)).alias("n_exact_pairs"))
    nf = found.agg(F.count(F.lit(1)).alias("n_found"))
    out = ne.crossJoin(nf).select(
        "n_exact_pairs",
        (F.col("n_found") >= F.lit(floor) * F.col("n_exact_pairs")).alias(
            "recall_ge_floor"
        ),
    )
    # Materialize the 1-row verdict, then RELEASE the pair checkpoint
    # deterministically (§5 hygiene: localCheckpoint blocks otherwise
    # wait for driver GC + ContextCleaner) — the returned frame is local
    # rows, so no RDD blocks outlive the call.
    rows = out.collect()
    spark = exact.sparkSession
    release_checkpoint(exact)
    return spark.createDataFrame(rows, out.schema)


_TOPK_EXACT_COUNT_SQL = f"""
    WITH v AS (SELECT vec_id, embedding FROM embeddings
               WHERE vec_id < {TOPK_RECALL_CAP}),
    scored AS (
      SELECT a.vec_id AS qid, b.vec_id AS nid,
             {_sql_cosine('a.embedding', 'b.embedding')} AS score
      FROM v a, v b WHERE a.vec_id <> b.vec_id
    ),
    ranked AS (
      SELECT qid, row_number() OVER (
        PARTITION BY qid ORDER BY score DESC, nid) AS rnk
      FROM scored
    )
    SELECT COUNT(*) AS n_exact_pairs, TRUE AS recall_ge_floor
    FROM ranked WHERE rnk <= 5
"""


@query("ann_topk_recall", oracle=_TOPK_EXACT_COUNT_SQL)
def ann_topk_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-checked recall bound for the SRP top-k path
    (operators/similarity.py: srp_bucket_ann, 8 OR-amplified tables +
    1-bit multi-probe): closes the last rows-only gap on the ANN surface
    alongside embedding_ann_recall's pair-mining certificate."""
    emb = t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < TOPK_RECALL_CAP)
    ann = srp_bucket_ann(
        emb, "vec_id", "embedding", dim=EMBEDDING_DIM, k=5, n_tables=8,
        scorer="arrow", hasher="arrow",
    )
    return _topk_recall_certificate(emb, ann, ANN_TOPK_RECALL_FLOOR)


@query("ivf_topk_recall", oracle=_TOPK_EXACT_COUNT_SQL)
def ivf_topk_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-checked recall bound for the IVF top-k path
    (operators/similarity.py: ivf_topk, 16 cells / 4 probes — a 25%
    corpus scan that must beat its own scan fraction decisively)."""
    from bigdatapipelne_spark.operators.similarity import ivf_topk

    emb = t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < TOPK_RECALL_CAP)
    ann = ivf_topk(
        emb, "vec_id", "embedding", k=5, n_centroids=16, n_probe=4, iters=1,
        scorer="arrow",
    )
    return _topk_recall_certificate(emb, ann, IVF_TOPK_RECALL_FLOOR)


@query("ivf_index_topk_recall", oracle=_TOPK_EXACT_COUNT_SQL)
def ivf_index_topk_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-checked recall bound for the PERSISTED-IVF serving path
    (operators/similarity.py: build_ivf_index -> save_ivf_index ->
    load_ivf_index -> ivf_query_topk): the inverted file round-trips
    parquet (partitioned by cluster for probe-time pruning) and the
    query batch is served against the reloaded index — the steady-state
    ANN shape, certified with the same exact-twin floor as
    ivf_topk_recall (identical quantizer parameters)."""
    import tempfile

    from bigdatapipelne_spark.operators.similarity import (
        build_ivf_index,
        ivf_query_topk,
        load_ivf_index,
        save_ivf_index,
    )

    emb = t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < TOPK_RECALL_CAP)
    ix = build_ivf_index(emb, "vec_id", "embedding", n_centroids=16, iters=1)
    root = tempfile.mkdtemp(prefix="ivf_index_")
    save_ivf_index(ix, "vec_id", root)
    ann = ivf_query_topk(
        emb, load_ivf_index(spark, root), "vec_id", "embedding",
        k=5, n_probe=4, scorer="arrow",
    )
    return _topk_recall_certificate(emb, ann, IVF_TOPK_RECALL_FLOOR)


@query("ivf_insert_topk_recall", oracle=_TOPK_EXACT_COUNT_SQL)
def ivf_insert_topk_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-checked recall bound for the INCREMENTAL IVF maintenance
    path (operators/similarity.py ivf_insert): the quantizer is trained
    on HALF the corpus, the other half arrives assign-only — quantized
    to the nearest existing centroid and appended into the partitioned
    inverted file, O(|batch| x cells), the standing corpus never read —
    and the full query batch is served against the extended index. Same
    exact-twin floor as ivf_topk_recall (0.4 vs the 0.25 scan
    fraction); measured 0.55-0.57 on this corpus, i.e. the assign-only
    half costs no recall vs the fully-trained index (0.53-0.57). The
    retrain policy is exercised in-gate: inserting ~100% of the trained
    count must trip ivf_retrain_due (factor 0.5) — the signal that a
    quantizer refresh is due — or the query raises."""
    import tempfile

    from bigdatapipelne_spark.operators.similarity import (
        build_ivf_index,
        ivf_insert,
        ivf_query_topk,
        ivf_retrain_due,
        load_ivf_index,
        save_ivf_index,
    )

    emb = t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < TOPK_RECALL_CAP)
    base = emb.filter(F.col("vec_id") % 2 == 0)
    delta = emb.filter(F.col("vec_id") % 2 == 1)
    ix = build_ivf_index(base, "vec_id", "embedding", n_centroids=16, iters=1)
    root = tempfile.mkdtemp(prefix="ivf_insert_")
    save_ivf_index(ix, "vec_id", root)
    ivf_insert(spark, root, delta, "vec_id", "embedding")
    if not ivf_retrain_due(spark, root):
        raise AssertionError(
            "ivf_retrain_due must trip after inserting ~100% of the "
            "trained row count (factor 0.5)"
        )
    ann = ivf_query_topk(
        emb, load_ivf_index(spark, root), "vec_id", "embedding",
        k=5, n_probe=4, scorer="arrow",
    )
    return _topk_recall_certificate(emb, ann, IVF_TOPK_RECALL_FLOOR)


@query("managed_ivf_insert_recall", oracle=_TOPK_EXACT_COUNT_SQL)
def managed_ivf_insert_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MANAGED IVF ingestion path, gate-certified (round-13 verdict
    #1 — the vector-side twin of near_dup_managed_drain): vectors
    arrive in batches through run_managed_ivf_insert
    (streaming/index_manifest.py) — resolve the manifest pointer,
    assign-only insert into the CURRENT generation, retrain policy —
    with the drift threshold tripping MID-sequence. The bootstrap
    quantizer is trained on a QUARTER of the corpus; three
    quarter-batches arrive managed at factor 1.5, so batch 1 leaves the
    pointer alone (drift 1.0), batch 2 trips the retrain (drift 2.0 —
    the quantizer rebuilds from the inverted file itself and the
    pointer CAS-rotates to generation 2), and batch 3 inserts into the
    ROTATED generation without tripping again (drift 0.33) — the no-op
    path pinned on both sides of the rotation, in-gate. The recall
    certificate is served from the post-retrain pointer
    (current_ivf_index), same exact-twin floor as ivf_topk_recall.
    Reference posture: ddk_app/custom/historical.py:443-449 —
    bookmark-driven orchestration, each invocation resuming from
    durable state, re-expressed for the vector index."""
    import os
    import tempfile

    from bigdatapipelne_spark.operators.similarity import (
        build_ivf_index,
        ivf_query_topk,
        save_ivf_index,
    )
    from bigdatapipelne_spark.streaming.index_manifest import (
        current_index_entry,
        current_ivf_index,
        init_index_manifest,
        run_managed_ivf_insert,
    )

    emb = t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < TOPK_RECALL_CAP)
    base = emb.filter(F.col("vec_id") % 4 == 0)
    ix = build_ivf_index(base, "vec_id", "embedding", n_centroids=16, iters=1)
    tmp = tempfile.mkdtemp(prefix="ivf_mgd_")
    root = os.path.join(tmp, "ivf")
    save_ivf_index(ix, "vec_id", root)
    mroot = os.path.join(tmp, "manifest")
    init_index_manifest(
        spark, mroot, "ivf", "ivf_mgd_ix", root,
        ivf_params={
            "id_col": "vec_id", "vec_col": "embedding",
            "n_centroids": 16, "iters": 1,
        },
    )
    rotated = [
        run_managed_ivf_insert(
            spark, mroot, emb.filter(F.col("vec_id") % 4 == r), factor=1.5
        )["rotated"]
        for r in (1, 2, 3)
    ]
    if rotated != [False, True, False]:
        raise AssertionError(
            f"retrain policy must trip exactly on batch 2, got {rotated}"
        )
    entry = current_index_entry(spark, mroot)
    if entry["generation"] != 2 or entry["path"] == root:
        raise AssertionError(
            "the pointer must serve the post-retrain generation"
        )
    ann = ivf_query_topk(
        emb, current_ivf_index(spark, mroot), "vec_id", "embedding",
        k=5, n_probe=4, scorer="arrow",
    )
    return _topk_recall_certificate(emb, ann, IVF_TOPK_RECALL_FLOOR)


_CHUNKS_ORACLE = f"""
    WITH toks AS (SELECT doc_id, {_SQL_TOKS} AS w FROM documents),
    ch AS (
      SELECT doc_id, unnest(list_transform(
        generate_series(1, greatest(len(w) - 8, 1), 32),
        st -> struct_pack(
          chunk_idx := CAST((st - 1) // 32 AS INTEGER),
          chunk := array_to_string(list_slice(w, st, st + 39), ' '),
          n_tokens := CAST(least(len(w) - st + 1, 40) AS INTEGER))
      )) AS c
      FROM toks
    )
    SELECT doc_id, c.chunk_idx AS chunk_idx, c.chunk AS chunk,
           c.n_tokens AS n_tokens
    FROM ch
"""


@query("doc_chunks", oracle=_CHUNKS_ORACLE)
def doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token chunking (40-token windows, 8-token overlap) — the
    context-window splitter every training pipeline runs before
    tokenization. Pure-codegen form (functions/text.py:chunk_tokens):
    tokenize once into a materialized column, stride+slice per chunk, one
    explode; no shuffle at all."""
    from bigdatapipelne_spark.functions.text import chunk_tokens, tokens

    # widened: single-row-group scan would chunk the corpus on one core
    docs = _widen_narrow_input(t(spark, sf_dir, "documents"))
    return (
        docs.select("doc_id", tokens("text").alias("__toks"))
        .select("doc_id", F.explode(chunk_tokens("__toks", 40, 8)).alias("c"))
        .select("doc_id", "c.chunk_idx", "c.chunk", "c.n_tokens")
    )


@query("doc_chunks_udtf", oracle=_CHUNKS_ORACLE)
def doc_chunks_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME chunking through the Python UDTF extension surface
    (functions/udtfs.py: class -> spark.udtf.register -> LATERAL join) —
    hash-checked against the same oracle as doc_chunks, proving the UDTF
    path end-to-end. Arrow-batched, but still Python per row: the codegen
    twin is the hot-path choice; this certifies the escape hatch."""
    from bigdatapipelne_spark.functions.udtfs import register_udtfs
    from bigdatapipelne_spark.sources.testdata import load_tables

    load_tables(spark, sf_dir)
    register_udtfs(spark)
    return spark.sql(
        "SELECT c.doc_id, c.chunk_idx, c.chunk, c.n_tokens "
        "FROM documents, LATERAL chunk_docs(doc_id, text) c"
    )


_CLUSTERS_ORACLE = f"""
    WITH RECURSIVE toks AS (SELECT doc_id, {_SQL_TOKS} AS w FROM documents),
    sh AS (SELECT doc_id, {_SQL_SHINGLES} AS shingles FROM toks),
    hashed AS (
      SELECT doc_id, md5(s) AS sh
      FROM (SELECT doc_id, unnest(list_distinct(shingles)) AS s FROM sh)
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM hashed GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
      FROM hashed a JOIN hashed b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT id_a, id_b FROM inter
      JOIN sizes sa ON sa.doc_id = id_a
      JOIN sizes sb ON sb.doc_id = id_b
      WHERE CAST(i AS DOUBLE) / CAST(sa.sz + sb.sz - i AS DOUBLE) >= 0.05
    ),
    und AS (
      SELECT id_a AS a, id_b AS b FROM pairs
      UNION
      SELECT id_b, id_a FROM pairs
    ),
    reach(a, b) AS (
      SELECT a, b FROM und
      UNION
      SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a
    )
    SELECT a AS node, LEAST(a, MIN(b)) AS cluster_id
    FROM reach GROUP BY a
    """


@query("near_dup_clusters", oracle=_CLUSTERS_ORACLE)
def near_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The closure step of fuzzy dedup: exact n-gram-Jaccard pair edges →
    connected components → (doc, canonical cluster id). Spark runs
    iterative min-label propagation (operators/graph.py, converges in
    diameter rounds); the oracle computes the same fixpoint with a
    recursive CTE — certifying that the distributed iteration reaches the
    exact transitive closure."""
    from bigdatapipelne_spark.operators.graph import connected_components

    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    pairs = ngram_jaccard_duplicates(docs, "doc_id", "text", n=3, threshold=0.05)
    return connected_components(pairs, "id_a", "id_b")


@query("near_dup_clusters_pd", oracle=_CLUSTERS_ORACLE)
def near_dup_clusters_pd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same closure through the pointer-doubling variant
    (operators/graph.py: connected_components_pd — hook + label(label(n))
    jump, O(log D) rounds): hash-checked against the identical recursive-
    CTE oracle, certifying the scale path reaches the same fixpoint the
    propagation variant does. Long-chain convergence (where propagation
    would need diameter rounds) is property-tested in tests/test_llm_ops."""
    from bigdatapipelne_spark.operators.graph import connected_components_pd

    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    pairs = ngram_jaccard_duplicates(docs, "doc_id", "text", n=3, threshold=0.05)
    return connected_components_pd(pairs, "id_a", "id_b")


@query(
    "deduped_documents",
    oracle=f"""
    WITH RECURSIVE toks AS (SELECT doc_id, {_SQL_TOKS} AS w FROM documents),
    sh AS (SELECT doc_id, {_SQL_SHINGLES} AS shingles FROM toks),
    hashed AS (
      SELECT doc_id, md5(s) AS sh
      FROM (SELECT doc_id, unnest(list_distinct(shingles)) AS s FROM sh)
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM hashed GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
      FROM hashed a JOIN hashed b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT id_a, id_b FROM inter
      JOIN sizes sa ON sa.doc_id = id_a
      JOIN sizes sb ON sb.doc_id = id_b
      WHERE CAST(i AS DOUBLE) / CAST(sa.sz + sb.sz - i AS DOUBLE) >= 0.05
    ),
    und AS (
      SELECT id_a AS a, id_b AS b FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ),
    reach(a, b) AS (
      SELECT a, b FROM und
      UNION SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a
    ),
    clusters AS (
      SELECT a AS node, LEAST(a, MIN(b)) AS cluster_id FROM reach GROUP BY a
    )
    SELECT d.doc_id, d.lang, d.n_chars
    FROM documents d LEFT JOIN clusters c ON d.doc_id = c.node
    WHERE c.node IS NULL OR c.cluster_id = d.doc_id
    """,
)
def deduped_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END fuzzy dedup: pair mining → connected components → keep
    one canonical document per cluster (the cluster's minimum id) plus
    every unpaired document — the actual corpus-shrinking step a training
    pipeline ships. Composition of ngram_jaccard_duplicates +
    connected_components + an anti-join-style filter."""
    from bigdatapipelne_spark.operators.graph import connected_components

    docs = t(spark, sf_dir, "documents")
    pairs = ngram_jaccard_duplicates(
        docs.select("doc_id", "text"), "doc_id", "text", n=3, threshold=0.05
    )
    clusters = connected_components(pairs, "id_a", "id_b")
    return (
        docs.join(clusters, docs.doc_id == clusters.node, "left")
        .filter(F.col("node").isNull() | (F.col("cluster_id") == F.col("doc_id")))
        .select("doc_id", "lang", "n_chars")
    )


# Shared CTE prefix: ngram-Jaccard pair mining -> recursive-CTE transitive
# closure (the exact clusters deduped_documents/near_dup_clusters use).
_DEDUP_CLUSTERS_CTE = f"""
    WITH RECURSIVE toks AS (SELECT doc_id, {{toks}} AS w FROM documents),
    sh AS (SELECT doc_id, {{shingles}} AS shingles FROM toks),
    hashed AS (
      SELECT doc_id, md5(s) AS sh
      FROM (SELECT doc_id, unnest(list_distinct(shingles)) AS s FROM sh)
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM hashed GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
      FROM hashed a JOIN hashed b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT id_a, id_b FROM inter
      JOIN sizes sa ON sa.doc_id = id_a
      JOIN sizes sb ON sb.doc_id = id_b
      WHERE CAST(i AS DOUBLE) / CAST(sa.sz + sb.sz - i AS DOUBLE) >= 0.05
    ),
    und AS (
      SELECT id_a AS a, id_b AS b FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ),
    reach(a, b) AS (
      SELECT a, b FROM und
      UNION SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a
    ),
    clusters AS (
      SELECT a AS node, LEAST(a, MIN(b)) AS cluster_id FROM reach GROUP BY a
    )
"""

# Per-document composite quality, exactly as doc_quality certifies it
# (stopword ratio and punctuation ratio halves), null-coalesced to 0 so
# ranking order is engine-independent for empty/degenerate texts.
_QUALITY_EXPR_SQL = f"""
      COALESCE(
        (CASE WHEN len({_SQL_TOKS}) > 0 THEN
           CAST(len(list_filter({_SQL_TOKS},
                x -> list_contains({_SQL_STOPWORD_LIST}, x))) AS DOUBLE)
           / CAST(len({_SQL_TOKS}) AS DOUBLE) END) * 0.5
        + (1.0 - (CASE WHEN length(text) > 0 THEN
             CAST(length(regexp_replace(lower(text), '[a-z0-9\\s]', '', 'g'))
                  AS DOUBLE)
             / CAST(length(text) AS DOUBLE) END)) * 0.5,
        0.0)
"""


@query(
    "deduped_best_quality",
    oracle=_DEDUP_CLUSTERS_CTE.format(toks=_SQL_TOKS, shingles=_SQL_SHINGLES)
    + f""",
    scored AS (
      SELECT d.doc_id, d.lang, d.n_chars,
             {_QUALITY_EXPR_SQL} AS quality,
             COALESCE(c.cluster_id, d.doc_id) AS ck
      FROM documents d LEFT JOIN clusters c ON d.doc_id = c.node
    ),
    ranked AS (
      SELECT doc_id, lang, n_chars, quality,
             row_number() OVER (PARTITION BY ck
                                ORDER BY quality DESC, doc_id) AS rnk
      FROM scored
    )
    SELECT doc_id, lang, n_chars, quality FROM ranked WHERE rnk = 1
    """,
)
def deduped_best_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy dedup keeping the BEST document per near-dup cluster instead
    of the minimum id: pair mining → connected components → rank each
    cluster by composite quality (ties to the lower doc_id) and keep rank
    1, plus every unpaired document. The representative choice is what a
    real training pipeline ships (drop the low-quality mirror, keep the
    clean original); quality equality across engines is already certified
    by doc_quality, so the oracle re-derives the identical ranking."""
    from bigdatapipelne_spark.operators.graph import connected_components

    docs = _widen_narrow_input(t(spark, sf_dir, "documents"))
    pairs = ngram_jaccard_duplicates(
        docs.select("doc_id", "text"), "doc_id", "text", n=3, threshold=0.05
    )
    clusters = connected_components(pairs, "id_a", "id_b")
    from bigdatapipelne_spark.functions.text import (
        quality_from_ratios,
        stopword_ratio_from_tokens,
    )

    # Tokenize ONCE per row (the doc_quality pattern): the inline
    # quality_score re-runs the split/filter tokenize per consuming
    # expression (no CSE across interpreted HOFs) — measured 28s of the
    # 33s sf10 cell on this query. Stacked projections keep the token
    # array a real column; same operands -> same doubles, oracle
    # unchanged. Text is dropped before anything shuffles.
    base = docs.join(clusters, docs.doc_id == clusters.node, "left").select(
        "doc_id", "lang", "n_chars", "cluster_id", "text",
        tokens("text").alias("__toks"),
    )
    scored = base.select(
        "doc_id", "lang", "n_chars", "cluster_id",
        F.coalesce(
            quality_from_ratios(
                stopword_ratio_from_tokens("__toks"), punct_ratio("text")
            ),
            F.lit(0.0),
        ).alias("quality"),
    )
    # Only CLUSTERED documents need the rank-1 window (clusters are a tiny
    # fraction of the corpus); an unpaired document is trivially rank 1 in
    # its own singleton partition, so it passes through scan-side instead
    # of riding a full-corpus window shuffle+sort. Same rows either way.
    unpaired = scored.filter(F.col("cluster_id").isNull())
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc("quality"), F.asc("doc_id")
    )
    best = (
        scored.filter(F.col("cluster_id").isNotNull())
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") == 1)
    )
    cols = ["doc_id", "lang", "n_chars", "quality"]
    return unpaired.select(*cols).unionByName(best.select(*cols))


# Budget constant for the gated selection query: ~half the sf0.01 corpus
# by tokens, so `selected` is a discriminating boolean at every SF.
_CORPUS_TOKEN_BUDGET = 15_000


@query(
    "corpus_budget_select",
    oracle=f"""
    WITH q AS (
      SELECT doc_id,
             CAST(len({_SQL_TOKS}) AS BIGINT) AS n_tokens,
             {_QUALITY_EXPR_SQL} AS score
      FROM documents
    ),
    c AS (
      SELECT doc_id, n_tokens, score,
             CAST(SUM(n_tokens) OVER (
               ORDER BY score DESC, doc_id
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
      FROM q
    )
    SELECT doc_id, n_tokens, score, cum_tokens,
           cum_tokens <= {_CORPUS_TOKEN_BUDGET} AS selected
    FROM c
    """,
)
def corpus_budget_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget corpus selection (operators/selection.py:
    budget_select): walk documents best-quality-first and keep each while
    the running token total fits the budget — the "which docs make the
    training cut" step. The global cumulative sum runs as a two-pass
    distributed prefix sum (range partition → per-partition subtotals →
    broadcast offsets → per-partition windows), never a single-task
    global window; the oracle is the one-window SQL equivalent."""
    from bigdatapipelne_spark.operators.selection import budget_select
    from bigdatapipelne_spark.functions.text import (
        quality_from_ratios,
        stopword_ratio_from_tokens,
    )

    base = _widen_narrow_input(t(spark, sf_dir, "documents")).select(
        "doc_id", "text", tokens("text").alias("toks")
    )
    docs = base.select(
        "doc_id",
        F.size("toks").alias("n_toks"),
        F.coalesce(
            quality_from_ratios(
                stopword_ratio_from_tokens("toks"), punct_ratio("text")
            ),
            F.lit(0.0),
        ).alias("q"),
    )
    return budget_select(
        docs, "doc_id", "n_toks", "q", budget=_CORPUS_TOKEN_BUDGET
    )


@query(
    "docs_sample_fraction",
    oracle="""
    SELECT doc_id, lang, source
    FROM documents
    WHERE CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
               AS BIGINT) / 4294967296.0
          < CASE lang WHEN 'en' THEN 0.5 WHEN 'de' THEN 0.25
                      WHEN 'zh' THEN 0.1 ELSE 0.05 END
    """,
)
def docs_sample_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified Bernoulli sampling with a deterministic md5 coin
    (operators/selection.py: sample_fraction_per_group): per-language keep
    fractions, reproducible on any engine/cluster-size — unlike sampleBy,
    whose RNG stream depends on partitioning. Filter evaluates in the scan
    stage (no shuffle); the oracle replays the identical hash arithmetic."""
    from bigdatapipelne_spark.operators.selection import sample_fraction_per_group

    docs = t(spark, sf_dir, "documents")
    return sample_fraction_per_group(
        docs, "doc_id", "lang",
        {"en": 0.5, "de": 0.25, "zh": 0.1},
        default_fraction=0.05,
    ).select("doc_id", "lang", "source")


# Target mixture for the gated rebalance query: two overweighted sources,
# sixteen at a uniform remainder, two dropped (share 0) — exercises the
# binding-group, downsample, keep-all and drop paths at once.
_MIX_SHARES = {"src0": 0.30, "src1": 0.15}
_MIX_SHARES.update({f"src{i}": 0.55 / 16 for i in range(2, 18)})

_MIX_CASE_SQL = "CASE source " + " ".join(
    f"WHEN '{g}' THEN CAST({s!r} AS DOUBLE)" for g, s in sorted(_MIX_SHARES.items())
) + " ELSE CAST(0.0 AS DOUBLE) END"


@query(
    "mixture_rebalanced",
    oracle=f"""
    WITH counts AS (
      SELECT source, COUNT(*) AS n, {_MIX_CASE_SQL} AS s
      FROM documents GROUP BY source
    ),
    reach AS (SELECT MIN(n / s) AS c FROM counts WHERE s > 0),
    fr AS (
      SELECT source, n,
             CASE WHEN s > 0
                  THEN LEAST(CAST(1.0 AS DOUBLE), s * reach.c / n)
                  ELSE CAST(0.0 AS DOUBLE) END AS kf
      FROM counts, reach
    ),
    kept AS (
      SELECT d.source, COUNT(*) AS n_kept
      FROM documents d JOIN fr ON d.source = fr.source
      WHERE CAST(('0x' || substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))
                 AS BIGINT) / 4294967296.0 < fr.kf
      GROUP BY d.source
    )
    SELECT fr.source, CAST(fr.n AS BIGINT) AS n_docs,
           COALESCE(CAST(kept.n_kept AS BIGINT), 0) AS n_kept,
           round(fr.kf, 6) AS keep_fraction
    FROM fr LEFT JOIN kept ON fr.source = kept.source
    """,
)
def mixture_rebalanced(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture rebalancing (operators/selection.py:
    mixture_fractions + the deterministic md5 coin): compute the largest
    corpus reachable at a target per-source mixture without upsampling
    (C = min n(g)/share(g)), downsample over-represented sources to it,
    drop unlisted ones. Selection stays full-precision; keep_fraction is
    rounded only for emission (ln/round discipline as bm25_search).
    Summary row per source: n_docs, n_kept, keep_fraction."""
    from bigdatapipelne_spark.operators.selection import (
        mixture_fractions,
        uniform_hash,
    )

    docs = t(spark, sf_dir, "documents")
    fr = mixture_fractions(docs, "source", _MIX_SHARES)
    kept = (
        docs.join(F.broadcast(fr.select("source", "keep_fraction")), "source")
        .filter(uniform_hash("doc_id") < F.col("keep_fraction"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )
    return (
        fr.join(kept, "source", "left")
        .select(
            "source",
            F.col("n_rows").alias("n_docs"),
            F.coalesce(F.col("n_kept"), F.lit(0)).alias("n_kept"),
            F.round("keep_fraction", 6).alias("keep_fraction"),
        )
    )


@query(
    "doc_char_entropy",
    oracle="""
    WITH chars AS (
      SELECT doc_id,
             unnest(list_transform(generate_series(1, length(text)),
                                   i -> substring(text, i, 1))) AS ch
      FROM documents
    ),
    freq AS (
      SELECT doc_id, ch, COUNT(*) AS c FROM chars GROUP BY doc_id, ch
    ),
    tot AS (SELECT doc_id, SUM(c) AS n FROM freq GROUP BY doc_id)
    SELECT f.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_distinct_chars,
           round(-SUM((c / n) * log2(c / n)), 6) AS entropy
    FROM freq f JOIN tot t ON f.doc_id = t.doc_id
    GROUP BY f.doc_id
    """,
)
def doc_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level Shannon entropy per document — the classic cheap
    gibberish/repetition signal (low entropy = repeated runs, high =
    random noise; natural language sits in a band). One narrow shuffle of
    (doc_id, char) rows with map-side partial aggregation collapsing each
    partition's counts pre-shuffle. log2-derived doubles are rounded to
    6 dp for emission (JVM-vs-libm ln differs by 1 ulp on ~4% of inputs);
    nothing ranks on the rounded value. Input widened: the per-char
    explode otherwise runs on the single-row-group scan's one partition
    (round-6 sf10 rehearsal, 25x)."""
    docs = _widen_narrow_input(t(spark, sf_dir, "documents"))
    freq = (
        docs.select("doc_id", F.explode(F.split(F.col("text"), "")).alias("ch"))
        .filter(F.col("ch") != "")
        .groupBy("doc_id", "ch")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tot = freq.groupBy("doc_id").agg(F.sum("c").alias("n"))
    p = F.col("c") / F.col("n")
    return (
        freq.join(tot, "doc_id")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_distinct_chars"),
            F.round(-F.sum(p * F.log2(p)), 6).alias("entropy"),
        )
    )


def _dsir_oracle(k: int, n_buckets: int) -> str:
    """DuckDB replay of operators/importance.py exactly: same tokens, same
    real-bigrams-only rule, same md5->BIGINT bucket hash (bit-equal conv
    idiom), same add-one smoothing over the full bucket domain, same
    sum(n * logratio) with 6 dp rounding before the (score DESC, doc_id)
    rank."""
    return f"""
    WITH toks AS (
      SELECT doc_id, lang = 'en' AS is_tgt, {_SQL_TOKS} AS w FROM documents
    ),
    feats AS (
      SELECT doc_id, is_tgt, unnest(w) AS f FROM toks
      UNION ALL
      SELECT doc_id, is_tgt,
             unnest(CASE WHEN len(w) >= 2
                    THEN list_transform(generate_series(1, len(w) - 1),
                                        i -> w[i] || ' ' || w[i + 1])
                    ELSE [] END) AS f
      FROM toks
    ),
    cells AS (
      SELECT doc_id, is_tgt,
             CAST(concat('0x', substr(md5(f), 1, 15)) AS BIGINT) % {n_buckets}
               AS bucket
      FROM feats
    ),
    doc_cells AS (
      SELECT doc_id, is_tgt, bucket, COUNT(*) AS n
      FROM cells GROUP BY doc_id, is_tgt, bucket
    ),
    raw AS (SELECT bucket, SUM(n) AS n_raw FROM doc_cells GROUP BY bucket),
    tgt AS (SELECT bucket, SUM(n) AS n_tgt FROM doc_cells WHERE is_tgt GROUP BY bucket),
    tots AS (
      SELECT (SELECT SUM(n) FROM doc_cells) AS tot_raw,
             (SELECT SUM(n) FROM doc_cells WHERE is_tgt) AS tot_tgt
    ),
    lr AS (
      SELECT r.bucket,
             ln((COALESCE(t.n_tgt, 0) + 1.0) / (tots.tot_tgt + {n_buckets}.0))
           - ln((r.n_raw + 1.0) / (tots.tot_raw + {n_buckets}.0)) AS logratio
      FROM raw r LEFT JOIN tgt t USING (bucket), tots
    ),
    scored AS (
      SELECT doc_id, ROUND(SUM(n * logratio), 6) AS dsir_score
      FROM doc_cells JOIN lr USING (bucket)
      GROUP BY doc_id
    )
    SELECT doc_id, dsir_score FROM scored
    ORDER BY dsir_score DESC, doc_id LIMIT {k}
    """


DSIR_SELECT_K = 100


@query("dsir_selected", oracle=_dsir_oracle(DSIR_SELECT_K, 4096))
def dsir_selected(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data selection (operators/importance.py, Xie et al. 2023,
    arXiv:2302.03169): hashed unigram+bigram bag-of-ngrams models for a
    TARGET sample (here the English subset — the 'look like the target
    distribution' selector) vs the raw corpus; each document scored by
    its log importance weight and the top-k kept deterministically
    ((rounded score DESC, doc_id) — TakeOrdered, never a global sort).
    Text never shuffles: documents reduce to (id, bucket) count cells;
    both distributions are <= n_buckets rows and the log-ratio table
    broadcasts. The oracle replays the identical hashed pipeline in SQL
    (the cross-engine md5->BIGINT idiom), so the hash match certifies the
    operator end to end."""
    from bigdatapipelne_spark.operators.importance import dsir_select_topk

    docs = t(spark, sf_dir, "documents").withColumn(
        "is_tgt", F.col("lang") == "en"
    )
    return dsir_select_topk(
        docs, "doc_id", "text", "is_tgt", k=DSIR_SELECT_K
    )


@query(
    "dataset_splits",
    oracle="""
    WITH assigned AS (
      SELECT lang,
             CASE
               WHEN CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 2))
                         AS INTEGER) % 10 < 8 THEN 'train'
               WHEN CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 2))
                         AS INTEGER) % 10 < 9 THEN 'val'
               ELSE 'test'
             END AS split
      FROM documents
    )
    SELECT split, lang, COUNT(*) AS n_docs
    FROM assigned GROUP BY split, lang
    """,
)
def dataset_splits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment (80/10/10) by hashing the
    document id — the split is a pure function of the key, so it is stable
    across runs, cluster sizes, and engines (no RNG state to ship), and any
    engine can re-derive membership. Count matrix per (split, lang)."""
    docs = t(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2), 16, 10)
        .cast("int") % 10
    )
    split = (
        F.when(bucket < 8, "train").when(bucket < 9, "val").otherwise("test")
    )
    return (
        docs.select("lang", split.alias("split"))
        .groupBy("split", "lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


@query(
    "tfidf_top_terms",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest({_SQL_TOKS}) AS term FROM documents
    ),
    tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term
    ),
    df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
      SELECT doc_id, tf.term AS term, tf, df,
             ROUND(CAST(tf AS DOUBLE)
               * ln(CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE)), 6) AS score
      FROM tf JOIN df USING (term) CROSS JOIN n
    ),
    ranked AS (
      SELECT doc_id, term, tf, df, score,
             row_number() OVER (
               PARTITION BY doc_id ORDER BY score DESC, term
             ) AS rnk
      FROM scored
    )
    SELECT doc_id, term, tf, df, score, CAST(rnk AS INTEGER) AS rank
    FROM ranked WHERE rnk <= 3
    """,
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document TF-IDF top-3 terms — the classic corpus-statistics
    weighting a training-data pipeline uses for keyword extraction and
    quality filters. score = tf * ln(N / df) with the engine's shared
    whitespace tokenizer (functions/text.py: tokens).

    Scale shape: explode -> (doc, term) count collapses map-side (partial
    agg) before one shuffle; the document-frequency table is a second, much
    smaller agg over (term); joining df back onto tf shuffles on term only
    if AQE declines to broadcast the vocabulary (at 100 TB a vocab table of
    ~1e7 terms is a few hundred MB — sort-merge is the right fallback, no
    hint pinned). The corpus size N rides along as a 1-row broadcast. The
    top-3 window re-shuffles on doc_id once. ln() is evaluated on identical
    (tf, df, N) integers in both engines, and ties (equal tf, df) break on
    the term itself, so rank is engine-stable. Input widened: the
    single-row-group testdata scan would otherwise tokenize the whole
    corpus on one core (round-6 sf10 rehearsal)."""
    docs = _widen_narrow_input(t(spark, sf_dir, "documents"))
    tf = (
        docs.select("doc_id", F.explode(tokens("text")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(df, "term")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "score",
            F.round(
                F.col("tf").cast("double")
                * F.log(
                    F.col("n_docs").cast("double") / F.col("df").cast("double")
                ),
                6,
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), "term")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("doc_id", "term", "tf", "df", "score", "rank")
    )


_DECON_ORACLE = f"""
    WITH toks AS (SELECT doc_id, {_SQL_TOKS} AS w FROM documents),
    sh AS (SELECT doc_id, {_SQL_SHINGLES} AS shingles FROM toks),
    hashed AS (
      SELECT doc_id, md5(s) AS sh
      FROM (SELECT doc_id, unnest(list_distinct(shingles)) AS s FROM sh)
    ),
    bench AS (SELECT * FROM hashed WHERE doc_id < 25),
    corpus AS (SELECT * FROM hashed WHERE doc_id >= 25),
    bsz AS (SELECT doc_id, COUNT(*) AS bsz FROM bench GROUP BY doc_id),
    inter AS (
      SELECT c.doc_id AS corpus_id, b.doc_id AS bench_id, COUNT(*) AS i
      FROM corpus c JOIN bench b USING (sh) GROUP BY 1, 2
    )
    SELECT corpus_id, bench_id,
           CAST(i AS DOUBLE) / CAST(bsz AS DOUBLE) AS containment
    FROM inter JOIN bsz ON bsz.doc_id = bench_id
    WHERE CAST(i AS DOUBLE) / CAST(bsz AS DOUBLE) >= 0.15
    """


@query("decontaminated_overlap", oracle=_DECON_ORACLE)
def decontaminated_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (operators/dedup.py: decontaminate): docs
    0-24 stand in for an eval set; flag the rest of the corpus where trigram
    CONTAINMENT of a benchmark doc reaches 0.15. Containment, not Jaccard —
    a training doc that swallows a whole eval item scores 1.0 even when the
    doc is much longer (the sf0.01 corpus has exactly one such full-embed
    pair). The shingle-hash equi-join touches only benchmark shingles, so
    at corpus scale it degenerates to a broadcast semi-join."""
    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    return decontaminate(
        docs.filter(F.col("doc_id") >= 25),
        docs.filter(F.col("doc_id") < 25),
        "doc_id",
        "text",
        n=3,
        threshold=0.15,
    )


@query("decontaminated_overlap_stream_drain", oracle=_DECON_ORACLE)
def decontaminated_overlap_stream_drain(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The third streaming standing-index member (after the exact and
    MinHash dedup drains): benchmark decontamination run INSIDE a
    streaming consumer (streaming/dedup_stream.py
    run_decontaminate_stream) — the corpus arrives as three ordered
    micro-batches, each probed against the persisted BUCKETED
    BenchmarkIndex (read in place — the zero-index-shuffle property is
    asserted STRUCTURALLY per batch: no shuffle Exchange fed purely by
    index scans, so batch-side plan growth can never misfire it; the
    stream aborts on violation). No ledger: the benchmark suite is
    static by definition.

    Stream == batch equivalence, certified by the SAME oracle as
    decontaminated_overlap: containment is a pure function of one corpus
    document and the index, so the per-batch union over any partition of
    the corpus equals the one-shot probe row-for-row."""
    import os
    import tempfile

    from bigdatapipelne_spark.operators.dedup import (
        build_benchmark_index,
        save_benchmark_index,
    )
    from bigdatapipelne_spark.streaming.dedup_stream import (
        run_decontaminate_stream,
    )
    from bigdatapipelne_spark.streaming.scd import stage_ordered_files

    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") >= 25)
    bench = docs.filter(F.col("doc_id") < 25)

    _sweep_leaked_index_tables(spark, "bm_ixs_r_", rm_parent=True)
    root = tempfile.mkdtemp(prefix="bm_sindex_")
    name = (
        f"bm_ixs_r_{os.getpid()}_"
        f"{os.path.basename(root).removeprefix('bm_sindex_')}"
    )
    bm_ix = build_benchmark_index(bench, "doc_id", "text")
    save_benchmark_index(bm_ix, name, root)
    # the persisted tables are the probe source from here on; drop the
    # build's checkpoint blocks instead of leaking them until driver GC
    release_checkpoint(bm_ix.shingles)

    tmp = tempfile.mkdtemp(prefix="decon_stream_")
    staging = os.path.join(tmp, "staging")
    stage_ordered_files(
        [corpus.filter(F.col("doc_id") % 3 == r) for r in range(3)], staging
    )
    return run_decontaminate_stream(
        spark, staging, name, os.path.join(tmp, "out"), threshold=0.15
    )


_DECON_MANAGED_ORACLE = f"""
    WITH toks AS (SELECT doc_id, {_SQL_TOKS} AS w FROM documents),
    sh AS (SELECT doc_id, {_SQL_SHINGLES} AS shingles FROM toks),
    hashed AS (
      SELECT doc_id, md5(s) AS sh
      FROM (SELECT doc_id, unnest(list_distinct(shingles)) AS s FROM sh)
    ),
    bsz AS (
      SELECT doc_id, COUNT(*) AS bsz FROM hashed
      WHERE doc_id < 25 GROUP BY doc_id
    ),
    inter AS (
      SELECT c.doc_id AS corpus_id, b.doc_id AS bench_id, COUNT(*) AS i
      FROM hashed c JOIN hashed b USING (sh)
      WHERE c.doc_id >= 25 AND (
        (c.doc_id % 2 = 0 AND b.doc_id < 12) OR
        (c.doc_id % 2 = 1 AND b.doc_id >= 12 AND b.doc_id < 25))
      GROUP BY 1, 2
    )
    SELECT corpus_id, bench_id,
           CAST(i AS DOUBLE) / CAST(bsz AS DOUBLE) AS containment
    FROM inter JOIN bsz ON bsz.doc_id = bench_id
    WHERE CAST(i AS DOUBLE) / CAST(bsz AS DOUBLE) >= 0.15
    """


@query("decon_managed_drain", oracle=_DECON_MANAGED_ORACLE)
def decon_managed_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SELF-OPERATING form of decontaminated_overlap_stream_drain
    (round-13 verdict #5 — the benchmark manifest's gate): the suite
    lives under the standing-index MANIFEST's numbered-generation
    pointer (streaming/index_manifest.py kind='benchmark'), the drain
    resolves it per invocation, and the ROTATION step is a
    suite-version REBUILD (``benchmark_refresh`` — a new eval release
    is an operator event, not a size threshold). Invocation 1 drains
    the even-id corpus half against suite v1 (docs 0-11) and its
    sink-compaction policy fires in-gate (batch-count threshold 0 —
    the compacted read must be value-neutral under the hash);
    ``benchmark_refresh`` then builds suite v2 (docs 12-24) as the next
    token+pid+host-named sibling generation with the init-recorded
    shingle width and CAS-advances the pointer; invocation 2 RESUMES
    the same checkpoint, resolves the rotated pointer, and probes v2
    with the odd-id half. The emitted union — even-half pairs vs v1
    plus odd-half pairs vs v2 — is exactly the rolling semantics a
    training pipeline wants (each batch decontaminated against the
    suite current at its time), and the oracle pins it pair-for-pair."""
    import os
    import tempfile

    from bigdatapipelne_spark.operators.dedup import (
        build_benchmark_index,
        save_benchmark_index,
    )
    from bigdatapipelne_spark.streaming.index_manifest import (
        benchmark_refresh,
        init_index_manifest,
        run_managed_decontaminate_drain,
    )
    from bigdatapipelne_spark.streaming.scd import (
        stage_one_more_file,
        stage_ordered_files,
    )

    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") >= 25)
    v1 = docs.filter(F.col("doc_id") < 12)
    v2 = docs.filter((F.col("doc_id") >= 12) & (F.col("doc_id") < 25))

    _sweep_leaked_index_tables(spark, "bm_ixm_r_", rm_parent=True)
    root = tempfile.mkdtemp(prefix="bm_mindex_")
    tag = os.path.basename(root).removeprefix("bm_mindex_")
    name = f"bm_ixm_r_{os.getpid()}_{tag}"
    bm_ix = build_benchmark_index(v1, "doc_id", "text")
    save_benchmark_index(bm_ix, name, root)
    release_checkpoint(bm_ix.shingles)

    tmp = tempfile.mkdtemp(prefix="bm_mgd_stream_")
    mroot = os.path.join(tmp, "manifest")
    init_index_manifest(
        spark, mroot, "benchmark", name, root,
        # the bootstrap's OWN bucket count (save_benchmark_index default)
        # — init introspects the saved table and raises on a mismatch,
        # so a refresh can never silently change the physical layout
        n_buckets=8,
        bench_params={"id_col": "doc_id", "text_col": "text", "n": 3},
    )
    staging = os.path.join(tmp, "staging")
    out = os.path.join(tmp, "out")
    stage_ordered_files([corpus.filter(F.col("doc_id") % 2 == 0)], staging)
    run_managed_decontaminate_drain(
        spark, staging, mroot, out, threshold=0.15, compact_after_batches=0
    )
    benchmark_refresh(spark, mroot, v2)
    stage_one_more_file(corpus.filter(F.col("doc_id") % 2 == 1), staging)
    return run_managed_decontaminate_drain(
        spark, staging, mroot, out, threshold=0.15
    )


@query(
    "pii_redaction",
    oracle=r"""
    WITH aug AS (
      SELECT doc_id,
             text || ' contact user' || CAST(doc_id AS VARCHAR)
                  || '@example.com or call +1 555 '
                  || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                  || ' now' AS text
      FROM documents
    )
    SELECT doc_id,
           regexp_replace(
             regexp_replace(
               text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
               '<EMAIL>', 'g'),
             '\+?[0-9][0-9()\-. ]{6,}[0-9]', '<PHONE>', 'g') AS redacted
    FROM aug
    """,
)
def pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text-side PII scrub (functions/text.py: redact_pii). The synthetic
    corpus contains no PII, so each doc is first augmented with a
    deterministic email + phone derived from its id (same construction in
    the oracle) — the redaction must then strip exactly those spans.
    Two codegen regexp_replace passes; the only exchange is the
    conditional narrow-input widening (round-6 sf10 rehearsal: the regex
    passes ran one-core on the single-row-group scan, 45x)."""
    docs = _widen_narrow_input(t(spark, sf_dir, "documents"))
    aug = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or call +1 555 "),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            F.lit(" now"),
        ).alias("text"),
    )
    return aug.select("doc_id", redact_pii("text").alias("redacted"))


@query(
    "doc_repetition",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest({_SQL_TOKS}) AS term FROM documents
    ),
    tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term
    )
    SELECT doc_id,
           CAST(SUM(tf) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS DOUBLE) / CAST(SUM(tf) AS DOUBLE) AS distinct_ratio,
           CAST(MAX(tf) AS DOUBLE) / CAST(SUM(tf) AS DOUBLE) AS top_token_ratio,
           CAST(MAX(tf) AS DOUBLE) / CAST(SUM(tf) AS DOUBLE) > 0.12
             AS repetitive
    FROM tf GROUP BY doc_id
    """,
)
def doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-based quality signals (Gopher/C4-style filters): per-doc
    type-token ratio and top-unigram mass, plus the boolean filter verdict.
    One explode + two stacked aggregations, both collapsing map-side; the
    ratios are int/int double divisions (engine-determinism rules)."""
    docs = _widen_narrow_input(t(spark, sf_dir, "documents"))
    tf = (
        docs.select("doc_id", F.explode(tokens("text")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    top_ratio = F.max("tf").cast("double") / F.sum("tf").cast("double")
    return tf.groupBy("doc_id").agg(
        F.sum("tf").cast("bigint").alias("n_tokens"),
        (F.count(F.lit(1)).cast("double") / F.sum("tf").cast("double")).alias(
            "distinct_ratio"
        ),
        top_ratio.alias("top_token_ratio"),
        (top_ratio > 0.12).alias("repetitive"),
    )


@query(
    "stratified_sample",
    oracle="""
    SELECT doc_id, lang
    FROM (
      SELECT doc_id, lang,
             CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 2))
                  AS INTEGER) % 10 AS bucket
      FROM documents
    )
    WHERE (lang = 'en' AND bucket < 2) OR (lang <> 'en' AND bucket < 5)
    """,
)
def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: keep 20% of English docs and 50%
    of everything else (rebalancing the en-heavy corpus), membership a pure
    function of md5(doc_id) — stable across runs, partitionings, and
    engines, and invertible for audits (same md5-bucket trick as
    dataset_splits). Zero shuffles: a filter on a codegen expression."""
    docs = t(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2), 16, 10)
        .cast("int") % 10
    )
    keep = F.when(F.col("lang") == "en", bucket < 2).otherwise(bucket < 5)
    return docs.select("doc_id", "lang").filter(keep)


@query(
    "embedding_quantized",
    oracle=f"""
    WITH scaled AS (
      SELECT vec_id, embedding,
             list_max(list_transform(embedding,
               x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS scale
      FROM embeddings
    ), dq AS (
      SELECT vec_id, scale, embedding,
             list_transform(embedding,
               x -> CAST(CAST(round(CAST(x AS DOUBLE) / scale) AS TINYINT)
                    AS DOUBLE) * scale) AS d
      FROM scaled
    )
    SELECT vec_id, scale,
           CASE WHEN scale = 0 THEN 1.0 ELSE
             {_SQL_DOT.format(a='embedding', b='d')} /
             ({_SQL_NORM.format(a='embedding')} * {_SQL_NORM.format(a='d')})
           END AS cos_recon,
           list_max(list_transform(generate_series(1, len(embedding)),
             i -> abs(CAST(embedding[i] AS DOUBLE) - d[i]))) AS max_abs_err
    FROM dq
    """,
)
def embedding_quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric per-vector int8 quantization (functions/vectors.py:
    int8_scale/quantize_int8/dequantize_int8) — the 4x storage compression
    an embedding store runs before writing 100 TB of float32 vectors —
    certified by reconstruction: per-vector scale, cosine(original,
    dequantized) and max absolute element error all hash-match the oracle.
    Scale and the quantized array are materialized as real columns BEFORE
    the element lambdas reference them (no CSE across lambda boundaries —
    inlining int8_scale would re-run the array_max per element)."""
    from bigdatapipelne_spark.functions.vectors import (
        cosine_similarity,
        dequantize_int8,
        int8_scale,
        quantize_int8,
    )

    emb = _widen_narrow_input(
        t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    )
    scaled = emb.withColumn("scale", int8_scale("embedding"))
    dq = scaled.withColumn(
        "d", dequantize_int8(quantize_int8("embedding", "scale"), "scale")
    )
    return dq.select(
        "vec_id",
        "scale",
        F.when(F.col("scale") == 0, F.lit(1.0))
        .otherwise(cosine_similarity("embedding", "d"))
        .alias("cos_recon"),
        F.array_max(
            F.zip_with(
                "embedding", "d", lambda a, b: F.abs(a.cast("double") - b)
            )
        ).alias("max_abs_err"),
    )


@query(
    "docs_sample_per_group",
    oracle="""
    SELECT doc_id, lang, source, sample_rank
    FROM (
      SELECT doc_id, lang, source,
             CAST(row_number() OVER (
               PARTITION BY lang, source
               ORDER BY md5('corpus-v1:' || CAST(doc_id AS VARCHAR)), doc_id
             ) AS BIGINT) AS sample_rank
      FROM documents
    )
    WHERE sample_rank <= 5
    """,
)
def docs_sample_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-count deterministic sampling: 5 docs per (lang, source) drawn
    by keyed hash (operators/sampling.py: sample_k_per_group) — the
    \"fixed examples per stratum\" draw an eval-set builder needs, stable
    across cluster size and reruns. Runs the salted two-stage top-k (the
    skew-safe plan); the oracle is the naive single-sort form, so the
    hash match also certifies stage-decomposition equivalence on real
    data."""
    from bigdatapipelne_spark.operators.sampling import sample_k_per_group

    docs = t(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    return sample_k_per_group(
        docs, ["lang", "source"], "doc_id", k=5, seed="corpus-v1"
    )


_BM25_TERMS = ["join", "hash", "stream", "filter", "batch"]


def _bm25_oracle(terms: list[str], k: int) -> str:
    tf_cols = ",\n             ".join(
        f"CAST(len(list_filter(w, x -> x = '{t}')) AS DOUBLE) AS tf{i}"
        for i, t in enumerate(terms)
    )
    df_cols = ",\n             ".join(
        f"CAST(SUM(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df{i}"
        for i in range(len(terms))
    )
    term_scores = "\n           + ".join(
        f"(ln(1.0 + (N - df{i} + 0.5) / (df{i} + 0.5))"
        f" * (tf{i} * (1.2 + 1.0))"
        f" / (tf{i} + 1.2 * (1.0 - 0.75 + 0.75 * dl / (CAST(sumdl AS DOUBLE) / N))))"
        for i in range(len(terms))
    )
    return f"""
    WITH toks AS (
      SELECT doc_id, {_SQL_TOKS} AS w FROM documents
    ), tf AS (
      SELECT doc_id, CAST(len(w) AS DOUBLE) AS dl,
             {tf_cols}
      FROM toks
    ), stats AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS N,
             SUM(CAST(dl AS BIGINT)) AS sumdl,
             {df_cols}
      FROM tf
    ), scored AS (
      SELECT doc_id,
           {term_scores} AS s
      FROM tf, stats
    )
    SELECT doc_id, round(s, 6) AS score,
           CAST(row_number() OVER (ORDER BY s DESC, doc_id) AS BIGINT) AS rank
    FROM scored WHERE s > 0
    ORDER BY s DESC, doc_id LIMIT {k}
    """


@query("bm25_search", oracle=_bm25_oracle(_BM25_TERMS, 25))
def bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 keyword retrieval over the corpus (operators/search.py:
    bm25_topk) — the relevance scorer a curation pipeline uses for
    topical filtering and eval retrieval. For a fixed term list the whole
    thing is codegen expression work + one global-stats broadcast; the
    corpus is never shuffled, top-k is a TakeOrdered. Score addition is
    an explicit left-to-right chain over the term list so a distributed
    run hash-matches the single-threaded oracle; emitted scores are
    rounded to 6 dp to absorb the cross-engine ln() ulp."""
    from bigdatapipelne_spark.operators.search import bm25_topk

    # widened: the per-term tf expressions otherwise evaluate one-core on
    # the narrow scan (51.2x at sf10)
    docs = _widen_narrow_input(t(spark, sf_dir, "documents"))
    return bm25_topk(docs, "doc_id", "text", _BM25_TERMS, k=25)


# ---------------------------------------------------------------------------
# Sequence packing (training-batch assembly)
# ---------------------------------------------------------------------------

_PACK_SEQ_LEN = 512
_PACK_BUCKETS = 8

_PACK_ORACLE = f"""
    WITH RECURSIVE toks AS (SELECT doc_id, {_SQL_TOKS} AS w FROM documents),
    lens AS (
      SELECT doc_id,
             LEAST(len(w), {_PACK_SEQ_LEN}) AS n,
             CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 2))
                  AS INTEGER) % {_PACK_BUCKETS} AS bucket
      FROM toks
    ),
    ord AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY doc_id) AS rn
      FROM lens
    ),
    fill(bucket, rn, doc_id, n, acc, seq, off) AS (
      SELECT bucket, rn, doc_id, n, n, 0, 0 FROM ord WHERE rn = 1
      UNION ALL
      SELECT o.bucket, o.rn, o.doc_id, o.n,
             CASE WHEN f.acc + o.n > {_PACK_SEQ_LEN}
                  THEN o.n ELSE f.acc + o.n END,
             CASE WHEN f.acc + o.n > {_PACK_SEQ_LEN}
                  THEN f.seq + 1 ELSE f.seq END,
             CASE WHEN f.acc + o.n > {_PACK_SEQ_LEN}
                  THEN 0 ELSE f.acc END
      FROM fill f JOIN ord o ON o.bucket = f.bucket AND o.rn = f.rn + 1
    )
    SELECT doc_id, bucket,
           CAST(seq AS BIGINT) AS seq_no,
           CAST(n AS BIGINT) AS n_tokens,
           CAST(off AS BIGINT) AS start_off
    FROM fill
    """


@query("packed_sequences", oracle=_PACK_ORACLE)
def packed_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing (operators/packing.py: pack_sequences): every
    document gets a (bucket, seq_no, start_off) slot in a 512-token
    context window via bucketed next-fit. The bucket hash and in-bucket
    order are pure functions of doc_id, so DuckDB re-derives the exact
    layout with a recursive CTE — a hash-match certifies the packing
    algorithm itself, not just row counts. Only (id, length) pairs cross
    the shuffle; buckets pack independently (the 100 TB path: raise
    n_buckets until a bucket's id-list fits a task)."""
    from bigdatapipelne_spark.operators.packing import pack_sequences

    docs = t(spark, sf_dir, "documents")
    sized = docs.select(
        "doc_id", F.size(tokens("text")).cast("long").alias("n_tokens")
    )
    return pack_sequences(
        sized, "doc_id", "n_tokens",
        seq_len=_PACK_SEQ_LEN, n_buckets=_PACK_BUCKETS,
    )


# ---------------------------------------------------------------------------
# End-to-end training-corpus pipeline
# ---------------------------------------------------------------------------

_CORPUS_ORACLE = f"""
    WITH docs2 AS (
      SELECT doc_id, text, lang FROM documents
      UNION ALL
      SELECT doc_id + {_RECRAWL_OFF_1} AS doc_id, text, lang FROM documents
    ),
    base AS (
      SELECT doc_id, text, lang, {_SQL_TOKS} AS toks,
             {_SQL_FINGERPRINT} AS fp
      FROM docs2
    ),
    sig AS (
      SELECT doc_id, lang, fp, toks, len(toks) AS n_tokens,
             CASE WHEN len(toks) > 0 THEN
               CAST(len(list_filter(toks, x -> list_contains({_SQL_STOPWORD_LIST}, x))) AS DOUBLE)
               / CAST(len(toks) AS DOUBLE) END AS sr,
             CASE WHEN length(text) > 0 THEN
               CAST(length(regexp_replace(lower(text), '[a-z0-9\\s]', '', 'g')) AS DOUBLE)
               / CAST(length(text) AS DOUBLE) END AS pr
      FROM base
    ),
    filtered AS (
      SELECT * FROM sig
      WHERE sr * 0.5 + (1.0 - pr) * 0.5 >= 0.53 AND doc_id % {_RECRAWL_OFF_1} >= 25
    ),
    deduped AS (
      SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
        FROM filtered
      ) WHERE rn = 1
    ),
    bench_sh AS (
      SELECT doc_id, {_SQL_SHINGLES} AS shingles
      FROM (SELECT doc_id, {_SQL_TOKS} AS w FROM documents WHERE doc_id < 25)
    ),
    bench_hashed AS (
      SELECT doc_id, md5(s) AS sh
      FROM (SELECT doc_id, unnest(list_distinct(shingles)) AS s FROM bench_sh)
    ),
    corp_sh AS (
      SELECT doc_id, {_SQL_SHINGLES} AS shingles
      FROM (SELECT doc_id, toks AS w FROM deduped)
    ),
    corp_hashed AS (
      SELECT doc_id, md5(s) AS sh
      FROM (SELECT doc_id, unnest(list_distinct(shingles)) AS s FROM corp_sh)
    ),
    bsz AS (SELECT doc_id, COUNT(*) AS bsz FROM bench_hashed GROUP BY doc_id),
    inter AS (
      SELECT c.doc_id AS corpus_id, b.doc_id AS bench_id, COUNT(*) AS i
      FROM corp_hashed c JOIN bench_hashed b USING (sh) GROUP BY 1, 2
    ),
    contam AS (
      SELECT DISTINCT corpus_id FROM inter
      JOIN bsz ON bsz.doc_id = bench_id
      WHERE CAST(i AS DOUBLE) / CAST(bsz AS DOUBLE) >= 0.15
    ),
    clean AS (
      SELECT d.* FROM deduped d
      LEFT JOIN contam ON d.doc_id = contam.corpus_id
      WHERE contam.corpus_id IS NULL
    )
    SELECT CASE
             WHEN CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 2))
                       AS INTEGER) % 10 < 8 THEN 'train'
             WHEN CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 2))
                       AS INTEGER) % 10 < 9 THEN 'val'
             ELSE 'test'
           END AS split,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
    FROM clean GROUP BY 1
    """


@query("corpus_pipeline", oracle=_CORPUS_ORACLE)
def corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END training-corpus build, the whole curation chain in one
    lazy plan: quality filter (composite stopword/punctuation score) ->
    exact dedup (md5 fingerprint, canonical-min-id survivor) ->
    benchmark decontamination (trigram containment >= 0.15 vs docs 0-24
    as the stand-in eval set) -> deterministic 80/10/10 split -> per-split
    doc/token budget. The corpus is unioned with a re-keyed copy of
    itself (exact_dedup's trick) so the dedup stage genuinely removes
    rows at small SF. Every stage is the already-certified operator —
    this query certifies their COMPOSITION end-to-end against one SQL
    oracle replaying the identical chain. Scale shape: the text column
    never shuffles (dedup moves id+hash, decontamination moves benchmark
    shingle hashes via broadcast-sized semi-join); the only wide exchange
    is the fingerprint groupBy."""
    from bigdatapipelne_spark.operators.dedup import (
        decontaminate,
        exact_dedup_survivors,
    )

    # widen + tokenize-once (round-6 narrow-scan/fusion pattern; identical
    # operands -> identical doubles, oracle unchanged)
    from bigdatapipelne_spark.functions.text import (
        quality_from_ratios,
        stopword_ratio_from_tokens,
    )

    docs = _widen_narrow_input(
        t(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    )
    # Tokenize + score ONCE over the base corpus, then union the ENRICHED
    # frame with its re-keyed copy: the copy shares the text
    # byte-for-byte, so its n_tokens/q are the same doubles by
    # construction — the old text-level union ran the dominant
    # tokenize/quality scan twice (measured 32.7s of the 44.9s sf10
    # chain; union branches share no evaluation, hence the eager
    # checkpoint BEFORE the union).
    base = docs.select(
        "doc_id", "text", tokens("text").alias("__toks")
    ).select(
        "doc_id",
        "text",
        F.size("__toks").cast("long").alias("n_tokens"),
        quality_from_ratios(
            stopword_ratio_from_tokens("__toks"), punct_ratio("text")
        ).alias("q"),
    ).transform(eager_checkpoint)
    enriched = base.unionByName(
        base.withColumn("doc_id", F.col("doc_id") + F.lit(_RECRAWL_OFF_1))
    )
    # Materialize the quality-filtered frame ONCE: it feeds the dedup
    # scan, the canonical join's left side, decontamination and the final
    # anti-join — without the checkpoint Catalyst re-evaluates the whole
    # widen+tokenize+quality subplan per consumer (~4x; the dominant cost
    # of the sf10 cell). Content is deterministic, so truncating lineage
    # is hash-safe (winnowed_pairs precedent).
    filtered = enriched.filter(
        (F.col("q") >= 0.53) & (F.col("doc_id") % _RECRAWL_OFF_1 >= 25)
    ).transform(eager_checkpoint)
    # base's blocks fed only filtered's materialization above — release
    # them so the query holds ONE full-corpus checkpoint, not two.
    # (release_checkpoint, not DataFrame.unpersist: the latter is a
    # verified no-op on checkpoint-backed frames.)
    release_checkpoint(base)
    # Survivor-form dedup (operators/dedup.exact_dedup_survivors): the
    # min-id row of each fingerprint group kept in place via ONE window
    # exchange — the earlier mapping + join-back form re-fingerprinted the
    # checkpoint and shuffled the corpus a second time on doc_id.
    deduped = exact_dedup_survivors(filtered, "doc_id", "text")
    bench = docs.filter(F.col("doc_id") < 25).select("doc_id", "text")
    contam = (
        decontaminate(
            deduped.select("doc_id", "text"), bench, "doc_id", "text",
            n=3, threshold=0.15,
        )
        .select("corpus_id")
        .distinct()
    )
    clean = deduped.join(
        contam, deduped.doc_id == contam.corpus_id, "left_anti"
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2), 16, 10)
        .cast("int") % 10
    )
    split = F.when(bucket < 8, "train").when(bucket < 9, "val").otherwise("test")
    return (
        clean.select(split.alias("split"), "n_tokens")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        )
    )


@query(
    "doc_feature_hash",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_SQL_TOKS} AS w FROM documents),
    exploded AS (SELECT doc_id, unnest(w) AS tok FROM toks),
    bucketed AS (
      SELECT doc_id,
             CAST(('0x' || substring(md5(tok), 1, 8)) AS BIGINT) % 64 AS bucket
      FROM exploded
    )
    SELECT doc_id, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM bucketed GROUP BY doc_id, bucket
    """,
)
def doc_feature_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature hashing (functions/vectors.py: feature_hash_counts): every
    document's tokens mapped into a fixed 64-dim space by md5-bucket —
    the model-free featurizer for clustering/classification over
    unbounded vocabularies. Emitted as sparse (doc_id, bucket, cnt) rows
    (the scale form: <= dim rows per doc cross the shuffle regardless of
    document length); the md5 bucket function is engine-portable, so the
    oracle replays it exactly."""
    from bigdatapipelne_spark.functions.vectors import feature_hash_counts

    # widened: round-6 sf10 rehearsal measured the hashing projection
    # one-core on the narrow scan (58.7x)
    docs = _widen_narrow_input(t(spark, sf_dir, "documents")).select(
        "doc_id", "text"
    )
    return feature_hash_counts(docs, "doc_id", "text", dim=64)


# ---------------------------------------------------------------------------
# Round-4 additions: span-level cross-doc dedup, consecutive-repeat
# collapse, exact distributed heavy hitters, vocabulary coverage, and
# incremental (delta-vs-corpus) dedup.
# ---------------------------------------------------------------------------


@query(
    "chunk_dup_docs",
    oracle=f"""
    WITH tok AS (SELECT doc_id, {_SQL_TOKS} AS w FROM documents),
    chunks AS (
      SELECT doc_id,
             unnest(list_transform(
               generate_series(1, greatest(len(w), 1), 8),
               st -> md5(array_to_string(list_slice(w, st, st + 7), ' ')))) AS h
      FROM tok
    ),
    freq AS (SELECT h, COUNT(DISTINCT doc_id) AS nd FROM chunks GROUP BY h)
    SELECT c.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(SUM(CASE WHEN f.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_chunks,
           round(CAST(SUM(CASE WHEN f.nd >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS dup_fraction
    FROM chunks c JOIN freq f USING (h)
    GROUP BY c.doc_id
    """,
)
def chunk_dup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level cross-document dedup signal (operators/dedup.py
    chunk_duplicate_stats): each document scored by the fraction of its
    non-overlapping 8-token windows that also appear in another document
    — the paragraph-dedup analog of CCNet/RefinedWeb for a single-line
    corpus. Text reduces to (id, window-md5) before any exchange."""
    from bigdatapipelne_spark.operators.dedup import chunk_duplicate_stats

    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    return chunk_duplicate_stats(docs, "doc_id", "text", chunk_size=8)


@query(
    "doc_collapse_repeats",
    oracle=f"""
    WITH tok AS (SELECT doc_id, {_SQL_TOKS} AS w FROM documents),
    coll AS (
      SELECT doc_id, len(w) AS n_tokens,
             list_filter(w, (x, i) -> i = 1 OR x <> w[i-1]) AS c
      FROM tok
    )
    SELECT doc_id,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(len(c) AS BIGINT) AS n_collapsed,
           md5(array_to_string(c, ' ')) AS collapsed_fp
    FROM coll
    """,
)
def doc_collapse_repeats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consecutive-repeat collapse (functions/text.py
    collapse_repeat_tokens): "batch batch batch" -> "batch" — the
    de-repetition cleanup for stutter runs in scraped/generated text.
    Pure codegen (indexed filter lambda), zero shuffle; the md5 of the
    collapsed sequence certifies exact order-preserving reconstruction
    against the oracle's 1-based-index mirror."""
    from bigdatapipelne_spark.functions.text import collapse_repeat_tokens

    docs = _widen_narrow_input(t(spark, sf_dir, "documents")).select(
        "doc_id", tokens("text").alias("w")
    )
    return docs.withColumn("c", collapse_repeat_tokens("w")).select(
        "doc_id",
        F.size("w").cast("bigint").alias("n_tokens"),
        F.size("c").cast("bigint").alias("n_collapsed"),
        F.md5(F.concat_ws(" ", "c")).alias("collapsed_fp"),
    )


@query(
    "frequent_tokens",
    oracle=f"""
    WITH tok AS (SELECT {_SQL_TOKS} AS w FROM documents),
    ex AS (SELECT unnest(w) AS token FROM tok),
    tot AS (SELECT COUNT(*) AS total FROM ex)
    SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM ex, tot GROUP BY token, total
    HAVING COUNT(*) * 30 > total
    """,
)
def frequent_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distributed heavy hitters (operators/frequency.py
    frequent_items): tokens with count * 30 > corpus total, found via
    per-partition Misra-Gries summaries whose union provably supersets
    the answer, then exact-recounted — never shuffling the full token
    distribution (the oracle is the naive full groupBy, so the hash
    match certifies the MG path IS the exact answer). Capacity 30 sits
    below this corpus's 31-token vocabulary, so the summaries genuinely
    decrement and the integer threshold stays discriminative."""
    from bigdatapipelne_spark.operators.frequency import frequent_items

    # widened: per-partition MG summaries degenerate to ONE summary (and
    # one core of tokenizing) on a single-row-group scan
    docs = _widen_narrow_input(t(spark, sf_dir, "documents"))
    return frequent_items(docs, tokens("text"), capacity=30)


@query(
    "vocab_coverage",
    oracle=f"""
    WITH tok AS (SELECT {_SQL_TOKS} AS w FROM documents),
    ex AS (SELECT unnest(w) AS token FROM tok),
    freq AS (SELECT token, COUNT(*) AS cnt FROM ex GROUP BY token),
    tot AS (SELECT SUM(cnt) AS total FROM freq),
    ranked AS (
      SELECT row_number() OVER (ORDER BY cnt DESC, token ASC) AS rank,
             SUM(cnt) OVER (ORDER BY cnt DESC, token ASC
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum
      FROM freq
    )
    SELECT v.vocab_size,
           CAST(MAX(rank) AS BIGINT) AS covered_types,
           CAST(MAX(cum) AS BIGINT) AS covered_tokens,
           round(CAST(MAX(cum) AS DOUBLE) / CAST(MAX(total) AS DOUBLE), 6)
             AS coverage
    FROM ranked JOIN (VALUES (5), (15), (50)) AS v(vocab_size)
      ON rank <= v.vocab_size
    CROSS JOIN tot
    GROUP BY v.vocab_size
    """,
)
def vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-V vocabulary coverage (operators/frequency.py vocab_coverage)
    for V in (5, 15, 50) — the tokenizer-design curve "how much of the
    corpus do V types cover?". V=50 exceeds this corpus's vocabulary, so
    the clamp path (covered_types < V) is certified too. The only
    single-partition window ranks a frame bounded by max(V) rows, never
    by the corpus."""
    from bigdatapipelne_spark.operators.frequency import vocab_coverage as vc

    docs = t(spark, sf_dir, "documents")
    return vc(docs, tokens("text"), [5, 15, 50], spark=spark)


# _RECRAWL_OFF_1/_RECRAWL_OFF_2 are defined at module top (shared by the
# exact_dedup / corpus_pipeline synthetic copies and every incremental
# re-crawl delta below).

_INCR_DEDUP_ORACLE = f"""
    WITH corpus AS (SELECT doc_id, text FROM documents WHERE source <> 'src3'),
    delta AS (
      SELECT doc_id, text FROM documents WHERE source = 'src3'
      UNION ALL
      SELECT doc_id + {_RECRAWL_OFF_1} AS doc_id, text FROM corpus
      WHERE doc_id % 11 = 0
      UNION ALL
      SELECT doc_id + {_RECRAWL_OFF_2} AS doc_id, text FROM documents
      WHERE source = 'src3' AND doc_id % 13 = 0
    ),
    dk AS (SELECT doc_id, {_SQL_FINGERPRINT} AS fp FROM delta),
    firsts AS (SELECT fp, MIN(doc_id) AS first_id FROM dk GROUP BY fp),
    cfp AS (SELECT DISTINCT {_SQL_FINGERPRINT} AS fp FROM corpus)
    SELECT d.doc_id,
           CASE WHEN c.fp IS NOT NULL THEN 'dup_in_corpus'
                WHEN d.doc_id <> f.first_id THEN 'dup_in_delta'
                ELSE 'new' END AS status
    FROM dk d
    JOIN firsts f USING (fp)
    LEFT JOIN cfp c USING (fp)
    """


def _incr_dedup_delta(docs: DataFrame):
    corpus = docs.filter(F.col("source") != "src3").select("doc_id", "text")
    src3 = docs.filter(F.col("source") == "src3").select("doc_id", "text")
    delta = (
        src3
        .unionByName(
            corpus.filter(F.col("doc_id") % 11 == 0).withColumn(
                "doc_id", F.col("doc_id") + F.lit(_RECRAWL_OFF_1)
            )
        )
        .unionByName(
            src3.filter(F.col("doc_id") % 13 == 0).withColumn(
                "doc_id", F.col("doc_id") + F.lit(_RECRAWL_OFF_2)
            )
        )
    )
    return delta, corpus


def _incr_near_dup_delta(docs: DataFrame):
    """The incremental_near_dup gate queries' delta/corpus construction,
    shared with bench_probe.py so the probe-only benchmark times exactly
    the gate's workload."""
    corpus = docs.filter(F.col("source") != "src3").select("doc_id", "text")
    delta = (
        docs.filter(F.col("source") == "src3")
        .select("doc_id", "text")
        .unionByName(
            corpus.filter(F.col("doc_id") % 17 == 0).select(
                (F.col("doc_id") + F.lit(_RECRAWL_OFF_1)).alias("doc_id"),
                F.concat(F.col("text"), F.lit(" drift")).alias("text"),
            )
        )
    )
    return delta, corpus


@query("incremental_dedup", oracle=_INCR_DEDUP_ORACLE)
def incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-vs-corpus exact dedup (operators/dedup.py
    incremental_exact_duplicates) — the steady-state dedup of a
    continuously-crawled pipeline. The raw table has no exact duplicates
    at small SF, so the delta is built deterministically: the src3 slice
    plus re-keyed "re-crawl" copies of every 11th corpus document
    (exercising dup_in_corpus) and every 13th src3 document (exercising
    dup_in_delta); the oracle replays the identical construction. Only
    fingerprints cross the wire on either side."""
    from bigdatapipelne_spark.operators.dedup import incremental_exact_duplicates

    docs = t(spark, sf_dir, "documents").select("doc_id", "text", "source")
    delta, corpus = _incr_dedup_delta(docs)
    return incremental_exact_duplicates(delta, corpus, "doc_id", "text")


def _pid_alive(pid: int) -> bool:
    from bigdatapipelne_spark.sources.io import pid_alive

    return pid_alive(pid)


def _sweep_leaked_index_tables(
    spark: SparkSession, prefix: str, rm_parent: bool = False
) -> None:
    """Drop standing-index catalog tables leaked by PRIOR runs only.

    Run-unique index tables embed their creator's PID
    (``{prefix}{pid}_{suffix}``); the sweep reclaims a table only when
    that PID is this process or no longer alive, so two driver sessions
    sharing a warehouse concurrently never delete each other's live index
    mid-query. Names with no parseable PID (pre-r9 leftovers) are treated
    as orphans. ``rm_parent`` removes the location's parent dir (the
    NearDupIndex keeps its three tables under one root).

    Contract: HOST-LOCAL by design. These are gate-query EPHEMERA — the
    tables exist only for the duration of one registered query against
    one driver session's warehouse, never as shared standing state — so
    pid liveness on this host is the right reclamation gate. The
    production standing-index surface (streaming/index_manifest.py) is
    where multi-host sweeps matter, and its generation names carry the
    creator's host tag for exactly that reason."""
    import os
    import shutil

    for tbl in spark.catalog.listTables():
        if not tbl.name.startswith(prefix) or tbl.isTemporary:
            continue
        pid_s = tbl.name.removeprefix(prefix).split("_", 1)[0]
        if pid_s.isdigit() and int(pid_s) != os.getpid() and _pid_alive(int(pid_s)):
            continue  # a live concurrent session owns this index
        loc = next(
            (
                r.data_type
                for r in spark.sql(f"DESCRIBE FORMATTED {tbl.name}").collect()
                if r.col_name == "Location"
            ),
            None,
        )
        spark.sql(f"DROP TABLE IF EXISTS {tbl.name}")
        if loc and loc.startswith("file:"):
            p = loc.removeprefix("file:")
            shutil.rmtree(
                os.path.dirname(p) if rm_parent else p, ignore_errors=True
            )


@query("incremental_dedup_indexed", oracle=_INCR_DEDUP_ORACLE)
def incremental_dedup_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The persisted standing-index form of incremental_dedup (the exact
    twin of incremental_near_dup_indexed): the corpus's distinct
    fingerprint index (operators/dedup.py build_fingerprint_index) is
    persisted through save_fingerprint_index — a catalog table BUCKETED
    and sorted on __fp, the production layout whose probe joins read the
    index IN PLACE (no index-side exchange; plan-asserted in
    tests/test_bucketing.py) — reloaded, and the batch is classified
    against it with NO corpus frame: zero corpus text and zero standing-
    index shuffle in the per-batch plan. Same oracle as incremental_dedup
    (result-identical by construction)."""
    import os
    import tempfile

    from bigdatapipelne_spark.operators.dedup import (
        build_fingerprint_index,
        incremental_exact_duplicates,
        load_fingerprint_index,
        save_fingerprint_index,
    )

    docs = t(spark, sf_dir, "documents").select("doc_id", "text", "source")
    delta, corpus = _incr_dedup_delta(docs)
    # run-unique (PID-scoped) catalog name + sweep of dead runs' leaked
    # entries — the session catalog/warehouse is shared
    _sweep_leaked_index_tables(spark, "fp_ix_r_")
    path = tempfile.mkdtemp(prefix="fp_index_")
    name = (
        f"fp_ix_r_{os.getpid()}_"
        f"{os.path.basename(path).removeprefix('fp_index_')}"
    )
    save_fingerprint_index(
        build_fingerprint_index(corpus, "doc_id", "text"), name, path
    )
    return incremental_exact_duplicates(
        delta, None, "doc_id", "text",
        corpus_index=load_fingerprint_index(spark, name),
    )


@query("incremental_dedup_stream_drain", oracle=_INCR_DEDUP_ORACLE)
def incremental_dedup_stream_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production shape of standing-index dedup for a crawl pipeline
    (round-10 verdict #3): the batch probe of incremental_dedup_indexed
    run INSIDE a streaming consumer — foreachBatch over an arriving
    document stream (three ordered micro-batches via staged files +
    maxFilesPerTrigger=1), each batch probed against the standing
    BUCKETED fingerprint index (read in place — the zero-index-shuffle
    plan property is asserted per batch, the stream aborts if the index
    ever re-exchanges) plus a run-scoped admitted-fingerprint ledger that
    the batch appends to after classification (the per-batch index
    maintenance a real pipeline does), classified rows appended to a
    parquet sink.

    Stream == batch equivalence, certified by the SAME oracle as
    incremental_dedup: the micro-batches ascend by doc_id (originals,
    then +2^40 corpus re-crawls, then +2^41 delta re-crawls), so the
    first batch containing a fingerprint also holds its global-minimum
    id; a later batch's hit on the ledger is then exactly the one-shot
    dup_in_delta, a corpus-index hit exactly dup_in_corpus, and the
    within-batch window min equals the global min — statuses match the
    one-shot classification row-for-row."""
    import os
    import tempfile

    from bigdatapipelne_spark.operators.dedup import (
        build_fingerprint_index,
        save_fingerprint_index,
    )
    from bigdatapipelne_spark.streaming.scd import stage_ordered_files

    docs = t(spark, sf_dir, "documents").select("doc_id", "text", "source")
    delta, corpus = _incr_dedup_delta(docs)

    _sweep_leaked_index_tables(spark, "fp_ixs_r_")
    path = tempfile.mkdtemp(prefix="fp_sindex_")
    name = (
        f"fp_ixs_r_{os.getpid()}_"
        f"{os.path.basename(path).removeprefix('fp_sindex_')}"
    )
    save_fingerprint_index(
        build_fingerprint_index(corpus, "doc_id", "text"), name, path
    )

    tmp = tempfile.mkdtemp(prefix="incr_stream_")
    staging = os.path.join(tmp, "staging")
    stage_ordered_files(
        [
            delta.filter(F.col("doc_id") < _RECRAWL_OFF_1),
            delta.filter(
                (F.col("doc_id") >= _RECRAWL_OFF_1)
                & (F.col("doc_id") < _RECRAWL_OFF_2)
            ),
            delta.filter(F.col("doc_id") >= _RECRAWL_OFF_2),
        ],
        staging,
    )
    from bigdatapipelne_spark.streaming.dedup_stream import (
        run_exact_probe_stream,
    )

    return run_exact_probe_stream(spark, staging, name, os.path.join(tmp, "out"))


_FOLD_DEDUP_ORACLE = f"""
    WITH corpus0 AS (SELECT doc_id, text FROM documents WHERE source <> 'src3'),
    src3 AS (SELECT doc_id, text FROM documents WHERE source = 'src3'),
    p1 AS (
      SELECT doc_id, text FROM src3
      UNION ALL
      SELECT doc_id + {_RECRAWL_OFF_1} AS doc_id, text FROM corpus0
      WHERE doc_id % 11 = 0
    ),
    p2 AS (
      SELECT doc_id + {_RECRAWL_OFF_2} AS doc_id, text FROM src3
      WHERE doc_id % 13 = 0
    ),
    dk1 AS (SELECT doc_id, {_SQL_FINGERPRINT} AS fp FROM p1),
    firsts1 AS (SELECT fp, MIN(doc_id) AS first_id FROM dk1 GROUP BY fp),
    cfp0 AS (SELECT DISTINCT {_SQL_FINGERPRINT} AS fp FROM corpus0),
    out1 AS (
      SELECT d.doc_id,
             CASE WHEN c.fp IS NOT NULL THEN 'dup_in_corpus'
                  WHEN d.doc_id <> f.first_id THEN 'dup_in_delta'
                  ELSE 'new' END AS status
      FROM dk1 d JOIN firsts1 f USING (fp) LEFT JOIN cfp0 c USING (fp)
    ),
    dk2 AS (SELECT doc_id, {_SQL_FINGERPRINT} AS fp FROM p2),
    firsts2 AS (SELECT fp, MIN(doc_id) AS first_id FROM dk2 GROUP BY fp),
    folded AS (
      SELECT DISTINCT fp FROM (
        SELECT fp FROM cfp0 UNION ALL SELECT fp FROM dk1
      )
    ),
    out2 AS (
      SELECT d.doc_id,
             CASE WHEN c.fp IS NOT NULL THEN 'dup_in_corpus'
                  WHEN d.doc_id <> f.first_id THEN 'dup_in_delta'
                  ELSE 'new' END AS status
      FROM dk2 d JOIN firsts2 f USING (fp) LEFT JOIN folded c USING (fp)
    )
    SELECT doc_id, status FROM out1
    UNION ALL
    SELECT doc_id, status FROM out2
    """


@query("incremental_dedup_fold_drain", oracle=_FOLD_DEDUP_ORACLE)
def incremental_dedup_fold_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The exact-dedup twin of near_dup_fold_drain: ledger compaction on
    the fingerprint drain. Phase 1 drains the src3 slice and the +2^40
    corpus re-crawls against the standing bucketed fingerprint index,
    admitting newly-seen fingerprints into the run ledger;
    fold_seen_into_fingerprint_index then compacts ledger + index (exact
    at every scale — the index IS the distinct-fingerprint set) and
    deletes the ledger; phase 2 resumes the SAME checkpoint with the
    +2^41 src3 re-crawls against the FOLDED index. Those re-crawls
    classify ``dup_in_corpus`` — without the fold they'd be
    ``dup_in_delta`` ledger hits, so the status column itself witnesses
    the promotion under the hash gate. The oracle replays both phases
    (phase-2 corpus = corpus ∪ phase-1 delta); per-phase stream == batch
    equivalence holds for the same ascending-doc_id reason as
    incremental_dedup_stream_drain."""
    import os
    import tempfile

    from bigdatapipelne_spark.operators.dedup import (
        build_fingerprint_index,
        save_fingerprint_index,
    )
    from bigdatapipelne_spark.streaming.dedup_stream import (
        fold_seen_into_fingerprint_index,
        run_exact_probe_stream,
    )
    from bigdatapipelne_spark.streaming.scd import (
        stage_one_more_file,
        stage_ordered_files,
    )

    docs = t(spark, sf_dir, "documents").select("doc_id", "text", "source")
    delta, corpus = _incr_dedup_delta(docs)

    _sweep_leaked_index_tables(spark, "fp_ixfd_r_")
    path = tempfile.mkdtemp(prefix="fp_findex_")
    tag = os.path.basename(path).removeprefix("fp_findex_")
    name = f"fp_ixfd_r_{os.getpid()}_{tag}"
    save_fingerprint_index(
        build_fingerprint_index(corpus, "doc_id", "text"), name, path
    )

    tmp = tempfile.mkdtemp(prefix="incr_fold_stream_")
    staging = os.path.join(tmp, "staging")
    out = os.path.join(tmp, "out")
    stage_ordered_files(
        [
            delta.filter(F.col("doc_id") < _RECRAWL_OFF_1),
            delta.filter(
                (F.col("doc_id") >= _RECRAWL_OFF_1)
                & (F.col("doc_id") < _RECRAWL_OFF_2)
            ),
        ],
        staging,
    )
    run_exact_probe_stream(spark, staging, name, out)

    folded = f"fp_ixfd_r_{os.getpid()}_{tag}f"
    # sibling dir, NOT inside the live table's root: save_fingerprint_index
    # uses `path` directly as the bucketed table location, so a nested
    # 'folded/' subdir would sit inside the original table's directory and
    # a later recursive listing of that table could silently double-read
    # the same-schema folded files (round-12 advisor finding).
    fold_seen_into_fingerprint_index(
        spark, name, os.path.join(out, "seen"), folded, path + "_folded",
    )
    stage_one_more_file(
        delta.filter(F.col("doc_id") >= _RECRAWL_OFF_2), staging
    )
    return run_exact_probe_stream(spark, staging, folded, out)


@query(
    "weighted_docs_sample",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, text, {_SQL_TOKS} AS toks FROM documents
    ),
    sig AS (
      SELECT doc_id,
             CASE WHEN len(toks) > 0 THEN
               CAST(len(list_filter(toks, x -> list_contains({_SQL_STOPWORD_LIST}, x))) AS DOUBLE)
               / CAST(len(toks) AS DOUBLE) END AS sr,
             CASE WHEN length(text) > 0 THEN
               CAST(length(regexp_replace(lower(text), '[a-z0-9\\s]', '', 'g')) AS DOUBLE)
               / CAST(length(text) AS DOUBLE) END AS pr
      FROM base
    ),
    wt AS (SELECT doc_id, sr * 0.5 + (1.0 - pr) * 0.5 AS weight FROM sig),
    keyed AS (
      SELECT doc_id, weight,
             pow(CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                      AS BIGINT) / 4294967296.0,
                 1.0 / weight) AS k
      FROM wt WHERE weight > 0
    )
    SELECT doc_id, weight, round(k, 6) AS sample_key
    FROM keyed ORDER BY k DESC, doc_id ASC LIMIT 50
    """,
)
def weighted_docs_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic quality-weighted sampling without replacement
    (operators/sampling.py weighted_sample_topk, Efraimidis-Spirakis
    A-ES): 50 documents drawn with probability proportional to their
    quality score, as a pure function of doc_id — no RNG state, same
    sample on any cluster size or engine. Top-k via TakeOrdered, never a
    global sort; the oracle replays weight, draw key, and ranking."""
    from bigdatapipelne_spark.operators.sampling import weighted_sample_topk
    from bigdatapipelne_spark.functions.text import (
        quality_from_ratios,
        stopword_ratio_from_tokens,
    )

    # widen + tokenize-once (identical operands -> identical doubles)
    base = _widen_narrow_input(t(spark, sf_dir, "documents")).select(
        "doc_id", "text", tokens("text").alias("toks")
    )
    docs = base.select(
        "doc_id",
        quality_from_ratios(
            stopword_ratio_from_tokens("toks"), punct_ratio("text")
        ).alias("q"),
    )
    return weighted_sample_topk(docs, "doc_id", "q", k=50)


@query(
    "doc_unigram_logprob",
    oracle=f"""
    WITH tok AS (SELECT doc_id, {_SQL_TOKS} AS w FROM documents),
    pdt AS (SELECT doc_id, unnest(w) AS token FROM tok),
    cnts AS (
      SELECT doc_id, token, COUNT(*) AS cnt_dt FROM pdt GROUP BY doc_id, token
    ),
    freq AS (SELECT token, SUM(cnt_dt) AS cnt_t FROM cnts GROUP BY token),
    tot AS (SELECT SUM(cnt_t) AS total FROM freq),
    model AS (
      SELECT token, ln(CAST(cnt_t AS DOUBLE) / CAST(total AS DOUBLE)) AS lp
      FROM freq, tot
    ),
    sc AS (
      SELECT c.doc_id, SUM(cnt_dt) AS n_tokens,
             round(SUM(cnt_dt * lp) / SUM(cnt_dt), 6) AS mean_logprob
      FROM cnts c JOIN model USING (token) GROUP BY c.doc_id
    )
    SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, mean_logprob,
           round(exp(-mean_logprob), 6) AS ppl_proxy
    FROM sc
    """,
)
def doc_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-proxy quality scoring (operators/frequency.py
    unigram_logprob): each document's mean token log-probability under
    the corpus's own unigram LM — the no-external-artifact form of
    CCNet's KenLM filter. The model is the vocabulary-sized frequency
    table; documents reduce to (doc, token, count) cells before the
    token join. ln sums round to 6 dp (doc_char_entropy precedent);
    ppl exponentiates the already-rounded mean."""
    from bigdatapipelne_spark.operators.frequency import unigram_logprob

    docs = _widen_narrow_input(t(spark, sf_dir, "documents"))
    return unigram_logprob(docs, "doc_id", tokens("text"))


def _mh_band_rows_sql(src: str, idc: str) -> str:
    # DuckDB replay of operators/dedup.py lsh_bands over a signature CTE.
    return "\n        UNION ALL\n        ".join(
        f"SELECT {idc}, {b} AS band, "
        f"md5(CAST(mh{b * ROWS_PER_BAND} AS VARCHAR) || '|' || "
        f"CAST(mh{b * ROWS_PER_BAND + 1} AS VARCHAR)) AS band_key "
        f"FROM {src}"
        for b in range(BANDS)
    )


def _mh_side_cte(tag: str, idc: str) -> str:
    # One probe side's full CTE chain (tokenize -> shingles -> signatures
    # -> bands -> shingle sets) over an existing ``{tag}0`` (doc_id, text)
    # CTE — shared by the incremental and fold oracles.
    mins = _minhash_mins_sql()
    return f"""
    {tag}_tok AS (SELECT doc_id AS {idc}, {_SQL_TOKS} AS w FROM {tag}0),
    {tag}_sh AS (SELECT {idc}, {_SQL_SHINGLES} AS shingles FROM {tag}_tok),
    {tag}_ex AS (SELECT {idc}, unnest(shingles) AS s FROM {tag}_sh),
    {tag}_sigs AS (
      SELECT {idc},
             {mins}
      FROM {tag}_ex GROUP BY {idc}
    ),
    {tag}_bands AS (
        {_mh_band_rows_sql(f"{tag}_sigs", idc)}
    ),
    {tag}_sets AS (SELECT {idc}, list_distinct(shingles) AS ss FROM {tag}_sh)"""


def _mh_pairs_cte(tag_d: str, tag_c: str, out: str) -> str:
    # Candidate banding join + exact-Jaccard verification between two
    # ``_mh_side_cte`` sides, emitted as CTE ``{out}`` (UNFILTERED —
    # callers apply their threshold in the outer SELECT).
    return f"""
    {out}_cands AS (
      SELECT DISTINCT d.delta_id, c.corpus_id
      FROM {tag_d}_bands d JOIN {tag_c}_bands c
        ON d.band = c.band AND d.band_key = c.band_key
    ),
    {out} AS (
      SELECT delta_id, corpus_id,
             CAST(len(list_intersect(sd.ss, sc.ss)) AS DOUBLE) /
             CAST(len(sd.ss) + len(sc.ss) - len(list_intersect(sd.ss, sc.ss))
                  AS DOUBLE) AS jaccard
      FROM {out}_cands
      JOIN {tag_d}_sets sd USING (delta_id)
      JOIN {tag_c}_sets sc USING (corpus_id)
    )"""


def _incremental_minhash_oracle(threshold: float = 0.5) -> str:
    # Same affine-permutation family as _minhash_oracle (mirrors
    # operators/dedup.py _minhash_exprs — see _minhash_mins_sql); the
    # side/pairs CTE machinery is shared with _fold_minhash_oracle.
    return f"""
    WITH corpus0 AS (SELECT doc_id, text FROM documents WHERE source <> 'src3'),
    delta0 AS (
      SELECT doc_id, text FROM documents WHERE source = 'src3'
      UNION ALL
      SELECT doc_id + {_RECRAWL_OFF_1} AS doc_id, text || ' drift' AS text
      FROM corpus0 WHERE doc_id % 17 = 0
    ),{_mh_side_cte("delta", "delta_id")},{_mh_side_cte("corpus", "corpus_id")},
    {_mh_pairs_cte("delta", "corpus", "scored")}
    SELECT delta_id, corpus_id, jaccard FROM scored WHERE jaccard >= {threshold}
    """


@query("incremental_near_dup_indexed", oracle=_incremental_minhash_oracle())
def incremental_near_dup_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The steady-state twin of incremental_near_dup: the corpus's
    NearDupIndex (operators/dedup.py build_near_dup_index) is PERSISTED
    through save_near_dup_index — three catalog tables bucketed on their
    probe-join keys (bands on band_key, shingles/sizes on corpus_id),
    the production layout whose per-batch probes read the standing index
    IN PLACE (plan-asserted in tests/test_bucketing.py) — reloaded, and
    the probe runs against it with NO corpus frame at all, so the
    per-batch plan reads zero corpus text (asserted in
    tests/test_llm_ops.py). Same oracle as incremental_near_dup: the two
    paths are result-identical by construction, and this gate certifies
    it end-to-end at driver scale."""
    import os
    import tempfile

    from bigdatapipelne_spark.operators.dedup import (
        build_near_dup_index,
        incremental_near_duplicates,
        load_near_dup_index,
        save_near_dup_index,
    )

    docs = t(spark, sf_dir, "documents").select("doc_id", "text", "source")
    delta, corpus = _incr_near_dup_delta(docs)
    # run-unique (PID-scoped) catalog names + sweep of dead runs' leaked
    # entries (shared catalog/warehouse)
    _sweep_leaked_index_tables(spark, "nd_ix_r_", rm_parent=True)
    ix = build_near_dup_index(corpus, "doc_id", "text")
    root = tempfile.mkdtemp(prefix="near_dup_index_")
    name = (
        f"nd_ix_r_{os.getpid()}_"
        f"{os.path.basename(root).removeprefix('near_dup_index_')}"
    )
    save_near_dup_index(ix, name, root)
    release_checkpoint(ix.shingles)
    return incremental_near_duplicates(
        delta, None, "doc_id", "text",
        corpus_index=load_near_dup_index(spark, name),
    )


@query("incremental_near_dup", oracle=_incremental_minhash_oracle())
def incremental_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Steady-state near-dup detection (operators/dedup.py
    incremental_near_duplicates): the arriving batch's MinHash bands
    probe the standing corpus's band index — candidates scale with
    |delta| x bucket occupancy, never |corpus|^2 — then exact trigram
    Jaccard verifies cross-frame over fixed-width hash rows. The delta is
    the src3 slice plus near-copies of every 17th corpus document (text
    plus one appended token, so each re-crawl lands at jaccard ~ 0.95,
    not 1.0); the oracle replays construction, banding, and verification
    exactly."""
    from bigdatapipelne_spark.operators.dedup import incremental_near_duplicates

    docs = t(spark, sf_dir, "documents").select("doc_id", "text", "source")
    delta, corpus = _incr_near_dup_delta(docs)
    return incremental_near_duplicates(delta, corpus, "doc_id", "text")


@query("incremental_near_dup_stream_drain", oracle=_incremental_minhash_oracle())
def incremental_near_dup_stream_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production shape of standing-index NEAR-dup for a crawl
    pipeline — the MinHash twin of incremental_dedup_stream_drain
    (round-10 verdict #1): the probe of incremental_near_dup_indexed run
    INSIDE a streaming consumer (streaming/dedup_stream.py
    run_near_dup_probe_stream) — foreachBatch over three ordered
    micro-batches (staged files + maxFilesPerTrigger=1), each batch
    MinHash-probed against the standing BUCKETED NearDupIndex (read in
    place — the zero-index-shuffle plan property is asserted per batch and
    the stream aborts on violation), then probed against and ADMITTED
    into a run-scoped band/shingle/size ledger (the per-batch index
    maintenance; cross-batch stream-internal pairs land in a side sink
    certified in tests/test_streaming.py).

    Stream == batch equivalence, certified by the SAME oracle as
    incremental_near_dup: a document's standing-index pairs are a pure
    function of its own shingles and the index, independent of which
    micro-batch carries it, so the per-batch union over any partition of
    the delta equals the one-shot probe row-for-row."""
    import os
    import tempfile

    from bigdatapipelne_spark.operators.dedup import (
        build_near_dup_index,
        save_near_dup_index,
    )
    from bigdatapipelne_spark.streaming.dedup_stream import (
        run_near_dup_probe_stream,
    )
    from bigdatapipelne_spark.streaming.scd import stage_ordered_files

    docs = t(spark, sf_dir, "documents").select("doc_id", "text", "source")
    delta, corpus = _incr_near_dup_delta(docs)

    _sweep_leaked_index_tables(spark, "nd_ixs_r_", rm_parent=True)
    root = tempfile.mkdtemp(prefix="nd_sindex_")
    name = (
        f"nd_ixs_r_{os.getpid()}_"
        f"{os.path.basename(root).removeprefix('nd_sindex_')}"
    )
    nd_ix = build_near_dup_index(corpus, "doc_id", "text")
    save_near_dup_index(nd_ix, name, root)
    release_checkpoint(nd_ix.shingles)

    tmp = tempfile.mkdtemp(prefix="incr_nd_stream_")
    staging = os.path.join(tmp, "staging")
    stage_ordered_files(
        [
            delta.filter(
                (F.col("doc_id") < _RECRAWL_OFF_1) & (F.col("doc_id") % 2 == 0)
            ),
            delta.filter(
                (F.col("doc_id") < _RECRAWL_OFF_1) & (F.col("doc_id") % 2 == 1)
            ),
            delta.filter(F.col("doc_id") >= _RECRAWL_OFF_1),
        ],
        staging,
    )
    return run_near_dup_probe_stream(
        spark, staging, name, os.path.join(tmp, "out")
    )


def _fold_minhash_oracle(threshold: float = 0.5) -> str:
    """Two-phase replay for near_dup_fold_drain: phase 1 probes the src3
    half of the delta against the original corpus; between phases the run
    ledger is folded into the standing index, so phase 2's batch probes
    the UNION corpus (original ∪ phase-1 documents) — the +OFF_2 drifted
    copies of every 13th src3 document can only match through the folded
    index, which is what makes the fold observable under the hash gate.
    The gated output is the union of both phases' standing-index pairs."""
    return f"""
    WITH corpusA0 AS (
      SELECT doc_id, text FROM documents WHERE source <> 'src3'
    ),
    h10 AS (SELECT doc_id, text FROM documents WHERE source = 'src3'),
    h20 AS (
      SELECT doc_id + {_RECRAWL_OFF_1} AS doc_id, text || ' drift' AS text
      FROM corpusA0 WHERE doc_id % 17 = 0
      UNION ALL
      SELECT doc_id + {_RECRAWL_OFF_2} AS doc_id, text || ' drift' AS text
      FROM h10 WHERE doc_id % 13 = 0
    ),
    corpusB0 AS (
      SELECT * FROM corpusA0 UNION ALL SELECT * FROM h10
    ),{_mh_side_cte("h1", "delta_id")},{_mh_side_cte("corpusA", "corpus_id")},
    {_mh_side_cte("h2", "delta_id")},{_mh_side_cte("corpusB", "corpus_id")},
    {_mh_pairs_cte("h1", "corpusA", "p1")},
    {_mh_pairs_cte("h2", "corpusB", "p2")}
    SELECT delta_id, corpus_id, jaccard FROM p1 WHERE jaccard >= {threshold}
    UNION ALL
    SELECT delta_id, corpus_id, jaccard FROM p2 WHERE jaccard >= {threshold}
    """


@query("near_dup_fold_drain", oracle=_fold_minhash_oracle())
def near_dup_fold_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ledger compaction certified end-to-end (round-11 verdict #1): the
    streaming near-dup drain runs TWO phases around a mid-stream
    ``fold_ledger_into_index`` (streaming/dedup_stream.py). Phase 1
    drains the src3 half of the delta against the standing index,
    admitting each batch into the run ledger; the fold then compacts
    ledger + index into a fresh ``save_near_dup_index`` layout (band
    index re-derived from the UNION of the shingle tables — exactly the
    ``build_near_dup_index`` derivation, so folded == rebuilt including
    cap semantics) and deletes the ledger; phase 2 resumes the SAME
    checkpoint against the folded index with drifted copies of every
    13th src3 document (+2^41 keys) plus the standard corpus re-crawls
    (+2^40). Those src3 copies can only pair through the folded index —
    their pairs land in the gated corpus_pairs sink ONLY if the fold
    really promoted the admitted documents — and the per-batch plan
    audit (zero index shuffle, all three tables read in place) runs
    against the FOLDED layout, certifying the fold writes the same
    bucketed probe geometry it read. After the drain, the sink's
    per-batch partitions are compacted (compact_batched_sink) and the
    gate reads the compacted layout, pinning compaction as
    value-neutral under the same hash. The oracle replays both phases'
    corpora; stream == batch equivalence holds per phase for the same
    reason as incremental_near_dup_stream_drain."""
    import os
    import tempfile

    from bigdatapipelne_spark.operators.dedup import (
        build_near_dup_index,
        save_near_dup_index,
    )
    from bigdatapipelne_spark.streaming.dedup_stream import (
        _PAIR_SCHEMA,
        _read_batched,
        compact_batched_sink,
        fold_ledger_into_index,
        run_near_dup_probe_stream,
    )
    from bigdatapipelne_spark.streaming.scd import (
        stage_one_more_file,
        stage_ordered_files,
    )

    docs = t(spark, sf_dir, "documents").select("doc_id", "text", "source")
    delta, corpus = _incr_near_dup_delta(docs)
    h1 = delta.filter(F.col("doc_id") < _RECRAWL_OFF_1)
    h2 = delta.filter(F.col("doc_id") >= _RECRAWL_OFF_1).unionByName(
        h1.filter(F.col("doc_id") % 13 == 0).select(
            (F.col("doc_id") + F.lit(_RECRAWL_OFF_2)).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" drift")).alias("text"),
        )
    )

    _sweep_leaked_index_tables(spark, "nd_ixf_r_", rm_parent=True)
    root = tempfile.mkdtemp(prefix="nd_findex_")
    tag = os.path.basename(root).removeprefix("nd_findex_")
    name = f"nd_ixf_r_{os.getpid()}_{tag}"
    nd_ix = build_near_dup_index(corpus, "doc_id", "text")
    save_near_dup_index(nd_ix, name, root)
    release_checkpoint(nd_ix.shingles)

    tmp = tempfile.mkdtemp(prefix="nd_fold_stream_")
    staging = os.path.join(tmp, "staging")
    out = os.path.join(tmp, "out")
    stage_ordered_files(
        [
            h1.filter(F.col("doc_id") % 2 == 0),
            h1.filter(F.col("doc_id") % 2 == 1),
        ],
        staging,
    )
    run_near_dup_probe_stream(spark, staging, name, out)

    folded = f"nd_ixf_r_{os.getpid()}_{tag}f"
    fold_ledger_into_index(
        spark, name, out, folded, os.path.join(root, "folded")
    )
    stage_one_more_file(h2, staging)
    run_near_dup_probe_stream(spark, staging, folded, out)

    compact_batched_sink(spark, os.path.join(out, "corpus_pairs"))
    return _read_batched(spark, os.path.join(out, "corpus_pairs"), _PAIR_SCHEMA)


@query("near_dup_managed_drain", oracle=_fold_minhash_oracle())
def near_dup_managed_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SELF-OPERATING form of near_dup_fold_drain (round-12 verdict
    #1): the same two-phase replay, but NOTHING is threaded by hand — the
    drain resolves "the current index" through the standing-index
    MANIFEST (streaming/index_manifest.py: numbered-generation pointer,
    CAS-advanced), and the FOLD POLICY decides to fold: invocation 1
    drains phase 1's batches and, its ledger over the fold threshold,
    folds, rotates the pointer to generation 2, deletes the consumed
    ledger and compacts the batched sinks; invocation 2 resumes the SAME
    checkpoint, resolves the ROTATED pointer, and probes the folded
    index. The +2^41 drifted src3 copies can only pair through the
    folded generation, so the hash gate certifies the policy-run fold +
    rotation + resume emits the IDENTICAL pair set the manual sequence
    (near_dup_fold_drain) certifies — same oracle, byte for byte.
    Invocation 2 runs the production threshold (no fold due at this
    scale), pinning the policy's no-op path in the same gate."""
    import os
    import tempfile

    from bigdatapipelne_spark.operators.dedup import (
        build_near_dup_index,
        save_near_dup_index,
    )
    from bigdatapipelne_spark.streaming.index_manifest import (
        init_index_manifest,
        run_managed_near_dup_drain,
    )
    from bigdatapipelne_spark.streaming.scd import (
        stage_one_more_file,
        stage_ordered_files,
    )

    docs = t(spark, sf_dir, "documents").select("doc_id", "text", "source")
    delta, corpus = _incr_near_dup_delta(docs)
    h1 = delta.filter(F.col("doc_id") < _RECRAWL_OFF_1)
    h2 = delta.filter(F.col("doc_id") >= _RECRAWL_OFF_1).unionByName(
        h1.filter(F.col("doc_id") % 13 == 0).select(
            (F.col("doc_id") + F.lit(_RECRAWL_OFF_2)).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" drift")).alias("text"),
        )
    )

    _sweep_leaked_index_tables(spark, "nd_ixm_r_", rm_parent=True)
    root = tempfile.mkdtemp(prefix="nd_mindex_")
    tag = os.path.basename(root).removeprefix("nd_mindex_")
    name = f"nd_ixm_r_{os.getpid()}_{tag}"
    nd_ix = build_near_dup_index(corpus, "doc_id", "text")
    save_near_dup_index(nd_ix, name, root)
    release_checkpoint(nd_ix.shingles)

    tmp = tempfile.mkdtemp(prefix="nd_mgd_stream_")
    mroot = os.path.join(tmp, "manifest")
    init_index_manifest(spark, mroot, "near_dup", name, root)
    staging = os.path.join(tmp, "staging")
    out = os.path.join(tmp, "out")
    stage_ordered_files(
        [
            h1.filter(F.col("doc_id") % 2 == 0),
            h1.filter(F.col("doc_id") % 2 == 1),
        ],
        staging,
    )
    run_managed_near_dup_drain(
        spark, staging, mroot, out, fold_threshold_bytes=1
    )
    stage_one_more_file(h2, staging)
    return run_managed_near_dup_drain(spark, staging, mroot, out)


@query("incremental_dedup_managed_drain", oracle=_FOLD_DEDUP_ORACLE)
def incremental_dedup_managed_drain(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The exact-dedup twin of near_dup_managed_drain: the fingerprint
    drain run through the manifest + fold policy. Invocation 1 (fold
    threshold crossed) drains the src3 slice and the +2^40 corpus
    re-crawls, folds the seen-ledger into generation 2 and rotates the
    pointer; invocation 2 resumes the SAME checkpoint against the
    rotated pointer with the +2^41 src3 re-crawls — they classify
    ``dup_in_corpus`` exactly as incremental_dedup_fold_drain's manual
    sequence certifies, under the same two-phase oracle. No index name
    is threaded between invocations by the caller."""
    import os
    import tempfile

    from bigdatapipelne_spark.operators.dedup import (
        build_fingerprint_index,
        save_fingerprint_index,
    )
    from bigdatapipelne_spark.streaming.index_manifest import (
        init_index_manifest,
        run_managed_exact_drain,
    )
    from bigdatapipelne_spark.streaming.scd import (
        stage_one_more_file,
        stage_ordered_files,
    )

    docs = t(spark, sf_dir, "documents").select("doc_id", "text", "source")
    delta, corpus = _incr_dedup_delta(docs)

    _sweep_leaked_index_tables(spark, "fp_ixm_r_")
    path = tempfile.mkdtemp(prefix="fp_mindex_")
    tag = os.path.basename(path).removeprefix("fp_mindex_")
    name = f"fp_ixm_r_{os.getpid()}_{tag}"
    save_fingerprint_index(
        build_fingerprint_index(corpus, "doc_id", "text"), name, path
    )

    tmp = tempfile.mkdtemp(prefix="fp_mgd_stream_")
    mroot = os.path.join(tmp, "manifest")
    init_index_manifest(spark, mroot, "fingerprint", name, path)
    staging = os.path.join(tmp, "staging")
    out = os.path.join(tmp, "out")
    stage_ordered_files(
        [
            delta.filter(F.col("doc_id") < _RECRAWL_OFF_1),
            delta.filter(
                (F.col("doc_id") >= _RECRAWL_OFF_1)
                & (F.col("doc_id") < _RECRAWL_OFF_2)
            ),
        ],
        staging,
    )
    run_managed_exact_drain(spark, staging, mroot, out, fold_threshold_bytes=1)
    stage_one_more_file(
        delta.filter(F.col("doc_id") >= _RECRAWL_OFF_2), staging
    )
    return run_managed_exact_drain(spark, staging, mroot, out)


@query(
    "quality_deciles",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, text, {_SQL_TOKS} AS toks FROM documents
    ),
    sig AS (
      SELECT doc_id, len(toks) AS n_tokens,
             CASE WHEN len(toks) > 0 THEN
               CAST(len(list_filter(toks, x -> list_contains({_SQL_STOPWORD_LIST}, x))) AS DOUBLE)
               / CAST(len(toks) AS DOUBLE) END AS sr,
             CASE WHEN length(text) > 0 THEN
               CAST(length(regexp_replace(lower(text), '[a-z0-9\\s]', '', 'g')) AS DOUBLE)
               / CAST(length(text) AS DOUBLE) END AS pr
      FROM base
    ),
    scored AS (
      SELECT doc_id, n_tokens, sr * 0.5 + (1.0 - pr) * 0.5 AS quality FROM sig
    ),
    ranked AS (
      SELECT doc_id, n_tokens, quality,
             row_number() OVER (ORDER BY quality DESC, doc_id ASC) AS rank,
             COUNT(*) OVER () AS n
      FROM scored
    )
    SELECT CAST(((rank - 1) * 10) // n AS INTEGER) AS decile,
           COUNT(*) AS n_docs,
           round(MIN(quality), 6) AS min_quality,
           round(MAX(quality), 6) AS max_quality,
           CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens
    FROM ranked GROUP BY 1
    """,
)
def quality_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum binning: every document assigned to a quality decile by
    its EXACT global rank — computed with operators/selection.py
    global_rank (range partition -> per-partition counts -> broadcast
    offsets -> parallel in-partition row_number), never a single-task
    global window. The decile is integer arithmetic on (rank, N)
    (((rank-1)*10) div N), so both engines bin identically with no float
    boundary; this is the "sort the corpus by quality, train easy->hard"
    stage of a curriculum pipeline. Per-decile stats round at the
    presentation boundary only."""
    from bigdatapipelne_spark.operators.selection import global_rank
    from bigdatapipelne_spark.functions.text import (
        quality_from_ratios,
        stopword_ratio_from_tokens,
    )

    # widen + tokenize-once (the doc_quality round-6 rewrite): same
    # operands -> same doubles, so rank order and the oracle are unchanged
    base = _widen_narrow_input(t(spark, sf_dir, "documents")).select(
        "doc_id", "text", tokens("text").alias("toks")
    )
    docs = base.select(
        "doc_id",
        F.size("toks").alias("n_tokens"),
        quality_from_ratios(
            stopword_ratio_from_tokens("toks"), punct_ratio("text")
        ).alias("quality"),
    )
    n = docs.count()
    ranked = global_rank(docs, [F.desc("quality"), F.asc("doc_id")])
    return (
        ranked.withColumn(
            "decile", (((F.col("rank") - 1) * 10) / F.lit(n)).cast("int")
        )
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.min("quality"), 6).alias("min_quality"),
            F.round(F.max("quality"), 6).alias("max_quality"),
            F.sum("n_tokens").cast("bigint").alias("sum_tokens"),
        )
    )


IVFPQ_TOPK_RECALL_FLOOR = 0.4  # measured 0.50 both SFs; 0.25 = random scan


@query("embedding_ivfpq")
def embedding_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ top-k (operators/similarity.py ivfpq_topk): coarse IVF
    cells bound candidates, product-quantized ADC (m=8 subspaces x 16
    codes, per-pair cost = 8 table lookups) shortlists them, and only
    the shortlist is re-ranked with exact cosine — the memory/scan
    geometry of a billion-vector index (codes are m bytes per vector at
    rest). Rows-only by design (approximate path); the recall floor is
    hash-certified by ivfpq_topk_recall."""
    from bigdatapipelne_spark.operators.similarity import ivfpq_topk

    emb = t(spark, sf_dir, "embeddings")
    return ivfpq_topk(emb, "vec_id", "embedding", k=3, n_probe=2, iters=1)


@query("ivfpq_topk_recall", oracle=_TOPK_EXACT_COUNT_SQL)
def ivfpq_topk_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-checked recall bound for the IVF-PQ path (16 cells / 4
    probes / 8x-k ADC shortlist): the certificate that the two-level
    quantization (coarse cells + product codes) still beats its 25%
    scan fraction decisively after exact re-ranking."""
    from bigdatapipelne_spark.operators.similarity import ivfpq_topk

    emb = t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < TOPK_RECALL_CAP)
    ann = ivfpq_topk(
        emb, "vec_id", "embedding", k=5, n_centroids=16, n_probe=4, iters=1,
        rerank_factor=8,
    )
    return _topk_recall_certificate(emb, ann, IVFPQ_TOPK_RECALL_FLOOR)


@query(
    "exact_stratified_split",
    oracle="""
    WITH ranked AS (
      SELECT lang,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY md5('split:' || CAST(doc_id AS VARCHAR)), doc_id
             ) AS rnk,
             COUNT(*) OVER (PARTITION BY lang) AS n
      FROM documents
    ),
    assigned AS (
      SELECT lang,
             CASE WHEN rnk * 10 <= n * 8 THEN 'train'
                  WHEN rnk * 10 <= n * 9 THEN 'val'
                  ELSE 'test' END AS split
      FROM ranked
    )
    SELECT split, lang, COUNT(*) AS n_docs
    FROM assigned GROUP BY split, lang
    """,
)
def exact_stratified_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-count stratified train/val/test split: within each stratum
    documents are ranked by a seeded md5 draw (a deterministic uniform
    permutation) and the 80/10/10 boundaries cut at EXACT integer ranks
    (rnk*10 <= n*8 — integer arithmetic, no float boundary), so every
    stratum lands within one document of its target proportion — unlike
    the hash-bucket Bernoulli split (dataset_splits), whose small
    strata drift binomially. The per-stratum window parallelizes across
    strata; a pathologically hot stratum would route through
    operators/selection.py global_rank instead. Emits per (split, lang)
    counts."""
    from pyspark.sql.window import Window

    docs = t(spark, sf_dir, "documents").select("doc_id", "lang")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))),
        F.asc("doc_id"),
    )
    ranked = docs.select(
        "lang",
        F.row_number().over(w).alias("rnk"),
        F.count(F.lit(1)).over(Window.partitionBy("lang")).alias("n"),
    )
    split = (
        F.when(F.col("rnk") * 10 <= F.col("n") * 8, "train")
        .when(F.col("rnk") * 10 <= F.col("n") * 9, "val")
        .otherwise("test")
    )
    return (
        ranked.select("lang", split.alias("split"))
        .groupBy("split", "lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


@query(
    "weighted_sample_per_lang",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, lang, text, {_SQL_TOKS} AS toks FROM documents
    ),
    sig AS (
      SELECT doc_id, lang,
             CASE WHEN len(toks) > 0 THEN
               CAST(len(list_filter(toks, x -> list_contains({_SQL_STOPWORD_LIST}, x))) AS DOUBLE)
               / CAST(len(toks) AS DOUBLE) END AS sr,
             CASE WHEN length(text) > 0 THEN
               CAST(length(regexp_replace(lower(text), '[a-z0-9\\s]', '', 'g')) AS DOUBLE)
               / CAST(length(text) AS DOUBLE) END AS pr
      FROM base
    ),
    wt AS (SELECT doc_id, lang, sr * 0.5 + (1.0 - pr) * 0.5 AS weight FROM sig),
    keyed AS (
      SELECT doc_id, lang, weight,
             pow(CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                      AS BIGINT) / 4294967296.0,
                 1.0 / weight) AS key
      FROM wt WHERE weight > 0
    ),
    ranked AS (
      SELECT lang, doc_id, weight, key,
             row_number() OVER (PARTITION BY lang ORDER BY key DESC, doc_id ASC)
               AS rk
      FROM keyed
    )
    SELECT lang, doc_id, weight, round(key, 6) AS sample_key,
           CAST(rk AS INTEGER) AS rk
    FROM ranked WHERE rk <= 10
    """,
)
def weighted_sample_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum quality-weighted sampling (operators/sampling.py
    weighted_sample_per_group): the 10 A-ES picks per language,
    deterministic on any layout; the oracle replays weight, draw key,
    and per-group ranking exactly."""
    from bigdatapipelne_spark.functions.text import (
        quality_from_ratios,
        stopword_ratio_from_tokens,
    )
    from bigdatapipelne_spark.operators.sampling import weighted_sample_per_group

    # tokenize-once + widen (doc_quality pattern): the inline
    # quality_score re-tokenizes per consuming expression
    base = _widen_narrow_input(t(spark, sf_dir, "documents")).select(
        "doc_id", "lang", "text", tokens("text").alias("__toks")
    )
    docs = base.select(
        "doc_id", "lang",
        quality_from_ratios(
            stopword_ratio_from_tokens("__toks"), punct_ratio("text")
        ).alias("q"),
    )
    return weighted_sample_per_group(docs, "doc_id", "lang", "q", k=10)


@query(
    "lang_confusion",
    oracle=f"""
    WITH base AS (SELECT lang, {_SQL_TOKS} AS toks FROM documents),
    pred AS (
      SELECT lang,
             CASE WHEN len(toks) > 0 AND
               CAST(len(list_filter(toks, x -> list_contains({_SQL_STOPWORD_LIST}, x))) AS DOUBLE)
               / CAST(len(toks) AS DOUBLE) >= 0.05
             THEN 'en' ELSE 'other' END AS lang_pred
      FROM base
    )
    SELECT lang, lang_pred, COUNT(*) AS n_docs
    FROM pred GROUP BY lang, lang_pred
    """,
)
def lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID confusion matrix: predicted label (the stopword-ratio
    heuristic, functions/text.py lang_id_en) against the ground-truth
    lang column — the evaluation rollup a pipeline publishes to decide
    whether the classifier's precision supports language-filtered
    corpus cuts. One grouped count; labels computed in the scan
    projection."""
    from bigdatapipelne_spark.functions.text import stopword_ratio_from_tokens

    # widen + tokenize-once (round-6 narrow-scan pattern); the 0.05
    # threshold and null handling mirror lang_id_en exactly
    docs = _widen_narrow_input(t(spark, sf_dir, "documents"))
    sig = docs.select(
        "lang", tokens("text").alias("__toks")
    ).select("lang", stopword_ratio_from_tokens("__toks").alias("__sr"))
    return (
        sig.select(
            "lang",
            F.when(F.col("__sr") >= F.lit(0.05), F.lit("en"))
            .otherwise(F.lit("other"))
            .alias("lang_pred"),
        )
        .groupBy("lang", "lang_pred")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
