"""DSIR importance-selection tests: a pure-Python replay of the hashed
bag-of-ngrams pipeline on a crafted corpus (known answers), behavioral
checks (target-like docs outrank), and partitioning invariance."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from bigdatapipelne_spark.operators.importance import (
    dsir_scores,
    dsir_select_topk,
    hashed_ngram_cells,
)


def _py_buckets(text: str, n_buckets: int) -> list[int]:
    """Pure-Python mirror of hashed_ngram_cells for one document."""
    w = [t for t in text.lower().split() if t]
    feats = list(w)
    if len(w) >= 2:
        feats += [f"{w[i]} {w[i + 1]}" for i in range(len(w) - 1)]
    return [
        int(hashlib.md5(f.encode()).hexdigest()[:15], 16) % n_buckets
        for f in feats
    ]


def _py_dsir(rows, n_buckets):
    """Pure-Python DSIR scores for [(id, text, is_tgt)] rows."""
    from collections import Counter

    raw, tgt = Counter(), Counter()
    per_doc = {}
    for doc_id, text, is_tgt in rows:
        bs = _py_buckets(text, n_buckets)
        per_doc[doc_id] = bs
        raw.update(bs)
        if is_tgt:
            tgt.update(bs)
    n_raw, n_tgt = sum(raw.values()), sum(tgt.values())
    lr = {
        b: math.log((tgt.get(b, 0) + 1.0) / (n_tgt + n_buckets))
        - math.log((raw[b] + 1.0) / (n_raw + n_buckets))
        for b in raw
    }
    return {
        doc_id: sum(lr[b] for b in bs) for doc_id, bs in per_doc.items() if bs
    }


CORPUS = [
    (1, "alpha beta gamma delta", True),
    (2, "alpha beta epsilon", True),
    (3, "alpha beta gamma", False),       # target-like raw doc
    (4, "omega psi chi phi", False),
    (5, "omega psi upsilon tau", False),
    (6, "zeta", False),                   # single token: unigram only
    (7, "   ", False),                    # no tokens: no defined weight
]


def _frame(spark):
    return spark.createDataFrame(
        CORPUS, "doc_id long, text string, is_tgt boolean"
    )


def test_dsir_scores_match_pure_python_replay(spark):
    n_buckets = 64
    got = {
        r.doc_id: r.dsir_score
        for r in dsir_scores(
            _frame(spark), "doc_id", "text", "is_tgt", n_buckets=n_buckets
        ).collect()
    }
    want = _py_dsir(CORPUS, n_buckets)
    assert set(got) == set(want)  # doc 7 absent from both
    for doc_id, score in want.items():
        assert abs(got[doc_id] - score) < 1e-6, (doc_id, got[doc_id], score)


def test_dsir_target_like_docs_outrank(spark):
    scores = {
        r.doc_id: r.dsir_score
        for r in dsir_scores(
            _frame(spark), "doc_id", "text", "is_tgt", n_buckets=64
        ).collect()
    }
    # doc 3 shares its n-grams with the target sample; docs 4/5 share none
    # (doc 6's single smoothed unigram scores near zero — neutral, not
    # target-like, so the discriminating comparison is 3 vs 4/5).
    assert scores[3] > scores[4]
    assert scores[3] > scores[5]
    top = dsir_select_topk(
        _frame(spark), "doc_id", "text", "is_tgt", k=4, n_buckets=64
    )
    got = {r.doc_id for r in top.collect()}
    assert 3 in got and 4 not in got and 5 not in got


def test_dsir_partitioning_invariant(spark):
    base = dsir_scores(
        _frame(spark), "doc_id", "text", "is_tgt", n_buckets=64
    ).collect()
    shuffled = dsir_scores(
        _frame(spark).repartition(7), "doc_id", "text", "is_tgt", n_buckets=64
    ).collect()
    assert {(r.doc_id, r.dsir_score) for r in base} == {
        (r.doc_id, r.dsir_score) for r in shuffled
    }


def test_dsir_topk_plan_is_take_ordered(spark):
    top = dsir_select_topk(
        _frame(spark), "doc_id", "text", "is_tgt", k=2, n_buckets=64
    )
    plan = top._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrdered" in plan, plan


def test_hashed_cells_suffix_conv_matches_full_width(spark):
    """The mod-residue shortcut (conv over the shortest hex suffix with
    16^L % n_buckets == 0) must equal the full 15-digit conversion for
    every feature — for a dividing bucket count (64: L=2) AND a
    non-dividing one (100: falls back to the full width)."""
    df = _frame(spark)
    for n_buckets in (64, 100, 4096):
        got = sorted(
            (r.doc_id, r.bucket)
            for r in hashed_ngram_cells(
                df, "doc_id", "text", n_buckets=n_buckets
            ).collect()
        )
        want = sorted(
            (r.doc_id, b)
            for r in df.select("doc_id", "text").collect()
            for b in _py_buckets(r.text, n_buckets)
        )
        assert got == want, n_buckets
