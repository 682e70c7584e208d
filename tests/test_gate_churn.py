"""Churn-aware gating guard (round-5 verdict item 3).

A driver-green CORRECTNESS row certifies the code as of its round's
commit; later edits to any function the query executes age that evidence
silently — pytest parity still covers it at sf0.001, but the driver's
sf0.01 hash gate is the hard signal. These tests force the gate window to
lead with exactly the stale-evidence queries:

- every query whose reachable implementation (function ASTs + referenced
  module constants, see devtools/churn.py) changed since its last green
  row — and whose new form no other green query re-certifies — must hold
  a slot in the current gate window;
- the gate window size is pinned once (queries.GATE_SLOTS) and
  _GATE_PRIORITY must fill it exactly, so a harness gate-size change or a
  priority-list edit cannot silently drift the guarded set.
"""

from __future__ import annotations

import pytest

from bigdatapipelne_spark import queries
from bigdatapipelne_spark.queries import GATE_SLOTS, QUERIES, _GATE_PRIORITY


@pytest.fixture(scope="module", autouse=True)
def _finalized():
    queries.finalize_registry()


def test_gate_priority_fills_the_window_exactly():
    assert len(_GATE_PRIORITY) == GATE_SLOTS, (
        f"_GATE_PRIORITY has {len(_GATE_PRIORITY)} entries for a "
        f"{GATE_SLOTS}-slot gate window — a short list silently gates "
        "whatever registers next; a long one silently drops its tail"
    )
    assert len(set(_GATE_PRIORITY)) == len(_GATE_PRIORITY), "duplicate entries"
    assert list(QUERIES)[:GATE_SLOTS] == _GATE_PRIORITY, (
        "registration order does not start with _GATE_PRIORITY — "
        "finalize_registry() is broken"
    )


def test_round_commit_certifies_head_for_uncommitted_record():
    """Round-6 verdict item 1: at the round boundary the driver's fresh
    CORRECTNESS record sits on disk UNTRACKED (written against the
    end-of-round snapshot, committed later). round_commit must certify
    HEAD for it — returning None dropped every newest-round green from
    last-green and re-certification, turning the churn guard red exactly
    at judge time."""
    import json
    import os
    import subprocess

    from bigdatapipelne_spark.devtools import churn

    head = subprocess.run(
        ["git", "rev-parse", "HEAD"],
        cwd=churn.REPO,
        capture_output=True,
        text=True,
    ).stdout.strip()

    fresh = os.path.join(churn.REPO, "CORRECTNESS_r98.json")
    assert not os.path.exists(fresh), "r98 sentinel record unexpectedly exists"
    churn.round_commit.cache_clear()
    try:
        # missing record -> no certifying snapshot at all
        assert churn.round_commit(98) is None
        with open(fresh, "w") as fh:
            json.dump({"stage_events": {"rows_match": True}}, fh)
        churn.round_commit.cache_clear()
        # on-disk but uncommitted -> certifies the end-of-round snapshot
        assert churn.round_commit(98) == head
    finally:
        if os.path.exists(fresh):
            os.remove(fresh)
        churn.round_commit.cache_clear()
    # committed records still resolve to their adding commit, not HEAD
    r1 = churn.round_commit(1)
    assert r1 is not None
    adding = subprocess.run(
        ["git", "log", "--format=%H", "--diff-filter=A", "--",
         "CORRECTNESS_r01.json"],
        cwd=churn.REPO,
        capture_output=True,
        text=True,
    ).stdout.split()[0]
    assert r1 == adding


def test_churned_queries_hold_gate_slots():
    from bigdatapipelne_spark.devtools.churn import churned_queries

    flagged = churned_queries(QUERIES)
    gate = set(list(QUERIES)[:GATE_SLOTS])
    ungated = {q: d for q, d in flagged.items() if q not in gate}
    assert not ungated, (
        "queries whose implementation changed since their last driver-green "
        "row (and whose new form no other green query re-certifies) must "
        f"occupy a gate slot this round: {ungated}"
    )


def test_dep_walk_reaches_module_attribute_calls():
    """Round-8 walker fix: ``from pkg.sources import store`` +
    ``store.commit_version(...)`` must reach the store functions — the
    module handle is not itself walkable, and the submodule is not even an
    attribute of its package until imported. Found via store_vacuum NOT
    churn-flagging on a commit_version edit."""
    from bigdatapipelne_spark.devtools.churn import dep_functions

    fns = dep_functions(QUERIES["store_vacuum"])
    reached = {q for (m, q) in fns if m.endswith("sources.store")}
    assert "commit_version" in reached
    assert "gc_versions" in reached
