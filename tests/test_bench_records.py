"""Record-hygiene invariants on the committed bench records (round-13
verdict #4): BENCH_sf10.json's ``queries`` and ``skipped`` maps must
PARTITION the live registry — every registered query in exactly one of
the two, ``skipped`` equal to the live SKIP list. The r13 record
violated both (a subset pass bypassed SKIP and re-timed a capped
certificate into ``queries`` while it was also listed as skipped, and
the ``skipped`` map predated a new SKIP entry); bench_sf10._write_record
now enforces the invariant on every write and this test pins it on the
committed file. No Spark session."""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def test_bench_sf10_record_partitions_registry():
    from bench_sf10 import SKIP

    from bigdatapipelne_spark.queries import QUERIES, finalize_registry

    finalize_registry()
    with open(os.path.join(REPO, "BENCH_sf10.json")) as f:
        rec = json.load(f)
    cells, skipped = set(rec["queries"]), set(rec["skipped"])
    assert cells.isdisjoint(skipped), cells & skipped
    assert cells | skipped == set(QUERIES), {
        "unrecorded": sorted(set(QUERIES) - cells - skipped),
        "unregistered": sorted((cells | skipped) - set(QUERIES)),
    }
    assert skipped == set(SKIP)
