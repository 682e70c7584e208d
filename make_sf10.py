"""Synthesize a deterministic sf10 (100x sf0.1) — the 100x dress rehearsal.

Chains the make_sf1 construction: sf0.1 -> sf1 (10 replicas) -> sf10
(10 replicas of sf1), reusing the exact same per-key-family offset /
word-shuffle / fitted-normal machinery, so every linear-output-scaling
argument in make_sf1's module docstring applies at each hop:

- TPC-H keys offset per key FAMILY at both hops, so all 100 replicas are
  independent worlds and join/agg outputs scale exactly 100x.
- documents: each sf1 doc (already shuffle-decorrelated from its sf0.1
  original) gets 9 further seeded shuffles — shuffle-of-shuffle pairs
  share no trigram shingles, so near-dup pair counts stay ~linear.
- embeddings: 9x fresh vectors from a normal fitted to sf1's per-component
  moments — random pairs stay below the near-dup threshold.
- events: user_id/event_id offsets — per-user state is replica-local, so
  sessions/SCD2/HLL state and outputs scale exactly 100x.

Output: .localdata/sf10/ (~1.5 GB parquet, 60M lineitem rows). Run
bench_sf10.py afterwards for the scale sweep.
"""

from __future__ import annotations

import os

import make_sf1

HERE = os.path.dirname(os.path.abspath(__file__))
SF1 = os.path.join(HERE, ".localdata", "sf1")
SF10 = os.path.join(HERE, ".localdata", "sf10")


def main() -> None:
    if not os.path.exists(os.path.join(SF1, "lineitem.parquet")):
        print("== building sf1 first ==")
        os.makedirs(make_sf1.DST, exist_ok=True)
        make_sf1.scale_events()
        make_sf1.scale_documents()
        make_sf1.scale_embeddings()
        make_sf1.scale_tpch()
    print("== sf1 -> sf10 ==")
    os.makedirs(SF10, exist_ok=True)
    make_sf1.scale_events(SRC=SF1, DST=SF10)
    make_sf1.scale_documents(SRC=SF1, DST=SF10)
    make_sf1.scale_embeddings(SRC=SF1, DST=SF10)
    make_sf1.scale_tpch(SRC=SF1, DST=SF10)


if __name__ == "__main__":
    main()
