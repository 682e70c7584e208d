"""Drift-normalized per-query bench compare (round-12 verdict #5).

This box's same-HEAD bench totals swing ~1.15-1.2x between runs (the
drift signature STATUS.md has documented since round 7), so a raw
per-query diff against the previous round's record conflates box drift
with real regressions — round 12's close-out burned three same-HEAD
runs separating them by hand. Every BENCH_local.json already records
``identity_drain_sec`` (a trivial availableNow drain: pure per-
invocation streaming constant, no data term — the box-speed probe);
this script divides it out and applies the standing regression bar
(>1.4x AND >+1s after normalization) so a record is self-attributing.

Usage::

    python -m bigdatapipelne_spark.devtools.bench_compare OLD NEW

where OLD / NEW are BENCH_local.json paths or git blob refs
(``<commit>:BENCH_local.json`` — anything containing ':' goes through
``git show``). Prints one JSON line: the drift factor, per-query
regressions past the bar (raw AND normalized seconds), and the
improvements beyond the inverse bar. Exit code 1 iff any regression
survives normalization — usable as a close-out gate.

The identity probe normalizes the per-invocation constant, which
DOMINATES sub-second cells but only part-covers compute-heavy ones;
treat the normalized ratio as attribution evidence, not truth — a
flagged query still gets a warm A/B in one session before acting
(.claude/skills/verify timing discipline).
"""

from __future__ import annotations

import json
import subprocess
import sys

RATIO_BAR = 1.4
ABS_BAR_SEC = 1.0


def _load(ref: str) -> dict:
    if ":" in ref:  # a git blob ref like 1aab8cd:BENCH_local.json
        out = subprocess.run(
            ["git", "show", ref], capture_output=True, text=True, check=True
        )
        return json.loads(out.stdout)
    with open(ref) as fh:
        return json.load(fh)


def _identity(rec: dict) -> float | None:
    """The record's box-speed probe: the median of the
    ``identity_drain_secs`` probe list when present (round-13 verdict
    #3 — three probes spread across the sweep, robust to one outlier),
    else the legacy single ``identity_drain_sec``."""
    probes = rec.get("identity_drain_secs")
    if probes:
        return sorted(probes)[len(probes) // 2]
    return rec.get("identity_drain_sec")


def _identity_kind(rec: dict) -> str:
    return "median3" if rec.get("identity_drain_secs") else "legacy_start"


def compare(old: dict, new: dict) -> dict:
    drift = None
    boundary = False
    oid, nid = _identity(old), _identity(new)
    if oid and nid:
        if _identity_kind(old) == _identity_kind(new):
            drift = nid / oid
        else:
            # probe-FORMAT boundary (r13 -> r14): a legacy record's single
            # probe ran at the START of the sweep (coldest point — reads
            # systematically high), a median-of-3 record's value is spread
            # across the warm sweep. Their ratio measures the probe
            # methodology, not the box — normalizing by it inflates every
            # flat cell (measured: drift 0.78, 153 untouched cells pushed
            # toward the bar). Compare RAW across the boundary and say so.
            boundary = True
    oq, nq = old["queries"], new["queries"]
    shared = sorted(set(oq) & set(nq))
    regressions, improvements = [], []
    for name in shared:
        o, n = oq[name], nq[name]
        n_norm = n / drift if drift else n
        if n_norm > o * RATIO_BAR and n_norm - o > ABS_BAR_SEC:
            regressions.append(
                {
                    "query": name,
                    "old_sec": o,
                    "new_sec": n,
                    "new_norm_sec": round(n_norm, 3),
                    # a 0.0 old cell (placeholder / rounded-down) still
                    # reports as a regression, just without a ratio
                    "norm_ratio": round(n_norm / o, 2) if o else None,
                    # the raw (un-normalized) ratio beside it, so a
                    # reader can see how much of the flag is drift math
                    "raw_ratio": round(n / o, 2) if o else None,
                }
            )
        elif o > n_norm * RATIO_BAR and o - n_norm > ABS_BAR_SEC:
            improvements.append(
                {
                    "query": name,
                    "old_sec": o,
                    "new_sec": n,
                    "new_norm_sec": round(n_norm, 3),
                }
            )
    return {
        "identity_drift": round(drift, 3) if drift else None,
        # True when exactly one side is a legacy single-probe record:
        # drift is ill-defined across the format boundary, so the diff
        # above is RAW (drift None, no normalization applied)
        "identity_format_boundary": boundary,
        "old_identity_sec": oid,
        "new_identity_sec": nid,
        "n_shared": len(shared),
        "only_in_new": sorted(set(nq) - set(oq)),
        "only_in_old": sorted(set(oq) - set(nq)),
        "old_total_sec": old.get("value"),
        "new_total_sec": new.get("value"),
        "regressions_past_bar": sorted(
            regressions,
            key=lambda r: -(r["norm_ratio"] or float("inf")),
        ),
        "improvements_past_bar": improvements,
        "bar": f">{RATIO_BAR}x and >+{ABS_BAR_SEC}s after identity-drift "
        "normalization",
    }


def main(argv: list[str]) -> int:
    if len(argv) != 2:
        print(
            "usage: python -m bigdatapipelne_spark.devtools.bench_compare "
            "OLD NEW   (paths or <commit>:BENCH_local.json refs)",
            file=sys.stderr,
        )
        return 2
    result = compare(_load(argv[0]), _load(argv[1]))
    print(json.dumps(result, indent=2))
    return 1 if result["regressions_past_bar"] else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
