"""bench_compare (devtools): the drift normalization must use the
MEDIAN of the identity probe list (round-13 verdict #3) — a single
unusually-fast probe otherwise inflates every normalized ratio past the
bar (the r13 driver record flagged two untouched drain cells exactly
this way) — and every flagged regression carries the RAW ratio beside
the normalized one so a reader can see how much of the flag is drift
math. Pure-python unit tests, no Spark session."""

from __future__ import annotations

from bigdatapipelne_spark.devtools.bench_compare import _identity, compare


def test_identity_prefers_probe_median_over_legacy_field():
    assert _identity({"identity_drain_secs": [0.5, 0.9, 0.6]}) == 0.6
    # legacy records (single probe) keep working
    assert _identity({"identity_drain_sec": 0.7}) == 0.7
    # the probe list wins over a stale scalar when both exist
    assert (
        _identity({"identity_drain_secs": [0.4], "identity_drain_sec": 0.9})
        == 0.4
    )
    assert _identity({}) is None


def test_compare_normalizes_by_median_and_reports_raw_ratio():
    old = {
        "identity_drain_secs": [0.6, 0.65, 0.7],
        "identity_drain_sec": 0.65,
        "queries": {"a": 1.0, "b": 2.0},
        "value": 3.0,
    }
    # new session: box 2x slower by the probes; cell a tracks drift
    # exactly, cell b is a REAL 3x regression on top of it
    new = {
        "identity_drain_secs": [1.2, 1.3, 1.4],
        "identity_drain_sec": 1.3,
        "queries": {"a": 2.0, "b": 12.0},
        "value": 14.0,
    }
    res = compare(old, new)
    assert res["identity_drift"] == 2.0
    assert [r["query"] for r in res["regressions_past_bar"]] == ["b"]
    r = res["regressions_past_bar"][0]
    assert r["raw_ratio"] == 6.0 and r["norm_ratio"] == 3.0
    # a cell that merely tracks box drift is NOT flagged
    assert all(x["query"] != "a" for x in res["regressions_past_bar"])

    # one outlier probe (the r13 failure mode: an unusually fast single
    # identity measurement) must not skew the drift factor
    new_outlier = dict(new, identity_drain_secs=[1.3, 0.3, 1.3])
    assert compare(old, new_outlier)["identity_drift"] == 2.0


def test_compare_goes_raw_across_probe_format_boundary():
    """A legacy record's single probe ran at the sweep's coldest point;
    a median-of-3 record's value is spread across the warm sweep — their
    ratio measures probe methodology, not box drift (the r13->r14
    compare read 0.78 'drift' on a flat-cell session and pushed every
    untouched cell toward the bar). Across the boundary the compare must
    go RAW: drift None, boundary flagged, bars applied un-normalized."""
    old = {
        "identity_drain_sec": 0.525,  # legacy single start-probe
        "queries": {"a": 3.0, "b": 2.0},
    }
    new = {
        # warm median 0.4 — NOT comparable to the legacy start probe
        "identity_drain_secs": [0.9, 0.4, 0.41],
        "identity_drain_sec": 0.4,
        "queries": {"a": 4.1, "b": 6.0},  # a: raw 1.37x (noise), b: 3x
    }
    res = compare(old, new)
    assert res["identity_format_boundary"] is True
    assert res["identity_drift"] is None
    # a's 1.37x raw stays under the bar (normalizing by 0.4/0.525 would
    # have flagged it); b's genuine 3x raw is still caught
    assert [r["query"] for r in res["regressions_past_bar"]] == ["b"]
    # same-format records never set the flag
    assert compare(new, new)["identity_format_boundary"] is False
