"""Custom stateful streaming operator: per-user sessionization with
``applyInPandasWithState`` (event-time timeout).

The reference has no custom streaming state (SURVEY.md §2.4: "no
mapGroupsWithState-style custom state"); this is a north-star extension —
the operator shape a training-data/behavioral pipeline needs when the
built-in ``session_window`` aggregate can't express the semantics (e.g.
emitting per-session payloads, custom merge rules, caps on session length).

Semantics match the batch ``F.session_window(ts, gap)`` aggregate exactly
(same start = first event, end = last event + gap, merge-on-overlap), so the
drained stream is testable against the oracle-checked batch query
(queries_analytics.session_window_agg). The equivalence REQUIRES
``watermark <= gap`` (enforced in ``sessionize_stream``): every arriving
event then satisfies ``ev >= max_seen - watermark >= last - gap >=
start - gap``, so a late event can extend the open session backward
(min/max merge) but can never be a whole gap older than it — the case
that would need a second, earlier open session per key (state here is
deliberately one fixed-width row; lift it to an interval list if a
larger-than-gap watermark is ever required):

- Within a micro-batch, a gap > ``gap`` between consecutive events closes a
  session immediately (emitted in that batch).
- Across micro-batches, the open session is kept in state keyed by user; an
  event-time timeout at ``last_ts + gap`` closes it once the watermark
  passes (the streaming-only tail: sessions still open at the final
  watermark stay unemitted — identical to what append-mode session_window
  would hold back).

Money sums accumulate in integer cents, surfaced once as double — the same
value the batch path's DECIMAL(18,2) sum produces, so stream == batch
row-for-row (operators/aggregate.py rationale).

State per key is one fixed-width row (4 numbers), not the event history —
at 100 TB-scale this is bounded by |active users|, and the state store
shuffles only (user_id -> 4 longs/doubles).
"""

from __future__ import annotations

import datetime
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("sum_value", DoubleType()),
        StructField("n_events", LongType()),
    ]
)

# (start_us, last_us, cents, n_events) — fixed width, no event history.
SESSION_STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("cents", LongType()),
        StructField("n_events", LongType()),
    ]
)

_US = 1_000_000


def _us_to_ts(us: int) -> datetime.datetime:
    return pd.Timestamp(us * 1000).to_pydatetime()


def _session_fn(gap_us: int):
    """Build the per-group state function for a given gap (microseconds)."""

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        closed: list[tuple] = []

        def emit(start_us: int, last_us: int, cents: int, n: int) -> None:
            closed.append(
                (
                    user_id,
                    _us_to_ts(start_us),
                    _us_to_ts(last_us + gap_us),
                    cents / 100.0,
                    n,
                )
            )

        if state.hasTimedOut:
            start_us, last_us, cents, n = state.get
            emit(start_us, last_us, cents, n)
            state.remove()
        else:
            cur = list(state.get) if state.exists else None
            events: list[tuple[int, int]] = []
            for pdf in pdfs:
                if len(pdf) == 0:
                    continue
                # vectorized per batch: a pd.Timestamp + Python round() per
                # EVENT was ~2/3 of the per-group cost at the 100x corpus
                # (150k tiny groups x ~200us of scalar conversions). Same
                # semantics: ns->us floor division; .round() is half-even,
                # as Python round() was. utc=True then tz_localize(None):
                # PySpark's Arrow conversion delivers tz-naive series (a
                # no-op), but a tz-aware series would make a bare
                # .astype("datetime64[ns]") raise TypeError in pandas 2.x
                # — the scalar pd.Timestamp(...).value path this replaced
                # handled tz-aware values, so keep that tolerance.
                us = (
                    pd.to_datetime(pdf["ts"], utc=True)
                    .dt.tz_localize(None)
                    .astype("datetime64[ns]")
                    .astype("int64")
                    // 1000
                ).to_numpy()
                cents_v = (
                    (pdf["value"].astype("float64") * 100)
                    .round()
                    .astype("int64")
                    .to_numpy()
                )
                events.extend(zip(us.tolist(), cents_v.tolist()))
            events.sort()
            for ev_us, ev_cents in events:
                if cur is None:
                    cur = [ev_us, ev_us, ev_cents, 1]
                elif ev_us - cur[1] >= gap_us:
                    emit(*cur)
                    cur = [ev_us, ev_us, ev_cents, 1]
                else:
                    # min/max so a cross-batch arrival that is older than
                    # the open session (allowed within the watermark) merges
                    # instead of moving the session end backwards.
                    cur[0] = min(cur[0], ev_us)
                    cur[1] = max(cur[1], ev_us)
                    cur[2] += ev_cents
                    cur[3] += 1
            if cur is not None:
                state.update(tuple(cur))
                # Event-time timeouts must be strictly beyond the current
                # watermark; clamp so a session already older than the
                # watermark (possible on the first batch after a restart)
                # times out on the next trigger instead of erroring.
                timeout_ms = (cur[1] + gap_us) // 1000
                wm_ms = state.getCurrentWatermarkMs()
                state.setTimeoutTimestamp(max(timeout_ms, wm_ms + 1))

        if closed:
            yield pd.DataFrame(
                closed,
                columns=[f.name for f in SESSION_OUTPUT_SCHEMA.fields],
            )

    return fn


def sessionize_stream(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "10 seconds",
    time_col: str = "ts",
) -> DataFrame:
    """Streaming sessionization: one output row per closed session.

    ``events`` must be a streaming DataFrame with ``time_col``, ``user_id``
    and ``value`` columns. Sessions close on an in-batch gap or an
    event-time timeout (watermark-driven). ``watermark`` must be <= ``gap``
    — the precondition for exact batch-session_window equivalence (module
    docstring); violating it raises rather than silently merging events
    that batch semantics would put in a separate session.

    Cost contract (round-10 decision record): the applyInPandasWithState
    harness itself charges ~320us per GROUP per batch (state serde + a
    pandas frame per group — profiled; vectorizing the per-event work
    left it flat), a priced overhead that buys the custom emission rule
    (in-batch gap closes emit immediately). Bulk callers that only need
    watermark-driven emission should use the native ``F.session_window``
    twin (JVM state store, no per-group Python cost; see
    session_window_stream_drain). Size the drain's state partitions to
    the workload BOTH ways: under ~100k events the per-partition store
    open/commit constant dominates (fewer partitions win); at volume the
    per-group Python work needs a worker per core (cap at cores, never
    below) — measured in .profiling/prof_session_drain_r10.py: sf0.1
    8.8s@32 -> 4.9s@8, sf10 64s@32 -> 167s@8."""

    def _to_us(spec: str) -> int:
        amount, unit = spec.split()
        unit_us = {
            "second": _US,
            "seconds": _US,
            "minute": 60 * _US,
            "minutes": 60 * _US,
            "hour": 3600 * _US,
            "hours": 3600 * _US,
        }[unit]
        return int(amount) * unit_us

    gap_us = _to_us(gap)
    if _to_us(watermark) > gap_us:
        raise ValueError(
            f"sessionize_stream requires watermark ({watermark}) <= gap "
            f"({gap}): a larger watermark admits events a whole gap older "
            "than the open session, which needs multi-interval state to "
            "match batch session_window semantics"
        )
    return (
        events.withWatermark(time_col, watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_fn(gap_us),
            SESSION_OUTPUT_SCHEMA,
            SESSION_STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


def deduped_stream(
    events: DataFrame,
    keys: list[str],
    watermark: str = "10 seconds",
    time_col: str = "ts",
) -> DataFrame:
    """Streaming exact dedup: first-writer-wins on ``keys`` among rows whose
    event times fall within the watermark horizon of each other
    (``dropDuplicatesWithinWatermark``). State is bounded by the horizon —
    the streaming form of operators/dedup.exact_duplicates for an
    at-least-once source (Kinesis/Firehose replays, S2/S11 parity)."""
    return events.withWatermark(time_col, watermark).dropDuplicatesWithinWatermark(
        keys
    )
