"""Custom stateful streaming operator: gap-based sessionization via
``applyInPandasWithState`` (SURVEY.md §7 hard part #3 — per-key state in
the stream; the batch twin with identical semantics is
plans/etl_ops.py::events_sessionize).

State per user: (session_no, last_ts_micros, n_events, first_event,
last_event). Within a micro-batch rows are sorted by (ts, event_id) —
micro-batches carry no implicit order (O4). Cross-batch late events
(ts below the stored last_ts) never move time backwards: they join the
current session without resetting its clock.

Two modes:
- ``watermark=None`` (default): no timeout — state lives for the whole
  run and dormant users' sessions only ever appear as provisional
  (closed=False) rows. Right for bounded backfills/tests; unbounded
  streams should NOT use it (state grows with ever-seen users).
- ``watermark="10 minutes"``: event-time timeout — when the watermark
  passes last_ts + gap, the open session is emitted CLOSED and the
  user's state is evicted (bounded state: active users only). Events
  later than the watermark delay may be dropped by Spark upstream —
  the standard lateness trade.

Session identity under eviction: eviction wipes the per-user counter,
so the next event from that user restarts ``session_no`` at 0 — two
closed sessions of one user CAN share a session_no (this diverges from
the batch twin's monotonic numbering by design; the twin sees the whole
history, the stream deliberately forgets dormant users). The emitted
``session_start`` column (event-time micros of the session's first
event) disambiguates: key downstream joins/upserts by
``(user_id, session_start)``, never by ``(user_id, session_no)``."""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

GAP_MICROS = 30 * 60 * 1_000_000

_OUT_SCHEMA = (
    "user_id bigint, session_no int, n_events bigint, "
    "first_event bigint, last_event bigint, closed boolean, "
    "session_start bigint"
)
_STATE_SCHEMA = (
    "session_no int, last_ts long, n_events long, first_event long, "
    "last_event long, start_ts long"
)
_OUT_COLS = [
    "user_id", "session_no", "n_events",
    "first_event", "last_event", "closed", "session_start",
]


def _make_sessionize_group(with_timeout: bool):
    def _sessionize_group(
        key: tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if with_timeout and state.hasTimedOut:
            # watermark passed last_ts + gap: the open session is FINAL
            (
                session_no, last_ts, n_events,
                first_event, last_event, start_ts,
            ) = state.get
            state.remove()
            if n_events:
                yield pd.DataFrame(
                    [(
                        user_id, session_no, n_events,
                        first_event, last_event, True, start_ts,
                    )],
                    columns=_OUT_COLS,
                )
            return
        if state.exists:
            (
                session_no, last_ts, n_events,
                first_event, last_event, start_ts,
            ) = state.get
        else:
            session_no, last_ts, n_events, first_event, last_event, start_ts = (
                0, None, 0, None, None, None,
            )

        out_rows = []
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts_micros", "event_id"])
            for ts, eid in zip(pdf["ts_micros"], pdf["event_id"]):
                ts, eid = int(ts), int(eid)
                if last_ts is not None and ts - last_ts > GAP_MICROS:
                    out_rows.append((
                        user_id, session_no, n_events,
                        first_event, last_event, True, start_ts,
                    ))
                    session_no += 1
                    n_events, first_event, start_ts = 0, None, None
                n_events += 1
                first_event = eid if first_event is None else min(first_event, eid)
                last_event = eid if n_events == 1 else max(last_event, eid)
                # session_start = event time of the session's FIRST-seen
                # event; it never moves once set, so it stays stable as
                # the downstream disambiguation key under session_no
                # resets (state eviction — see module docstring)
                start_ts = ts if start_ts is None else start_ts
                # cross-batch late event (ts < stored last_ts): join the
                # session WITHOUT moving its clock backwards — a
                # backwards last_ts could falsely split the next event
                # into a new session where the batch twin would not
                last_ts = ts if last_ts is None else max(last_ts, ts)

        state.update(
            (session_no, last_ts, n_events, first_event, last_event, start_ts)
        )
        if with_timeout and last_ts is not None:
            # close when the watermark passes last_ts + gap; the
            # deadline must sit above the current watermark or Spark
            # rejects it (a session already beyond the gap at update
            # time times out on the very next trigger)
            deadline_ms = (last_ts + GAP_MICROS) // 1000
            wm_ms = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(max(deadline_ms, wm_ms + 1))
        # emit the still-open session as a provisional row (closed=False)
        # so downstream sees current state; closed sessions are final
        if n_events:
            out_rows.append((
                user_id, session_no, n_events,
                first_event, last_event, False, start_ts,
            ))
        if out_rows:
            yield pd.DataFrame(out_rows, columns=_OUT_COLS)

    return _sessionize_group


def sessionize_stream(events: DataFrame, watermark: str | None = None) -> DataFrame:
    """events: streaming DataFrame with (user_id bigint, event_id bigint,
    ts timestamp). Returns per-session rows (provisional + closed).
    With ``watermark`` set, dormant sessions CLOSE via event-time
    timeout and their state is evicted (see module docstring)."""
    from pyspark.sql import functions as F

    # the watermarked TS COLUMN must survive up to the stateful operator
    # (projecting it away discards the watermark and Spark rejects
    # event-time timeout), so keep ts alongside the micros the state
    # function actually reads
    prepared = events.select(
        "user_id", "event_id", "ts", F.unix_micros("ts").alias("ts_micros")
    )
    if watermark is not None:
        prepared = prepared.withWatermark("ts", watermark)
    return prepared.groupBy("user_id").applyInPandasWithState(
        _make_sessionize_group(watermark is not None),
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.EventTimeTimeout
            if watermark is not None
            else GroupStateTimeout.NoTimeout
        ),
    )


# ---------------------------------------------------------------------------
# Streaming transition emitter — the stateful twin of
# plans/extras.py::events_transition_matrix
# ---------------------------------------------------------------------------

_TRANS_OUT_SCHEMA = "user_id bigint, from_type string, to_type string"
_TRANS_STATE_SCHEMA = "last_type string, last_ts long, last_event long"


def _transition_group(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    rows = pd.concat(list(pdfs))
    if not len(rows):
        return
    # micro-batches carry no implicit order (O4): sort by event time
    rows = rows.sort_values(["ts_micros", "event_id"])
    prev = None
    if state.exists:
        prev, last_ts, last_event = state.get
        # enforce the documented in-order contract with the stored
        # cursor: an event at-or-before the state's (ts, event_id) is a
        # REGRESSION — a replayed batch (at-least-once redelivery) or a
        # genuinely late arrival. Emitting it would produce transitions
        # in the wrong order, so drop it here instead of silently
        # corrupting the matrix. ``>`` on the (ts, id) pair also makes
        # exact redelivery idempotent.
        rows = rows[
            (rows["ts_micros"] > last_ts)
            | ((rows["ts_micros"] == last_ts) & (rows["event_id"] > last_event))
        ]
        if not len(rows):
            return
    out = []
    for r in rows.itertuples():
        if prev is not None:
            out.append((user_id, prev, r.event_type))
        prev = r.event_type
    tail = rows.iloc[-1]
    state.update(
        (str(tail["event_type"]), int(tail["ts_micros"]), int(tail["event_id"]))
    )
    if out:
        yield pd.DataFrame(out, columns=["user_id", "from_type", "to_type"])


def transition_stream(events: DataFrame) -> DataFrame:
    """Per-user event-type transition emitter — the streaming twin of
    the batch Markov matrix (plans/extras.py::events_transition_matrix).
    State per user is ONE row: the last seen (type, ts, event_id), so a
    transition spanning a micro-batch boundary is still emitted (the
    property the batch twin gets for free and a stateless stream
    cannot). Downstream aggregates (from_type, to_type) counts however
    it likes — the emitter itself is append-only.

    Ordering contract: rows are sorted by event time WITHIN a
    micro-batch; across batches the stored (last_ts, last_event) cursor
    ENFORCES in-order arrival — events at-or-before the cursor are
    dropped rather than emitted as wrong-order transitions, which also
    makes exact at-least-once redelivery idempotent. Add a watermark +
    event-time timeout exactly as sessionize_stream does if dormant-user
    state must be bounded."""
    from pyspark.sql import functions as F

    prepared = events.select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros("ts").alias("ts_micros"),
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _transition_group,
        outputStructType=_TRANS_OUT_SCHEMA,
        stateStructType=_TRANS_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
