"""Custom stateful session operator — ``applyInPandasWithState``.

The built-in path (operators/sessionize.py) expresses the reference's
session logic with ``session_window`` + ``sum`` and is what production
should use. This module implements the SAME semantics as a hand-written
stateful operator — per-key mergeable session state with event-time
timeouts — to provide the escape hatch for stateful streaming semantics
Spark's built-ins cannot express (the reference hand-wrote exactly this
pair: ``AggregateDeniedCounts.java:5-34`` keeps the mergeable accumulator,
``WrapUserAndWindowWithCount.java:7-21`` fires on window finalization).

Mechanics:

- state per user = parallel arrays of open sessions
  ``(start_ms, last_ms, denies)``; new events merge in exactly like
  Flink's per-event ``[ts, ts+gap)`` windows (sort by start, coalesce
  while ``next.start <= cur.last + gap``);
- a session is *emitted* (append mode) only once the event-time watermark
  passes ``last + gap`` — the same firing rule as both engines' built-ins;
- the group's event-time timeout is armed at the earliest open session
  end, so state is revisited (and flushed) by watermark advance alone,
  with no further data for that user.

At scale this costs what the built-in costs: one shuffle on the key and
O(open sessions) state per user in the state store.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

OUTPUT_SCHEMA = "reqUser string, denies bigint, start timestamp, end timestamp"
STATE_SCHEMA = "starts array<bigint>, lasts array<bigint>, counts array<bigint>"


def _merge_sessions(sessions: list[list[int]], gap_ms: int) -> list[list[int]]:
    sessions.sort(key=lambda s: (s[0], s[1]))
    merged: list[list[int]] = []
    for s in sessions:
        if merged and s[0] <= merged[-1][1] + gap_ms:
            merged[-1][1] = max(merged[-1][1], s[1])
            merged[-1][2] += s[2]
        else:
            merged.append(list(s))
    return merged


def _make_session_fn(gap_seconds: int):
    gap_ms = int(gap_seconds) * 1000

    def fn(key, pdfs, state):
        import pandas as pd

        sessions: list[list[int]] = (
            [list(t) for t in zip(*state.get)] if state.exists else []
        )
        if not state.hasTimedOut:
            for pdf in pdfs:
                pdf = pdf.dropna(subset=["evtTime"])
                # normalize to ns BEFORE the integer reinterpret: pandas
                # 2.x can hand this over as datetime64[us], where a bare
                # astype(int64)//1e6 yields seconds, not millis (same
                # guard as streaming/attribution.py)
                ts_ms = (
                    pdf["evtTime"].astype("datetime64[ns]").astype("int64")
                    // 1_000_000
                )
                weights = pdf["event_count"].fillna(0).astype("int64")
                denied = pdf["result"].fillna(0).astype("int64") != 1
                for t, w, d in zip(ts_ms, weights, denied):
                    sessions.append([int(t), int(t), int(w) if d else 0])
            sessions = _merge_sessions(sessions, gap_ms)
        else:
            # timeout wake-up: no new data, just flush what the watermark
            # has finalized
            for _ in pdfs:  # pragma: no cover - iterator is empty
                pass

        wm = state.getCurrentWatermarkMs()
        closed = [s for s in sessions if s[1] + gap_ms <= wm]
        still_open = [s for s in sessions if s[1] + gap_ms > wm]

        if still_open:
            state.update(tuple(list(col) for col in zip(*still_open)))
            next_fire = min(s[1] + gap_ms for s in still_open)
            state.setTimeoutTimestamp(max(next_fire, wm + 1))
        else:
            state.remove()

        if closed:
            yield pd.DataFrame(
                {
                    "reqUser": [key[0]] * len(closed),
                    "denies": [s[2] for s in closed],
                    "start": pd.to_datetime([s[0] for s in closed], unit="ms"),
                    "end": pd.to_datetime(
                        [s[1] + gap_ms for s in closed], unit="ms"
                    ),
                }
            )

    return fn


def audit_denied_sessions_custom_state(
    audits: DataFrame,
    gap_seconds: int,
    watermark_delay: str = "2 days",
) -> DataFrame:
    """Streaming-only custom-state twin of
    :func:`..operators.sessionize.audit_denied_sessions` (same output
    schema and semantics, including the ``denies != 0`` HAVING)."""
    keyed = (
        audits.where(F.col("reqUser").isNotNull())
        .withWatermark("evtTime", watermark_delay)
        .groupBy("reqUser")
    )
    sessions = keyed.applyInPandasWithState(
        _make_session_fn(gap_seconds),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf="EventTimeTimeout",
    )
    return sessions.where(F.col("denies") != 0)
