"""Continuous transition-matrix maintenance — the streaming twin of
``operators/timeseries.py::event_transitions``, with O(1) state per key.

The batch operator's pair extraction is a per-key ``lead`` over
``(ts, tiebreaks)`` order; the streaming fold needs only each key's
LAST event — ``(last_us, last_tiebreak, last_type)``, three scalars —
to emit the same consecutive pairs as events arrive. The twin emits
transition-count INCREMENTS in append mode (``(from_type, to_type,
inc)`` per key per micro-batch, pre-combined inside the batch);
consumers maintain the matrix with ``groupBy(from_type, to_type)
.sum(inc)`` — which also makes the hot downstream state O(|types|²),
never O(keys).

Equality contract (the ``stream_funnel_stages`` precedent): under
per-key EVENT-TIME-ORDERED arrival — ties broken by the same tiebreak
the batch twin sorts on — the aggregated increments equal the batch
``n_transitions`` EXACTLY: counts are integers, so unlike the decay
twin there is no floating-point regime to scope. Within one
micro-batch, rows sort by ``(us, tiebreak)`` before folding, so
intra-batch disorder is repaired; CROSS-batch disorder is the
documented arrival contract (a late event would pair with the state's
newer last-type — the same contract every keyed fold here states).

Row-exclusion contract: identical to the batch twin — NULL timestamps
and NULL types are dropped engine-side before the Python boundary
(and belt-and-braces inside the fold), so both sides pair the same
event sequence. Epoch micros are computed ENGINE-side (``unix_micros``)
— pandas timestamps arrive session-TZ localized (the r10 rule).

At-least-once caveat, stated plainly: increments are NOT idempotent
under re-delivery; exactly-once sinks or upstream event-id dedup are
the deployment contract (the ``stream_time_decay`` wording).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_STATE = "last_us long, last_tb long, last_type string"


def _make_transitions_fn():
    def fn(key, pdfs, state):
        from collections import Counter

        import pandas as pd

        rows = []
        for pdf in pdfs:
            for us, tb, et in zip(pdf["_us"], pdf["_tb"], pdf["_t"]):
                # engine-side filters already dropped NULL ts/type;
                # belt-and-braces for direct state-fn drives
                if us is None or pd.isna(us) or et is None:
                    continue
                rows.append(
                    (int(us), 0 if tb is None or pd.isna(tb) else int(tb),
                     str(et))
                )
        if not rows:
            return
        # repair intra-batch disorder: the batch twin's lead order
        rows.sort()
        if state.exists:
            last_us, last_tb, last_type = state.get
        else:
            last_us, last_tb, last_type = None, None, None
        inc: "Counter[tuple[str, str]]" = Counter()
        for us, tb, et in rows:
            if last_type is not None:
                inc[(last_type, et)] += 1
            last_us, last_tb, last_type = us, tb, et
        state.update((last_us, last_tb, last_type))
        yield pd.DataFrame(
            {
                "from_type": [a for a, _ in inc],
                "to_type": [b for _, b in inc],
                "inc": [int(v) for v in inc.values()],
            }
        )

    return fn


def stream_transitions(
    df: DataFrame,
    *,
    key_col: str,
    type_col: str,
    ts_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Per-micro-batch transition-count increments (append mode; see
    the module docstring for the O(1)-state / exact-count /
    row-exclusion / re-delivery contracts). Output ``(from_type,
    to_type, inc)``; the matrix is ``groupBy(from_type, to_type)
    .agg(sum(inc))`` downstream, and the batch twin's conditional ``p``
    derives from the summed matrix exactly as
    ``event_transitions`` computes it."""
    ts = F.col(ts_col).cast("timestamp")
    keyed = df.where(ts.isNotNull() & F.col(type_col).isNotNull()).select(
        F.col(key_col).alias("_k"),
        F.unix_micros(ts).alias("_us"),
        F.col(tiebreak_col).cast("long").alias("_tb"),
        F.col(type_col).cast("string").alias("_t"),
    )
    return keyed.groupBy("_k").applyInPandasWithState(
        _make_transitions_fn(),
        outputStructType="from_type string, to_type string, inc long",
        stateStructType=_STATE,
        outputMode="append",
        timeoutConf="NoTimeout",
    )
