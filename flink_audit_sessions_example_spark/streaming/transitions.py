"""Continuous transition-matrix maintenance — the streaming twin of
``operators/timeseries.py::event_transitions``, with O(1) state per key.

The batch operator's pair extraction is a per-key ``lead`` over
``(ts, tiebreaks)`` order; the streaming fold needs only each key's
LAST event — ``(last_us, last_type)``, two scalars — to emit the same
consecutive pairs as events arrive (the tiebreak never crosses the
batch boundary: under ordered arrival a new batch's first event always
pairs with the carried last type, so only the INTRA-batch sort needs
it). The twin emits transition-count INCREMENTS in append mode
(``(from_type, to_type, inc)`` per key per micro-batch, pre-combined
inside the batch); consumers maintain the matrix with
``groupBy(from_type, to_type).sum(inc)`` — which also makes the hot
downstream state O(|types|²), never O(keys).

Type preservation (review r11c): the type and tiebreak columns keep
their NATIVE types end-to-end — the output/state schemas are derived
from the input schema, and the tiebreak sorts as its own type with
NULLS FIRST (the batch window's default) — so the stream's matrix keys
union/compare against the batch twin's without a silent string
coercion.

Equality contract (the ``stream_funnel_stages`` precedent): under
per-key EVENT-TIME-ORDERED arrival — ties broken by the same tiebreak
the batch twin sorts on — the aggregated increments equal the batch
``n_transitions`` EXACTLY: counts are integers, so unlike the decay
twin there is no floating-point regime to scope. Within one
micro-batch, rows sort by ``(us, tiebreak)`` before folding, so
intra-batch disorder is repaired; CROSS-batch disorder is the
documented arrival contract (a late event would pair with the state's
newer last-type — the same contract every keyed fold here states).

Row-exclusion contract: identical to the batch twin — NULL timestamps,
NULL/NaN types AND NULL/NaN tiebreaks are dropped engine-side before
the Python boundary (and belt-and-braces inside the fold), matching
``event_transitions``'s filter exactly: the batch twin also excludes
NULL tiebreaks (they cannot break a tie and engines disagree on NULL
sort placement) and NaN values in float-typed type/tiebreak columns
(pandas folds cannot distinguish NaN from NULL), so both sides pair
the identical event sequence for every column type, floats included.
Epoch micros are computed ENGINE-side (``unix_micros``) — pandas
timestamps arrive session-TZ localized (the r10 rule).

At-least-once caveat, stated plainly: increments are NOT idempotent
under re-delivery; exactly-once sinks or upstream event-id dedup are
the deployment contract (the ``stream_time_decay`` wording).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _make_transitions_fn():
    def fn(key, pdfs, state):
        from collections import Counter

        import pandas as pd

        rows = []
        for pdf in pdfs:
            for us, tb, et in zip(pdf["_us"], pdf["_tb"], pdf["_t"]):
                # engine-side filters already dropped NULL ts/type;
                # belt-and-braces for direct state-fn drives —
                # SYMMETRIC for both fields (a NaN type must not
                # fabricate a 'nan' matrix entry — review r11c)
                if us is None or pd.isna(us):
                    continue
                if et is None or pd.isna(et):
                    continue
                rows.append((int(us), tb, et))
        if not rows:
            return
        # repair intra-batch disorder: the batch twin's lead order —
        # (us, tiebreak) with NULLS FIRST on the tiebreak (the window
        # default); the bool leg isolates None so the native tiebreak
        # only ever compares against its own type
        rows.sort(
            key=lambda r: (r[0], r[1] is not None and not pd.isna(r[1]),
                           r[1] if r[1] is not None
                           and not pd.isna(r[1]) else 0)
        )
        if state.exists:
            last_us, last_type = state.get
        else:
            last_us, last_type = None, None
        inc: "Counter[tuple]" = Counter()
        for us, _tb, et in rows:
            if last_type is not None:
                inc[(last_type, et)] += 1
            last_us, last_type = us, et
        state.update((last_us, last_type))
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
    the module docstring for the O(1)-state / exact-count / native-type
    / row-exclusion / re-delivery contracts). Output ``(from_type,
    to_type, inc)`` with the type column's NATIVE type; the matrix is
    ``groupBy(from_type, to_type).agg(sum(inc))`` downstream, and the
    batch twin's conditional ``p`` derives from the summed matrix
    exactly as ``event_transitions`` computes it."""
    type_type = df.schema[type_col].dataType.simpleString()
    ts = F.col(ts_col).cast("timestamp")
    keep = ts.isNotNull()
    for c in (type_col, tiebreak_col):
        keep = keep & F.col(c).isNotNull()
        if df.schema[c].dataType.simpleString() in ("float", "double"):
            keep = keep & ~F.isnan(c)
    keyed = df.where(keep).select(
        F.col(key_col).alias("_k"),
        F.unix_micros(ts).alias("_us"),
        F.col(tiebreak_col).alias("_tb"),
        F.col(type_col).alias("_t"),
    )
    return keyed.groupBy("_k").applyInPandasWithState(
        _make_transitions_fn(),
        outputStructType=(
            f"from_type {type_type}, to_type {type_type}, inc long"
        ),
        stateStructType=f"last_us long, last_type {type_type}",
        outputMode="append",
        timeoutConf="NoTimeout",
    )
