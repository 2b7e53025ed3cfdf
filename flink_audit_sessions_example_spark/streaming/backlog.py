"""Continuous open-interval backlog — the streaming twin of
``plans/staged_r22.py::q_rel_order_backlog``'s sweep-line, with O(1)
state.

The batch operator answers "how many orders are open on each day" by
the interval-stabbing identity: +1 at each start day, −1 at each end
day, prefix-sum over days. That prefix sum IS a stream fold — and the
stream's natural input is exactly the identity's event form: an order
OPENED event (+1) when the order is placed, an order CLOSED event (−1)
when its last line ships, each observed AT the time it happens, so the
delta stream arrives event-time-ordered by construction (the batch
side has to manufacture these events from stored intervals; the stream
just watches them happen). The twin carries three scalars — the open
day ``(day_us, delta)`` still accumulating and the running ``backlog``
over closed days — so the stream fold and the batch window are the
same integer arithmetic and equality is bitwise, not approximate.

Day-closing contract (the ``stream_cusum`` wording): a day's net delta
enters the backlog only when a LATER day's first event arrives (the
open day's delta is still growing — emitting it would double-count on
the next event). The twin therefore equals the batch sweep applied to
the CLOSED days — every day strictly before the latest — and the
parity test pins exactly that.

Arrival/emission contracts: event-time-ordered arrival across
micro-batches (intra-batch disorder is repaired by a sort; late
deltas for closed days are dropped, the at-least-once caveat every
keyed fold here states); each micro-batch emits one row per CLOSED day
(append mode) — ``(day, delta, backlog)``, the batch relation's exact
schema, so downstream unions of the two paths line up column for
column. The grouping key is a constant: the backlog is a GLOBAL
running sum, and one task owning one tiny state is the correct
topology for a scalar fold (the per-key generalization — backlog per
warehouse/region — is the same fn keyed by that column).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _make_backlog_fn():
    def fn(key, pdfs, state):
        import pandas as pd

        rows = []
        for pdf in pdfs:
            for us, d in zip(pdf["_dus"], pdf["_delta"]):
                # guard BOTH columns: a non-castable delta upstream
                # (cast -> NULL -> NaN in the long column) would
                # otherwise raise in int(d) and kill the query
                if us is None or pd.isna(us) or d is None or pd.isna(d):
                    continue
                rows.append((int(us), int(d)))
        if not rows:
            return
        rows.sort()
        if state.exists:
            cur_d, cur_delta, backlog = state.get
        else:
            cur_d, cur_delta, backlog = None, 0, 0

        out_day, out_delta, out_backlog = [], [], []
        for dus, delta in rows:
            if cur_d is None:
                cur_d, cur_delta = dus, delta
            elif dus == cur_d:
                cur_delta += delta
            elif dus > cur_d:
                backlog += cur_delta
                out_day.append(cur_d)
                out_delta.append(cur_delta)
                out_backlog.append(backlog)
                cur_d, cur_delta = dus, delta
            # dus < cur_d: late delta for a closed day — dropped, per
            # the ordered-arrival contract
        state.update((cur_d, cur_delta, backlog))
        if out_day:
            yield pd.DataFrame(
                {
                    "_k": [key[0]] * len(out_day),
                    "day_us": out_day,
                    "delta": out_delta,
                    "backlog": out_backlog,
                }
            )

    return fn


def stream_backlog(
    df: DataFrame,
    *,
    ts_col: str = "ts",
    delta_col: str = "delta",
) -> DataFrame:
    """Per-micro-batch closed-day backlog rows (append mode; see the
    module docstring for the day-closing / arrival / re-delivery
    contracts). Input: the open/close EVENT stream — one row per
    interval endpoint with its timestamp and ±1 delta (an upstream
    that watches orders emits +1 on placement, −1 on final shipment).
    Output ``(day, delta, backlog)`` over CLOSED days, the exact
    schema and arithmetic of the batch sweep-line."""
    ts = F.col(ts_col).cast("timestamp")
    deltas = (
        df.where(ts.isNotNull() & F.col(delta_col).isNotNull())
        .select(
            F.unix_micros(F.date_trunc("day", ts)).alias("_dus"),
            F.col(delta_col).cast("long").alias("_delta"),
        )
        .withColumn("_k", F.lit("all"))
    )
    out = deltas.groupBy("_k").applyInPandasWithState(
        _make_backlog_fn(),
        outputStructType="_k string, day_us long, delta long, backlog long",
        stateStructType="cur_d long, cur_delta long, backlog long",
        outputMode="append",
        timeoutConf="NoTimeout",
    )
    return out.select(
        F.timestamp_micros(F.col("day_us")).cast("date").alias("day"),
        "delta",
        "backlog",
    )
