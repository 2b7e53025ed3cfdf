"""Continuous CUSUM drift monitoring — the streaming twin of
``operators/timeseries.py::cusum_changepoints(target_rate=...)``, with
O(1) state per key.

Only the FIXED-REFERENCE mode streams: the mean-centered batch mode
needs the whole series' mean before the first deviation exists, which
is exactly why industrial CUSUM monitors run against a reference rate
(an SLO, a trained baseline) — and that recursion folds with nine
scalars per key: the open bucket ``(bucket_us, count)``, the deviation
prefix sum ``p`` with its running extremes ``min_p``/``max_p``
(initialized to P₀ = 0), and the two peaks with their argmax buckets.
The prefix-sum identity the batch operator uses (S⁺ = P − min P) is
literally the state update — the batch windows and the stream fold are
the same arithmetic, in the same exact-integer domain, so equality is
bitwise, not approximate.

Bucket-closing contract: a bucket's deviation enters the statistic
only when a LATER bucket's first event arrives (the open bucket's
count is still growing — emitting it would double-count on the next
event). The twin therefore equals the batch operator applied to the
CLOSED buckets — every bucket strictly before each key's latest — and
the parity test pins exactly that. Gap buckets: both sides skip absent
buckets rather than zero-filling them (the batch twin aggregates
present buckets only); a zero-filled variant is a gapfill_resample
composition upstream of either.

Arrival/emission contracts (the ``stream_transitions`` wording):
per-key event-time-ordered arrival across micro-batches (intra-batch
disorder is repaired by a sort); each micro-batch emits one SNAPSHOT
row per touched key (append mode) — downstream keeps the latest row
per key, there is nothing to sum. Snapshots are idempotent under
re-delivery of a whole batch, but a re-delivered PARTIAL batch
double-counts the open bucket — the same at-least-once caveat every
keyed fold here states.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _make_cusum_fn(target: int):
    """The state fn yields its grouping key explicitly —
    applyInPandasWithState does not prepend it, and a per-key snapshot
    without its key is unusable downstream."""
    def fn(key, pdfs, state):
        import pandas as pd

        us_list = []
        for pdf in pdfs:
            for us in pdf["_bus"]:
                if us is None or pd.isna(us):
                    continue
                us_list.append(int(us))
        if not us_list:
            return
        us_list.sort()
        if state.exists:
            (cur_b, cur_x, p, min_p, max_p,
             peak_su, su_b, peak_sd, sd_b, n_closed) = state.get
        else:
            cur_b, cur_x = None, 0
            p, min_p, max_p = 0, 0, 0
            peak_su, su_b, peak_sd, sd_b = 0, None, 0, None
            n_closed = 0

        def close_bucket():
            nonlocal p, min_p, max_p, peak_su, su_b, peak_sd, sd_b
            nonlocal n_closed
            p += cur_x - target
            min_p = min(min_p, p)
            max_p = max(max_p, p)
            su = p - min_p
            sd = max_p - p
            # strictly-greater: ties keep the EARLIEST peak, matching
            # the batch argmax order (_su DESC, _b ASC)
            if su > peak_su:
                peak_su, su_b = su, cur_b
            if sd > peak_sd:
                peak_sd, sd_b = sd, cur_b
            n_closed += 1

        for bus in us_list:
            if cur_b is None:
                cur_b, cur_x = bus, 1
            elif bus == cur_b:
                cur_x += 1
            elif bus > cur_b:
                close_bucket()
                cur_b, cur_x = bus, 1
            # bus < cur_b: late event for a closed bucket — dropped,
            # per the ordered-arrival contract
        state.update(
            (cur_b, cur_x, p, min_p, max_p,
             peak_su, su_b, peak_sd, sd_b, n_closed)
        )
        yield pd.DataFrame(
            {
                "_k": [key[0]],
                "n_closed": [int(n_closed)],
                "cusum_up": [float(peak_su)],
                "up_bucket_us": [su_b],
                "cusum_down": [float(peak_sd)],
                "down_bucket_us": [sd_b],
                "open_bucket_us": [cur_b],
            }
        )

    return fn


def stream_cusum(
    df: DataFrame,
    *,
    key_col: str = "event_type",
    ts_col: str = "ts",
    bucket: str = "hour",
    target_rate: int = 0,
) -> DataFrame:
    """Per-micro-batch CUSUM snapshots (append mode; see the module
    docstring for the bucket-closing / arrival / re-delivery
    contracts). Output ``(key_col, n_closed, cusum_up, up_bucket,
    cusum_down, down_bucket, open_bucket)`` with peak values in count
    units and argmax buckets as timestamps — the latest row per key
    equals ``cusum_changepoints(target_rate=...)`` over that key's
    closed buckets, INCLUDING the zero-peak case: when a drift never
    rises above 0 the strictly-greater peak update never fires, the
    bucket stays NULL, and the batch operator agrees (its argmax is
    gated on ``peak > 0``), so stream≡batch is unconditional."""
    if target_rate != int(target_rate):
        raise ValueError(
            f"target_rate must be an integer; got {target_rate!r}"
        )
    ts = F.col(ts_col).cast("timestamp")
    keyed = df.where(
        ts.isNotNull() & F.col(key_col).isNotNull()
    ).select(
        F.col(key_col).alias("_k"),
        F.unix_micros(F.date_trunc(bucket, ts)).alias("_bus"),
    )
    key_type = df.schema[key_col].dataType.simpleString()
    out = keyed.groupBy("_k").applyInPandasWithState(
        _make_cusum_fn(int(target_rate)),
        outputStructType=(
            f"_k {key_type}, "
            "n_closed long, cusum_up double, up_bucket_us long, "
            "cusum_down double, down_bucket_us long, open_bucket_us long"
        ),
        stateStructType=(
            "cur_b long, cur_x long, p long, min_p long, max_p long, "
            "peak_su long, su_b long, peak_sd long, sd_b long, "
            "n_closed long"
        ),
        outputMode="append",
        timeoutConf="NoTimeout",
    )
    return out.select(
        F.col("_k").alias(key_col),
        "n_closed",
        "cusum_up",
        F.timestamp_micros(F.col("up_bucket_us")).alias("up_bucket"),
        "cusum_down",
        F.timestamp_micros(F.col("down_bucket_us")).alias("down_bucket"),
        F.timestamp_micros(F.col("open_bucket_us")).alias("open_bucket"),
    )
