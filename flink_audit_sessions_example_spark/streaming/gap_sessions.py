"""Streaming gap sessions — the NATIVE Structured Streaming twin of
``operators/timeseries.py::gap_sessions``, built on Spark's own
``session_window`` aggregation (no custom state function: session
merging, watermark-driven finalization and state eviction are the
engine's — exactly what the reference's Flink job delegates to its
session windows, flink-audit-sessions-example `App.java:79-110`).

Boundary agreement, stated precisely: the batch twin opens a new
session on a silence STRICTLY longer than the gap (diff == gap
continues), and Spark's ``session_window`` likewise merges events at
exactly-gap distance — so the two formulations agree on every
boundary (the verify-skill gotcha pins this pairing). Output maps the
window back to the batch twin's columns: ``session_start`` is the
window start, ``session_end`` is ``window.end − gap`` (a session
window's end is last-event + gap BY DEFINITION, so subtracting the gap
recovers the last event's timestamp exactly — integer interval
arithmetic, no float), ``duration_secs`` the same floor-div the batch
twin uses. ``session_seq`` does NOT exist here: a per-key global
sequence number needs total history, which is precisely what a
watermarked stream evicts — consumers key on ``(key, session_start)``
(unique per key: sessions never overlap), and the equality test joins
the two relations on exactly that.

Emission: APPEND mode — a session row emits once, FINALIZED, when the
watermark passes ``session_end + gap``; state for the key's closed
sessions is evicted by the engine. The watermark delay is the
out-of-orderness budget: events later than it are dropped by the
ENGINE (batch has no such drop — the equality contract therefore
assumes arrival within the budget, the standing stream-twin caveat).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_gap_sessions(
    df: DataFrame,
    *,
    key_col: str,
    ts_col: str,
    gap_minutes: int = 30,
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Finalized ``(key, session_start, session_end, n_events,
    duration_secs)`` rows in append mode (see the module docstring for
    the boundary/finalization/late-data contracts — columns match the
    batch twin minus ``session_seq``).

    Type parity (review r11d): ``ts_col`` must be a true timestamp
    column (TIMESTAMP or TIMESTAMP_NTZ — the loader's parquet native
    types). Spark's event-time machinery REJECTS NTZ
    (``EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE``), so the watermark/window
    necessarily run on an LTZ cast — but ``session_start`` /
    ``session_end`` are cast BACK to the input's flavor on output, so
    consumers see the batch twin's dtypes; under the engine-wide
    pinned-UTC session contract the round-trip is wall-clock identity.
    The row-exclusion filter is the batch twin's raw ``isNotNull``,
    same rows on both sides by construction (a raw-null and a cast-null
    coincide for true timestamp columns, the stated input contract).
    """
    if gap_minutes < 1:
        raise ValueError(f"gap_minutes must be >= 1; got {gap_minutes}")
    gap = f"{gap_minutes} minutes"
    gap_interval = F.expr(f"INTERVAL '{gap_minutes}' MINUTE")
    out_type = df.schema[ts_col].dataType.simpleString()
    windowed = (
        df.where(F.col(ts_col).isNotNull())
        .select(
            F.col(key_col), F.col(ts_col).cast("timestamp").alias("_ts")
        )
        .withWatermark("_ts", watermark_delay)
        .groupBy(key_col, F.session_window("_ts", gap).alias("_w"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
    )
    # a session window ends at last-event + gap by definition;
    # subtracting the gap recovers the last event's ts EXACTLY
    # (integer interval arithmetic)
    session_end = F.col("_w.end") - gap_interval
    return windowed.select(
        key_col,
        F.col("_w.start").cast(out_type).alias("session_start"),
        session_end.cast(out_type).alias("session_end"),
        "n_events",
        # same floor-div the batch twin uses (the div-cast gotcha)
        F.floor(
            (F.unix_micros(session_end) - F.unix_micros(F.col("_w.start")))
            / F.lit(1_000_000)
        ).cast("bigint").alias("duration_secs"),
    )
