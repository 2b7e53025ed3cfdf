"""Stream-stream joins — the watermarked interval join.

The reference job never joins two streams, but any production audit
pipeline eventually correlates one event stream with another ("which
denied requests happened within N minutes of an allowed request by the
same user" — privilege-escalation triage). Spark's stream-stream inner
join is the right tool, and its state contract is the whole design
problem at scale:

- BOTH sides are buffered in the state store until the watermark proves
  no future match can arrive. Without watermarks + an event-time range
  predicate the state grows without bound — so this module REQUIRES
  both, the same make-the-contract-explicit posture as
  ``dedup.stream_dedup`` (unbounded state is never a silent default).
- With them, per-key state is bounded by (events within the interval
  bound + watermark delay) — at 1000 executors the state store shards
  by join key exactly like a shuffle, and RocksDB holds the buffers
  once they exceed heap.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    *,
    key: str,
    left_time: str,
    right_time: str,
    bound_seconds: int,
    watermark_delay: str,
    how: str = "inner",
    extra_condition: Column | None = None,
) -> DataFrame:
    """Join two event streams on ``key`` where the right event's time is
    within ``±bound_seconds`` of the left event's time.

    Both inputs are watermarked with ``watermark_delay``; the join
    condition carries the event-time range predicate Spark needs to
    derive state eviction (buffered rows older than
    ``watermark − bound`` are dropped per micro-batch). Column names of
    the two sides must be disjoint apart from ``key`` — the output keeps
    the left side's key column.

    ``how='inner'`` is the fully-supported case; outer variants require
    the watermark on the nullable side and emit NULL matches only after
    the watermark passes — semantics this helper exposes unchanged.
    """
    overlap = set(left.columns) & set(right.columns)
    if key not in left.columns or key not in right.columns:
        raise ValueError(
            f"join key {key!r} must exist on both sides "
            f"(left={left.columns}, right={right.columns})"
        )
    if overlap != {key}:
        # enforce the documented contract up front — overlapping non-key
        # columns would yield duplicate output column names that fail
        # only later (and ambiguously) when a consumer references them
        raise ValueError(
            "stream_interval_join requires the two sides' column names "
            f"to be disjoint apart from {key!r}; also shared: "
            f"{sorted(overlap - {key})} — rename or drop before joining"
        )
    lt, rt = F.col(f"l.{left_time}"), F.col(f"r.{right_time}")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (rt >= lt - F.expr(f"INTERVAL {bound_seconds} SECONDS"))
        & (rt <= lt + F.expr(f"INTERVAL {bound_seconds} SECONDS"))
    )
    if extra_condition is not None:
        cond = cond & extra_condition
    l = left.withWatermark(left_time, watermark_delay).alias("l")
    r = right.withWatermark(right_time, watermark_delay).alias("r")
    joined = l.join(r, cond, how)
    keep = [F.col(f"l.{c}") for c in left.columns] + [
        F.col(f"r.{c}") for c in right.columns if c != key
    ]
    return joined.select(*keep)


def denied_near_allowed(
    audits: DataFrame,
    *,
    bound_seconds: int = 1200,
    watermark_delay: str = "2 days",
) -> DataFrame:
    """Each denied audit event paired with the same user's allowed events
    within ``±bound_seconds`` — the correlation query over the
    reference's parsed audit schema (reqUser / result / evtTime), as a
    stream-stream interval join. Output: one row per (denied, allowed)
    pair with both timestamps."""
    denied = audits.where(F.col("result") != 1).select(
        "reqUser",
        F.col("evtTime").alias("denied_time"),
        F.col("event_count").alias("denied_count"),
    )
    allowed = audits.where(F.col("result") == 1).select(
        "reqUser",
        F.col("evtTime").alias("allowed_time"),
    )
    return stream_interval_join(
        denied,
        allowed,
        key="reqUser",
        left_time="denied_time",
        right_time="allowed_time",
        bound_seconds=bound_seconds,
        watermark_delay=watermark_delay,
    )
