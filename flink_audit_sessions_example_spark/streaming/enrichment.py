"""Stream-static point-in-time enrichment — the streaming consumer of
:func:`~..operators.history.scd2_history` output.

``stream_pit_enrich`` joins a fact STREAM against a STATIC SCD2
dimension on interval membership — Spark's native stream-static join:
stateless (no watermark, no state store — the static side is not a
stream, so nothing buffers), evaluated per micro-batch, LEFT semantics
preserving every fact row. Under the dimension's non-overlap contract
each fact matches at most one version, so row counts are stable — the
same guarantee the batch :func:`~..operators.asof.pit_join` documents.

Why a JOIN here when the batch twin deliberately avoids one: the batch
operator processes history-scale fact volumes where a non-equi join
degenerates to per-key nested loops — its sorted-union merge-scan is
the right plan for a full-corpus pass. A micro-batch is increment-
sized, and the static dimension is broadcast once (Catalyst plans a
BroadcastNestedLoopJoin or broadcast hash join with residual range
filter); per-batch cost is O(|batch| · |key's versions|) with the
versions-per-key factor bounded by dimension churn, not fact volume.

Snapshot caveat, stated plainly: the static side is resolved ONCE at
query start — a dimension that changes underneath needs the stream
restarted (or a ``foreachBatch`` re-read) to see new versions. That is
the standard Spark stream-static contract, and for TRAINING-data
enrichment it is usually the point: you pin the dimension snapshot the
run should see.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_pit_enrich(
    facts: DataFrame,
    dim: DataFrame,
    *,
    key_cols: "list[str]",
    ts_col: str,
    valid_from_col: str = "valid_from",
    valid_to_col: str = "valid_to",
    payload_cols: "list[str]",
) -> DataFrame:
    """Enrich a streaming fact relation with the dimension version
    valid at each fact's timestamp (see the module docstring for the
    stateless/snapshot contracts). Output: the fact columns plus
    ``payload_cols`` and ``valid_from`` — the batch ``pit_join``'s
    column contract, so consumers can swap the two."""
    d = dim.select(
        *[F.col(c).alias(f"_dk_{c}") for c in key_cols],
        F.col(valid_from_col).alias("_vf"),
        F.col(valid_to_col).alias("_vt"),
        *[F.col(c).alias(f"_p_{c}") for c in payload_cols],
    )
    cond = F.lit(True)
    for c in key_cols:
        # eqNullSafe, not ==: the batch pit_join's window PARTITIONS
        # NULL keys together (they enrich like any other key), and the
        # "consumers swap freely" contract holds only if the join does
        # the same — a bare equality would silently NULL them out
        cond = cond & facts[c].eqNullSafe(d[f"_dk_{c}"])
    cond = (
        cond
        & (d["_vf"] <= facts[ts_col])
        & (d["_vt"].isNull() | (facts[ts_col] < d["_vt"]))
    )
    return facts.join(d, cond, "left").select(
        *facts.columns,
        *[F.col(f"_p_{c}").alias(c) for c in payload_cols],
        F.col("_vf").alias(valid_from_col),
    )
