"""As-of (point-in-time) join — an operator Spark lacks natively.

Implemented as the classic *sorted-union* composition: tag both inputs,
union them, and take ``last(value, ignorenulls=True)`` over a per-key
window ordered by (time, tiebreak) with frame (-inf, -1). This keeps the
whole operator inside Catalyst — one shuffle on the key, one sort within
partitions, no Python — which is exactly how a 100 TB as-of join should
run: identical cost profile to a window aggregation, no range cross-join.

The same pattern generalizes to two-table as-of joins: union the right
table's (key, time, value) rows into the left with a side marker and read
the carried-forward value off the left rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_prior_value(
    df: DataFrame,
    *,
    key_col: str,
    time_col: str,
    tiebreak_col: str,
    source_pred: Column,
    value_col: str,
    out_col: str,
) -> DataFrame:
    """Attach, to every row, the most recent strictly-preceding value of
    ``value_col`` among rows satisfying ``source_pred`` with the same key.

    "Preceding" is the total order (``time_col``, ``tiebreak_col``) — the
    tiebreak makes the result deterministic when timestamps collide. Rows
    with no prior source row get NULL (left-outer as-of semantics).
    """
    w = (
        Window.partitionBy(key_col)
        .orderBy(time_col, tiebreak_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carried = F.last(
        F.when(source_pred, F.col(value_col)), ignorenulls=True
    ).over(w)
    return df.withColumn(out_col, carried)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    key_col: str,
    left_time: str,
    right_time: str,
    value_col: str,
    out_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Two-table backward as-of join via the sorted-union composition.

    For each left row: the ``value_col`` of the latest right row with
    ``right_time <= left_time`` (pandas
    ``merge_asof(allow_exact_matches=True)`` semantics — right rows sort
    before left rows at equal timestamps, so exact matches are always
    visible). Among equal-time right rows the greatest ``tiebreak_col``
    wins; ``tiebreak_col`` must exist on both sides and make ordering
    total so results are deterministic. Returns the left rows plus
    ``out_col``; NULL when no at-or-before right row exists.
    """
    lt = left.select(
        key_col,
        F.col(left_time).alias("_t"),
        F.col(tiebreak_col).alias("_tb"),
        F.lit(None).cast(right.schema[value_col].dataType).alias("_v"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_row"),
    )
    rt = right.select(
        key_col,
        F.col(right_time).alias("_t"),
        F.col(tiebreak_col).alias("_tb"),
        F.col(value_col).alias("_v"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(lt.schema["_row"].dataType).alias("_row"),
    )
    unioned = lt.unionByName(rt)
    w = (
        Window.partitionBy(key_col)
        .orderBy("_t", "_side", "_tb")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carried = F.last(F.col("_v"), ignorenulls=True).over(w)
    return (
        unioned.withColumn(out_col, carried)
        .where(F.col("_side") == 1)
        .select("_row.*", out_col)
    )


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    on: "list[str]",
    point_ts: str,
    start_col: str,
    end_col: str,
    bin_width: str = "1 hour",
    max_bins_per_interval: int = 10_000,
) -> DataFrame:
    """Point-in-interval join — every (point, interval) pair sharing the
    ``on`` keys with ``start <= point_ts < end`` (half-open, the window
    convention). Spark has no native interval join: the naive range
    predicate compiles to BroadcastNestedLoopJoin — per-partition
    quadratic, the classic 100 TB scale-killer. This is the standard
    binning rewrite (Flink's interval join / DuckDB's IEJoin territory):

    - intervals explode to one row per covered time bin
      (``sequence(floor(start/w), floor((end-1)/w))``),
    - points compute their single bin ``floor(ts/w)``,
    - equi-join on (keys…, bin) + the residual range predicate.

    Each qualifying pair matches in EXACTLY one bin (the point's), so no
    dedup pass is needed. Shuffle carries O(points + intervals ·
    bins_per_interval); pick ``bin_width`` near the typical interval
    length (1 bin ≈ 1 interval ⇒ ~2 rows shuffled per interval).
    Many-to-many semantics preserved: overlapping intervals each emit.

    Guards: empty/inverted intervals (``end <= start``) match nothing and
    are dropped before the explode (``sequence`` would otherwise generate
    a DESCENDING range — measured Spark behavior, not an error). An
    interval covering more than ``max_bins_per_interval`` bins fails the
    job loudly via ``raise_error`` instead of silently exploding the
    shuffle (a year-long interval at 1-minute bins is a config bug, not a
    workload).

    Output: all point columns + all interval columns (caller guarantees
    disjoint names, as with any Spark join). Timestamps are compared in
    microseconds (TIMESTAMP_NTZ inputs are cast; the session runs UTC).
    """
    import pandas as pd

    w_us = int(pd.Timedelta(bin_width).value // 1_000)
    if w_us <= 0:
        raise ValueError(f"bin_width must be positive, got {bin_width!r}")

    p_us = F.unix_micros(F.col(point_ts).cast("timestamp"))
    s_us = F.unix_micros(F.col(start_col).cast("timestamp"))
    e_us = F.unix_micros(F.col(end_col).cast("timestamp"))

    first_bin = F.floor(s_us / w_us)
    last_bin = F.floor((e_us - 1) / w_us)
    n_bins = last_bin - first_bin + 1
    guarded = F.when(
        n_bins > max_bins_per_interval,
        F.raise_error(
            F.concat(
                F.lit(
                    f"interval_join: interval spans more than "
                    f"{max_bins_per_interval} bins of {bin_width!r}; "
                    f"widen bin_width or split the interval (start="
                ),
                F.col(start_col).cast("string"),
                F.lit(", end="),
                F.col(end_col).cast("string"),
                F.lit(")"),
            )
        ),
    ).otherwise(F.sequence(first_bin, last_bin))

    iv = intervals.where(e_us > s_us).withColumn(
        "_ij_bin", F.explode(guarded)
    )
    pt = points.withColumn("_ij_bin", F.floor(p_us / w_us))
    cond = [pt[k] == iv[k] for k in on]
    cond.append(pt["_ij_bin"] == iv["_ij_bin"])
    joined = pt.join(iv, cond, "inner").where(
        (p_us >= s_us) & (p_us < e_us)
    )
    return joined.select(
        *[pt[c] for c in points.columns],
        *[iv[c] for c in intervals.columns if c not in on],
    )


def asof_nearest(
    left: DataFrame,
    right: DataFrame,
    *,
    key_col: str,
    left_time: str,
    right_time: str,
    value_col: str,
    out_col: str,
    tiebreak_col: str,
    max_distance: "str | None" = None,
) -> DataFrame:
    """Nearest-event as-of join: for each left row, the ``value_col`` of
    the right row (same key) whose time is CLOSEST in either direction —
    pandas ``merge_asof(direction='nearest', tolerance=...)`` semantics,
    ties (equidistant before/after) resolved BACKWARD (the past wins:
    at-or-before beats strictly-after at equal distance, matching
    pandas). ``max_distance`` (a day-time duration string parsed by
    ``pandas.Timedelta``, e.g. ``'2 days'`` — calendar units like
    months have no fixed width and are rejected) NULLs matches farther
    than the horizon in both directions.

    Same sorted-union composition as :func:`asof_join` — one shuffle on
    the key, one sort, and ONE WindowExec evaluating both directed
    frames (preceding ``last`` / following ``first`` share the window's
    partition+order spec, so Catalyst plans them in a single window
    node): the cost profile of a window aggregation, never a range
    self-join. Among equal-time right rows the greatest
    ``tiebreak_col`` wins backward and the smallest wins forward (frame
    boundary order), keeping results deterministic under a total
    (time, tiebreak) order.
    """
    vtype = right.schema[value_col].dataType
    payload = F.struct(
        F.col("_t").alias("t"), F.col("_tb").alias("tb"), F.col("_v").alias("v")
    )
    lt = left.select(
        key_col,
        F.col(left_time).alias("_t"),
        F.col(tiebreak_col).alias("_tb"),
        F.lit(None).cast(vtype).alias("_v"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_row"),
    )
    rt = right.select(
        key_col,
        F.col(right_time).alias("_t"),
        F.col(tiebreak_col).alias("_tb"),
        F.col(value_col).alias("_v"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(lt.schema["_row"].dataType).alias("_row"),
    )
    unioned = lt.unionByName(rt)
    base = Window.partitionBy(key_col).orderBy("_t", "_side", "_tb")
    right_payload = F.when(F.col("_side") == 0, payload)
    prev_s = F.last(right_payload, ignorenulls=True).over(
        base.rowsBetween(Window.unboundedPreceding, -1)
    )
    next_s = F.first(right_payload, ignorenulls=True).over(
        base.rowsBetween(1, Window.unboundedFollowing)
    )
    with_cands = unioned.select("*", prev_s.alias("_prev"), next_s.alias("_next"))

    d_prev = F.unix_micros(F.col("_t").cast("timestamp")) - F.unix_micros(
        F.col("_prev.t").cast("timestamp")
    )
    d_next = F.unix_micros(F.col("_next.t").cast("timestamp")) - F.unix_micros(
        F.col("_t").cast("timestamp")
    )
    if max_distance is not None:
        # duration parsed driver-side (pandas), NOT via a timestamp
        # literal + INTERVAL: epoch literals parse in the SESSION
        # timezone, so that formulation skews the horizon by the UTC
        # offset in any non-UTC session (the repo's standing
        # session-tz-proof rule). Day-time durations only — a calendar
        # tolerance ("1 month") has no fixed width and is rejected.
        import pandas as pd

        horizon_us = int(pd.Timedelta(max_distance).value // 1_000)
        if horizon_us <= 0:
            raise ValueError(
                f"max_distance must be a positive day-time duration, "
                f"got {max_distance!r}"
            )
        d_prev = F.when(d_prev <= horizon_us, d_prev)
        d_next = F.when(d_next <= horizon_us, d_next)
    prev_ok = F.col("_prev").isNotNull() & d_prev.isNotNull()
    next_ok = F.col("_next").isNotNull() & d_next.isNotNull()
    pick = (
        F.when(prev_ok & (~next_ok | (d_prev <= d_next)), F.col("_prev.v"))
        .when(next_ok, F.col("_next.v"))
    )
    return (
        with_cands.where(F.col("_side") == 1)
        .withColumn(out_col, pick)
        .select("_row.*", out_col)
    )


def pit_join(
    facts: DataFrame,
    dim: DataFrame,
    *,
    key_cols: "list[str]",
    ts_col: str,
    valid_from_col: str = "valid_from",
    valid_to_col: str = "valid_to",
    payload_cols: "list[str]",
    seq_col: str = "version",
) -> DataFrame:
    """Point-in-time (PIT) join — enrich each fact row with the
    dimension version whose validity interval ``[valid_from,
    valid_to)`` contains the fact's timestamp: the feature-store /
    training-set-assembly primitive that prevents time-travel leakage
    (a fact must only ever see attribute values that were current WHEN
    IT HAPPENED), and the natural consumer of
    :func:`~..operators.history.scd2_history` output. LEFT semantics:
    facts preceding every version keep their row with NULL payload;
    fact row count is always preserved.

    Caller contract: a key's validity intervals must be NON-OVERLAPPING
    (SCD2 output is, by construction — gapless too, but gaps are fine:
    a fact inside a gap gets NULL payload). Among versions sharing one
    ``valid_from`` (zero-width versions), the one carried onto the
    fact is the LONGEST-LIVED (``valid_to`` ordered with NULL as
    +infinity, then ``seq_col``) — under non-overlap that is exactly
    the only one whose interval can contain any instant ≥ the shared
    start, so a zero-width version can never shadow a real one
    regardless of how sequence numbers were assigned (ordering by seq
    alone would NULL a fact when a zero-width version carries the
    higher seq).

    Plan — the sorted-union composition (:func:`asof_join`'s shape),
    NOT a range-predicate join: version rows and fact rows union into
    one relation, ONE keyed exchange + ONE window sorted by ``(t,
    side, valid_to∞, seq)`` carries the latest-seen version struct
    onto every fact row (O(1) running state per key, streaming frame),
    and a residual validity filter handles gapped dimensions. A
    non-equi-join formulation (the oracle states semantics that way)
    degenerates to per-key nested loops at scale; this is a merge-scan.
    Dim rows sort BEFORE facts at equal timestamps, so a fact exactly
    at a version boundary sees the NEW version (half-open interval
    semantics).
    """
    pay = F.struct(
        *[F.col(c) for c in payload_cols],
        F.col(valid_from_col).alias("_vf"),
        F.col(valid_to_col).alias("_vt"),
    )
    # zero-width-version tiebreak: at a shared valid_from, versions
    # sort by valid_to (NULL = +infinity LAST) so the longest-lived —
    # the only interval that can contain any instant >= the shared
    # start under non-overlap — is the one carried; seq only breaks
    # exact (from, to) duplicates deterministically
    vt_inf = F.coalesce(
        F.col(valid_to_col).cast("timestamp"),
        F.lit("9999-12-31 23:59:59").cast("timestamp"),
    )
    dt_ = dim.select(
        *key_cols,
        F.col(valid_from_col).alias("_t"),
        vt_inf.alias("_vt_ord"),
        F.col(seq_col).cast("long").alias("_seq"),
        F.lit(0).alias("_side"),
        pay.alias("_pay"),
        F.lit(None)
        .cast(
            facts.select(
                F.struct(*[F.col(c) for c in facts.columns]).alias("s")
            ).schema["s"].dataType
        )
        .alias("_row"),
    )
    ft = facts.select(
        *key_cols,
        F.col(ts_col).alias("_t"),
        F.lit(None).cast("timestamp").alias("_vt_ord"),
        F.lit(0).cast("long").alias("_seq"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(dt_.schema["_pay"].dataType).alias("_pay"),
        F.struct(*[F.col(c) for c in facts.columns]).alias("_row"),
    )
    w = (
        Window.partitionBy(*key_cols)
        .orderBy("_t", "_side", "_vt_ord", "_seq")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carried = F.last(F.col("_pay"), ignorenulls=True).over(w)
    valid = carried.isNotNull() & (
        carried.getField("_vt").isNull()
        | (F.col("_t") < carried.getField("_vt"))
    )
    picked = F.when(valid, carried)
    return (
        dt_.unionByName(ft)
        .withColumn("_hit", picked)
        .where(F.col("_side") == 1)
        .select(
            "_row.*",
            *[
                F.col("_hit").getField(c).alias(c)
                for c in payload_cols
            ],
            F.col("_hit").getField("_vf").alias(valid_from_col),
        )
    )
