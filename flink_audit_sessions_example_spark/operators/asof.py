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
