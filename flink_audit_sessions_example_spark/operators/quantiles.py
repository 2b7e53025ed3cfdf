"""Distributed EXACT grouped percentiles — selection, not sort.

Spark's exact ``percentile`` aggregate keeps a value→count map per group
in ONE aggregation buffer on one reducer: memory is O(distinct values
per group), which looks fine on repetitive test data but is O(rows) for
continuous measures — real money/latency/score columns at 100 TB.
Measured (60M rows, 3 groups, 3 GiB JVM): on 100×-replicated prices
(distincts unchanged) the builtin finishes in 10.6 s, but with
per-row-jittered UNIQUE prices it dies in ``OutOfMemoryError`` while
this operator completes in ~36 s in the same JVM — its per-task memory
is bounded by the RANGE PARTITIONING chunk size, never by group size or
distinct count. (The ``row_number() OVER (PARTITION BY group)`` window
formulation funnels identically — a whole group's rows sort on one
task.) The sketch twin (``operators/sketches.py::approx_quantiles_by``)
bounds state but is approximate; this module is the exact-AND-bounded
point in the trade-off space.

Algorithm (all built-in DataFrame ops, no Python in the row path):

1. ``repartitionByRange(N, group, value, tiebreak)`` — a sampled range
   exchange; the per-row tiebreak splits heavy equal-value runs across
   partitions (any order among equals is a valid total order, and equal
   values interpolate to themselves, so ranks among duplicates are
   interchangeable).
2. Per-(partition, group) row counts — an ``N × groups`` relation,
   aggregated map-side; broadcast.
3. Prefix sums of those counts per group (window over the TINY counts
   relation ordered by partition id) → each chunk's global rank offset.
4. ``row_number()`` windowed by (partition-id, group) — each window
   partition is one chunk of one range partition, so the sort buffer is
   bounded by chunk size regardless of group size; global rank = chunk
   offset + local rank − 1.
5. The target ranks are computed per group from the exact counts
   (type-7: rank (n−1)·p and its floor/ceil neighbors); the ranked
   relation is semi-joined to those ≤ 2·|groups|·|percentiles|
   (group, rank) pairs by broadcast, so only the selected rows survive.
6. Linear interpolation ``v_lo·(1−frac) + v_hi·frac`` on the tiny picked
   relation — not just the same type-7 estimator as Spark
   ``percentile`` and DuckDB ``quantile_cont`` but the same IEEE
   expression shape (verified: ``v_lo + (v_hi−v_lo)·frac`` differs from
   both engines in the last ulp on real data; this form is
   bit-identical).

Shuffle budget: one range exchange + one (pid, group) window exchange of
the projected (group, value, tiebreak) rows, plus tiny-relation traffic —
the data moves twice, the distributed-selection floor short of iterative
multi-pass median-of-medians. Caveat: the broadcast chunk-count relation
is ``N × groups`` rows — for very-high-cardinality groups use the sketch
twin instead (this operator targets the few-groups regime that breaks
the builtin).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_grouped_percentiles(
    df: DataFrame,
    *,
    group_col: str,
    value_col: str,
    percentiles: list[float],
    n_range_partitions: int | None = None,
) -> DataFrame:
    """Exact type-7 ``percentiles`` of ``value_col`` per ``group_col``.

    Output: one row per group — ``group_col``, then one DOUBLE column
    ``p<percent>`` per requested percentile (``0.25 → p25``), each the
    exact linearly-interpolated percentile. NULL values are ignored
    (Spark ``percentile`` and DuckDB ``quantile_cont`` semantics).
    """
    spark = df.sparkSession
    n_parts = n_range_partitions or spark.sparkContext.defaultParallelism

    # per-ROW tiebreak (NOT a value hash — identical values must be able
    # to land in different partitions, or a heavy constant run defeats
    # the range split); any order among equals is valid for type-7
    vals = (
        df.select(F.col(group_col).alias("g"), F.col(value_col).alias("v"))
        .where(F.col(value_col).isNotNull())
        .withColumn("tb", F.monotonically_increasing_id())
    )
    ranged = vals.repartitionByRange(n_parts, "g", "v", "tb").withColumn(
        "pid", F.spark_partition_id()
    )

    chunk_counts = ranged.groupBy("pid", "g").agg(F.count(F.lit(1)).alias("c"))
    w_off = (
        Window.partitionBy("g")
        .orderBy("pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = chunk_counts.select(
        "pid", "g", F.coalesce(F.sum("c").over(w_off), F.lit(0)).alias("off")
    )
    totals = chunk_counts.groupBy("g").agg(F.sum("c").alias("n"))

    # type-7 target ranks per (group, percentile)
    p_arr = F.array(*[F.lit(float(p)) for p in percentiles])
    rk = (F.col("n").cast("double") - 1.0) * F.col("p")
    targets = totals.select("g", "n", F.explode(p_arr).alias("p")).select(
        "g",
        "p",
        F.floor(rk).cast("bigint").alias("k_lo"),
        F.ceil(rk).cast("bigint").alias("k_hi"),
        (rk - F.floor(rk)).alias("frac"),
    )
    need = (
        targets.select(
            F.col("g").alias("g_n"),
            F.explode(F.array("k_lo", "k_hi")).alias("k"),
        )
        .distinct()
    )

    w_rank = Window.partitionBy("pid", "g").orderBy("v", "tb")
    picked = (
        ranged.withColumn("rn", F.row_number().over(w_rank))
        .join(F.broadcast(offsets), ["pid", "g"])
        .withColumn("grank", F.col("off") + F.col("rn") - 1)
        .join(
            F.broadcast(need),
            (F.col("g") == F.col("g_n")) & (F.col("grank") == F.col("k")),
            "left_semi",
        )
        .select("g", "grank", "v")
    )
    lo = picked.select(
        F.col("g").alias("g_l"),
        F.col("grank").alias("kl"),
        F.col("v").alias("v_lo"),
    )
    hi = picked.select(
        F.col("g").alias("g_h"),
        F.col("grank").alias("kh"),
        F.col("v").alias("v_hi"),
    )
    assembled = (
        targets.join(lo, (targets.g == lo.g_l) & (targets.k_lo == lo.kl))
        .join(hi, (targets.g == hi.g_h) & (targets.k_hi == hi.kh))
        .select(
            "g",
            "p",
            (
                F.col("v_lo") * (F.lit(1.0) - F.col("frac"))
                + F.col("v_hi") * F.col("frac")
            ).alias("val"),
        )
    )
    agg_cols = [
        F.max(F.when(F.col("p") == float(p), F.col("val"))).alias(
            f"p{int(round(p * 100))}"
        )
        for p in percentiles
    ]
    return (
        assembled.groupBy("g").agg(*agg_cols).withColumnRenamed("g", group_col)
    )
