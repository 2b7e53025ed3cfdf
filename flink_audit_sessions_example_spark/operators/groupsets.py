"""Two-level grouping-sets aggregation (ROLLUP / CUBE re-aggregation).

Spark plans ``cube()``/``rollup()`` with an ``Expand`` node that
replicates EVERY input row once per grouping set — a 4-way CUBE shuffles
4× the corpus. For algebraic aggregates (COUNT, SUM — including the
exact DECIMAL sums the money queries use), the higher grouping sets are
derivable from the finest one, so this module aggregates ONCE at the
base grain (one ordinary hash agg with map-side partials; shuffle = one
row per distinct base key per task) and re-aggregates the tiny base
result per grouping set driver-side-cheap. At 100 TB that is a 4×
shuffle-volume reduction for CUBE, 3× for ROLLUP, with bit-identical
results (decimal sums are exact ⇒ re-summing group sums equals the
direct sum; the DuckDB oracles don't change).

Catalyst does not perform this rewrite itself (the Expand strategy is
fully general — it must handle non-decomposable aggregates like
count_distinct); applying it where the aggregates are known-algebraic is
the engine's job, and this module is that engine component.

``grouping_id()`` convention matches Spark/DuckDB: bit i (from the most
significant of the dims list) set ⇔ dim i is aggregated away.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def grouping_sets_agg(
    df: DataFrame,
    dims: list[str],
    dec_sums: dict[str, Column],
    sets: list[tuple[str, ...]],
) -> DataFrame:
    """Aggregate ``df`` over each grouping set in ``sets`` via one
    base-grain aggregation + re-aggregation.

    ``dec_sums`` maps output column name → the per-row DECIMAL-cast
    expression to sum (decimal ⇒ exact ⇒ decomposable). Output columns:
    ``*dims`` (NULL where aggregated away), ``n`` (row count),
    ``*dec_sums`` keys (as DOUBLE), ``gid`` (grouping id, BIGINT).
    """
    base = df.groupBy(*dims).agg(
        F.count(F.lit(1)).alias("__n"),
        *[F.sum(c).alias(f"__{name}") for name, c in dec_sums.items()],
    )
    dim_types = {d: base.schema[d].dataType for d in dims}
    parts = []
    for keep in sets:
        gid = 0
        for i, d in enumerate(dims):
            if d not in keep:
                gid |= 1 << (len(dims) - 1 - i)
        regrouped = base.groupBy(*keep).agg(
            F.sum("__n").alias("n"),
            *[F.sum(f"__{name}").alias(f"__{name}") for name in dec_sums],
        )
        parts.append(
            regrouped.select(
                *[
                    (
                        F.col(d) if d in keep else F.lit(None).cast(dim_types[d])
                    ).alias(d)
                    for d in dims
                ],
                F.col("n"),
                *[
                    F.col(f"__{name}").cast("double").alias(name)
                    for name in dec_sums
                ],
                F.lit(gid).cast("bigint").alias("gid"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def rollup_agg(
    df: DataFrame, dims: list[str], dec_sums: dict[str, Column]
) -> DataFrame:
    """ROLLUP(dims) via :func:`grouping_sets_agg` (hierarchical sets)."""
    sets = [tuple(dims[:i]) for i in range(len(dims), -1, -1)]
    return grouping_sets_agg(df, dims, dec_sums, sets)


def cube_agg(
    df: DataFrame, dims: list[str], dec_sums: dict[str, Column]
) -> DataFrame:
    """CUBE(dims) via :func:`grouping_sets_agg` (all 2^d subsets, in
    grouping-id order)."""
    from itertools import combinations

    sets: list[tuple[str, ...]] = []
    for r in range(len(dims), -1, -1):
        for combo in combinations(range(len(dims)), r):
            sets.append(tuple(dims[i] for i in combo))
    return grouping_sets_agg(df, dims, dec_sums, sets)
