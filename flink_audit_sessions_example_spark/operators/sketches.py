"""Sketch aggregations — the 100 TB path for distinct counts and
percentiles.

The exact operators these approximate (``dedup_count``'s
``count_distinct``, ``rel_quantiles``' sort-based ``percentile``) shuffle
or sort data proportional to the key cardinality; at 100 TB the sketch
variants are the only sane default: HyperLogLog++ (``approx_count_distinct``)
keeps a fixed ~KB register set per group and merges map-side, and the
t-digest-style ``approx_percentile`` streams in one pass with bounded
state. Both are JVM aggregates inside whole-stage codegen — the plan
shape (partial → merge → final) is identical to any other hash agg, so
every scale property of the exact plans carries over with O(1) state.

These are NOT in the DuckDB-oracle registry: HLL/t-digest register
layouts are engine-specific, so cross-engine value-hashing is impossible
by construction. The correctness gate is the documented ERROR BOUND,
pinned by pytest against the exact twins (`tests/test_sketches.py`) —
the same contract a production pipeline relies on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def approx_distinct_by(
    df: DataFrame,
    key_cols: list[str],
    distinct_col: str,
    *,
    rsd: float = 0.05,
) -> DataFrame:
    """Approximate distinct-count per group (HyperLogLog++).

    ``rsd`` is the target relative standard deviation (Spark default
    0.05 → ~1.6 KB of registers per group). Output columns:
    ``key_cols…, approx_distinct``.
    """
    return df.groupBy(*key_cols).agg(
        F.approx_count_distinct(distinct_col, rsd).alias("approx_distinct")
    )


def exact_distinct_by(
    df: DataFrame, key_cols: list[str], distinct_col: str
) -> DataFrame:
    """Exact twin of :func:`approx_distinct_by` (the verification side of
    the error-bound test; at scale it shuffles every distinct value)."""
    return df.groupBy(*key_cols).agg(
        F.count_distinct(distinct_col).alias("exact_distinct")
    )


def approx_quantiles_by(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    *,
    probabilities: tuple[float, ...] = (0.25, 0.5, 0.75),
    accuracy: int = 10_000,
) -> DataFrame:
    """Approximate grouped percentiles in ONE streaming pass
    (``approx_percentile``; rank error ≤ 1/accuracy).

    The exact twin is ``rel_quantiles``' sort-based ``percentile`` —
    right for small groups, wrong for a 100 TB global percentile where
    the sketch is the only single-pass option. Output: one
    ``p_<percent>`` column per requested probability.
    """
    probs = ", ".join(f"{p}D" for p in probabilities)
    # backtick-quote the identifier (escaping embedded backticks) so names
    # with spaces/dots/hyphens/keywords resolve like every Column-based API
    quoted = value_col.replace("`", "``")
    agg = F.expr(
        f"approx_percentile(`{quoted}`, array({probs}), {accuracy})"
    ).alias("_q")
    out = df.groupBy(*key_cols).agg(agg)
    return out.select(
        *key_cols,
        *[
            F.element_at("_q", i + 1).alias(f"p_{int(p * 100)}")
            for i, p in enumerate(probabilities)
        ],
    )
