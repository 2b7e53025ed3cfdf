"""Column profiling — the ingest-gate statistics a pipeline checks before
accepting a new drop of data (null rates, cardinalities, value ranges).

One declarative aggregation produces the whole profile: Catalyst plans
the multi-``count(distinct)`` as a single scan with an Expand (each input
row fans out once per distinct-aggregate), so the cost is one pass over
the data regardless of how many columns are profiled — never one job per
column, which is the naive loop a 100 TB table cannot afford. For very
wide tables the Expand factor itself becomes the cost; ``exact=False``
switches cardinalities to HyperLogLog++ sketches (``approx_count_distinct``),
which aggregate map-side WITHOUT Expand — the 100 TB default, with the
exact mode kept for oracle checking and small tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(
    df: DataFrame,
    cols: "list[str]",
    *,
    exact: bool = True,
) -> DataFrame:
    """One row per profiled column: ``column``, ``n_rows`` (table-wide),
    ``n_nulls``, ``n_distinct`` (exact, or HLL++ estimate with
    ``exact=False`` — NULLs not counted as a distinct value), ``min_val``
    / ``max_val`` (cast to string for a uniform schema across column
    types; NULL for all-null columns).

    Shape: ONE wide aggregation (single scan; Expand for exact
    distincts, plain partial aggregation for approx) followed by a
    ``stack`` unpivot of the 1-row result — the unpivot touches one row,
    not the data. Output is O(len(cols)) rows.

    String-cast caveat: min/max are compared in the column's native type
    BEFORE the cast (``min(cast(x))`` would compare lexically and call
    "10" < "9"); floats format per-engine — profile floats with a
    rounded projection if the output feeds a cross-engine hash.
    """
    if not cols:
        raise ValueError("cols must be non-empty")
    ndv = F.count_distinct if exact else F.approx_count_distinct
    aggs = [F.count(F.lit(1)).alias("_n")]
    # positional internal aliases, original names only as string
    # literals: profiled columns may contain spaces/quotes/dashes, which
    # must never reach the stack() expression as raw identifiers
    for i, c in enumerate(cols):
        aggs += [
            # count(when) not sum(cast): SUM over an EMPTY table is
            # NULL, and an ingest gate comparing n_nulls == 0 on an
            # empty drop must read 0, not NULL
            F.count(F.when(F.col(c).isNull(), 1)).alias(f"_nulls_{i}"),
            ndv(F.col(c)).alias(f"_ndv_{i}"),
            F.min(F.col(c)).cast("string").alias(f"_min_{i}"),
            F.max(F.col(c)).cast("string").alias(f"_max_{i}"),
        ]
    wide = df.agg(*aggs)
    labels = [c.replace("\\", "\\\\").replace("'", "\\'") for c in cols]
    stack_args = ", ".join(
        f"'{label}', _nulls_{i}, _ndv_{i}, _min_{i}, _max_{i}"
        for i, label in enumerate(labels)
    )
    return wide.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS "
            "(column, n_nulls, n_distinct, min_val, max_val)"
        ),
        F.col("_n").alias("n_rows"),
    ).select("column", "n_rows", "n_nulls", "n_distinct", "min_val", "max_val")


def json_key_stats(
    df: DataFrame,
    *,
    json_col: str,
    exact: bool = True,
) -> DataFrame:
    """``xform_props_schema`` — schema discovery over a semi-structured
    JSON column: for every TOP-LEVEL key, how many rows carry it, its
    presence share, and how many distinct (stringified) values it
    takes. THE first question against an events/props payload nobody
    wrote a schema for ("which keys exist, which are constant, which
    are high-cardinality ids"), and the input to promote-to-column
    decisions in ingestion pipelines.

    Output ``(key, n_present, share, n_distinct_values)``, share =
    n_present / n_rows_with_parsable_json rounded to 6dp. Rows whose
    payload does not parse as a JSON object are excluded (and excluded
    from the share denominator — a malformed-payload audit is
    ``dq_expectations``' job, not this relation's).

    Cross-engine contract: values compare as COUNT DISTINCT of the
    engine's string form — a bijection of the underlying JSON values
    (DuckDB keeps value quoting, Spark's map parse strips it; distinct
    COUNTS agree even though the strings differ), which is why the
    relation exposes the count and never the value strings themselves.

    Plan: one scan-side ``from_json`` to ``map<string,string>`` +
    ``explode`` (JVM, no Python), then ONE distinct-style aggregation
    on (key, value) and a count rollup — the same two-exchange shape as
    every distinct-count relation here; the (key, value) partial
    collapses map-side so a constant-valued hot key ships one row per
    task.

    ``exact=False`` is the 100 TB mode (the :func:`profile_columns`
    rule): the map-side (key, value) collapse bounds CONSTANT hot keys
    but not id-like ones — a high-cardinality key (request id, session
    id) makes the exact (key, value) distinct agg the dominant shuffle,
    one row per distinct value. The approx mode replaces it with ONE
    ``approx_count_distinct(value)`` per key: HLL++ sketches merge
    map-side, so the exchange carries O(keys) sketch rows (~KB each)
    regardless of value cardinality, and ``n_present`` folds into the
    same single aggregation (no second rollup, one exchange total).
    The REGISTERED ``xform_props_schema`` query stays exact — it must
    hash-check against DuckDB; the approx twin's estimates are
    bound-checked in pytest (tests/test_profile.py) like every sketch
    here.
    """
    parsed = df.select(
        F.from_json(F.col(json_col), "map<string,string>").alias("_m")
    ).where(F.col("_m").isNotNull())
    total = parsed.agg(
        F.count(F.lit(1)).cast("bigint").alias("_n_rows")
    )
    kv = parsed.select(F.explode("_m").alias("key", "_value"))
    if exact:
        per_kv = kv.groupBy("key", "_value").agg(
            F.count(F.lit(1)).cast("bigint").alias("_c")
        )
        per_key = per_kv.groupBy("key").agg(
            F.sum("_c").cast("bigint").alias("n_present"),
            F.count(F.lit(1)).cast("bigint").alias("n_distinct_values"),
        )
    else:
        per_key = kv.groupBy("key").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_present"),
            F.approx_count_distinct("_value")
            .cast("bigint")
            .alias("n_distinct_values"),
        )
    return (
        per_key.crossJoin(F.broadcast(total))
        .select(
            "key",
            "n_present",
            F.round(
                F.col("n_present").cast("double")
                / F.col("_n_rows").cast("double"),
                6,
            ).alias("share"),
            "n_distinct_values",
        )
    )


def profile_drift(
    base: DataFrame,
    new: DataFrame,
    cols: "list[str]",
    *,
    exact: bool = True,
) -> DataFrame:
    """Side-by-side :func:`profile_columns` of two drops of the same
    table — the schema-drift gate an ingest pipeline runs between
    yesterday's accepted snapshot and tonight's candidate: one row per
    column with both profiles and their deltas — ``null_rate_base`` /
    ``null_rate_new`` / ``null_rate_delta`` (absolute-rate gap, 6dp
    exact-integer divisions), ``distinct_ratio`` (new/base cardinality,
    NULL when the base column had none), and ``range_changed`` (either
    string-cast extreme moved — the cheap "did the domain shift"
    tripwire; NULL-safe so an all-null column compares equal to
    itself).

    Scale shape: exactly two :func:`profile_columns` scans (each one
    wide aggregation) joined on the O(len(cols)) profile relations —
    drift never touches row-level data a third time. ``exact=False``
    flips both profiles to HLL++ cardinalities for very wide tables
    (the profile_columns rule); the drift arithmetic is unchanged.
    """
    pb = profile_columns(base, cols, exact=exact)
    pn = profile_columns(new, cols, exact=exact)
    b = pb.select(
        "column",
        F.col("n_rows").alias("n_rows_base"),
        F.col("n_nulls").alias("_nulls_b"),
        F.col("n_distinct").alias("n_distinct_base"),
        F.col("min_val").alias("_min_b"),
        F.col("max_val").alias("_max_b"),
    )
    n = pn.select(
        "column",
        F.col("n_rows").alias("n_rows_new"),
        F.col("n_nulls").alias("_nulls_n"),
        F.col("n_distinct").alias("n_distinct_new"),
        F.col("min_val").alias("_min_n"),
        F.col("max_val").alias("_max_n"),
    )
    rate_b = F.when(
        F.col("n_rows_base") > 0,
        F.round(F.col("_nulls_b") / F.col("n_rows_base"), 6),
    )
    rate_n = F.when(
        F.col("n_rows_new") > 0,
        F.round(F.col("_nulls_n") / F.col("n_rows_new"), 6),
    )
    return b.join(n, "column").select(
        "column",
        "n_rows_base",
        "n_rows_new",
        "n_distinct_base",
        "n_distinct_new",
        rate_b.alias("null_rate_base"),
        rate_n.alias("null_rate_new"),
        F.round(F.abs(rate_n - rate_b), 6).alias("null_rate_delta"),
        F.when(
            F.col("n_distinct_base") > 0,
            F.round(
                F.col("n_distinct_new") / F.col("n_distinct_base"), 6
            ),
        ).alias("distinct_ratio"),
        (
            ~(F.col("_min_b").eqNullSafe(F.col("_min_n")))
            | ~(F.col("_max_b").eqNullSafe(F.col("_max_n")))
        ).alias("range_changed"),
    )
