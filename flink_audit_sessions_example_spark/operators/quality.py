"""Data-quality audit operators.

``referential_audit`` checks foreign-key edges across a star/snowflake
schema in one DataFrame: per edge, how many fact rows point at a parent
key that does not exist. The admission gate every warehouse load and
every training-data join runs before trusting a join's row counts —
an orphaned FK silently DROPS rows from inner joins and NULL-pollutes
left joins, and at 100 TB nobody eyeballs that.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def referential_audit(
    edges: "list[tuple[str, DataFrame, str, DataFrame, str]]",
) -> DataFrame:
    """Audit FK → PK edges: ``edges`` is a list of ``(edge_name, fact,
    fk_col, dim, pk_col)``. Output one row per edge — ``(edge,
    fact_rows, orphan_rows, distinct_orphan_keys)`` — where a row is an
    orphan when its FK value has no matching PK row. NULL FKs are NOT
    orphans (SQL FK semantics: a null reference is absent, not
    dangling); they are excluded from ``fact_rows`` too, so
    ``orphan_rows/fact_rows`` reads as "share of actual references that
    dangle".

    Plan, per edge: project the fact table to its single FK column
    (column pruning reaches the scan — the audit never reads payload
    bytes), LEFT join the dim's distinct PK relation, and aggregate
    counts in one pass. The dim side is distinct-key only and joins
    broadcast when small (TPC-H dims; Catalyst/AQE decide by size —
    no hint needed for the general case, since a genuinely huge dim
    must shuffle anyway). All edges union into one DAG, so one action
    audits the whole schema; each edge's subtree is independent and
    schedules in parallel.

    Orphan DETECTION is exercised, not assumed: callers that want a
    non-vacuous check plant known-dangling rows (see the registered
    ``dq_referential`` query) the same way ``text_clean`` injects known
    junk — an all-zeros audit over clean data proves nothing about the
    operator.
    """
    if not edges:
        raise ValueError("referential_audit needs at least one edge")
    per_edge = []
    for name, fact, fk_col, dim, pk_col in edges:
        refs = fact.select(F.col(fk_col).alias("_fk")).where(
            F.col(fk_col).isNotNull()
        )
        pks = dim.select(F.col(pk_col).alias("_pk")).distinct()
        joined = refs.join(pks, refs["_fk"] == pks["_pk"], "left")
        agg = joined.agg(
            F.count(F.lit(1)).alias("fact_rows"),
            F.count(F.when(F.col("_pk").isNull(), 1)).alias("orphan_rows"),
            F.count_distinct(
                F.when(F.col("_pk").isNull(), F.col("_fk"))
            ).alias("distinct_orphan_keys"),
        )
        per_edge.append(
            agg.select(
                F.lit(name).alias("edge"),
                "fact_rows",
                "orphan_rows",
                "distinct_orphan_keys",
            )
        )
    out = per_edge[0]
    for df in per_edge[1:]:
        out = out.unionByName(df)
    return out
