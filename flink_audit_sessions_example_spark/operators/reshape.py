"""Relational reshaping operators.

``unpivot_metrics`` (melt) is the inverse of the registered
``rel_pivot``: wide metric columns become tall ``(metric, value)`` rows.
The normalization step feeding generic per-metric pipelines — anomaly
scans, metric catalogs, sparse storage — without one hand-written query
per column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def unpivot_metrics(
    df: DataFrame,
    *,
    id_cols: "list[str]",
    value_cols: "list[str]",
    metric_col: str = "metric",
    value_col: str = "value",
) -> DataFrame:
    """Melt ``value_cols`` into tall form: one output row per (input
    row × metric), ``(… id_cols …, metric, value)``. Column VALUES are
    cast to a common double; metric NAMES are the source column names.
    NULL cells are kept (a null measurement is a fact — dropping them
    would make tall-form counts disagree with the wide table's).

    Plan: built on Spark's native ``unpivot`` (the ANSI ``UNPIVOT
    INCLUDE NULLS`` expansion): a pure scan-side projection+generate —
    zero shuffles, zero joins, whole-stage codegen'd, and column
    pruning still reaches the parquet scan (only ``id_cols`` +
    ``value_cols`` are read). The 100 TB note is about the OUTPUT:
    row count multiplies by ``len(value_cols)`` while bytes stay ~flat
    (each output row carries one metric, not all of them) — size
    downstream ``spark.sql.shuffle.partitions`` for the multiplied
    row count, not the input's.
    """
    if not value_cols:
        raise ValueError("value_cols must be non-empty")
    missing = [c for c in id_cols + value_cols if c not in df.columns]
    if missing:
        raise ValueError(f"columns not in relation: {missing}")
    return df.unpivot(
        [F.col(c) for c in id_cols],
        [F.col(c).cast("double") for c in value_cols],
        metric_col,
        value_col,
    )
