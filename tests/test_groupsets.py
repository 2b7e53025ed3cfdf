"""Equivalence gate for the two-level grouping-sets re-aggregation
(operators/groupsets.py): on ANY input — including NULL dimension
values, the classic trap where a data-NULL must stay distinguishable
from an aggregate-NULL via the grouping id — `rollup_agg`/`cube_agg`
must equal Spark's built-in rollup()/cube() row-for-row."""

from __future__ import annotations

from pyspark.sql import Row, functions as F

from flink_audit_sessions_example_spark.operators import groupsets as G

ROWS = [
    Row(a="x", b="p", v=1.5),
    Row(a="x", b=None, v=2.25),  # data-NULL in dim b
    Row(a=None, b="p", v=4.0),   # data-NULL in dim a
    Row(a="y", b="q", v=8.125),
    Row(a="y", b="q", v=16.0),
    Row(a=None, b=None, v=32.5),
]


def _norm(df):
    return sorted(
        (
            (r["a"], r["b"], r["n"], float(r["sum_v"]), r["gid"])
            for r in df.collect()
        ),
        key=repr,
    )


def _builtin(df, kind):
    grouped = df.rollup("a", "b") if kind == "rollup" else df.cube("a", "b")
    return grouped.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("v").cast("decimal(18,6)")).cast("double").alias("sum_v"),
        F.grouping_id().cast("bigint").alias("gid"),
    ).select("a", "b", "n", "sum_v", "gid")


def test_rollup_agg_matches_builtin_with_null_dims(spark):
    df = spark.createDataFrame(ROWS)
    ours = G.rollup_agg(df, ["a", "b"], {"sum_v": F.col("v").cast("decimal(18,6)")})
    assert _norm(ours) == _norm(_builtin(df, "rollup"))


def test_cube_agg_matches_builtin_with_null_dims(spark):
    df = spark.createDataFrame(ROWS)
    ours = G.cube_agg(df, ["a", "b"], {"sum_v": F.col("v").cast("decimal(18,6)")})
    assert _norm(ours) == _norm(_builtin(df, "cube"))
