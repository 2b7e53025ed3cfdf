"""Z-order layout (`operators/bucketing.py::zorder_key/zorder_layout`).

Three gates: (a) the Morton key itself against a pure-Python bit
interleave over hand-chosen boundaries, (b) the LAYOUT claim — after
z-ordering, contiguous blocks have selective min/max ranges on EVERY
z-ordered column (what footer-stats pruning consumes), measured against
natural and single-column-sorted layouts, and (c) cross-engine
determinism of the exact-boundary mode (pre-validates a DuckDB oracle
twin: round(quantile_cont, 6) reproduces Spark's rounded percentile
edges bit-for-bit).
"""

from __future__ import annotations

import pytest
from conftest import SF_DIR

from flink_audit_sessions_example_spark.operators.bucketing import (
    zorder_key,
    zorder_layout,
)
from flink_audit_sessions_example_spark.sources import load_table


def _py_bucket(v, bnds):
    return sum(1 for b in bnds if v >= b)


def _py_zkey(vals, bnds_list, bits):
    m = len(vals)
    z = 0
    for j, (v, bnds) in enumerate(zip(vals, bnds_list)):
        b = _py_bucket(v, bnds)
        for i in range(bits):
            z |= ((b >> i) & 1) << (i * m + j)
    return z


def test_zkey_matches_python_interleave(spark):
    bx = [10.0, 20.0, 30.0]
    by = [1.0, 2.0, 3.0]
    rows = [(5, 0.5), (10, 1.0), (25, 2.5), (35, 9.9), (15, 3.0)]
    df = spark.createDataFrame(rows, "x int, y double")
    out = {
        (r.x, r.y): r.zkey
        for r in zorder_key(
            df, ["x", "y"], bits=2, boundaries={"x": bx, "y": by}
        ).collect()
    }
    for x, y in rows:
        assert out[(x, y)] == _py_zkey((x, y), (bx, by), 2), (x, y)


def test_zkey_null_lands_in_bucket_zero(spark):
    df = spark.createDataFrame(
        [(None, 5.0), (100, 5.0)], "x int, y double"
    )
    out = {
        r.x: r.zkey
        for r in zorder_key(
            df,
            ["x", "y"],
            bits=2,
            boundaries={"x": [1.0, 2.0, 3.0], "y": [1.0, 2.0, 3.0]},
        ).collect()
    }
    # y=5.0 -> bucket 3 (0b11) at odd bit positions 1,3 -> 2 + 8 = 10
    assert out[None] == _py_zkey((0, 5.0), ([], [1.0, 2.0, 3.0]), 2) == 10
    # x=100 -> bucket 3 at even positions 0,2 -> adds 1 + 4
    assert out[100] == 15


def test_zorder_validation(spark):
    df = spark.createDataFrame([(1, 2)], "x int, y int")
    with pytest.raises(ValueError, match="bits"):
        zorder_key(df, ["x", "y"], bits=0)
    with pytest.raises(ValueError, match="columns"):
        zorder_key(df, ["x"])
    with pytest.raises(ValueError, match="sorted edges"):
        zorder_key(
            df,
            ["x", "y"],
            bits=2,
            boundaries={"x": [3.0, 1.0, 2.0], "y": [1.0, 2.0, 3.0]},
        )
    # bit 63 is the bigint sign bit and Java shifts wrap mod 64 — wide
    # column lists must be rejected, not silently corrupted
    wide = spark.createDataFrame([tuple(range(8))], ", ".join(f"c{i} int" for i in range(8)))
    with pytest.raises(ValueError, match="<= 63"):
        zorder_key(wide, [f"c{i}" for i in range(8)], bits=8)
    # empty input / all-NULL column: clear error, not a TypeError
    empty = spark.createDataFrame([], "x int, y int")
    with pytest.raises(ValueError, match="empty input or all-NULL"):
        zorder_key(empty, ["x", "y"], bits=2)
    allnull = spark.createDataFrame([(None, 1), (None, 2)], "x int, y int")
    with pytest.raises(ValueError, match="'x'"):
        zorder_key(allnull, ["x", "y"], bits=2)
    with pytest.raises(ValueError, match="num_partitions"):
        zorder_layout(df, ["x", "y"], num_partitions=0)


def _block_overlap_fraction(pdf, col, lo, hi, n_blocks=64):
    """Fraction of contiguous row-blocks whose [min, max] overlaps
    [lo, hi] — exactly what parquet footer min/max pruning evaluates."""
    n = len(pdf)
    hits = 0
    for b in range(n_blocks):
        blk = pdf.iloc[b * n // n_blocks : (b + 1) * n // n_blocks][col]
        if len(blk) and not (blk.max() < lo or blk.min() > hi):
            hits += 1
    return hits / n_blocks


def test_layout_prunes_on_both_columns(spark):
    """The point of z-order: a 64-block split of the z-sorted table has
    selective block ranges on BOTH columns simultaneously — each column
    prunes to <= 45% of blocks for a ~10% range predicate (measured
    0.41/0.25, stable across bits 4-6; natural order touches 100%),
    while a
    single-column sort leaves the OTHER column unprunable (> 90% blocks
    touched) and the natural order prunes neither."""
    li = (
        load_table(spark, SF_DIR, "lineitem")
        .select("l_partkey", "l_suppkey")
        .where("l_partkey IS NOT NULL AND l_suppkey IS NOT NULL")
    )
    z = (
        zorder_key(li, ["l_partkey", "l_suppkey"], bits=6)
        .orderBy("zkey")
        .toPandas()
    )
    plain = li.toPandas()
    preds = {}
    for c in ("l_partkey", "l_suppkey"):
        lo = plain[c].quantile(0.45)
        hi = plain[c].quantile(0.55)
        preds[c] = (lo, hi)

    for c, (lo, hi) in preds.items():
        frac_z = _block_overlap_fraction(z, c, lo, hi)
        assert frac_z <= 0.45, (c, frac_z)
        assert _block_overlap_fraction(plain, c, lo, hi) > 0.90, c
        other = [o for o in preds if o != c][0]
        sorted_other = plain.sort_values(other, kind="mergesort")
        frac_anti = _block_overlap_fraction(sorted_other, c, lo, hi)
        assert frac_anti > 0.90, (c, frac_anti)


def test_zorder_layout_contiguous_ranges(spark):
    """zorder_layout range-partitions on zkey: partition zkey ranges
    must not overlap (contiguous files — the footer-stats contract)."""
    from pyspark.sql import functions as F

    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_partkey", "l_suppkey"
    )
    out = zorder_layout(
        li, ["l_partkey", "l_suppkey"], bits=6, num_partitions=8
    )
    ranges = (
        out.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(F.min("zkey").alias("lo"), F.max("zkey").alias("hi"))
        .orderBy("lo")
        .collect()
    )
    assert len(ranges) > 1
    for a, b in zip(ranges, ranges[1:]):
        assert a.hi <= b.lo, (a, b)


def test_exact_boundaries_match_duckdb(spark):
    """Cross-engine twin of exact mode: DuckDB round(quantile_cont, 6)
    must reproduce Spark's rounded percentile edges, and the full
    per-row zkey must hash-match via the same bucket arithmetic (the
    future oracle registration shape)."""
    import duckdb

    from oracle_utils import assert_parity

    bits = 4
    n = 1 << bits
    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"
    )
    df = zorder_key(
        li, ["l_partkey", "l_suppkey"], bits=bits, exact=True
    ).select("l_orderkey", "l_linenumber", "zkey")

    probs = ", ".join(repr(i / n) for i in range(1, n))
    interleave = " + ".join(
        f"(((bucket_{c} >> {i}) & 1) << {i * 2 + j})"
        for j, c in enumerate(("l_partkey", "l_suppkey"))
        for i in range(bits)
    )
    sql = f"""
    WITH bnds AS (
      SELECT list_transform(quantile_cont(l_partkey, [{probs}]),
                            x -> round(x, 6)) AS bp,
             list_transform(quantile_cont(l_suppkey, [{probs}]),
                            x -> round(x, 6)) AS bs
      FROM lineitem
    ), bucketed AS (
      SELECT l.l_orderkey, l.l_linenumber,
             len(list_filter(b.bp, e -> l.l_partkey >= e))
               AS bucket_l_partkey,
             len(list_filter(b.bs, e -> l.l_suppkey >= e))
               AS bucket_l_suppkey
      FROM lineitem l CROSS JOIN bnds b
    )
    SELECT l_orderkey, l_linenumber,
           CAST({interleave} AS BIGINT) AS zkey
    FROM bucketed
    """
    assert_parity(df, sql, SF_DIR)
