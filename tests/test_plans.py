"""Physical-plan assertions: the 100 TB properties (pushdown, pruning,
broadcast placement) must be visible in `explain`, not just hoped for."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from flink_audit_sessions_example_spark.plans import QUERIES

from conftest import SF_DIR


def _plan(spark, key):
    buf = io.StringIO()
    with redirect_stdout(buf):
        QUERIES[key](spark, SF_DIR).explain("formatted")
    return buf.getvalue()


def test_filtered_scan_pushes_predicates_and_prunes_columns(spark):
    plan = _plan(spark, "rel_filtered_scan")
    assert "PushedFilters" in plan
    # range + equality predicates reach the parquet reader
    assert "GreaterThanOrEqual(l_shipdate" in plan
    assert "EqualTo(l_returnflag,R)" in plan
    assert "GreaterThan(l_discount" in plan
    # projection pruned to the 4 referenced columns (no full-width scan)
    read = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "l_orderkey" not in read and "l_partkey" not in read


def test_pricing_summary_scan_reads_only_needed_columns(spark):
    plan = _plan(spark, "rel_pricing_summary")
    read = next(l for l in plan.splitlines() if "ReadSchema" in l)
    for col in ("l_quantity", "l_extendedprice", "l_discount"):
        assert col in read
    assert "l_shipdate" not in read


def test_dimension_joins_are_broadcast(spark):
    plan = _plan(spark, "rel_top_customers")
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan


def test_clean_corpus_scans_documents_once(spark):
    """The dedup survivor is kept through the aggregation itself
    (min(struct)), so the pipeline needs ONE documents scan — no second
    scan + re-join on doc_id."""
    plan = _plan(spark, "pipeline_clean_corpus")
    # formatted explain prints each scan twice (tree line + detail block)
    assert plan.count("Scan parquet") == 2
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan


def test_session_query_has_single_group_exchange(spark):
    plan = _plan(spark, "win_session")
    # one hash exchange on the grouping key feeds the session-window
    # aggregation; no extra repartitions snuck in
    assert "session_window" in plan or "SessionWindow" in plan
    read = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "props" not in read  # unused wide column pruned from the scan
