"""The r21 staged-registration gate (the staging protocol that drained
green in r10–r12): every (query, oracle) pair waiting in
``plans/staged_r21.py`` is replayed against DuckDB TODAY, exactly the
way the driver will run it — hash parity AND the non-vacuity check —
plus content non-vacuity for the degenerate-but-hash-matching
variants. All five keys are COMPOSITIONS of already-unit-tested
operators, so this gate and the oracle are their primary coverage."""

from __future__ import annotations

import pytest
from conftest import SF_DIR
from oracle_utils import assert_parity

from flink_audit_sessions_example_spark.plans import QUERIES
from flink_audit_sessions_example_spark.plans.staged_r21 import (
    RETURNED_TOP_N,
    STAGED_R21_ORACLES,
    STAGED_R21_QUERIES,
)


def test_staged_r21_sets_are_consistent():
    assert set(STAGED_R21_QUERIES) == set(STAGED_R21_ORACLES)
    shadowed = set(STAGED_R21_QUERIES) & set(QUERIES)
    assert not shadowed, f"staged r21 keys already live: {shadowed}"


@pytest.mark.parametrize("key", sorted(STAGED_R21_QUERIES))
def test_staged_r21_pair_matches_duckdb_and_is_nonvacuous(spark, key):
    df = STAGED_R21_QUERIES[key](spark, SF_DIR)
    assert_parity(df, STAGED_R21_ORACLES[key], SF_DIR, min_rows=1)


def test_staged_r21_content_is_nonvacuous(spark):
    """Degenerate variants that would still hash-match a broken
    producer: an empty/flat top-N, a single-cell seasonality grid,
    a one-source budget, an out-of-bound sketch, and a weekly rollup
    that lost mass."""
    top = STAGED_R21_QUERIES["rel_returned_items"](spark, SF_DIR).collect()
    assert len(top) == RETURNED_TOP_N
    revs = [r.return_revenue for r in top]
    assert revs == sorted(revs, reverse=True)
    assert revs[0] > 0 and len(set(revs)) > 1

    grid = STAGED_R21_QUERIES["win_dow_profile"](spark, SF_DIR).collect()
    assert len({(r.iso_dow, r.hour) for r in grid}) > 24
    assert all(1 <= r.iso_dow <= 7 and 0 <= r.hour <= 23 for r in grid)
    by_type: dict = {}
    for r in grid:
        by_type[r.event_type] = by_type.get(r.event_type, 0.0) + r.share
    for t, s in by_type.items():
        assert s == pytest.approx(1.0, abs=1e-4), t

    budget = STAGED_R21_QUERIES["corpus_token_budget"](
        spark, SF_DIR
    ).collect()
    assert len(budget) > 1
    assert sum(r.token_share for r in budget) == pytest.approx(
        1.0, abs=1e-5
    )
    assert all(r.n_tokens > 0 and r.n_docs > 0 for r in budget)

    hll = STAGED_R21_QUERIES["agg_hll_union"](spark, SF_DIR).collect()[0]
    assert hll.within_bound and hll.true_distinct >= 1

    weekly = STAGED_R21_QUERIES["xform_week_rollup"](
        spark, SF_DIR
    ).collect()
    assert len(weekly) >= 5
    # mass conservation: weekly sums equal the raw event count
    from flink_audit_sessions_example_spark.sources import load_table

    raw = (
        load_table(spark, SF_DIR, "events")
        .where("ts IS NOT NULL AND event_type IS NOT NULL")
        .count()
    )
    assert sum(r.n_events for r in weekly) == raw
