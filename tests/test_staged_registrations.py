"""The staged-registration gate: every (query, oracle) pair waiting in
``plans/staged.py`` for an r10+ drain slot is replayed against DuckDB
TODAY, exactly the way the driver will run it — hash parity AND the
non-vacuity check (spark_rows > 0; the r8 multimodal_phash_pairs
lesson) — so the queue cannot rot while it waits. Also pins the
no-shadowing invariant against the live registry."""

from __future__ import annotations

import pytest
from conftest import SF_DIR
from oracle_utils import assert_parity

from flink_audit_sessions_example_spark.plans import QUERIES
from flink_audit_sessions_example_spark.plans.staged import (
    STAGED_ORACLES,
    STAGED_QUERIES,
)


def test_staged_sets_are_consistent():
    assert set(STAGED_QUERIES) == set(STAGED_ORACLES)
    shadowed = set(STAGED_QUERIES) & set(QUERIES)
    assert not shadowed, f"staged keys shadow live registry: {shadowed}"


@pytest.mark.parametrize("key", sorted(STAGED_QUERIES))
def test_staged_pair_matches_duckdb_and_is_nonvacuous(spark, key):
    df = STAGED_QUERIES[key](spark, SF_DIR)
    assert df.count() > 0, f"{key}: vacuous oracle (0 spark rows)"
    assert_parity(df, STAGED_ORACLES[key], SF_DIR)
