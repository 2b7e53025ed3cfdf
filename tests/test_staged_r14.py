"""The r14 staged-registration gate (the staging protocol that drained
green in r10 and r11): every (query, oracle) pair waiting in
``plans/staged_r14.py`` for an r14 window slot is replayed against
DuckDB TODAY, exactly the way the driver will run it — hash parity AND
the non-vacuity check — so the queue cannot rot while it waits. Also
pins no-shadowing against the live registry."""

from __future__ import annotations

import pytest
from conftest import SF_DIR
from oracle_utils import assert_parity

from flink_audit_sessions_example_spark.plans import QUERIES
from flink_audit_sessions_example_spark.plans.staged_r14 import (
    STAGED_R14_ORACLES,
    STAGED_R14_QUERIES,
)


def test_staged_r14_sets_are_consistent():
    assert set(STAGED_R14_QUERIES) == set(STAGED_R14_ORACLES)
    shadowed = set(STAGED_R14_QUERIES) & set(QUERIES)
    assert not shadowed, f"staged r14 keys already live: {shadowed}"


@pytest.mark.parametrize("key", sorted(STAGED_R14_QUERIES))
def test_staged_r14_pair_matches_duckdb_and_is_nonvacuous(spark, key):
    df = STAGED_R14_QUERIES[key](spark, SF_DIR)
    assert_parity(df, STAGED_R14_ORACLES[key], SF_DIR, min_rows=1)
