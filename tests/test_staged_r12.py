"""The r12 staged-registration gate (the staged.py / staged_r11
protocol): every (query, oracle) pair waiting in ``plans/staged_r12.py``
is replayed against DuckDB with hash parity + non-vacuity on every
suite run, and staged keys must not shadow live ones or the r11
queue."""

from __future__ import annotations

import pytest
from conftest import SF_DIR
from oracle_utils import assert_parity

from flink_audit_sessions_example_spark.plans import QUERIES
from flink_audit_sessions_example_spark.plans.staged_r11 import (
    STAGED_R11_QUERIES,
)
from flink_audit_sessions_example_spark.plans.staged_r12 import (
    STAGED_R12_ORACLES,
    STAGED_R12_QUERIES,
)


def test_staged_r12_sets_are_consistent():
    assert set(STAGED_R12_QUERIES) == set(STAGED_R12_ORACLES)
    shadowed = set(STAGED_R12_QUERIES) & set(QUERIES)
    assert not shadowed, f"staged r12 keys already live: {shadowed}"
    overlap = set(STAGED_R12_QUERIES) & set(STAGED_R11_QUERIES)
    assert not overlap, f"staged r12 keys collide with r11 queue: {overlap}"


@pytest.mark.parametrize("key", sorted(STAGED_R12_QUERIES))
def test_staged_r12_pair_matches_duckdb_and_is_nonvacuous(spark, key):
    df = STAGED_R12_QUERIES[key](spark, SF_DIR)
    assert_parity(df, STAGED_R12_ORACLES[key], SF_DIR, min_rows=1)
