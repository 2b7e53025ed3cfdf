"""The r13 staged-registration gate (the r9/r10 staging protocol that
drained green in r10 and r11): every (query, oracle) pair waiting in
``plans/staged_r13.py`` for an r13 window slot is replayed against
DuckDB TODAY, exactly the way the driver will run it — hash parity AND
the non-vacuity check — so the queue cannot rot while it waits. Also
pins no-shadowing against the live registry (these keys must NOT be
registered yet; registering one means moving it out of the staged
batch)."""

from __future__ import annotations

import pytest
from conftest import SF_DIR
from oracle_utils import assert_parity

from flink_audit_sessions_example_spark.plans import QUERIES
from flink_audit_sessions_example_spark.plans.staged_r13 import (
    STAGED_R13_ORACLES,
    STAGED_R13_QUERIES,
)


def test_staged_r13_sets_are_consistent():
    assert set(STAGED_R13_QUERIES) == set(STAGED_R13_ORACLES)
    shadowed = set(STAGED_R13_QUERIES) & set(QUERIES)
    assert not shadowed, f"staged r13 keys already live: {shadowed}"


@pytest.mark.parametrize("key", sorted(STAGED_R13_QUERIES))
def test_staged_r13_pair_matches_duckdb_and_is_nonvacuous(spark, key):
    df = STAGED_R13_QUERIES[key](spark, SF_DIR)
    assert_parity(df, STAGED_R13_ORACLES[key], SF_DIR, min_rows=1)
