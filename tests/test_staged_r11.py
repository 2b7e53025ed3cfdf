"""The r11 staged-registration gate (the r9 staged.py protocol): every
(query, oracle) pair waiting in ``plans/staged_r11.py`` for an r11
window slot is replayed against DuckDB TODAY, exactly the way the
driver will run it — hash parity AND the non-vacuity check — so the
queue cannot rot while it waits. Also pins no-shadowing against the
live registry (these keys must NOT be registered yet; registering one
means moving it out of the staged batch)."""

from __future__ import annotations

import pytest
from conftest import SF_DIR
from oracle_utils import assert_parity

from flink_audit_sessions_example_spark.plans import QUERIES
from flink_audit_sessions_example_spark.plans.staged_r11 import (
    STAGED_R11_ORACLES,
    STAGED_R11_QUERIES,
)


def test_staged_r11_sets_are_consistent():
    assert set(STAGED_R11_QUERIES) == set(STAGED_R11_ORACLES)
    shadowed = set(STAGED_R11_QUERIES) & set(QUERIES)
    assert not shadowed, f"staged r11 keys already live: {shadowed}"


@pytest.mark.parametrize("key", sorted(STAGED_R11_QUERIES))
def test_staged_r11_pair_matches_duckdb_and_is_nonvacuous(spark, key):
    df = STAGED_R11_QUERIES[key](spark, SF_DIR)
    assert_parity(df, STAGED_R11_ORACLES[key], SF_DIR, min_rows=1)
