"""The r15 staged-registration gate (the staging protocol that drained
green in r10, r11 and r12): every (query, oracle) pair waiting in
``plans/staged_r15.py`` for an r13 window slot is replayed against
DuckDB TODAY, exactly the way the driver will run it — hash parity AND
the non-vacuity check — so the queue cannot rot while it waits. Also
pins no-shadowing against the live registry (these keys must NOT be
registered yet; registering one means moving it out of the staged
batch) and detection non-vacuity for the two audit relations (a
planted burst that flags nothing, or a calibration table with zero
duplicates, would hash-match a broken detector — the dq_freshness
planted-defect rule)."""

from __future__ import annotations

import pytest
from conftest import SF_DIR
from oracle_utils import assert_parity

from flink_audit_sessions_example_spark.plans import QUERIES
from flink_audit_sessions_example_spark.plans.staged_r15 import (
    STAGED_R15_ORACLES,
    STAGED_R15_QUERIES,
)


def test_staged_r15_sets_are_consistent():
    assert set(STAGED_R15_QUERIES) == set(STAGED_R15_ORACLES)
    shadowed = set(STAGED_R15_QUERIES) & set(QUERIES)
    assert not shadowed, f"staged r15 keys already live: {shadowed}"


@pytest.mark.parametrize("key", sorted(STAGED_R15_QUERIES))
def test_staged_r15_pair_matches_duckdb_and_is_nonvacuous(spark, key):
    df = STAGED_R15_QUERIES[key](spark, SF_DIR)
    assert_parity(df, STAGED_R15_ORACLES[key], SF_DIR, min_rows=1)


def test_staged_r15_detection_is_nonvacuous(spark):
    """The hash-checked relations must actually DETECT something at the
    gate SF: the planted burst flags outlier windows, the calibration
    table sees real duplicate docs, and the edit-distance join emits
    pairs (all-zero variants would still hash-match a broken plant)."""
    anom = STAGED_R15_QUERIES["dq_rate_anomaly"](spark, SF_DIR)
    assert anom.where("is_outlier").count() >= 1
    calib = STAGED_R15_QUERIES["dq_quality_calibration"](spark, SF_DIR)
    assert calib.agg({"n_dups": "sum"}).collect()[0][0] >= 1
    pairs = STAGED_R15_QUERIES["sim_edit_pairs"](spark, SF_DIR)
    assert pairs.count() >= 1
