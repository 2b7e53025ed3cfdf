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


def test_staged_queue_discovery_covers_all_modules():
    """plans/staging.py glob discovery (review r11 #2): every
    staged_r<N>.py present is yielded with consistent query/oracle key
    sets — the HUGEINT gate, window math and the capacity simulator all
    iterate THIS, so a new queue is covered the day its module lands."""
    from flink_audit_sessions_example_spark.plans.staging import (
        staged_queues,
    )

    found = {rnd: (q, o) for rnd, q, o in staged_queues()}
    assert 13 in found  # this round's queue is discoverable
    for rnd, (q, o) in found.items():
        assert set(q) == set(o), f"r{rnd} queue/oracle key mismatch"
