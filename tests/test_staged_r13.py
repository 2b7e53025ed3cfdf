"""The r13 staged→live merge gate. The r13 staging batch
(``plans/staged_r13.py``) went LIVE in the r12 drain: every
(query, oracle) pair is now part of the registered surface, so hash
parity + non-vacuity are covered per-key by
``tests/test_oracle_parity.py`` like any other registration. What
remains to pin here is the merge itself: every staged key must resolve
in the live registry to the IDENTICAL callable and oracle string — a
divergent copy (e.g. someone re-defining a key in extended.py) would
silently shadow the tested object with an untested one."""

from __future__ import annotations

from flink_audit_sessions_example_spark.plans import ORACLES, QUERIES
from flink_audit_sessions_example_spark.plans.staged_r13 import (
    STAGED_R13_ORACLES,
    STAGED_R13_QUERIES,
)


def test_staged_r13_sets_are_consistent():
    assert set(STAGED_R13_QUERIES) == set(STAGED_R13_ORACLES)


def test_staged_r13_keys_are_live_and_identical():
    for key, fn in STAGED_R13_QUERIES.items():
        assert key in QUERIES, f"staged key not drained into registry: {key}"
        assert QUERIES[key] is fn, f"live registry shadows staged query: {key}"
    for key, sql in STAGED_R13_ORACLES.items():
        assert key in ORACLES, f"staged oracle not drained: {key}"
        assert ORACLES[key] is sql, (
            f"live registry shadows staged oracle: {key}"
        )
