"""The r12 staged→live merge gate. The r12 staging batch
(``plans/staged_r12.py``) went LIVE in the r11 drain (window_math.py 11
left 31 free slots under the recalibrated cadence ladder — enough for
BOTH queues): every (query, oracle) pair is now part of the registered
surface, so hash parity + non-vacuity are covered per-key by
``tests/test_oracle_parity.py`` like any other registration. What
remains to pin here is the merge itself: every staged key must resolve
in the live registry to the IDENTICAL callable and oracle string."""

from __future__ import annotations

from flink_audit_sessions_example_spark.plans import ORACLES, QUERIES
from flink_audit_sessions_example_spark.plans.staged_r12 import (
    STAGED_R12_ORACLES,
    STAGED_R12_QUERIES,
)


def test_staged_r12_sets_are_consistent():
    assert set(STAGED_R12_QUERIES) == set(STAGED_R12_ORACLES)


def test_staged_r12_keys_are_live_and_identical():
    for key, fn in STAGED_R12_QUERIES.items():
        assert key in QUERIES, f"staged key not drained into registry: {key}"
        assert QUERIES[key] is fn, f"live registry shadows staged query: {key}"
    for key, sql in STAGED_R12_ORACLES.items():
        assert key in ORACLES, f"staged oracle not drained: {key}"
        assert ORACLES[key] is sql, (
            f"live registry shadows staged oracle: {key}"
        )
