"""The r14 staged→live merge gate. The r14 staging batch
(``plans/staged_r14.py``) went LIVE in the r12 drain (both queues fit
the window's free slots at once, as in r11): hash parity + non-vacuity
are covered per-key by ``tests/test_oracle_parity.py``; this pins the
merge — every staged key must resolve in the live registry to the
IDENTICAL callable and oracle string. Also covers the r12 direct
registrations (``plans/round12.py``), which follow the same
single-source rule."""

from __future__ import annotations

from flink_audit_sessions_example_spark.plans import ORACLES, QUERIES
from flink_audit_sessions_example_spark.plans.round12 import (
    ROUND12_ORACLES,
    ROUND12_QUERIES,
)
from flink_audit_sessions_example_spark.plans.staged_r14 import (
    STAGED_R14_ORACLES,
    STAGED_R14_QUERIES,
)


def test_staged_r14_sets_are_consistent():
    assert set(STAGED_R14_QUERIES) == set(STAGED_R14_ORACLES)
    assert set(ROUND12_QUERIES) == set(ROUND12_ORACLES)


def test_staged_r14_keys_are_live_and_identical():
    for batch_q, batch_o in (
        (STAGED_R14_QUERIES, STAGED_R14_ORACLES),
        (ROUND12_QUERIES, ROUND12_ORACLES),
    ):
        for key, fn in batch_q.items():
            assert key in QUERIES, f"key not drained into registry: {key}"
            assert QUERIES[key] is fn, (
                f"live registry shadows staged query: {key}"
            )
        for key, sql in batch_o.items():
            assert key in ORACLES, f"oracle not drained: {key}"
            assert ORACLES[key] is sql, (
                f"live registry shadows staged oracle: {key}"
            )
