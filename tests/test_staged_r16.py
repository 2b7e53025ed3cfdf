"""The r16 staged→live merge gate. The r16 staging batch
(``plans/staged_r16.py``) went LIVE in the r13 drain: hash parity +
non-vacuity are covered per-key by ``tests/test_oracle_parity.py``
like any other registration. What remains pinned here is the merge
itself (every staged key must resolve in the live registry to the
IDENTICAL callable and oracle string — a divergent copy would
silently shadow the tested object with an untested one) and the
content non-vacuity checks for degenerate-but-hash-matching
variants."""

from __future__ import annotations

from conftest import SF_DIR

from flink_audit_sessions_example_spark.plans import ORACLES, QUERIES
from flink_audit_sessions_example_spark.plans.staged_r16 import (
    STAGED_R16_ORACLES,
    STAGED_R16_QUERIES,
)


def test_staged_r16_sets_are_consistent():
    assert set(STAGED_R16_QUERIES) == set(STAGED_R16_ORACLES)


def test_staged_r16_keys_are_live_and_identical():
    for key, fn in STAGED_R16_QUERIES.items():
        assert key in QUERIES, f"staged key not drained into registry: {key}"
        assert QUERIES[key] is fn, f"live registry shadows staged query: {key}"
    for key, sql in STAGED_R16_ORACLES.items():
        assert key in ORACLES, f"staged oracle not drained: {key}"
        assert ORACLES[key] is sql, (
            f"live registry shadows staged oracle: {key}"
        )


def test_staged_r16_content_is_nonvacuous(spark):
    """All-zero variants would hash-match a broken producer: the
    attribution table must credit at least one conversion, the domain
    table must see real duplicates, and the cluster report must cover
    multi-member clusters from more than one source fingerprint."""
    attr = {
        r.event_type: r
        for r in STAGED_R16_QUERIES["win_attribution"](
            spark, SF_DIR
        ).collect()
    }
    assert sum(r.n_last_touch for r in attr.values()) >= 1
    assert all(r.n_touches >= r.n_last_touch for r in attr.values())
    dom = STAGED_R16_QUERIES["web_domain_stats"](spark, SF_DIR).collect()
    assert sum(r.n_dups for r in dom) >= 1
    stats = STAGED_R16_QUERIES["dedup_cluster_stats"](
        spark, SF_DIR
    ).collect()
    assert all(r.n_members >= 2 for r in stats)
    assert len(stats) >= 1
