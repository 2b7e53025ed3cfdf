"""The r16 staged-registration gate (the staging protocol that drained
green in r10–r12): every (query, oracle) pair waiting in
``plans/staged_r16.py`` is replayed against DuckDB TODAY, exactly the
way the driver will run it — hash parity AND the non-vacuity check —
so the queue cannot rot while it waits. Also pins no-shadowing against
the live registry and detection/content non-vacuity for the relations
whose all-zero variants would still hash-match a broken producer."""

from __future__ import annotations

import pytest
from conftest import SF_DIR
from oracle_utils import assert_parity

from flink_audit_sessions_example_spark.plans import QUERIES
from flink_audit_sessions_example_spark.plans.staged_r16 import (
    STAGED_R16_ORACLES,
    STAGED_R16_QUERIES,
)


def test_staged_r16_sets_are_consistent():
    assert set(STAGED_R16_QUERIES) == set(STAGED_R16_ORACLES)
    shadowed = set(STAGED_R16_QUERIES) & set(QUERIES)
    assert not shadowed, f"staged r16 keys already live: {shadowed}"


@pytest.mark.parametrize("key", sorted(STAGED_R16_QUERIES))
def test_staged_r16_pair_matches_duckdb_and_is_nonvacuous(spark, key):
    df = STAGED_R16_QUERIES[key](spark, SF_DIR)
    assert_parity(df, STAGED_R16_ORACLES[key], SF_DIR, min_rows=1)


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
