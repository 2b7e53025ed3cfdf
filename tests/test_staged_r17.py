"""The r17 staged→live merge gate. The r17 staging batch
(``plans/staged_r17.py``) went LIVE in the r13 drain: hash parity +
non-vacuity are covered per-key by ``tests/test_oracle_parity.py``
like any other registration. What remains pinned here is the merge
itself (every staged key must resolve in the live registry to the
IDENTICAL callable and oracle string — a divergent copy would
silently shadow the tested object with an untested one) and the
content non-vacuity checks for degenerate-but-hash-matching
variants."""

from __future__ import annotations

import pytest
from conftest import SF_DIR

from flink_audit_sessions_example_spark.plans import ORACLES, QUERIES
from flink_audit_sessions_example_spark.plans.staged_r17 import (
    STAGED_R17_ORACLES,
    STAGED_R17_QUERIES,
)


def test_staged_r17_sets_are_consistent():
    assert set(STAGED_R17_QUERIES) == set(STAGED_R17_ORACLES)


def test_staged_r17_keys_are_live_and_identical():
    for key, fn in STAGED_R17_QUERIES.items():
        assert key in QUERIES, f"staged key not drained into registry: {key}"
        assert QUERIES[key] is fn, f"live registry shadows staged query: {key}"
    for key, sql in STAGED_R17_ORACLES.items():
        assert key in ORACLES, f"staged oracle not drained: {key}"
        assert ORACLES[key] is sql, (
            f"live registry shadows staged oracle: {key}"
        )


def test_staged_r17_content_is_nonvacuous(spark):
    """Degenerate variants that would still hash-match a broken
    producer: an all-equal rank vector (iteration never ran), a
    tier table with no model hits or no OOV tail (holdout split
    broken), an all-zero CUSUM (deviations vanished), an empty delay
    relation, and a Benford table missing digits."""
    ranks = [
        r.rank
        for r in STAGED_R17_QUERIES["graph_pagerank"](
            spark, SF_DIR
        ).collect()
    ]
    assert len(set(ranks)) > 1, "rank vector is uniform"
    # mass conservation survives the per-iteration quantization
    assert sum(ranks) == pytest.approx(len(ranks), rel=1e-4)

    tiers = STAGED_R17_QUERIES["lm_backoff_tiers"](
        spark, SF_DIR
    ).collect()
    assert sum(t.n_tri for t in tiers) > 0
    assert sum(t.n_bi for t in tiers) > 0
    assert sum(t.n_uni for t in tiers) > 0
    assert all(
        t.n_tri + t.n_bi + t.n_uni + t.n_oov == t.n_tokens
        for t in tiers
    )
    # corpus fact, pinned: the synthetic vocabulary closes over the
    # 90% reference split, so every token resolves somewhere in the
    # model (the OOV rung is exercised by test_r17_ops fixtures)
    assert all(t.hit_rate == 1.0 for t in tiers)

    cps = STAGED_R17_QUERIES["win_changepoint"](spark, SF_DIR).collect()
    assert len(cps) >= 1
    assert any(c.cusum_up > 0 for c in cps)
    assert any(c.cusum_down > 0 for c in cps)

    delay = STAGED_R17_QUERIES["rel_supplier_delay"](
        spark, SF_DIR
    ).collect()
    assert sum(d.numwait for d in delay) >= 1

    ben = STAGED_R17_QUERIES["dq_benford"](spark, SF_DIR).collect()
    digits = {(r.l_returnflag, r.digit) for r in ben}
    flags = {r.l_returnflag for r in ben}
    assert all(
        (f, d) in digits for f in flags for d in range(1, 10)
    ), "a first digit is missing from a group"
    assert all(r.chi2 > 0 for r in ben)
