"""Plan-shape gates for the r17–r19 staged keys (the test_lm_plan_gates
pattern): the scale claims each registration's docstring makes —
single scans, broadcast dims, no cartesian products, no row-at-a-time
Python — asserted against the EXECUTED plan so a regression in any
upstream operator surfaces here, not in a 100 TB run. Explain-only:
nothing executes."""

from __future__ import annotations

from conftest import SF_DIR

from flink_audit_sessions_example_spark.plans.staged_r17 import (
    q_dq_benford,
    q_lm_backoff_tiers,
    q_rel_supplier_delay,
    q_win_changepoint,
)
from flink_audit_sessions_example_spark.plans.staged_r18 import (
    q_text_bpe_pairs,
    q_win_ewma,
)
from flink_audit_sessions_example_spark.plans.staged_r19 import (
    q_graph_degree_stats,
    q_rel_small_quantity,
    q_win_zscore,
)


def _plan(spark, fn) -> str:
    return (
        fn(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    )


def _no_python_no_cartesian(plan: str) -> None:
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_single_scan_window_keys(spark):
    """The three bucketed-count keys each read events ONCE; everything
    downstream rides the O(types × hours) relation."""
    for fn in (q_win_changepoint, q_win_zscore, q_win_ewma):
        plan = _plan(spark, fn)
        assert plan.count("FileScan parquet") == 1, fn.__name__
        _no_python_no_cartesian(plan)


def test_benford_is_one_scan_one_counting_exchange(spark):
    plan = _plan(spark, q_dq_benford)
    assert plan.count("FileScan parquet") == 1
    # exactly ONE hash exchange: the conditional 9-column counting
    # aggregation (the only operator that sees event volume). The
    # full-domain fill, n_total, χ² and the 9-row explode are pure
    # projections over the O(groups)-row wide relation (r13: the
    # former domain-join formulation cost a second exchange + window)
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Window" not in plan
    _no_python_no_cartesian(plan)


def test_bpe_pairs_is_one_scan(spark):
    plan = _plan(spark, q_text_bpe_pairs)
    assert plan.count("FileScan parquet") == 1
    _no_python_no_cartesian(plan)


def test_supplier_delay_broadcasts_the_dim(spark):
    plan = _plan(spark, q_rel_supplier_delay)
    assert "BroadcastHashJoin" in plan
    _no_python_no_cartesian(plan)


def test_small_quantity_broadcasts_threshold_and_dim(spark):
    plan = _plan(spark, q_rel_small_quantity)
    # per-part thresholds AND the part dim both broadcast: the big
    # lineitem side is never shuffled for either join
    assert plan.count("BroadcastHashJoin") >= 2
    _no_python_no_cartesian(plan)


def test_lm_tiers_stays_jvm_side(spark):
    plan = _plan(spark, q_lm_backoff_tiers)
    _no_python_no_cartesian(plan)
    assert "MapInPandas" not in plan


def test_degree_stats_no_cartesian(spark):
    plan = _plan(spark, q_graph_degree_stats)
    _no_python_no_cartesian(plan)


# -- r22/r23 staged keys (added r13) ----------------------------------------


def test_top_terms_compiles_to_window_group_limit(spark):
    from flink_audit_sessions_example_spark.plans.staged_r22 import (
        q_text_top_terms,
    )

    plan = _plan(spark, q_text_top_terms)
    # the per-doc top-k prunes partial-side: rank never materializes
    # the full per-doc term list post-shuffle
    assert "WindowGroupLimit" in plan
    _no_python_no_cartesian(plan)


def test_greedy_acc_broadcasts_the_modal_table(spark):
    from flink_audit_sessions_example_spark.plans.staged_r22 import (
        q_lm_greedy_acc,
    )

    plan = _plan(spark, q_lm_greedy_acc)
    # the vocabulary-relation trick: the corpus-side bigram explode
    # joins the modal table BROADCAST — the corpus never reshuffles on
    # a token key
    assert "BroadcastHashJoin" in plan
    assert "WindowGroupLimit" in plan
    _no_python_no_cartesian(plan)


def test_important_stock_attaches_scalar_broadcast(spark):
    from flink_audit_sessions_example_spark.plans.staged_r22 import (
        q_rel_important_stock,
    )

    plan = _plan(spark, q_rel_important_stock)
    # the global total re-attaches as a broadcast 1-row relation, never
    # a shuffle of the per-part aggregate
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan
    _no_python_no_cartesian(plan)


def test_market_share_broadcasts_every_dim(spark):
    from flink_audit_sessions_example_spark.plans.staged_r23 import (
        q_rel_market_share,
    )

    plan = _plan(spark, q_rel_market_share)
    # customer, both nation legs, region and supplier all broadcast
    assert plan.count("BroadcastHashJoin") >= 5
    _no_python_no_cartesian(plan)


def test_centroid_assign_broadcasts_centroids_and_stays_jvm(spark):
    from flink_audit_sessions_example_spark.plans.staged_r23 import (
        q_sim_centroid_assign,
    )

    plan = _plan(spark, q_sim_centroid_assign)
    # the O(labels) centroid relation broadcasts against the vector
    # relation; the distance fold is JVM higher-order functions, not
    # Python
    assert "BroadcastNestedLoopJoin" in plan
    assert "MapInPandas" not in plan
    _no_python_no_cartesian(plan)


# -- r24 staged keys (added r13) ----------------------------------------


def test_disjunctive_revenue_pushes_or_into_one_broadcast_join(spark):
    from flink_audit_sessions_example_spark.plans.staged_r24 import (
        q_rel_disjunctive_revenue,
    )

    plan = _plan(spark, q_rel_disjunctive_revenue)
    # ONE broadcast join with the whole OR-of-ANDs as its filter — the
    # naive per-bracket UNION would scan lineitem three times
    assert plan.count("BroadcastHashJoin") == 1
    assert plan.count("FileScan parquet") == 2
    _no_python_no_cartesian(plan)


def test_session_lengths_single_scan_stacked_windows(spark):
    from flink_audit_sessions_example_spark.plans.staged_r24 import (
        q_win_session_lengths,
    )

    plan = _plan(spark, q_win_session_lengths)
    assert plan.count("FileScan parquet") == 1
    # the lag break and the island prefix sum share the user
    # partitioning: one user exchange + the O(lengths) histogram
    assert plan.count("Exchange hashpartitioning") == 2
    _no_python_no_cartesian(plan)


def test_ngram_coverage_heads_are_per_task_heaps(spark):
    from flink_audit_sessions_example_spark.plans.staged_r24 import (
        COVERAGE_KS,
        q_text_ngram_coverage,
    )

    plan = _plan(spark, q_text_ngram_coverage)
    # every k head compiles to TakeOrderedAndProject — never a global
    # sort of the counted-trigram relation (a global sort would show
    # up as a range-partitioned exchange)
    assert plan.count("TakeOrderedAndProject") == len(COVERAGE_KS)
    assert "rangepartitioning" not in plan
    _no_python_no_cartesian(plan)


def test_top_parts_concat_prunes_topk_partial_side(spark):
    from flink_audit_sessions_example_spark.plans.staged_r24 import (
        q_rel_top_parts_concat,
    )

    plan = _plan(spark, q_rel_top_parts_concat)
    assert "WindowGroupLimit" in plan
    assert plan.count("BroadcastHashJoin") == 2
    _no_python_no_cartesian(plan)


def test_norm_hist_is_one_scan_one_exchange(spark):
    from flink_audit_sessions_example_spark.plans.staged_r24 import (
        q_embed_norm_hist,
    )

    plan = _plan(spark, q_embed_norm_hist)
    assert plan.count("FileScan parquet") == 1
    assert plan.count("Exchange hashpartitioning") == 1
    _no_python_no_cartesian(plan)
