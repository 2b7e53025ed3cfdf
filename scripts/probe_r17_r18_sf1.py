#!/usr/bin/env python
"""Generated-sf1 (10× sf0.1) scale points for the r17/r18/r19 staged
families, measured in r12 BEFORE their drains (the probe_r11 protocol:
process-per-arm, cold-session times so each arm carries the same fixed
overhead; the warmed marginal costs are the BASELINE.md staged
tables).

``python scripts/probe_r17_r18_sf1.py <arm> <sf0.1|sf1>`` times one
arm once. Artifacts: the sf1_probe.py generated corpus — now including
10× orders / supplier and the full lineitem column set the r17/r18
relational arms read (``python scripts/sf1_probe.py --regen``) — and
the probe_r10 1M-row events table (``python scripts/probe_r10_sf1.py
gen``)."""

from __future__ import annotations

import importlib
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF01 = "/root/testdata/sf0.1"
SF1 = os.path.join(REPO, ".scaling", "sf1")

#: arm -> ((plans module, query fn), warm tables, construction-inclusive)
ARMS = {
    # r17
    "pagerank": (("staged_r17", "q_graph_pagerank"),
                 ["lineitem", "orders"], True),
    "lm_tiers": (("staged_r17", "q_lm_backoff_tiers"),
                 ["documents"], False),
    "changepoint": (("staged_r17", "q_win_changepoint"),
                    ["events"], False),
    "supplier_delay": (("staged_r17", "q_rel_supplier_delay"),
                       ["lineitem", "orders"], False),
    "benford": (("staged_r17", "q_dq_benford"), ["lineitem"], False),
    # r18
    "kmv_intersect": (("staged_r18", "q_agg_kmv_intersect"),
                      ["lineitem", "orders"], True),
    "bpe_pairs": (("staged_r18", "q_text_bpe_pairs"),
                  ["documents"], False),
    "ewma": (("staged_r18", "q_win_ewma"), ["events"], False),
    "profile_drift": (("staged_r18", "q_dq_profile_drift"),
                      ["events"], False),
    "phash_cluster": (("staged_r18", "q_multimodal_phash_cluster"),
                      ["documents"], True),
    # r19
    "quantile_merge": (("staged_r19", "q_agg_quantile_merge"),
                       ["events"], False),
    "small_quantity": (("staged_r19", "q_rel_small_quantity"),
                       ["lineitem", "part"], False),
    "soft_dedup": (("staged_r19", "q_corpus_soft_dedup"),
                   ["documents"], True),
    "zscore": (("staged_r19", "q_win_zscore"), ["events"], False),
    "degree_stats": (("staged_r19", "q_graph_degree_stats"),
                     ["lineitem", "orders"], False),
    # r20
    "audio_energy": (("staged_r20", "q_multimodal_audio_energy"),
                     ["documents"], False),
    "langid_confusion": (("staged_r20", "q_dq_langid_confusion"),
                         ["documents"], False),
    "part_variety": (("staged_r20", "q_rel_part_variety"),
                     ["lineitem", "orders", "part"], False),
    "autocorr": (("staged_r20", "q_win_autocorr"), ["events"], False),
    "vocab_growth": (("staged_r20", "q_text_vocab_growth"),
                     ["documents"], False),
    # r21 (arms registered r12; run them before the r21 drain — the
    # sf1 corpus has no customer/nation tables, so returned_items
    # probes at sf0.1 only unless the generator grows them)
    "dow_profile": (("staged_r21", "q_win_dow_profile"),
                    ["events"], False),
    "token_budget": (("staged_r21", "q_corpus_token_budget"),
                     ["documents"], False),
    "hll_union": (("staged_r21", "q_agg_hll_union"), ["events"], False),
    "week_rollup": (("staged_r21", "q_xform_week_rollup"),
                    ["events"], False),
}


def main() -> None:
    op = sys.argv[1]
    scale = sys.argv[2]
    base = SF01 if scale == "sf0.1" else SF1
    if op not in ARMS:
        raise SystemExit(f"unknown op {op}; one of {sorted(ARMS)}")

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from flink_audit_sessions_example_spark.sources import load_table

    def _identity(batches):
        yield from batches

    (spark.range(0, 10_000, 1, 32).mapInPandas(_identity, "id long")
     .write.format("noop").mode("overwrite").save())

    (mod_name, fn_name), tables, constructive = ARMS[op]
    for t in tables:
        load_table(spark, base, t, spread=False).write.format(
            "noop"
        ).mode("overwrite").save()
    mod = importlib.import_module(
        f"flink_audit_sessions_example_spark.plans.{mod_name}"
    )
    fn = getattr(mod, fn_name)
    if constructive:
        t0 = time.perf_counter()
        df = fn(spark, base)
    else:
        df = fn(spark, base)
        t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    print(f"{op} {scale} {time.perf_counter() - t0:.2f}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
