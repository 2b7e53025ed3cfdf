#!/usr/bin/env python
"""Generated-sf1 (10× sf0.1) scale points for the r25/r26 staged
families, measured in r14 BEFORE their drains (the probe_r11
protocol: process-per-arm, cold-session times so each arm carries the
same fixed overhead; the warmed marginal costs are the BASELINE.md
staged tables).

``python scripts/probe_r14_sf1.py <arm> <sf0.1|sf1>`` times one arm
once. Artifacts: the sf1_probe.py generated corpus — now including
``p_retailprice`` (the Q9 profit arm's cost leg) and
``o_orderpriority`` (the Q12 arm's CASE counts), both resampled from
the real empirical domains (``python scripts/sf1_probe.py --regen``)."""

from __future__ import annotations

import importlib
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF01 = "/root/testdata/sf0.1"
SF1 = os.path.join(REPO, ".scaling", "sf1")

#: arm -> ((plans module, query fn), warm tables)  (all r25/r26 arms
#: are exec-only — no construction-inclusive key in either queue)
ARMS = {
    # r25 — the TPC-H multi-join stars
    "local_volume": (("staged_r25", "q_rel_local_volume"),
                     ["lineitem", "orders", "customer", "supplier"]),
    "shipping_volume": (("staged_r25", "q_rel_shipping_volume"),
                        ["lineitem", "orders", "customer", "supplier"]),
    "product_profit": (("staged_r25", "q_rel_product_profit"),
                       ["lineitem", "orders", "part", "supplier"]),
    "shipdelay_priority": (("staged_r25", "q_rel_shipdelay_priority"),
                           ["lineitem", "orders"]),
    "top_supplier": (("staged_r25", "q_rel_top_supplier"),
                     ["lineitem", "supplier"]),
    # r26
    "part_promotion": (("staged_r26", "q_rel_part_promotion"),
                       ["lineitem", "part", "supplier"]),
    "freq_profile": (("staged_r26", "q_lm_freq_profile"),
                     ["documents"]),
    "zipf_ratio": (("staged_r26", "q_text_zipf_ratio"),
                   ["documents"]),
    "dim_stats": (("staged_r26", "q_embed_dim_stats"),
                  ["embeddings"]),
    "dedup_prefix": (("staged_r26", "q_dedup_prefix"),
                     ["documents"]),
    # r27
    "count_of_counts": (("staged_r27", "q_lm_count_of_counts"),
                        ["documents"]),
    "seasonal_error": (("staged_r27", "q_win_seasonal_error"),
                       ["events"]),
    "quantize_error": (("staged_r27", "q_embed_quantize_error"),
                       ["embeddings"]),
    "dedup_suffix": (("staged_r27", "q_dedup_suffix"),
                     ["documents"]),
    "order_gap_median": (("staged_r27", "q_rel_order_gap_median"),
                         ["orders"]),
    # r28
    "holt": (("staged_r28", "q_win_holt"), ["events"]),
    "burstiness": (("staged_r28", "q_win_burstiness"), ["events"]),
    "pareto_share": (("staged_r28", "q_rel_pareto_share"), ["orders"]),
    "wordset": (("staged_r28", "q_dedup_wordset"), ["documents"]),
    "length_gini": (("staged_r28", "q_corpus_length_gini"),
                    ["documents"]),
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

    (mod_name, fn_name), tables = ARMS[op]
    for t in tables:
        load_table(spark, base, t, spread=False).write.format(
            "noop"
        ).mode("overwrite").save()
    # nation/region are tiny verbatim dims — warm unconditionally
    for t in ("nation", "region"):
        load_table(spark, base, t, spread=False).write.format(
            "noop"
        ).mode("overwrite").save()
    mod = importlib.import_module(
        f"flink_audit_sessions_example_spark.plans.{mod_name}"
    )
    fn = getattr(mod, fn_name)
    df = fn(spark, base)
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    print(f"{op} {scale} {time.perf_counter() - t0:.2f}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
