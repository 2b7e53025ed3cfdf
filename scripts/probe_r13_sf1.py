#!/usr/bin/env python
"""Generated-sf1 (10× sf0.1) scale points for the r22/r23 staged
families, measured in r13 BEFORE their drains (the probe_r11
protocol: process-per-arm, cold-session times so each arm carries the
same fixed overhead; the warmed marginal costs are the BASELINE.md
staged tables).

``python scripts/probe_r13_sf1.py <arm> <sf0.1|sf1>`` times one arm
once. Artifacts: the sf1_probe.py generated corpus — now including
10× customer, the supplier nation leg, lineitem's ``l_discount`` and
the verbatim nation/region dims the r22/r23 relational arms read
(``python scripts/sf1_probe.py --regen``) — and the probe_r10 1M-row
events table (``python scripts/probe_r10_sf1.py gen``)."""

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
    # r22
    "important_stock": (("staged_r22", "q_rel_important_stock"),
                        ["lineitem"], False),
    "order_backlog": (("staged_r22", "q_rel_order_backlog"),
                      ["lineitem", "orders"], False),
    "kmv_difference": (("staged_r22", "q_agg_kmv_difference"),
                       ["lineitem", "orders"], True),
    "greedy_acc": (("staged_r22", "q_lm_greedy_acc"),
                   ["documents"], False),
    "top_terms": (("staged_r22", "q_text_top_terms"),
                  ["documents"], False),
    # r23
    "market_share": (("staged_r23", "q_rel_market_share"),
                     ["lineitem", "orders", "customer", "supplier"],
                     False),
    "hapax_rate": (("staged_r23", "q_text_hapax_rate"),
                   ["documents"], False),
    "category_drift": (("staged_r23", "q_dq_category_drift"),
                       ["events"], False),
    "audio_silence": (("staged_r23", "q_multimodal_audio_silence"),
                      ["documents"], False),
    "centroid_assign": (("staged_r23", "q_sim_centroid_assign"),
                        ["embeddings"], False),
    # r24
    "disjunctive_revenue": (("staged_r24", "q_rel_disjunctive_revenue"),
                            ["lineitem", "part"], False),
    "session_lengths": (("staged_r24", "q_win_session_lengths"),
                        ["events"], False),
    "ngram_coverage": (("staged_r24", "q_text_ngram_coverage"),
                       ["documents"], False),
    "top_parts_concat": (("staged_r24", "q_rel_top_parts_concat"),
                         ["lineitem", "supplier"], False),
    "norm_hist": (("staged_r24", "q_embed_norm_hist"),
                  ["embeddings"], False),
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
