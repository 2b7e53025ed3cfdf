#!/usr/bin/env python
"""Generated-sf1 (10× sf0.1) scale points for the r29/r30 staged
families, measured in r15 BEFORE their drains (the probe_r11
protocol: process-per-arm, cold-session times so each arm carries the
same fixed overhead; the warmed marginal costs are the BASELINE.md
staged tables).

``python scripts/probe_r15_sf1.py <arm> <sf0.1|sf1>`` times one arm
once. Artifacts: the sf1_probe.py generated corpus
(``python scripts/sf1_probe.py --regen`` if absent)."""

from __future__ import annotations

import importlib
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF01 = "/root/testdata/sf0.1"
SF1 = os.path.join(REPO, ".scaling", "sf1")

#: arm -> ((plans module, query fn), warm tables)  (all r29/r30 arms
#: are exec-only — the Q21 pair checkpoint is a LAZY truncation)
ARMS = {
    # r29
    "waiting_suppliers": (("staged_r29", "q_rel_waiting_suppliers"),
                          ["lineitem", "orders", "supplier"]),
    "cust_acquisition": (("staged_r29", "q_rel_cust_acquisition"),
                         ["customer", "orders"]),
    "trade_balance": (("staged_r29", "q_rel_nation_trade_balance"),
                      ["lineitem", "orders", "customer", "supplier"]),
    "temperature_mix": (("staged_r29", "q_corpus_temperature_mix"),
                        ["documents"]),
    "token_entropy": (("staged_r29", "q_text_token_entropy"),
                      ["documents"]),
    # r30
    "linreg_trend": (("staged_r30", "q_win_linreg_trend"), ["events"]),
    "cosine_hist": (("staged_r30", "q_embed_cosine_hist"),
                    ["embeddings"]),
    "kn_discount": (("staged_r30", "q_lm_kn_discount"), ["documents"]),
    "novelty_curve": (("staged_r30", "q_corpus_novelty_curve"),
                      ["documents"]),
    "lang_divergence": (("staged_r30", "q_text_lang_divergence"),
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
