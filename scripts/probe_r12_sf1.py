#!/usr/bin/env python
"""Generated-sf1 (10× sf0.1) scale points measured in r12:

- the two r11-drained iterative keys that were missing SCALING.md
  exponents (r11 verdict #6): ``keep_best`` / ``embed_cluster``
  (CONSTRUCTION-INCLUSIVE — the CC fixpoint runs actions while the
  query builds, bench.py's ITERATIVE_QUERIES class);
- the ten r15/r16 staged families, probed BEFORE their drains like the
  r11 probes did for r13/r14: ``url_canonical`` / ``strip_html`` /
  ``edit_pairs`` / ``rate_anomaly`` / ``calibration`` (r15) and
  ``domain_stats`` / ``attribution`` / ``rolling_distinct`` / ``kfold``
  / ``cluster_stats`` (r16; cluster_stats construction-inclusive).

probe_r11_sf1 protocol: process-per-arm,
``python scripts/probe_r12_sf1.py <arm> <sf0.1|sf1>`` times one arm
once. Artifacts: the sf1_probe.py generated corpus (50k docs / 20k
vectors — ``python scripts/sf1_probe.py``) and the probe_r10 1M-row
events table (``python scripts/probe_r10_sf1.py gen``)."""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF01 = "/root/testdata/sf0.1"
SF1 = os.path.join(REPO, ".scaling", "sf1")

#: arm -> ((plans module, query fn), warm table, construction-inclusive)
_R15_R16_ARMS = {
    "url_canonical": (("staged_r15", "q_xform_url_canonical"),
                      "documents", False),
    "strip_html": (("staged_r15", "q_text_strip_html"),
                   "documents", False),
    "edit_pairs": (("staged_r15", "q_sim_edit_pairs"),
                   "documents", False),
    "rate_anomaly": (("staged_r15", "q_dq_rate_anomaly"),
                     "events", False),
    "calibration": (("staged_r15", "q_dq_quality_calibration"),
                    "documents", False),
    "domain_stats": (("staged_r16", "q_web_domain_stats"),
                     "documents", False),
    "attribution": (("staged_r16", "q_win_attribution"),
                    "events", False),
    "rolling_distinct": (("staged_r16", "q_win_rolling_distinct"),
                         "events", False),
    "kfold": (("staged_r16", "q_xform_kfold"), "documents", False),
    "cluster_stats": (("staged_r16", "q_dedup_cluster_stats"),
                      "documents", True),
}


def main() -> None:
    op = sys.argv[1]
    scale = sys.argv[2]
    base = SF01 if scale == "sf0.1" else SF1

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

    if op == "keep_best":
        load_table(spark, base, "documents").write.format("noop").mode(
            "overwrite"
        ).save()
        from flink_audit_sessions_example_spark.plans.staged_r11 import (
            q_dedup_keep_best,
        )

        t0 = time.perf_counter()
        q_dedup_keep_best(spark, base).write.format("noop").mode(
            "overwrite"
        ).save()
    elif op == "embed_cluster":
        load_table(
            spark, base, "embeddings", spread=False
        ).write.format("noop").mode("overwrite").save()
        from flink_audit_sessions_example_spark.plans.staged_r12 import (
            q_dedup_embed_cluster,
        )

        t0 = time.perf_counter()
        q_dedup_embed_cluster(spark, base).write.format("noop").mode(
            "overwrite"
        ).save()
    elif op in _R15_R16_ARMS:
        qname, table, constructive = _R15_R16_ARMS[op]
        load_table(
            spark, base, table, spread=False
        ).write.format("noop").mode("overwrite").save()
        import importlib

        mod_name, fn_name = qname
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
    else:
        raise SystemExit(f"unknown op {op}")
    print(f"{op} {scale} {time.perf_counter() - t0:.2f}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
