#!/usr/bin/env python
"""Generated-sf1 (10× sf0.1) scale points for the r13 operator
families (SCALING.md ledger), the probe_r10_sf1 protocol:
process-per-arm, ``python scripts/probe_r11_sf1.py <op> <sf0.1|sf1>``
times one op once. Artifacts: the r10-generated 1M-row events table
(10× USERS, per-user behavior unchanged — how an event log actually
grows), the r3 shingle-df-invariant 50k documents, and the r8 20k
embeddings (10× vectors).

Ops: gap_sessions, mixture, freshness, knn (also ``knn16`` — the
blocks=16 re-sizing arm: at 10× vectors per-block-pair work grows 100×
at fixed blocks, so the production move is growing ``blocks`` with the
corpus; the pair shows the re-sized cost), transitions; r14 families:
props_schema, triangles, regularity, classify (blocks=16 at sf1, the
re-sized point), assoc.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF01 = "/root/testdata/sf0.1"
SF1 = os.path.join(REPO, ".scaling", "sf1")


def _spark():
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
    return spark


def main() -> None:
    op = sys.argv[1]
    scale = sys.argv[2]
    base = SF01 if scale == "sf0.1" else SF1

    from flink_audit_sessions_example_spark.sources import load_table

    spark = _spark()

    def warm(*tables):
        for t in tables:
            load_table(spark, base, t).write.format("noop").mode(
                "overwrite"
            ).save()

    def _identity(batches):
        yield from batches

    (spark.range(0, 10_000, 1, 32).mapInPandas(_identity, "id long")
     .write.format("noop").mode("overwrite").save())

    if op == "gap_sessions":
        warm("events")
        from flink_audit_sessions_example_spark.operators.timeseries import (
            gap_sessions,
        )

        ev = load_table(spark, base, "events")
        t0 = time.perf_counter()
        gap_sessions(
            ev, key_col="user_id", ts_col="ts", gap_minutes=30
        ).write.format("noop").mode("overwrite").save()
    elif op == "mixture":
        warm("documents")
        from flink_audit_sessions_example_spark.operators.corpus import (
            mixture_sample,
        )

        docs = load_table(spark, base, "documents")
        t0 = time.perf_counter()
        mixture_sample(docs, group_col="lang").write.format("noop").mode(
            "overwrite"
        ).save()
    elif op == "freshness":
        warm("events")
        from flink_audit_sessions_example_spark.operators.quality import (
            freshness_audit,
        )

        ev = load_table(spark, base, "events")
        t0 = time.perf_counter()
        freshness_audit(
            ev, key_col="user_id", ts_col="ts", sla_hours=96
        ).write.format("noop").mode("overwrite").save()
    elif op in ("knn", "knn16"):
        warm("embeddings")
        from flink_audit_sessions_example_spark.operators.similarity import (
            knn_graph,
        )

        emb = load_table(spark, base, "embeddings", spread=False)
        blocks = 16 if op == "knn16" else 8
        t0 = time.perf_counter()
        knn_graph(emb, k=5, blocks=blocks).write.format("noop").mode(
            "overwrite"
        ).save()
    elif op == "transitions":
        warm("events")
        from flink_audit_sessions_example_spark.operators.timeseries import (
            event_transitions,
        )

        ev = load_table(spark, base, "events")
        t0 = time.perf_counter()
        event_transitions(
            ev, key_col="user_id", type_col="event_type", ts_col="ts",
            tiebreak_cols=["event_id"],
        ).write.format("noop").mode("overwrite").save()
    elif op == "props_schema":
        warm("events")
        from flink_audit_sessions_example_spark.plans.staged_r14 import (
            q_xform_props_schema,
        )

        t0 = time.perf_counter()
        q_xform_props_schema(spark, base).write.format("noop").mode(
            "overwrite"
        ).save()
    elif op == "triangles":
        warm("embeddings")
        from flink_audit_sessions_example_spark.plans.staged_r14 import (
            q_graph_triangles,
        )

        t0 = time.perf_counter()
        q_graph_triangles(spark, base).write.format("noop").mode(
            "overwrite"
        ).save()
    elif op == "regularity":
        warm("events")
        from flink_audit_sessions_example_spark.plans.staged_r14 import (
            q_dq_bot_regularity,
        )

        t0 = time.perf_counter()
        q_dq_bot_regularity(spark, base).write.format("noop").mode(
            "overwrite"
        ).save()
    elif op in ("classify", "classify16"):
        warm("embeddings")
        from flink_audit_sessions_example_spark.operators.similarity import (
            knn_classify,
        )

        from pyspark.sql import functions as F

        emb = load_table(spark, base, "embeddings", spread=False)
        if "label" not in emb.columns:
            # the r8 generated-sf1 artifact carries no label column;
            # a synthesized label leaves the scale shape untouched
            # (the vote is a broadcast join + agg regardless of values)
            emb = emb.withColumn(
                "label", (F.col("vec_id") % 10).cast("int")
            )
        blocks = 16 if op == "classify16" else 8
        t0 = time.perf_counter()
        knn_classify(emb, k=5, blocks=blocks).write.format("noop").mode(
            "overwrite"
        ).save()
    elif op == "assoc":
        warm("lineitem")
        from flink_audit_sessions_example_spark.plans.staged_r14 import (
            q_rel_assoc_rules,
        )

        t0 = time.perf_counter()
        q_rel_assoc_rules(spark, base).write.format("noop").mode(
            "overwrite"
        ).save()
    else:
        raise SystemExit(f"unknown op {op}")
    print(f"{op} {scale} {time.perf_counter() - t0:.2f}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
