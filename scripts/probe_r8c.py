#!/usr/bin/env python
"""Per-arm scaling probe for the r8 session-3/4 ops (SCALING.md ledger).

One process per invocation (the in-session A/B degradation documented in
SCALING.md r8 makes shared-JVM arms unusable): ``python scripts/probe_r8c.py
<op> <sf_dir>`` runs one op once and prints its wall seconds. A wrapper
loop over {op} x {sf0.01, sf0.1} x repeats gives the 10x data exponent.
Timing excludes session startup; each arm warms the JVM/parquet footer
path with a cheap count first (the cold-first-key effect measured in the
sf1 probe sessions).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    op, sf_dir = sys.argv[1], sys.argv[2]
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from flink_audit_sessions_example_spark.sources import load_table

    # warm-up: JVM codegen paths + parquet footers, off the clock (the
    # generated .scaling/sf1 dir carries only the doc/embedding tables)
    for warm in ("orders", "events", "documents"):
        try:
            load_table(spark, sf_dir, warm).count()
        except Exception:
            pass

    t0 = time.perf_counter()
    if op == "gapfill":
        from flink_audit_sessions_example_spark.operators.timeseries import (
            gapfill_resample,
        )

        n = gapfill_resample(load_table(spark, sf_dir, "events")).count()
    elif op == "bloom_join":
        from flink_audit_sessions_example_spark.operators.runtime_filters import (
            bloom_pruned_join,
        )

        orders = load_table(spark, sf_dir, "orders")
        cust = load_table(spark, sf_dir, "customer").where("c_nationkey = 1")
        n = bloom_pruned_join(
            orders, cust, fact_key="o_custkey", dim_key="c_custkey"
        ).count()
    elif op == "winsorize":
        from flink_audit_sessions_example_spark.operators.quantiles import (
            winsorize,
        )

        n = winsorize(
            load_table(spark, sf_dir, "orders").select(
                "o_orderkey", "o_orderpriority", "o_totalprice"
            ),
            group_col="o_orderpriority",
            value_col="o_totalprice",
        ).count()
    elif op == "weighted_sample":
        from flink_audit_sessions_example_spark.operators.corpus import (
            weighted_sample_k,
        )

        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", "source", "n_chars"
        )
        n = weighted_sample_k(
            docs, group_cols=["source"], weight_col="n_chars",
            key_col="doc_id", k=10,
        ).count()
    elif op == "cdc_apply":
        from pyspark.sql import functions as F

        from flink_audit_sessions_example_spark.operators.dedup import (
            cdc_apply,
            latest_by_key,
        )

        events = load_table(spark, sf_dir, "events")
        snapshot = latest_by_key(
            events.where("ts < timestamp'2024-01-15'"),
            key_cols=["user_id"], order_cols=["ts", "event_id"],
            payload_cols=["value"],
        ).select("user_id", "value")
        changelog = events.where("ts >= timestamp'2024-01-15'").select(
            "user_id", "ts", "event_id",
            F.when(F.col("event_type") == "error", "D")
            .otherwise("U").alias("op"),
            "value",
        )
        n = cdc_apply(
            snapshot, changelog, key_cols=["user_id"],
            order_cols=["ts", "event_id"], payload_cols=["value"],
        ).count()
    elif op == "snapshot_diff":
        from pyspark.sql import functions as F

        from flink_audit_sessions_example_spark.operators.dedup import (
            snapshot_diff,
        )

        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", "source", "n_chars"
        )
        old = docs.where("doc_id % 11 <> 3").withColumn(
            "n_chars",
            F.when(F.col("doc_id") % 5 == 0, F.col("n_chars") + 1)
            .otherwise(F.col("n_chars")),
        )
        n = snapshot_diff(
            old, docs.where("doc_id % 13 <> 4"),
            key_cols=["doc_id"], payload_cols=["source", "n_chars"],
        ).count()
    elif op == "interval_join":
        from pyspark.sql import functions as F

        from flink_audit_sessions_example_spark.operators.asof import (
            interval_join,
        )

        ev = load_table(spark, sf_dir, "events")
        iv = ev.where("event_type = 'error'").select(
            "user_id",
            F.col("ts").alias("start_ts"),
            (F.col("ts") + F.expr("INTERVAL 1 DAY")).alias("end_ts"),
            F.col("event_id").alias("interval_id"),
        )
        pt = ev.where("event_type <> 'error'").select(
            "user_id", "ts", "event_id"
        )
        n = interval_join(
            pt, iv, on=["user_id"], point_ts="ts",
            start_col="start_ts", end_col="end_ts", bin_width="6 hours",
        ).count()
    elif op == "balanced_shards":
        from flink_audit_sessions_example_spark.operators.corpus import (
            balanced_shards,
        )

        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", "n_chars"
        )
        n = balanced_shards(
            docs, key_col="doc_id", weight_col="n_chars",
            n_shards=64, n_cells=32,
        ).count()
    elif op == "profile":
        from flink_audit_sessions_example_spark.operators.profile import (
            profile_columns,
        )

        n = profile_columns(
            load_table(spark, sf_dir, "events"),
            ["user_id", "event_type", "event_id", "value"],
        ).count()
    elif op == "mad_outliers":
        from flink_audit_sessions_example_spark.operators.quantiles import (
            mad_outliers,
        )

        n = mad_outliers(
            load_table(spark, sf_dir, "orders").select(
                "o_orderkey", "o_orderpriority", "o_totalprice"
            ),
            group_col="o_orderpriority",
            value_col="o_totalprice",
        ).count()
    elif op == "reservoir":
        from pyspark.sql import functions as F

        from flink_audit_sessions_example_spark.operators.corpus import (
            reservoir_sample,
        )

        n = reservoir_sample(
            load_table(spark, sf_dir, "lineitem").select(
                "l_orderkey", "l_linenumber", "l_extendedprice"
            ).withColumn(
                "rid",
                (F.col("l_orderkey") * 10 + F.col("l_linenumber")),
            ),
            key_col="rid",
            k=1000,
        ).count()
    elif op == "asof_nearest":
        from pyspark.sql import functions as F

        from flink_audit_sessions_example_spark.operators.asof import (
            asof_nearest,
        )

        ev = load_table(spark, sf_dir, "events")
        left = ev.where("event_type = 'purchase'").select(
            "user_id", "ts", "event_id"
        )
        right = ev.where("event_type = 'error'").select(
            "user_id", "ts", "event_id"
        )
        n = asof_nearest(
            left, right, key_col="user_id", left_time="ts",
            right_time="ts", value_col="event_id",
            out_col="nearest_error_id", tiebreak_col="event_id",
        ).count()
    elif op == "count_min":
        from flink_audit_sessions_example_spark.operators.sketches import (
            cms_estimate,
            count_min_table,
        )

        ev = load_table(spark, sf_dir, "events")
        cms = count_min_table(ev, "event_type", width=2048, depth=5)
        q = ev.select("event_type").where("event_type IS NOT NULL").distinct()
        n = cms_estimate(cms, q, "event_type", width=2048, depth=5).count()
    elif op == "hll":
        from flink_audit_sessions_example_spark.operators.sketches import (
            hll_estimate,
            hll_table,
        )

        ev = load_table(spark, sf_dir, "events")
        n = hll_estimate(
            hll_table(ev, "user_id", group_cols=["event_type"], p=12),
            p=12,
            group_cols=["event_type"],
        ).count()
    elif op == "kmv":
        from flink_audit_sessions_example_spark.operators.sketches import (
            kmv_estimate,
            kmv_table,
        )

        ev = load_table(spark, sf_dir, "events")
        n = kmv_estimate(
            kmv_table(ev, "user_id", group_cols=["event_type"], k=256),
            k=256,
            group_cols=["event_type"],
        ).count()
    elif op == "sentences":
        from pyspark.sql import functions as F

        from flink_audit_sessions_example_spark.operators.text import (
            chunk_by_sentences,
        )

        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id",
            F.regexp_replace(
                "text", r"(\w+ \w+ \w+ \w+ \w+ \w+) ", "$1. "
            ).alias("text"),
        )
        n = chunk_by_sentences(docs, budget_chars=400).count()
    elif op == "bpe":
        from flink_audit_sessions_example_spark.operators.bpe import (
            learn_bpe_merges,
            word_freq_table,
        )

        vocab = word_freq_table(
            load_table(spark, sf_dir, "documents").select("text")
        )
        n = len(learn_bpe_merges(vocab, n_merges=10))
    elif op in ("lm", "lm_pruned"):
        from flink_audit_sessions_example_spark.operators.lm import (
            score_documents,
            train_ngram_counts,
        )

        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", "text"
        )
        # the pruned arm scales the floor with the corpus — the design
        # knob that keeps the model relation broadcastable at any size
        mc = 2 if op == "lm" else 25
        model = train_ngram_counts(docs.select("text"), min_count=mc)
        n = score_documents(docs, model).count()
    elif op == "semantic_decon":
        from flink_audit_sessions_example_spark.operators.similarity import (
            semantic_decontaminate,
        )

        emb = load_table(spark, sf_dir, "embeddings").select(
            "vec_id", "embedding"
        )
        # eval side PINNED to a fixed size: benchmarks don't grow with
        # the corpus, and a %-split eval would make the probe measure
        # O(train x eval) ~ sf^2 instead of the train-side slope
        n = semantic_decontaminate(
            emb,
            emb.where("vec_id % 17 = 0").orderBy("vec_id").limit(120),
            threshold=0.98,
        ).count()
    elif op == "pattern_match":
        from flink_audit_sessions_example_spark.operators.timeseries import (
            pattern_match_topk,
        )

        ev = load_table(spark, sf_dir, "events").select(
            "user_id", "ts", "event_id", "value"
        )
        n = pattern_match_topk(
            ev, [1.0, 1.0, 3.0, 3.0, 2.0, 2.0, 4.0, 4.0],
            key_col="user_id", time_col="ts", value_col="value",
            k=20, tiebreak_col="event_id",
        ).count()
    else:
        raise SystemExit(f"unknown op {op}")
    dt = time.perf_counter() - t0
    print(f"{op} {sf_dir} rows={n} sec={dt:.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
