#!/usr/bin/env python
"""Per-round benchmark: times every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line ``{"metric": ..., "value": total_sec, "unit": "sec",
"queries": {key: sec}, "sf": ...}``.

Each query is forced through the ``noop`` sink — full evaluation of the
physical plan (scan → shuffle → agg/join) with zero driver-collect cost,
the standard Spark benchmarking sink. One untimed warmup query amortizes
JVM/codegen startup so per-query numbers reflect steady-state throughput.
"""

from __future__ import annotations

import json
import os
import sys
import time


#: Queries whose CONSTRUCTION runs Spark actions (iterative fixpoints,
#: sketch-side collects, eager checkpoints) — timed
#: construction-inclusive; everything else is timed exec-only. Every
#: member matches its BASELINE.md anchor's stated class (r13: the
#: staged r17–r19 drains added graph_pagerank / agg_kmv_intersect /
#: multimodal_phash_cluster / corpus_soft_dedup, and xform_scd2_merge
#: — whose anchor was always construction-inclusive — joined the set
#: so the recorded number covers its base-dimension build + pin).
ITERATIVE_QUERIES = frozenset(
    {"dedup_cluster", "dedup_keep_best", "dedup_embed_cluster",
     "dedup_cluster_stats", "graph_pagerank", "agg_kmv_intersect",
     "multimodal_phash_cluster", "corpus_soft_dedup",
     "xform_scd2_merge",
     # staged r22 (listed ahead of its drain — absent keys never hit)
     "agg_kmv_difference"}
)


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("flink-audit-sessions-spark-bench")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from flink_audit_sessions_example_spark.plans import QUERIES, flagship
    from flink_audit_sessions_example_spark.sources.tables import load_table

    # warmup (untimed): JVM + codegen startup via the flagship, plus one
    # pass over every table so parquet footers/OS page cache are hot and
    # per-query numbers reflect steady-state throughput
    flagship(spark, sf_dir).write.format("noop").mode("overwrite").save()
    for t in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split():
        load_table(spark, sf_dir, t).write.format("noop").mode("overwrite").save()

    # spawn the Arrow Python worker pool once, untimed: the first
    # mapInPandas-bearing query otherwise pays one worker fork per core
    def _identity(batches):
        yield from batches

    (
        spark.range(0, 10_000, 1, int(cpus))
        .mapInPandas(_identity, "id long")
        .write.format("noop")
        .mode("overwrite")
        .save()
    )

    # min over repeated runs, reporting steady-state plan throughput: the
    # first run pays one-time whole-stage-codegen compilation + Python-
    # worker spin-up, which amortize to ~zero over any real workload.
    timings: dict[str, float] = {}
    for key in sorted(QUERIES):
        best = float("inf")
        runs = 0
        # three runs for EVERYONE (r5): the r4->r3 "regressions" on
        # dedup_ngram / agg_multi_distinct / src_file_monitor were all
        # best-of-2 sampling noise — a 12-rep study
        # (scripts/variance_study.py) showed steady-state spreads that
        # cover both rounds' numbers, with first-run codegen outliers up
        # to 3x. A third run costs ~0.2 s for cheap queries and removes
        # most of that tail from the recorded artifact.
        while runs < 3:
            # Lazy plans: construction is driver-side Python/py4j
            # expression building (measured up to ~2 s for the widest
            # expression trees) that a real workload pays once per JOB,
            # not per executed query — kept OUTSIDE the timer, as in
            # r1-r3. ITERATIVE operators are the exception: their
            # construction runs the actual fixpoint actions
            # (dedup_cluster's label propagation), so for those the
            # timer covers construction too — else the bench would time
            # only a checkpoint read.
            if key in ITERATIVE_QUERIES:
                t0 = time.perf_counter()
                df = QUERIES[key](spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
            else:
                df = QUERIES[key](spark, sf_dir)
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
            runs += 1
        timings[key] = round(best, 4)

    total = round(sum(timings.values()), 4)
    sf = os.path.basename(sf_dir.rstrip("/")).removeprefix("sf")
    payload = {
        "metric": "total_query_time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    # The PRINTED line must survive the driver's ~2,000-char stdout
    # tail (BENCH_rN.json's `parsed` has been null since r4 because the
    # full 200+-key map is ~6 KB and truncation breaks the JSON — r14
    # verdict #3). Print a COMPACT line with the same schema: total,
    # sf, query count, and only the top-10 most expensive queries in
    # the `queries` map; the complete per-query dict still goes to
    # BENCH_SELF_sf{sf}.json below (the committed cross-round record).
    top10 = dict(
        sorted(timings.items(), key=lambda kv: kv[1], reverse=True)[:10]
    )
    compact = {
        "metric": "total_query_time",
        "value": total,
        "unit": "sec",
        "queries": top10,
        "n_queries": len(timings),
        "queries_omitted": len(timings) - len(top10),
        "full_record": f"BENCH_SELF_sf{sf}.json",
        "sf": payload["sf"],
    }
    print(json.dumps(compact))
    # self-record: the full JSON is written into the repo so
    # cross-round per-key comparison never depends on the driver
    # artifact. SF-suffixed so a quick sf0.01 iteration run can never
    # clobber the sf0.1 anchor (review r11c); the sf0.1 record is
    # committed at end of round.
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         f"BENCH_SELF_sf{sf}.json"),
            "w",
        ) as f:
            json.dump(payload, f, indent=1, sort_keys=True)
            f.write("\n")
    except OSError:
        pass  # a read-only checkout must not fail the bench
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
