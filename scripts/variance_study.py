"""Variance study for the three r4 bench movers (r4 verdict action 3).

`dedup_ngram` (1.01->1.34), `agg_multi_distinct` (0.28->0.40) and
`src_file_monitor` (0.16->0.30) regressed r3->r4 with NO code change to
their plans (judge-verified for dedup_ngram; the other two untouched in
r4). Hypothesis: bench best-of-2/3 run-to-run spread, not a plan change.
This runs each query 12 times exec-only in one warmed session and prints
min / median / max — if the r3 and r4 numbers both fall inside the
observed spread, the delta is measurement, not regression.

Run: python scripts/variance_study.py
"""
import sys
import time

from pyspark.sql import SparkSession

sys.path.insert(0, "/root/repo")

KEYS = ["dedup_ngram", "agg_multi_distinct", "src_file_monitor"]
SF_DIR = "/root/testdata/sf0.1"
REPS = 12


def main():
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from flink_audit_sessions_example_spark.plans import QUERIES, flagship
    from flink_audit_sessions_example_spark.sources.tables import load_table

    flagship(spark, SF_DIR).write.format("noop").mode("overwrite").save()
    for t in ("lineitem", "documents"):
        load_table(spark, SF_DIR, t).write.format("noop").mode("overwrite").save()

    def _identity(batches):
        yield from batches

    (spark.range(0, 10_000, 1, 32).mapInPandas(_identity, "id long")
     .write.format("noop").mode("overwrite").save())

    times = {k: [] for k in KEYS}
    dfs = {k: QUERIES[k](spark, SF_DIR) for k in KEYS}
    for rep in range(REPS):
        for k in KEYS:  # interleaved to damp drift
            t0 = time.perf_counter()
            dfs[k].write.format("noop").mode("overwrite").save()
            times[k].append(time.perf_counter() - t0)
    for k in KEYS:
        v = sorted(times[k])
        print(f"{k:22s} min={v[0]:.3f} med={v[len(v)//2]:.3f} "
              f"max={v[-1]:.3f} all={[round(x,2) for x in times[k]]}")
    spark.stop()


if __name__ == "__main__":
    main()
