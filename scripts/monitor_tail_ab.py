"""src_file_monitor bench-tail attribution A/B (r8 verdict action 6).

The r8 driver artifact recorded 0.592 s for ``src_file_monitor`` while
the judge's re-run on identical code/data read 0.265 s; the r5 variance
study documents a steady 0.16-0.35 s band with first-run tails to ~1 s.
Hypothesis (adjudicated "not a regression", to be LEDGERED): the query
is the only one whose scan lists + reads a materialized JSONL tree
(~hundreds of small text files under date dirs), so its latency is
dominated by filesystem-cache state, not plan work.

Interleaved min-of-3 A/B in one warmed session (variance_study.py
pattern):

- arm COLD: construct the DataFrame fresh (re-listing the tree via a
  new InMemoryFileIndex) and execute — what bench.py's first timed run
  pays after the driver's inter-query churn evicts dentries.
- arm WARM: re-execute a pre-built DataFrame (listing cached, file
  pages hot) — bench.py's 2nd/3rd runs.

If COLD's spread covers the 0.59 s artifact while WARM sits in the
steady band, the driver number is a cold-listing tail and no code
change is indicated.

Run: python scripts/monitor_tail_ab.py
"""

import os
import sys
import time

from pyspark.sql import SparkSession

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.1"
REPS = 9


def main():
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from flink_audit_sessions_example_spark.plans import QUERIES

    build = QUERIES["src_file_monitor"]
    # warm the JVM + materialize the tree (untimed, as in bench.py)
    build(spark, SF_DIR).write.format("noop").mode("overwrite").save()

    warm_df = build(spark, SF_DIR)
    cold, warm = [], []
    for rep in range(REPS):  # interleaved to damp session drift
        t0 = time.perf_counter()
        build(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        cold.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        warm_df.write.format("noop").mode("overwrite").save()
        warm.append(time.perf_counter() - t0)
    for name, v in (("cold_list+exec", cold), ("warm_reexec", warm)):
        s = sorted(v)
        print(
            f"{name:15s} min={s[0]:.3f} med={s[len(s) // 2]:.3f} "
            f"max={s[-1]:.3f} all={[round(x, 3) for x in v]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
