#!/usr/bin/env python
"""Per-arm probe: exact vs CMS-prefiltered LM training (r8 verdict #5).

The generated .scaling/sf1 corpus is the ADVERSARIAL vocab case: 90% of
each document's word-windows are caesar-rotated (novel letters), so
trigrams are near-unique and exact counting's map-side partial agg
collapses nothing — the counting exchange carries ~every gram
occurrence (the exact-distinct-count shape, SCALING.md r8-session-4d).
The CMS prefilter (count-min can never underestimate, so
est < min_count proves a gram droppable BEFORE the exchange) should
collapse the exchange to the surviving grams.

One process per invocation (the in-session A/B degradation rule):

    python scripts/probe_lm_cms.py {exact|cms|exact_vol|cms_vol} \
        <sf_dir> [min_count] [log2_width]

prints wall seconds + model rows. Wrapper loop over
{exact,cms} x {/root/testdata/sf0.1, .scaling/sf1} x repeats gives the
10x behavior of each arm.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    arm, sf_dir = sys.argv[1], sys.argv[2]
    min_count = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    width = 1 << (int(sys.argv[4]) if len(sys.argv) > 4 else 16)
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
    from flink_audit_sessions_example_spark.operators.lm import (
        train_ngram_counts,
    )
    from flink_audit_sessions_example_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").select("text")
    docs.count()  # warm: JVM + parquet footers, off the clock

    if arm in ("exact_vol", "cms_vol"):
        # not a timing arm: counts the ROWS the counting exchange
        # carries (per-partition distinct grams after the map-side
        # partial agg — for the exact arm that is ~every occurrence on
        # a near-unique vocab; for the cms arm, only the survivors of
        # the sketch filter).
        from pyspark.sql import functions as F
        from flink_audit_sessions_example_spark.operators.lm import (
            _gram_rows,
        )

        grams = _gram_rows(
            docs,
            text_col="text",
            order=3,
            min_count=min_count,
            cms_prefilter=(arm == "cms_vol"),
            cms_width=width,
            # match train_ngram_counts' default (and the SCALING.md
            # ledger label): the volume numbers must be reproducible at
            # the shipped configuration (review r9)
            cms_depth=2,
            cms_seed=42,
        )
        occurrences = grams.count()
        exchange_rows = (
            grams.withColumn("pid", F.spark_partition_id())
            .groupBy("pid", "n", "gram")
            .count()
            .count()
        )
        print(f"{arm} {os.path.basename(sf_dir.rstrip('/'))} "
              f"occurrences={occurrences} exchange_rows={exchange_rows}")
        spark.stop()
        return

    t0 = time.perf_counter()
    model = train_ngram_counts(
        docs, min_count=min_count, cms_prefilter=(arm == "cms"),
        cms_width=width,
    )
    rows = model.count()
    dt = time.perf_counter() - t0
    print(f"{arm} {os.path.basename(sf_dir.rstrip('/'))} "
          f"min_count={min_count} rows={rows} sec={dt:.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
