#!/usr/bin/env python
"""Per-arm scaling probe for the r10 operators (SCALING.md ledger).

One process per invocation (the in-session A/B degradation rule):
``python scripts/probe_r10.py <op> <sf_dir>`` runs one op once and
prints wall seconds. Wrapper loop over {op} x {sf0.01, sf0.1} x repeats
gives the 10x data exponent. Warmup off the clock, as in probe_r9.py.

Ops: scd2, skyline, time_decay, containment, dq_ref, char_div, unpivot
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
    from flink_audit_sessions_example_spark.plans.round10 import (
        ROUND10_QUERIES,
    )
    from flink_audit_sessions_example_spark.sources import load_table

    key = {
        "scd2": "xform_scd2",
        "skyline": "rel_skyline",
        "time_decay": "win_time_decay",
        "containment": "text_containment",
        "dq_ref": "dq_referential",
        "char_div": "text_char_diversity",
        "unpivot": "xform_unpivot",
    }[op]

    # warm every table the query touches, off the clock
    for t in (
        "documents events part lineitem orders customer supplier "
        "nation region"
    ).split():
        load_table(spark, sf_dir, t).write.format("noop").mode(
            "overwrite"
        ).save()

    def _identity(batches):
        yield from batches

    (spark.range(0, 10_000, 1, 32).mapInPandas(_identity, "id long")
     .write.format("noop").mode("overwrite").save())

    t0 = time.perf_counter()
    ROUND10_QUERIES[key](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    print(f"{op} {os.path.basename(sf_dir)} {time.perf_counter() - t0:.2f}")
    spark.stop()


if __name__ == "__main__":
    main()
