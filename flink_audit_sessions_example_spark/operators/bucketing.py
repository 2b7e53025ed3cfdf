"""Bucketed (co-located) joins — the shuffle-elimination strategy for
repeated big⨝big joins at 100 TB.

A shuffle join of two 100 TB fact tables exchanges BOTH sides on the join
key every time the join runs. If the tables are written **bucketed** on
that key (`bucketBy(n, key)`), every future join, aggregation, or window
on the key reads co-located buckets and skips the exchange entirely —
the classic amortize-the-shuffle-once trade every large warehouse makes
(Spark's table bucketing; equivalent to Hive bucketed tables).

Design constraints this module encodes:

- **Bucket counts must match** (or divide, with
  ``spark.sql.bucketing.coalesceBucketsInJoin.enabled``) across join
  sides — both writers take the count from one place.
- **Sorted buckets** (`sortBy`) additionally let the sort-merge join skip
  its per-task sort when Spark can trust the file order.
- The demonstration is **plan-asserted** in ``tests/test_bucketing.py``:
  the bucketed join's physical plan contains NO shuffle exchange on
  either side, while the identical unbucketed join exchanges both sides.
  That assertion — not a benchmark at toy scale — is the evidence that
  transfers to the 1000-executor case.

The writers produce EXTERNAL tables (explicit ``path``) so tests and
pipelines control the storage location; ``saveAsTable`` is required
because bucket metadata lives in the catalog, not the parquet footers —
a plain ``parquet(path)`` write silently drops the bucketing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    key: str,
    buckets: int,
    path: str,
    sort: bool = True,
) -> None:
    """Write ``df`` as an external bucketed table: ``buckets`` hash
    buckets on ``key``, optionally sorted by ``key`` within each bucket
    (lets downstream sort-merge joins skip their sort)."""
    w = df.write.mode("overwrite").option("path", path).bucketBy(buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str | list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two catalog tables; when both are bucketed on the join key
    with matching bucket counts, Catalyst plans a zero-exchange
    sort-merge join (asserted in tests). The function is a plain
    ``DataFrame.join`` on purpose: co-location is a property of the
    STORAGE, not a special operator — any join/groupBy/window on the
    bucket key gets the same free pass."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
