"""Streaming CDC materializer — changelog stream → continuously
maintained table (the streaming completion of
``operators/dedup.py::cdc_apply``; the reference's session store is the
I/U-only special case of this shape).

Semantics contract (what makes per-batch incremental == whole-log batch
replay):

- **Tombstones are state, not absence.** The target RETAINS deleted
  keys as ``op='D'`` rows carrying their replay order. Dropping them
  would let a late-arriving OLDER upsert resurrect a deleted key —
  the batch replay (max over the whole log) keeps it deleted, so the
  incremental view must too. :func:`read_materialized` filters them
  out of the readable view.
- **Merge = the same max(struct) as the batch twin.** Each micro-batch
  unions the stored per-key state (already a per-key max) with the new
  rows and takes ``max(struct(epoch, order, op, payload))`` — a fold of
  an associative/commutative max, so any batch slicing of the log
  yields the batch-replay answer. Late data is handled by ORDER, not
  arrival.
- **At-least-once → exactly-once via batch-id fencing.** foreachBatch
  re-runs a failed batch with the SAME batch_id; the target's pointer
  file records the last applied id and the writer skips replays
  (idempotent). The pointer flips atomically (tmp + rename) AFTER the
  new version directory is fully written, so a crash mid-write leaves
  the previous version current.

Scale honesty: each micro-batch rewrites the O(distinct keys) state
table (read current version + union + aggregate + write next version).
That is the correct shape for a MATERIALIZED VIEW whose key cardinality
is bounded (the view is O(keys) regardless of stream length), and it is
what plain parquet can do without table-format transactions; at 100 TB
key cardinality the production target is an ACID table format's MERGE
INTO (Delta/Iceberg/Hudi), which replaces the full rewrite with a
key-partitioned merge — the semantics above (tombstone retention,
order-based merge, batch-id fencing) transfer unchanged.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_POINTER = "_CURRENT"


def _read_pointer(target_dir: str) -> "dict | None":
    p = os.path.join(target_dir, _POINTER)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def _write_pointer(target_dir: str, meta: dict) -> None:
    p = os.path.join(target_dir, _POINTER)
    tmp = p + ".tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, p)  # atomic on POSIX


def make_cdc_batch_applier(
    spark: SparkSession,
    *,
    key_cols: "list[str]",
    order_cols: "list[str]",
    payload_cols: "list[str]",
    op_col: str = "op",
    target_dir: str,
    snapshot: "DataFrame | None" = None,
):
    """Build the ``batch_fn(batch_df, batch_id)`` that folds each
    micro-batch of changelog rows into the versioned target table.
    Exposed separately from :func:`materialize_cdc_stream` so tests can
    drive redelivery (same batch_id twice) without a streaming query."""
    if "://" in target_dir:
        # the pointer file and GC use driver-local filesystem calls; a
        # URI-schemed target (s3a/hdfs/...) would make _read_pointer
        # return None on EVERY batch — fencing dead, state silently
        # re-seeded per batch. Fail loudly instead.
        raise ValueError(
            f"target_dir must be a local filesystem path, got {target_dir!r}"
            " (remote stores need transactional-pointer support the plain"
            "-parquet materializer does not provide; use an ACID table"
            " format's MERGE INTO there)"
        )
    os.makedirs(target_dir, exist_ok=True)
    cdc_cols = dict(
        key_cols=key_cols,
        order_cols=order_cols,
        payload_cols=payload_cols,
        op_col=op_col,
    )

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        from ..operators.dedup import (
            cdc_epoch0_rows,
            cdc_epoch1_rows,
            max_struct_state,
        )

        meta = _read_pointer(target_dir)
        if meta is not None and batch_id < meta["batch_id"]:
            # a LOWER id than the last applied batch is not a redelivery
            # — foreachBatch redelivers only the most recent id. It means
            # the checkpoint was reset against an existing target; a
            # silent skip here would drop every future batch while the
            # query reports healthy progress.
            raise RuntimeError(
                f"batch_id {batch_id} < last applied {meta['batch_id']} in "
                f"{target_dir!r}: streaming checkpoint was reset against an "
                "existing target. Point the query at a fresh target_dir or "
                "restore the original checkpoint."
            )
        if meta is not None and batch_id == meta["batch_id"]:
            return  # fenced: at-least-once redelivery of the applied batch
        new = cdc_epoch1_rows(batch_df, **cdc_cols)
        if meta is not None:
            base = spark.read.parquet(
                os.path.join(target_dir, f"v{meta['version']}")
            )
            union = base.unionByName(new)
        elif snapshot is not None:
            seed = cdc_epoch0_rows(snapshot, batch_df.schema, **cdc_cols)
            union = seed.unionByName(new)
        else:
            union = new
        state = max_struct_state(
            union,
            key_cols=key_cols,
            field_cols=["_epoch", *order_cols, op_col, *payload_cols],
        )
        version = 0 if meta is None else meta["version"] + 1
        state.write.mode("overwrite").parquet(
            os.path.join(target_dir, f"v{version}")
        )
        # pointer flips only after the version directory is complete
        _write_pointer(target_dir, {"version": version, "batch_id": batch_id})
        # GC: keep current + previous (the previous stays readable for
        # anything that resolved the pointer just before the flip, and
        # is the rollback point if the next write crashes mid-flight)
        import shutil

        for name in os.listdir(target_dir):
            if name.startswith("v") and name[1:].isdigit():
                if int(name[1:]) < version - 1:
                    shutil.rmtree(
                        os.path.join(target_dir, name), ignore_errors=True
                    )

    return apply_batch


def materialize_cdc_stream(
    changelog: DataFrame,
    *,
    key_cols: "list[str]",
    order_cols: "list[str]",
    payload_cols: "list[str]",
    op_col: str = "op",
    target_dir: str,
    checkpoint_dir: str,
    snapshot: "DataFrame | None" = None,
    available_now: bool = True,
    poll_seconds: "int | None" = None,
):
    """Start the materializer: a foreachBatch query folding the
    changelog stream into ``target_dir``. Returns the StreamingQuery.
    Read the current table with :func:`read_materialized`."""
    from .pipeline import write_foreach_batch

    fn = make_cdc_batch_applier(
        changelog.sparkSession,
        key_cols=key_cols,
        order_cols=order_cols,
        payload_cols=payload_cols,
        op_col=op_col,
        target_dir=target_dir,
        snapshot=snapshot,
    )
    return write_foreach_batch(
        changelog,
        fn,
        checkpoint_dir=checkpoint_dir,
        available_now=available_now,
        poll_seconds=poll_seconds,
        output_mode="append",
    )


def read_materialized(
    spark: SparkSession,
    target_dir: str,
    *,
    op_col: str = "op",
) -> DataFrame:
    """The readable view of the materialized table: surviving keys only
    (tombstones and the internal epoch column are implementation state).
    Raises if the materializer has not produced a version yet."""
    meta = _read_pointer(target_dir)
    if meta is None:
        raise FileNotFoundError(
            f"no materialized version under {target_dir!r} (pointer missing)"
        )
    df = spark.read.parquet(os.path.join(target_dir, f"v{meta['version']}"))
    return df.where(F.col(op_col) != "D").drop("_epoch", op_col)
