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

Scale honesty: each micro-batch of THIS materializer rewrites the
O(distinct keys) state table (read current version + union + aggregate
+ write next version). That is acceptable while key cardinality is
bounded, and it is the simplest thing plain parquet can do without
table-format transactions. The production path at 100 TB key
cardinality is :func:`make_partitioned_cdc_batch_applier` below — the
MERGE-INTO shape on plain parquet: state hash-bucketed on the key,
each micro-batch rewriting ONLY the buckets its keys touch (a
manifest pointer maps bucket → version, exactly a table format's
copy-on-write at partition granularity). Per-batch rewrite bytes are
bounded by touched buckets, not table size; the semantics (tombstone
retention, order-based merge, batch-id fencing) are identical —
``tests/test_stream_cdc_partitioned.py`` pins equality against
``cdc_apply`` and the touched-buckets-only write set.
"""

from __future__ import annotations

import abc
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


def _bucket_col(key_cols: "list[str]", n_buckets: int) -> F.Column:
    """The key→bucket hash shared by writer and reader: derivable from
    the key columns alone, so readers never depend on a stored
    partition column."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in key_cols]), n_buckets)


class MergeIntoTarget(abc.ABC):
    """The adapter seam between the CDC merge LAW and the storage
    transaction (r14 verdict #8). The applier owns the semantics —
    epoch/order-based ``max(struct)`` folding, snapshot seeding,
    at-least-once fencing by batch id — and hands each micro-batch's
    per-key state delta to the target, which owns atomicity and
    layout.

    :class:`BucketParquetTarget` below is the in-repo implementation
    (copy-on-write bucket parquet + pointer manifest). An ACID table
    format drops in by implementing :meth:`merge` as one transactional
    statement::

        MERGE INTO target t USING updates u ON <key_cols equal>
        WHEN MATCHED THEN UPDATE SET state = greatest(t.state, u.state)
        WHEN NOT MATCHED THEN INSERT *

    (with ``state`` the ``struct(_epoch, *order_cols, op, *payload)``
    the law folds over) plus its own durable applied-batch watermark
    backing :meth:`last_applied`. The law-side tests
    (``tests/test_stream_cdc_partitioned.py``: batch-replay equality,
    slicing invariance) run through this interface, so a new target
    inherits them unchanged."""

    @abc.abstractmethod
    def last_applied(self) -> "int | None":
        """Last batch id durably merged, or ``None`` for a fresh
        target. The applier fences on it: an equal id is skipped
        (at-least-once redelivery), a lower id raises."""

    @abc.abstractmethod
    def merge(self, updates: DataFrame, batch_id: int) -> None:
        """Atomically fold ``updates`` — ONE state row per key, the
        per-key ``max(struct)`` of this batch, with columns
        ``key_cols + [_epoch, *order_cols, op_col, *payload_cols]`` —
        into the stored per-key state under the same max(struct) law,
        recording ``batch_id`` durably in the same transaction. Must
        be all-or-nothing: a crash mid-merge leaves the previous state
        readable (and ``last_applied`` unchanged)."""

    @abc.abstractmethod
    def read(self) -> DataFrame:
        """The readable view: live rows only (tombstones filtered),
        internal columns dropped."""


class BucketParquetTarget(MergeIntoTarget):
    """Plain-parquet :class:`MergeIntoTarget`: per-key state lives
    hash-bucketed on ``pmod(xxhash64(key), n_buckets)`` and each merge
    rewrites ONLY the buckets its keys touch.

    Layout: ``target_dir/v<version>/_bucket=<b>/...`` — one version
    directory per applied batch holding ONLY that batch's touched
    buckets; the pointer manifest maps every bucket to the version
    that last rewrote it (a table format's copy-on-write manifest at
    partition granularity, in one JSON file). The pointer flips
    atomically (tmp + rename) AFTER the new version directory is fully
    written, so a crash mid-merge leaves the previous state current.

    100 TB honesty: per-batch I/O = (read + write) of touched buckets
    only — for a trickle changelog over a huge table that is
    ``O(batch keys / n_buckets share)``, not O(table). ``n_buckets``
    trades rewrite amplification (bigger buckets) against small-file
    pressure and manifest size (more buckets); at real scale pick
    ``n_buckets ≈ table_bytes / target_rewrite_bytes``. Bucket counts
    are FROZEN at table creation (the pointer records it and the
    merge refuses a mismatch) — rebucketing is a full rewrite, the
    same contract every hash-bucketed table format has."""

    def __init__(
        self,
        spark: SparkSession,
        target_dir: str,
        *,
        key_cols: "list[str]",
        order_cols: "list[str]",
        payload_cols: "list[str]",
        op_col: str = "op",
        n_buckets: int = 16,
    ) -> None:
        if "://" in target_dir:
            raise ValueError(
                f"target_dir must be a local filesystem path, got "
                f"{target_dir!r} (the pointer manifest uses driver-local "
                "atomic rename; remote stores need a transactional catalog)"
            )
        if n_buckets < 1:
            raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
        os.makedirs(target_dir, exist_ok=True)
        self.spark = spark
        self.target_dir = target_dir
        self.key_cols = list(key_cols)
        self.order_cols = list(order_cols)
        self.payload_cols = list(payload_cols)
        self.op_col = op_col
        self.n_buckets = n_buckets

    def __repr__(self) -> str:  # pragma: no cover - diagnostics only
        return f"BucketParquetTarget({self.target_dir!r})"

    def last_applied(self) -> "int | None":
        meta = _read_pointer(self.target_dir)
        return None if meta is None else meta["batch_id"]

    def read(self) -> DataFrame:
        return read_materialized_partitioned(
            self.spark, self.target_dir, op_col=self.op_col
        )

    def merge(self, updates: DataFrame, batch_id: int) -> None:
        from ..operators.dedup import max_struct_state

        spark, target_dir = self.spark, self.target_dir
        key_cols, n_buckets = self.key_cols, self.n_buckets
        state_cols = [
            "_epoch", *self.order_cols, self.op_col, *self.payload_cols
        ]
        meta = _read_pointer(target_dir)
        if meta is not None and meta.get("n_buckets") != n_buckets:
            raise ValueError(
                f"target {target_dir!r} was created with "
                f"n_buckets={meta.get('n_buckets')}, applier configured "
                f"with {n_buckets}: rebucketing requires a full rewrite "
                "to a fresh target"
            )

        new = updates.withColumn("_bucket", _bucket_col(key_cols, n_buckets))
        # `new` feeds two actions per batch — the touched-bucket collect
        # and the state write — so persist once (the plans' two-consumer
        # rule); without it the batch transform (and the epoch-0
        # snapshot scan on the seed batch) is evaluated twice.
        new = new.persist()
        try:
            # touched set is ≤ n_buckets rows — a bounded driver collect
            touched = sorted(
                r._bucket
                for r in new.select("_bucket").distinct().collect()
            )
            buckets: "dict[str, int]" = dict(meta["buckets"]) if meta else {}
            version = 0 if meta is None else meta["version"] + 1
            if touched:
                base_paths = [
                    os.path.join(
                        target_dir, f"v{buckets[str(b)]}", f"_bucket={b}"
                    )
                    for b in touched
                    if str(b) in buckets
                ]
                union = new.drop("_bucket")
                if base_paths:
                    # leaf-directory reads carry no partition column; the
                    # bucket is re-derived from the key itself (_bucket_col),
                    # so the files stay pure data
                    base = spark.read.parquet(*base_paths)
                    union = base.unionByName(union)
                state = max_struct_state(
                    union,
                    key_cols=key_cols,
                    field_cols=state_cols,
                ).withColumn("_bucket", _bucket_col(key_cols, n_buckets))
                (
                    state.repartition(len(touched), "_bucket")
                    .write.mode("overwrite")
                    .partitionBy("_bucket")
                    .parquet(os.path.join(target_dir, f"v{version}"))
                )
                for b in touched:
                    buckets[str(b)] = version
                state_schema = state.drop("_bucket").schema.json()
            else:
                # empty batch (no snapshot): record the state SCHEMA in
                # the pointer so the reader can return an empty view —
                # the full-rewrite twin writes an empty v0 parquet and
                # reads back empty; the partitioned twin must not
                # diverge (r14 advice). Schema derivation is analysis
                # only, no action.
                state_schema = new.drop("_bucket").schema.json()
        finally:
            new.unpersist()
        prev = dict(meta["buckets"]) if meta else {}
        _write_pointer(
            target_dir,
            {
                "version": version,
                "batch_id": batch_id,
                "n_buckets": n_buckets,
                "buckets": buckets,
                "prev_buckets": prev,
                "state_schema": state_schema,
            },
        )
        # GC: a bucket directory is live iff the CURRENT or the
        # immediately-previous manifest references it (the previous
        # generation stays readable across the pointer flip and is the
        # rollback point); everything else goes
        import re
        import shutil

        live = {
            (int(v), int(b))
            for m in (buckets, prev)
            for b, v in m.items()
        }
        for vname in os.listdir(target_dir):
            m = re.fullmatch(r"v(\d+)", vname)
            if not m:
                continue
            vdir = os.path.join(target_dir, vname)
            for bname in os.listdir(vdir):
                bm = re.fullmatch(r"_bucket=(\d+)", bname)
                if bm and (int(m.group(1)), int(bm.group(1))) not in live:
                    shutil.rmtree(
                        os.path.join(vdir, bname), ignore_errors=True
                    )
            if not any(
                n.startswith("_bucket=") for n in os.listdir(vdir)
            ):
                shutil.rmtree(vdir, ignore_errors=True)


def make_partitioned_cdc_batch_applier(
    spark: SparkSession,
    *,
    key_cols: "list[str]",
    order_cols: "list[str]",
    payload_cols: "list[str]",
    op_col: str = "op",
    target_dir: "str | None" = None,
    snapshot: "DataFrame | None" = None,
    n_buckets: int = 16,
    target: "MergeIntoTarget | None" = None,
):
    """The MERGE-INTO-shaped materializer (the production path named
    by the module docstring). This function owns the merge LAW —
    epoch/order encoding, per-key ``max(struct)`` folding, snapshot
    seeding on the first batch, at-least-once fencing — and delegates
    storage to a :class:`MergeIntoTarget` (default: a
    :class:`BucketParquetTarget` over ``target_dir``; pass ``target=``
    to drop in an ACID table format). The merge is the same
    associative ``max(struct(epoch, order, op, payload))`` as the
    full-rewrite twin, so any batch slicing of the log yields the
    batch-replay answer regardless of the target."""
    if target is None:
        if target_dir is None:
            raise ValueError("provide target_dir or an explicit target")
        target = BucketParquetTarget(
            spark,
            target_dir,
            key_cols=key_cols,
            order_cols=order_cols,
            payload_cols=payload_cols,
            op_col=op_col,
            n_buckets=n_buckets,
        )
    cdc_cols = dict(
        key_cols=key_cols,
        order_cols=order_cols,
        payload_cols=payload_cols,
        op_col=op_col,
    )
    state_cols = ["_epoch", *order_cols, op_col, *payload_cols]

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        from ..operators.dedup import (
            cdc_epoch0_rows,
            cdc_epoch1_rows,
            max_struct_state,
        )

        last = target.last_applied()
        if last is not None and batch_id < last:
            raise RuntimeError(
                f"batch_id {batch_id} < last applied {last} for "
                f"{target!r}: streaming checkpoint was reset against an "
                "existing target. Point the query at a fresh target_dir or "
                "restore the original checkpoint."
            )
        if last is not None and batch_id == last:
            return  # fenced: at-least-once redelivery of the applied batch

        new = cdc_epoch1_rows(batch_df, **cdc_cols)
        if last is None and snapshot is not None:
            # the seed epoch writes every snapshot key once
            new = cdc_epoch0_rows(
                snapshot, batch_df.schema, **cdc_cols
            ).unionByName(new)
        # the per-batch delta the seam hands over: ONE row per key (the
        # batch-local max-struct) — folding it into stored state is the
        # target's transaction; associativity of max makes the two-step
        # fold equal to the whole-log fold.
        updates = max_struct_state(
            new, key_cols=key_cols, field_cols=state_cols
        )
        target.merge(updates, batch_id)

    return apply_batch


def materialize_cdc_stream_partitioned(
    changelog: DataFrame,
    *,
    key_cols: "list[str]",
    order_cols: "list[str]",
    payload_cols: "list[str]",
    op_col: str = "op",
    target_dir: str,
    checkpoint_dir: str,
    snapshot: "DataFrame | None" = None,
    n_buckets: int = 16,
    available_now: bool = True,
    poll_seconds: "int | None" = None,
    target: "MergeIntoTarget | None" = None,
):
    """Start the partitioned (MERGE-shaped) materializer; returns the
    StreamingQuery. Read with :func:`read_materialized_partitioned`
    (or ``target.read()`` for a custom :class:`MergeIntoTarget`)."""
    from .pipeline import write_foreach_batch

    fn = make_partitioned_cdc_batch_applier(
        changelog.sparkSession,
        key_cols=key_cols,
        order_cols=order_cols,
        payload_cols=payload_cols,
        op_col=op_col,
        target_dir=target_dir,
        snapshot=snapshot,
        n_buckets=n_buckets,
        target=target,
    )
    return write_foreach_batch(
        changelog,
        fn,
        checkpoint_dir=checkpoint_dir,
        available_now=available_now,
        poll_seconds=poll_seconds,
        output_mode="append",
    )


def read_materialized_partitioned(
    spark: SparkSession,
    target_dir: str,
    *,
    op_col: str = "op",
) -> DataFrame:
    """The readable view of the partitioned target: the union of every
    bucket's LATEST version per the pointer manifest, tombstones and
    internal columns filtered exactly like :func:`read_materialized`."""
    meta = _read_pointer(target_dir)
    if meta is None:
        raise FileNotFoundError(
            f"no materialized version under {target_dir!r} (pointer missing)"
        )
    paths = [
        os.path.join(target_dir, f"v{v}", f"_bucket={b}")
        for b, v in sorted(meta["buckets"].items(), key=lambda kv: int(kv[0]))
    ]
    if not paths:
        # an applied-but-empty first batch materializes no bucket, only
        # the pointer; the full-rewrite twin returns an empty view here
        # (it wrote an empty v0 parquet), so this twin does too, from
        # the state schema the applier recorded in the pointer.
        schema_json = meta.get("state_schema")
        if schema_json is None:
            raise FileNotFoundError(
                f"pointer in {target_dir!r} references no buckets and "
                "records no state schema (pre-r15 target): nothing to read"
            )
        from pyspark.sql.types import StructType

        df = spark.createDataFrame(
            [], StructType.fromJson(json.loads(schema_json))
        )
        return df.where(F.col(op_col) != "D").drop("_epoch", op_col)
    df = spark.read.parquet(*paths)
    return df.where(F.col(op_col) != "D").drop("_epoch", op_col)


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
