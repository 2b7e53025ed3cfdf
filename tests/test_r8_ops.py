"""Round-8 behaviors: streaming LSH state TTL eviction + admit-once,
banding validation, and the first-touch pandas-dtype normalization.

The TTL test is the r7-verdict item 5 gate: with eviction enabled, the
state-store row count must STABILIZE (final state ≪ cumulative buckets)
while near-dups arriving INSIDE the horizon are still caught.
"""

from __future__ import annotations

import pandas as pd
import pytest

from flink_audit_sessions_example_spark.streaming.attribution import (
    _first_touch_fn,
)
from flink_audit_sessions_example_spark.streaming.dedup_stream import (
    _make_bucket_fn,
    stream_minhash_candidates,
)


class FakeState:
    """Minimal GroupState stand-in for driving the bucket fn directly."""

    def __init__(self, value=None, timed_out=False):
        self._value = value
        self.hasTimedOut = timed_out
        self.removed = False
        self.timeout_set = None

    @property
    def exists(self):
        return self._value is not None

    @property
    def get(self):
        return self._value

    def update(self, v):
        self._value = v

    def remove(self):
        self._value = None
        self.removed = True

    def setTimeoutDuration(self, ms):
        self.timeout_set = ms


def _batch(rows):
    return iter(
        [pd.DataFrame({"id": [r[0] for r in rows], "sig": [r[1] for r in rows]})]
    )


SIG_A = list(range(8))
SIG_A2 = list(range(7)) + [99]  # 7/8 agreement with SIG_A
SIG_B = list(range(100, 108))


def test_bucket_fn_admits_each_doc_once():
    """An at-least-once source re-delivering a doc must not burn another
    cap slot or re-emit pairs from a stored duplicate copy."""
    fn = _make_bucket_fn(8, 0.5, cap=2)
    state = FakeState()
    assert list(fn(("k",), _batch([(1, SIG_A)]), state)) == []
    # re-delivery of doc 1: state must still hold ONE member, leaving
    # the second cap slot free
    assert list(fn(("k",), _batch([(1, SIG_A)]), state)) == []
    ids, flat = state.get
    assert list(ids) == [1]
    # the free slot admits a genuinely distinct doc and pairs it
    out = list(fn(("k",), _batch([(2, SIG_A2)]), state))
    assert len(out) == 1 and list(out[0]["id_a"]) == [1]
    assert list(out[0]["est_jaccard"]) == [7 / 8]
    ids, _ = state.get
    assert list(ids) == [1, 2]


def test_bucket_fn_timeout_removes_state():
    fn = _make_bucket_fn(8, 0.5, cap=None, ttl_ms=60_000)
    state = FakeState(value=([1], list(SIG_A)), timed_out=True)
    assert list(fn(("k",), iter([]), state)) == []
    assert state.removed and not state.exists


def test_bucket_fn_sets_timeout_only_when_ttl_given():
    state = FakeState()
    list(_make_bucket_fn(8, 0.5, cap=None, ttl_ms=12_345)(
        ("k",), _batch([(1, SIG_A)]), state
    ))
    assert state.timeout_set == 12_345
    state2 = FakeState()
    list(_make_bucket_fn(8, 0.5, cap=None)(("k",), _batch([(1, SIG_A)]), state2))
    assert state2.timeout_set is None


def test_stream_minhash_bands_must_divide_num_hashes(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id bigint, text string")
    with pytest.raises(ValueError, match="bands must divide"):
        stream_minhash_candidates(df, num_hashes=64, bands=12)


def _write_doc_batches(tmp_path, batches):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "docs"
    d.mkdir()
    pa_schema = pa.schema([("doc_id", pa.int64()), ("text", pa.string())])
    for name, rows in batches:
        pq.write_table(
            pa.Table.from_pylist(
                [{"doc_id": i, "text": t} for i, t in rows], pa_schema
            ),
            str(d / name),
        )
    return d


def _run_stream(spark, d, qname, **kwargs):
    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    q = (
        stream_minhash_candidates(stream, threshold=0.5, **kwargs)
        .writeStream.format("memory")
        .queryName(qname)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    pairs = {
        (r.id_a, r.id_b): r.est_jaccard for r in spark.table(qname).collect()
    }
    state_rows = None
    for p in reversed(q.recentProgress):
        ops = p.get("stateOperators") or []
        if ops:
            state_rows = ops[0]["numRowsTotal"]
            break
    return pairs, state_rows


def test_stream_minhash_ttl_evicts_idle_buckets(spark, tmp_path):
    """With a tiny TTL, buckets idle for a whole micro-batch are evicted:
    a later near-copy of an expired document finds no match (the
    documented recall-beyond-horizon trade) and the final state-store
    row count stays bounded by the recent horizon instead of growing
    with every document ever seen."""
    base = " ".join(f"tok{i}" for i in range(60))
    filler = " ".join(f"f{i}x f{i}y" for i in range(40))
    batches = [
        ("b1.parquet", [(1, base)]),
        ("b2.parquet", [(2, filler)]),  # doc 1 idle -> evicted here
        ("b3.parquet", [(3, base)]),  # exact copy, but past the horizon
    ]
    d = _write_doc_batches(tmp_path, batches)
    pairs, state_rows = _run_stream(
        spark, d, "t_lsh_ttl", state_ttl_ms=1
    )
    assert (1, 3) not in pairs, pairs
    # only the LAST batch's buckets survive: 16 bands x 1 doc, minus
    # within-doc band-key collisions -> at most 16 state rows (the
    # lifetime variant below accumulates all three docs' buckets)
    assert state_rows is not None and state_rows <= 16, state_rows


def test_stream_minhash_ttl_in_horizon_pairs_still_caught(spark, tmp_path):
    """A generous TTL (arrivals inside the horizon) must not change the
    lifetime semantics: the cross-batch near-dup is still found and
    state accumulates all live buckets."""
    base = " ".join(f"tok{i}" for i in range(60))
    filler = " ".join(f"f{i}x f{i}y" for i in range(40))
    batches = [
        ("b1.parquet", [(1, base)]),
        ("b2.parquet", [(2, filler)]),
        ("b3.parquet", [(3, base)]),
    ]
    d = _write_doc_batches(tmp_path, batches)
    pairs, state_rows = _run_stream(
        spark, d, "t_lsh_ttl_wide", state_ttl_ms=3_600_000
    )
    assert pairs.get((1, 3)) == 1.0, pairs
    # all three docs' buckets still live
    assert state_rows is not None and state_rows > 16, state_rows


def test_first_touch_normalizes_non_ns_ts_dtype():
    """pandas 2.x can hand the ts column over as datetime64[us]; the
    first-touch fn must normalize BEFORE the int64 reinterpret (a bare
    astype would be 1000x off, corrupting ordering and first_ts)."""
    pdf = pd.DataFrame(
        {
            "ts": pd.array(
                [
                    pd.Timestamp("2024-01-02 00:00:00.000500"),
                    pd.Timestamp("2024-01-01 00:00:00.000500"),
                ],
                dtype="datetime64[us]",
            ),
            "event_id": [7, 3],
            "event_type": ["view", "click"],
            "value": [None, None],
        }
    )
    state = FakeState()
    out = list(_first_touch_fn((42,), iter([pdf]), state))
    assert len(out) == 1
    row = out[0].iloc[0]
    assert row["first_event_id"] == 3
    assert pd.Timestamp(row["first_ts"]) == pd.Timestamp(
        "2024-01-01 00:00:00.000500"
    )
    ft_us = state.get[0]
    assert ft_us == 1_704_067_200_000_500  # epoch micros, not 1000x off
