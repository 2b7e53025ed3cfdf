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


def _run_phases(spark, tmp_path, phases, ttl_ms):
    """Run the LSH stream as one checkpointed query RESTARTED once per
    phase (one new file each), returning the accumulated candidate
    pairs and the last observed state-store row count.

    Why restarts instead of one availableNow run over all files: TTL
    eviction fires when a batch starts after a key's horizon expired,
    so a single run's micro-batch spacing decides whether eviction
    happens before the next document arrives — timing-dependent under
    load (observed flaky in-suite). Each restart's first batch begins
    well past any tiny TTL set in the previous phase, making "idle
    across a phase boundary" deterministic. A TTL'd query also never
    self-terminates under availableNow (Spark keeps scheduling
    timeout-processing batches), so each phase polls for its input and
    stops the query explicitly.
    """
    import time

    d = tmp_path / "docs"
    d.mkdir()
    chk = str(tmp_path / "chk")
    pa_schema = None
    pairs: dict = {}
    state_rows = None
    for name, rows in phases:
        import pyarrow as pa
        import pyarrow.parquet as pq

        if pa_schema is None:
            pa_schema = pa.schema(
                [("doc_id", pa.int64()), ("text", pa.string())]
            )
        pq.write_table(
            pa.Table.from_pylist(
                [{"doc_id": i_, "text": t} for i_, t in rows], pa_schema
            ),
            str(d / name),
        )
        stream = spark.readStream.schema(
            "doc_id bigint, text string"
        ).parquet(str(d))

        def sink(batch_df, _epoch):
            for r in batch_df.collect():
                pairs[(r.id_a, r.id_b)] = r.est_jaccard

        # foreachBatch, not the memory sink: only foreachBatch supports
        # restarting from the shared checkpoint (memory sink refuses)
        q = (
            stream_minhash_candidates(
                stream, threshold=0.5, state_ttl_ms=ttl_ms
            )
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", chk)
            .trigger(availableNow=True)
            .start()
        )
        try:
            deadline = time.time() + 120
            while time.time() < deadline:
                progress = q.recentProgress
                seen = sum(p["numInputRows"] for p in progress)
                if seen >= len(rows) and progress[-1].get("stateOperators"):
                    state_rows = progress[-1]["stateOperators"][0][
                        "numRowsTotal"
                    ]
                    break
                if not q.isActive:
                    for p in reversed(progress):
                        if p.get("stateOperators"):
                            state_rows = p["stateOperators"][0][
                                "numRowsTotal"
                            ]
                            break
                    break
                time.sleep(0.3)
        finally:
            q.stop()
    return pairs, state_rows


def test_stream_minhash_ttl_evicts_idle_buckets(spark, tmp_path):
    """With a tiny TTL, buckets idle for a whole micro-batch are evicted:
    a later near-copy of an expired document finds no match (the
    documented recall-beyond-horizon trade) and the final state-store
    row count stays bounded by the recent horizon instead of growing
    with every document ever seen."""
    base = " ".join(f"tok{i}" for i in range(60))
    filler = " ".join(f"f{i}x f{i}y" for i in range(40))
    phases = [
        ("b1.parquet", [(1, base)]),
        ("b2.parquet", [(2, filler)]),  # doc 1 idle -> evicted here
        ("b3.parquet", [(3, base)]),  # exact copy, but past the horizon
    ]
    pairs, state_rows = _run_phases(spark, tmp_path, phases, ttl_ms=1)
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
    phases = [
        ("b1.parquet", [(1, base)]),
        ("b2.parquet", [(2, filler)]),
        ("b3.parquet", [(3, base)]),
    ]
    pairs, state_rows = _run_phases(
        spark, tmp_path, phases, ttl_ms=3_600_000
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


def test_ngram_novelty_planted_semantics(spark):
    """Hand-checkable novelty: shared shingles score down, exact dups
    score 0, short docs get NULL novelty with zero counts."""
    from flink_audit_sessions_example_spark.operators.text import (
        ngram_novelty_score,
    )

    docs = spark.createDataFrame(
        [
            (1, "a b c d e"),  # shingles: "a b c","b c d","c d e"
            (2, "a b c x y"),  # shares "a b c" with doc 1
            (3, "z1 z2 z3"),  # one shingle, corpus-unique
            (4, "p q"),  # < k words: no shingles
            (5, "m n o p5"),  # exact duplicate pair ->
            (6, "m n o p5"),  # every shingle df=2, novelty 0
        ],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r for r in ngram_novelty_score(docs).collect()}
    assert len(out) == 6
    assert (out[1].n_shingles, out[1].n_unique) == (3, 2)
    assert out[1].novelty == pytest.approx(2 / 3, abs=1e-6)
    assert out[2].novelty == pytest.approx(2 / 3, abs=1e-6)
    assert (out[3].n_shingles, out[3].n_unique, out[3].novelty) == (1, 1, 1.0)
    assert (out[4].n_shingles, out[4].n_unique) == (0, 0)
    assert out[4].novelty is None
    assert out[5].novelty == 0.0 and out[6].novelty == 0.0


def test_ngram_novelty_matches_duckdb(spark):
    """Cross-engine parity on the real corpus (pre-validates the r9
    oracle registration; non-vacuous there: sf0.01 novelty spans
    0 -> 2/3 with mean ~0.36)."""
    from conftest import SF_DIR
    from oracle_utils import assert_parity

    from flink_audit_sessions_example_spark.operators.text import (
        ngram_novelty_score,
    )
    from flink_audit_sessions_example_spark.plans.extended import _sql_shingles
    from flink_audit_sessions_example_spark.sources import load_table

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    sql = f"""
    WITH sh AS (
      SELECT doc_id, unnest({_sql_shingles(3)}) AS sh FROM documents
    ), dfc AS (
      SELECT sh, COUNT(*) AS df_sh FROM sh GROUP BY sh
    ), per AS (
      SELECT s.doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_shingles,
             CAST(SUM(CASE WHEN d.df_sh = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_unique
      FROM sh s JOIN dfc d USING (sh) GROUP BY s.doc_id
    )
    SELECT d.doc_id,
           COALESCE(p.n_shingles, 0) AS n_shingles,
           COALESCE(p.n_unique, 0) AS n_unique,
           ROUND(CAST(p.n_unique AS DOUBLE) / p.n_shingles, 6) AS novelty
    FROM documents d LEFT JOIN per p USING (doc_id)
    """
    assert_parity(ngram_novelty_score(docs), sql, SF_DIR)
