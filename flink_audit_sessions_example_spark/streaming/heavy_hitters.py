"""Continuous heavy hitters — Misra-Gries over an unbounded stream with
``applyInPandasWithState``.

The batch twin is ``operators/sketches.py::heavy_hitters``; this is its
continuous-ingest half: "what are the most frequent values seen so far?"
maintained incrementally — the per-key counting a 100 TB stream cannot
do exactly (one state row per distinct key, unbounded) done with
A-PRIORI BOUNDED state instead: ``n_buckets × capacity`` counters total,
fixed at plan time, independent of throughput, key cardinality, and
stream lifetime. No TTL machinery is needed — unlike the LSH dedup
stream's per-bucket member lists, the state size cannot grow past its
cap by construction.

Shape:

1. **Stateless prefix** — project the key, hash it to one of
   ``n_buckets`` groups (``pmod(xxhash64(key), n_buckets)``). Each key
   lives in EXACTLY ONE bucket, so per-key estimates never need
   cross-bucket merging (sharper than the batch operator's
   partition-merged bound, which sums deficits across partitions).
2. **Stateful count** — keyed by bucket, state = the bucket's
   Misra-Gries counters (≤ ``capacity``) plus its arrival count. Each
   micro-batch folds pandas ``value_counts`` into the counters and
   compresses by the batched MG rule (subtract the (capacity+1)-th
   largest value from all, drop non-positives).

Contracts:

- **Underestimate-only, bounded**: for every emitted row,
  ``est ≤ true ≤ est + err_bound`` where ``true`` is the key's exact
  count of arrivals so far and ``err_bound = (n_b − w_b) //
  (capacity+1)`` uses only the key's OWN bucket totals.
- **Membership above the bound**: any key whose true count exceeds its
  bucket's ``err_bound`` is present in that bucket's latest summary.
- **Replace-per-bucket emission**: a touched bucket re-emits its WHOLE
  current summary each micro-batch, stamped with ``ver`` (the bucket's
  monotonic arrival count). Consumers keep the rows with the max
  ``ver`` per bucket — a key dropped by compression disappears from the
  next emission, and latest-wins semantics retract it (a latest-per-
  (bucket, key) view would keep stale dropped rows). When compression
  empties a bucket's summary entirely, the bucket emits ONE NULL-key
  marker row (est 0) at the new ``ver`` — consumers treat a max-ver
  NULL-key row as "no keys currently reported", so retraction still
  happens.
- **At-least-once caveat**: a re-delivered input row is re-counted —
  counts here are arrival counts. Deduplicate upstream
  (``stream_dedup``) when exactly-once counting matters.

At scale: one shuffle on the bucket id per micro-batch; emission volume
≤ touched_buckets × capacity rows per batch; state store exactly
``n_buckets`` rows of ≤ ``capacity`` (key, weight) pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HH_OUTPUT = "bucket int, key string, est bigint, err_bound bigint, ver bigint"
_HH_STATE = "keys array<string>, ws array<long>, n long"


def _make_hh_fn(capacity: int):
    def fn(key, pdfs, state):
        import pandas as pd

        bucket = int(key[0])
        if state.exists:
            keys, ws, n = state.get
            counters = dict(zip(keys, (int(w) for w in ws)))
            n = int(n)
        else:
            counters, n = {}, 0

        for pdf in pdfs:
            vc = pdf["_k"].value_counts()  # drops NULL keys
            n += int(vc.sum())
            for k2, c in vc.items():
                counters[k2] = counters.get(k2, 0) + int(c)
            if len(counters) > capacity:
                v = sorted(counters.values(), reverse=True)[capacity]
                counters = {
                    k2: c - v for k2, c in counters.items() if c - v > 0
                }

        w = sum(counters.values())
        state.update((list(counters), list(counters.values()), n))
        bound = (n - w) // (capacity + 1)
        if counters:
            yield pd.DataFrame(
                {
                    "bucket": [bucket] * len(counters),
                    "key": list(counters),
                    "est": list(counters.values()),
                    "err_bound": [bound] * len(counters),
                    "ver": [n] * len(counters),
                }
            )
        elif n:
            # compression can empty the whole summary (e.g. an all-
            # distinct batch at small capacity). A silent skip would
            # leave latest-wins consumers holding the PREVIOUS summary
            # as current — stale rows whose est/bound claims no longer
            # hold. Emit an explicit empty-summary marker (NULL key) so
            # the retraction contract survives: max-ver rows with a
            # NULL key mean "this bucket currently reports no keys".
            yield pd.DataFrame(
                {
                    "bucket": [bucket],
                    "key": [None],
                    "est": [0],
                    "err_bound": [bound],
                    "ver": [n],
                }
            )

    return fn


def stream_heavy_hitters(
    df: DataFrame,
    key_col: str,
    *,
    capacity: int = 256,
    n_buckets: int = 64,
) -> DataFrame:
    """Continuously-maintained approximate most-frequent values (update
    mode; see the module docstring for the bound / membership /
    replace-per-bucket contracts).

    ``n_buckets`` trades shuffle parallelism against summary size —
    total state is exactly ``n_buckets × capacity`` counters whatever
    the stream does. Output: ``(bucket, key, est, err_bound, ver)``.
    """
    if capacity < 1:
        raise ValueError(f"capacity must be >= 1, got {capacity}")
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    # NULL keys are ignored (the batch twin's value_counts contract);
    # unfiltered they would form a NULL bucket whose fn key crashes
    keyed = df.where(F.col(key_col).isNotNull()).select(
        F.col(key_col).cast("string").alias("_k"),
        F.pmod(F.xxhash64(F.col(key_col).cast("string")), F.lit(n_buckets))
        .cast("int")
        .alias("_bucket"),
    )
    return keyed.groupBy("_bucket").applyInPandasWithState(
        _make_hh_fn(int(capacity)),
        outputStructType=HH_OUTPUT,
        stateStructType=_HH_STATE,
        outputMode="update",
        timeoutConf="NoTimeout",
    )
