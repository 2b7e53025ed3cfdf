"""Streaming near-dup candidate detection — MinHash LSH over a document
stream with ``applyInPandasWithState``.

The batch twin is ``operators/dedup.py::minhash_near_dup_pairs``; this is
its CONTINUOUS-INGEST half: "does this incoming document near-duplicate
anything we have already accepted?" — the stage a crawl/training-data
pipeline runs before admitting new documents, where re-running the batch
dedup over the full corpus per increment is the thing that does not scale.

Shape (all reused from the batch operators):

1. **Stateless prefix** — ``minhash_doc_sigs`` (the Arrow tokenizer pass;
   one row in, one signature out — streaming-safe by construction) and
   the same affine ``_band_key`` banding projection.
2. **Stateful bucket match** — keyed by band bucket, state = the bucket's
   accepted members (ids + their signatures, flattened to fixed-width
   arrays). Each new member is compared against the existing members by
   SIGNATURE AGREEMENT (fraction of matching minhash components — the
   unbiased Jaccard estimator); matches at/above ``threshold`` emit
   candidate pairs, then the member joins the bucket state.

Contracts, stated plainly:

- **Estimator, not exact.** The batch operator verifies candidates with
  exact Jaccard over the original texts; a streaming state store cannot
  hold the corpus text, so pairs carry ``est_jaccard`` (64-hash
  agreement, σ ≈ 0.06 at j=0.5). Route emitted pairs through the batch
  verifier if exactness matters — candidates here, verdicts downstream.
- **At-least-once per pair.** A pair colliding in several bands emits
  from each (same est_jaccard every time — signatures are
  deterministic); deduplicate downstream (``dropDuplicates`` in a batch
  sink, or ``dropDuplicatesWithinWatermark`` in-stream).
- **Bounded state.** ``max_bucket_size`` caps members per bucket — the
  same degenerate-bucket trade as the batch ``MAX_BUCKET_SIZE``: an
  over-cap bucket stops admitting members (arrivals still match against
  the stored prefix), so one boilerplate bucket cannot grow state or
  quadratic match work without bound. State per bucket ≤
  cap · (num_hashes + 1) longs.
- **Lifetime state by default; opt-in TTL eviction for true infinite
  streams.** "Seen so far" is a lifetime set, like the batch corpus it
  mirrors — right for bounded backfills, but the NUMBER of band-bucket
  state keys grows with every distinct text ever seen, so on a truly
  unbounded stream the state store grows without bound even though each
  bucket is capped. ``state_ttl_ms`` (processing-time horizon in
  milliseconds) bounds total state: a bucket idle for the TTL is
  REMOVED (``GroupStateTimeout.ProcessingTimeTimeout``), trading recall
  beyond the horizon — a near-dup of a document whose buckets have all
  expired is silently re-admitted — for stable state size. Activity
  resets the clock, so hot buckets never expire; pick the TTL as the
  re-crawl horizon you actually need to dedup against.

At scale: one shuffle on the band key per micro-batch (the same exchange
the batch banding pays), state store size = buckets × bounded members —
and with ``state_ttl_ms`` set, buckets ≤ the distinct band keys seen within
one TTL horizon instead of ever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CANDIDATES_OUTPUT = "id_a bigint, id_b bigint, est_jaccard double"
_BUCKET_STATE = "ids array<bigint>, sigs array<bigint>"


def _make_bucket_fn(
    num_hashes: int,
    threshold: float,
    cap: int | None,
    ttl_ms: int | None = None,
):
    def fn(key, pdfs, state):
        import numpy as np
        import pandas as pd

        if state.hasTimedOut:
            # TTL eviction: the bucket saw no arrivals for the whole
            # horizon — drop its members (recall beyond the horizon is
            # forfeited by contract; see module docstring)
            state.remove()
            return

        if state.exists:
            ids, flat = state.get
            ids = list(ids)
            sigs = [
                flat[i * num_hashes : (i + 1) * num_hashes]
                for i in range(len(ids))
            ]
        else:
            ids, sigs = [], []

        out_a: list[int] = []
        out_b: list[int] = []
        out_j: list[float] = []
        for pdf in pdfs:
            for doc_id, sig in zip(pdf["id"], pdf["sig"]):
                doc_id = int(doc_id)
                sig = np.asarray(sig, dtype=np.int64)
                for mid, msig in zip(ids, sigs):
                    if mid == doc_id:
                        continue
                    est = float(
                        (np.asarray(msig, dtype=np.int64) == sig).mean()
                    )
                    if est >= threshold:
                        a, b = sorted((mid, doc_id))
                        out_a.append(a)
                        out_b.append(b)
                        out_j.append(est)
                # admit once: an at-least-once source re-delivering a
                # doc in a later micro-batch must not burn another cap
                # slot (a bucket could otherwise fill with copies of one
                # doc, blocking genuinely distinct members) or re-emit
                # its pairs from a duplicate stored copy
                if (cap is None or len(ids) < cap) and doc_id not in ids:
                    ids.append(doc_id)
                    sigs.append([int(x) for x in sig])

        state.update((ids, [x for s in sigs for x in s]))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        if out_a:
            yield pd.DataFrame(
                {"id_a": out_a, "id_b": out_b, "est_jaccard": out_j}
            )

    return fn


def stream_minhash_candidates(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
    max_bucket_size: int | None = 200,
    state_ttl_ms: int | None = None,
) -> DataFrame:
    """Near-dup candidate pairs between each arriving document and every
    previously seen document (update mode; see module docstring for the
    estimator / at-least-once / bounded-state contracts).

    ``state_ttl_ms``: optional processing-time horizon (milliseconds)
    after which an IDLE bucket's state is evicted —
    bounds total state-store size on unbounded streams at the cost of
    recall beyond the horizon (module docstring). Default ``None`` keeps
    the batch-mirroring lifetime set.

    Trigger note: with a TTL set, Spark keeps scheduling no-data
    batches to process pending timeouts, so a ``Trigger.AvailableNow``
    run never self-terminates — stop the query explicitly once the
    backfill is drained (observed on Spark 4.1; the TTL targets
    continuous ``processingTime`` streams, where queries run forever by
    design)."""
    from ..operators.dedup import _band_key
    from ..operators.text import minhash_doc_sigs

    if num_hashes % bands != 0:
        # a silent floor would band only the first bands·(num_hashes//bands)
        # signature components, quietly changing collision recall
        raise ValueError(
            f"bands must divide num_hashes: got num_hashes={num_hashes}, "
            f"bands={bands}"
        )
    rows_per_band = num_hashes // bands
    sigs = minhash_doc_sigs(
        docs.select(F.col(id_col), F.col(text_col)),
        id_col=id_col,
        text_col=text_col,
        k=k,
        num_hashes=num_hashes,
    )
    banded = sigs.select(
        "id",
        "sig",
        F.explode(
            F.array(
                *[
                    _band_key("affine", rows_per_band, b)
                    for b in range(bands)
                ]
            )
        ).alias("bkey"),
    )
    return banded.groupBy("bkey").applyInPandasWithState(
        _make_bucket_fn(num_hashes, threshold, max_bucket_size, state_ttl_ms),
        outputStructType=CANDIDATES_OUTPUT,
        stateStructType=_BUCKET_STATE,
        outputMode="update",
        timeoutConf=(
            "ProcessingTimeTimeout" if state_ttl_ms is not None else "NoTimeout"
        ),
    )
