"""Continuous quantiles — the bottom-k sample sketch over an unbounded
stream with ``applyInPandasWithState``.

The batch twin is ``operators/sketches.py::quantile_sketch_table`` /
``quantile_sketch_estimate``; this is its continuous-ingest half:
"what are the group's percentiles over everything seen so far?"
maintained incrementally with A-PRIORI BOUNDED state — exactly ``k``
(draw, key, value) entries per group, fixed at plan time, independent
of throughput and stream lifetime (the stream sibling of the batch
table's WindowGroupLimit bound).

Why the bottom-k formulation ports to streams unchanged: the sample is
defined purely by the ``k`` smallest content-derived md5 draws, and
that definition is ORDER-FREE — folding rows in micro-batch arrival
order yields byte-identical state to a batch build over the union
(pinned in tests). Two properties fall out for free:

- **Exactly-once effect under at-least-once delivery**: a re-delivered
  row carries the same key, and the fold keeps ONE entry per key —
  exact duplicates change nothing. A duplicate key arriving with a
  DIFFERENT value (a violation of the family's unique-key caller
  contract — the stream cannot distinguish it from a re-delivery)
  resolves order-freely to the smallest value; the batch twin instead
  keeps both rows, so the stream-equals-batch guarantee below is
  scoped to the contract.
- **Restart-stable**: state rebuilt from the checkpoint continues the
  same deterministic fold; there is no RNG to re-seed.

Emission (update mode): each touched group re-emits its CURRENT
estimates — ``(group, p_<percent>…, m, ver)`` with ``m`` the live
sample size and ``ver`` the group's monotonic arrival count; consumers
keep the max-``ver`` row per group (latest-wins). The full sample is
deliberately NOT emitted per batch (k rows × touched groups × batches);
read the state's view through the estimates, or run the batch sketch
for the sample itself.

Numeric keys order numerically on draw ties (the batch twin orders
``qs_key`` in its original type — a lexicographic "10" < "9" would
diverge); the key's dtype is sniffed from the input schema at plan
time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType

_STATE = "keys array<string>, draws array<long>, vals array<double>, n long"


def _py_draw(key_str: str) -> int:
    """Python twin of ``text.md5_draw`` — first 8 md5 hex digits as an
    int. Must stay bit-identical to the Catalyst expression (pinned by
    the stream-equals-batch test)."""
    import hashlib

    return int(hashlib.md5(key_str.encode("utf-8")).hexdigest()[:8], 16)


def _make_qs_fn(k: int, probabilities: tuple[float, ...], numeric_key: bool):
    def _key_cmp(key_str: str):
        return float(key_str) if numeric_key else key_str

    def fn(key, pdfs, state):
        import math

        import pandas as pd

        if state.exists:
            keys, draws, vals, n = state.get
            sample = {
                ks: (int(d), float(v))
                for ks, d, v in zip(keys, draws, vals)
            }
            n = int(n)
        else:
            sample, n = {}, 0

        touched = False
        for pdf in pdfs:
            for ks, v in zip(pdf["_k"], pdf["_v"]):
                if ks is None or v is None or (
                    isinstance(v, float) and math.isnan(v)
                ):
                    continue
                touched = True
                n += 1
                prev = sample.get(ks)
                if prev is None:
                    sample[ks] = (_py_draw(ks), float(v))
                elif float(v) < prev[1]:
                    # duplicate key, different value (contract
                    # violation): resolve ORDER-FREELY to the smallest
                    # value — arrival order must never decide state
                    sample[ks] = (prev[0], float(v))
            if len(sample) > k:
                order = sorted(
                    sample.items(),
                    key=lambda it: (it[1][0], _key_cmp(it[0]), it[1][1]),
                )[:k]
                sample = dict(order)
        if not touched:
            return
        state.update(
            (
                list(sample),
                [d for d, _ in sample.values()],
                [v for _, v in sample.values()],
                n,
            )
        )
        svals = sorted(v for _, v in sample.values())
        m = len(svals)
        row = {"group": [key[0]]}
        for p in probabilities:
            idx = max(1, math.ceil(p * m)) - 1
            row[f"p_{int(p * 100)}"] = [svals[idx]]
        row["m"] = [m]
        row["ver"] = [n]
        yield pd.DataFrame(row)

    return fn


def stream_quantile_sketch(
    df: DataFrame,
    value_col: str,
    *,
    key_col: str,
    group_col: str,
    k: int = 1024,
    probabilities: tuple[float, ...] = (0.25, 0.5, 0.75),
) -> DataFrame:
    """Continuously-maintained per-group percentiles (update mode; see
    the module docstring for the bounded-state / idempotence /
    latest-wins contracts). Output: ``(group, p_<percent>…, m, ver)``.

    Under the family's unique-key caller contract, the estimates equal
    ``quantile_sketch_estimate(quantile_sketch_table(all rows so far))``
    with the same ``k`` — byte-identical, not approximately (pinned in
    tests): the sketch definition is order-free, so batch and stream
    are two folds of the same function. (Contract violations diverge
    deterministically — see the module docstring.)
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    for p in probabilities:
        if not 0 < p <= 1:
            raise ValueError(f"probabilities must be in (0, 1], got {p}")
    numeric_key = isinstance(df.schema[key_col].dataType, NumericType)
    out_schema = (
        "group string, "
        + ", ".join(f"p_{int(p * 100)} double" for p in probabilities)
        + ", m int, ver long"
    )
    keyed = df.where(
        F.col(value_col).isNotNull() & F.col(key_col).isNotNull()
    ).select(
        F.col(group_col).cast("string").alias("_g"),
        F.col(key_col).cast("string").alias("_k"),
        F.col(value_col).cast("double").alias("_v"),
    )
    return keyed.groupBy("_g").applyInPandasWithState(
        _make_qs_fn(int(k), tuple(probabilities), numeric_key),
        outputStructType=out_schema,
        stateStructType=_STATE,
        outputMode="update",
        timeoutConf="NoTimeout",
    )
