"""Streaming first-touch attribution — ``applyInPandasWithState``.

The batch twin is ``plans/extended.py::q_win_first_touch`` (one hash
aggregation: ``min(struct(ts, event_id, event_type))`` + conditional
purchase rollups). This module keeps the SAME semantics incrementally:
per-user state is one fixed-width record — the current first touch and
the exact purchase accumulators — updated per micro-batch and emitted in
update mode whenever it changes.

Semantics worth stating:

- **Retroactive first touch.** The aggregate is a true min, so a late
  out-of-order event that precedes the recorded first touch REPLACES it
  (and the next update row reflects the new attribution) — the same
  answer the batch query gives over the union of all batches. There is
  deliberately no watermark: attribution is a lifetime aggregate, and
  dropping late events would silently change it.
- **Exact money.** ``purchase_value`` accumulates as integer micros with
  HALF_UP rounding per event — bit-identical to the batch query's
  ``CAST(value AS DECIMAL(18,6))`` sum at any accumulation order.
- **State size.** O(users), each a fixed-width record — the state store
  analogue of the batch aggregation's buffer. No timeout: state lives as
  long as the query (a lifetime metric has no eviction point).

At scale this costs what the batch agg costs: one shuffle on user_id and
constant state per user.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FIRST_TOUCH_OUTPUT = (
    "user_id bigint, first_ts timestamp, first_event_id bigint, "
    "first_event_type string, n_purchases bigint, purchase_value double"
)
FIRST_TOUCH_STATE = (
    "first_ts_ms bigint, first_event_id bigint, first_event_type string, "
    "n_purchases bigint, value_micros bigint"
)


def _first_touch_fn(key, pdfs, state):
    import numpy as np
    import pandas as pd

    if state.exists:
        ft_ms, ft_id, ft_type, n_p, micros = state.get
    else:
        ft_ms, ft_id, ft_type, n_p, micros = None, None, None, 0, 0

    for pdf in pdfs:
        pdf = pdf.dropna(subset=["ts", "event_id"])
        if pdf.empty:
            continue
        ts_ms = pdf["ts"].astype("int64") // 1_000_000
        # batch min(struct(ts, event_id, event_type)) — event_id breaks ties
        order = np.lexsort((pdf["event_id"].to_numpy(), ts_ms.to_numpy()))
        i = order[0]
        cand = (int(ts_ms.iloc[i]), int(pdf["event_id"].iloc[i]))
        if ft_ms is None or cand < (ft_ms, ft_id):
            ft_ms, ft_id = cand
            ft_type = str(pdf["event_type"].iloc[i])
        purch = pdf[pdf["event_type"] == "purchase"]
        n_p += int(len(purch))
        if len(purch):
            v = purch["value"].fillna(0.0).to_numpy()
            # HALF_UP at 6 decimals — the DECIMAL(18,6) cast both engines
            # apply in the batch twin (np.round would be half-to-even)
            micros += int(
                (np.floor(np.abs(v) * 1e6 + 0.5) * np.sign(v)).sum()
            )

    state.update((ft_ms, ft_id, ft_type, n_p, micros))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "first_ts": pd.to_datetime([ft_ms], unit="ms"),
            "first_event_id": [ft_id],
            "first_event_type": [ft_type],
            "n_purchases": [n_p],
            "purchase_value": [micros / 1e6 if n_p else None],
        }
    )


def stream_first_touch(events: DataFrame) -> DataFrame:
    """Streaming-only stateful twin of ``win_first_touch`` (same output
    schema; update mode — the latest row per user is the answer)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _first_touch_fn,
        outputStructType=FIRST_TOUCH_OUTPUT,
        stateStructType=FIRST_TOUCH_STATE,
        outputMode="update",
        timeoutConf="NoTimeout",
    )
