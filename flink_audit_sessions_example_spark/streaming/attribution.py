"""Streaming first-touch attribution — ``applyInPandasWithState``.

The batch twin is ``plans/extended.py::q_win_first_touch`` (one hash
aggregation: ``min(struct(ts, event_id, event_type))`` + conditional
purchase rollups). This module keeps the SAME semantics incrementally:
per-user state is one fixed-width record — the current first touch and
the exact purchase accumulators — updated per micro-batch and emitted in
update mode whenever the user receives events.

Semantics worth stating:

- **Retroactive first touch.** The aggregate is a true min, so a late
  out-of-order event that precedes the recorded first touch REPLACES it
  (and the next update row reflects the new attribution) — the same
  answer the batch query gives over the union of all batches. There is
  deliberately no watermark: attribution is a lifetime aggregate, and
  dropping late events would silently change it.
- **Microsecond precision.** State keeps the first touch in epoch
  MICROS (Spark's timestamp resolution) — a millisecond truncation
  would mis-order events within the same millisecond and emit a
  truncated ``first_ts``.
- **Exact money.** ``purchase_value`` accumulates as integer micros
  with per-event ``Decimal(repr(v))`` HALF_UP rounding — the same
  shortest-decimal-string semantics as Spark's
  ``CAST(double AS DECIMAL(18,6))`` (Java ``BigDecimal.valueOf``), so
  the sum matches the batch twin at any accumulation order. A user
  whose purchases all carry NULL values yields NULL ``purchase_value``
  (the batch SUM-of-all-NULL), not 0.
- **NULL rows.** Purchases count regardless of ts/event_id nullness
  (the batch rollup does not inspect them); only first-touch CANDIDACY
  requires non-null (ts, event_id) — a null-ts event cannot be "the
  earliest touch" in any useful sense, and the events source contract
  (``sources/tables.py``) ships them non-null. A NULL first-touch
  event_type stays NULL (never the string ``'None'``).
- **State size.** O(users), each a fixed-width record — the state store
  analogue of the batch aggregation's buffer. No timeout: state lives as
  long as the query (a lifetime metric has no eviction point).

At scale this costs what the batch agg costs: one shuffle on user_id and
constant state per user.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

FIRST_TOUCH_OUTPUT = (
    "user_id bigint, first_ts timestamp, first_event_id bigint, "
    "first_event_type string, n_purchases bigint, purchase_value double"
)
FIRST_TOUCH_STATE = (
    "first_ts_us bigint, first_event_id bigint, first_event_type string, "
    "n_purchases bigint, value_micros bigint, n_valued bigint"
)


def _decimal_micros(v: float) -> int:
    """HALF_UP micros of a double, via its shortest decimal repr — the
    exact semantics of Spark's CAST(double AS DECIMAL(18,6))
    (BigDecimal.valueOf → Double.toString → setScale HALF_UP)."""
    from decimal import ROUND_HALF_UP, Decimal

    return int(
        (Decimal(repr(float(v))) * 1_000_000).quantize(
            Decimal(1), rounding=ROUND_HALF_UP
        )
    )


def _first_touch_fn(key, pdfs, state):
    import numpy as np
    import pandas as pd

    if state.exists:
        ft_us, ft_id, ft_type, n_p, micros, n_valued = state.get
    else:
        ft_us, ft_id, ft_type, n_p, micros, n_valued = (
            None,
            None,
            None,
            0,
            0,
            0,
        )

    for pdf in pdfs:
        # purchase rollups over ALL rows (the batch rollup never
        # inspects ts/event_id)
        purch = pdf[pdf["event_type"] == "purchase"]
        n_p += int(len(purch))
        for v in purch["value"]:
            if not pd.isna(v):
                micros += _decimal_micros(v)
                n_valued += 1
        # first-touch candidacy needs a real (ts, event_id)
        cand_rows = pdf.dropna(subset=["ts", "event_id"])
        if cand_rows.empty:
            continue
        # normalize to ns BEFORE the integer reinterpret: pandas 2.x can
        # hand this column over as datetime64[us] (non-ns Arrow dtypes),
        # where a bare astype(int64)//1000 would yield milli-of-micro
        # values 1000× off and corrupt the first-touch ordering
        ts_us = (
            cand_rows["ts"].astype("datetime64[ns]").astype("int64") // 1_000
        )
        order = np.lexsort(
            (cand_rows["event_id"].to_numpy(), ts_us.to_numpy())
        )
        i = order[0]
        cand = (int(ts_us.iloc[i]), int(cand_rows["event_id"].iloc[i]))
        if ft_us is None or cand < (ft_us, ft_id):
            ft_us, ft_id = cand
            et = cand_rows["event_type"].iloc[i]
            ft_type = None if pd.isna(et) else str(et)

    state.update((ft_us, ft_id, ft_type, n_p, micros, n_valued))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "first_ts": pd.to_datetime([ft_us], unit="us"),
            "first_event_id": [ft_id],
            "first_event_type": [ft_type],
            "n_purchases": [n_p],
            "purchase_value": [micros / 1e6 if n_valued else None],
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
