"""Continuous time-decay aggregates — the streaming twin of
``operators/timeseries.py::time_decay_stats``, with O(1) state per key.

What makes a CONSTANT-state exponential-decay stream possible at all is
the batch operator's calendar-bucket weight definition: weights are
``2^-(anchor_bucket − event_bucket)`` with fixed-epoch buckets, so when
a new event advances the key's anchor by ``k`` buckets, every
already-accumulated weight — and therefore each running SUM — rescales
by the single factor ``2^(-k)``. That rescale is an IEEE exponent
shift: EXACT while the result stays normal; entering the SUBNORMAL
range (sums below ~2^-1022 — a key silent for ≳1000 half-lives) it
rounds ONCE on the accumulated sum where the batch twin rounds each
term, so the two can part in that regime's last bits — invisible at
the 6 dp emission rounding and stated plainly here, not hidden. State
per key is four scalars (anchor bucket, valued-event count,
weighted-value sum, weight sum) plus the max event time — independent
of throughput and lifetime.

Equality contract (the ``stream_funnel_stages`` precedent): under
per-key EVENT-TIME-ORDERED arrival (ties broken consistently with the
batch twin's ``tiebreak_cols``), the stream's final sums are
BIT-IDENTICAL to the batch fold outside the deep-subnormal regime —
each term product ``v·2^(-k)`` is exact in both formulations, each
normal-range rescale is exact, so both sides execute the same sequence
of IEEE additions on the same operands (pinned in tests on the real
events table). Out-of-order arrival still produces exact weights for
every event (the anchor only ever moves forward; a late event just
enters with a larger step count), but the ADDITION order then differs
from the batch sort order, so equality weakens to
summation-order-equivalence.

Row-exclusion contract: identical to the batch twin BY CONSTRUCTION —
both sides drop rows with NULL value, NaN value, or NULL timestamp
(the batch operator filters them engine-side; a NULL/NaN term would
poison its fold where this fold could silently skip, so the contract
is pinned in ONE place and ``n_events`` counts the same rows on both
sides).

Epoch handling: the bucket index is computed ENGINE-SIDE
(``unix_micros`` before the Python boundary), never from pandas
timestamps — Arrow localizes timestamps to the session timezone, so a
pandas-side epoch would shift every bucket boundary by the zone offset
under any non-UTC session while the batch twin's ``cast(long)`` stayed
timezone-invariant.

At-least-once caveat, stated plainly: the fold is NOT idempotent under
re-delivery (a re-delivered value adds its mass twice — unlike the
bottom-k sketch's keyed state there is no per-event key to collapse
on). Exactly-once sinks, or an upstream dedup keyed on event id, are
the deployment contract — and when the input CARRIES an event id,
``dedup_id_col`` wires that upstream dedup in here
(``dropDuplicatesWithinWatermark`` pre-stage, state bounded by the
``dedup_watermark`` horizon) so the at-least-once deployment stops
silently drifting (review r11).

Emission (update mode): each touched key re-emits its CURRENT stats —
``(key, n_events, last_ts, decayed_sum, decayed_weight, ver)`` with
``ver`` the monotonically increasing valued-event count; consumers
keep the max-``ver`` row per key (latest-wins). The key column keeps
the INPUT's native type (a silent string coercion would break joins
back to the source or the batch twin's output).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_STATE = (
    "anchor_bucket long, n long, wv double, w double, last_ts_us long"
)


def _make_decay_fn(bucket_s: int):
    def fn(key, pdfs, state):
        import math
        from decimal import ROUND_HALF_UP, Decimal

        import pandas as pd

        def _round6(x: float) -> float:
            # Spark's round(double, 6) goes through BigDecimal.valueOf,
            # i.e. the SHORTEST decimal repr, then HALF_UP — so
            # Decimal(repr(x)), NOT Decimal(x) (the exact binary
            # expansion rounds 5e-07 to 0.0 where Spark yields 1e-06);
            # Python's builtin round is half-even and wrong twice over.
            # Same pattern as streaming/attribution.py.
            return float(
                Decimal(repr(x)).quantize(
                    Decimal("0.000001"), rounding=ROUND_HALF_UP
                )
            )

        if state.exists:
            anchor_bucket, n, wv, w, last_us = state.get
            anchor_bucket, n, last_us = (
                int(anchor_bucket), int(n), int(last_us)
            )
            wv, w = float(wv), float(w)
        else:
            anchor_bucket, n, wv, w, last_us = None, 0, 0.0, 0.0, None

        touched = False
        for pdf in pdfs:
            for us, v in zip(pdf["_us"], pdf["_v"]):
                # engine-side filter already dropped NULL/NaN values
                # and NULL timestamps (the batch twin's contract);
                # this is belt-and-braces for direct state-fn drives
                if v is None or (isinstance(v, float) and math.isnan(v)):
                    continue
                if us is None or pd.isna(us):
                    continue
                touched = True
                n += 1
                us = int(us)
                # floor division of the (possibly negative) epoch —
                # identical to Spark's FLOOR(epoch / bucket_s)
                b = (us // 1_000_000) // bucket_s
                if anchor_bucket is None:
                    anchor_bucket = b
                if b > anchor_bucket:
                    # anchor advances k buckets: rescale both sums by
                    # 2^-k — an exact exponent shift (see module doc)
                    shift = anchor_bucket - b
                    wv = math.ldexp(wv, shift)
                    w = math.ldexp(w, shift)
                    anchor_bucket = b
                term_w = math.ldexp(1.0, b - anchor_bucket)
                wv = wv + float(v) * term_w
                w = w + term_w
                last_us = us if last_us is None else max(last_us, us)
        if not touched:
            return
        state.update((anchor_bucket, n, wv, w, last_us))
        yield pd.DataFrame(
            {
                "key": [key[0]],
                "n_events": [n],
                "last_ts_us": [last_us],
                "decayed_sum": [_round6(wv)],
                "decayed_weight": [_round6(w)],
                "ver": [n],
            }
        )

    return fn


def stream_time_decay(
    df: DataFrame,
    *,
    key_col: str,
    ts_col: str,
    value_col: str,
    half_life_hours: int = 24,
    dedup_id_col: "str | None" = None,
    dedup_watermark: str = "1 hour",
) -> DataFrame:
    """Continuously-maintained per-key time-decay stats (update mode;
    see the module docstring for the O(1)-state / bit-equality /
    row-exclusion / re-delivery contracts). Output: ``(key, n_events,
    last_ts, decayed_sum, decayed_weight, ver)`` — the batch twin's
    columns (``key`` keeps the input's native type) plus the
    latest-wins version counter.

    ``dedup_id_col`` blunts the at-least-once caveat: the fold itself
    has no per-event key to collapse re-deliveries on, so when the
    input carries a unique event id, pass it and a
    ``dropDuplicatesWithinWatermark([dedup_id_col])`` pre-stage (state
    bounded by the ``dedup_watermark`` horizon) absorbs source
    re-deliveries BEFORE they double-add mass. Scope, stated plainly:
    this protects against upstream/source redelivery within the
    watermark, not against replays of an already-committed micro-batch
    after a checkpoint restart into a non-idempotent sink — the
    exactly-once half of the contract still belongs to the sink. With
    ``dedup_id_col=None`` (default) behavior is unchanged.

    NOTE on rounding: the stream rounds to 6 dp at each EMISSION (the
    state itself carries full doubles, so later emissions are never
    contaminated by earlier rounding) — the same boundary where the
    batch twin rounds its final output, via the same
    shortest-repr-HALF_UP semantics as Spark's ``round``.
    """
    if half_life_hours < 1:
        raise ValueError(
            f"half_life_hours must be >= 1, got {half_life_hours}"
        )
    if dedup_id_col is not None:
        # watermark on the event-time column bounds the dedup state;
        # duplicates arriving beyond the horizon are the documented
        # residual (same horizon trade as stream_minhash_candidates'
        # TTL). The id column alone is the dedup key — a redelivered
        # event reappears with the SAME id by definition.
        df = df.withWatermark(
            ts_col, dedup_watermark
        ).dropDuplicatesWithinWatermark([dedup_id_col])
    key_type = df.schema[key_col].dataType.simpleString()
    val = F.col(value_col).cast("double")
    ts = F.col(ts_col).cast("timestamp")
    keyed = df.where(
        val.isNotNull() & ~F.isnan(val) & ts.isNotNull()
    ).select(
        F.col(key_col).alias("_k"),
        F.unix_micros(ts).alias("_us"),
        val.alias("_v"),
    )
    out = keyed.groupBy("_k").applyInPandasWithState(
        _make_decay_fn(3600 * int(half_life_hours)),
        outputStructType=(
            f"key {key_type}, n_events long, last_ts_us long, "
            "decayed_sum double, decayed_weight double, ver long"
        ),
        stateStructType=_STATE,
        outputMode="update",
        timeoutConf="NoTimeout",
    )
    return out.select(
        "key",
        "n_events",
        F.timestamp_micros(F.col("last_ts_us")).alias("last_ts"),
        "decayed_sum",
        "decayed_weight",
        "ver",
    )
