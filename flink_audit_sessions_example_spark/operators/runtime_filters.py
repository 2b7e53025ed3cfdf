"""Bloom-filter join pruning — a hand-rollable twin of Spark's runtime
row-level filtering (InjectRuntimeFilter), for when the dimension side is
too large to broadcast EXACTLY but its Bloom sketch is not.

Pattern: aggregate the dim join keys into a fixed-size bit array (the
sketch), ship the sketch to every fact-side task as a literal, and drop
fact rows whose key cannot possibly match BEFORE the join's shuffle. The
final exact join still runs, so false positives only cost shuffle bytes —
correctness is unconditional (Bloom filters have no false negatives).

Why the driver-side collect is legitimate at 100 TB: the sketch is
CONSTANT-SIZE (``num_bits`` / 8 bytes — 16 KiB at the default),
independent of dim cardinality; the build aggregation shuffles at most
``num_bits / 64`` rows no matter how many dim rows feed it. Collecting
it is the same move Spark's own InjectRuntimeFilter makes when it
evaluates the ``bloom_filter_agg`` scalar subquery on the driver and
rebroadcasts it into ``might_contain``. What we add over the built-in:
an explicit, tunable, engine-version-independent operator (the built-in
only fires under creation-side heuristics and join shapes it
recognizes), composable with the salted join in ``operators/skew.py``.

Sizing: false-positive rate ~ (1 - e^(-k*n/m))^k for n distinct dim
keys, m bits, k hashes. The 2^17-bit default holds ~10k keys at <1% fpp
with k=5; every true positive survives by construction.

Probe cost: k ``xxhash64`` calls + k array probes per fact row, all
built-in expressions inside whole-stage codegen (no Python, no UDF); the
packed-words literal lives once in the generated code's constant pool.
The probe is emitted as a SQL fragment because only SQL ``shiftleft``
accepts a column shift amount (the Python ``F.shiftleft`` wrapper
requires a literal count).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_WORDS_COL = "_bloom_words"


def build_bloom(
    dim: DataFrame,
    key_col: str,
    *,
    num_bits: int = 1 << 17,
    num_hashes: int = 5,
) -> list[int]:
    """Aggregate ``dim[key_col]`` into a Bloom bit array, returned as a
    dense list of ``num_bits // 64`` signed 64-bit words.

    Build plan: per row, an array of the k bit positions
    (``pmod(xxhash64(key, seed), m)``), exploded and grouped by word
    index with ``bit_or`` of the in-word bit — a scan-side combinable
    aggregate whose shuffle and collect are bounded by m/64 rows
    regardless of dim cardinality.
    """
    if num_bits % 64 or num_bits <= 0:
        raise ValueError("num_bits must be a positive multiple of 64")
    if num_hashes < 1:
        raise ValueError("num_hashes must be >= 1")
    positions = F.array(
        *[
            F.pmod(F.xxhash64(F.col(key_col), F.lit(s)), F.lit(num_bits))
            for s in range(num_hashes)
        ]
    )
    rows = (
        dim.where(F.col(key_col).isNotNull())
        .select(F.explode(positions).alias("p"))
        .select(
            F.shiftright("p", 6).alias("word_idx"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(p & 63 AS INT))"
            ).alias("bit"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("bit").alias("word"))
        .collect()
    )
    words = [0] * (num_bits // 64)
    for r in rows:
        words[r.word_idx] = r.word
    return words


def _probe_sql(key_col: str, seed: int, num_bits: int) -> str:
    """One hash function's membership test, as a SQL boolean fragment
    over the packed-words array column ``_bloom_words``."""
    p = f"pmod(xxhash64(`{key_col}`, {seed}), CAST({num_bits} AS BIGINT))"
    word = f"element_at({_WORDS_COL}, CAST(shiftright({p}, 6) AS INT) + 1)"
    bit = f"shiftleft(CAST(1 AS BIGINT), CAST(({p} & 63) AS INT))"
    return f"(({word} & {bit}) <> 0)"


def bloom_filter_rows(
    df: DataFrame,
    key_col: str,
    words: list[int],
    *,
    num_bits: int,
    num_hashes: int,
) -> DataFrame:
    """Keep only rows whose ``key_col`` MIGHT be in the sketch (no false
    negatives: every key the sketch was built over passes). NULL keys are
    dropped — a NULL never equi-joins."""
    if len(words) != num_bits // 64:
        raise ValueError(
            f"words length {len(words)} != num_bits/64 = {num_bits // 64}"
        )
    pred = " AND ".join(
        _probe_sql(key_col, s, num_bits) for s in range(num_hashes)
    )
    return (
        df.withColumn(_WORDS_COL, F.lit(words))
        .where(F.col(key_col).isNotNull() & F.expr(pred))
        .drop(_WORDS_COL)
    )


def bloom_pruned_join(
    fact: DataFrame,
    dim: DataFrame,
    *,
    fact_key: str,
    dim_key: str,
    num_bits: int = 1 << 17,
    num_hashes: int = 5,
) -> DataFrame:
    """Inner equi-join ``fact`` with ``dim``, Bloom-pruning the fact side
    before the join's shuffle. The result is EXACTLY the plain inner
    join — the sketch only removes rows that cannot match; false
    positives are caught by the real join.

    Column layout mirrors ``fact.join(dim, fact[fact_key] ==
    dim[dim_key])``: all fact columns, then all dim columns.
    """
    words = build_bloom(dim, dim_key, num_bits=num_bits, num_hashes=num_hashes)
    pruned = bloom_filter_rows(
        fact, fact_key, words, num_bits=num_bits, num_hashes=num_hashes
    )
    return pruned.join(dim, pruned[fact_key] == dim[dim_key], "inner")
