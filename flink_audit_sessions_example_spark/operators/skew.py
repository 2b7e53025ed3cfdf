"""Skew-mitigation operators.

Where skew does and doesn't hurt in this engine, and what to do:

- **Algebraic aggregations** (sum/count/min/max — the reference's entire
  aggregate surface, ``AggregateDeniedCounts.java``) are already
  skew-proof: Catalyst's map-side partial aggregation sends at most one
  row per (key, map task) into the shuffle, so a hot key's reducer input
  is bounded by the task count, not the data volume. No salting needed —
  don't add it.
- **Sort-merge joins** get runtime skew-splitting from AQE
  (``spark.sql.adaptive.skewJoin``). That covers the big-big joins here
  (e.g. lineitem ⨝ orders).
- The residual case is a **skewed shuffle join that AQE can't split**
  (broadcast-ineligible small side + pathological key, or a non-SMJ plan):
  :func:`salted_join` is the classic manual fix — spread the big side's
  hot keys over ``salt_buckets`` sub-keys and replicate the small side
  once per bucket, turning one monster partition into ``salt_buckets``
  even ones at the cost of a ``salt_buckets``× small-side replication.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    *,
    key_col: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⨝ small`` on ``key_col`` with salted keys.

    The big side gets a per-row salt (uniform, independent of the key —
    re-execution nondeterminism is safe because any salt assignment yields
    the same join result); the small side is replicated across all
    ``salt_buckets`` salts; the join key becomes (key, salt) so a hot
    key's rows land on ``salt_buckets`` different reducers.

    Result is row-identical to ``big.join(small, key_col, how)`` for
    ``inner`` and ``left`` joins (the replicated side must be the
    lookup side).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salted_big = big.withColumn(
        "_salt",
        F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt_buckets)),
    )
    replicated_small = small.withColumn(
        "_salt",
        F.explode(F.array(*[F.lit(i).cast("bigint") for i in range(salt_buckets)])),
    )
    return salted_big.join(
        replicated_small, [key_col, "_salt"], how
    ).drop("_salt")
