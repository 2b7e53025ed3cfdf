"""Sketch aggregations — the 100 TB path for distinct counts and
percentiles.

The exact operators these approximate (``dedup_count``'s
``count_distinct``, ``rel_quantiles``' sort-based ``percentile``) shuffle
or sort data proportional to the key cardinality; at 100 TB the sketch
variants are the only sane default: HyperLogLog++ (``approx_count_distinct``)
keeps a fixed ~KB register set per group and merges map-side, and the
t-digest-style ``approx_percentile`` streams in one pass with bounded
state. Both are JVM aggregates inside whole-stage codegen — the plan
shape (partial → merge → final) is identical to any other hash agg, so
every scale property of the exact plans carries over with O(1) state.

These are NOT in the DuckDB-oracle registry: HLL/t-digest register
layouts are engine-specific, so cross-engine value-hashing is impossible
by construction. The correctness gate is the documented ERROR BOUND,
pinned by pytest against the exact twins (`tests/test_sketches.py`) —
the same contract a production pipeline relies on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def approx_distinct_by(
    df: DataFrame,
    key_cols: list[str],
    distinct_col: str,
    *,
    rsd: float = 0.05,
) -> DataFrame:
    """Approximate distinct-count per group (HyperLogLog++).

    ``rsd`` is the target relative standard deviation (Spark default
    0.05 → ~1.6 KB of registers per group). Output columns:
    ``key_cols…, approx_distinct``.
    """
    return df.groupBy(*key_cols).agg(
        F.approx_count_distinct(distinct_col, rsd).alias("approx_distinct")
    )


def exact_distinct_by(
    df: DataFrame, key_cols: list[str], distinct_col: str
) -> DataFrame:
    """Exact twin of :func:`approx_distinct_by` (the verification side of
    the error-bound test; at scale it shuffles every distinct value)."""
    return df.groupBy(*key_cols).agg(
        F.count_distinct(distinct_col).alias("exact_distinct")
    )


def approx_quantiles_by(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    *,
    probabilities: tuple[float, ...] = (0.25, 0.5, 0.75),
    accuracy: int = 10_000,
) -> DataFrame:
    """Approximate grouped percentiles in ONE streaming pass
    (``approx_percentile``; rank error ≤ 1/accuracy).

    The exact twin is ``rel_quantiles``' sort-based ``percentile`` —
    right for small groups, wrong for a 100 TB global percentile where
    the sketch is the only single-pass option. Output: one
    ``p_<percent>`` column per requested probability.
    """
    probs = ", ".join(f"{p}D" for p in probabilities)
    # backtick-quote the identifier (escaping embedded backticks) so names
    # with spaces/dots/hyphens/keywords resolve like every Column-based API
    quoted = value_col.replace("`", "``")
    agg = F.expr(
        f"approx_percentile(`{quoted}`, array({probs}), {accuracy})"
    ).alias("_q")
    out = df.groupBy(*key_cols).agg(agg)
    return out.select(
        *key_cols,
        *[
            F.element_at("_q", i + 1).alias(f"p_{int(p * 100)}")
            for i, p in enumerate(probabilities)
        ],
    )


def heavy_hitters(
    df: DataFrame,
    key_col: str,
    *,
    k: int = 20,
    capacity: int = 256,
) -> DataFrame:
    """``agg_heavy_hitters`` — approximate top-k most frequent values
    (batched Misra-Gries summaries) with a DETERMINISTIC error bound.

    The exact formulation (``groupBy(key).count()`` then top-k) shuffles
    one row per distinct key; at 100 TB over an unbounded key domain
    (words, URLs, user agents) that is the whole corpus. Misra-Gries
    keeps ≤ ``capacity`` counters per task and is a MERGEABLE summary
    (Agarwal et al., PODS'12): per-partition summaries sum key-wise and
    the bounds ADD, so the plan is one narrow Arrow pass emitting
    ≤ ``capacity`` rows per task + a summary-sized aggregation — the
    shuffle carries tasks × capacity rows, independent of both the row
    count and the key cardinality.

    Guarantees (the contract the tests pin, with W = retained summary
    weight, N = non-null input rows, both computed in the same pass):

    - ``est ≤ true ≤ est + err_bound`` for every reported key, with
      ``err_bound = floor((N − W) / (capacity + 1))``. Each batched
      compression subtracts the (capacity+1)-th largest counter value v
      from every counter, discarding ≥ (capacity+1)·v total weight while
      any single key loses ≤ v — so a key's cumulative deficit is at
      most the partition's discarded weight / (capacity+1), and deficits
      sum across partitions into the global bound.
    - every key with true count > err_bound survives into the merged
      summary (a key absent from a partition's summary has lost its
      whole local count to deficits). The top-``k`` cut can still drop
      it: the MERGED summary holds up to tasks × capacity keys, so the
      membership guarantee transfers to the output only when ``k`` is at
      least that (pass a large ``k`` to keep the full summary; the
      summary is tiny either way).

    Plan: scan → ``mapInPandas`` (pandas ``value_counts`` per batch +
    vectorized compression; one meta row per task carries N_p) →
    lazy-``localCheckpoint`` pin (the totals row and the per-key sum are
    two consumers feeding different exchanges — unpinned, the full scan
    runs twice) → tiny hash agg + broadcast of the 1-row totals.

    Output: ``(key, est, err_bound)``, top-k by ``est`` (desc, key
    tiebreak), key cast to string, NULL keys ignored.
    """
    import pandas as pd

    cap = int(capacity)
    if cap < 1:
        raise ValueError(f"capacity must be >= 1, got {capacity}")
    if k < 1:
        # limit(0) would silently return an empty "top keys" answer
        # indistinguishable from an empty input; negative k dies as an
        # opaque AnalysisException at action time
        raise ValueError(f"k must be >= 1, got {k}")

    def gen(batches):
        counters: pd.Series | None = None
        n = 0
        for pdf in batches:
            vc = pdf["_k"].value_counts()  # drops NULL keys
            n += int(vc.sum())
            counters = (
                vc if counters is None else counters.add(vc, fill_value=0)
            )
            if len(counters) > cap:
                v = counters.nlargest(cap + 1).iloc[-1]
                c = counters - v
                counters = c[c > 0]
        keys = [] if counters is None else list(counters.index)
        ws = [] if counters is None else [int(x) for x in counters.values]
        yield pd.DataFrame(
            {
                "key": keys + [None],
                "w": ws + [0],
                "n": [0] * len(keys) + [n],
            }
        )

    summ = df.select(F.col(key_col).cast("string").alias("_k")).mapInPandas(
        gen, "key string, w long, n long"
    )
    summ = summ.localCheckpoint(eager=False)
    totals = summ.agg(F.sum("n").alias("_N"), F.sum("w").alias("_W"))
    est = (
        summ.where(F.col("key").isNotNull())
        .groupBy("key")
        .agg(F.sum("w").alias("est"))
    )
    topk = est.orderBy(F.desc("est"), "key").limit(k)
    return topk.crossJoin(F.broadcast(totals)).select(
        "key",
        "est",
        F.floor((F.col("_N") - F.col("_W")) / F.lit(cap + 1))
        .cast("bigint")
        .alias("err_bound"),
    )


def count_min_table(
    df: DataFrame,
    value_col: str,
    *,
    width: int = 2048,
    depth: int = 5,
    seed: int = 42,
    weight_col: "str | None" = None,
) -> DataFrame:
    """Build a Count-Min sketch as a DataFrame — ``(d, bucket, cnt)``,
    depth × width rows. Point-frequency estimation for ANY value (the
    complement of Misra-Gries :func:`heavy_hitters`, which only tracks a
    top set): est(x) = min over rows d of cnt[d, hash_d(x) mod width],
    with the classic guarantee est ≥ true always and
    est ≤ true + (e/width)·N with probability ≥ 1 − exp(−depth) per
    query (Cormode & Muthukrishnan 2005), N = total weight.

    Why a DataFrame and not Spark's builtin ``count_min_sketch``
    aggregate: the builtin emits an opaque binary whose queries must
    happen JVM-side per-call; this table IS the sketch — O(d·w) rows,
    broadcastable, mergeable by plain ``groupBy(d, bucket).sum(cnt)``
    (the sketch is a counter matrix, merge = elementwise add), and
    queryable as a join (:func:`cms_estimate`). The build is ONE
    aggregation: each row explodes to its depth buckets scan-side, the
    partial agg collapses to ≤ d·w rows per task, and the shuffle
    carries O(d·w·tasks) regardless of input size — the same
    summary-bound shape as `heavy_hitters`.

    NULL values are skipped (not a frequency class); ``weight_col``
    accumulates a weight instead of 1 per row (NULL weight = 0).
    """
    if width < 2 or depth < 1:
        raise ValueError(f"need width >= 2, depth >= 1; got {width}, {depth}")
    buckets = F.array(
        *[
            F.pmod(
                F.xxhash64(F.col(value_col), F.lit(int(seed) + i)),
                F.lit(width),
            )
            for i in range(depth)
        ]
    )
    w = (
        F.coalesce(F.col(weight_col).cast("bigint"), F.lit(0))
        if weight_col
        else F.lit(1)
    )
    return (
        df.where(F.col(value_col).isNotNull())
        .select(w.alias("_w"), F.posexplode(buckets).alias("d", "bucket"))
        .groupBy("d", "bucket")
        .agg(F.sum("_w").alias("cnt"))
    )


def cms_estimate(
    cms: DataFrame,
    queries: DataFrame,
    value_col: str,
    *,
    width: int,
    depth: int,
    seed: int = 42,
    out_col: str = "est",
) -> DataFrame:
    """Point-frequency estimates for every row of ``queries`` against a
    :func:`count_min_table` sketch (same width/depth/seed — caller
    contract, not encoded in the table). Returns ``queries``' columns +
    ``out_col``. Never-seen values estimate 0 or the collision mass of
    their buckets — still ≥ true (=0) per the CMS guarantee.

    Plan: queries explode to their depth probes scan-side, the sketch
    side is O(d·w) rows and broadcasts, the min-over-depths is a
    re-aggregation keyed on the query row — no shuffle ever carries the
    sketch or more than depth rows per query.
    """
    probes = queries.select(
        F.struct(*[F.col(c) for c in queries.columns]).alias("_q"),
        F.posexplode(
            F.array(
                *[
                    F.pmod(
                        F.xxhash64(F.col(value_col), F.lit(int(seed) + i)),
                        F.lit(width),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("d", "bucket"),
    )
    joined = probes.join(F.broadcast(cms), ["d", "bucket"], "left").select(
        "_q", F.coalesce(F.col("cnt"), F.lit(0)).alias("_cnt")
    )
    return (
        joined.groupBy("_q")
        .agg(F.min("_cnt").alias(out_col))
        .select("_q.*", out_col)
    )
