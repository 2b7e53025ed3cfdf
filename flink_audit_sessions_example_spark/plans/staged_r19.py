"""Staged registrations for the r19 window — five new capability
families queued behind the r18 batch, per the staging protocol that
drained green in r10–r12: ``tests/test_staged_r19.py`` replays every
(query, oracle) pair with hash parity + non-vacuity on every suite
run, so the queue cannot rot while it waits.

Families: the quantile-sketch MERGE invariant (merged per-group
sketches hash-check row-for-row against a direct build over the union
— the mergeability claim every rollup architecture rests on, proven
cross-engine), the TPC-H Q17 small-quantity revenue shape in exact
cent arithmetic, soft deduplication (per-document sampling weights
1/|cluster| — the keep-all-downweight-duplicates policy pretraining
mixtures actually use), integer-exact per-bucket z-score anomalies,
and co-purchase graph degree statistics (the structural profile read
before running ``graph_pagerank``).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators import dedup as D
from ..operators import sketches as K
from ..sources.tables import load_table
from .extended import MAX_SHINGLE_DF, _DEDUP_NGRAM_ORACLE, _cents

# --------------------------------------------------------------------------
# agg_quantile_merge — the sketch mergeability invariant, cross-engine
# --------------------------------------------------------------------------

QMERGE_K = 128

_SQL_EVENT_DRAW = (
    "CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8)) AS BIGINT)"
)


def q_agg_quantile_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``agg_quantile_merge`` — per-event-type quantile sketches
    re-aggregated into ONE global sketch
    (:func:`~..operators.sketches.quantile_sketch_merge`), registered
    through the mergeability invariant: because draws are
    content-derived (md5 of the row key), ``bottomk(∪ groups) =
    bottomk(∪ bottomk(group))`` EXACTLY, so the merged sketch's rows
    hash-check against a DuckDB bottom-k built DIRECTLY over the raw
    relation — two different constructions (hierarchical merge vs flat
    build), one relation, row for row. This is the daily-partials →
    monthly-rollup path every sketch architecture runs; the registered
    check is what makes it safe. Shape: per-group WindowGroupLimit
    (≤ k rows/group forwarded per task) then one ≤ k·groups-row
    group-limit — raw data touched once."""
    ev = load_table(spark, sf_dir, "events", spread=False)
    per_type = K.quantile_sketch_table(
        ev,
        "value",
        key_col="event_id",
        group_cols=["event_type"],
        k=QMERGE_K,
    )
    merged = K.quantile_sketch_merge(per_type, k=QMERGE_K)
    return merged.select("qs_key", F.round("qs_value", 6).alias("qs_value"))


_AGG_QUANTILE_MERGE_ORACLE = f"""
SELECT event_id AS qs_key, ROUND(value, 6) AS qs_value
FROM (
  SELECT event_id, value,
         ROW_NUMBER() OVER (
           ORDER BY {_SQL_EVENT_DRAW}, event_id, value
         ) AS rn
  FROM events
  WHERE value IS NOT NULL AND NOT isnan(value) AND event_id IS NOT NULL
) WHERE rn <= {QMERGE_K}
"""

# --------------------------------------------------------------------------
# rel_small_quantity — the TPC-H Q17 shape, exact cent arithmetic
# --------------------------------------------------------------------------

#: Q17's 0.2·avg threshold as exact integers: qty < avg/5 ⟺
#: 5·n·cents(qty) < Σ cents(qty) — no float compare anywhere.
SMALLQTY_FRAC_DEN = 5


def q_rel_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``rel_small_quantity`` — TPC-H Q17 generalized to every brand:
    per brand, the average yearly revenue lost if small-quantity
    lineitems (quantity below 20% of that PART's average) moved to
    scheduled bulk orders: ``sum(extendedprice)/7`` over qualifying
    lines. The classic correlated-subquery shape, expressed as one
    per-part aggregate joined back (Catalyst's decorrelation by hand —
    no per-row subquery exists at plan time). All arithmetic is exact
    cent-scaled BIGINTs (the ``rel_pricing_summary`` rule); the only
    doubles are the final /100 and /7, identical single ops.

    Scale: the per-part aggregate collapses lineitem map-side to
    O(parts); the threshold join carries (part → two integers) and
    broadcasts; part is a broadcast dim."""
    li = load_table(spark, sf_dir, "lineitem", spread=False)
    part = load_table(spark, sf_dir, "part", spread=False)
    cq = _cents("l_quantity")
    cp = _cents("l_extendedprice")
    lines = li.where(
        F.col("l_partkey").isNotNull()
        & F.col("l_quantity").isNotNull()
        & F.col("l_extendedprice").isNotNull()
    ).select("l_partkey", cq.alias("_cq"), cp.alias("_cp"))
    per_part = lines.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("_n"), F.sum("_cq").alias("_sq")
    )
    small = (
        lines.join(F.broadcast(per_part), "l_partkey")
        .where(
            F.col("_cq") * F.lit(SMALLQTY_FRAC_DEN) * F.col("_n")
            < F.col("_sq")
        )
        .join(
            F.broadcast(part.select("p_partkey", "p_brand")),
            F.col("p_partkey") == F.col("l_partkey"),
        )
    )
    return small.groupBy("p_brand").agg(
        F.round(
            F.sum("_cp") / F.lit(100.0) / F.lit(7.0), 6
        ).alias("avg_yearly")
    )


_REL_SMALL_QUANTITY_ORACLE = f"""
WITH lines AS (
  SELECT l_partkey,
         CAST(ROUND(l_quantity * 100) AS BIGINT) AS cq,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cp
  FROM lineitem
  WHERE l_partkey IS NOT NULL AND l_quantity IS NOT NULL
    AND l_extendedprice IS NOT NULL
), per_part AS (
  SELECT l_partkey, COUNT(*) AS n, SUM(cq) AS sq
  FROM lines GROUP BY l_partkey
)
SELECT p.p_brand,
       ROUND(SUM(l.cp) / 100.0 / 7.0, 6) AS avg_yearly
FROM lines l
JOIN per_part pp ON l.l_partkey = pp.l_partkey
JOIN part p ON p.p_partkey = l.l_partkey
WHERE l.cq * {SMALLQTY_FRAC_DEN} * pp.n < pp.sq
GROUP BY p.p_brand
"""

# --------------------------------------------------------------------------
# corpus_soft_dedup — keep-all, downweight-duplicates sampling weights
# --------------------------------------------------------------------------


def q_corpus_soft_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``corpus_soft_dedup`` — per-document sampling weight
    ``1/|near-dup cluster|`` (docs outside any cluster weigh 1): the
    soft alternative to dropping duplicates — every document stays
    samplable, but a 12-copy boilerplate family contributes ONE
    document's worth of probability mass to the training mixture (the
    duplication-aware reweighting pretraining data curricula apply).
    Composes the registered exact near-dup machinery: ngram pair graph
    → min-label components (construction-inclusive — the
    ``dedup_cluster`` fixpoint) → cluster sizes → one broadcast join
    back to the corpus spine."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = D.ngram_jaccard_pairs(
        docs, k=3, threshold=0.5, max_shingle_df=MAX_SHINGLE_DF
    )
    clusters = D.near_dup_clusters(pairs)
    sizes = clusters.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("_sz")
    )
    labeled = clusters.join(sizes, "cluster_id")
    return (
        docs.select("doc_id")
        .join(F.broadcast(labeled), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("cluster_id"), F.col("doc_id")).alias(
                "cluster_id"
            ),
            F.round(
                F.lit(1.0) / F.coalesce(F.col("_sz"), F.lit(1)), 6
            ).alias("weight"),
        )
    )


_CORPUS_SOFT_DEDUP_ORACLE = f"""
WITH RECURSIVE pairs AS (
  {_DEDUP_NGRAM_ORACLE}
), edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION ALL
  SELECT id_b AS src, id_a AS dst FROM pairs
), reach AS (
  SELECT src AS id, src AS r FROM edges
  UNION
  SELECT e.src AS id, rr.r FROM edges e JOIN reach rr ON rr.id = e.dst
), clusters AS (
  SELECT id AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY id
), sizes AS (
  SELECT cluster_id, COUNT(*) AS sz FROM clusters GROUP BY cluster_id
)
SELECT d.doc_id,
       COALESCE(c.cluster_id, d.doc_id) AS cluster_id,
       ROUND(CAST(1.0 AS DOUBLE) / COALESCE(s.sz, 1), 6) AS weight
FROM documents d
LEFT JOIN clusters c ON c.doc_id = d.doc_id
LEFT JOIN sizes s ON s.cluster_id = c.cluster_id
"""

# --------------------------------------------------------------------------
# win_zscore — integer-exact per-bucket anomaly scores
# --------------------------------------------------------------------------

ZSCORE_FLAG = 2.0


def q_win_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``win_zscore`` — per event type, each hourly bucket's z-score
    against that type's own rate distribution, with an anomaly flag at
    |z| ≥ 2: the per-bucket complement of ``win_changepoint`` (CUSUM
    finds sustained shifts; the z-score flags single-bucket spikes).
    Exact construction: z = (n·x − s) / sqrt(n·Σx² − s²) — numerator
    and radicand are exact BIGINTs (population-variance identity
    scaled by n²), sqrt is IEEE-correctly-rounded, one division —
    identical doubles on both engines, rounded 6dp by convention.
    Constant series (radicand 0) yield NULL z, not a division blowup.

    Scale: the count collapse absorbs event volume map-side; the
    moment windows ride O(types × hours)."""
    ev = load_table(spark, sf_dir, "events", spread=False)
    hourly = (
        ev.where(F.col("ts").isNotNull() & F.col("event_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("_k"),
            F.date_trunc("hour", F.col("ts")).alias("_b"),
        )
        .agg(F.count(F.lit(1)).alias("_x"))
    )
    per_key = Window.partitionBy("_k")
    n = F.count(F.lit(1)).over(per_key)
    s = F.sum("_x").over(per_key)
    s2 = F.sum(F.col("_x") * F.col("_x")).over(per_key)
    rad = (n * s2 - s * s).cast("double")
    z = F.when(
        rad > 0,
        F.round((n * F.col("_x") - s) / F.sqrt(rad), 6),
    )
    return hourly.select(
        F.col("_k").alias("event_type"),
        F.col("_b").alias("bucket"),
        F.col("_x").alias("n"),
        z.alias("z"),
        (F.abs(z) >= ZSCORE_FLAG).alias("is_anomaly"),
    )


_WIN_ZSCORE_ORACLE = f"""
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hr, COUNT(*) AS x
  FROM events
  WHERE ts IS NOT NULL AND event_type IS NOT NULL
  GROUP BY 1, 2
), m AS (
  SELECT event_type, hr, x,
         COUNT(*) OVER (PARTITION BY event_type) AS n,
         SUM(x) OVER (PARTITION BY event_type) AS s,
         SUM(x * x) OVER (PARTITION BY event_type) AS s2
  FROM hourly
), zs AS (
  SELECT event_type, hr AS bucket, x AS n,
         CASE WHEN n * s2 - s * s > 0 THEN
           ROUND(
             (n * x - s) / SQRT(CAST(n * s2 - s * s AS DOUBLE)), 6
           )
         END AS z
  FROM m
)
SELECT event_type, bucket, n, z, (ABS(z) >= {ZSCORE_FLAG}) AS is_anomaly
FROM zs
"""

# --------------------------------------------------------------------------
# graph_degree_stats — structural profile of the co-purchase graph
# --------------------------------------------------------------------------


def q_graph_degree_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``graph_degree_stats`` — per vertex side of the symmetrized
    customer–part co-purchase graph (the ``graph_pagerank`` relation):
    vertex count, min/max/mean degree — the structural profile that
    decides iteration counts and skew handling BEFORE running the
    expensive ranking (a hub with degree ≈ |V| calls for AQE skew
    splits; a mean degree near 1 means components are tiny and CC
    converges in 2 rounds). Exact integers plus one rounded mean."""
    orders = load_table(spark, sf_dir, "orders", spread=False)
    li = load_table(spark, sf_dir, "lineitem", spread=False)
    cp = (
        orders.join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .where(
            F.col("o_custkey").isNotNull()
            & F.col("l_partkey").isNotNull()
        )
        .select(
            (F.col("o_custkey") * 2).alias("cv"),
            (F.col("l_partkey") * 2 + 1).alias("pv"),
        )
        .distinct()
    )
    # both vertex sides via ONE explode (r15): the self-union form
    # referenced the cp join+distinct subtree twice
    deg = (
        cp.select(
            F.explode(F.array(F.col("cv"), F.col("pv"))).alias("vertex")
        )
        .groupBy("vertex")
        .agg(F.count(F.lit(1)).alias("_deg"))
    )
    side = F.when(
        F.col("vertex") % 2 == 0, F.lit("customer")
    ).otherwise(F.lit("part"))
    return (
        deg.groupBy(side.alias("side"))
        .agg(
            F.count(F.lit(1)).alias("n_vertices"),
            F.min("_deg").alias("min_degree"),
            F.max("_deg").alias("max_degree"),
            F.round(
                F.sum("_deg") / F.count(F.lit(1)).cast("double"), 6
            ).alias("mean_degree"),
        )
    )


_GRAPH_DEGREE_STATS_ORACLE = """
WITH cp AS (
  SELECT DISTINCT o.o_custkey * 2 AS cv, l.l_partkey * 2 + 1 AS pv
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  WHERE o.o_custkey IS NOT NULL AND l.l_partkey IS NOT NULL
), deg AS (
  SELECT vertex, COUNT(*) AS d
  FROM (
    SELECT cv AS vertex FROM cp UNION ALL SELECT pv FROM cp
  ) GROUP BY vertex
)
SELECT CASE WHEN vertex % 2 = 0 THEN 'customer' ELSE 'part' END AS side,
       COUNT(*) AS n_vertices,
       MIN(d) AS min_degree,
       MAX(d) AS max_degree,
       ROUND(SUM(d) / CAST(COUNT(*) AS DOUBLE), 6) AS mean_degree
FROM deg GROUP BY 1
"""

# --------------------------------------------------------------------------

STAGED_R19_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "agg_quantile_merge": q_agg_quantile_merge,
    "rel_small_quantity": q_rel_small_quantity,
    "corpus_soft_dedup": q_corpus_soft_dedup,
    "win_zscore": q_win_zscore,
    "graph_degree_stats": q_graph_degree_stats,
}

STAGED_R19_ORACLES: dict[str, str] = {
    "agg_quantile_merge": _AGG_QUANTILE_MERGE_ORACLE,
    "rel_small_quantity": _REL_SMALL_QUANTITY_ORACLE,
    "corpus_soft_dedup": _CORPUS_SOFT_DEDUP_ORACLE,
    "win_zscore": _WIN_ZSCORE_ORACLE,
    "graph_degree_stats": _GRAPH_DEGREE_STATS_ORACLE,
}
