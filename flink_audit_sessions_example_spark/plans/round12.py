"""Round-12 registrations.

``dedup_incremental`` closes the registry's last oracle-less batch
capability (r11 verdict gap #3): :func:`~..operators.dedup.
incremental_minhash_pairs` — the growing-corpus near-dup path whose
PRODUCTION configuration (xxhash64 signatures + xxhash64 band keys) is
not DuckDB-reproducible — registered here as a deterministic md5/affine
twin, exactly the pattern that earned ``sim_topk_ivf`` / ``sim_topk_pq``
their driver rows: same operator, same plan shape (broadcast increment,
zero history exchange, capped buckets), hash-family swapped to the
oracle-checkable construction the batch ``dedup_minhash`` registration
already pins (md5 two-hash affine signatures, 40-bit affine polynomial
band fold). The production xxhash64 path is unchanged and keeps its
pytest coverage (tests/test_incremental_dedup.py).

The corpus split is deterministic and SQL-expressible: documents with
``doc_id % 10 == 0`` form the "tonight's crawl" increment (~10%), the
rest the persisted history — so the registration exercises BOTH
sub-paths (new×new pairs-from-postings and the broadcast new×old join)
against real planted duplicates in the test corpus.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup as D
from ..operators.dedup import _AFFINE_M, _AFFINE_P
from ..sources.tables import load_table
from .extended import MAX_BUCKET_SIZE, _sql_hex40, _sql_shingles

# --------------------------------------------------------------------------
# dedup_incremental — incremental MinHash near-dup pairs (md5/affine twin)
# --------------------------------------------------------------------------

INC_K = 3
INC_NUM_HASHES = 64
INC_BANDS = 16
INC_THRESHOLD = 0.5
INC_SPLIT_MOD = 10  # doc_id % 10 == 0 → the new-batch increment


def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``dedup_incremental`` — near-dup pairs involving at least one
    document of tonight's increment, from signature tables alone
    (:func:`~..operators.dedup.incremental_minhash_pairs`): history
    participates as ONE pruned scan of its (id, sig) rows and joins the
    broadcast increment map-side with zero exchange; verification is
    the estimated Jaccard (fraction of agreeing minima — the corpus
    text is deliberately not re-read). md5 signatures + affine band
    fold so the DuckDB oracle reproduces every stage; production runs
    ``hash_family='xxhash64'`` / ``bucket_hash='xxhash64'`` with the
    identical plan."""
    docs = load_table(spark, sf_dir, "documents")
    new_sigs = D.minhash_signatures(
        docs.where(F.col("doc_id") % INC_SPLIT_MOD == 0),
        k=INC_K,
        num_hashes=INC_NUM_HASHES,
        hash_family="md5",
    )
    old_sigs = D.minhash_signatures(
        docs.where(F.col("doc_id") % INC_SPLIT_MOD != 0),
        k=INC_K,
        num_hashes=INC_NUM_HASHES,
        hash_family="md5",
    )
    return D.incremental_minhash_pairs(
        new_sigs,
        old_sigs,
        num_hashes=INC_NUM_HASHES,
        bands=INC_BANDS,
        threshold=INC_THRESHOLD,
        bucket_hash="affine",
        max_bucket_size=MAX_BUCKET_SIZE,
        max_history_bucket_size=MAX_BUCKET_SIZE,
    )


def _incremental_oracle() -> str:
    """DuckDB twin of the registered ``dedup_incremental``: md5 two-hash
    affine signatures (hᵢ = k1 + i·k2 from one md5 per shingle — the
    ``dedup_minhash`` oracle's construction), 16 affine-fold band keys,
    the increment split by ``doc_id % 10``, capped new×new buckets,
    hot-history-bucket exclusion, and the agreeing-minima estimator
    ``matches / 64`` — term-for-term the Spark plan."""
    r = INC_NUM_HASHES // INC_BANDS

    def affine_key(b: int) -> str:
        acc = f"CAST({b} AS BIGINT)"
        for j in range(r):
            acc = f"(({acc}) * {_AFFINE_P} + h{b * r + j}) % {_AFFINE_M}"
        return acc

    mins = ",\n    ".join(
        f"MIN(k1 + {i} * k2) AS h{i}" for i in range(INC_NUM_HASHES)
    )
    band_union = lambda src: "\n  UNION ALL ".join(  # noqa: E731
        f"SELECT id, {affine_key(b)} AS key FROM {src}"
        for b in range(INC_BANDS)
    )
    agree = " + ".join(
        f"CAST(sa.h{i} = sb.h{i} AS INT)" for i in range(INC_NUM_HASHES)
    )
    est = f"CAST({agree} AS DOUBLE) / {INC_NUM_HASHES}"
    return f"""
WITH sh AS (
  SELECT doc_id AS id, doc_id % {INC_SPLIT_MOD} = 0 AS is_new,
         unnest({_sql_shingles(INC_K)}) AS s
  FROM documents
), hashed AS (
  SELECT id, is_new,
         {_sql_hex40("d", 1)} AS k1, {_sql_hex40("d", 11)} AS k2
  FROM (SELECT id, is_new, md5(s) AS d FROM sh) t
), nsig AS (
  SELECT id, {mins} FROM hashed WHERE is_new GROUP BY id
), osig AS (
  SELECT id, {mins} FROM hashed WHERE NOT is_new GROUP BY id
), nbands AS (
  {band_union("nsig")}
), obands AS (
  {band_union("osig")}
), okb AS (
  SELECT key FROM nbands GROUP BY 1
  HAVING COUNT(*) >= 2 AND COUNT(*) <= {MAX_BUCKET_SIZE}
), nn AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM nbands a JOIN okb USING (key)
  JOIN nbands b ON b.key = a.key AND a.id < b.id
), hot AS (
  SELECT key FROM obands GROUP BY 1 HAVING COUNT(*) > {MAX_BUCKET_SIZE}
), no_cand AS (
  SELECT DISTINCT o.id AS id_a, n.id AS id_b
  FROM obands o
  ANTI JOIN hot ON o.key = hot.key
  JOIN (SELECT DISTINCT key, id FROM nbands) n
    ON n.key = o.key AND o.id != n.id
), nn_est AS (
  SELECT p.id_a, p.id_b, {est} AS est_jaccard
  FROM nn p JOIN nsig sa ON sa.id = p.id_a JOIN nsig sb ON sb.id = p.id_b
), no_est AS (
  SELECT p.id_a, p.id_b, {est} AS est_jaccard
  FROM no_cand p
  JOIN osig sa ON sa.id = p.id_a JOIN nsig sb ON sb.id = p.id_b
)
SELECT * FROM nn_est WHERE est_jaccard >= {INC_THRESHOLD}
UNION ALL
SELECT * FROM no_est WHERE est_jaccard >= {INC_THRESHOLD}
"""


# --------------------------------------------------------------------------

ROUND12_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "dedup_incremental": q_dedup_incremental,
}

ROUND12_ORACLES: dict[str, str] = {
    "dedup_incremental": _incremental_oracle(),
}
