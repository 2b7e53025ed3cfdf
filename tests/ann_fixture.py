"""Clustered planted-neighbor embedding fixture for ANN operating-point
tuning (VERDICT r3 "What's missing #3").

The driver's `embeddings` table is isotropic noise — the ANN worst case,
where NO selective operating point can recall well because true
neighbors are barely closer than the bulk (SCALING.md r3 recall table).
Real embedding corpora cluster: most vectors live in dense modes and a
query's true neighbors are FAR closer than the bulk. This generator
builds that realistic geometry deterministically, so a selective
operating point's recall can be pinned as a regression floor:

- ``n_clusters`` unit centers drawn from an isotropic Gaussian;
- each corpus vector = normalize(center + noise of total norm ``sigma``)
  — the noise vector's NORM is sigma (per-dim draws are scaled by
  1/√dim), so within-cluster cosine ≈ 1/√(1+sigma²) independent of dim
  (sigma=0.85 → ≈0.76, a typical "same topic" similarity for sentence
  embeddings);
- every ``query_stride``-th vector is a query, and for each query a
  PLANTED NEAR-NEIGHBOR — normalize(q + noise of norm ``eps``), cosine
  ≈ 1/√(1+eps²) ≈ 0.95 at eps=0.33 — is appended with id
  ``query_id + PLANT_OFFSET``. The planted pair is the ground truth:
  any reasonable ANN point must surface it, no brute-force oracle
  needed (it is each query's top-1 by construction, the within-cluster
  bulk sitting well below).

Deterministic (fixed numpy seed), cheap (n·dim floats), no files.
"""

from __future__ import annotations

import numpy as np

PLANT_OFFSET = 1_000_000


def clustered_embeddings(
    n: int = 2000,
    *,
    dim: int = 64,
    n_clusters: int = 32,
    sigma: float = 0.85,
    eps: float = 0.33,
    query_stride: int = 50,
    seed: int = 1234,
):
    """Return ``(corpus_rows, query_ids)``: rows are ``(vec_id,
    embedding)`` tuples including the planted neighbors; every
    ``query_ids[i]``'s planted twin has id ``qid + PLANT_OFFSET``.
    ``sigma``/``eps`` are total noise NORMS (cos ≈ 1/√(1+x²))."""
    rng = np.random.default_rng(seed)
    root_d = float(np.sqrt(dim))
    centers = rng.standard_normal((n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    members = centers[rng.integers(0, n_clusters, n)] + (
        sigma / root_d
    ) * rng.standard_normal((n, dim))
    members /= np.linalg.norm(members, axis=1, keepdims=True)
    rows = [(int(i), [float(x) for x in members[i]]) for i in range(n)]
    query_ids = list(range(0, n, query_stride))
    for qid in query_ids:
        twin = members[qid] + (eps / root_d) * rng.standard_normal(dim)
        twin /= np.linalg.norm(twin)
        rows.append((qid + PLANT_OFFSET, [float(x) for x in twin]))
    return rows, query_ids


def as_spark_df(spark, rows):
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.DoubleType())),
        ]
    )
    return spark.createDataFrame(rows, schema)
