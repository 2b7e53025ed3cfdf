#!/usr/bin/env python
"""PQ codebook-quality probe (r10 verdict #7): recall@k of ADC search
under the deterministic-seed codebooks (`pq_codebooks` — the
oracle-checkable variant) vs the Lloyd-trained production codebooks
(`pq_codebooks_trained`), against exact brute-force cosine ground
truth, plus each variant's quantization MSE. Results are the r11
recall table in SCALING.md.

Usage: python scripts/probe_pq_recall.py [sf_dir] (default sf0.1).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from flink_audit_sessions_example_spark.operators.similarity import (
        brute_force_topk,
        pq_codebooks,
        pq_codebooks_trained,
        pq_encode,
        pq_topk,
    )
    from flink_audit_sessions_example_spark.sources import load_table

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    queries = emb.where("vec_id % 37 = 0")
    k = 10

    truth: dict[int, set[int]] = {}
    for r in brute_force_topk(emb, queries, k=k).collect():
        truth.setdefault(r.query_id, set()).add(r.neighbor_id)

    from flink_audit_sessions_example_spark.operators.similarity import (
        _pq_subdists,
    )

    X = np.array(
        [np.asarray(r.embedding, dtype=np.float64) for r in emb.collect()]
    )

    def mse(cbs) -> float:
        # built on the SAME kernel the encoder deploys (_pq_subdists) —
        # no third formulation of the objective to drift from the one
        # the pipeline and its tests already trust (review r11 #5; the
        # test-side python reference stays deliberately independent)
        sub = len(cbs[0][0])
        total = np.zeros(len(X))
        for j in range(len(cbs)):
            C = np.asarray(cbs[j], dtype=np.float64)
            total += _pq_subdists(X, C, j, sub).min(axis=1)
        return float(total.mean())

    print(f"# sf_dir={sf_dir} corpus={len(rows)} queries={len(truth)} k={k}")
    for name, cbs in (
        ("seed m=8 codes=16", pq_codebooks(emb)),
        ("lloyd m=8 codes=16", pq_codebooks_trained(emb)),
        ("seed m=8 codes=64", pq_codebooks(emb, n_codes=64)),
        ("lloyd m=8 codes=64", pq_codebooks_trained(emb, n_codes=64)),
    ):
        codes = pq_encode(emb, cbs)
        got: dict[int, set[int]] = {}
        out = pq_topk(codes, queries, cbs, k=k).where(
            F.col("query_id") != F.col("neighbor_id")
        )
        for r in out.collect():
            s = got.setdefault(r.query_id, set())
            if len(s) < k:
                s.add(r.neighbor_id)
        hits = sum(len(truth[q] & got.get(q, set())) for q in truth)
        denom = sum(len(truth[q]) for q in truth)
        print(
            f"{name}: recall@{k} = {hits}/{denom} = {hits/denom:.3f}   "
            f"quantization MSE = {mse(cbs):.4f}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
