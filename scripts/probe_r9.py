#!/usr/bin/env python
"""Per-arm scaling probe for the r9 operators (SCALING.md ledger).

One process per invocation (the in-session A/B degradation rule):
``python scripts/probe_r9.py <op> <sf_dir>`` runs one op once and prints
wall seconds. Wrapper loop over {op} x {sf0.01, sf0.1} x repeats gives
the 10x data exponent. Warmup off the clock, as in probe_r8c.py.

Ops: clean_text, quantile_sketch, incr_minhash, tokenize, pq
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    op, sf_dir = sys.argv[1], sys.argv[2]
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from flink_audit_sessions_example_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars", "text"
    )
    docs.count()  # warm

    # spawn the Arrow worker pool off the clock (probe_r8c pattern)
    def _identity(batches):
        yield from batches

    (spark.range(0, 10_000, 1, 32).mapInPandas(_identity, "id long")
     .write.format("noop").mode("overwrite").save())

    t0 = time.perf_counter()
    if op == "clean_text":
        from flink_audit_sessions_example_spark.operators.text import (
            clean_text,
        )

        clean_text(docs).select("doc_id", "clean_text").write.format(
            "noop"
        ).mode("overwrite").save()
    elif op == "quantile_sketch":
        from flink_audit_sessions_example_spark.operators.sketches import (
            quantile_sketch_estimate,
            quantile_sketch_table,
        )

        sk = quantile_sketch_table(
            docs, "n_chars", key_col="doc_id", group_cols=["lang"]
        )
        quantile_sketch_estimate(sk, group_cols=["lang"]).write.format(
            "noop"
        ).mode("overwrite").save()
    elif op == "tokenize":
        from flink_audit_sessions_example_spark.operators.bpe import (
            learn_bpe_merges,
            tokenize_documents,
            word_freq_table,
        )

        merges = learn_bpe_merges(
            word_freq_table(docs.select("text")), n_merges=10
        )
        t0 = time.perf_counter()  # restart clock: probe the ENCODE path
        tokenize_documents(docs.select("doc_id", "text"), merges).write.format(
            "noop"
        ).mode("overwrite").save()
    elif op == "pq":
        from flink_audit_sessions_example_spark.operators.similarity import (
            pq_codebooks,
            pq_encode,
            pq_topk,
        )
        from flink_audit_sessions_example_spark.sources import (
            load_table as _lt,
        )

        emb = _lt(spark, sf_dir, "embeddings").select(
            "vec_id", "embedding"
        )
        emb.count()  # warm this table too (docs warmed above)
        t0 = time.perf_counter()
        cbs = pq_codebooks(emb, m=8, n_codes=16)
        codes = pq_encode(emb, cbs)
        pq_topk(
            codes, emb.where("vec_id % 50 = 0"), cbs, k=10
        ).write.format("noop").mode("overwrite").save()
    elif op == "incr_minhash":
        from flink_audit_sessions_example_spark.operators.dedup import (
            incremental_minhash_pairs,
            minhash_signatures,
        )

        old = minhash_signatures(docs.where("doc_id % 10 != 0"))
        new = minhash_signatures(docs.where("doc_id % 10 = 0"))
        incremental_minhash_pairs(new, old, threshold=0.35).write.format(
            "noop"
        ).mode("overwrite").save()
    else:
        raise SystemExit(f"unknown op {op!r}")
    print(f"{op} {os.path.basename(sf_dir.rstrip('/'))} "
          f"sec={time.perf_counter() - t0:.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
