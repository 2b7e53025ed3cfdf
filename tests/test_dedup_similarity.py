"""Behavioral tests for dedup / similarity / multimodal operators —
properties the DuckDB parity harness can't express (LSH recall/precision,
stub decode plumbing)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from flink_audit_sessions_example_spark.operators import dedup as D
from flink_audit_sessions_example_spark.operators import multimodal as M
from flink_audit_sessions_example_spark.operators import similarity as S
from flink_audit_sessions_example_spark.sources import load_table

from conftest import SF_DIR


def test_minhash_precision_and_recall(spark):
    docs = load_table(spark, SF_DIR, "documents")
    exact = {
        (r.id_a, r.id_b)
        for r in D.ngram_jaccard_pairs(docs, k=3, threshold=0.5).collect()
    }
    approx = {
        (r.id_a, r.id_b)
        for r in D.minhash_near_dup_pairs(
            docs, k=3, num_hashes=64, bands=16, threshold=0.5
        ).collect()
    }
    assert approx <= exact  # exact-verify step => precision 1.0
    assert exact  # fixture contains planted near-dups
    assert len(approx) / len(exact) >= 0.8  # banding recall


def test_exact_dedup_deterministic_survivor(spark):
    df = spark.createDataFrame(
        [Row(doc_id=5, text="a b c"), Row(doc_id=2, text="a b c"),
         Row(doc_id=9, text="x y z")],
    )
    out = {r.text: r.doc_id for r in D.exact_dedup(df, ["text"], "doc_id").collect()}
    assert out == {"a b c": 2, "x y z": 9}


def test_simhash_identical_docs_collide(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, text="the quick brown fox jumps"),
         Row(doc_id=2, text="the quick brown fox jumps"),
         Row(doc_id=3, text="entirely different words here now")],
    )
    fps = {r.id: r.simhash for r in D.simhash(df).collect()}
    assert fps[1] == fps[2]
    assert fps[1] != fps[3]
    cands = {
        (r.id_a, r.id_b)
        for r in D.simhash_candidate_pairs(
            D.simhash(df).select("id", "simhash"), bands=4
        ).collect()
    }
    assert (1, 2) in cands


def test_lsh_topk_agrees_with_brute_force_on_top1(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.where(F.col("vec_id") % 100 == 0)
    exact = {
        r.query_id: r.neighbor_id
        for r in S.brute_force_topk(emb, queries, k=1).collect()
    }
    approx_rows = S.lsh_topk(
        emb, queries, dim=64, k=10, nbits=16, bands=4
    ).collect()
    approx_sets = {}
    for r in approx_rows:
        approx_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    # every query got candidates
    assert set(exact) == set(approx_sets)
    # the verify stage computes EXACT cosines: any (q, n) the LSH path
    # returns must carry the same sim as brute force
    bf = {
        (r.query_id, r.neighbor_id): r.sim
        for r in S.brute_force_topk(emb, queries, k=499).collect()
    }
    for r in approx_rows:
        assert bf[(r.query_id, r.neighbor_id)] == pytest.approx(r.sim, abs=1e-6)
    # recall floor — these embeddings are weakly similar (max cos ≈ 0.44,
    # per-bit collision p ≈ 0.645), where multi-probe banding still gives
    # ≈0.96 expected per-query hit prob; the exact twin `sim_topk` is the
    # hash-checked one
    hits = sum(1 for q, n in exact.items() if n in approx_sets[q])
    assert hits / len(exact) >= 0.6


def test_lsh_topk_finds_planted_duplicates(spark):
    """Deterministic recall: a scaled copy of a vector has the identical
    hyperplane sketch (sign(2v·h) = sign(v·h)), so LSH MUST bucket it with
    its original and the exact-cosine verify MUST rank it #1 (cos = 1)."""
    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.where(F.col("vec_id") % 100 == 0)
    planted = queries.select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(2.0)).alias("embedding"),
    )
    corpus = emb.select("vec_id", "embedding").unionByName(planted)
    top1 = {
        r.query_id: (r.neighbor_id, r.sim)
        for r in S.lsh_topk(corpus, queries, dim=64, k=1, nbits=16, bands=4)
        .collect()
    }
    for qid, (nid, sim) in top1.items():
        assert nid == qid + 100000
        assert sim == pytest.approx(1.0, abs=1e-6)


def test_ivf_topk_finds_planted_duplicates_and_recall(spark):
    """Deterministic: a scaled copy has the same nearest centroid, so IVF
    must return it at rank 1 with cos=1; plus a recall floor vs brute
    force on the real corpus (nprobe=4 of 16 lists)."""
    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.where(F.col("vec_id") % 100 == 0)
    planted = queries.select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(2.0)).alias("embedding"),
    )
    corpus = emb.select("vec_id", "embedding").unionByName(planted)
    top1 = {
        r.query_id: (r.neighbor_id, r.sim)
        for r in S.ivf_topk(corpus, queries, k=1).collect()
    }
    for qid, (nid, sim) in top1.items():
        assert nid == qid + 100000
        assert sim == pytest.approx(1.0, abs=1e-6)

    exact = {
        r.query_id: r.neighbor_id
        for r in S.brute_force_topk(emb, queries, k=1).collect()
    }
    approx = {}
    for r in S.ivf_topk(emb, queries, k=10).collect():
        approx.setdefault(r.query_id, set()).add(r.neighbor_id)
    hits = sum(1 for q, n in exact.items() if n in approx.get(q, set()))
    assert hits / len(exact) >= 0.4


def test_multimodal_decode_stub(spark):
    docs = M.with_binary_payload(load_table(spark, SF_DIR, "documents"))
    out = M.decode_media(docs)
    assert out.schema == M.DECODED_SCHEMA
    rows = out.orderBy("doc_id").limit(1).collect()
    row = rows[0]
    src = (
        load_table(spark, SF_DIR, "documents")
        .where(F.col("doc_id") == row.doc_id)
        .collect()[0]
    )
    payload = src.text.encode("utf-8")
    assert row.n_bytes == len(payload)
    assert (row.width, row.height, row.n_frames) == M._fake_decode(payload)


def test_resize_media_stub_pins_output_shape(spark):
    docs = M.with_binary_payload(load_table(spark, SF_DIR, "documents"))
    out = M.resize_media(docs, width=8, height=4)
    assert out.schema == M.RESIZED_SCHEMA
    rows = out.limit(5).collect()
    assert rows
    for r in rows:
        assert (r.width, r.height) == (8, 4)
        assert len(bytes(r.payload)) == 32


def test_frame_sample_reconstructs_prefix(spark):
    docs = M.with_binary_payload(load_table(spark, SF_DIR, "documents"))
    frames = (
        M.frame_sample(docs, stride=4)
        .where(F.col("doc_id") == 0)
        .orderBy("frame_idx")
        .collect()
    )
    src = load_table(spark, SF_DIR, "documents").where(F.col("doc_id") == 0).collect()[0]
    joined = b"".join(bytes(r.frame_bytes) for r in frames).decode()
    assert src.text.startswith(joined)
    assert len(frames) <= 16
