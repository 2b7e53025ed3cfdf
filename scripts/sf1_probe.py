#!/usr/bin/env python
"""sf1-scale probe for the dedup family (SCALING.md r3 section).

The driver provides testdata only up to sf0.1 (5k documents / 2k
embeddings). This probe generates a **statistically faithful** 10×
corpus ("sf1-style", 50k docs / 20k vectors) and times the dedup family
on real-sf0.1 vs generated-sf1, reporting the scaling ratio/exponent.

Why not the r2 replica-tag probe: tagging every word with a replica id
preserves row counts but DISTORTS the constant factors — string lengths
grow, the shingle document-frequency distribution collapses (no shingle
crosses replicas), LSH bucket occupancy thins artificially. This
generator instead builds each synthetic document by concatenating random
word-windows of REAL sf0.1 documents; 90% of a doc's windows get a
deterministic per-doc caesar rotation of their letters (novel content —
exact word lengths, zero cross-doc shingle sharing, like the unique tail
of a real crawl) while 10% stay verbatim (shared boilerplate whose
document frequency grows with corpus size, like real boilerplate). That
keeps the shingle-df distribution SCALE-INVARIANT — a pure mosaic of a
5k-doc template pool would instead inflate every shingle's df ~10× and
blow the pairs-from-postings volume quadratically (measured: broadcast
OOM at 50k docs), which no real 10× crawl does. Exact duplicates (~2%)
and perturbed near-duplicates (~5%) are planted on top. Embeddings are
resampled real vectors with small Gaussian noise plus planted
near-copies. Seeded; fully deterministic.

Output data lives under /root/repo/.scaling/sf1/ (gitignored — the
generator IS the artifact). Run: python scripts/sf1_probe.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

SF01 = "/root/testdata/sf0.1"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scaling", "sf1")
SEED = 42
N_DOCS = 50_000
N_VECS = 20_000


def generate() -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(SEED)
    src = pq.read_table(os.path.join(SF01, "documents.parquet")).to_pylist()
    texts = [r["text"] or "" for r in src]
    words_per_doc = [t.split() for t in texts]
    lengths = np.array([max(len(w), 1) for w in words_per_doc])
    vocab = sorted({w for ws in words_per_doc for w in ws})

    def rot(word: str, shift: int) -> str:
        # length-preserving letter rotation; digits/punct untouched
        out = []
        for ch in word:
            if "a" <= ch <= "z":
                out.append(chr((ord(ch) - 97 + shift) % 26 + 97))
            elif "A" <= ch <= "Z":
                out.append(chr((ord(ch) - 65 + shift) % 26 + 65))
            else:
                out.append(ch)
        return "".join(out)

    docs: list[str] = []
    for doc_i in range(N_DOCS):
        target = int(rng.choice(lengths))
        shift = 1 + int(rng.integers(25))
        out: list[str] = []
        while len(out) < target:
            d = words_per_doc[int(rng.integers(len(words_per_doc)))]
            if not d:
                continue
            m = int(rng.integers(5, 30))
            off = int(rng.integers(max(len(d) - m, 0) + 1))
            chunk = d[off : off + m]
            if rng.random() < 0.9:  # novel content: per-doc rotation
                chunk = [rot(w, shift) for w in chunk]
            out.extend(chunk)
        docs.append(" ".join(out[:target]))
    # planted exact duplicates (~2%) and near-duplicates (~5%, ~10% of
    # words swapped for vocabulary draws at random positions)
    n_exact, n_near = N_DOCS // 50, N_DOCS // 20
    for i in range(n_exact):
        docs[N_DOCS - 1 - i] = docs[int(rng.integers(N_DOCS - n_exact - n_near))]
    for i in range(n_near):
        base = docs[int(rng.integers(N_DOCS - n_exact - n_near))].split()
        for j in rng.integers(0, len(base), max(len(base) // 10, 1)):
            base[int(j)] = vocab[int(rng.integers(len(vocab)))]
        docs[N_DOCS - n_exact - 1 - i] = " ".join(base)

    os.makedirs(OUT, exist_ok=True)
    # lang resampled from the real sf0.1 distribution (SEPARATE rng —
    # the rng_cust rule: the shared stream must stay byte-identical).
    # A monolingual 'en' column made every lang-grouped arm degenerate
    # at sf1 — text_lang_divergence's non-reference side was EMPTY, so
    # its r15 probe timed a vacuous plan (caught in the r15 re-probe).
    rng_lang = np.random.default_rng(SEED + 30)
    lang_pool = np.array([r["lang"] for r in src])
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(N_DOCS), pa.int64()),
                "text": pa.array(docs, pa.string()),
                "lang": pa.array(
                    rng_lang.choice(lang_pool, N_DOCS), pa.string()
                ),
                "source": pa.array(["gen"] * N_DOCS, pa.string()),
                "n_chars": pa.array([len(t) for t in docs], pa.int64()),
            }
        ),
        os.path.join(OUT, "documents.parquet"),
    )

    # part catalog at 10×, statistically faithful for join_fuzzy: names
    # are 2-word draws from the REAL sf0.1 name vocabulary (adjective /
    # noun positions kept separate so the name distribution matches),
    # brands uniform over the real brand set — per-brand-pair exact-name
    # match density then scales like the real catalog's
    part_src = pq.read_table(
        os.path.join(SF01, "part.parquet"),
        columns=["p_name", "p_brand", "p_type", "p_size",
                 "p_retailprice"],
    ).to_pylist()
    adjs = sorted({r["p_name"].split()[0] for r in part_src})
    nouns = sorted({r["p_name"].split()[-1] for r in part_src})
    brands = sorted({r["p_brand"] for r in part_src})
    types = sorted({r["p_type"] for r in part_src})
    n_part = 10 * len(part_src)
    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array(range(n_part), pa.int64()),
                "p_name": pa.array(
                    [
                        f"{adjs[int(rng.integers(len(adjs)))]} "
                        f"{nouns[int(rng.integers(len(nouns)))]}"
                        for _ in range(n_part)
                    ],
                    pa.string(),
                ),
                "p_brand": pa.array(
                    [
                        brands[int(rng.integers(len(brands)))]
                        for _ in range(n_part)
                    ],
                    pa.string(),
                ),
                "p_type": pa.array(
                    [
                        types[int(rng.integers(len(types)))]
                        for _ in range(n_part)
                    ],
                    pa.string(),
                ),
                # p_size resampled from the real domain (the Q19
                # bracket arm filters on it); p_retailprice likewise
                # (the r25 Q9 profit arm's cost leg — the p_size
                # lesson repeating one column later, again)
                "p_size": pa.array(
                    rng.choice(
                        np.array(
                            [r["p_size"] for r in part_src],
                            dtype=np.int32,
                        ),
                        n_part,
                    ),
                    pa.int32(),
                ),
                "p_retailprice": pa.array(
                    rng.choice(
                        np.array(
                            [r["p_retailprice"] for r in part_src],
                            dtype=np.float64,
                        ),
                        n_part,
                    ),
                    pa.float64(),
                ),
            }
        ),
        os.path.join(OUT, "part.parquet"),
    )

    # lineitem-shaped basket table at 10×, faithful for rel_copurchase:
    # basket sizes drawn from the REAL per-order distinct-part-count
    # distribution, parts uniform over the 10× catalog — per-order pair
    # volume (the operator's quadratic dimension) then matches the real
    # table's, while pair-collision density scales like real TPC-H
    # (parts grow with sf). Only the columns the operator reads.
    li_src = pq.read_table(
        os.path.join(SF01, "lineitem.parquet"),
        columns=[
            "l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
            "l_extendedprice", "l_returnflag", "l_shipdate",
            "l_discount",
        ],
    ).to_pydict()
    baskets: dict[int, set] = {}
    for o, p in zip(li_src["l_orderkey"], li_src["l_partkey"]):
        baskets.setdefault(o, set()).add(p)
    basket_sizes = np.array([len(s) for s in baskets.values()])
    n_orders = 10 * len(baskets)
    sizes = rng.choice(basket_sizes, n_orders)
    okeys = np.repeat(np.arange(n_orders, dtype=np.int64), sizes)
    pkeys = rng.integers(0, n_part, okeys.size)

    # orders at 10× + the lineitem columns the r17/r18 families read
    # (supplier-delay, pagerank, kmv-intersect, benford): every
    # non-key column RESAMPLES the real empirical distribution —
    # orderdates, statuses, prices, return flags, and the per-line
    # ship LAG (shipdate − orderdate), so date-window selectivities
    # and delay rates match the real table's at 10× volume.
    o_src = pq.read_table(
        os.path.join(SF01, "orders.parquet"),
        columns=["o_orderkey", "o_orderdate", "o_orderstatus",
                 "o_custkey", "o_orderpriority", "o_totalprice"],
    ).to_pydict()
    real_dates = np.array(o_src["o_orderdate"], dtype="datetime64[us]")
    odates = rng.choice(real_dates, n_orders)
    statuses = np.array(o_src["o_orderstatus"])
    n_cust = 10 * len(set(o_src["o_custkey"]))
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(
                    np.arange(n_orders, dtype=np.int64), pa.int64()
                ),
                "o_custkey": pa.array(
                    rng.integers(0, n_cust, n_orders), pa.int64()
                ),
                "o_orderdate": pa.array(odates, pa.timestamp("us")),
                "o_orderstatus": pa.array(
                    rng.choice(statuses, n_orders), pa.string()
                ),
                # resampled priorities (the r25 Q12 arm's CASE counts)
                "o_orderpriority": pa.array(
                    rng.choice(
                        np.array(o_src["o_orderpriority"]), n_orders
                    ),
                    pa.string(),
                ),
                # resampled prices (the r28 Pareto arm's cent revenue)
                "o_totalprice": pa.array(
                    rng.choice(
                        np.array(o_src["o_totalprice"], dtype=np.float64),
                        n_orders,
                    ),
                    pa.float64(),
                ),
            }
        ),
        os.path.join(OUT, "orders.parquet"),
    )
    date_of = dict(zip(o_src["o_orderkey"], real_dates))
    lags = np.array(
        [
            np.datetime64(s, "us") - date_of[o]
            for o, s in zip(li_src["l_orderkey"], li_src["l_shipdate"])
            if s is not None and o in date_of
        ]
    )
    n_supp = 10 * len(set(li_src["l_suppkey"]))
    shipdates = odates[okeys] + rng.choice(lags, okeys.size)
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(okeys, pa.int64()),
                "l_partkey": pa.array(pkeys, pa.int64()),
                "l_suppkey": pa.array(
                    rng.integers(0, n_supp, okeys.size), pa.int64()
                ),
                "l_quantity": pa.array(
                    rng.choice(
                        np.array(li_src["l_quantity"], dtype=np.float64),
                        okeys.size,
                    ),
                    pa.float64(),
                ),
                "l_extendedprice": pa.array(
                    rng.choice(
                        np.array(li_src["l_extendedprice"], dtype=np.float64),
                        okeys.size,
                    ),
                    pa.float64(),
                ),
                "l_returnflag": pa.array(
                    rng.choice(np.array(li_src["l_returnflag"]), okeys.size),
                    pa.string(),
                ),
                "l_shipdate": pa.array(shipdates, pa.timestamp("us")),
                "l_discount": pa.array(
                    rng.choice(
                        np.array(li_src["l_discount"], dtype=np.float64),
                        okeys.size,
                    ),
                    pa.float64(),
                ),
            }
        ),
        os.path.join(OUT, "lineitem.parquet"),
    )
    # supplier at 10× with a nation leg, plus customer at 10× and the
    # FIXED nation/region dims copied verbatim — the r22/r23 relational
    # arms (market_share, important_stock) join all five
    pq.write_table(
        pa.table(
            {
                "s_suppkey": pa.array(
                    np.arange(n_supp, dtype=np.int64), pa.int64()
                ),
                "s_name": pa.array(
                    [f"Supplier#{i:09d}" for i in range(n_supp)],
                    pa.string(),
                ),
                "s_nationkey": pa.array(
                    rng.integers(0, 25, n_supp).astype(np.int32),
                    pa.int32(),
                ),
            }
        ),
        os.path.join(OUT, "supplier.parquet"),
    )
    # c_acctbal / c_mktsegment resampled from the real empirical
    # domains (the p_retailprice pattern) — the r29 Q22 arm filters on
    # the positive-balance average and groups by segment
    cust_src = pq.read_table(
        os.path.join(SF01, "customer.parquet"),
        columns=["c_acctbal", "c_mktsegment"],
    )
    # SEPARATE rng: drawing these from the shared stream would shift
    # every later table's randomness and silently regenerate a
    # DIFFERENT corpus (breaking cross-round probe comparability)
    rng_cust = np.random.default_rng(SEED + 29)
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array(
                    np.arange(n_cust, dtype=np.int64), pa.int64()
                ),
                "c_name": pa.array(
                    [f"Customer#{i:09d}" for i in range(n_cust)],
                    pa.string(),
                ),
                "c_nationkey": pa.array(
                    rng.integers(0, 25, n_cust).astype(np.int32),
                    pa.int32(),
                ),
                "c_acctbal": pa.array(
                    rng_cust.choice(
                        np.array(cust_src.column("c_acctbal")), n_cust
                    ),
                    pa.float64(),
                ),
                "c_mktsegment": pa.array(
                    rng_cust.choice(
                        np.array(cust_src.column("c_mktsegment")), n_cust
                    ),
                    pa.string(),
                ),
            }
        ),
        os.path.join(OUT, "customer.parquet"),
    )
    for dim in ("nation", "region"):
        pq.write_table(
            pq.read_table(os.path.join(SF01, f"{dim}.parquet")),
            os.path.join(OUT, f"{dim}.parquet"),
        )

    emb_src = pq.read_table(os.path.join(SF01, "embeddings.parquet"))
    em = np.array(emb_src.column("embedding").to_pylist(), dtype=np.float32)
    src_labels = np.array(emb_src.column("label").to_pylist(), dtype=np.int32)
    idx = rng.integers(0, len(em), N_VECS)
    vecs = em[idx] + rng.normal(0, 0.05, (N_VECS, em.shape[1])).astype(np.float32)
    # each sf1 vector keeps its source vector's label (the jitter stays
    # within-cluster, so the label remains meaningful for the
    # centroid-assignment arm); the planted near-copies keep their own
    labels = src_labels[idx]
    for i in range(N_VECS // 50):  # planted near-copies
        vecs[N_VECS - 1 - i] = vecs[int(rng.integers(N_VECS - N_VECS // 50))] * 1.01
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(N_VECS), pa.int64()),
                "embedding": pa.array([v.tolist() for v in vecs], pa.list_(pa.float32())),
                "label": pa.array(labels, pa.int32()),
            }
        ),
        os.path.join(OUT, "embeddings.parquet"),
    )


def probe() -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from pyspark.sql import SparkSession

    from flink_audit_sessions_example_spark.plans import QUERIES

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    keys = [
        "dedup_exact",
        "dedup_count",
        "dedup_ngram",
        "dedup_minhash",
        "dedup_simhash",
        "dedup_embed",
        "dedup_cluster",
        "decontaminate",
        "text_stats",
        "sim_topk",
        "sim_topk_lsh",
        "sim_topk_ivf",
        "cluster_profile",
        "dedup_chunk",
        "text_corpus_freq",
        "domain_mix",
        "text_quality_tiers",
        "xform_split",
        "join_fuzzy",
        "pipeline_clean_corpus",
        "rel_copurchase",
        "xform_chunk_overlap",
        "text_token_count",
        "multimodal_phash",
        "embed_quantize",
        "sample_per_group",
        "text_hashed_features",
        "multimodal_phash_pairs",
    ]
    only = [a.split("=", 1)[1] for a in sys.argv if a.startswith("--keys=")]
    if only:
        keys = [k for k in only[0].split(",") if k in keys]
    # iterative operators run their fixpoint actions during construction
    # (bench.py::ITERATIVE_QUERIES) — time construction too for those
    construction_timed = {"dedup_cluster"}
    results: dict[str, dict[str, float]] = {}
    for sf_dir, tag in ((SF01, "sf0.1"), (OUT, "sf1")):
        for key in keys:
            best = float("inf")
            for _ in range(3):
                if key in construction_timed:
                    t0 = time.perf_counter()
                    df = QUERIES[key](spark, sf_dir)
                else:
                    df = QUERIES[key](spark, sf_dir)
                    t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            results.setdefault(key, {})[tag] = best
            print(f"{tag} {key}: {best:.2f}s", flush=True)
    print("\n| query | sf0.1 (5k/2k) | sf1-style (50k/20k) | ratio | exponent |")
    print("|---|---|---|---|---|")
    for key in keys:
        a, b = results[key]["sf0.1"], results[key]["sf1"]
        import math

        print(
            f"| `{key}` | {a:.2f} s | {b:.2f} s | {b / a:.1f} | "
            f"**{math.log(b / a) / math.log(10):.2f}** |"
        )
    spark.stop()


_REQUIRED_FILES = (
    "documents.parquet",
    "embeddings.parquet",
    "part.parquet",
    "lineitem.parquet",
    "orders.parquet",
    "supplier.parquet",
    "customer.parquet",
    "nation.parquet",
    "region.parquet",
)

if __name__ == "__main__":
    # per-file check, not a bare isdir: an artifact generated before a
    # table was added to the generator must regenerate, not crash the
    # probe with PATH_NOT_FOUND
    missing = not all(
        os.path.isfile(os.path.join(OUT, f)) for f in _REQUIRED_FILES
    )
    if missing or "--regen" in sys.argv:
        print("generating sf1-style corpus ...", flush=True)
        generate()
    probe()
