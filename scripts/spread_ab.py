"""A/B the load_table scan-spread default for documents/embeddings consumers.

Times each candidate registered query at sf0.1 with the compute-heavy
scan-spread ON (current default) vs OFF (patch _COMPUTE_HEAVY to empty),
best-of-2 per setting, interleaved to damp JIT/page-cache drift.
"""
import json
import sys
import time

from pyspark.sql import SparkSession

sys.path.insert(0, "/root/repo")
from flink_audit_sessions_example_spark.sources import tables
from flink_audit_sessions_example_spark.plans import QUERIES

SF_DIR = "/root/testdata/sf0.1"

CANDIDATES = [
    "dedup_embed", "pack_sequences", "cluster_profile", "sample_stratified",
    "decontaminate", "text_stats", "text_langid", "text_quality",
    "text_fingerprint", "text_repetition", "text_pii_scrub",
    "multimodal_meta", "multimodal_decode", "multimodal_resize",
    "multimodal_frames", "pipeline_clean_corpus", "dedup_ngram",
    "dedup_cluster", "dedup_minhash", "dedup_simhash",
    "sim_topk_ivf", "sim_topk_lsh",
]

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.driver.memory", "24g")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

# warm the Arrow worker pool once (same trick as bench.py)
import pyspark.sql.functions as F
spark.range(64).repartition(32).select(
    F.pandas_udf(lambda s: s, "long")("id")
).count()

HEAVY = tables._COMPUTE_HEAVY


def run_once(name):
    QUERIES[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()


def timed(name):
    t = time.time()
    run_once(name)
    return time.time() - t


results = {}
for name in CANDIDATES:
    if name not in QUERIES:
        continue
    res = {"on": [], "off": []}
    for _ in range(2):
        for setting in ("on", "off"):
            tables._COMPUTE_HEAVY = HEAVY if setting == "on" else ()
            res[setting].append(timed(name))
    results[name] = {
        "on": round(min(res["on"]), 3),
        "off": round(min(res["off"]), 3),
        "ratio_off_over_on": round(min(res["off"]) / min(res["on"]), 2),
    }
    print(json.dumps({name: results[name]}), flush=True)

tables._COMPUTE_HEAVY = HEAVY
print("==== SUMMARY ====")
print(json.dumps(results, indent=1))
spark.stop()
