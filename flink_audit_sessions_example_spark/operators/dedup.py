"""Deduplication operators — exact and near-dup, designed for 100 TB.

Scale design notes (these choices are the point of the module):

- **Exact dedup** is a hash aggregation on the dedup key — one shuffle,
  map-side partial aggregation, no sort. Keeping ``min(id)`` per group (not
  ``dropDuplicates``) makes the survivor deterministic, which the oracle
  needs and production pipelines want anyway.
- **N-gram Jaccard** uses an *inverted-index join* (explode shingles, join
  on shingle, count common) — never an O(n²) cross join. The join key is
  the shingle, so extremely common shingles create skew; the standard
  mitigation (drop shingles whose document frequency exceeds a cap —
  they can only connect near-identical boilerplate) is built in.
- **MinHash + LSH banding** is the sub-quadratic scale path: H hash
  minima per doc → b bands of r rows → exact-match join on (band, band
  signature) buckets → candidate pairs → exact Jaccard verification of
  candidates only. All built-in expressions (xxhash64), one explode + one
  self-join on the band key.
- **SimHash** packs a document into one 32-bit fingerprint whose hamming
  distance approximates cosine similarity of the token sets; near-dup
  candidates come from exact-match joins on fingerprint bands (Manku et
  al., WWW'07 style). Bit arithmetic over md5 hex digits — chosen over
  murmur3 because md5 is identically available in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import shingle_rows, _words

# --------------------------------------------------------------------------
# Exact dedup
# --------------------------------------------------------------------------


def exact_dedup(
    df: DataFrame, key_cols: list[str], id_col: str
) -> DataFrame:
    """``dedup_exact`` — deterministic exact deduplication.

    Keeps the row with the minimum ``id_col`` per distinct ``key_cols``
    group. One hash-shuffle on the key; Catalyst plans partial + final
    aggregation so the map side already collapses local duplicates —
    at 100 TB the shuffle carries one row per distinct key per task,
    not one per input row.
    """
    return df.groupBy(*key_cols).agg(F.min(id_col).alias(id_col))


def distinct_count(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """Cardinality-after-dedup per key — the cheap pre-pass that sizes a
    dedup job (exact ``count_distinct``; swap in
    ``approx_count_distinct`` when ±2% suffices at scale)."""
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_distinct(*[F.col(c) for c in key_cols]).alias("n_distinct"),
    )


# --------------------------------------------------------------------------
# N-gram Jaccard near-dup (exact, inverted index)
# --------------------------------------------------------------------------


def ngram_jaccard_pairs(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.5,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """``dedup_ngram`` — all pairs with word-``k``-shingle Jaccard ≥
    ``threshold``, computed exactly via an inverted index.

    Plan: explode distinct shingles (hashed to 8-byte ``xxhash64`` keys —
    identical counts at ~2⁻⁶⁴ collision odds, a fraction of the shuffle
    bytes) → ONE ``groupBy(shingle)`` building each shingle's sorted
    posting list → emit its id pairs in place (no self-join; the classic
    pairs-from-postings shape) → count common shingles per pair. The
    per-doc sizes branch consumes the SAME shingle exchange (Catalyst
    ``ReusedExchange``), so the Python tokenizer runs once, not three
    times as in the self-join formulation.

    Skew guard: ``max_shingle_df`` drops posting lists longer than the cap
    *before* the quadratic pair explode — a shingle shared by millions of
    docs would otherwise emit ~10¹² pairs from one row; such boilerplate
    shingles only connect near-identical docs that their rarer shingles
    connect anyway. Set it at corpus scale.

    Output: ``(id_a, id_b, jaccard)`` with ``id_a < id_b``.
    """
    shingled = shingle_rows(df, id_col=id_col, text_col=text_col, k=k).select(
        "id", F.xxhash64("sh").alias("shingle")
    )
    postings = shingled.groupBy("shingle").agg(
        F.sort_array(F.collect_list("id")).alias("ids")
    )
    sizes = (
        postings.select(F.explode("ids").alias("id"))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    paired = postings.where(F.size("ids") >= 2)
    if max_shingle_df is not None:
        paired = paired.where(F.size("ids") <= max_shingle_df)
    # all (ids[i], ids[j]) with i < j; lists are sorted so id_a < id_b
    pair_expr = F.flatten(
        F.transform(
            "ids",
            lambda x, i: F.transform(
                F.slice(F.col("ids"), i + 2, F.size("ids")),
                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
            ),
        )
    )
    common = (
        paired.select(F.explode(pair_expr).alias("p"))
        .groupBy(F.col("p.id_a").alias("id_a"), F.col("p.id_b").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("common"))
    )
    return (
        common.join(sizes.withColumnsRenamed({"id": "id_a", "n": "n_a"}), "id_a")
        .join(sizes.withColumnsRenamed({"id": "id_b", "n": "n_b"}), "id_b")
        .withColumn(
            "jaccard",
            F.col("common")
            / (F.col("n_a") + F.col("n_b") - F.col("common")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


# --------------------------------------------------------------------------
# MinHash + LSH banding (sub-quadratic scale path)
# --------------------------------------------------------------------------


def minhash_signatures(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    num_hashes: int = 64,
) -> DataFrame:
    """MinHash signature per document: for each of ``num_hashes`` hash
    functions, the minimum ``xxhash64(shingle, seed_i)`` over the
    document's shingle set. One narrow projection — the signature is
    64·8 bytes regardless of document size, which is what makes the
    LSH join's shuffle volume independent of text length.
    """
    # Explode shingles to rows and compute the minima as ``num_hashes``
    # plain min() aggregations: every xxhash64 is then a whole-stage-codegen
    # projection (array higher-order functions are interpreted per element —
    # observed ~4× slower), and the map-side partial aggregation collapses
    # each task to one row per doc before the shuffle.
    shingled = shingle_rows(df, id_col=id_col, text_col=text_col, k=k)
    mins = shingled.withColumnRenamed("sh", "shingle").groupBy("id").agg(
        *[
            F.min(F.xxhash64(F.col("shingle"), F.lit(i))).alias(f"h{i}")
            for i in range(num_hashes)
        ]
    )
    return mins.select(
        "id", F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("sig")
    )


def lsh_candidate_pairs(
    signatures: DataFrame, *, bands: int, rows_per_band: int
) -> DataFrame:
    """LSH banding: docs agreeing on all ``rows_per_band`` minima of any
    band become a candidate pair. Band key = (band index, hash of the
    band's slice), so the self-join is an exact-match equi-join on a
    short key — shuffle volume O(docs · bands), never O(n²).
    """
    banded = signatures.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            F.concat_ws(
                                ",",
                                *[
                                    F.element_at("sig", b * rows_per_band + r + 1)
                                    for r in range(rows_per_band)
                                ],
                            )
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select("id", "bk.band", "bk.bucket")
    return (
        banded.alias("a")
        .join(
            banded.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def minhash_near_dup_pairs(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
) -> DataFrame:
    """``dedup_minhash`` — end-to-end near-dup detection: MinHash → LSH
    candidates → exact Jaccard verification *of candidates only*.

    With b=16, r=4 the candidate-recall S-curve crosses ~0.5 probability
    at s ≈ (1/b)^(1/r) ≈ 0.5, matching the default threshold; the exact
    verification then removes false positives, so precision is 1.0 and
    only recall is probabilistic (tunable via bands).
    """
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(
        df, id_col=id_col, text_col=text_col, k=k, num_hashes=num_hashes
    )
    candidates = lsh_candidate_pairs(
        sigs, bands=bands, rows_per_band=rows_per_band
    )
    shingled = shingle_rows(df, id_col=id_col, text_col=text_col, k=k).select(
        "id", F.xxhash64("sh").alias("shingle")
    )
    sizes = shingled.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
    common = (
        candidates.join(
            shingled.withColumnsRenamed({"id": "id_a", "shingle": "s_a"}), "id_a"
        )
        .join(
            shingled.withColumnsRenamed({"id": "id_b", "shingle": "s_b"}), "id_b"
        )
        .where(F.col("s_a") == F.col("s_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    return (
        common.join(sizes.withColumnsRenamed({"id": "id_a", "n": "n_a"}), "id_a")
        .join(sizes.withColumnsRenamed({"id": "id_b", "n": "n_b"}), "id_b")
        .withColumn(
            "jaccard",
            F.col("common") / (F.col("n_a") + F.col("n_b") - F.col("common")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------

SIMHASH_BITS = 32


def _md5_hex_digit_value(tok: Column, pos: int) -> Column:
    """Value 0–15 of the ``pos``-th (1-indexed) hex digit of md5(token)."""
    return (
        F.instr(F.lit("0123456789abcdef"), F.substring(F.md5(tok), pos, 1)) - 1
    )


def simhash(df: DataFrame, *, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """``dedup_simhash`` — 32-bit SimHash fingerprint per document.

    For each bit j: sum over distinct tokens of (2·bit_j(md5(token)) − 1);
    fingerprint bit j = (sum > 0). Documents within small hamming distance
    are near-dup candidates. md5-hex bit extraction (not murmur3) keeps
    the computation reproducible in the DuckDB oracle.

    Implementation is a single explode → aggregate: 32 conditional sums in
    one hash aggregation, shuffle keyed by doc id.
    """
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(_words(F.col(text_col)))).alias("tok"),
    )
    bit_sums = []
    for j in range(SIMHASH_BITS):
        digit = _md5_hex_digit_value(F.col("tok"), j // 4 + 1)
        bit = F.floor(digit / F.pow(F.lit(2), F.lit(j % 4))).cast("int") % 2
        bit_sums.append(F.sum(bit * 2 - 1).alias(f"s{j}"))
    sums = toks.groupBy("id").agg(*bit_sums)
    fp = None
    for j in range(SIMHASH_BITS):
        term = F.when(F.col(f"s{j}") > 0, F.lit(2**j)).otherwise(F.lit(0))
        fp = term if fp is None else fp + term
    return sums.select("id", fp.cast("bigint").alias("simhash"))


def simhash_candidate_pairs(
    fingerprints: DataFrame, *, bands: int = 4
) -> DataFrame:
    """Near-dup candidates: split the 32-bit fingerprint into ``bands``
    byte-blocks; docs sharing any block value are candidates (hamming
    distance < bands guarantees at least one identical block — the
    pigeonhole rotation trick). Equi-join per block, union, distinct.
    """
    width = SIMHASH_BITS // bands
    mask = (1 << width) - 1
    blocks = fingerprints.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("block"),
                        (
                            F.shiftright(F.col("simhash"), b * width)
                            .bitwiseAND(F.lit(mask))
                        ).alias("val"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select("id", "bk.block", "bk.val")
    return (
        blocks.alias("a")
        .join(
            blocks.alias("b"),
            (F.col("a.block") == F.col("b.block"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
