"""Staged registrations — the r10+ drain of the parity-proven queue.

Every entry here is a COMPLETE driver registration (query callable +
DuckDB oracle, vacuity-checked) that is NOT yet merged into the live
registry: the driver's correctness gate covers a 50-row window and r9's
window is exactly full (48 stale + 2 new/changed), so these wait for
the slots the r10 drain plan frees (see the rotation protocol in
``plans/__init__.py``). Staging them now makes each future registration
a two-line move — and ``tests/test_staged_registrations.py`` replays
every staged pair against DuckDB at sf0.001 TODAY, so the queue cannot
rot while it waits (the r6 phantom-key lesson, applied to oracles).

Key naming follows the live registry's family prefixes; the set below
is the head of the drain-plan priority order (user-facing capabilities
first, then the r8 verdict's named r10 candidates, then the r9
additions).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import corpus as C
from ..operators import sketches as K
from ..operators import text as X
from ..operators.asof import interval_join
from ..operators.dedup import cdc_apply, latest_by_key, snapshot_diff
from ..operators.similarity import semantic_decontaminate
from ..sources.tables import load_table
from .extended import _SQL_WORDS

# --------------------------------------------------------------------------
# text_tfidf_topk
# --------------------------------------------------------------------------

TFIDF_K = 3


def q_text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``text_tfidf_topk`` — per-doc top-k characteristic terms
    (:func:`~..operators.text.tfidf_top_terms`): RAW idf ratio
    ``tf·N/df`` (rank-equivalent to log idf; three IEEE ops both
    engines round identically), 6-dp-rounded score with term tiebreak,
    WindowGroupLimit pushes the top-k below the rank exchange."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return X.tfidf_top_terms(docs, k=TFIDF_K)


_TEXT_TFIDF_ORACLE = f"""
WITH w AS (
  SELECT doc_id, unnest({_SQL_WORDS}) AS term FROM documents
), tf AS (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM w GROUP BY 1, 2
), dfreq AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS df_term FROM tf GROUP BY 1
), n AS (SELECT COUNT(*) AS nd FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, dfreq.df_term,
         ROUND(tf.tf * (CAST(n.nd AS DOUBLE) / dfreq.df_term), 6) AS score
  FROM tf JOIN dfreq USING (term) CROSS JOIN n
), ranked AS (
  SELECT *, CAST(ROW_NUMBER() OVER (
    PARTITION BY doc_id ORDER BY score DESC, term
  ) AS INTEGER) AS rank
  FROM scored
)
SELECT doc_id, term, tf, df_term, score, rank FROM ranked
WHERE rank <= {TFIDF_K}
"""

# --------------------------------------------------------------------------
# win_funnel_stages
# --------------------------------------------------------------------------

FUNNEL_STAGES = ("view", "click", "purchase")
FUNNEL_WITHIN = "1 day"


def q_win_funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``win_funnel_stages`` — ordered conversion funnel
    (:func:`~..operators.corpus.funnel_stages`): ONE exchange + ONE
    sort for any stage count via chained running-min window qualifiers;
    the oracle is the k-sequential-join formulation it is provably
    equal to. 1-day window is selective on this corpus (~60/23/17%
    completion split — non-vacuous at every tier)."""
    ev = load_table(spark, sf_dir, "events")
    return C.funnel_stages(ev, FUNNEL_STAGES, within=FUNNEL_WITHIN)


_WIN_FUNNEL_ORACLE = """
WITH s1 AS (
  SELECT user_id, MIN(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY 1
), s2 AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events e JOIN s1 USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > s1.t1
    AND e.ts <= s1.t1 + INTERVAL 1 DAY
  GROUP BY 1
), s3 AS (
  SELECT e.user_id, MIN(e.ts) AS t3
  FROM events e JOIN s2 USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > s2.t2
    AND e.ts <= s2.t2 + INTERVAL 1 DAY
  GROUP BY 1
), u AS (SELECT DISTINCT user_id FROM events)
SELECT u.user_id, s1.t1 AS reach_1, s2.t2 AS reach_2, s3.t3 AS reach_3,
       CAST((s1.t1 IS NOT NULL)::INT + (s2.t2 IS NOT NULL)::INT
            + (s3.t3 IS NOT NULL)::INT AS BIGINT) AS stages_completed
FROM u LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id)
       LEFT JOIN s3 USING (user_id)
"""

# --------------------------------------------------------------------------
# xform_cdc_apply
# --------------------------------------------------------------------------


def q_xform_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``xform_cdc_apply`` — snapshot + I/U/D changelog → post-replay
    table (:func:`~..operators.dedup.cdc_apply`): ONE
    ``max(struct(epoch, order, op, payload))`` aggregation with
    scan-side partial collapse; tombstone filter on the O(keys)
    aggregated relation. Derived relation: pre-2024-01-15 events =
    the snapshot (latest per user), later events = the changelog with
    'error' rows as deletes; every path (upsert / delete / snapshot
    passthrough) is non-vacuous on this corpus."""
    events = load_table(spark, sf_dir, "events")
    early = events.where("ts < timestamp'2024-01-15'")
    snapshot = latest_by_key(
        early,
        key_cols=["user_id"],
        order_cols=["ts", "event_id"],
        payload_cols=["value"],
    ).select("user_id", "value")
    changelog = events.where(
        "ts >= timestamp'2024-01-15' AND user_id % 3 <> 0"
    ).select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_type") == "error", "D").otherwise("U").alias(
            "op"
        ),
        "value",
    )
    return cdc_apply(
        snapshot,
        changelog,
        key_cols=["user_id"],
        order_cols=["ts", "event_id"],
        payload_cols=["value"],
    )


_XFORM_CDC_APPLY_ORACLE = """
WITH early AS (
  SELECT user_id, value FROM (
    SELECT user_id, value,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY ts DESC, event_id DESC) AS rn
    FROM events WHERE ts < TIMESTAMP '2024-01-15'
  ) WHERE rn = 1
), log AS (
  SELECT user_id, ts, event_id,
         CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
         value
  FROM events
  WHERE ts >= TIMESTAMP '2024-01-15' AND user_id % 3 <> 0
), unioned AS (
  SELECT 0 AS epoch, user_id, CAST(NULL AS TIMESTAMP) AS ts,
         CAST(NULL AS BIGINT) AS event_id, 'U' AS op, value FROM early
  UNION ALL
  SELECT 1, user_id, ts, event_id, op, value FROM log
)
SELECT user_id, ts, event_id, value FROM (
  SELECT *, row_number() OVER (
    PARTITION BY user_id
    ORDER BY epoch DESC, ts DESC NULLS LAST, event_id DESC NULLS LAST
  ) AS rn
  FROM unioned
) WHERE rn = 1 AND op <> 'D'
"""

# --------------------------------------------------------------------------
# xform_snapshot_diff
# --------------------------------------------------------------------------


def q_xform_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``xform_snapshot_diff`` — key-level dataset-version diff
    (:func:`~..operators.dedup.snapshot_diff`): one full-outer join
    over scan-side key+payload projections, member-wise null-safe
    struct compare. Derived versions make all four statuses
    non-vacuous: old = docs minus every (id%11==3) with perturbed
    n_chars on id%5==0; new = docs minus every (id%13==4)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    old = docs.where("doc_id % 11 <> 3").withColumn(
        "n_chars",
        F.when(F.col("doc_id") % 5 == 0, F.col("n_chars") + 1).otherwise(
            F.col("n_chars")
        ),
    )
    new = docs.where("doc_id % 13 <> 4")
    return snapshot_diff(
        old,
        new,
        key_cols=["doc_id"],
        payload_cols=["source", "n_chars"],
        include_unchanged=True,
    )


_XFORM_SNAPSHOT_DIFF_ORACLE = """
WITH old AS (
  SELECT doc_id, source,
         CASE WHEN doc_id % 5 = 0 THEN n_chars + 1 ELSE n_chars END AS n_chars
  FROM documents WHERE doc_id % 11 <> 3
), new AS (
  SELECT doc_id, source, n_chars FROM documents WHERE doc_id % 13 <> 4
)
SELECT
  COALESCE(o.doc_id, n.doc_id) AS doc_id,
  CASE
    WHEN o.doc_id IS NULL THEN 'added'
    WHEN n.doc_id IS NULL THEN 'removed'
    WHEN o.source IS NOT DISTINCT FROM n.source
         AND o.n_chars IS NOT DISTINCT FROM n.n_chars THEN 'unchanged'
    ELSE 'changed'
  END AS status,
  CASE WHEN n.doc_id IS NULL THEN o.source ELSE n.source END AS source,
  CASE WHEN n.doc_id IS NULL THEN o.n_chars ELSE n.n_chars END AS n_chars
FROM old o FULL OUTER JOIN new n ON o.doc_id = n.doc_id
"""

# --------------------------------------------------------------------------
# join_interval
# --------------------------------------------------------------------------

INTERVAL_BIN_WIDTH = "6 hours"


def q_join_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``join_interval`` — point-in-interval join with equi-keys
    (:func:`~..operators.asof.interval_join`): the binning rewrite
    turns the naive range predicate (BroadcastNestedLoopJoin,
    per-partition quadratic) into an equi-join on (keys, bin) + a
    residual predicate; each pair matches in exactly one bin. Error
    events become 1-day intervals, non-error events the points —
    many-to-many and non-vacuous on this corpus."""
    ev = load_table(spark, sf_dir, "events")
    iv = ev.where("event_type = 'error'").select(
        "user_id",
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr("INTERVAL 1 DAY")).alias("end_ts"),
        F.col("event_id").alias("interval_id"),
    )
    pt = ev.where("event_type <> 'error'").select(
        "user_id", "ts", "event_id"
    )
    return interval_join(
        pt,
        iv,
        on=["user_id"],
        point_ts="ts",
        start_col="start_ts",
        end_col="end_ts",
        bin_width=INTERVAL_BIN_WIDTH,
    )


_JOIN_INTERVAL_ORACLE = """
WITH iv AS (
  SELECT user_id, ts AS start_ts, ts + INTERVAL 1 DAY AS end_ts,
         event_id AS interval_id
  FROM events WHERE event_type = 'error'
), pt AS (
  SELECT user_id, ts, event_id FROM events WHERE event_type <> 'error'
)
SELECT pt.user_id, pt.ts, pt.event_id, iv.start_ts, iv.end_ts,
       iv.interval_id
FROM pt JOIN iv ON pt.user_id = iv.user_id
  AND pt.ts >= iv.start_ts AND pt.ts < iv.end_ts
"""

# --------------------------------------------------------------------------
# corpus_balanced_shards
# --------------------------------------------------------------------------

SHARDS_N, SHARDS_CELLS = 8, 16


def q_corpus_balanced_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``corpus_balanced_shards`` — budget-balanced deterministic shard
    assignment (:func:`~..operators.corpus.balanced_shards`):
    integer-exact binary-magnitude strata, md5 salt cells, per-group
    round-robin deal with md5 rotation; per-shard weight spread bounded
    by construction and SHRINKING with corpus size (measured)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "n_chars"
    )
    return C.balanced_shards(
        docs,
        key_col="doc_id",
        weight_col="n_chars",
        n_shards=SHARDS_N,
        n_cells=SHARDS_CELLS,
    )


_CORPUS_BALANCED_SHARDS_ORACLE = f"""
WITH t AS (
  SELECT doc_id, n_chars,
         length(bin(greatest(coalesce(n_chars, 0), 0) + 1)) AS stratum,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
              AS BIGINT) AS draw
  FROM documents
), c AS (
  SELECT *, draw % {SHARDS_CELLS} AS cell FROM t
), r AS (
  SELECT *,
         row_number() OVER (PARTITION BY stratum, cell
                            ORDER BY draw, doc_id) AS rk,
         CAST(('0x' || substr(md5(stratum || '|' || cell), 1, 8))
              AS BIGINT) % {SHARDS_N} AS rot
  FROM c
)
SELECT doc_id, n_chars, CAST((rk - 1 + rot) % {SHARDS_N} AS INT) AS shard
FROM r
"""

# --------------------------------------------------------------------------
# text_chunk_sentences
# --------------------------------------------------------------------------

CHUNK_BUDGET_CHARS = 400

#: The synthetic corpus has no terminal punctuation, so BOTH engines
#: punctuate identically (every 6th word) before segmenting — the
#: multi-sentence/multi-chunk path stays non-vacuous (the sentence-ops
#: test convention, now a registered derivation).
_PUNCT_SQL = (
    "regexp_replace(text, '(\\w+ \\w+ \\w+ \\w+ \\w+ \\w+) ', "
    "'\\1. ', 'g')"
)


def q_text_chunk_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``text_chunk_sentences`` — sentence-aware RAG chunking
    (:func:`~..operators.text.chunk_by_sentences`): greedy first-fit by
    running character budget, a straddling sentence belongs to the
    chunk it started in; one per-document window + chunk re-agg."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.regexp_replace(
            "text", r"(\w+ \w+ \w+ \w+ \w+ \w+) ", "$1. "
        ).alias("text"),
    )
    return X.chunk_by_sentences(docs, budget_chars=CHUNK_BUDGET_CHARS)


_TEXT_CHUNK_SENTENCES_ORACLE = rf"""
WITH s AS (
  SELECT doc_id,
         regexp_extract_all({_PUNCT_SQL}, '[^.!?]+[.!?]+|[^.!?]+$') AS arr
  FROM documents
), x AS (
  SELECT doc_id, i - 1 AS sent_idx, trim(arr[i]) AS sentence,
         length(trim(arr[i])) AS n_chars
  FROM s, UNNEST(generate_series(1, len(arr))) AS t(i)
  WHERE length(trim(arr[i])) > 0
), c AS (
  SELECT *, COALESCE(SUM(n_chars) OVER (
      PARTITION BY doc_id ORDER BY sent_idx
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
  FROM x
)
SELECT doc_id,
       CAST(floor(before / {CHUNK_BUDGET_CHARS}) AS BIGINT) AS chunk_id,
       string_agg(sentence, ' ' ORDER BY sent_idx) AS chunk_text,
       count(*) AS n_sentences, SUM(n_chars) AS n_chars
FROM c GROUP BY 1, 2
"""

# --------------------------------------------------------------------------
# decontaminate_semantic
# --------------------------------------------------------------------------

DECON_TAU = 0.98


def q_decontaminate_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``decontaminate_semantic`` — embedding-space benchmark-overlap
    gate (:func:`~..operators.similarity.semantic_decontaminate`):
    broadcast eval matrix + one Arrow BLAS pass, zero shuffle. evals =
    every 17th vector, train = the whole corpus (the realistic leak:
    the benchmark is a subset of the crawl) — every eval's identical
    twin fires at cosine 1.0, non-vacuous by construction. max_sim
    rounds to 5dp; the oracle casts to DOUBLE[] because DuckDB's
    list_cosine_similarity computes FLOAT[] inputs in float32."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    evals = emb.where("vec_id % 17 = 0")
    return semantic_decontaminate(emb, evals, threshold=DECON_TAU).select(
        "vec_id", F.round("max_sim", 5).alias("max_sim"), "n_eval_hits"
    )


_DECONTAMINATE_SEMANTIC_ORACLE = f"""
WITH ev AS (
  SELECT vec_id, embedding FROM embeddings WHERE vec_id % 17 = 0
), tr AS (
  SELECT vec_id, embedding FROM embeddings
), sims AS (
  SELECT tr.vec_id,
         list_cosine_similarity(tr.embedding::DOUBLE[],
                                ev.embedding::DOUBLE[]) AS sim
  FROM tr CROSS JOIN ev
)
SELECT vec_id, round(max(sim), 5) AS max_sim,
       count(*) FILTER (WHERE sim >= {DECON_TAU}) AS n_eval_hits
FROM sims GROUP BY vec_id HAVING max(sim) >= {DECON_TAU}
"""

# --------------------------------------------------------------------------
# text_clean
# --------------------------------------------------------------------------

#: Dirty wrapper injected around every document on BOTH engines: the
#: corpus is ASCII, so cleaning the raw text would exercise only the
#: whitespace path — a vacuously-green oracle (the r8
#: multimodal_phash_pairs lesson). The wrapper plants decomposed e+acute
#: (NFC composes), CRLF, C0/C1 controls, a zero-width space, curly
#: quotes, an em dash, NBSP, tab runs and 4-fold newlines on every row.
CLEAN_PREFIX = "  ‘q’ é\t\t"
CLEAN_SUFFIX = "\r\nx​y — z w \x01\x9f\n\n\n\nend  "


def _dirty_sql_literal(s: str) -> str:
    out = []
    for ch in s:
        if ch == "'":
            out.append("' || chr(39) || '")
        elif ord(ch) < 32 or 0x7F <= ord(ch) <= 0x9F:
            out.append(f"' || chr({ord(ch)}) || '")
        else:
            out.append(ch)
    return "'" + "".join(out) + "'"


def q_text_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``text_clean`` — corpus normalization
    (:func:`~..operators.text.clean_text`) over the documents table
    wrapped in a deterministic unicode-junk injection (see
    ``CLEAN_PREFIX``/``CLEAN_SUFFIX``): NFC, control strip, punctuation
    folding and whitespace canonicalization all hash-checked on every
    row."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    dirty = docs.select(
        "doc_id",
        F.concat(
            F.lit(CLEAN_PREFIX), F.col("text"), F.lit(CLEAN_SUFFIX)
        ).alias("text"),
    )
    return X.clean_text(dirty).select("doc_id", "clean_text")


_CLEAN_STRIP_SQL = (
    "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f-\\x9f"
    "​‌‍﻿­]"
)


def _text_clean_oracle() -> str:
    from ..operators.text import _CLEAN_FROM, _CLEAN_TO

    to_sql = "e'" + _CLEAN_TO.replace("\\", "\\\\").replace("'", "\\'") + "'"
    return f"""
WITH dirty AS (
  SELECT doc_id,
         {_dirty_sql_literal(CLEAN_PREFIX)} || text ||
         {_dirty_sql_literal(CLEAN_SUFFIX)} AS t
  FROM documents
)
SELECT doc_id,
  regexp_replace(
    regexp_replace(
      regexp_replace(
        regexp_replace(
          translate(
            regexp_replace(
              regexp_replace(nfc_normalize(t), '\\r\\n|\\r', chr(10), 'g'),
              '{_CLEAN_STRIP_SQL}', '', 'g'),
            '{_CLEAN_FROM}', {to_sql}),
          '[ \\t]+', ' ', 'g'),
        ' ?\\n ?', chr(10), 'g'),
      '\\n{{3,}}', chr(10) || chr(10), 'g'),
    '^[ \\n]+|[ \\n]+$', '', 'g') AS clean_text
FROM dirty
"""

# --------------------------------------------------------------------------
# agg_quantile_sketch
# --------------------------------------------------------------------------

QSKETCH_K = 256

_SQL_DOC_DRAW = (
    "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)"
)


def q_agg_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``agg_quantile_sketch`` — the mergeable bottom-k percentile
    sketch (:func:`~..operators.sketches.quantile_sketch_table` +
    ``quantile_sketch_estimate``), grouped by lang over documents: the
    one percentile sketch whose VALUES hash-check cross-engine
    (content-addressed draws — no engine-specific registers), so this
    registers the real estimates, not a bound check."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    sk = K.quantile_sketch_table(
        docs, "n_chars", key_col="doc_id", group_cols=["lang"], k=QSKETCH_K
    )
    return K.quantile_sketch_estimate(sk, group_cols=["lang"])


_AGG_QUANTILE_SKETCH_ORACLE = f"""
WITH sk AS (
  SELECT lang, n_chars,
         ROW_NUMBER() OVER (
           PARTITION BY lang ORDER BY {_SQL_DOC_DRAW}, doc_id, n_chars
         ) AS rn
  FROM documents
  WHERE n_chars IS NOT NULL AND doc_id IS NOT NULL
), s AS (
  SELECT lang, CAST(n_chars AS DOUBLE) AS v FROM sk WHERE rn <= {QSKETCH_K}
), a AS (
  SELECT lang, array_agg(v ORDER BY v) AS vs,
         CAST(COUNT(*) AS BIGINT) AS m
  FROM s GROUP BY lang
)
SELECT lang,
       vs[GREATEST(1, CAST(CEIL(0.25 * m) AS INT))] AS p_25,
       vs[GREATEST(1, CAST(CEIL(0.50 * m) AS INT))] AS p_50,
       vs[GREATEST(1, CAST(CEIL(0.75 * m) AS INT))] AS p_75
FROM a
"""

# --------------------------------------------------------------------------
# Staged registry (merged into the live registry as drain slots free up)
# --------------------------------------------------------------------------

STAGED_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "xform_cdc_apply": q_xform_cdc_apply,
    "xform_snapshot_diff": q_xform_snapshot_diff,
    "join_interval": q_join_interval,
    "corpus_balanced_shards": q_corpus_balanced_shards,
    "text_chunk_sentences": q_text_chunk_sentences,
    "decontaminate_semantic": q_decontaminate_semantic,
    "text_tfidf_topk": q_text_tfidf_topk,
    "win_funnel_stages": q_win_funnel_stages,
    "text_clean": q_text_clean,
    "agg_quantile_sketch": q_agg_quantile_sketch,
}

STAGED_ORACLES: dict[str, str] = {
    "xform_cdc_apply": _XFORM_CDC_APPLY_ORACLE,
    "xform_snapshot_diff": _XFORM_SNAPSHOT_DIFF_ORACLE,
    "join_interval": _JOIN_INTERVAL_ORACLE,
    "corpus_balanced_shards": _CORPUS_BALANCED_SHARDS_ORACLE,
    "text_chunk_sentences": _TEXT_CHUNK_SENTENCES_ORACLE,
    "decontaminate_semantic": _DECONTAMINATE_SEMANTIC_ORACLE,
    "text_tfidf_topk": _TEXT_TFIDF_ORACLE,
    "win_funnel_stages": _WIN_FUNNEL_ORACLE,
    "text_clean": _text_clean_oracle(),
    "agg_quantile_sketch": _AGG_QUANTILE_SKETCH_ORACLE,
}
