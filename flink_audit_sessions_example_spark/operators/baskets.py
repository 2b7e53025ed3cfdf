"""Market-basket association mining.

``association_rules`` — size-2 association rules (the Apriori-1 /
frequent-pair tier: the workhorse of recommendation seeds, "customers
who bought X", and feature co-occurrence screens) with exact support,
confidence and lift. The engine's ``rel_copurchase`` relation is the
pair-COUNT half of this; rules add the directional conditional
(confidence) and the independence-normalized strength (lift), which is
what actually ranks a pair's usefulness — raw pair counts just rank
popular items.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _pair_explode, bounded_posting_lists


def association_rules(
    baskets: DataFrame,
    *,
    basket_col: str,
    item_col: str,
    min_pair_count: int = 2,
    max_basket_size: "int | None" = 256,
) -> DataFrame:
    """Directional size-2 rules ``antecedent → consequent`` over a
    ``(basket, item)`` relation. Output ``(antecedent, consequent,
    n_pair, n_antecedent, n_consequent, support, confidence, lift)``:
    support = n_pair/N baskets, confidence = n_pair/n_antecedent, lift
    = confidence / (n_consequent/N) — all exact counting ratios, one
    IEEE division each (products computed in DOUBLE: two bigint counts
    can overflow a long multiply — the engine's long*long rule), each
    rounded to 6dp. Both directions of a pair are emitted (rules are
    directional; their confidences differ).

    Plan — the pairs-from-postings pattern (``rel_copurchase``'s
    shape), never a self-join: distinct (basket, item) collapses
    map-side; :func:`~.dedup.bounded_posting_lists` builds per-basket
    sorted item lists with the aggregation BUFFER itself capped
    (``max_basket_size`` — a degenerate everything-basket would
    otherwise be one OOM-sized buffer row); unordered pairs are emitted
    in-place from each list and counted (map-side combine); item
    supports and the basket total are two more counting aggregations,
    all broadcast back onto the pair relation. The only corpus-sized
    shuffles carry (basket, item) distinct rows and pair-count partials.
    """
    b = F.col(basket_col)
    it = F.col(item_col)
    distinct = (
        baskets.where(b.isNotNull() & it.isNotNull())
        .select(b.alias("_basket"), it.alias("_item"))
        .distinct()
    )
    n_baskets = distinct.select("_basket").distinct().agg(
        F.count(F.lit(1)).cast("bigint").alias("_n_baskets")
    )
    item_support = distinct.groupBy("_item").agg(
        F.count(F.lit(1)).cast("bigint").alias("_n_item")
    )
    # pin_keyed=True (the default) is MEASURED here, not assumed:
    # review r11b #6 proposed no-pin by analogy with q_rel_copurchase,
    # but that plan consumes the distinct subtree ONCE — this one feeds
    # it to THREE consumers (basket total, item supports, posting
    # lists), and the A/B at sf0.1 reads pin 2.32 s vs no-pin 3.51 s
    # (min-of-2, warmed): recompute-cheap stops being cheap at three
    # recomputes.
    lists = bounded_posting_lists(
        distinct,
        ["_basket"],
        "_item",
        max_size=max_basket_size,
        min_size=2,
    )
    # in-place unordered pair emission from the sorted list (i < j) —
    # ONE definition engine-wide (dedup._pair_explode, review r11b #5)
    pairs = lists.select(
        F.explode(_pair_explode()).alias("_p")
    ).select(F.col("_p.id_a").alias("_a"), F.col("_p.id_b").alias("_b"))
    pair_counts = (
        pairs.groupBy("_a", "_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pair"))
        .where(F.col("n_pair") >= min_pair_count)
    )
    # directional: each unordered pair yields both rules. Emitted with
    # ONE explode instead of a self-union (r15): the union form put two
    # logical references on the pair-count subtree — exchange reuse
    # dedups the shuffle, but the post-shuffle aggregation + filter ran
    # once per branch and the plan carried the whole upstream twice.
    directed = pair_counts.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("_a").alias("antecedent"),
                    F.col("_b").alias("consequent"),
                ),
                F.struct(
                    F.col("_b").alias("antecedent"),
                    F.col("_a").alias("consequent"),
                ),
            )
        ).alias("_r"),
        "n_pair",
    ).select("_r.antecedent", "_r.consequent", "n_pair")
    ante = item_support.select(
        F.col("_item").alias("antecedent"),
        F.col("_n_item").alias("n_antecedent"),
    )
    cons = item_support.select(
        F.col("_item").alias("consequent"),
        F.col("_n_item").alias("n_consequent"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    return (
        directed.join(F.broadcast(ante), "antecedent")
        .join(F.broadcast(cons), "consequent")
        .crossJoin(F.broadcast(n_baskets))
        .select(
            "antecedent",
            "consequent",
            "n_pair",
            "n_antecedent",
            "n_consequent",
            F.round(d("n_pair") / d("_n_baskets"), 6).alias("support"),
            F.round(d("n_pair") / d("n_antecedent"), 6).alias("confidence"),
            F.round(
                (d("n_pair") * d("_n_baskets"))
                / (d("n_antecedent") * d("n_consequent")),
                6,
            ).alias("lift"),
        )
    )
