"""Staged registrations for the r25 window — the remaining TPC-H
multi-join star shapes, queued per the staging protocol that drained
green in r10–r14: ``tests/test_staged_r25.py`` replays every
(query, oracle) pair with hash parity + non-vacuity on every suite
run, so the queue cannot rot while it waits.

Families (r13 verdict #4/#6 — the TPC-H sweep's last gaps): Q5 local
supplier volume (the canonical 6-table star with the
customer-nation = supplier-nation co-location predicate), Q7 shipping
volume between nation pairs (the two-role dimension join — nation
aliased twice), Q9 product-line profit by nation × year (this
catalog has no ``partsupp``, so supply cost is proxied by
``p_retailprice × quantity`` — the JOIN SHAPE, a 4-table star over a
name-filtered part slice, is the Q9 content), Q12 late-shipment
priority counts (no ``l_shipmode``/``l_commitdate`` here either, so
the Q12 conditional-count aggregation runs over ship-DELAY bands —
``l_shipdate − o_orderdate`` — instead of ship modes), and Q15 top
supplier by quarterly revenue (the view + global-argmax shape,
ties-kept exactly as the spec demands).

Every money figure uses the exact cent-scaled BIGINT path
(``_cents`` — SCALING.md "Exact-integer money math"), so sums are
order-independent and hash-stable by construction.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .extended import _cents

# --------------------------------------------------------------------------
# rel_local_volume — the TPC-H Q5 shape
# --------------------------------------------------------------------------

#: Q5 parameters adapted to this catalog's domains: the region and a
#: multi-year order-date window (the synthetic orders span 1995–2001;
#: TPC-H's single year is too thin at sf0.001 for a non-vacuous gate).
Q5_REGION = "ASIA"
Q5_DATE_LO = "1995-01-01"
Q5_DATE_HI = "2000-01-01"


def q_rel_local_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``rel_local_volume`` — the TPC-H Q5 shape: revenue from orders
    where the CUSTOMER and the line's SUPPLIER sit in the same nation
    of one region, per nation. The 6-table star: lineitem ⨝ orders ⨝
    customer ⨝ supplier ⨝ nation ⨝ region, with the co-location
    predicate ``s_nationkey = c_nationkey`` folded into the supplier
    join.

    100 TB plan: ONE big-big shuffle (lineitem ⨝ orders on orderkey,
    the date window pushed to the orders scan); customer joins on
    custkey hint-free (AQE broadcasts the filtered slice when small);
    supplier/nation/region are broadcast dims — region's filter
    PRUNES nation and supplier before the fact table sees them, so
    non-Q5-region rows die at the cheapest join, not in the aggregate.
    Revenue sums as exact cent-scaled BIGINT (4-decimal product),
    divided once at the end — order-independent, hash-stable."""
    li = load_table(spark, sf_dir, "lineitem", spread=False)
    orders = load_table(spark, sf_dir, "orders", spread=False).where(
        (F.col("o_orderdate") >= F.lit(Q5_DATE_LO))
        & (F.col("o_orderdate") < F.lit(Q5_DATE_HI))
    )
    cust = load_table(spark, sf_dir, "customer", spread=False)
    supp = load_table(spark, sf_dir, "supplier", spread=False)
    nation = load_table(spark, sf_dir, "nation", spread=False)
    region = load_table(spark, sf_dir, "region", spread=False).where(
        F.col("r_name") == Q5_REGION
    )
    cdisc = F.round(F.col("l_discount") * 100).cast("bigint")
    rev4 = _cents("l_extendedprice") * (F.lit(100) - cdisc)
    return (
        li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(
            F.broadcast(supp),
            (F.col("s_suppkey") == F.col("l_suppkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
        .join(
            F.broadcast(nation),
            F.col("n_nationkey") == F.col("s_nationkey"),
        )
        .join(
            F.broadcast(region),
            F.col("r_regionkey") == F.col("n_regionkey"),
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.round(F.sum(rev4) / F.lit(10000.0), 6).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


_REL_LOCAL_VOLUME_ORACLE = f"""
SELECT n.n_name AS nation,
       ROUND(SUM(
         CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
         * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT))
       ) / 10000.0, 6) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
              AND s.s_nationkey = c.c_nationkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
WHERE r.r_name = '{Q5_REGION}'
  AND o.o_orderdate >= TIMESTAMP '{Q5_DATE_LO}'
  AND o.o_orderdate < TIMESTAMP '{Q5_DATE_HI}'
GROUP BY 1
"""

# --------------------------------------------------------------------------
# rel_shipping_volume — the TPC-H Q7 shape
# --------------------------------------------------------------------------

#: The two trading nations (Q7's NATION1/NATION2 parameter pair) —
#: both directions of flow are reported, exactly as the spec demands.
Q7_NATION_A = "NATION_12"
Q7_NATION_B = "NATION_13"


def q_rel_shipping_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``rel_shipping_volume`` — the TPC-H Q7 shape: revenue shipped
    between two nations (supplier nation ≠ customer nation, both
    directions), per (supp_nation, cust_nation, ship year). The
    two-role dimension join: nation participates TWICE under different
    aliases — once through supplier, once through customer.

    100 TB plan: the nation pair filter pushes into BOTH broadcast
    dimension joins (each nation slice is 1 row), which in turn
    SEMI-filters supplier and customer before the fact joins — the
    big-big lineitem ⨝ orders shuffle only carries rows that can
    still match. Year extraction is scan-side; exact cent math."""
    li = load_table(spark, sf_dir, "lineitem", spread=False)
    orders = load_table(spark, sf_dir, "orders", spread=False)
    cust = load_table(spark, sf_dir, "customer", spread=False)
    supp = load_table(spark, sf_dir, "supplier", spread=False)
    nation = load_table(spark, sf_dir, "nation", spread=False)
    ns = nation.select(
        F.col("n_nationkey").alias("_ns_key"),
        F.col("n_name").alias("supp_nation"),
    ).where(F.col("supp_nation").isin(Q7_NATION_A, Q7_NATION_B))
    nc = nation.select(
        F.col("n_nationkey").alias("_nc_key"),
        F.col("n_name").alias("cust_nation"),
    ).where(F.col("cust_nation").isin(Q7_NATION_A, Q7_NATION_B))
    cdisc = F.round(F.col("l_discount") * 100).cast("bigint")
    rev4 = _cents("l_extendedprice") * (F.lit(100) - cdisc)
    return (
        li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(
            F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey")
        )
        .join(F.broadcast(ns), F.col("_ns_key") == F.col("s_nationkey"))
        .join(F.broadcast(nc), F.col("_nc_key") == F.col("c_nationkey"))
        .where(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("ship_year"),
        )
        .agg(F.round(F.sum(rev4) / F.lit(10000.0), 6).alias("revenue"))
    )


_REL_SHIPPING_VOLUME_ORACLE = f"""
SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
       CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS ship_year,
       ROUND(SUM(
         CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
         * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT))
       ) / 10000.0, 6) AS revenue
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation ns ON ns.n_nationkey = s.s_nationkey
JOIN nation nc ON nc.n_nationkey = c.c_nationkey
WHERE ns.n_name IN ('{Q7_NATION_A}', '{Q7_NATION_B}')
  AND nc.n_name IN ('{Q7_NATION_A}', '{Q7_NATION_B}')
  AND ns.n_name <> nc.n_name
GROUP BY 1, 2, 3
"""

# --------------------------------------------------------------------------
# rel_product_profit — the TPC-H Q9 shape
# --------------------------------------------------------------------------

#: Q9's part-name filter, adapted to this catalog's name vocabulary.
Q9_PART_WORD = "widget"


def q_rel_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``rel_product_profit`` — the TPC-H Q9 shape: profit on a
    name-filtered product line, per supplier nation × order year.
    This catalog has no ``partsupp``, so supply cost is proxied by
    ``p_retailprice × l_quantity`` (the reference semantics —
    ``ps_supplycost × l_quantity`` — with the only cost column the
    catalog carries); the Q9 CONTENT is the 4-table star over a
    LIKE-filtered part slice with a signed profit aggregate, and that
    is preserved exactly.

    100 TB plan: the part name filter prunes the broadcast build side
    to a slice BEFORE the fact join (an inner broadcast join IS the
    semi-filter on lineitem); orders joins big-big on orderkey for the
    year column; supplier/nation broadcast. Profit accumulates as the
    exact 4-decimal cent-scaled BIGINT difference
    ``rev4 − cost4`` — quantity is a whole-unit count here, so
    ``cents(p_retailprice) × 100 × qty`` is the lossless 4-decimal
    cost — summed order-independently, divided once."""
    li = load_table(spark, sf_dir, "lineitem", spread=False)
    orders = load_table(spark, sf_dir, "orders", spread=False)
    part = load_table(spark, sf_dir, "part", spread=False).where(
        F.col("p_name").contains(Q9_PART_WORD)
    )
    supp = load_table(spark, sf_dir, "supplier", spread=False)
    nation = load_table(spark, sf_dir, "nation", spread=False)
    cdisc = F.round(F.col("l_discount") * 100).cast("bigint")
    rev4 = _cents("l_extendedprice") * (F.lit(100) - cdisc)
    qty = F.round(F.col("l_quantity")).cast("bigint")
    cost4 = _cents("p_retailprice") * F.lit(100) * qty
    return (
        li.join(
            F.broadcast(part), F.col("p_partkey") == F.col("l_partkey")
        )
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(
            F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey")
        )
        .join(
            F.broadcast(nation),
            F.col("n_nationkey") == F.col("s_nationkey"),
        )
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("order_year"),
        )
        .agg(
            F.round(F.sum(rev4 - cost4) / F.lit(10000.0), 6).alias(
                "profit"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


_REL_PRODUCT_PROFIT_ORACLE = f"""
SELECT n.n_name AS nation,
       CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS order_year,
       ROUND(SUM(
         CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
         * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT))
         - CAST(ROUND(p.p_retailprice * 100) AS BIGINT) * 100
           * CAST(ROUND(l.l_quantity) AS BIGINT)
       ) / 10000.0, 6) AS profit,
       COUNT(*) AS n_lines
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE p.p_name LIKE '%{Q9_PART_WORD}%'
GROUP BY 1, 2
"""

# --------------------------------------------------------------------------
# rel_shipdelay_priority — the TPC-H Q12 shape
# --------------------------------------------------------------------------

#: Ship-delay bands (days between order and ship date) standing in for
#: Q12's ship modes — this catalog has no ``l_shipmode`` or commit /
#: receipt dates, and the synthetic lineitem↔orders pairing makes the
#: delay span negative values too, so the bands cover the full line.
Q12_BANDS = (
    ("early", "d < 0"),
    ("on_time", "d >= 0 AND d <= 365"),
    ("late", "d > 365"),
)
#: Q12's "urgent" priority class.
Q12_URGENT = ("1-URGENT", "2-HIGH")


def q_rel_shipdelay_priority(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """``rel_shipdelay_priority`` — the TPC-H Q12 shape: per
    ship-delay band (standing in for ship mode — see ``Q12_BANDS``),
    how many lines belong to URGENT/HIGH-priority orders vs the rest.
    The Q12 content — a fact⨝fact join feeding a CASE-conditional
    two-way count per category — is preserved exactly.

    100 TB plan: one big-big lineitem ⨝ orders shuffle on orderkey
    (both scans column-pruned to 2–3 columns); the band and the
    priority test are scan/join-side expressions, and the conditional
    counts collapse map-side to O(bands) rows. All-integer output —
    hash-stable with no rounding anywhere."""
    li = load_table(spark, sf_dir, "lineitem", spread=False)
    orders = load_table(spark, sf_dir, "orders", spread=False)
    j = li.join(orders, F.col("o_orderkey") == F.col("l_orderkey")).select(
        F.datediff(F.col("l_shipdate"), F.col("o_orderdate")).alias("d"),
        F.col("o_orderpriority").isin(*Q12_URGENT).alias("_urgent"),
    )
    band = F.coalesce(
        *[
            F.when(F.expr(pred), F.lit(name))
            for name, pred in Q12_BANDS
        ]
    )
    return (
        j.select(band.alias("delay_band"), "_urgent")
        .groupBy("delay_band")
        .agg(
            F.sum(F.when(F.col("_urgent"), 1).otherwise(0))
            .cast("bigint")
            .alias("urgent_lines"),
            F.sum(F.when(F.col("_urgent"), 0).otherwise(1))
            .cast("bigint")
            .alias("other_lines"),
        )
    )


def _q12_oracle() -> str:
    band = " ".join(
        f"WHEN {pred} THEN '{name}'" for name, pred in Q12_BANDS
    )
    urgent = ", ".join(f"'{p}'" for p in Q12_URGENT)
    return f"""
WITH j AS (
  SELECT date_diff('day', o.o_orderdate, l.l_shipdate) AS d,
         o.o_orderpriority IN ({urgent}) AS urgent
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
)
SELECT CASE {band} END AS delay_band,
       CAST(SUM(CASE WHEN urgent THEN 1 ELSE 0 END) AS BIGINT)
         AS urgent_lines,
       CAST(SUM(CASE WHEN urgent THEN 0 ELSE 1 END) AS BIGINT)
         AS other_lines
FROM j
GROUP BY 1
"""


_REL_SHIPDELAY_PRIORITY_ORACLE = _q12_oracle()

# --------------------------------------------------------------------------
# rel_top_supplier — the TPC-H Q15 shape
# --------------------------------------------------------------------------

#: Q15's quarter window over the ship date.
Q15_DATE_LO = "1996-01-01"
Q15_DATE_HI = "1996-04-01"


def q_rel_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``rel_top_supplier`` — the TPC-H Q15 shape: the revenue "view"
    (per-supplier revenue over one quarter of ship dates) joined back
    against its own global maximum; every supplier AT the maximum is
    reported (Q15 keeps ties — the argmax is a filter, not a LIMIT 1).

    100 TB plan: the quarter filter is a parquet scan predicate; the
    view collapses map-side to O(suppliers) exact-BIGINT rows; the
    global max is a 1-row broadcast joined back (no second scan of
    the fact table, no global sort); supplier attaches broadcast.
    The emitted revenue divides the exact cent sum once."""
    li = load_table(spark, sf_dir, "lineitem", spread=False).where(
        (F.col("l_shipdate") >= F.lit(Q15_DATE_LO))
        & (F.col("l_shipdate") < F.lit(Q15_DATE_HI))
    )
    supp = load_table(spark, sf_dir, "supplier", spread=False)
    cdisc = F.round(F.col("l_discount") * 100).cast("bigint")
    rev4 = _cents("l_extendedprice") * (F.lit(100) - cdisc)
    view = li.groupBy("l_suppkey").agg(F.sum(rev4).alias("_r4"))
    mx = view.agg(F.max("_r4").alias("_mx"))
    return (
        view.join(F.broadcast(mx), F.col("_r4") == F.col("_mx"))
        .join(
            F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey")
        )
        .select(
            F.col("s_suppkey").alias("suppkey"),
            F.col("s_name").alias("supp_name"),
            F.round(F.col("_r4") / F.lit(10000.0), 6).alias(
                "total_revenue"
            ),
        )
    )


_REL_TOP_SUPPLIER_ORACLE = f"""
WITH view AS (
  SELECT l_suppkey,
         SUM(
           CAST(ROUND(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))
         ) AS r4
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{Q15_DATE_LO}'
    AND l_shipdate < TIMESTAMP '{Q15_DATE_HI}'
  GROUP BY 1
)
SELECT s.s_suppkey AS suppkey, s.s_name AS supp_name,
       ROUND(v.r4 / 10000.0, 6) AS total_revenue
FROM view v
JOIN supplier s ON s.s_suppkey = v.l_suppkey
WHERE v.r4 = (SELECT MAX(r4) FROM view)
"""

# --------------------------------------------------------------------------

STAGED_R25_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "rel_local_volume": q_rel_local_volume,
    "rel_shipping_volume": q_rel_shipping_volume,
    "rel_product_profit": q_rel_product_profit,
    "rel_shipdelay_priority": q_rel_shipdelay_priority,
    "rel_top_supplier": q_rel_top_supplier,
}

STAGED_R25_ORACLES: dict[str, str] = {
    "rel_local_volume": _REL_LOCAL_VOLUME_ORACLE,
    "rel_shipping_volume": _REL_SHIPPING_VOLUME_ORACLE,
    "rel_product_profit": _REL_PRODUCT_PROFIT_ORACLE,
    "rel_shipdelay_priority": _REL_SHIPDELAY_PRIORITY_ORACLE,
    "rel_top_supplier": _REL_TOP_SUPPLIER_ORACLE,
}
