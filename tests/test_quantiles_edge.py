"""Interpolation-parity edge cases for ``rel_quantiles``: Spark's exact
``percentile`` and DuckDB's ``quantile_cont`` both implement the type-7
linear-interpolation estimator, but the agreement is only as good as the
floating-point op sequence — pinned here on adversarial inputs (heavy
ties, single-element groups, two-element interpolation, negative and
dyadic values) rather than just the driver's well-behaved fixtures."""

from __future__ import annotations

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from oracle_utils import normalized_rows

EDGE = pd.DataFrame(
    {
        "l_returnflag": (
            ["T"] * 7          # heavy ties
            + ["S"]            # single element
            + ["D", "D"]       # pure two-point interpolation
            + ["N"] * 5        # negatives + dyadics
        ),
        "l_extendedprice": (
            [5.0, 5.0, 5.0, 5.0, 9.0, 9.0, 1.0]
            + [42.25]
            + [1.0, 2.0]
            + [-8.5, -0.25, 0.75, 3.125, 100.0]
        ),
    }
)

SQL = """
SELECT l_returnflag,
       ROUND(quantile_cont(l_extendedprice, 0.25), 6) AS p25,
       ROUND(quantile_cont(l_extendedprice, 0.50), 6) AS p50,
       ROUND(quantile_cont(l_extendedprice, 0.75), 6) AS p75,
FROM lineitem
GROUP BY l_returnflag
"""


def test_percentile_matches_quantile_cont_on_adversarial_groups(spark):
    df = spark.createDataFrame(EDGE)
    pct = F.expr("percentile(l_extendedprice, array(0.25D, 0.5D, 0.75D))")
    got = (
        df.groupBy("l_returnflag")
        .agg(pct.alias("p"))
        .select(
            "l_returnflag",
            F.round(F.element_at("p", 1), 6).alias("p25"),
            F.round(F.element_at("p", 2), 6).alias("p50"),
            F.round(F.element_at("p", 3), 6).alias("p75"),
        )
    )
    con = duckdb.connect()
    con.register("lineitem", EDGE)
    cur = con.execute(SQL)
    cols = [d[0] for d in cur.description]
    want = normalized_rows(cols, cur.fetchall())
    have = normalized_rows(got.columns, [tuple(r) for r in got.collect()])
    assert have == want
