"""Preference queries: the 2-D skyline (Pareto frontier) operator —
"orders no other order beats on BOTH total price and recency". A
capability extension (SURVEY.md §2l): the reference has no preference
operator, and Spark has no SKYLINE keyword, so this shows the engine
expressing a non-relational query class with relational building
blocks.

Scale design — the naive formulation is a quadratic NOT EXISTS
self-join (the oracle uses exactly that, fine at gate scale, fatal at
100 TB). The distributed form decomposes dominance by PRICE BAND
(``floor(price / W)``):

1. rows in a strictly higher band always have strictly higher price,
   so their entire dominance effect collapses to ONE number per band —
   the prefix-max order date over higher bands (a ~#bands-row window,
   broadcast back);
2. rows in a lower band can never dominate (their price is strictly
   lower);
3. only SAME-band rows need the pairwise check — an equi-join on the
   band key whose cost is sum(band_size^2), bounded by the band width
   the same way every dedup candidate generator here caps its buckets.

Both halves are hash joins + tiny windows; no global-window partition,
no cartesian product. At 100 TB, narrow W (or split hot bands on a
salt) until bands fit the executor budget — result values are
invariant to W.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import register
from ..tables import load_table

_SKY_BAND_WIDTH = 10_000.0  # ~60 bands over the fixture's price range


@register(
    "skyline_orders_price_date",
    oracle="""
    SELECT a.o_orderkey, a.o_totalprice, a.o_orderdate
    FROM orders a
    WHERE NOT EXISTS (
      SELECT 1 FROM orders b
      WHERE b.o_totalprice >= a.o_totalprice
        AND b.o_orderdate  >= a.o_orderdate
        AND (b.o_totalprice > a.o_totalprice
             OR b.o_orderdate > a.o_orderdate)
    )
    ORDER BY a.o_totalprice DESC, a.o_orderkey
    """,
)
def skyline_orders_price_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline: orders not dominated on (o_totalprice, o_orderdate)
    — no other order is >= on both dimensions and > on at least one.
    Banded decomposition (see module docstring) replaces the oracle's
    quadratic NOT EXISTS with a broadcast prefix-max + an in-band
    equi-join; every comparison is exact (double/timestamp), so the
    result is value-identical to the naive form for any band width.
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_totalprice",
        "o_orderdate",
        F.floor(F.col("o_totalprice") / F.lit(_SKY_BAND_WIDTH)).alias("band"),
    )

    # (1) dominance from strictly higher bands: prefix-max date.
    # The window runs over #bands rows (~60), not over the data.
    band_max = o.groupBy("band").agg(F.max("o_orderdate").alias("bmax"))
    w_higher = Window.orderBy(F.desc("band")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    higher = band_max.select(
        "band", F.max("bmax").over(w_higher).alias("higher_max_date")
    )

    # (3) same-band pairwise dominance: equi-join on band only.
    rival = o.select(
        F.col("band").alias("r_band"),
        F.col("o_orderkey").alias("r_key"),
        F.col("o_totalprice").alias("r_price"),
        F.col("o_orderdate").alias("r_date"),
    )
    dominated_in_band = (
        o.join(rival, o["band"] == rival["r_band"])
        .filter(
            (F.col("r_price") >= F.col("o_totalprice"))
            & (F.col("r_date") >= F.col("o_orderdate"))
            & (
                (F.col("r_price") > F.col("o_totalprice"))
                | (F.col("r_date") > F.col("o_orderdate"))
            )
        )
        .select(F.col("o_orderkey").alias("dom_key"))
        .distinct()
    )

    return (
        o.join(F.broadcast(higher), "band", "left")
        .filter(
            F.col("higher_max_date").isNull()
            | (F.col("higher_max_date") < F.col("o_orderdate"))
        )
        .join(
            dominated_in_band,
            F.col("o_orderkey") == F.col("dom_key"),
            "left_anti",
        )
        .select("o_orderkey", "o_totalprice", "o_orderdate")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    )
