"""Remaining TPC-H query patterns (Q2, Q9, Q11, Q12, Q16, Q21), adapted
to the reduced test schema, completing the 22-query pattern suite.

The reference engine has no analytics surface at all (SURVEY.md §2c/§2d:
"None implemented"); these exist to prove the full decorrelation /
multi-join vocabulary on Spark. The testdata schema omits ``partsupp``
and lineitem's commit/receipt dates and shipmode, so each query keeps
its defining PLAN SHAPE while substituting available columns:

- Q2  — correlated per-group MIN subquery, decorrelated to an
        aggregate joined back on exact equality. ``partsupp`` is
        replaced by the distinct (part, supplier) relation derived from
        lineitem with ``min(l_extendedprice / l_quantity)`` as the unit
        cost (per-row IEEE division — identical in any engine).
- Q9  — profit rollup by nation and year. ``ps_supplycost`` is
        replaced by ``p_retailprice * 0.6``; the part-name LIKE filter
        and 5-way join shape are intact.
- Q11 — group HAVING > fraction-of-global-scalar. Stock value is
        replaced by per-part lineitem revenue for one nation's
        suppliers; the global total decorrelates to a 1-row broadcast.
- Q12 — two-table fact-fact join with conditional priority counts.
        "Late" is ``l_shipdate > o_orderdate + 60 days`` (standing in
        for the receipt/commit comparison); groups by returnflag
        (standing in for shipmode).
- Q16 — distinct-supplier counts per part attribute with a NOT IN
        supplier exclusion (anti join). The part-supplier relation is
        again the distinct lineitem projection.
- Q21 — the hardest decorrelation: EXISTS (another supplier in the
        same order) AND NOT EXISTS (another LATE supplier) become one
        per-order aggregate producing (supplier count, late-supplier
        count, the sole late supplier), filtered n_supp >= 2 AND
        n_late = 1 — no self-joins against lineitem at all.

Scale notes (100 TB): every query here has exactly one fact-fact
shuffle (lineitem ⋈ orders) or none; all dimension sides broadcast
after their filters; the Q2/Q16 part-supplier relation reduces lineitem
by ~7x before any wide join; Q21 replaces the textbook double
self-join of lineitem (two extra fact shuffles) with a single groupBy —
the aggregate output is bounded by |orders|, not |lineitem|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.deterministic import dsum, sql_dsum
from ..registry import register
from ..tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@register(
    "q2_min_cost_supplier",
    oracle="""
    WITH ps AS (
      SELECT l_partkey, l_suppkey,
             MIN(l_extendedprice / l_quantity) AS unit_cost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ), eps AS (
      SELECT ps.l_partkey, ps.unit_cost, s.s_name, s.s_acctbal, n.n_name
      FROM ps
      JOIN supplier s ON s.s_suppkey = ps.l_suppkey
      JOIN nation n   ON n.n_nationkey = s.s_nationkey
      JOIN region r   ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'EUROPE'
    ), mn AS (
      SELECT l_partkey, MIN(unit_cost) AS min_cost FROM eps GROUP BY l_partkey
    )
    SELECT e.s_acctbal, e.s_name, e.n_name, p.p_partkey, p.p_type,
           e.unit_cost AS supply_cost
    FROM eps e
    JOIN mn ON mn.l_partkey = e.l_partkey AND e.unit_cost = mn.min_cost
    JOIN part p ON p.p_partkey = e.l_partkey
    WHERE p.p_size <= 10 AND p.p_type = 'LARGE'
    ORDER BY e.s_acctbal DESC, e.n_name, e.s_name, p.p_partkey
    LIMIT 100
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 pattern: for each qualifying part, the EUROPE supplier
    offering the minimum unit cost. The correlated MIN subquery
    decorrelates to a per-part aggregate joined back on exact double
    equality (both sides are MINs over the identical per-row IEEE
    quotients, so the equality is engine-stable). The part-supplier
    relation shuffles once on (partkey, suppkey); the per-part min is a
    second, strictly smaller shuffle; supplier/nation/region/part all
    broadcast. Ties (two suppliers at the same min cost) are kept, as
    in the original query.
    """
    ps = (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"))
    )
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    s = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    # cached: both the per-part MIN and the equality join-back consume
    # eps, and without the cache Spark scans + aggregates lineitem twice
    # (no exchange reuse across the differing subplans). eps is bounded
    # by distinct (part, supplier) pairs — ~7x smaller than lineitem.
    eps = (
        ps.join(F.broadcast(s), ps.l_suppkey == s.s_suppkey)
        .select("l_partkey", "unit_cost", "s_name", "s_acctbal", "n_name")
        .cache()
    )
    # alias the re-aggregated side: both frames descend from ``eps``, so
    # unaliased column refs would resolve ambiguously (self-join lineage)
    mn = (
        eps.groupBy(F.col("l_partkey").alias("mn_partkey"))
        .agg(F.min("unit_cost").alias("min_cost"))
    )
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_size") <= 10) & (F.col("p_type") == "LARGE")
    )
    return (
        eps.join(
            mn,
            (F.col("l_partkey") == F.col("mn_partkey"))
            & (F.col("unit_cost") == F.col("min_cost")),
        )
        .drop("mn_partkey")
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_type",
            F.col("unit_cost").alias("supply_cost"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@register(
    "q9_product_profit",
    oracle=f"""
    SELECT n.n_name AS nation,
           CAST(EXTRACT(YEAR FROM o.o_orderdate) AS BIGINT) AS o_year,
           {sql_dsum('l.l_extendedprice * (1 - l.l_discount) - p.p_retailprice * 0.6 * l.l_quantity')} AS profit
    FROM lineitem l
    JOIN part p     ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 pattern: profit by supplier nation and order year for a
    part-name family. Five-way join; part (name-filtered), supplier,
    and nation broadcast; lineitem ⋈ orders is the one shuffle. The
    profit expression substitutes ``p_retailprice * 0.6`` for the
    missing ps_supplycost; per-row arithmetic stays double (IEEE), the
    sum is the exact decimal dsum.
    """
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").contains("red"))
    n = _t(spark, sf_dir, "nation")
    s = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("p_retailprice") * F.lit(0.6) * F.col("l_quantity")
    )
    return (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .withColumn("o_year", F.year("o_orderdate").cast("bigint"))
        .groupBy("nation", "o_year")
        .agg(dsum(profit).alias("profit"))
        .orderBy("nation", F.desc("o_year"))
    )


@register(
    "q11_important_stock",
    oracle=f"""
    WITH val AS (
      SELECT l.l_partkey, {sql_dsum('l.l_extendedprice')} AS part_value
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n   ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name = 'NATION_3'
      GROUP BY l.l_partkey
    )
    SELECT l_partkey, part_value
    FROM val,
         (SELECT CAST(SUM(CAST(part_value AS DECIMAL(38,6))) AS DOUBLE) AS total
          FROM val) t
    WHERE part_value > 0.001 * t.total
    ORDER BY part_value DESC, l_partkey
    """,
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 pattern: parts whose value for one nation's suppliers
    exceeds a fraction of that nation's global total. The scalar
    global-total subquery decorrelates to a 1-row broadcast cross join
    over the SAME aggregate (computed once, cached) — no second scan of
    lineitem. The threshold comparison is double-on-double with both
    operands derived from exact decimal sums, so both engines agree.
    """
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    s = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey")
    )
    val = (
        _t(spark, sf_dir, "lineitem")
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(dsum("l_extendedprice").alias("part_value"))
        .cache()
    )
    total = val.agg(dsum("part_value").alias("total"))
    return (
        val.crossJoin(F.broadcast(total))
        .filter(F.col("part_value") > F.lit(0.001) * F.col("total"))
        .select("l_partkey", "part_value")
        .orderBy(F.desc("part_value"), "l_partkey")
    )


@register(
    "q12_late_priority_counts",
    oracle="""
    SELECT l.l_returnflag AS ret_flag,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY ret_flag
    ORDER BY ret_flag
    """,
)
def q12_late_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 pattern: for late-shipped 1996 lines, conditional
    counts of high- vs low-priority orders per return flag. "Late" is
    ``l_shipdate > o_orderdate + 60 days`` standing in for the missing
    receipt/commit dates; returnflag stands in for shipmode. The ship-
    date range filter pushes to the lineitem scan; the join is the one
    fact-fact shuffle; the lateness predicate (needs both sides)
    evaluates post-join; counts are integers — trivially deterministic.
    """
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    o = _t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy(F.col("l_returnflag").alias("ret_flag"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("ret_flag")
    )


@register(
    "q16_supplier_part_counts",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT pr.l_suppkey) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) pr
    JOIN part p ON p.p_partkey = pr.l_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 4, 7, 10, 13, 16, 19, 22, 25)
      AND pr.l_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
    """,
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 pattern: distinct-supplier counts per part attribute,
    excluding complaint suppliers. The NOT IN subquery is a broadcast
    LEFT ANTI join (safe here: s_suppkey is never NULL, so NOT IN and
    anti-join semantics coincide); the part-attribute filters ride the
    broadcast side. The distinct (part, supplier) projection reduces
    lineitem before the wide joins — one shuffle for the distinct, one
    for the count-distinct aggregation.
    """
    pairs = (
        _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    )
    bad = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22, 25)
    )
    return (
        pairs.join(F.broadcast(bad), pairs.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@register(
    "q21_waiting_supplier",
    oracle="""
    WITH lo AS (
      SELECT l.l_orderkey, l.l_suppkey,
             (l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY) AS is_late
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE o.o_orderstatus = 'F'
    ), agg AS (
      SELECT l_orderkey,
             COUNT(DISTINCT l_suppkey) AS n_supp,
             COUNT(DISTINCT CASE WHEN is_late THEN l_suppkey END) AS n_late,
             MAX(CASE WHEN is_late THEN l_suppkey END) AS late_supp
      FROM lo GROUP BY l_orderkey
    )
    SELECT s.s_name, COUNT(*) AS numwait
    FROM agg JOIN supplier s ON s.s_suppkey = agg.late_supp
    WHERE agg.n_supp >= 2 AND agg.n_late = 1
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 20
    """,
)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 pattern: suppliers who alone held up multi-supplier
    finished orders. The textbook form needs EXISTS + NOT EXISTS — two
    extra self-joins of lineitem (two more fact shuffles). Here both
    collapse into ONE per-order aggregate: distinct supplier count,
    distinct LATE supplier count, and (when exactly one) that late
    supplier via MAX over the conditional key. Filter n_supp >= 2 AND
    n_late = 1, then a broadcast supplier join and a bounded group-by.
    The aggregate output is |orders|-bounded, so everything after the
    first shuffle is small. "Late" is shipdate > orderdate + 90 days.
    """
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    late_key = F.when(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"),
        F.col("l_suppkey"),
    )
    agg = (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .select("l_orderkey", "l_suppkey", late_key.alias("late_key"))
        .groupBy("l_orderkey")
        .agg(
            F.count_distinct("l_suppkey").alias("n_supp"),
            F.count_distinct("late_key").alias("n_late"),
            F.max("late_key").alias("late_supp"),
        )
        .filter((F.col("n_supp") >= 2) & (F.col("n_late") == 1))
    )
    return (
        agg.join(F.broadcast(s), agg.late_supp == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )
