"""Data-quality expectation checks (the Deequ/Great-Expectations shape):
declare per-column constraints, compute violation counts in ONE pass per
table, and emit a machine-readable report — the validation gate a load
pipeline runs before the upsert sink (sinks/upsert.py) is allowed to
touch the warehouse. The reference loads blindly (psycopg2_database_
helper.py:123 upserts whatever arrives); this is the missing guard.

Scale notes (100 TB design):
- Every per-table constraint family is ONE full scan with conditional
  aggregates (``SUM(CASE WHEN violated)``) — adding a constraint adds a
  column to the same aggregation, not a scan. Map-side partials reduce
  each partition to a single row before the 1-row exchange.
- Uniqueness is ``COUNT(*) - COUNT(DISTINCT key)`` — the one check that
  genuinely needs a shuffle of the key column (partial distinct-hash
  per partition, merged); it rides the same aggregate.
- Referential integrity is a LEFT ANTI join on the foreign key; at
  100 TB both sides shuffle-partition on the key (or the dimension side
  broadcasts when small). It is the only multi-table check, kept as its
  own 1-row aggregate and unioned into the report.
- The report itself is O(#constraints) rows — the unpivot (``stack``)
  runs on a 1-row aggregate, never on data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load_table

# freshness horizon for o_orderdate (fixture data runs 1995..2001-08;
# the cutoff deliberately catches the tail so the report shows a
# real failing constraint, not an all-green vacuity)
_RECENCY_CUTOFF = "2000-12-31 00:00:00"


def _viol(cond: Column) -> Column:
    return F.sum(F.when(cond, 1).otherwise(0)).cast("long")


@register(
    "quality_expectations_report",
    oracle=f"""
    WITH o AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS checked,
             CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT) AS v_unique,
             CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v_null,
             CAST(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS v_price,
             CAST(SUM(CASE WHEN o_orderstatus NOT IN ('O','F','P') THEN 1 ELSE 0 END) AS BIGINT) AS v_status,
             CAST(SUM(CASE WHEN o_orderdate > TIMESTAMP '{_RECENCY_CUTOFF}' THEN 1 ELSE 0 END) AS BIGINT) AS v_recency
      FROM orders
    ),
    l AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS checked,
             CAST(SUM(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END) AS BIGINT) AS v_qty,
             CAST(SUM(CASE WHEN l_discount < 0 OR l_discount > 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS v_disc
      FROM lineitem
    ),
    fk AS (
      SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem) AS checked,
             CAST(COUNT(*) AS BIGINT) AS v
      FROM lineitem li LEFT JOIN orders oo ON li.l_orderkey = oo.o_orderkey
      WHERE oo.o_orderkey IS NULL
    ),
    rep AS (
      SELECT 'orders_orderkey_unique' AS check_name, checked, v_unique AS violations FROM o
      UNION ALL SELECT 'orders_custkey_not_null', checked, v_null FROM o
      UNION ALL SELECT 'orders_totalprice_positive', checked, v_price FROM o
      UNION ALL SELECT 'orders_status_domain', checked, v_status FROM o
      UNION ALL SELECT 'orders_orderdate_recency', checked, v_recency FROM o
      UNION ALL SELECT 'lineitem_quantity_range', checked, v_qty FROM l
      UNION ALL SELECT 'lineitem_discount_range', checked, v_disc FROM l
      UNION ALL SELECT 'lineitem_orderkey_fk', checked, v FROM fk
    )
    SELECT check_name, checked, violations,
           CAST(violations = 0 AS BOOLEAN) AS passed
    FROM rep ORDER BY check_name
    """,
)
def quality_expectations_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint-suite validation report: uniqueness, completeness,
    range, domain, freshness, and referential integrity, one row per
    constraint with ``checked``/``violations``/``passed``. See module
    docstring for the one-scan-per-table design.
    """
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")

    oagg = o.agg(
        F.count("*").cast("long").alias("checked"),
        (F.count("*") - F.countDistinct("o_orderkey")).cast("long").alias("v_unique"),
        _viol(F.col("o_custkey").isNull()).alias("v_null"),
        _viol(F.col("o_totalprice") <= 0).alias("v_price"),
        _viol(~F.col("o_orderstatus").isin("O", "F", "P")).alias("v_status"),
        _viol(F.col("o_orderdate") > F.lit(_RECENCY_CUTOFF).cast("timestamp")).alias(
            "v_recency"
        ),
    )
    orders_rows = oagg.select(
        F.expr(
            "stack(5,"
            " 'orders_orderkey_unique', v_unique,"
            " 'orders_custkey_not_null', v_null,"
            " 'orders_totalprice_positive', v_price,"
            " 'orders_status_domain', v_status,"
            " 'orders_orderdate_recency', v_recency"
            ") AS (check_name, violations)"
        ),
        "checked",
    )

    lagg = li.agg(
        F.count("*").cast("long").alias("checked"),
        _viol((F.col("l_quantity") < 1) | (F.col("l_quantity") > 50)).alias("v_qty"),
        _viol((F.col("l_discount") < 0) | (F.col("l_discount") > 0.5)).alias("v_disc"),
    )
    lineitem_rows = lagg.select(
        F.expr(
            "stack(2,"
            " 'lineitem_quantity_range', v_qty,"
            " 'lineitem_discount_range', v_disc"
            ") AS (check_name, violations)"
        ),
        "checked",
    )

    fk_rows = (
        li.join(o.select("o_orderkey"), li.l_orderkey == F.col("o_orderkey"), "left_anti")
        .agg(F.count("*").cast("long").alias("violations"))
        .crossJoin(F.broadcast(li.agg(F.count("*").cast("long").alias("checked"))))
        .select(F.lit("lineitem_orderkey_fk").alias("check_name"), "violations", "checked")
    )

    rep = orders_rows.unionByName(lineitem_rows).unionByName(fk_rows)
    return rep.select(
        "check_name",
        "checked",
        "violations",
        (F.col("violations") == 0).alias("passed"),
    ).orderBy("check_name")


# --------------------------------------------------------------------------
# Column profile (the ANALYZE TABLE / profiling shape)
# --------------------------------------------------------------------------

_PROFILE_COLS = [
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderpriority",
]


@register(
    "profile_orders_columns",
    oracle=f"""
    WITH agg AS (
      SELECT COUNT(*) AS n_rows,
             {', '.join(
                 f"COUNT({c}) AS nn_{c}, "
                 f"COUNT(DISTINCT {c}) AS nd_{c}, "
                 f"CAST(MIN({c}) AS VARCHAR) AS mn_{c}, "
                 f"CAST(MAX({c}) AS VARCHAR) AS mx_{c}"
                 for c in _PROFILE_COLS
             )}
      FROM orders
    )
    {' UNION ALL '.join(
        f"SELECT '{c}' AS column_name, n_rows, "
        f"n_rows - nn_{c} AS n_null, nd_{c} AS n_distinct, "
        f"mn_{c} AS min_val, mx_{c} AS max_val FROM agg"
        for c in _PROFILE_COLS
    )}
    ORDER BY column_name
    """,
)
def profile_orders_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profile — the ANALYZE TABLE shape a warehouse runs before
    choosing join strategies: per column, row/null/exact-distinct
    counts and min/max (rendered as strings so one report schema covers
    heterogeneous column types). The non-distinct statistics are ONE
    scan with conditional aggregates (map-side partials reduce each
    partition to one row); each exact DISTINCT count is its own
    two-level hash aggregate over just its column, reassembled by
    1-row broadcast crossJoins — putting the five distincts in the one
    aggregation made Spark's distinct-rewrite EXPAND every row 6× and
    sort the expanded rows (r16 A/B: 3.21 s → 0.58 s at sf0.1; exact
    values unchanged). The unpivot (``stack``) runs on the 1-row
    aggregate, never on data. At 100 TB swap exact distincts for
    ``approx_count_distinct`` (HLL) — those ride the single scan with
    bounded memory and no Expand — mirroring the sketch/error-contract
    pattern of ``agg_approx_sketches``.

    Timestamps are excluded from the showcase column set: their string
    rendering differs between engines ('2000-01-01 00:00:00' vs
    '2000-01-01 00:00:00.000000'), which is a formatting, not a value,
    difference — numeric and varchar columns render identically.
    """
    o = load_table(spark, sf_dir, "orders")
    aggs = [F.count("*").alias("n_rows")]
    for c in _PROFILE_COLS:
        aggs += [
            F.count(c).alias(f"nn_{c}"),
            F.min(c).cast("string").alias(f"mn_{c}"),
            F.max(c).cast("string").alias(f"mx_{c}"),
        ]
    # r16 restructure (same values): five countDistincts in one agg made
    # Spark's distinct-rewrite EXPAND every row 6× and push the var-len
    # min/max buffers into a Sort+SortAggregate chain over the expanded
    # rows (r15 plan audit: Expand + 3 Sorts + 4 SortAggregates). The
    # non-distinct statistics need no expansion — they stay in one
    # 1-row aggregate — and each exact distinct count runs as its own
    # two-level codegen hash aggregate over just its column (no Expand,
    # no object buffers), reassembled by 1-row broadcast crossJoins.
    # Scan count rises to 6, but each scan prunes to a single column of
    # a columnar file — at 100 TB the 6× row expansion through a sort
    # is the scale-killer, not the extra column-pruned scans (guide
    # §2.3/§6). The five distinct subtrees execute as independent
    # broadcast jobs, overlapping on idle cores (guide §2.6).
    one = o.agg(*aggs)
    for c in _PROFILE_COLS:
        one = one.crossJoin(
            F.broadcast(o.agg(F.countDistinct(c).alias(f"nd_{c}")))
        )
    stack_args = ", ".join(
        f"'{c}', n_rows - nn_{c}, nd_{c}, mn_{c}, mx_{c}" for c in _PROFILE_COLS
    )
    return (
        one.select(
            "n_rows",
            F.expr(
                f"stack({len(_PROFILE_COLS)}, {stack_args}) AS "
                "(column_name, n_null, n_distinct, min_val, max_val)"
            ),
        )
        .select(
            "column_name",
            "n_rows",
            F.col("n_null").cast("long").alias("n_null"),
            F.col("n_distinct").cast("long").alias("n_distinct"),
            "min_val",
            "max_val",
        )
        .orderBy("column_name")
    )
