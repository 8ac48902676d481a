"""Data-layout diagnostics: quantify how well a physical clustering
bounds per-file column envelopes — the property parquet min/max
data-skipping lives on at 100 TB.

``layout_zorder_stats`` compares Z-ORDER (Morton-interleaved) bucketing
of ``orders`` on (custkey, orderdate) against the natural linear
(orderkey-range) layout. A z-bucket bounds BOTH dimensions (so a scan
filtered on either column prunes buckets), while a linear chunk bounds
only the ingest key; the per-bucket min/max spans make that difference
a number. The same z-expression is what a writer would ``sortWithinPartitions``
by before `write.parquet` to get multi-dimensional skipping — this
operator is the measurement half of that design. All arithmetic is
integer bit-twiddling (shift/and) both engines compute identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load_table

_BITS = 8            # 8 bits per dimension -> 16-bit z-value
_Z_SHIFT = 10        # bucket = zv >> 10  (64 z-buckets)
_LINEAR_CHUNK = 256  # linear baseline: consecutive-orderkey chunks

_EPOCH = "1992-01-01"


def _z_expr_sql(x: str, y: str) -> str:
    """Morton interleave of two 8-bit values — identical text works as
    a Spark SQL expression and inside the DuckDB oracle (shiftleft /
    shiftright spelled with operators for DuckDB, functions for Spark
    are generated separately below)."""
    return " + ".join(
        f"((({x} >> {i}) & 1) << {2 * i}) + ((({y} >> {i}) & 1) << {2 * i + 1})"
        for i in range(_BITS)
    )


def _z_expr_spark(x: str, y: str) -> str:
    return " + ".join(
        f"shiftleft(shiftright({x}, {i}) & 1, {2 * i})"
        f" + shiftleft(shiftright({y}, {i}) & 1, {2 * i + 1})"
        for i in range(_BITS)
    )


@register(
    "layout_zorder_stats",
    oracle=f"""
    WITH t AS (
      SELECT o_custkey % 256 AS x,
             CAST(date_diff('day', DATE '{_EPOCH}', o_orderdate) AS BIGINT)
               % 256 AS y,
             o_orderkey
      FROM orders
    ),
    z AS (SELECT x, y, o_orderkey, {_z_expr_sql('x', 'y')} AS zv FROM t),
    zb AS (
      SELECT zv >> {_Z_SHIFT} AS b,
             MAX(x) - MIN(x) AS x_span, MAX(y) - MIN(y) AS y_span
      FROM z GROUP BY b
    ),
    lb AS (
      SELECT o_orderkey // {_LINEAR_CHUNK} AS b,
             MAX(x) - MIN(x) AS x_span, MAX(y) - MIN(y) AS y_span
      FROM z GROUP BY b
    )
    SELECT 'zorder' AS layout, CAST(COUNT(*) AS BIGINT) AS n_buckets,
           CAST(SUM(x_span) AS DOUBLE) / COUNT(*) AS avg_x_span,
           CAST(SUM(y_span) AS DOUBLE) / COUNT(*) AS avg_y_span,
           CAST(MAX(x_span) AS BIGINT) AS max_x_span,
           CAST(MAX(y_span) AS BIGINT) AS max_y_span
    FROM zb
    UNION ALL
    SELECT 'linear', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(x_span) AS DOUBLE) / COUNT(*),
           CAST(SUM(y_span) AS DOUBLE) / COUNT(*),
           CAST(MAX(x_span) AS BIGINT), CAST(MAX(y_span) AS BIGINT)
    FROM lb
    """,
)
def layout_zorder_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-layout clustering quality: average and worst per-bucket
    min/max span of each dimension under z-order vs linear layout.
    Two aggregations over one slim projection; spans are exact ints,
    the averages are exact-int sums divided per-row, so the output is
    cross-engine hashable. On the fixture the z-buckets bound both
    dims to ~31 of 256 while linear chunks span ~254 — the measured
    argument for z-ordering the write path (sinks/layout.py) when two
    filter columns matter."""
    o = load_table(spark, sf_dir, "orders")
    t = o.select(
        (F.col("o_custkey") % 256).alias("x"),
        (F.datediff("o_orderdate", F.lit(_EPOCH)).cast("long") % 256).alias("y"),
        "o_orderkey",
    )
    z = t.withColumn("zv", F.expr(_z_expr_spark("x", "y")))

    def spans(df: DataFrame, bucket: F.Column) -> DataFrame:
        return (
            df.groupBy(bucket.alias("b"))
            .agg(
                (F.max("x") - F.min("x")).alias("x_span"),
                (F.max("y") - F.min("y")).alias("y_span"),
            )
            .agg(
                F.count("*").alias("n_buckets"),
                (F.sum("x_span").cast("double") / F.count("*")).alias("avg_x_span"),
                (F.sum("y_span").cast("double") / F.count("*")).alias("avg_y_span"),
                F.max("x_span").alias("max_x_span"),
                F.max("y_span").alias("max_y_span"),
            )
        )

    zo = spans(z, F.shiftright("zv", _Z_SHIFT)).select(
        F.lit("zorder").alias("layout"), "*"
    )
    li = spans(z, F.floor(F.col("o_orderkey") / _LINEAR_CHUNK)).select(
        F.lit("linear").alias("layout"), "*"
    )
    return zo.unionByName(li)
