"""JSON extraction over semi-structured columns (events.props).

The fixture ``events.props`` holds JSON text (``{"k": <int>}``). At
100 TB scale JSON parsing happens executor-side inside codegen'd
expressions (``get_json_object`` / ``from_json``) — never in Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.deterministic import davg, dsum, sql_davg, sql_dsum
from ..registry import register
from ..tables import load_table


@register(
    "json_props_by_event_type",
    oracle=f"""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS DOUBLE)
             / COUNT(props) AS avg_k,
           {sql_dsum('value')} AS sum_value
    FROM events
    GROUP BY event_type
    """,
)
def json_props_by_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extract ``props.k`` (JSON path) and aggregate per event type."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        e.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("k").alias("sum_k"),
            (F.sum("k").cast("double") / F.count("props")).alias("avg_k"),
            dsum("value").alias("sum_value"),
        )
    )


@register(
    "json_from_json_struct",
    oracle="""
    SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 90
    """,
)
def json_from_json_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed JSON parse via from_json(StructType) then filter on the
    extracted field (predicate evaluated post-parse, codegen'd)."""
    e = load_table(spark, sf_dir, "events")
    schema = T.StructType([T.StructField("k", T.LongType())])
    return (
        e.withColumn("parsed", F.from_json("props", schema))
        .select("event_id", F.col("parsed.k").alias("k"))
        .filter(F.col("k") > 90)
    )


@register(
    "json_map_explode",
    oracle="""
    SELECT prop_key,
           COUNT(*) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.' || prop_key) AS BIGINT)) AS BIGINT) AS sum_val,
           MIN(CAST(json_extract_string(props, '$.' || prop_key) AS BIGINT)) AS min_val,
           MAX(CAST(json_extract_string(props, '$.' || prop_key) AS BIGINT)) AS max_val
    FROM (
      SELECT props, unnest(json_keys(props)) AS prop_key FROM events
    )
    GROUP BY prop_key
    """,
)
def json_map_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-less JSON: parse ``props`` as MAP<string,long>, explode
    to (key, value) rows, aggregate per key — the shape for property
    bags whose key set is open-ended (vs the fixed-struct parse in
    ``json_from_json_struct``). Parse + explode are codegen'd; one
    shuffle on the (low-cardinality) key."""
    e = load_table(spark, sf_dir, "events")
    m = F.from_json("props", T.MapType(T.StringType(), T.LongType()))
    return (
        e.select(F.explode(m).alias("prop_key", "val"))
        .groupBy("prop_key")
        .agg(
            F.count("*").alias("n"),
            F.sum("val").alias("sum_val"),
            F.min("val").alias("min_val"),
            F.max("val").alias("max_val"),
        )
    )


# JSON text built identically on both engines (ints/bools only: double
# -> string rendering is engine-specific, so no floats enter the text).
_VARIANT_JSON_SQL = (
    "'{\"user\": {\"id\": ' || CAST(user_id AS VARCHAR) || "
    "', \"vip\": ' || CAST(user_id % 7 = 0 AS VARCHAR) || "
    "'}, \"ids\": [' || CAST(user_id AS VARCHAR) || ', ' || "
    "CAST(event_id AS VARCHAR) || ']}'"
)


@register(
    "json_variant_nested",
    oracle=f"""
    WITH j AS (
      SELECT event_id, props, {_VARIANT_JSON_SQL} AS doc
      FROM events WHERE event_id < 500
    )
    SELECT event_id,
           CAST(json_extract_string(doc, '$.user.id') AS BIGINT) AS uid,
           CAST(json_extract_string(doc, '$.user.vip') AS BOOLEAN) AS vip,
           CAST(json_extract_string(doc, '$.ids[1]') AS BIGINT) AS second_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
    FROM j
    """,
)
def json_variant_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access through Spark 4's VARIANT type: a nested
    JSON document (object-in-object plus array) is parsed once with
    ``parse_json`` and fields come out via typed ``variant_get`` paths
    — object traversal ($.user.id), array indexing ($.ids[1]), and a
    second shredded source (props.k). VARIANT keeps the parsed binary
    form, so repeated path access does NOT re-parse the text the way
    stacked get_json_object calls do — at scale this is the difference
    between one parse and one parse per extracted field. Pure
    projection: zero shuffles."""
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    doc = F.concat(
        F.lit('{"user": {"id": '),
        F.col("user_id").cast("string"),
        F.lit(', "vip": '),
        (F.col("user_id") % 7 == 0).cast("string"),
        F.lit('}, "ids": ['),
        F.col("user_id").cast("string"),
        F.lit(", "),
        F.col("event_id").cast("string"),
        F.lit("]}"),
    )
    v = e.select("event_id", "props", F.parse_json(doc).alias("v"))
    return v.select(
        "event_id",
        F.variant_get("v", "$.user.id", "bigint").alias("uid"),
        F.variant_get("v", "$.user.vip", "boolean").alias("vip"),
        F.variant_get("v", "$.ids[1]", "bigint").alias("second_id"),
        F.get_json_object("props", "$.k").cast("bigint").alias("k"),
    )
