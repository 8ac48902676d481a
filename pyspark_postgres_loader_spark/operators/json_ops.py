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


@register(
    "ingest_corrupt_json_quarantine",
    oracle="""
    WITH t AS (
      SELECT event_type,
             CASE WHEN event_id % 37 = 0 THEN 'corrupt! ' || props
                  ELSE props END AS raw
      FROM events
    ),
    p AS (
      SELECT event_type,
             CASE WHEN json_valid(raw)
                  THEN CAST(json_extract_string(raw, '$.k') AS BIGINT)
                  END AS k
      FROM t
    )
    SELECT event_type,
           COUNT(*) AS n_total,
           CAST(SUM(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_quarantined,
           CAST(SUM(CASE WHEN k IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_valid,
           CAST(SUM(COALESCE(k, 0)) AS BIGINT) AS sum_k
    FROM p GROUP BY event_type
    """,
)
def ingest_corrupt_json_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read-side bad-record quarantine for semi-structured ingestion:
    deterministically corrupted JSON rows (prefix garbage — the one
    corruption class both engines classify identically; Spark's Jackson
    tolerates TRAILING garbage that DuckDB rejects, so that class is
    not generated) parse to NULL under from_json's PERMISSIVE mode and
    are counted per group instead of failing the job — the text-
    ingestion sibling of the multimodal decode quarantine and the
    sink's batch-bisection quarantine. Pure projection + one group-by;
    corrupt rows cost a failed parse, not a stage retry."""
    e = load_table(spark, sf_dir, "events")
    raw = F.when(
        F.col("event_id") % 37 == 0, F.concat(F.lit("corrupt! "), F.col("props"))
    ).otherwise(F.col("props"))
    schema = T.StructType([T.StructField("k", T.LongType())])
    k = F.from_json(raw, schema)["k"]
    p = e.select("event_type", k.alias("k"))
    return p.groupBy("event_type").agg(
        F.count("*").alias("n_total"),
        F.sum(F.when(F.col("k").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_quarantined"),
        F.sum(F.when(F.col("k").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_valid"),
        F.sum(F.coalesce(F.col("k"), F.lit(0))).cast("long").alias("sum_k"),
    )


@register(
    "xml_roundtrip_extract",
    oracle="""
    SELECT event_id,
           user_id AS xml_uid,
           CAST(event_id * 7 % 1000 AS BIGINT) AS xml_metric,
           event_type AS xml_type
    FROM events WHERE event_id < 500
    """,
)
def xml_roundtrip_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML ingestion surface (Spark 4 ``from_xml``): an XML document
    built deterministically from row fields — attribute, element, and
    nested element — is parsed back and every extracted field must
    equal its source column. DuckDB has no XML parser, so the oracle is
    the ROUND-TRIP identity: it selects the source columns directly,
    and any parse/extraction defect (attribute vs element confusion,
    type coercion, entity handling) breaks the match. Pure projection,
    zero shuffles; the parse is JVM-side codegen like from_json."""
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    xml = F.concat(
        F.lit('<rec uid="'),
        F.col("user_id"),
        F.lit('"><metric>'),
        F.col("event_id") * 7 % 1000,
        F.lit("</metric><meta><type>"),
        F.col("event_type"),
        F.lit("</type></meta></rec>"),
    )
    parsed = F.from_xml(
        xml,
        "struct<_uid: bigint, metric: bigint, meta: struct<type: string>>",
    )
    return e.select(
        "event_id",
        parsed["_uid"].alias("xml_uid"),
        parsed["metric"].alias("xml_metric"),
        parsed["meta"]["type"].alias("xml_type"),
    )


# --------------------------------------------------------------------------
# Schema-evolution ingestion (mergeSchema across drifting files)
# --------------------------------------------------------------------------


@register(
    "ingest_schema_evolution_merge",
    oracle="""
    SELECT event_id, user_id, value,
           CASE WHEN event_id % 2 = 1 THEN value * 0.5 END AS quality
    FROM events
    """,
)
def ingest_schema_evolution_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema drift on the read path: two parquet files written at
    different 'pipeline generations' — the older one lacks the
    ``quality`` column the newer one added — are read back as ONE
    relation with ``mergeSchema=true``; rows from the pre-evolution
    file surface NULL for the added column, exactly the semantics a
    long-lived ingest directory needs when producers upgrade.
    Complements the sink-side schema contract (schema_contract.py
    aligns columns to the TARGET; this handles drift among SOURCES).
    Scale note: mergeSchema reconciles footers only (no data rewrite);
    for stable production reads, pin an explicit read schema and let
    missing columns null-fill the same way — the test of either path
    is identical. The split/enrichment rule (odd event_ids carry
    quality = value/2) replays exactly in the oracle.

    Scratch-dir hygiene: the returned DataFrame lazily reads the
    generated files, so the directory can't be deleted eagerly. A
    fresh mkdtemp per call accumulated across the bench's 3x-per-query
    runs; the scratch path is instead DETERMINISTIC per (uid, pid,
    sf_dir) — repeat calls within a process overwrite the same two
    files — and an atexit hook removes it at interpreter exit. The pid
    component keeps CONCURRENT processes (parallel pytest workers, an
    overlapping bench run) from overwriting each other's generation
    files mid-read or atexit-deleting the dir under a sibling's
    lazily-evaluated DataFrame."""
    import glob
    import hashlib
    import os
    import shutil

    from ..scratch import claim_scratch_dir

    ev = load_table(spark, sf_dir, "events")
    tag = hashlib.sha1(sf_dir.encode()).hexdigest()[:12]
    # claim_scratch_dir also sweeps siblings left by dead processes —
    # the pid-derived name means no later run would otherwise ever
    # reclaim a crashed run's copy of the events fixture.
    src = claim_scratch_dir("schema_evo", tag)
    gens = [
        ("gen0", ev.filter(F.col("event_id") % 2 == 0).select(
            "event_id", "user_id", "value")),
        ("gen1", ev.filter(F.col("event_id") % 2 == 1).select(
            "event_id", "user_id", "value",
            (F.col("value") * 0.5).alias("quality"))),
    ]
    for name, df in gens:
        outdir = os.path.join(src, "_w_" + name)
        df.coalesce(1).write.mode("overwrite").parquet(outdir)
        part = glob.glob(os.path.join(outdir, "part-*.parquet"))[0]
        shutil.copy(part, os.path.join(src, name + ".parquet"))
        shutil.rmtree(outdir)
    return spark.read.option("mergeSchema", "true").parquet(src)
