"""Target-schema contract: the pg→Spark type map + cast-align transform.

Reference parity (SURVEY.md §1, §2b):
- type map ≈ ``config.ini:14-26`` with the ``numeric(p,s)``→
  ``decimal(p,s)`` precision propagation of
  ``load_postgres_from_spark_df.py:155-156`` and the string fallback for
  unmapped types (``:154``);
- column-intersection projection (keep only source columns present in
  the target, in target order) ≈ ``load_postgres_from_spark_df.py:140-143``,
  raising when the intersection is empty (``:145-149``);
- cast-with-alias projection ≈ ``:150-163``.

This is app semantics, not optimization: Catalyst prunes columns for
scans automatically, but pruning to an *external target's* schema must
stay explicit.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Postgres type name → Spark SQL cast target (config.ini:14-26).
PG_TO_SPARK_TYPE: dict[str, str] = {
    "integer": "int",
    "int": "int",
    "int4": "int",
    "serial": "int",
    "smallint": "smallint",
    "bigint": "bigint",
    "int8": "bigint",
    "bigserial": "bigint",
    "date": "date",
    "timestamp": "timestamp",
    "timestamp without time zone": "timestamp",
    "timestamp with time zone": "timestamp",
    "double": "double",
    "double precision": "double",
    "float": "float",
    "real": "float",
    "boolean": "boolean",
    "bool": "boolean",
    "bytea": "binary",
}

_NUMERIC_RE = re.compile(r"^(?:numeric|decimal)\s*(?:\((\d+)\s*,\s*(\d+)\))?\s*$")


def pg_type_to_spark(pg_type: str) -> str:
    """Map a Postgres type name (as ``format_type`` renders it) to a
    Spark SQL type string. ``numeric(p,s)`` keeps precision/scale
    (≈ the reference's string replace at load_postgres_from_spark_df.py:155-156);
    unknown types fall back to ``string`` (``:154``)."""
    t = pg_type.strip().lower()
    m = _NUMERIC_RE.match(t)
    if m:
        if m.group(1) is None:
            return "decimal(38,18)"
        return f"decimal({m.group(1)},{m.group(2)})"
    # strip parenthesized modifiers: varchar(15), char(2), time(3), ...
    base = re.sub(r"\(.*\)", "", t).strip()
    return PG_TO_SPARK_TYPE.get(t, PG_TO_SPARK_TYPE.get(base, "string"))


class EmptyColumnIntersectionError(ValueError):
    """No source column matches the target table (≈ load_postgres_from_spark_df.py:145-149)."""


def intersect_columns(df: DataFrame, target_columns: list[str]) -> list[str]:
    """Source∩target column names, in target-catalog order; matching is
    by exact lowercase equality (sources normalize to lowercase at the
    boundary — sources/files.py)."""
    source = {c.lower() for c in df.columns}
    kept = [c for c in target_columns if c.lower() in source]
    if not kept:
        raise EmptyColumnIntersectionError(
            f"no overlap between source columns {sorted(source)} and "
            f"target columns {target_columns}"
        )
    return kept


def align_to_target(df: DataFrame, target_schema: dict[str, str]) -> DataFrame:
    """Project ``df`` onto the target table's schema: intersect columns,
    cast each to the mapped Spark type, alias to the target name.

    ``target_schema`` maps column name → Postgres type string, in
    catalog order (≈ the OrderedDict of load_postgres_from_spark_df.py:107-125).
    """
    kept = intersect_columns(df, list(target_schema))
    return df.select(
        *[
            F.col(c).cast(pg_type_to_spark(target_schema[c])).alias(c.lower())
            for c in kept
        ]
    )
