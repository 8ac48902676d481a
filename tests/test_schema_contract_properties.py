"""Property-based tests (hypothesis) for the schema contract: the
pg→Spark type map and cast-align projection must behave for EVERY type
spelling and column subset, mirroring the reference semantics
(load_postgres_from_spark_df.py:107-163)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark_postgres_loader_spark.schema_contract import pg_type_to_spark

_KNOWN = {
    "integer": "int",
    "serial": "int",
    "bigint": "bigint",
    "bigserial": "bigint",
    "smallint": "smallint",
    "date": "date",
    "boolean": "boolean",
    "double precision": "double",
    "real": "float",
    "bytea": "binary",
}


@given(st.sampled_from(sorted(_KNOWN)), st.sampled_from(["", " ", "  "]),
       st.booleans())
@settings(max_examples=100, deadline=None)
def test_known_types_map_with_whitespace_and_case(name, pad, upper):
    spelled = (name.upper() if upper else name).join([pad, pad])
    assert pg_type_to_spark(spelled) == _KNOWN[name]


@given(st.integers(min_value=1, max_value=38), st.integers(min_value=0, max_value=37),
       st.sampled_from(["numeric", "decimal", "NUMERIC"]))
@settings(max_examples=100, deadline=None)
def test_numeric_precision_scale_propagates(p, s, kw):
    if s > p:
        s = p
    assert pg_type_to_spark(f"{kw}({p},{s})") == f"decimal({p},{s})"
    assert pg_type_to_spark(f"{kw}({p}, {s})") == f"decimal({p},{s})"


@given(st.from_regex(r"[a-z][a-z_ ]{0,12}", fullmatch=True))
@settings(max_examples=150, deadline=None)
def test_unknown_types_fall_back_to_string(name):
    spark_t = pg_type_to_spark(name)
    known_outputs = set(_KNOWN.values()) | {
        "string", "timestamp", "double", "float", "boolean", "decimal(38,18)"
    }
    assert spark_t in known_outputs
    if name.strip() not in _KNOWN and not name.startswith(("numeric", "decimal")):
        # anything unmapped degrades to string, never raises
        # (varchar/char/text and friends land here too)
        assert isinstance(spark_t, str)


@given(st.from_regex(r"(varchar|char|character varying|time)\(\d{1,3}\)", fullmatch=True))
@settings(max_examples=50, deadline=None)
def test_parenthesized_modifiers_are_stripped(spelled):
    # modifier forms must resolve like their base type (never crash)
    assert pg_type_to_spark(spelled) == pg_type_to_spark(spelled.split("(")[0])
