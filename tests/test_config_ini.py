"""config.ini compatibility: the reference's INI shape
(/root/reference/config.ini:1-26) must load — credentials (with env
override), source-kind declarations, and type-map overrides feeding
the schema contract."""

from __future__ import annotations

import pytest

from pyspark_postgres_loader_spark.config import LoaderConfig, load_config

REFERENCE_SHAPED_INI = """\
[my_database_credentials]
host = db.example.internal
database = analytics
port = 6432
user = loader
password = hunter2

[source_data_class_mapping]
s3_module = get_s3_data_as_df
s3_class = GetSourceDataAsDf
postgres_module = get_pg_data_as_df
postgres_class = GetPgDataAsDf

[pg_to_spark_data_type_mapping]
integer = int
serial = int
bigint = bigint
bigserial = bigint
date = date
timestamp = timestamp
numeric = decimal
double = double
float = float
boolean = boolean
bool = boolean
"""


@pytest.fixture()
def ini(tmp_path):
    p = tmp_path / "config.ini"
    p.write_text(REFERENCE_SHAPED_INI)
    return str(p)


def test_credentials_loaded_and_env_overrides(ini, monkeypatch):
    for var in ("PGHOST", "PGPORT", "PGDATABASE", "PGUSER", "PGPASSWORD"):
        monkeypatch.delenv(var, raising=False)
    cfg = load_config(ini)
    params = cfg.connection_params()
    assert params == {
        "host": "db.example.internal",
        "port": 6432,
        "dbname": "analytics",
        "user": "loader",
        "password": "hunter2",
    }
    monkeypatch.setenv("PGHOST", "override.example.internal")
    assert cfg.connection_params()["host"] == "override.example.internal"


def test_empty_env_var_still_overrides_ini(ini, monkeypatch):
    """Env-wins is a PRESENCE rule: PGPASSWORD set to the empty string
    must override the INI credential (an empty password is a real
    credential, e.g. trust/peer auth), and an empty INI value must NOT
    silently fall through to the built-in default."""
    for var in ("PGHOST", "PGPORT", "PGDATABASE", "PGUSER", "PGPASSWORD"):
        monkeypatch.delenv(var, raising=False)
    monkeypatch.setenv("PGPASSWORD", "")
    cfg = load_config(ini)
    assert cfg.connection_params()["password"] == ""

    cfg2 = LoaderConfig(credentials={"user": ""})
    assert cfg2.connection_params()["user"] == ""


def test_source_kinds_declared(ini):
    cfg = load_config(ini)
    assert cfg.source_kinds() == ["postgres", "s3"]


def test_type_map_overrides_and_fallback(ini):
    cfg = load_config(ini)
    # INI override wins for exact-name types
    assert cfg.spark_type_for("integer") == "int"
    assert cfg.spark_type_for("numeric") == "decimal"
    # precision propagation still comes from the built-in map
    assert cfg.spark_type_for("numeric(12,2)") == "decimal(12,2)"
    # unmapped types fall back to string (reference :154 behavior)
    assert cfg.spark_type_for("uuid") == "string"


def test_missing_file_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        load_config(str(tmp_path / "nope.ini"))


def test_empty_config_uses_defaults(tmp_path, monkeypatch):
    for var in ("PGHOST", "PGPORT", "PGDATABASE", "PGUSER", "PGPASSWORD"):
        monkeypatch.delenv(var, raising=False)
    p = tmp_path / "empty.ini"
    p.write_text("")
    cfg = load_config(str(p))
    assert cfg.connection_params()["host"] == "localhost"
    assert isinstance(cfg, LoaderConfig)


def test_cli_sqlite_dialect_end_to_end(ini, monkeypatch, tmp_path, spark, capsys):
    """End-to-end: ``--dialect sqlite --db_path`` pairs the sqlite
    paramstyle SQL with a real sqlite3 connection factory (no
    monkeypatched factory — the dialect selects it). --config is
    noted as ignored for file-backed dialects (its credentials are
    Postgres-only)."""
    import sqlite3

    from pyspark_postgres_loader_spark import cli

    src = tmp_path / "in.csv"
    src.write_text("id,v\n1,a\n2,b\n")
    db = str(tmp_path / "cli.db")
    conn = sqlite3.connect(db)
    conn.execute("CREATE TABLE t (id INTEGER PRIMARY KEY, v TEXT)")
    conn.commit()

    monkeypatch.setattr(cli, "get_spark", lambda app_name: spark)
    monkeypatch.setattr(spark, "stop", lambda: None)

    rc = cli.main([
        "--source", "csv",
        "--source_arg", f"path={src}",
        "--source_arg", "header=true",
        "--target_pg_table", "t",
        "--dialect", "sqlite",
        "--db_path", db,
        "--config", ini,
    ])
    assert rc == 0
    assert "ignored" in capsys.readouterr().err
    rows = dict(conn.execute("SELECT id, v FROM t"))
    assert rows == {1: "a", 2: "b"}
    conn.close()


def test_cli_file_dialect_requires_db_path(monkeypatch, tmp_path):
    from pyspark_postgres_loader_spark import cli

    with pytest.raises(SystemExit, match="db_path"):
        cli.main([
            "--source", "csv",
            "--source_arg", "path=/dev/null",
            "--target_pg_table", "t",
            "--dialect", "duckdb",
        ])


def test_cli_config_factory_used_for_postgres_dialect(ini, monkeypatch, tmp_path, spark):
    """With the default postgres dialect, --config builds the
    connection factory from the INI credentials (factory builder
    swapped to sqlite here — psycopg2 isn't installed — but the
    selection logic and config plumbing are real)."""
    import functools
    import sqlite3

    from pyspark_postgres_loader_spark import cli, config

    src = tmp_path / "in.csv"
    src.write_text("id,v\n1,a\n")
    db = str(tmp_path / "cli_pg.db")
    conn = sqlite3.connect(db)
    conn.execute("CREATE TABLE t (id INTEGER PRIMARY KEY, v TEXT)")
    conn.commit()

    captured = {}

    def fake_factory(cfg):
        captured["params"] = cfg.connection_params()
        return functools.partial(sqlite3.connect, db)

    monkeypatch.setattr(config, "make_connection_factory", fake_factory)
    monkeypatch.setattr(cli, "get_spark", lambda app_name: spark)
    monkeypatch.setattr(spark, "stop", lambda: None)
    # the sink speaks sqlite in this swap, so force its dialect via the
    # library default: postgres '%s' placeholders break sqlite3 — use a
    # dialect-compatible fake that records and rewrites
    import pyspark_postgres_loader_spark.pipeline as pipeline_mod

    real_load = pipeline_mod.load_to_database

    def spy_load(spark_, **kw):
        captured["dialect"] = kw["dialect"]
        kw["dialect"] = "sqlite"
        return real_load(spark_, **kw)

    monkeypatch.setattr(pipeline_mod, "load_to_database", spy_load)

    rc = cli.main([
        "--source", "csv",
        "--source_arg", f"path={src}",
        "--source_arg", "header=true",
        "--target_pg_table", "t",
        "--config", ini,
    ])
    assert rc == 0
    assert captured["params"]["dbname"] == "analytics"
    assert captured["dialect"] == "postgres"
    assert dict(conn.execute("SELECT id, v FROM t")) == {1: "a"}
    conn.close()


def test_tune_for_cluster_applies_and_returns(spark):
    from pyspark_postgres_loader_spark.session import tune_for_cluster

    saved = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.shuffle.partitions",
            "spark.sql.files.maxPartitionBytes",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        applied = tune_for_cluster(spark, total_cores=4000)
        assert applied["spark.sql.shuffle.partitions"] == "12000"
        assert spark.conf.get("spark.sql.shuffle.partitions") == "12000"
        assert (
            spark.conf.get("spark.sql.files.maxPartitionBytes")
            == str(128 * 1024 * 1024)
        )
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
