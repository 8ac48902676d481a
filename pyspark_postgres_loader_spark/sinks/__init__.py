from .sql_builder import Dialect, build_insert_sql, build_upsert_sql
from .upsert import LoadStats, upsert_dataframe

__all__ = [
    "Dialect",
    "build_insert_sql",
    "build_upsert_sql",
    "LoadStats",
    "upsert_dataframe",
]
