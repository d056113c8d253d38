from .catalog import DEFAULT_SF_DIR, TABLES, load_table, register_views, write_parquet  # noqa: F401
