from .parquet import TPCH_TABLES, load_table, load_tables  # noqa: F401
