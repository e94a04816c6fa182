from noaa_oracle_spark.sql.rewriter import register_raw_tables, rewrite_duckdb_sql

__all__ = ["register_raw_tables", "rewrite_duckdb_sql"]
