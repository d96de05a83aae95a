from sparkga1_spark.sources.catalog import load_tables, table_names

__all__ = ["load_tables", "table_names"]
