from k8stream_spark.sources.fixtures import load_table, load_tables

__all__ = ["load_table", "load_tables"]
