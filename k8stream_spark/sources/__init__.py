from k8stream_spark.sources.fixtures import (
    DEFAULT_SF_DIR,
    load_table,
    load_tables,
    register_views,
)

__all__ = ["DEFAULT_SF_DIR", "load_table", "load_tables", "register_views"]
