"""Reference-parity operators (SURVEY.md §2), each a pure
``DataFrame -> DataFrame`` function so the same code binds in batch mode
(the DuckDB-oracle correctness harness) and under Structured Streaming.
"""

from k8stream_spark.ops import dedup, filters, joins, project

__all__ = ["dedup", "filters", "joins", "project"]
