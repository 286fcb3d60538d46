"""Analytics extension layer (SURVEY.md §7.2 M6).

The reference explicitly delegates analytics to the sink's consumer
(reference README.md:18-19, 38-41) — this package is that consumer,
Spark-first: the offline OLAP queries plus the LLM-training-data-pipeline
operators (dedup, similarity search, text analysis, multimodal columns)
over the driver's ``documents``/``embeddings`` tables.
"""

from k8stream_spark.analytics import (
    dedup,
    events,
    multimodal,
    similarity,
    text,
    tpch,
)

__all__ = ["dedup", "events", "multimodal", "similarity", "text", "tpch"]
