"""LLM-data-pipeline operators (SURVEY §2.14 / BASELINE.json north star):
deduplication, similarity search, text analysis, multimodal columns.

These are first-class engine components designed for the 100 TB case:
everything is expressed as Catalyst-visible DataFrame expressions (no
row-at-a-time Python in any hot path); the only Python workers are the
Arrow-batched multimodal decode stubs, which are I/O-shaped by nature.
"""

from data_pipeline_with_spark_spark.llm import (
    dedup,
    multimodal,
    packing,
    similarity,
    text,
)

__all__ = ["dedup", "multimodal", "packing", "similarity", "text"]
