"""LLM-data-pipeline query catalog (SURVEY §2.14) — filled in as the
llm package lands: dedup, similarity search, text analysis, multimodal.
"""
