"""Streaming-window query catalog (SURVEY §2.13) — batch-checkable
window aggregations over events; true streaming lives in streaming/.
"""
