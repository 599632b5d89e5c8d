"""LLM-data-pipeline operator suite (dedup, similarity, text
analysis) on the documents/embeddings fixtures. Filled in after
core parity — see llm_ops/."""

from __future__ import annotations

QUERIES: dict = {}
ORACLES: dict = {}
