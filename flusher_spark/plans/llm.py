"""LLM-data-pipeline operator queries (dedup, similarity, text analysis,
multimodal) — populated as the operators land (operators/*.py)."""
