"""LLM-data-pipeline operators: text analysis, dedup, similarity, multimodal."""
