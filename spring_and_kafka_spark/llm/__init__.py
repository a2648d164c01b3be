"""LLM-training-data pipeline operators (SURVEY.md §2.10): dedup,
similarity search, text analysis, multimodal columns, embedding stubs."""
