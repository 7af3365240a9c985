"""Relational + data-pipeline operators (SURVEY.md §2.2-2.3, §2.7 fills,
and the LLM-training-data operators: dedup, similarity, text, multimodal)."""
