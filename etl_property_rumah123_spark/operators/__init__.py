"""Operators: reference-fidelity cleaning plus the LLM-data-pipeline
extension layer (dedup, similarity search, text analysis, multimodal)."""
