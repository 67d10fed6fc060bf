"""Operator library: transpose shapes, relational helpers, and the
LLM-data-pipeline extension operators (dedup, similarity, text, multimodal)."""
