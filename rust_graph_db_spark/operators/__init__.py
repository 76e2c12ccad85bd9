"""Distributed operators: traversal, dedup, similarity, text, multimodal."""
