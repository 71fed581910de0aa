"""Operator library: cleaning, dedup, similarity, text, multimodal."""
