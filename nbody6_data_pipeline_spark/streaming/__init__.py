"""Structured Streaming surface (post-parity extension, SURVEY §2.10)."""
