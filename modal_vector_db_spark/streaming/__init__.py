"""Structured Streaming surface (SURVEY §2.10 extension)."""
