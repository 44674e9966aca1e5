"""Structured Streaming expressions of the engine's windowed/dedup operators."""
