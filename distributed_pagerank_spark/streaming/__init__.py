"""Structured Streaming surface (windowed event aggregation)."""
