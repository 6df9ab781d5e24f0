"""Structured Streaming surface: incremental dedup over append streams."""
