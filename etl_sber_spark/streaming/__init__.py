"""Structured Streaming variant of the file-inbox pipeline."""
