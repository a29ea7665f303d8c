"""Composite relational operators: SCD maintenance, dedup, similarity."""
