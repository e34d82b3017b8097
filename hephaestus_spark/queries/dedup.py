"""Placeholder — filled in as operators are implemented."""
