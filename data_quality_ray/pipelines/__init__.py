"""Composed pipelines: the flagship quality filter and relational operators."""
