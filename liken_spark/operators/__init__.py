"""Deduplication operators: spec classes (the logical DSL nodes), their
Spark physical implementations, and the distributed clustering/canonical-
ization machinery."""
