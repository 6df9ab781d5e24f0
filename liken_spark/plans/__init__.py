"""Logical-plan layer: the user-facing deduper-collection DSL and its
compilation into executor steps."""
