"""Custom deduper registration — ``@liken_spark.custom.register``
(reference custom.py:70-164)."""

from liken_spark.operators.dedupers import register

__all__ = ["register"]
