"""Import-and-run harness for the reference implementation at
/root/reference (read-only). We stub its unavailable third-party deps
(polars, rapidfuzz, datasketch, sklearn, ... are not installed here) just
far enough that the pandas backend works for the dedupers whose own deps
ARE available (exact, cosine, jaccard, isna/isin/str_*, custom).

This is a test-only oracle: the engine never imports anything from here.
"""

from __future__ import annotations

import sys
from unittest.mock import MagicMock


class _Registry:
    """Functional stand-in for the tiny `catalogue` registry package."""

    def __init__(self, *a, **k):
        self._d = {}

    def register(self, name, *, func=None):
        if func is not None:
            self._d[name] = func
            return func

        def deco(f):
            self._d[name] = f
            return f

        return deco

    def get(self, name):
        return self._d[name]

    def get_all(self):
        return dict(self._d)


class _CatalogueModule:
    Registry = _Registry

    @staticmethod
    def create(*a, **k):
        return _Registry()


_STUBS = [
    "polars", "modin", "modin.pandas", "rapidfuzz", "datasketch",
    "sklearn", "sklearn.feature_extraction", "sklearn.feature_extraction.text",
    "scipy", "scipy.sparse", "sparse_dot_topn", "nltk", "nltk.corpus",
    "nameparser", "cleanco", "faker", "dask", "dask.dataframe",
    "ray", "ray.data",
]


def load_reference():
    """Returns the reference `liken` module (pandas backend usable)."""
    if "liken" in sys.modules:
        return sys.modules["liken"]
    for name in _STUBS:
        sys.modules.setdefault(name, MagicMock())
    sys.modules["catalogue"] = _CatalogueModule()
    sys.modules["faker"].Faker = MagicMock()
    sys.path.insert(0, "/root/reference/src")
    import liken

    return liken
