"""keep="first"/"last" and predicate-negation golden vectors
(reference test_matrix_keep.py:88-129 and test_matrix_negates.py:13-29)."""

from __future__ import annotations

import typing

import pytest

import liken_spark as lk
from liken_spark.constants import CANONICAL_ID
from tests.conftest import (
    CATEGORICAL_COMPOUND_COL,
    NUMERICAL_COMPOUND_COL,
    column_as_list,
)

SINGLE_COL = "address"


@lk.custom.register
def keep_strings_same_len(array: typing.Iterable, min_len: int = 3):
    n = len(array)
    for i in range(n):
        for j in range(i + 1, n):
            if len(array[i]) >= min_len and len(array[j]) >= min_len and len(array[i]) == len(array[j]):
                yield i, j


# fmt: off
KEEP_PARAMS = [
    (keep_strings_same_len, "first", "email", {"min_len": 3}, [0, 1, 2, 3, 2, 2, 6, 3, 8, 9]),
    (keep_strings_same_len, "last", "email", {"min_len": 3}, [0, 1, 5, 7, 5, 5, 6, 7, 8, 9]),
    (lk.exact, "first", SINGLE_COL, {}, [0, 1, 2, 3, 4, 5, 6, 0, 4, 9]),
    (lk.exact, "last", SINGLE_COL, {}, [7, 1, 2, 3, 8, 5, 6, 7, 8, 9]),
    (lk.exact, "first", CATEGORICAL_COMPOUND_COL, {}, [0, 0, 2, 3, 4, 5, 6, 7, 8, 9]),
    (lk.exact, "last", CATEGORICAL_COMPOUND_COL, {}, [1, 1, 2, 3, 4, 5, 6, 7, 8, 9]),
    (lk.fuzzy, "first", SINGLE_COL, {"threshold": 0.65}, [0, 1, 2, 2, 4, 5, 1, 0, 4, 9]),
    (lk.fuzzy, "last", SINGLE_COL, {"threshold": 0.65}, [7, 6, 3, 3, 8, 5, 6, 7, 8, 9]),
    (lk.cosine, "first", NUMERICAL_COMPOUND_COL, {"threshold": 0.99}, [0, 0, 0, 0, 0, 0, 6, 7, 0, 0]),
    (lk.cosine, "last", NUMERICAL_COMPOUND_COL, {"threshold": 0.99}, [9, 9, 9, 9, 9, 9, 6, 7, 9, 9]),
    (lk.jaccard, "first", CATEGORICAL_COMPOUND_COL, {"threshold": 0.65}, [0, 0, 2, 3, 4, 0, 6, 7, 8, 9]),
    (lk.jaccard, "last", CATEGORICAL_COMPOUND_COL, {"threshold": 0.65}, [5, 5, 2, 3, 4, 5, 6, 7, 8, 9]),
    (lk.lsh, "first", SINGLE_COL, {"ngram": 2, "threshold": 0.45, "num_perm": 128}, [0, 1, 2, 2, 4, 5, 6, 0, 4, 9]),
    (lk.lsh, "last", SINGLE_COL, {"ngram": 2, "threshold": 0.45, "num_perm": 128}, [7, 1, 3, 3, 8, 5, 6, 7, 8, 9]),
    (lk.str_startswith, "first", SINGLE_COL, {"pattern": "calle", "case": False}, [0, 1, 2, 2, 4, 5, 6, 7, 8, 9]),
    (lk.str_startswith, "last", SINGLE_COL, {"pattern": "calle", "case": False}, [0, 1, 3, 3, 4, 5, 6, 7, 8, 9]),
    (lk.str_endswith, "first", SINGLE_COL, {"pattern": "kingdom", "case": False}, [0, 1, 2, 3, 4, 5, 6, 7, 8, 1]),
    (lk.str_endswith, "last", SINGLE_COL, {"pattern": "kingdom", "case": False}, [0, 9, 2, 3, 4, 5, 6, 7, 8, 9]),
    (lk.str_contains, "first", SINGLE_COL, {"pattern": "ol5 9pl", "case": False, "regex": False}, [0, 1, 2, 3, 4, 5, 6, 0, 8, 0]),
    (lk.str_contains, "last", SINGLE_COL, {"pattern": "ol5 9pl", "case": False, "regex": False}, [9, 1, 2, 3, 4, 5, 6, 9, 8, 9]),
    (lk.tfidf, "first", SINGLE_COL, {"ngram": (1, 2), "threshold": 0.80, "topn": 2}, [0, 1, 2, 2, 4, 5, 1, 0, 4, 9]),
    (lk.tfidf, "last", SINGLE_COL, {"ngram": (1, 2), "threshold": 0.80, "topn": 2}, [7, 6, 3, 3, 8, 5, 6, 7, 8, 9]),
]
# fmt: on


@pytest.mark.parametrize("deduper, keep, columns, kw, expected", KEEP_PARAMS)
def test_matrix_keep(deduper, keep, columns, kw, expected, dataframe):
    df = lk.dedupe(dataframe).apply(deduper(**kw)).canonicalize(columns, keep=keep).collect()
    assert column_as_list(df, CANONICAL_ID) == expected


# fmt: off
NEGATE_PARAMS = [
    (lambda: lk.col("email").str_len(min_len=15, max_len=22), [0, 1, 2, 0, 4, 5, 0, 0, 8, 9]),
    (lambda: ~lk.col("email").str_len(min_len=15, max_len=22), [0, 1, 1, 3, 1, 1, 6, 7, 1, 1]),
    (lambda: lk.col("email").str_startswith(pattern="a"), [0, 1, 1, 3, 4, 5, 6, 7, 8, 9]),
    (lambda: ~lk.col("email").str_startswith(pattern="a"), [0, 1, 2, 0, 0, 0, 0, 0, 0, 0]),
    (lambda: lk.col("email").str_endswith(pattern=".com"), [0, 0, 0, 0, 0, 0, 0, 0, 0, 0]),
    (lambda: ~lk.col("email").str_endswith(pattern=".com"), [0, 1, 2, 3, 4, 5, 6, 7, 8, 9]),
    (lambda: lk.col("email").str_contains(pattern="@example"), [0, 1, 0, 0, 0, 0, 0, 0, 8, 0]),
    (lambda: ~lk.col("email").str_contains(pattern="@example"), [0, 1, 2, 3, 4, 5, 6, 7, 1, 9]),
    (lambda: lk.col("address").isna(), [0, 1, 2, 3, 4, 5, 6, 7, 4, 9]),
    (lambda: ~lk.col("address").isna(), [0, 0, 0, 0, 4, 0, 0, 0, 8, 0]),
]
# fmt: on


@pytest.mark.parametrize("build, expected", NEGATE_PARAMS)
def test_matrix_negates(build, expected, dataframe):
    df = lk.dedupe(dataframe).apply(lk.pipeline().step(build())).canonicalize().collect()
    assert column_as_list(df, CANONICAL_ID) == expected
