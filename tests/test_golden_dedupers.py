"""Golden-vector parity matrix vs the reference's integration suite
(reference tests/integration/test_matrix_dedupers.py:77-180). Each case
asserts the exact canonical_id vector over the 10-row fixture, across the
three application APIs — at local[4]/8 shuffle partitions, i.e. with true
global clustering rather than the reference's single-partition rig."""

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


def simple_api(df, columns, deduper, kw):
    return lk.dedupe(df).apply(deduper(**kw)).canonicalize(columns).collect()


def dict_api(df, columns, deduper, kw):
    return lk.dedupe(df).apply({columns: [deduper(**kw)]}).canonicalize().collect()


def pipeline_api(df, columns, deduper, kw):
    pipe = lk.pipeline().step(getattr(lk.col(columns), deduper.__name__)(**kw))
    return lk.dedupe(df).apply(pipe).canonicalize().collect()


API_BUILDERS = [simple_api, dict_api, pipeline_api]


@lk.custom.register
def strings_same_len(array: typing.Iterable, min_len: int = 3):
    n = len(array)
    for i in range(n):
        for j in range(i + 1, n):
            if len(array[i]) >= min_len and len(array[j]) >= min_len and len(array[i]) == len(array[j]):
                yield i, j


# fmt: off
PARAMS = [
    # CUSTOM
    (strings_same_len, "email", {"min_len": 3}, [0, 1, 2, 3, 2, 2, 6, 3, 8, 9]),
    (strings_same_len, "email", {"min_len": 15}, [0, 1, 2, 3, 4, 5, 6, 3, 8, 9]),
    # EXACT
    (lk.exact, SINGLE_COL, {}, [0, 1, 2, 3, 4, 5, 6, 0, 4, 9]),
    (lk.exact, CATEGORICAL_COMPOUND_COL, {}, [0, 0, 2, 3, 4, 5, 6, 7, 8, 9]),
    # FUZZY
    (lk.fuzzy, SINGLE_COL, {"threshold": 0.95}, [0, 1, 2, 3, 4, 5, 6, 0, 4, 9]),
    (lk.fuzzy, SINGLE_COL, {"threshold": 0.95, "scorer": "partial_ratio"}, [0, 1, 2, 3, 2, 5, 6, 0, 2, 9]),
    (lk.fuzzy, SINGLE_COL, {"threshold": 0.85}, [0, 1, 2, 3, 4, 5, 6, 0, 4, 9]),
    (lk.fuzzy, SINGLE_COL, {"threshold": 0.75}, [0, 1, 2, 2, 4, 5, 6, 0, 4, 9]),
    (lk.fuzzy, SINGLE_COL, {"threshold": 0.65}, [0, 1, 2, 2, 4, 5, 1, 0, 4, 9]),
    (lk.fuzzy, SINGLE_COL, {"threshold": 0.55}, [0, 1, 2, 2, 4, 2, 1, 0, 4, 9]),
    (lk.fuzzy, SINGLE_COL, {"threshold": 0.45}, [0, 1, 2, 2, 4, 2, 1, 0, 4, 1]),
    (lk.fuzzy, SINGLE_COL, {"threshold": 0.35}, [0, 0, 2, 2, 4, 2, 0, 0, 4, 0]),
    (lk.fuzzy, SINGLE_COL, {"threshold": 0.25}, [0, 0, 0, 0, 4, 0, 0, 0, 4, 0]),
    # COSINE
    (lk.cosine, NUMERICAL_COMPOUND_COL, {"threshold": 0.999}, [0, 0, 0, 3, 0, 0, 6, 7, 0, 0]),
    (lk.cosine, NUMERICAL_COMPOUND_COL, {"threshold": 0.99}, [0, 0, 0, 0, 0, 0, 6, 7, 0, 0]),
    (lk.cosine, NUMERICAL_COMPOUND_COL, {"threshold": 0.98}, [0, 0, 0, 0, 0, 0, 6, 6, 0, 0]),
    # JACCARD
    (lk.jaccard, CATEGORICAL_COMPOUND_COL, {"threshold": 0.65}, [0, 0, 2, 3, 4, 0, 6, 7, 8, 9]),
    (lk.jaccard, CATEGORICAL_COMPOUND_COL, {"threshold": 0.35}, [0, 0, 2, 3, 0, 0, 3, 7, 0, 9]),
    # LSH: fix ngram, vary threshold
    (lk.lsh, SINGLE_COL, {"ngram": 1, "threshold": 0.95, "num_perm": 128}, [0, 1, 2, 3, 4, 5, 6, 0, 4, 9]),
    (lk.lsh, SINGLE_COL, {"ngram": 1, "threshold": 0.85, "num_perm": 128}, [0, 1, 2, 3, 4, 5, 6, 0, 4, 9]),
    (lk.lsh, SINGLE_COL, {"ngram": 1, "threshold": 0.75, "num_perm": 128}, [0, 1, 2, 3, 4, 5, 1, 0, 4, 9]),
    (lk.lsh, SINGLE_COL, {"ngram": 1, "threshold": 0.65, "num_perm": 128}, [0, 1, 2, 2, 4, 5, 1, 0, 4, 9]),
    (lk.lsh, SINGLE_COL, {"ngram": 1, "threshold": 0.55, "num_perm": 128}, [0, 1, 2, 2, 4, 2, 1, 0, 4, 9]),
    (lk.lsh, SINGLE_COL, {"ngram": 1, "threshold": 0.45, "num_perm": 128}, [0, 1, 2, 2, 4, 2, 1, 0, 4, 9]),
    (lk.lsh, SINGLE_COL, {"ngram": 1, "threshold": 0.35, "num_perm": 128}, [0, 1, 1, 1, 4, 1, 1, 0, 4, 0]),
    # LSH: fix threshold, vary ngram
    (lk.lsh, SINGLE_COL, {"ngram": 2, "threshold": 0.45, "num_perm": 128}, [0, 1, 2, 2, 4, 5, 6, 0, 4, 9]),
    (lk.lsh, SINGLE_COL, {"ngram": 3, "threshold": 0.45, "num_perm": 128}, [0, 1, 2, 3, 4, 5, 6, 0, 4, 9]),
    # LSH: vary permutations
    (lk.lsh, SINGLE_COL, {"ngram": 1, "threshold": 0.55, "num_perm": 32}, [0, 1, 2, 2, 4, 5, 1, 0, 4, 9]),
    (lk.lsh, SINGLE_COL, {"ngram": 1, "threshold": 0.55, "num_perm": 64}, [0, 1, 2, 2, 4, 5, 1, 0, 4, 9]),
    (lk.lsh, SINGLE_COL, {"ngram": 1, "threshold": 0.55, "num_perm": 128}, [0, 1, 2, 2, 4, 2, 1, 0, 4, 9]),
    # STR STARTSWITH
    (lk.str_startswith, SINGLE_COL, {"pattern": "zzzzz", "case": True}, [0, 1, 2, 3, 4, 5, 6, 7, 8, 9]),
    (lk.str_startswith, SINGLE_COL, {"pattern": "zzzzz", "case": False}, [0, 1, 2, 3, 4, 5, 6, 7, 8, 9]),
    (lk.str_startswith, SINGLE_COL, {"pattern": "calle", "case": True}, [0, 1, 2, 3, 4, 5, 6, 7, 8, 9]),
    (lk.str_startswith, SINGLE_COL, {"pattern": "calle", "case": False}, [0, 1, 2, 2, 4, 5, 6, 7, 8, 9]),
    # STR ENDSWITH
    (lk.str_endswith, SINGLE_COL, {"pattern": "zzzzz", "case": True}, [0, 1, 2, 3, 4, 5, 6, 7, 8, 9]),
    (lk.str_endswith, SINGLE_COL, {"pattern": "zzzzz", "case": False}, [0, 1, 2, 3, 4, 5, 6, 7, 8, 9]),
    (lk.str_endswith, SINGLE_COL, {"pattern": "kingdom", "case": True}, [0, 1, 2, 3, 4, 5, 6, 7, 8, 9]),
    (lk.str_endswith, SINGLE_COL, {"pattern": "kingdom", "case": False}, [0, 1, 2, 3, 4, 5, 6, 7, 8, 1]),
    # STR LEN
    (lk.str_len, "email", {"min_len": 10, "max_len": 9}, [0, 1, 2, 3, 4, 5, 6, 7, 8, 9]),
    (lk.str_len, "email", {"min_len": 101, "max_len": 201}, [0, 1, 2, 3, 4, 5, 6, 7, 8, 9]),
    (lk.str_len, "email", {}, [0, 0, 0, 0, 0, 0, 0, 0, 0, 0]),
    (lk.str_len, "email", {"min_len": 15, "max_len": 22}, [0, 1, 2, 0, 4, 5, 0, 0, 8, 9]),
    # STR CONTAINS
    (lk.str_contains, SINGLE_COL, {"pattern": "zzzzz", "case": True, "regex": True}, [0, 1, 2, 3, 4, 5, 6, 7, 8, 9]),
    (lk.str_contains, SINGLE_COL, {"pattern": "zzzzz", "case": False, "regex": True}, [0, 1, 2, 3, 4, 5, 6, 7, 8, 9]),
    (lk.str_contains, SINGLE_COL, {"pattern": "zzzzz", "case": True, "regex": False}, [0, 1, 2, 3, 4, 5, 6, 7, 8, 9]),
    (lk.str_contains, SINGLE_COL, {"pattern": "zzzzz", "case": False, "regex": False}, [0, 1, 2, 3, 4, 5, 6, 7, 8, 9]),
    (lk.str_contains, SINGLE_COL, {"pattern": "ol5 9pl", "case": True, "regex": False}, [0, 1, 2, 3, 4, 5, 6, 7, 8, 9]),
    (lk.str_contains, SINGLE_COL, {"pattern": "ol5 9pl", "case": False, "regex": False}, [0, 1, 2, 3, 4, 5, 6, 0, 8, 0]),
    (lk.str_contains, SINGLE_COL, {"pattern": r"05\d{3}", "case": True, "regex": True}, [0, 1, 2, 2, 4, 2, 6, 7, 8, 9]),
    (lk.str_contains, SINGLE_COL, {"pattern": r"05\d{3}", "case": False, "regex": True}, [0, 1, 2, 2, 4, 2, 6, 7, 8, 9]),
    # TFIDF: vary threshold
    (lk.tfidf, SINGLE_COL, {"ngram": 1, "threshold": 0.95, "topn": 2}, [0, 1, 2, 3, 4, 5, 6, 0, 4, 9]),
    (lk.tfidf, SINGLE_COL, {"ngram": 1, "threshold": 0.80, "topn": 2}, [0, 1, 2, 2, 4, 5, 1, 0, 4, 1]),
    (lk.tfidf, SINGLE_COL, {"ngram": 1, "threshold": 0.65, "topn": 2}, [0, 1, 2, 2, 4, 2, 1, 0, 4, 1]),
    (lk.tfidf, SINGLE_COL, {"ngram": 1, "threshold": 0.50, "topn": 2}, [0, 1, 2, 2, 4, 2, 1, 0, 4, 1]),
    # TFIDF: vary ngram
    (lk.tfidf, SINGLE_COL, {"ngram": (1, 2), "threshold": 0.80, "topn": 2}, [0, 1, 2, 2, 4, 5, 1, 0, 4, 9]),
    (lk.tfidf, SINGLE_COL, {"ngram": (1, 3), "threshold": 0.80, "topn": 2}, [0, 1, 2, 3, 4, 5, 6, 0, 4, 9]),
    (lk.tfidf, SINGLE_COL, {"ngram": (2, 3), "threshold": 0.80, "topn": 2}, [0, 1, 2, 3, 4, 5, 6, 0, 4, 9]),
    # TFIDF: vary topn
    (lk.tfidf, SINGLE_COL, {"ngram": 1, "threshold": 0.80, "topn": 1}, [0, 1, 2, 3, 4, 5, 6, 0, 4, 9]),
    (lk.tfidf, SINGLE_COL, {"ngram": 1, "threshold": 0.80, "topn": 3}, [0, 1, 2, 2, 4, 5, 1, 0, 4, 1]),
    # ISNA
    (lk.isna, SINGLE_COL, {}, [0, 1, 2, 3, 4, 5, 6, 7, 4, 9]),
]
# fmt: on


@pytest.mark.parametrize("deduper, columns, kw, expected", PARAMS)
@pytest.mark.parametrize("api_builder", API_BUILDERS)
def test_matrix_dedupers(deduper, columns, kw, expected, api_builder, dataframe):
    df = api_builder(dataframe, columns, deduper, kw)
    assert column_as_list(df, CANONICAL_ID) == expected
