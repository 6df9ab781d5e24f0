"""AND-step combination, rule predication, id modes, drop semantics,
synthesize/canonicals goldens (reference test_matrix_and.py:47-62,
test_matrix_id.py:19-152, test_matrix_drop.py:84-130,
test_matrix_synthesize.py:17-73)."""

from __future__ import annotations

import typing

import pytest

import liken_spark as lk
from liken_spark.constants import CANONICAL_ID
from tests.conftest import CATEGORICAL_COMPOUND_COL, column_as_list

SINGLE_COL = "address"


@lk.custom.register
def str_same_len(array: typing.Iterable):
    n = len(array)
    for i in range(n):
        for j in range(i + 1, n):
            if len(array[i]) == len(array[j]):
                yield i, j


@lk.custom.register
def drop_strings_same_len(array: typing.Iterable, min_len: int = 3):
    n = len(array)
    for i in range(n):
        for j in range(i + 1, n):
            if len(array[i]) >= min_len and len(array[j]) >= min_len and len(array[i]) == len(array[j]):
                yield i, j


# fmt: off
AND_PARAMS = [
    ([lambda: lk.col("email").fuzzy(0.95)], [0, 1, 2, 3, 4, 4, 3, 3, 8, 0]),
    ([lambda: lk.col("email").fuzzy(0.95), lambda: lk.col("email").str_same_len()], [0, 1, 2, 3, 4, 4, 6, 3, 8, 9]),
    ([lambda: lk.col("address").fuzzy(0.70)], [0, 1, 2, 2, 4, 5, 6, 0, 4, 9]),
    ([lambda: lk.col("address").fuzzy(0.70), lambda: lk.col("address").str_same_len()], [0, 1, 2, 3, 4, 5, 6, 0, 4, 9]),
    ([lambda: lk.col("address").fuzzy(0.70), lambda: ~lk.col("address").isna()], [0, 1, 2, 2, 4, 5, 6, 0, 8, 9]),
    ([lambda: lk.col("account").exact()], [0, 0, 2, 3, 4, 0, 0, 2, 8, 8]),
    ([lambda: lk.col("property_height").isna(), lambda: lk.col("account").exact()], [0, 0, 2, 3, 4, 5, 6, 7, 8, 9]),
    ([lambda: lk.col("birth_country").exact(), lambda: lk.col("marital_status").exact()], [0, 0, 2, 3, 4, 3, 6, 7, 6, 9]),
]
# fmt: on


@pytest.mark.parametrize("step_builders, expected", AND_PARAMS)
def test_matrix_and(step_builders, expected, dataframe):
    step = [b() for b in step_builders]
    df = lk.dedupe(dataframe).apply(lk.pipeline().step(step)).canonicalize().collect()
    assert column_as_list(df, CANONICAL_ID) == expected


# --- id modes (reference test_matrix_id.py) --------------------------------

ID_PARAMS = [
    (None, "uid long, address string",
     [(1, "123ab, OL5"), (2, "Westside Avenue"), (3, "123ab, OL5")], [0, 1, 0]),
    ("uid", "uid long, address string",
     [(1, "123ab, OL5"), (2, "Westside Avenue"), (3, "123ab, OL5")], [1, 2, 1]),
    ("uid", "uid string, address string",
     [("a001", "123ab, OL5"), ("a002", "Westside Avenue"), ("a003", "123ab, OL5")],
     ["a001", "a002", "a001"]),
    (None, "uid long, address string, canonical_id long",
     [(1, "123ab, OL5", 10), (2, "Westside Avenue", 12), (3, "123ab, OL5", 10)], [10, 12, 10]),
    # iterative dedup: appended row with fresh id re-canonicalizes to the old id
    (None, "uid long, address string, canonical_id long",
     [(1, "123ab, OL5", 10), (2, "Westside Avenue", 12), (3, "123ab, OL5", 13)], [10, 12, 10]),
    ("canonical_id", "uid long, address string, canonical_id long",
     [(1, "123ab, OL5", 10), (2, "Westside Avenue", 12), (3, "123ab, OL5", 10)], [10, 12, 10]),
    # overwrite pre-existing canonical_id from another column
    ("uid", "uid long, address string, canonical_id long",
     [(1, "123ab, OL5", 10), (2, "Westside Avenue", 12), (3, "123ab, OL5", 13)], [1, 2, 1]),
]


@pytest.mark.parametrize("id_arg, schema, rows, expected", ID_PARAMS)
def test_matrix_id(id_arg, schema, rows, expected, spark):
    df = spark.createDataFrame(rows, schema)
    out = lk.dedupe(df).apply(lk.exact()).canonicalize("address", id=id_arg).collect()
    assert column_as_list(out, CANONICAL_ID) == expected


# --- drop semantics (reference test_matrix_drop.py) -------------------------

# fmt: off
DROP_PARAMS = [
    (drop_strings_same_len, "email", False, {"min_len": 3}, [0, 1, 2, 3, 2, 2, 6, 3, 8, 9]),
    (drop_strings_same_len, "email", True, {"min_len": 3}, [0, 1, 2, 3, 6, 8, 9]),
    (lk.exact, SINGLE_COL, False, {}, [0, 1, 2, 3, 4, 5, 6, 0, 4, 9]),
    (lk.exact, SINGLE_COL, True, {}, [0, 1, 2, 3, 4, 5, 6, 9]),
    (lk.exact, CATEGORICAL_COMPOUND_COL, False, {}, [0, 0, 2, 3, 4, 5, 6, 7, 8, 9]),
    (lk.exact, CATEGORICAL_COMPOUND_COL, True, {}, [0, 2, 3, 4, 5, 6, 7, 8, 9]),
    (lk.fuzzy, SINGLE_COL, True, {"threshold": 0.65}, [0, 1, 2, 4, 5, 9]),
    (lk.lsh, SINGLE_COL, True, {"ngram": 1, "threshold": 0.65, "num_perm": 128}, [0, 1, 2, 4, 5, 9]),
    (lk.tfidf, SINGLE_COL, True, {"ngram": 1, "threshold": 0.80, "topn": 2}, [0, 1, 2, 4, 5]),
    (lk.str_contains, SINGLE_COL, True, {"pattern": r"05\d{3}", "case": False, "regex": True}, [0, 1, 2, 4, 6, 7, 8, 9]),
]
# fmt: on


@pytest.mark.parametrize("deduper, columns, drop, kw, expected", DROP_PARAMS)
def test_matrix_drop(deduper, columns, drop, kw, expected, dataframe):
    out = (
        lk.dedupe(dataframe)
        .apply(deduper(**kw))
        .canonicalize(columns, drop_duplicates=drop)
        .collect()
    )
    assert column_as_list(out, CANONICAL_ID) == expected


def test_drop_duplicates_drops_canonical(dataframe):
    out = lk.dedupe(dataframe).apply(lk.exact()).drop_duplicates(SINGLE_COL)
    assert CANONICAL_ID not in out.columns
    assert [r["id"] for r in out.collect()] == [1, 2, 3, 4, 5, 6, 7, 10]


# --- synthesize / canonicals (reference test_matrix_synthesize.py) ----------


def test_synthesize_and_canonicals(spark):
    schema = "address string, email string, state string, random string, country string"
    rows = [
        ("123ab, OL5", "hello@example.com", None, "A", None),
        ("123ab, OL5", None, None, "B", "Germany"),
        ("Completely random address", None, None, "C", "Spain"),
        ("55 bling blong road", None, None, "D", "Ireland"),
        ("55 bling blong road", "byebye@aol.ir", "Texas", "E", None),
    ]
    df = spark.createDataFrame(rows, schema)
    result = lk.dedupe(df).apply(lk.exact()).canonicalize("address")
    out = result.collect()
    assert column_as_list(out, CANONICAL_ID) == [0, 0, 2, 3, 3]

    synthesized = result.synthesize()
    assert column_as_list(synthesized, "address") == [
        "123ab, OL5", "Completely random address", "55 bling blong road",
    ]
    assert column_as_list(synthesized, "email") == ["hello@example.com", None, "byebye@aol.ir"]
    assert column_as_list(synthesized, "state") == [None, None, "Texas"]
    assert column_as_list(synthesized, "random") == ["A", "C", "D"]
    assert column_as_list(synthesized, "country") == ["Germany", "Spain", "Ireland"]

    assert result.canonicals() == {0: 2, 3: 2}


def test_canonicals_requires_canonicalize(dataframe):
    d = lk.dedupe(dataframe).apply(lk.exact())
    with pytest.raises(RuntimeError):
        d.canonicals()


# --- preprocessor precedence goldens (reference test_matrix_preprocessors) --

PREP_PARAMS = [
    ([], [(0, "   123ab, OL5 "), (1, "123ab, OL5")], [0, 1]),
    ([lk.preprocessors.strip()], [(0, "   123ab, OL5 "), (1, "123ab, OL5")], [0, 0]),
    ([], [(0, "123AB, OL5"), (1, "123ab, OL5")], [0, 1]),
    ([lk.preprocessors.lower()], [(0, "123AB, OL5"), (1, "123ab, OL5")], [0, 0]),
    ([], [(0, "123ab, OL5"), (1, "123ab, OL5!!!")], [0, 1]),
    ([lk.preprocessors.alnum()], [(0, "123ab, OL5"), (1, "123ab, OL5!!!")], [0, 0]),
    ([], [(0, "123ab, OL5, UK"), (1, "123ab OL5 UK")], [0, 1]),
    ([lk.preprocessors.remove_punctuation()], [(0, "123ab, OL5, UK"), (1, "123ab OL5 UK")], [0, 0]),
    # NFC vs NFD encodings of the same visible text (the reference fixture
    # stores two different byte sequences)
    ([], [(0, "Râñdòm Stréèt"), (1, __import__("unicodedata").normalize("NFD", "Râñdòm Stréèt"))], [0, 1]),
    ([lk.preprocessors.normalize_unicode()],
     [(0, "Râñdòm Stréèt"), (1, __import__("unicodedata").normalize("NFD", "Râñdòm Stréèt"))], [0, 0]),
    ([], [(0, "Râñdòm Stréèt"), (1, "Random Street")], [0, 1]),
    ([lk.preprocessors.ascii_fold()], [(0, "Râñdòm Stréèt"), (1, "Random Street")], [0, 0]),
    ([], [(0, "this is a Random Street"), (1, "   Random Street")], [0, 1]),
    ([lk.preprocessors.remove_stopwords()], [(0, "this is a Random Street"), (1, "   Random Street")], [0, 0]),
    ([], [(0, "Mr. John H Doe (Da Legend)"), (1, "John H Doe")], [0, 1]),
    ([lk.preprocessors.normalize_names()], [(0, "Mr. John H Doe (Da Legend)"), (1, "John H Doe")], [0, 0]),
    ([], [(0, "Random Services LLC."), (1, "Random Services")], [0, 1]),
    ([lk.preprocessors.normalize_company()], [(0, "Random Services LLC."), (1, "Random Services")], [0, 0]),
]


def _pipe_global(preps):
    return lk.pipeline(preprocessors=preps).step(lk.col("address").exact())


def _pipe_step(preps):
    return lk.pipeline().step(lk.col("address").exact(), preprocessors=preps)


def _pipe_col(preps):
    return lk.pipeline().step(lk.col("address", preprocessors=preps).exact())


@pytest.mark.parametrize("preps, rows, expected", PREP_PARAMS)
@pytest.mark.parametrize("builder", [_pipe_global, _pipe_step, _pipe_col])
def test_matrix_preprocessors(preps, rows, expected, builder, spark):
    # NB: the first case row has unicode chars in `rows` — build with schema
    df = spark.createDataFrame(rows, "uid long, address string")
    out = lk.dedupe(df).apply(builder(preps)).canonicalize().collect()
    assert column_as_list(out, CANONICAL_ID) == expected
