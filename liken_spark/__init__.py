"""liken_spark — a from-scratch PySpark-native near-duplicate detection and
clustering engine, reproducing the reference dedup DSL's semantics
(VictorAut/liken, surveyed in SURVEY.md) with globally-correct distributed
execution: vectorized signature UDFs, LSH band shuffles, distributed
connected components — no driver-side row processing anywhere.

Public API mirrors the reference (``import liken_spark as lk``):

    lk.dedupe(df).apply(lk.exact()).drop_duplicates("address")
    lk.dedupe(df).apply({"address": (lk.exact(), lk.tfidf())}).canonicalize()
    lk.pipeline().step([lk.col("email").fuzzy(), ~lk.col("address").isna()])
"""

from liken_spark import custom, preprocess as preprocessors
from liken_spark.api import Dedupe, dedupe
from liken_spark.constants import CANONICAL_ID
from liken_spark.operators.dedupers import (
    cosine,
    exact,
    fuzzy,
    isin,
    isna,
    jaccard,
    lsh,
    str_contains,
    str_endswith,
    str_len,
    str_startswith,
    tfidf,
)
from liken_spark.operators.textdedup import simhash, substring
from liken_spark.plans.pipeline import Col, Pipeline, col, pipeline
from liken_spark.session import get_spark

__version__ = "0.1.0"

__all__ = [
    "CANONICAL_ID",
    "Col",
    "Dedupe",
    "Pipeline",
    "col",
    "cosine",
    "custom",
    "dedupe",
    "exact",
    "fuzzy",
    "get_spark",
    "isin",
    "isna",
    "jaccard",
    "lsh",
    "pipeline",
    "preprocessors",
    "simhash",
    "str_contains",
    "substring",
    "str_endswith",
    "str_len",
    "str_startswith",
    "tfidf",
]
