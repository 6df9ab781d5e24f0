"""Shared fixtures.

The 10-row golden dataset reproduces the reference's ``fake_10`` fixture
verbatim (reference src/liken/datasets.py:27-44 — every golden canonical_id
vector is defined against this data in this order; see FIXTURES.md §1).

Unlike the reference's test rig (local[1], 1 shuffle partition so that
per-partition == global, reference tests/conftest.py:50-66), we run at
local[4] with several shuffle partitions: this engine must produce the
*global* golden vectors at any parallelism.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

FAKE10_SCHEMA = (
    "id long, address string, email string, account string, "
    "birth_country string, marital_status string, number_children long, "
    "property_type string, property_height double, property_area_sq_ft long, "
    "property_sea_level_elevation_m long, property_num_rooms long"
)

FAKE10_ROWS = [
    (1, "123ab, OL5 9PL, UK", "bbab@example.com", "reddit", "spain", "married", 1, "rental", None, 545, 5, 3),
    (2, "99 Ambleside avenue park Road, ED3 3RT, Edinburgh, United Kingdom", "awesome_surfer_77@yahoo.com", "reddit", "spain", "married", 1, "rental", None, 452, 6, 3),
    (3, "Calle Ancho, 12, 05688, Rioja, Navarra, Espana", "a@example.com", "facebook", "germany", "single", 2, "rental", 2.5, 623, 5, 3),
    (4, "Calle Sueco, 56, 05688, Rioja, Navarra", "hellothere@example.com", "pinterest", "japan", "married", 0, "owner", 4.0, 2077, 305, 6),
    (5, None, "b@example.com", "linkedin", "france", "married", 1, "rental", 2.7, 1045, 42, 4),
    (6, "C. Ancho 49, 05687, Navarra", "b@example.com", "reddit", "japan", "married", 1, "rental", 2.5, 1323, 132, 4),
    (7, "Ambleside avenue Park Road ED3, UK", "hellthere@example.com", "reddit", "germany", "married", 0, "owner", 2.5, 509, 200, 2),
    (8, "123ab, OL5 9PL, UK", "hellathere@example.com", "facebook", "japan", "single", 3, "owner", 2.5, 500, 300, 3),
    (9, None, "yet.another.email@msn.com", "flickr", "germany", "married", 1, "rental", 2.5, 345, 22, 3),
    (10, "66b Porters street, OL5 9PL, Newark, United Kingdom", "bab@example.com", "flickr", "malaysia", "single", 0, "owner", 2.5, 4000, 25, 8),
]

CATEGORICAL_COMPOUND_COL = (
    "account", "birth_country", "marital_status", "number_children", "property_type",
)
NUMERICAL_COMPOUND_COL = (
    "property_height", "property_area_sq_ft", "property_sea_level_elevation_m", "property_num_rooms",
)


@pytest.fixture(scope="session")
def spark():
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("liken-spark-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "3g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    yield spark
    spark.stop()


@pytest.fixture
def dataframe(spark):
    return spark.createDataFrame(FAKE10_ROWS, FAKE10_SCHEMA)


def column_as_list(df, column):
    return [r[column] for r in df.select(column).collect()]


@pytest.fixture
def get_col():
    return column_as_list
