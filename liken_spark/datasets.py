"""Built-in demo datasets (reference: src/liken/datasets.py).

``fake_10`` reproduces the reference's golden 10-row fixture verbatim
(datasets.py:27-44) — every golden canonical_id vector is defined against
this data in this order. The larger generators produce deterministic
synthetic person records (the reference's fake_1K/100K/1M are
Faker-backed and only partially seeded, datasets.py:96-97; ours are fully
deterministic).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

_SCHEMA10 = (
    "id long, address string, email string, account string, "
    "birth_country string, marital_status string, number_children long, "
    "property_type string, property_height double, property_area_sq_ft long, "
    "property_sea_level_elevation_m long, property_num_rooms long"
)

_DATA10 = [
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


def fake_10(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(_DATA10, _SCHEMA10)


_FIRST = ["ana", "bo", "carla", "dev", "ed", "fay", "gus", "hana", "ivo", "jo"]
_LAST = ["smith", "garcia", "chen", "kumar", "okafor", "silva", "novak", "ali"]
_STREET = ["high st", "park ave", "station rd", "mill lane", "church way"]
_CITY = ["leeds", "porto", "lyon", "graz", "turin", "lodz"]


def _rng(seed: int, idx: int) -> np.random.Generator:
    h = hashlib.blake2b(np.array([seed, idx], dtype=np.int64).tobytes(), digest_size=8)
    return np.random.default_rng(int.from_bytes(h.digest(), "little"))


def fake_people(spark: SparkSession, n: int, seed: int = 123, dup_rate: float = 0.15) -> DataFrame:
    """n synthetic person rows with a deterministic fraction of planted
    near-duplicates (typo'd copies of an earlier row)."""
    partitions = max(spark.sparkContext.defaultParallelism, 4)

    def gen(iterator):
        for pdf in iterator:
            rows = []
            for idx in pdf["id"].tolist():
                rng = _rng(seed, idx)
                if idx > 0 and rng.random() < dup_rate:
                    src = int(rng.integers(0, idx))
                    srng = _rng(seed, src)
                    first = str(srng.choice(_FIRST))
                    last = str(srng.choice(_LAST))
                    addr = f"{int(srng.integers(1, 99))} {srng.choice(_STREET)}, {srng.choice(_CITY)}"
                    # plant a typo
                    if len(addr) > 5:
                        pos = int(rng.integers(0, len(addr)))
                        addr = addr[:pos] + "x" + addr[pos + 1 :]
                else:
                    first = str(rng.choice(_FIRST))
                    last = str(rng.choice(_LAST))
                    addr = f"{int(rng.integers(1, 99))} {rng.choice(_STREET)}, {rng.choice(_CITY)}"
                email = None if rng.random() < 0.03 else f"{first}.{last}{int(rng.integers(1, 99))}@example.com"
                rows.append((idx, f"{first} {last}", addr, email))
            yield pd.DataFrame(rows, columns=["id", "name", "address", "email"])

    return spark.range(0, n, numPartitions=partitions).mapInPandas(
        gen, "id long, name string, address string, email string"
    )


def fake_1k(spark: SparkSession) -> DataFrame:
    return fake_people(spark, 1_000)


def fake_100k(spark: SparkSession) -> DataFrame:
    return fake_people(spark, 100_000)


def fake_1m(spark: SparkSession) -> DataFrame:
    return fake_people(spark, 1_000_000)
