"""Pluggable table catalog: Iceberg when the session has an Iceberg
catalog configured, plain parquet directories otherwise.

The north rule targets Iceberg tables; this sandbox's pyspark ships no
Iceberg runtime jar, so the writer/reader API is abstracted: both
implementations expose the same ``write(name, df, partition_by)`` /
``read(name)`` surface, and the checkpoint/lineage metadata (see
sources/checkpoint.py) is identical in both. On a real cluster, start the
session with e.g.

    --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver>
    --conf spark.sql.catalog.lake=org.apache.iceberg.spark.SparkCatalog
    --conf spark.sql.catalog.lake.type=hadoop
    --conf spark.sql.catalog.lake.warehouse=<path>

and ``resolve_catalog(spark, "lake", ...)`` returns the Iceberg-backed
implementation automatically.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


class Catalog:
    def write(self, name: str, df: DataFrame, partition_by: list[str] | None = None) -> None:
        raise NotImplementedError

    def read(self, name: str) -> DataFrame:
        raise NotImplementedError

    def exists(self, name: str) -> bool:
        raise NotImplementedError


@dataclass
class IcebergCatalog(Catalog):
    """Iceberg tables via the DataFrameWriterV2 API."""

    spark: SparkSession
    catalog: str
    namespace: str = "liken"

    def _ident(self, name: str) -> str:
        return f"{self.catalog}.{self.namespace}.{name}"

    def write(self, name: str, df: DataFrame, partition_by: list[str] | None = None) -> None:
        self.spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {self.catalog}.{self.namespace}")
        writer = df.writeTo(self._ident(name))
        if partition_by:
            from pyspark.sql import functions as F

            writer = writer.partitionedBy(*[F.col(c) for c in partition_by])
        writer.createOrReplace()

    def read(self, name: str) -> DataFrame:
        return self.spark.read.table(self._ident(name))

    def exists(self, name: str) -> bool:
        return self.spark.catalog.tableExists(self._ident(name))


@dataclass
class ParquetCatalog(Catalog):
    """Parquet-directory fallback with the same surface."""

    spark: SparkSession
    warehouse: str

    def _path(self, name: str) -> str:
        return os.path.join(self.warehouse, name)

    def write(self, name: str, df: DataFrame, partition_by: list[str] | None = None) -> None:
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(self._path(name))

    def read(self, name: str) -> DataFrame:
        return self.spark.read.parquet(self._path(name))

    def exists(self, name: str) -> bool:
        return os.path.exists(os.path.join(self._path(name), "_SUCCESS"))


def resolve_catalog(
    spark: SparkSession, catalog_name: str = "lake", warehouse: str | None = None
) -> Catalog:
    """Iceberg if the named Spark catalog is configured, else parquet."""
    impl = spark.conf.get(f"spark.sql.catalog.{catalog_name}", None)
    if impl:
        return IcebergCatalog(spark, catalog_name)
    return ParquetCatalog(spark, warehouse or os.path.join(os.getcwd(), "warehouse"))
