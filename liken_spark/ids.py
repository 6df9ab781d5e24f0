"""Row ids and canonical-id initialization.

The reference engine's data model makes row *position* load-bearing: the
union-find runs over 0-based positions and keep="first"/"last" picks
min/max position (reference: core/deduper.py:119-143). Its pyspark backend
materializes a global index via ``rdd.zipWithIndex`` (a pickled-Row round
trip, backends/pyspark/wrapper.py:121-127).

Here we materialize the same 0-based contiguous global index without leaving
the DataFrame world: one tiny aggregation to learn per-partition counts, then
an Arrow-batched ``mapInPandas`` pass that adds ``offset[pid] + local_pos``.
Two scans, no single-partition window, no Python-per-row cost — this scales
to arbitrarily many partitions. At 10^12-row scale users should instead pass
a pre-existing unique ``id`` column (see ``init_canonical``), in which case
row order is only consulted for keep semantics.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import LongType, StructField, StructType

from liken_spark.constants import CANONICAL_ID, ROW_ID


def with_row_id(df: DataFrame, col_name: str = ROW_ID) -> DataFrame:
    """Attach a deterministic, contiguous, 0-based global row index.

    Ordering matches the DataFrame's partition order (same notion of "row
    order" as the reference's zipWithIndex). The input is persisted so the
    two passes observe identical partitioning.
    """
    if col_name in df.columns:
        return df

    df = df.persist()
    counts = df.groupBy(F.spark_partition_id().alias("pid")).count().collect()
    offsets: dict[int, int] = {}
    acc = 0
    for row in sorted(counts, key=lambda r: r["pid"]):
        offsets[row["pid"]] = acc
        acc += row["count"]

    spark = df.sparkSession
    b_offsets = spark.sparkContext.broadcast(offsets)
    out_schema = StructType(df.schema.fields + [StructField(col_name, LongType(), False)])

    def attach(iterator):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        seen = 0
        base = b_offsets.value.get(pid, 0)
        for pdf in iterator:
            n = len(pdf)
            pdf = pdf.copy()
            pdf[col_name] = np.arange(seen, seen + n, dtype=np.int64) + base
            seen += n
            yield pdf

    return df.mapInPandas(attach, schema=out_schema)


def init_canonical(df: DataFrame, id: str | None) -> DataFrame:
    """Create/seed the ``canonical_id`` column.

    Reproduces the 4-way decision tree of the reference
    (core/wrapper.py:137-153, golden-tested in
    tests/integration/test_matrix_id.py:19-152):

    - pre-existing canonical_id, id=None        -> use as-is
    - pre-existing, id == "canonical_id"        -> use as-is
    - pre-existing, id = other column           -> overwrite from that column
    - absent, id = column name                  -> copy that column's values
    - absent, id=None                           -> autoincrement 0..n-1 (long)

    Requires ``ROW_ID`` to be present (autoincrement mode reuses it, which is
    exactly the reference's "0-based row position" semantics).
    """
    has_canonical = CANONICAL_ID in df.columns
    if has_canonical:
        if id and id != CANONICAL_ID:
            return df.withColumn(CANONICAL_ID, F.col(id))
        return df
    if id:
        return df.withColumn(CANONICAL_ID, F.col(id))
    return df.withColumn(CANONICAL_ID, F.col(ROW_ID).cast(LongType()))
