"""Incremental dedup over append-only streams.

The reference's iterative-workload story is batch re-canonicalization
(docs/in-practice/iterative-workloads.md: append rows, re-run, old ids
survive via representative-value propagation, §1.3 of SURVEY.md). At
ingest scale you want the same contract *online*; this module provides it
with Structured Streaming:

- ``streaming_drop_duplicates``: watermarked exact dedup of the stream
  itself (state bounded by the watermark window).
- ``streaming_canonicalize``: stateful canonical assignment — every record
  whose dedup key was seen before (within state) inherits the first-seen
  canonical id, exactly the keep="first" representative rule, via
  ``applyInPandasWithState``.

Both are key-partitioned stateful ops: state lives with the shuffle
partition that owns the key, so they scale horizontally like any
groupBy-keyed stream.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import StringType, StructField, StructType


def streaming_drop_duplicates(
    stream: DataFrame,
    key_cols: list[str],
    event_time_col: str | None = None,
    delay: str = "10 minutes",
) -> DataFrame:
    """Exact streaming dedup: first arrival per key wins. With an event-time
    column the state is watermark-bounded via
    ``dropDuplicatesWithinWatermark`` — duplicates of the same key are
    dropped regardless of their event time, as long as they arrive within
    ``delay`` of the first occurrence; late duplicates beyond ``delay`` pass
    through (the documented tradeoff of bounded state)."""
    if event_time_col:
        return stream.withWatermark(event_time_col, delay).dropDuplicatesWithinWatermark(
            key_cols
        )
    return stream.dropDuplicates(key_cols)


def streaming_canonicalize(
    stream: DataFrame,
    key_col: str,
    id_col: str,
    canonical_col: str = "canonical_id",
) -> DataFrame:
    """Assign ``canonical_col`` = the first-seen ``id_col`` for each
    ``key_col`` group (keep="first" online). State per key is one string.

    Output schema: (key, id, canonical).
    """
    out_schema = StructType(
        [
            StructField("key", StringType(), True),
            StructField(id_col, StringType(), True),
            StructField(canonical_col, StringType(), True),
        ]
    )
    state_schema = StructType([StructField("canonical", StringType(), True)])

    def assign(key, pdfs, state: GroupState):
        canonical = state.get[0] if state.exists else None
        for pdf in pdfs:
            pdf = pdf.sort_values(id_col)
            if canonical is None and len(pdf):
                canonical = str(pdf[id_col].iloc[0])
            yield pd.DataFrame(
                {
                    "key": [key[0]] * len(pdf),
                    id_col: pdf[id_col].astype(str),
                    canonical_col: [canonical] * len(pdf),
                }
            )
        if canonical is not None:
            state.update((canonical,))

    keyed = stream.select(
        F.col(key_col).cast("string").alias("key"), F.col(id_col).cast("string").alias(id_col)
    )
    return keyed.groupBy("key").applyInPandasWithState(
        assign,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
