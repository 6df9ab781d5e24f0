"""Distributed connected components over a pair DataFrame.

The reference clusters with an in-memory union-find over row positions
(core/deduper.py:119-125) — which is exactly why its distributed backends
cannot link across partitions (backends/pyspark/executor.py:59-69,
golden-tested in test_matrix_partitioned.py). This module replaces it with
the alternating large-star/small-star algorithm (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SOCC'14): O(log n) rounds
of pure DataFrame joins/aggregations, each round localCheckpoint'ed to
truncate lineage. Component labels converge to the minimum ROW_ID of each
component — precisely the representative the reference's keep="first"
semantics needs (deduper.py:139-143).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _normalize(e: DataFrame) -> DataFrame:
    """Edges as (u=hi, v=lo), deduped, no self loops."""
    return (
        e.select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _large_star(e: DataFrame) -> DataFrame:
    sym = e.select("u", "v").union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = (
        sym.groupBy("u")
        .agg(F.min("v").alias("m"))
        .select("u", F.least("u", "m").alias("m"))
    )
    # emit (v, m) for strictly larger neighbors v of u
    out = (
        sym.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    return _normalize(out)


def _small_star(e: DataFrame) -> DataFrame:
    d = _normalize(e)  # (u=hi, v=lo)
    mins = d.groupBy("u").agg(F.min("v").alias("m"))
    out = (
        d.join(mins, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .union(mins.select(F.col("u").alias("u"), F.col("m").alias("v")))
    )
    return _normalize(out)


def _signature(e: DataFrame) -> tuple[int, int]:
    # bit_xor: order-independent and overflow-free (ANSI-safe) edge-set hash
    row = e.agg(
        F.count(F.lit(1)).alias("c"),
        F.coalesce(F.expr("bit_xor(xxhash64(u, v))"), F.lit(0)).alias("h"),
    ).collect()[0]
    return int(row["c"]), int(row["h"])


def connected_components(
    pairs: DataFrame, src: str = "src", dst: str = "dst", max_iter: int = 40
) -> DataFrame:
    """(src, dst) pair DataFrame -> (node, comp) assignment DataFrame.

    ``comp`` is the minimum node id of the component. Only nodes that
    appear in at least one pair are returned — callers default absent rows
    to their own id (matching the reference's ``rep_index.get(i, i)``
    fallback, deduper.py:149).

    Physical notes: the iteration's shuffle width is sized to the edge
    count (dedup pair sets are usually tiny relative to the corpus, and a
    64-way shuffle of 10k edges is pure scheduling overhead); each round
    persists (one materializing job: the convergence-signature aggregate)
    and lineage is truncated with a localCheckpoint every few rounds.
    """
    spark = pairs.sparkSession
    e = _normalize(pairs.select(F.col(src).alias("u"), F.col(dst).alias("v")))
    e = e.persist()
    sig = _signature(e)
    if sig[0] == 0:
        e.unpersist()
        return spark.createDataFrame([], "node long, comp long")

    # size the CC shuffles to the data: ~1M edges per partition, bounded
    session_parts = spark.conf.get("spark.sql.shuffle.partitions")
    cc_parts = max(4, min(2048, sig[0] // 1_000_000 + 4))
    spark.conf.set("spark.sql.shuffle.partitions", str(cc_parts))
    try:
        # NB: each round MUST truncate the plan (localCheckpoint) — the
        # star operators reference the edge frame several times, so an
        # un-truncated logical plan grows exponentially per round.
        # Dedup pair graphs are near-star already (exact/LSH emit star
        # pairs), so the first round is run "blind" — its convergence
        # signature job is skipped; checks start at round 2.
        prev = e
        for i in range(max_iter):
            e_next = _small_star(_large_star(prev)).localCheckpoint(eager=True)
            if i == 0:
                sig_next = None
            else:
                sig_next = _signature(e_next)
            if prev is not e:
                prev.unpersist()
            prev = e_next
            if sig_next is not None and sig_next == sig:
                break
            if sig_next is not None:
                sig = sig_next
        else:  # pragma: no cover - defensive
            raise RuntimeError(f"connected components did not converge in {max_iter} rounds")
        e_final = prev
        # stars: (child=u, root=v); roots appear only on the v side
        children = e_final.select(F.col("u").alias("node"), F.col("v").alias("comp"))
        roots = e_final.select(F.col("v").alias("node"), F.col("v").alias("comp")).distinct()
        out = children.union(roots).distinct().localCheckpoint(eager=True)
        e.unpersist()
        return out
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", session_parts)
