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

Physical notes:

- ``spark.sql.shuffle.partitions`` is set to an edge-count-sized value for
  the duration of the loop and restored in ``finally`` (measured 3x on a
  240k-edge graph vs corpus-sized widths; AQE's parallelismFirst refuses
  to coalesce below defaultParallelism). SINGLE-THREADED-SESSION
  ASSUMPTION, documented at the mutation site.
- Convergence is detected by an order-independent edge-set signature
  (count + bit_xor of edge hashes), computed at rounds 1 and 2 and then
  every ``check_every``-th round — the first round runs "blind" because
  dedup pair graphs are near-star already (exact/LSH emit star pairs) and
  almost never converge in 0 rounds; later checks are thinned because each
  one is a driver barrier (see ``connected_components``).
- AQE stays ON for the loop (LIKEN_SPARK_CC_AQE=0 disables it as an
  experiment): the star-round joins read stats-less checkpointed frames,
  so only AQE's runtime re-planning gets them broadcast joins + coalesced
  partitions — statically planned they sort-merge-join (measured 2x worse
  end-to-end at 20k clips despite saving the per-stage submission gaps).
- Each round's frame is localCheckpoint'ed (plan growth across rounds is
  exponential otherwise — the star operators reference the edge frame
  several times). By default rounds checkpoint NON-eagerly and the
  per-round signature job doubles as the materializer (one job per round
  instead of two; measured faster on 240k-edge graphs); earlier rounds'
  checkpoints are unpersisted as soon as a later round has materialized,
  so at most two rounds of edge blocks are ever held.
"""

from __future__ import annotations

import threading
from concurrent.futures import ThreadPoolExecutor
from contextlib import contextmanager

from pyspark.sql import DataFrame, functions as F

# Persisted intermediates registered by pair generators. The next
# connected_components call takes OWNERSHIP of everything registered so far
# (plan-build-time registration strictly precedes the CC invocation that
# consumes the pairs) and releases them once its output is eagerly
# materialized — at that point every registered frame has been folded into
# a materialized checkpoint. Pipelines that never reach a CC pass
# (predicate/bucket-only) release leftovers via ``release_scoped_persists``
# at the end of execution. Single-session assumption, like the rest of the
# engine.
_SCOPED_PERSISTS: list[DataFrame] = []

# When set (via ``defer_eager_persists``), eager scoped persists are NOT
# counted inline — they are queued here for the caller to materialize, so a
# batch of INDEPENDENT frames can be pinned by concurrent count jobs instead
# of one serial job each. Deferral is only safe when (a) every deferred
# frame's persisted ancestors are already materialized (else the concurrent
# counts race on the shared parent cache — the exact defect eager
# materialization exists to prevent) and (b) the deferred frames do not read
# each other. ``jobs.dedup_corpus`` is the canonical user: it pins the
# shared narrow text frame first, then defers the per-pass band/window
# frames, which are independent children of it.
#
# The deferral stack is THREAD-LOCAL: two dedup jobs built on different
# driver threads must not interleave their pending-pin queues (one job
# counting — or stranding — the other's frames). _SCOPED_PERSISTS above
# stays process-global deliberately: its ownership transfer is
# plan-build-order based and the engine documents a single-threaded-session
# assumption for pipeline execution; the deferral mechanism is the one
# piece exercised from worker threads (materialize_concurrently), so it
# gets the stronger guarantee.
_DEFERRED_TLS = threading.local()


@contextmanager
def defer_eager_persists():
    """Collect eager scoped persists instead of counting them inline; the
    caller materializes the yielded list (see ``materialize_concurrently``)."""
    prev = getattr(_DEFERRED_TLS, "pending", None)
    pending: list[DataFrame] = []
    _DEFERRED_TLS.pending = pending
    try:
        yield pending
    finally:
        _DEFERRED_TLS.pending = prev


def materialize_concurrently(dfs: list[DataFrame]) -> None:
    """Pin a batch of independent persisted frames with concurrent count
    jobs (Spark job submission is thread-safe; each frame's count is its
    only consumer at this point, so first-writer-wins caching is safe)."""
    materialize_concurrently_counting(dfs)


def materialize_concurrently_counting(dfs: list[DataFrame]) -> list[int]:
    """``materialize_concurrently`` that also returns each frame's row
    count, so callers can fuse a cardinality probe (e.g. a broadcast-gate
    count) into the same concurrent pin batch instead of paying a separate
    serial job for it."""
    if not dfs:
        return []
    if len(dfs) == 1:
        return [dfs[0].count()]
    with ThreadPoolExecutor(max_workers=len(dfs)) as ex:
        return list(ex.map(lambda f: f.count(), dfs))


def scoped_persist_count(df: DataFrame) -> tuple[DataFrame, int]:
    """Eager scoped persist whose pinning count is also the caller's
    row count — one driver action instead of two (count + recount)."""
    df.persist()
    _SCOPED_PERSISTS.append(df)
    return df, df.count()


def scoped_persist(df: DataFrame, eager: bool = True) -> DataFrame:
    """Persist an intermediate whose lifetime ends when the consuming CC
    pass materializes (or, for CC-free pipelines, when execution ends).

    ``eager=True`` (default) materializes the cache NOW with one count
    job. This is load-bearing for scaling, not a nicety: these frames are
    read by several branches of the downstream plan, and AQE submits
    independent branch jobs CONCURRENTLY — tasks that arrive before the
    cache blocks exist silently recompute the whole parent chain (the
    MinHash/shingle-hash UDFs, the most expensive nodes in the plan) once
    PER BRANCH. Measured on the 200k-clip corpus at local[8]: the
    substring hash chain alone ballooned 36 -> 292 core-seconds because
    seven concurrent consumers each rebuilt it; at local[2] the branches
    happened to serialize and hit the cache. One eager count pins the
    one-compute guarantee at every parallelism."""
    df.persist()
    _SCOPED_PERSISTS.append(df)
    if eager:
        pending = getattr(_DEFERRED_TLS, "pending", None)
        if pending is not None:
            pending.append(df)
        else:
            df.count()
    return df


def release_scoped_persists() -> None:
    while _SCOPED_PERSISTS:
        _SCOPED_PERSISTS.pop().unpersist()


def _take_scoped_persists() -> list[DataFrame]:
    """Transfer ownership of the currently-registered persists to the
    caller (a starting CC pass): entries registered *after* this point
    belong to a later pass and are not touched."""
    mine = _SCOPED_PERSISTS[:]
    _SCOPED_PERSISTS.clear()
    return mine


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


def _local_union_find(edges) -> dict[int, int]:
    """Driver-side union-find with path halving; roots are the component
    minima (smaller id always becomes the parent)."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = parent.setdefault(x, x)
        while r != parent[r]:
            parent[r] = parent[parent[r]]
            r = parent[r]
        parent[x] = r
        return r

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            if ru < rv:
                parent[rv] = ru
            else:
                parent[ru] = rv
    return {x: find(x) for x in parent}


def connected_components(
    pairs: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 40,
    eager_rounds: bool = False,
    check_every: int | None = None,
    local_max_edges: int | None = None,
) -> DataFrame:
    """(src, dst) pair DataFrame -> (node, comp) assignment DataFrame.

    ``comp`` is the minimum node id of the component. Only nodes that
    appear in at least one pair are returned — callers default absent rows
    to their own id (matching the reference's ``rep_index.get(i, i)``
    fallback, deduper.py:149).

    ``check_every`` thins the convergence barriers: rounds 1 and 2 are
    always checked; after that the signature collect runs only every
    ``check_every``-th round. Skipped-round equality is still a sound
    convergence proof (the star operators strictly decrease a potential
    function until the fixed point, Kiveris et al. §3, so an edge set equal
    to the one ``check_every`` rounds earlier can only be the fixed point).
    Default 1 — i.e. check every round: the thinning was implemented,
    measured, and REJECTED as a default (PLANS.md): a signature collect is
    one stage over an already-materialized frame while each star round it
    risks adding is ~7 shuffle stages; at 20k clips/local[32] check_every=2
    cost a reproducible ~1 s (warm 18.5-18.8 vs 17.4-17.6 s). Env
    ``LIKEN_SPARK_CC_CHECK_EVERY`` overrides for scaling experiments.

    ``local_max_edges`` is the adaptive small-graph gate (same philosophy
    as AQE's broadcast threshold): when the normalized edge count — known
    for free from the same signature job that detects empty input — is at
    or under the gate, the component labels are computed by a driver-side
    union-find over one bounded Arrow collect (2M edges = ~32MB) instead
    of the O(log n) star-round loop. Dedup pair graphs are pathologically
    cheap for union-find (near-star, so path halving barely recurses) but
    pathologically expensive for the distributed loop (each round is ~7
    edge-SIZED shuffle stages whose job-submission gaps are pure
    driver-serial time that does not shrink with executors — the r4
    scaling report's largest defect). Above the gate — any truly
    corpus-scale pair set, e.g. 10^12-row inputs where edges grow
    linearly with rows — the distributed loop runs unchanged. The result
    is also a LocalRelation with known stats, so every downstream
    canonical join gets a planner-chosen broadcast without the stats-less
    checkpoint workarounds the loop output needs. Default 2_000_000
    (env ``LIKEN_SPARK_CC_LOCAL_MAX``); 0 forces the distributed loop.
    """
    import os as _os
    spark = pairs.sparkSession
    if check_every is None:
        check_every = int(_os.environ.get("LIKEN_SPARK_CC_CHECK_EVERY", "1"))
    check_every = max(1, check_every)
    # LIKEN_SPARK_CC_AQE=0 statically plans the loop's queries (AQE off) —
    # an experiment knob for the scaling protocol, NOT the default:
    # measured at 20k clips / local[32], AQE-off DOUBLES the audio
    # pipeline (39-46 s warm vs ~18.5 s) because the star-round joins
    # against stats-less checkpointed frames lose AQE's broadcast-join
    # conversion and partition coalescing; the per-stage submission gaps
    # AQE adds are far cheaper than the sort-merge joins it removes.
    disable_aqe = _os.environ.get("LIKEN_SPARK_CC_AQE", "1") == "0"
    owned = _take_scoped_persists()
    e = _normalize(pairs.select(F.col(src).alias("u"), F.col(dst).alias("v")))
    e = e.persist()

    # Size the CC-loop shuffles to the edge count: dedup pair sets are tiny
    # relative to the corpus, and each round is ~7 shuffle stages — at the
    # session's corpus-sized width the per-stage scheduling overhead
    # dominates (measured 3x on a 240k-edge graph: 8.5s at 8 partitions vs
    # 25.5s at 64; AQE does not shrink these because
    # coalescePartitions.parallelismFirst keeps ~defaultParallelism).
    # The session conf is mutated for the loop and restored in finally —
    # SINGLE-THREADED-SESSION ASSUMPTION: a concurrently-planned query on
    # this SparkSession would observe the edge-sized value. The rest of the
    # engine shares this assumption (scoped persists, checkpoint manifests).
    session_parts = spark.conf.get("spark.sql.shuffle.partitions")
    session_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    live: list[DataFrame] = []  # round checkpoints not yet released
    try:
        sig = _signature(e)
        if sig[0] == 0:
            return spark.createDataFrame([], "node long, comp long")
        if local_max_edges is None:
            local_max_edges = int(_os.environ.get("LIKEN_SPARK_CC_LOCAL_MAX", "2000000"))
        if sig[0] <= local_max_edges:
            # small-graph fast path: one Arrow collect + driver union-find
            # (see docstring). The edge frame is already persisted, so the
            # collect is a cache scan.
            import pandas as pd

            pdf = e.toPandas()  # bounded-collect: <= local_max_edges rows (gate above)
            assign = _local_union_find(zip(pdf["u"].tolist(), pdf["v"].tolist()))
            out_pdf = pd.DataFrame(
                {"node": list(assign.keys()), "comp": list(assign.values())}
            ).astype("int64")
            out = spark.createDataFrame(out_pdf, "node long, comp long")
            # advisory tag: a LocalRelation assignment is cheap to probe
            # twice, so keep="first" canonicalization can use the
            # filter-based representative lookup (executor._apply_comp_df)
            out._liken_local_cc = True
            return out
        # floor at the session's core count: fewer partitions than cores
        # would idle executors for the whole loop; edge-count sizing still
        # caps the per-stage scheduling overhead on small graphs
        cores = spark.sparkContext.defaultParallelism
        cc_parts = max(4, cores, min(2048, sig[0] // 1_000_000 + 4))
        spark.conf.set("spark.sql.shuffle.partitions", str(cc_parts))
        if disable_aqe:
            spark.conf.set("spark.sql.adaptive.enabled", "false")
        # NB: each round MUST truncate the plan (localCheckpoint) — the star
        # operators reference the edge frame several times, so an
        # un-truncated logical plan grows exponentially per round. Rounds
        # are checkpointed eagerly; the convergence signature doubles as
        # the materializing job. Dedup pair graphs are near-star already
        # (exact/LSH emit star pairs), so the first round runs "blind" —
        # checks start at round 2.
        prev = e
        for i in range(max_iter):
            e_next = _small_star(_large_star(prev)).localCheckpoint(eager=eager_rounds)
            live.append(e_next)
            # rounds 1 and 2 always checked, then every check_every-th
            # round — each skipped check is one driver barrier saved; see
            # the docstring for why skipped-round equality stays sound
            check = i in (1, 2) or (i > 2 and (i - 2) % check_every == 0)
            sig_next = _signature(e_next) if check else None
            # Once e_next is materialized (eagerly, or by the signature job
            # just run), every earlier round's checkpoint blocks are dead —
            # release them so at most two rounds of edge blocks are ever
            # held. With eager_rounds=False and no signature yet, earlier
            # rounds must survive: their lineage is truncated, so
            # unpersisting before a downstream materialization loses data.
            if eager_rounds or sig_next is not None:
                for k in live[:-1]:
                    k.unpersist()
                del live[:-1]
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
        # eager localCheckpoint: `out` is fully materialized before the
        # finally block releases the frames it was computed from
        out = children.union(roots).distinct().localCheckpoint(eager=True)
        return out
    finally:
        # release EVERYTHING in finally (not just on the success path): an
        # exception mid-loop (or the max_iter RuntimeError) must not leak
        # the edge frame, round checkpoints, or owned scoped persists for
        # the session lifetime.
        spark.conf.set("spark.sql.shuffle.partitions", session_parts)
        spark.conf.set("spark.sql.adaptive.enabled", session_aqe)
        e.unpersist()
        for k in live:
            k.unpersist()
        for o in owned:
            o.unpersist()
