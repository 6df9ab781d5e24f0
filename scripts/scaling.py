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

# 200k clips ~= 7 GB: with 2-core legs in the 500-900 s range the fixed
# per-leg costs (session spawn, planning, driver round-trips) are ~2% of
# wall — leg LENGTH, not clip count, controls the fixed-cost fraction
N_CLIPS = int(os.environ.get("SPARK_GRAFT_SCALING_CLIPS", "200000"))

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

    # Engine-free capacity controls, same box window: this VM's per-vCPU
    # throughput is NOT constant in the number of busy vCPUs, and the
    # degradation depends on the instruction mix (scalar JVM codegen
    # scaled ~1.0 in windows where AVX-dense numpy lost 3x — host
    # SMT/turbo/AVX-frequency effects; guest steal reads 0%). So each
    # control is the ENGINE'S OWN WORK CLASS run with zero engine/Spark
    # machinery, `cpus` concurrent workers, each executing an IDENTICAL
    # fixed quantum:
    # - ctrl_jvm: in-JVM whole-stage-codegen hash reduction (the shuffle/
    #   join/CC stages' instruction class), 64 parallel tasks;
    # - ctrl_audio: the invariant kernel itself (synth+encode+decode+snr+
    #   transcript) via mp.Pool — the PCM-invariant stage's class;
    # - ctrl_minhash: the shingle+SHA1+MinHash kernel via mp.Pool — the
    #   signature stage's class.
    # A control's pair ratio t_N/t_4N is the CEILING any perfectly
    # parallel job of that class can measure here.
    t2 = time.perf_counter()
    spark.range(3_000_000_000, numPartitions=64).select(
        F.expr("bit_xor(xxhash64(id))")  # ANSI-safe reduction (sum overflows)
    ).collect()
    t_ctrl_jvm = time.perf_counter() - t2
    spark.stop()

    import multiprocessing as mp

    with mp.Pool(cpus) as pool:
        audio_durs = pool.map(_audio_kernel_quantum, [(42, 2000)] * cpus)
    with mp.Pool(cpus) as pool:
        mh_durs = pool.map(_minhash_kernel_quantum, [(42, 20000)] * cpus)
    return {
        "cpus": cpus,
        "n_clips": N_CLIPS,
        "sec": round(elapsed, 2),
        "dedup_sec": round(t_dedup, 2),
        "invariant_sec": round(t_invariant, 2),
        "ctrl_jvm_sec": round(t_ctrl_jvm, 2),
        "ctrl_audio_sec": round(sum(audio_durs) / len(audio_durs), 2),
        "ctrl_minhash_sec": round(sum(mh_durs) / len(mh_durs), 2),
        "clips_per_sec": round(N_CLIPS / elapsed, 1),
        "invariant_failures": bad,
        "loadavg_before": round(load_before, 2),
    }


def _audio_kernel_quantum(args):
    """Per-process control quantum: the invariant stage's exact kernel
    (re-synth + encode + decode + SNR + transcript) over a FIXED clip set,
    identical for every worker — per-task wall time isolates the box's
    per-core capacity for this instruction mix at this concurrency."""
    seed, k = args
    from liken_spark.sources import audio

    t0 = time.perf_counter()
    s = 0.0
    for i in range(k):
        sr, dur, codec = audio.params_for(seed, i)
        ref = audio.synth_pcm(seed, i, sr, dur)
        enc = audio.encode_clip(ref, codec, sr)
        dec = audio.decode_clip(enc, codec)
        s += audio.snr_db(ref, dec)
        audio.transcript_for(seed, i)
    return time.perf_counter() - t0


def _minhash_kernel_quantum(args):
    """Per-process control quantum: the LSH signature stage's exact kernel
    (char shingles -> SHA1 token hashes -> 128-perm MinHash -> band
    hashes) over a fixed transcript set."""
    seed, k = args
    import numpy as np

    from liken_spark.minhash import (
        band_hashes,
        minhash_signature,
        optimal_param,
        sha1_hash32_batch,
    )
    from liken_spark.sources import audio

    b, r = optimal_param(0.7, 128)
    t0 = time.perf_counter()
    for i in range(k):
        text = audio.transcript_for(seed, i)
        toks = {text[j : j + 3] for j in range(len(text) - 2)}
        hs = sha1_hash32_batch([t.encode("utf-8") for t in toks])
        sig = minhash_signature(np.asarray(hs, dtype=np.uint64), 128)
        band_hashes(sig, b, r)
    return time.perf_counter() - t0


def _spin(_):
    x = 0
    t0 = time.perf_counter()
    for i in range(30_000_000):
        x += i
    return time.perf_counter() - t0


def cpu_control(levels: tuple[int, ...] = (2, 4, 8, 16, 32)) -> dict[int, float]:
    """Pure-CPU capacity curve of the box at measurement time: per-task
    wall seconds of an identical fixed-work quantum run by n concurrent
    processes. On real hardware this is flat in n (per-core capacity is
    constant); on this VM it degrades past ~8 busy cores — which bounds
    the parallelism regime in which engine scaling is observable at all.
    No Spark involved: this isolates the box from the engine."""
    import multiprocessing as mp

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
        eff = round((rs["sec"] / rb["sec"]) / factor, 3)
        eff_dedup = round((rs["dedup_sec"] / rb["dedup_sec"]) / factor, 3)
        eff_inv = round((rs["invariant_sec"] / rb["invariant_sec"]) / factor, 3)
        # ctrl_jvm is a fixed-TOTAL-work Spark job -> same (t_N/t_4N)/4
        # form as the legs; the mp.Pool kernels are fixed work PER TASK ->
        # their ceiling is the per-task time ratio (1.0 = per-core
        # capacity unchanged at the higher concurrency).
        ctrl_jvm = round((rs["ctrl_jvm_sec"] / rb["ctrl_jvm_sec"]) / factor, 3)
        ceil_audio = round(rs["ctrl_audio_sec"] / rb["ctrl_audio_sec"], 3)
        ceil_minhash = round(rs["ctrl_minhash_sec"] / rb["ctrl_minhash_sec"], 3)
        # dedup mixes the JVM shuffle/join class and the python MinHash
        # class -> its ceiling is the mean of the two; end-to-end weights
        # the stage ceilings by the small leg's stage split
        ceil_dedup = round((ctrl_jvm + ceil_minhash) / 2, 3)
        w_d = rs["dedup_sec"] / rs["sec"]
        ceil_e2e = round(w_d * ceil_dedup + (1 - w_d) * ceil_audio, 3)
        pairs.append(
            {
                "rep": rep,
                "eff": eff,
                "eff_dedup": eff_dedup,
                "eff_invariant": eff_inv,
                "ctrl_jvm": ctrl_jvm,
                "ceil_audio": ceil_audio,
                "ceil_minhash": ceil_minhash,
                "norm": round(eff / ceil_e2e, 3),
                "norm_dedup": round(eff_dedup / ceil_dedup, 3),
                "norm_invariant": round(eff_inv / ceil_audio, 3),
            }
        )
        print(json.dumps(pairs[-1]), flush=True)

    def med(key):
        return round(statistics.median(p[key] for p in pairs), 3)

    def spread(key):
        vals = [p[key] for p in pairs]
        return min(vals), max(vals)

    eff, eff_dedup, eff_inv = med("eff"), med("eff_dedup"), med("eff_invariant")
    norm, norm_dedup, norm_inv = med("norm"), med("norm_dedup"), med("norm_invariant")
    ctrl_jvm_med = med("ctrl_jvm")
    ceil_audio_med, ceil_minhash_med = med("ceil_audio"), med("ceil_minhash")
    lo, hi = spread("eff")
    lo_d, hi_d = spread("eff_dedup")
    lo_n, hi_n = spread("norm")
    med_small = statistics.median(r["sec"] for r in legs if r["cpus"] == n_small)
    med_big = statistics.median(r["sec"] for r in legs if r["cpus"] == n_big)

    leg_rows = "\n".join(
        f"| {r['rep']} | {r['cpus']} | {r['sec']} | {r['dedup_sec']} | "
        f"{r['invariant_sec']} | {r['ctrl_jvm_sec']} | {r['ctrl_audio_sec']} | "
        f"{r['ctrl_minhash_sec']} | {r['clips_per_sec']} | {r['loadavg_before']} |"
        for r in legs
    )
    pair_rows = "\n".join(
        f"| {p['rep']} | {p['eff']} | {p['eff_dedup']} | {p['eff_invariant']} | "
        f"{p['ctrl_jvm']} | {p['ceil_minhash']} | {p['ceil_audio']} | "
        f"{p['norm']} | {p['norm_dedup']} | {p['norm_invariant']} |"
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

### Engine-free capacity controls (the serial-fraction accounting)

Per-vCPU throughput on this VM is NOT constant in busy-vCPU count, and
the loss depends on instruction mix (in one measured window, scalar JVM
codegen scaled at 1.1 while AVX-dense numpy lost 3.4x; guest steal reads
0% — host SMT/turbo/AVX-frequency effects). So every leg also times the
ENGINE'S OWN KERNELS with zero engine/Spark machinery:

- `ctrl_jvm`: in-JVM whole-stage-codegen hash reduction over
  `spark.range(3e9)`, 64 parallel tasks (the shuffle/join/CC instruction
  class) — fixed total work, efficiency form (T_N/T_4N)/{int(factor)};
- `ctrl_audio`: the PCM-invariant kernel itself (synth + encode + decode
  + SNR + transcript), run by `cpus` concurrent processes via mp.Pool,
  each on an IDENTICAL fixed clip quantum — its N-vs-4N per-task time
  ratio is the capacity ceiling for the invariant stage's class;
- `ctrl_minhash`: the LSH signature kernel (shingles -> SHA1 -> 128-perm
  MinHash -> bands), same fixed-quantum form.

A control's ceiling is what a PERFECTLY PARALLEL job of that class could
measure here. The normalized columns divide the engine's raw efficiency
by its class ceiling (dedup: mean of ctrl_jvm and ctrl_minhash;
end-to-end: stage-time-weighted): **normalized = the fraction of
achievable scaling the ENGINE delivers**, isolating engine structure
(shuffles, barriers, serial driver work) from the box. Raw numbers are
first-class alongside; on a real cluster (constant per-node capacity)
the ceilings are ~1.0 and raw ~= normalized.

### Headline (median over {reps} pairs)

| stage | raw eff (T_N/T_4N)/{int(factor)} | class ceiling | normalized | spread (raw) |
| --- | --- | --- | --- | --- |
| dedup (pairs + CC + canonical join) | {eff_dedup} | jvm {ctrl_jvm_med} / mh {ceil_minhash_med} | **{norm_dedup}** | {lo_d} .. {hi_d} |
| per-row PCM invariant | {eff_inv} | {ceil_audio_med} | **{norm_inv}** | — |
| end-to-end | {eff} | time-weighted | **{norm}** | {lo} .. {hi} (norm {lo_n} .. {hi_n}) |

Median end-to-end wall: {med_small} s at {n_small} cores, {med_big} s at
{n_big} cores; clips/sec = {round(N_CLIPS / med_small, 1)} vs
{round(N_CLIPS / med_big, 1)}.

### Per-pair efficiencies

| pair | e2e | dedup | invariant | ctrl_jvm | ceil_mh | ceil_audio | norm e2e | norm dedup | norm inv |
| --- | --- | --- | --- | --- | --- | --- | --- | --- | --- |
{pair_rows}

### Raw legs (every run, nothing dropped; ctrl_audio/ctrl_minhash are
per-task seconds of a fixed quantum — equal across rows = flat capacity)

| pair | cores | total s | dedup s | invariant s | ctrl_jvm s | ctrl_audio s | ctrl_minhash s | clips/s | loadavg before |
| --- | --- | --- | --- | --- | --- | --- | --- | --- | --- |
{leg_rows}

The stage split isolates WHERE the single-box proxy diverges from a real
N-vs-4N-executor cluster: on a real cluster each added node brings its own
cores at FULL per-core capacity plus its own DRAM bus, disks and NIC —
none of which multiply when adding busy vCPUs on one shared box. The
controls quantify that divergence per work class in the same measurement
window, which is what makes the normalized column the engine-scaling
number and the raw column the box number.

## Headline suite (bench.py, sf0.1, local[32])

See BENCH_r*.json recorded by the driver; reproduce with `python bench.py`.

**Cross-round comparability warning:** this VM's absolute speed drifts
~2x day-to-day (measured during round 3: the pure-JVM
`exact_events_props` query, whose code is unchanged since round 2, ran
3.2 s in the round-2 bench window and 4.9-7.9 s in round 3's; the round-1
-> round-2 window showed the same 2x drift on re-measured round-1 code).
Compare RATIOS within a single run — the scaling protocol above is built
on paired ratios for exactly this reason — not absolute seconds across
rounds.

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
    out_name = os.environ.get("SPARK_GRAFT_SCALING_REPORT", "BASELINE.md")
    (REPO / "BENCH" / out_name).write_text(report)
    print(
        json.dumps(
            {
                "efficiency": eff,
                "efficiency_dedup": eff_dedup,
                "efficiency_invariant": eff_inv,
                "normalized": norm,
                "normalized_dedup": norm_dedup,
                "normalized_invariant": norm_inv,
                "control_jvm": ctrl_jvm_med,
                "ceiling_audio": ceil_audio_med,
                "ceiling_minhash": ceil_minhash_med,
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
