#!/usr/bin/env python
"""Busy-core histogram for one dedup_corpus run (the driver-serial
accounting evidence in BENCH/BASELINE.md).

Runs the full dedup job once at --cpus over the pre-materialized scaling
input with the Spark event log enabled, then sweeps every task's
(launch, finish) interval inside the measured dedup window: wall seconds
spent at each busy-core level. The 0-busy row is pure driver time (job
planning, AQE stage submission gaps, barriers, broadcast builds) — the
size-independent serial term that bounds dedup-stage scaling efficiency.

Usage:  python scripts/busycore_histogram.py --cpus 8
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

N_CLIPS = int(os.environ.get("SPARK_GRAFT_SCALING_CLIPS", "800000"))
INPUT_DIR = os.environ.get(
    "SPARK_GRAFT_SCALING_INPUT", f"/tmp/liken_scaling_input_{N_CLIPS}"
)


def main(cpus: int) -> None:
    import liken_spark as lk
    from liken_spark.jobs import dedup_corpus
    from pyspark.sql import functions as F

    os.environ.setdefault("LIKEN_SPARK_DRIVER_MEM", "48g")
    evdir = tempfile.mkdtemp(prefix="liken_evlog_")
    spark = lk.get_spark(
        app_name=f"liken-busycore-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=64,
        extra_conf={
            "spark.sql.execution.arrow.maxRecordsPerBatch": "8192",
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": evdir,
            "spark.eventLog.compress": "false",
        },
    )
    clips = spark.read.parquet(INPUT_DIR)
    clips.select(F.sum(F.length("bytes")), F.sum(F.length("transcript"))).collect()

    w0 = time.time() * 1000
    t0 = time.perf_counter()
    out = dedup_corpus(
        clips, text_col="transcript", id_col="clip_id",
        lsh_threshold=0.7, lsh_ngram=3, num_perm=128, substring_min_len=30,
    )
    out.write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0
    w1 = time.time() * 1000
    spark.stop()

    # parse task intervals inside [w0, w1] from the (uncompressed) event
    # log; also aggregate per-stage run/CPU time — run time counts shuffle
    # fetch waits and GC, CPU time does not, so a run/CPU divergence at
    # high parallelism is contention while a CPU inflation at identical
    # stage inputs is recomputation (the r3 cache-race diagnostic).
    intervals: list[tuple[float, float]] = []
    stages: dict[int, dict[str, float]] = {}
    stage_names: dict[int, str] = {}
    for f in Path(evdir).rglob("*"):
        if not f.is_file():
            continue
        with open(f, errors="replace") as fh:
            for line in fh:
                if '"SparkListenerStageCompleted"' in line:
                    try:
                        si = json.loads(line).get("Stage Info", {})
                        stage_names[si.get("Stage ID", -1)] = si.get("Stage Name", "")
                    except json.JSONDecodeError:
                        pass
                    continue
                if '"SparkListenerTaskEnd"' not in line:
                    continue
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                ti = ev.get("Task Info", {})
                a, b = ti.get("Launch Time"), ti.get("Finish Time")
                if a and b and b > a:
                    lo, hi = max(a, w0), min(b, w1)
                    if hi > lo:
                        intervals.append((lo, hi))
                tm = ev.get("Task Metrics") or {}
                sid = ev.get("Stage ID", -1)
                s = stages.setdefault(
                    sid, {"tasks": 0, "run_s": 0.0, "cpu_s": 0.0, "rows": 0}
                )
                s["tasks"] += 1
                s["run_s"] += (tm.get("Executor Run Time") or 0) / 1000
                s["cpu_s"] += (tm.get("Executor CPU Time") or 0) / 1e9
                s["rows"] += (tm.get("Input Metrics") or {}).get(
                    "Records Read", 0
                ) + (tm.get("Shuffle Read Metrics") or {}).get(
                    "Total Records Read", 0
                )

    # sweep: wall ms at each busy-core count
    events = sorted(
        [(t, +1) for t, _ in intervals] + [(t, -1) for _, t in intervals]
    )
    hist: dict[int, float] = {}
    busy, prev = 0, w0
    for t, d in events:
        hist[min(busy, cpus)] = hist.get(min(busy, cpus), 0.0) + (t - prev)
        busy += d
        prev = t
    hist[min(busy, cpus)] = hist.get(min(busy, cpus), 0.0) + (w1 - prev)

    print(
        json.dumps(
            {
                "cpus": cpus,
                "n_clips": N_CLIPS,
                "dedup_wall_sec": round(wall, 2),
                "busy_core_seconds": {
                    str(k): round(v / 1000, 1) for k, v in sorted(hist.items())
                },
                "driver_only_sec": round(hist.get(0, 0.0) / 1000, 1),
                "full_occupancy_sec": round(hist.get(cpus, 0.0) / 1000, 1),
                "total_run_core_sec": round(sum(s["run_s"] for s in stages.values()), 1),
                "total_cpu_core_sec": round(sum(s["cpu_s"] for s in stages.values()), 1),
                "top_stages_by_run": [
                    {
                        "stage": sid,
                        "name": stage_names.get(sid, "")[:60],
                        "tasks": int(s["tasks"]),
                        "run_s": round(s["run_s"], 1),
                        "cpu_s": round(s["cpu_s"], 1),
                        "rows": int(s["rows"]),
                    }
                    for sid, s in sorted(
                        stages.items(), key=lambda kv: -kv[1]["run_s"]
                    )[:12]
                ],
            }
        )
    )
    import shutil

    shutil.rmtree(evdir, ignore_errors=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=8)
    args = ap.parse_args()
    main(args.cpus)
