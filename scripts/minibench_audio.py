#!/usr/bin/env python
"""Tight A/B harness for the audio_pipeline bench query: runs the pure-JVM
control (exact_events_props) + the audio pipeline REPS times in one session
and prints per-rep timings. Used to separate engine changes from the box's
~2x ambient drift (compare control-normalized ratios, same window)."""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import liken_spark as lk  # noqa: E402
from liken_spark.sources import audio  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_CLIPS = int(os.environ.get("SPARK_GRAFT_BENCH_CLIPS", "20000"))
REPS = int(os.environ.get("REPS", "3"))


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    from liken_spark.jobs import dedup_corpus

    spark = lk.get_spark(
        app_name="liken-minibench-audio",
        master=f"local[{CPUS}]",
        shuffle_partitions=max(CPUS, 16),
    )
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    out = []
    for rep in range(REPS):
        t0 = time.perf_counter()
        materialize(
            lk.dedupe(events, collect_ordered=False)
            .apply({"props": lk.exact()})
            .canonicalize()
            .collect()
        )
        t_ctrl = time.perf_counter() - t0

        t0 = time.perf_counter()
        clips = audio.synth_audio_table(spark, N_CLIPS, seed=42).persist()
        clips.count()
        materialize(
            dedup_corpus(
                clips, text_col="transcript", id_col="clip_id",
                lsh_threshold=0.7, lsh_ngram=3, num_perm=128, substring_min_len=30,
            )
        )
        bad = (
            audio.audio_invariant(clips, seed=42)
            .where("NOT audio_ok OR NOT transcript_ok")
            .count()
        )
        t_audio = time.perf_counter() - t0
        clips.unpersist()
        out.append({"rep": rep, "ctrl": round(t_ctrl, 2), "audio": round(t_audio, 2), "bad": bad})
        print(json.dumps(out[-1]), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
