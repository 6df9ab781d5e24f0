#!/usr/bin/env python
"""Event-log profiler for the bench suite (guide §1/§7): runs the bench
queries once with the Spark event log on, then prints, per query (job
description), every job with its wall time, task count, total task time,
and the gap time between jobs — the driver-serial slice the guide's §2.6
overlap advice targets.

Usage: python scripts/profile_suite.py [query ...]   # default: all
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
from collections import defaultdict
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import liken_spark as lk  # noqa: E402
from liken_spark.operators.ann import lsh_topk  # noqa: E402
from liken_spark.functions.text import with_text_stats  # noqa: E402
from liken_spark.sources import audio  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_CLIPS = int(os.environ.get("SPARK_GRAFT_BENCH_CLIPS", "20000"))


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    only = set(sys.argv[1:])
    evdir = tempfile.mkdtemp(prefix="liken_profile_")
    extra_conf = json.loads(os.environ.get("BENCH_EXTRA_CONF", "{}"))
    extra_conf.update(
        {
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": evdir,
            "spark.eventLog.compress": "false",
        }
    )
    spark = lk.get_spark(
        app_name="liken-profile-suite",
        master=f"local[{CPUS}]",
        shuffle_partitions=max(CPUS, 16),
        extra_conf=extra_conf,
    )
    sc = spark.sparkContext
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").persist()
    docs.count()
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").persist()
    emb.count()
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")

    from liken_spark.jobs import dedup_corpus

    def audio_phases():
        clips = audio.synth_audio_table(spark, N_CLIPS, seed=42).persist()
        sc.setJobDescription("audio:synth")
        clips.count()
        sc.setJobDescription("audio:dedup")
        materialize(
            dedup_corpus(
                clips, text_col="transcript", id_col="clip_id",
                lsh_threshold=0.7, lsh_ngram=3, num_perm=128, substring_min_len=30,
            )
        )
        sc.setJobDescription("audio:invariant")
        audio.audio_invariant(clips, seed=42).where("NOT audio_ok OR NOT transcript_ok").count()
        clips.unpersist()

    queries = {
        "exact_events_props": lambda: materialize(
            lk.dedupe(events, collect_ordered=False).apply({"props": lk.exact()}).canonicalize().collect()
        ),
        "lsh_documents": lambda: materialize(
            lk.dedupe(docs, collect_ordered=False)
            .apply({"text": lk.lsh(threshold=0.8, ngram=3, num_perm=128)})
            .canonicalize(id="doc_id").collect()
        ),
        "simhash_documents": lambda: materialize(
            lk.dedupe(docs, collect_ordered=False)
            .apply({"text": lk.simhash(hamming=3, bands=4)})
            .canonicalize(id="doc_id").collect()
        ),
        "substring_documents": lambda: materialize(
            lk.dedupe(docs, collect_ordered=False)
            .apply({"text": lk.substring(min_len=50)})
            .canonicalize(id="doc_id").collect()
        ),
        "tfidf_documents": lambda: materialize(
            lk.dedupe(docs, collect_ordered=False)
            .apply({"text": lk.tfidf(threshold=0.85, ngram=3, topn=4, min_df=2, max_df=0.2)})
            .canonicalize(id="doc_id").collect()
        ),
        "text_stats_documents": lambda: materialize(with_text_stats(docs)),
        "ann_lsh_topk": lambda: materialize(lsh_topk(emb, k=5)),
        "audio": audio_phases,
    }

    t_wall = {}
    for name, fn in queries.items():
        if only and name not in only:
            continue
        if name != "audio":
            sc.setJobDescription(name)
        t0 = time.perf_counter()
        fn()
        t_wall[name] = round(time.perf_counter() - t0, 3)
        sc.setJobDescription(None)

    app_id = sc.applicationId
    spark.stop()

    # ---- parse the event log -------------------------------------------
    ev_path = Path(evdir) / app_id
    if not ev_path.exists():  # Spark 4 rolling event-log layout
        d = Path(evdir) / f"eventlog_v2_{app_id}"
        ev_path = next(p for p in d.iterdir() if p.name.startswith("events_"))
    jobs: dict[int, dict] = {}
    stage_to_job: dict[int, int] = {}
    for line in ev_path.read_text().splitlines():
        try:
            ev = json.loads(line)
        except json.JSONDecodeError:
            continue
        et = ev.get("Event")
        if et == "SparkListenerJobStart":
            jid = ev["Job ID"]
            desc = ev.get("Properties", {}).get("spark.job.description") or "(none)"
            jobs[jid] = {
                "desc": desc, "t0": ev["Submission Time"], "t1": None,
                "tasks": 0, "task_ms": 0, "stages": len(ev.get("Stage Infos", [])),
            }
            for s in ev.get("Stage IDs", []):
                stage_to_job[s] = jid
        elif et == "SparkListenerJobEnd":
            jid = ev["Job ID"]
            if jid in jobs:
                jobs[jid]["t1"] = ev["Completion Time"]
        elif et == "SparkListenerTaskEnd":
            jid = stage_to_job.get(ev["Stage ID"])
            if jid is not None and "Task Info" in ev:
                ti = ev["Task Info"]
                jobs[jid]["tasks"] += 1
                jobs[jid]["task_ms"] += ti["Finish Time"] - ti["Launch Time"]

    per_desc: dict[str, list] = defaultdict(list)
    for jid in sorted(jobs):
        j = jobs[jid]
        per_desc[j["desc"]].append((jid, j))

    for desc, js in per_desc.items():
        total_wall = sum((j["t1"] - j["t0"]) for _, j in js if j["t1"])
        # gaps between consecutive jobs of this description
        gaps = 0
        for (_ja, a), (_jb, b) in zip(js, js[1:]):
            if a["t1"] and b["t0"] > a["t1"]:
                gaps += b["t0"] - a["t1"]
        print(f"\n=== {desc}  (wall {t_wall.get(desc.split(':')[0], '?')}s, "
              f"{len(js)} jobs, job-wall {total_wall/1e3:.2f}s, inter-job gaps {gaps/1e3:.2f}s)")
        for jid, j in js:
            dur = (j["t1"] - j["t0"]) / 1e3 if j["t1"] else float("nan")
            print(f"  job {jid:3d}: {dur:7.2f}s  stages={j['stages']:2d} "
                  f"tasks={j['tasks']:4d} task-time={j['task_ms']/1e3:8.2f}s")
    print("\nwalls:", json.dumps(t_wall))
    print("eventlog:", ev_path)


if __name__ == "__main__":
    main()
