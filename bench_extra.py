#!/usr/bin/env python
"""Optimization-round profiling harness (guide §1: measure first).

NOT the driver contract — ``bench.py`` stays frozen. This file isolates the
same queries with the same session config so their cost can be attributed:

- each bench query timed individually via the noop sink (guide §1.4),
  labelled with setJobDescription (guide §1.5);
- the audio_pipeline split into its three phases (synthesize+pin,
  dedup_corpus materialize, decoded-PCM invariant);
- optional ``--plans TAG`` mode captures .explain("formatted") for every
  query into plans/r06/<query>_<TAG>.txt.

Usage:
    python bench_extra.py                 # phase timings, one line of JSON
    python bench_extra.py --plans before  # also write plans/r06/*_before.txt
    REPS=3 python bench_extra.py          # repeat phases within one session
"""

from __future__ import annotations

import io
import json
import os
import sys
import time
from contextlib import redirect_stdout
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import liken_spark as lk  # noqa: E402
from liken_spark.operators.ann import lsh_topk  # noqa: E402
from liken_spark.functions.text import with_text_stats  # noqa: E402
from liken_spark.sources import audio  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_CLIPS = int(os.environ.get("SPARK_GRAFT_BENCH_CLIPS", "20000"))
REPS = int(os.environ.get("REPS", "1"))
PLANS_DIR = Path(__file__).resolve().parent / "plans" / "r06"


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    plans_tag = None
    if "--plans" in sys.argv:
        plans_tag = sys.argv[sys.argv.index("--plans") + 1]
        PLANS_DIR.mkdir(parents=True, exist_ok=True)

    extra_conf = json.loads(os.environ.get("BENCH_EXTRA_CONF", "{}"))
    spark = lk.get_spark(
        app_name="liken-spark-bench-extra",
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

    def q_exact():
        return lk.dedupe(events, collect_ordered=False).apply({"props": lk.exact()}).canonicalize().collect()

    def q_lsh():
        return (
            lk.dedupe(docs, collect_ordered=False)
            .apply({"text": lk.lsh(threshold=0.8, ngram=3, num_perm=128)})
            .canonicalize(id="doc_id")
            .collect()
        )

    def q_simhash():
        return (
            lk.dedupe(docs, collect_ordered=False)
            .apply({"text": lk.simhash(hamming=3, bands=4)})
            .canonicalize(id="doc_id")
            .collect()
        )

    def q_substring():
        return (
            lk.dedupe(docs, collect_ordered=False)
            .apply({"text": lk.substring(min_len=50)})
            .canonicalize(id="doc_id")
            .collect()
        )

    def q_tfidf():
        return (
            lk.dedupe(docs, collect_ordered=False)
            .apply({"text": lk.tfidf(threshold=0.85, ngram=3, topn=4, min_df=2, max_df=0.2)})
            .canonicalize(id="doc_id")
            .collect()
        )

    queries = {
        "exact_events_props": q_exact,
        "lsh_documents": q_lsh,
        "simhash_documents": q_simhash,
        "substring_documents": q_substring,
        "tfidf_documents": q_tfidf,
        "text_stats_documents": lambda: with_text_stats(docs),
        "ann_lsh_topk": lambda: lsh_topk(emb, k=5),
    }

    from liken_spark.jobs import dedup_corpus

    all_reps = []
    for rep in range(REPS):
        timings: dict[str, float] = {}
        for name, fn in queries.items():
            sc.setJobDescription(f"bench_extra: {name}")
            t0 = time.perf_counter()
            df = fn()
            if plans_tag and rep == 0:
                (PLANS_DIR / f"{name}_{plans_tag}.txt").write_text(plan_of(df))
            materialize(df)
            timings[name] = round(time.perf_counter() - t0, 3)
            sc.setJobDescription(None)

        # audio pipeline, phase-split
        sc.setJobDescription("bench_extra: audio synth")
        t0 = time.perf_counter()
        clips = audio.synth_audio_table(spark, N_CLIPS, seed=42).persist()
        clips.count()
        t1 = time.perf_counter()
        timings["audio_synth"] = round(t1 - t0, 3)

        sc.setJobDescription("bench_extra: audio dedup_corpus")
        ded = dedup_corpus(
            clips, text_col="transcript", id_col="clip_id",
            lsh_threshold=0.7, lsh_ngram=3, num_perm=128, substring_min_len=30,
        )
        if plans_tag and rep == 0:
            (PLANS_DIR / f"audio_dedup_corpus_{plans_tag}.txt").write_text(plan_of(ded))
        materialize(ded)
        t2 = time.perf_counter()
        timings["audio_dedup"] = round(t2 - t1, 3)

        sc.setJobDescription("bench_extra: audio invariant")
        inv = audio.audio_invariant(clips, seed=42).where("NOT audio_ok OR NOT transcript_ok")
        if plans_tag and rep == 0:
            (PLANS_DIR / f"audio_invariant_{plans_tag}.txt").write_text(plan_of(inv))
        bad = inv.count()
        t3 = time.perf_counter()
        timings["audio_invariant"] = round(t3 - t2, 3)
        timings["audio_pipeline"] = round(t3 - t0, 3)
        sc.setJobDescription(None)
        clips.unpersist()

        timings["audio_bad"] = bad
        all_reps.append(timings)
        print(json.dumps({"rep": rep, **timings}), flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
