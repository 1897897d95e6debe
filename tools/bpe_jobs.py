"""Measure the batched BPE trainer's scheduler-cost win over the
sequential trainer (round-6 verdict item 2's 'Done' bar): run both on
the same corpus under distinct Spark job groups, count the jobs each
scheduled via the status tracker, and report merges-per-job + wall time.

    python tools/bpe_jobs.py [sf_dir]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from manuscript_ocr_spark.functions.text import (
        bpe_learn_merges,
        bpe_learn_merges_batched,
    )
    from manuscript_ocr_spark.session import get_spark

    spark = get_spark()
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    def run(tag, fn):
        sc.setJobGroup(tag, tag)
        t0 = time.time()
        n = fn().count()
        wall = time.time() - t0
        sc.setJobGroup("idle", "idle")
        jobs = len(tracker.getJobIdsForGroup(tag))
        return {"merges": int(n), "jobs": jobs,
                "merges_per_job": round(n / jobs, 3),
                "wall_sec": round(wall, 2)}

    # explicit docs= keeps both trainers on the DIRECT training path —
    # over a bare sf_dir, bpe_learn_merges is build-if-missing against
    # the materialized bpe_build artifact and would measure a cache read
    docs = spark.read.parquet(f"{sf}/documents.parquet")

    # warm the word-freq path once so neither run pays first-scan costs
    bpe_learn_merges(spark, sf, n_merges=1, docs=docs).count()

    seq = run("bpe_seq", lambda: bpe_learn_merges(
        spark, sf, n_merges=24, docs=docs))
    bat = run("bpe_bat", lambda: bpe_learn_merges_batched(
        spark, sf, n_rounds=6, top_k=8, docs=docs))
    out = {
        "sf_dir": sf,
        "sequential_24": seq,
        "batched_6x8": bat,
        "jobs_ratio": round(seq["jobs"] / bat["jobs"], 2),
        "merges_per_job_ratio": round(
            bat["merges_per_job"] / seq["merges_per_job"], 2),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
