"""Diagnose the auto-path 2->8 scaling margin (VERDICT r7 item 3).

Reproduces bench.py's extraction_worker timing protocol (fresh JVM,
12g pre-touched heap, warm-up, equal-seconds corpus) and then reads
the Spark REST API for the timed job's stages: task counts, task-time
quantiles, and input sizes — so the question "where does the level-8
auto pass lose its margin" gets measured, not guessed.

Usage:
  python tools/profile_auto.py <cores> <corpus_dir> [reps]
Prints one JSON line per timed rep plus a stage table.
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request


def main() -> None:
    cores = int(sys.argv[1])
    corpus = sys.argv[2]
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    from pyspark.sql import functions as F

    from ocr_lib_spark.pipeline import extract_turns
    from ocr_lib_spark.session import get_spark

    spark = get_spark(
        app=f"profile-auto-{cores}",
        cores=cores,
        shuffle_partitions=cores,
        driver_memory="12g",
        extra={"spark.ui.enabled": "true"},  # REST API is the profiler
    )
    big = spark.read.parquet(corpus)
    n_src = big.rdd.getNumPartitions()
    p = spark.sparkContext.defaultParallelism
    extract_turns(big.sample(0.02, seed=1), partitions=cores).agg(
        F.count("*")
    ).collect()
    big.agg(F.sum(F.length("text"))).collect()

    runs = []
    for _ in range(reps):
        t0 = time.monotonic()
        res = (
            extract_turns(big, partitions=cores, repartition="auto")
            .agg(F.count("*").alias("n"))
            .collect()[0]
        )
        secs = time.monotonic() - t0
        runs.append({"n": res["n"], "secs": round(secs, 3), "tps": round(res["n"] / secs)})

    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    def api(path: str):
        with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}{path}") as r:
            return json.load(r)

    stages = sorted(api("/stages?status=complete"), key=lambda s: s["stageId"])
    table = []
    for s in stages:
        q = api(
            f"/stages/{s['stageId']}/{s['attemptId']}/taskSummary"
            "?quantiles=0.0,0.5,0.95,1.0"
        )
        table.append(
            {
                "stage": s["stageId"],
                "name": s["name"].split("\n")[0][:60],
                "tasks": s["numCompleteTasks"],
                "wall_ms": s.get("executorRunTime"),
                "task_ms_q": [round(x) for x in q.get("executorRunTime", [])],
                "input_mb": round(s.get("inputBytes", 0) / 1e6, 1),
                "shuffle_w_mb": round(s.get("shuffleWriteBytes", 0) / 1e6, 1),
            }
        )
    print(
        json.dumps(
            {
                "cores": cores,
                "n_src": n_src,
                "defaultParallelism": p,
                "runs": runs,
                "stages": table,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
