"""Per-query job/stage decomposition via the Spark event log (guide §1/§7).

The sandbox runs with spark.ui.enabled=false, so this is the UI stand-in:
run selected battery queries with event logging on, then parse the event
log into per-query job and stage timings (job description = query name).

Usage: python tools/profile_battery.py <query> [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EVDIR = "/tmp/spark-events"


def run(names: list[str]) -> str:
    import __spark_entry__ as entry_mod
    from pyspark.sql import functions as F

    from ocr_lib_spark.pipeline import extract_turns
    from ocr_lib_spark.session import get_spark
    from ocr_lib_spark.sources.synth import transcripts_from_documents

    Path(EVDIR).mkdir(exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app="profile-battery",
        cores=cpus,
        shuffle_partitions=cpus,
        extra={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{EVDIR}",
            "spark.eventLog.compress": "false",
        },
    )
    app_id = spark.sparkContext.applicationId
    extract_turns(
        transcripts_from_documents(spark, sf_dir).repartition(cpus),
        repartition=False,
    ).agg(F.count("*")).collect()
    qs = entry_mod.queries()
    spark.sparkContext.setJobDescription("warmup")
    qs[names[0]](spark, sf_dir).write.format("noop").mode("overwrite").save()
    for name in names:
        # two timed executions; the profile below covers both (labeled r0/r1)
        for rep in range(2):
            spark.sparkContext.setJobDescription(f"{name}#r{rep}")
            t0 = time.monotonic()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            print(f"[timed] {name}#r{rep}: {time.monotonic() - t0:.3f}s")
    spark.stop()
    return app_id


def parse(app_id: str) -> None:
    path = Path(EVDIR) / app_id
    if not path.exists():  # Spark 4 rolling layout
        path = Path(EVDIR) / f"eventlog_v2_{app_id}"
    def read_any(f: Path) -> str:
        data = f.read_bytes()
        if f.suffix == ".zstd":
            import zstandard

            data = zstandard.ZstdDecompressor().decompressobj().decompress(data)
        return data.decode()

    if path.is_dir():
        lines: list[str] = []
        for f in sorted(path.glob("events_*")):
            lines.extend(read_any(f).splitlines())
    else:
        lines = read_any(path).splitlines()
    jobs: dict[int, dict] = {}
    stages: dict[int, dict] = {}
    for line in lines:
        try:
            ev = json.loads(line)
        except json.JSONDecodeError:
            continue
        e = ev.get("Event")
        if e == "SparkListenerJobStart":
            jid = ev["Job ID"]
            desc = ev.get("Properties", {}).get("spark.job.description", "")
            jobs[jid] = {
                "desc": desc,
                "t0": ev["Submission Time"],
                "stages": [s["Stage ID"] for s in ev.get("Stage Infos", [])],
            }
        elif e == "SparkListenerJobEnd":
            jid = ev["Job ID"]
            if jid in jobs:
                jobs[jid]["t1"] = ev["Completion Time"]
        elif e == "SparkListenerStageCompleted":
            si = ev["Stage Info"]
            stages[si["Stage ID"]] = {
                "name": si["Stage Name"],
                "tasks": si["Number of Tasks"],
                "ms": si.get("Completion Time", 0) - si.get("Submission Time", 0),
            }
    per_desc: dict[str, list] = defaultdict(list)
    for jid in sorted(jobs):
        j = jobs[jid]
        per_desc[j["desc"]].append(jid)
    for desc, jids in per_desc.items():
        if desc in ("warmup", "") or desc is None:
            continue
        tot = sum(jobs[j].get("t1", jobs[j]["t0"]) - jobs[j]["t0"] for j in jids)
        # gaps between consecutive jobs = driver-side time (planning,
        # collect processing, python) — the invisible cost in the UI
        spans = sorted((jobs[j]["t0"], jobs[j].get("t1", jobs[j]["t0"])) for j in jids)
        gaps = sum(
            max(0, spans[i + 1][0] - spans[i][1]) for i in range(len(spans) - 1)
        )
        print(f"\n=== {desc}: {len(jids)} jobs, {tot} ms in jobs, {gaps} ms driver gaps")
        for j in jids:
            job = jobs[j]
            dur = job.get("t1", job["t0"]) - job["t0"]
            print(f"  job {j}: {dur} ms")
            for sid in sorted(job["stages"]):
                if sid in stages:
                    s = stages[sid]
                    print(f"    stage {sid}: {s['ms']} ms, {s['tasks']} tasks | {s['name'][:90]}")


if __name__ == "__main__":
    app = run(sys.argv[1:])
    parse(app)
