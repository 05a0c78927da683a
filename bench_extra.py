"""Battery-only measurement harness for optimization work (guide §1).

NOT the frozen driver bench (bench.py): this file exists so the round-9
optimization loop can re-time the headline battery (or a subset) in
minutes without re-running the extraction scaling JVM pairs, and can
capture `.explain("formatted")` per query for the plans/r09 evidence.

Methodology matches bench.py:run_headline exactly — same session
config, same warm-up (all python workers + untimed first battery
query), same noop sink, same best-of-2 escalating to best-of-4 while
the running best stays >2s, MIN estimator.

Usage:
    python bench_extra.py [--out FILE] [--plans DIR] [query ...]

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import contextlib
import io
import json
import sys
import time
from pathlib import Path

from bench import CPUS, HEADLINE, SF_DIR


def capture_plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    args = sys.argv[1:]
    out_file = None
    plans_dir = None
    names: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--out":
            out_file = args[i + 1]
            i += 2
        elif args[i] == "--plans":
            plans_dir = Path(args[i + 1])
            i += 2
        else:
            names.append(args[i])
            i += 1
    battery = names or HEADLINE

    import __spark_entry__ as entry_mod
    from pyspark.sql import functions as F

    from ocr_lib_spark.pipeline import extract_turns
    from ocr_lib_spark.session import get_spark
    from ocr_lib_spark.sources.synth import transcripts_from_documents

    spark = get_spark(app="bench-extra", cores=CPUS, shuffle_partitions=CPUS)
    t_start = time.monotonic()
    extract_turns(
        transcripts_from_documents(spark, SF_DIR).repartition(CPUS),
        repartition=False,
    ).agg(F.count("*")).collect()

    qs = entry_mod.queries()
    spark.sparkContext.setJobDescription("battery warm-up (untimed)")
    qs[battery[0]](spark, SF_DIR).write.format("noop").mode("overwrite").save()

    out: dict[str, float] = {}
    for name in battery:
        spark.sparkContext.setJobDescription(f"battery: {name}")
        best = None
        for i in range(4):
            if i >= 2 and best is not None and best <= 2.0:
                break
            t0 = time.monotonic()
            df = qs[name](spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            secs = time.monotonic() - t0
            best = secs if best is None else min(best, secs)
        out[name] = round(best, 3)
        if plans_dir is not None:
            plans_dir.mkdir(parents=True, exist_ok=True)
            (plans_dir / f"{name}.txt").write_text(capture_plan(qs[name](spark, SF_DIR)))
    wall = time.monotonic() - t_start
    result = {
        "metric": "battery_seconds",
        "value": round(sum(out.values()), 3),
        "unit": "sec",
        "queries": out,
        "sf": Path(SF_DIR).name,
        "wall_s": round(wall, 1),
    }
    if out_file:
        Path(out_file).write_text(json.dumps(result, indent=1) + "\n")
    print(json.dumps({**result, "queries": None, "slowest": dict(
        sorted(out.items(), key=lambda kv: -kv[1])[:10])}))
    spark.stop()


if __name__ == "__main__":
    main()
