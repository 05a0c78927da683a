"""Same-window A/B: conv_assembly chunked (1024) vs single-level (None).

VERDICT r05 item 2: the round-5 battery showed conv_assembly at 2.01×
its round-4 time, coincident with the two-level chunked concat landing
as the default. Whether that was the chunking or the host window needs
an INTERLEAVED measurement (memory: never chase cross-round per-query
deltas without an A/B snapshot in the same window). This runs the two
plans alternating in ONE session (A B A B ...), reports per-rep seconds
plus best/median per arm, and prints the chunked/single ratio.

Decision rule (from the VERDICT): if chunked is reproducibly >1.3×
slower on the small-conversation sf layouts, make chunk_turns=None the
small-layout default.

Usage: python tools/conv_assembly_ab.py [sf_dir] [reps]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    from pyspark.sql import functions as F

    from ocr_lib_spark.pipeline import assemble_conversations, extract_turns
    from ocr_lib_spark.session import get_spark
    from ocr_lib_spark.sources.synth import transcripts_from_documents

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app="conv-assembly-ab", cores=cpus, shuffle_partitions=cpus)
    tr = transcripts_from_documents(spark, sf_dir)
    # extraction is common to both arms; materialize it once so the A/B
    # times ONLY the assembly aggregation
    ex = extract_turns(tr).localCheckpoint()
    ex.count()

    def timed(chunk_turns):
        t0 = time.monotonic()
        assemble_conversations(ex, chunk_turns=chunk_turns).write.format(
            "noop"
        ).mode("overwrite").save()
        return time.monotonic() - t0

    # warm both plans' codegen paths before the timed region
    timed(1024)
    timed(None)

    samples = {"chunked_1024": [], "single_level": []}
    for _ in range(reps):
        samples["chunked_1024"].append(round(timed(1024), 3))
        samples["single_level"].append(round(timed(None), 3))

    out = {"sf": os.path.basename(sf_dir), "reps": reps, "samples": samples}
    for arm, xs in samples.items():
        out[f"{arm}_best"] = min(xs)
        out[f"{arm}_median"] = round(statistics.median(xs), 3)
    out["ratio_chunked_over_single_best"] = round(
        out["chunked_1024_best"] / out["single_level_best"], 3
    )
    out["ratio_chunked_over_single_median"] = round(
        out["chunked_1024_median"] / out["single_level_median"], 3
    )
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
