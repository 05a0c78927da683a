"""Skew demo: measure auto vs salted extraction on a SKEWED layout.

The scaling bench's corpus is balanced, where the salted shuffle is pure
overhead. This demo builds the layout the north rule names — one file
per conversation with a mega-conversation holding half the corpus — and
measures both paths at one parallelism level. Expected: auto inherits
the skewed file layout (one task owns half the data → straggler-bound
wall time); the salted (conv_id, turn_idx) repartition spreads the
mega-conversation across all partitions.

    python tools/skew_demo.py [cores]
"""

from __future__ import annotations

import json
import sys
import time


def main() -> None:
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    sys.path.insert(0, ".")
    from pyspark.sql import functions as F

    from ocr_lib_spark.pipeline import extract_turns
    from ocr_lib_spark.session import get_spark
    from ocr_lib_spark.sources.synth import transcripts_from_documents

    spark = get_spark(app=f"skew-demo-{cores}", cores=cores, shuffle_partitions=cores)
    path = "/tmp/ocr_skew_corpus"
    from pathlib import Path

    if not Path(path, "_SUCCESS").exists():
        tr = transcripts_from_documents(spark, "/root/testdata/sf0.1")
        # 100 replicas into ONE mega-conversation + 100 replicas spread
        # over 10,000 small conversations; one output file per group ->
        # the skewed one-file-per-conversation layout
        big = (
            tr.withColumn("rep", F.explode(F.sequence(F.lit(0), F.lit(199))))
            .withColumn(
                "conv_id",
                F.when(F.col("rep") < 100, F.lit("conv-mega")).otherwise(
                    F.concat_ws("-", F.lit("c"), (F.hash("conv_id", "rep") % 10000).cast("string"))
                ),
            )
            .withColumn("grp", F.when(F.col("conv_id") == "conv-mega", F.lit("mega")).otherwise(F.lit("rest")))
            .drop("rep")
        )
        big.repartition("grp").write.mode("overwrite").partitionBy("grp").parquet(path)
    df = spark.read.parquet(path).drop("grp")

    # warm python workers + codegen
    extract_turns(df.sample(0.02, seed=1), partitions=cores).agg(F.count("*")).collect()

    out = {"cores": cores, "layout": "one huge file (50% of turns) + balanced rest"}
    for name, rep in (("auto_inherits_layout", False), ("salted_spread", True)):
        best = None
        for _ in range(3):
            t0 = time.monotonic()
            n = (
                extract_turns(df, partitions=cores, repartition=rep)
                .agg(F.count("*").alias("n"))
                .collect()[0]["n"]
            )
            secs = time.monotonic() - t0
            best = secs if best is None else min(best, secs)
        out[name] = {"secs": round(best, 2), "tps": round(n / best)}
    out["salted_speedup"] = round(
        out["auto_inherits_layout"]["secs"] / out["salted_spread"]["secs"], 2
    )

    # --- mega-conversation assembly leg (north-rule hazard evidence) ----
    # The 500k-turn conversation flows through BOTH assembly plans; the
    # chunked two-level concat bounds every aggregation buffer at
    # chunk_turns rows, the single-level plan materializes one 500k-
    # element collect_list row. Digests must agree exactly.
    from ocr_lib_spark.pipeline import assemble_conversations

    ex = extract_turns(df, partitions=cores, repartition=True)
    asm = {}
    for name, chunk in (("chunked_1024", 1024), ("single_level", None)):
        t0 = time.monotonic()
        rows = (
            assemble_conversations(ex, chunk_turns=chunk)
            .select(F.md5("conv_text").alias("d"), "conv_id", "n_turns")
            .orderBy("conv_id")
            .collect()
        )
        import hashlib

        combined = hashlib.md5("".join(r["d"] for r in rows).encode()).hexdigest()
        asm[name] = {
            "secs": round(time.monotonic() - t0, 2),
            "n_convs": len(rows),
            "max_turns": max(r["n_turns"] for r in rows),
            "fingerprint": combined[:12],
        }
    out["mega_assembly"] = asm
    out["assembly_digests_equal"] = (
        asm["chunked_1024"]["fingerprint"] == asm["single_level"]["fingerprint"]
    )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
