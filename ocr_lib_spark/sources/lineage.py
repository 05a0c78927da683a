"""Checkpointed, resumable extraction runs with per-partition lineage.

The reference tracks progress in mutable atoms (core.clj:15-19, 87-106)
that vanish with the process. This engine makes progress durable: work
is split into deterministic hash buckets of conv_id; each completed
bucket commits (a) its extracted output partition and (b) one lineage
row (FIXTURES.md §4 schema). A re-run skips buckets that already have a
committed lineage row — idempotent checkpoint-resume (north_rule), the
same idea as Structured Streaming's idempotent sinks but for batch.

Layout (works on any filesystem; Iceberg snapshot semantics would
replace the directory protocol when the runtime ships the jars —
gated behind try_iceberg()):

    out_dir/
      data/bucket=K/*.parquet     committed atomically per bucket
      lineage/bucket=K.parquet    one-row lineage commit marker
"""

from __future__ import annotations

import time
from pathlib import Path

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ocr_lib_spark.config import DEFAULT_CONFIG, ExtractionConfig
from ocr_lib_spark.pipeline import extract_turns

LINEAGE_SCHEMA = (
    "input_snapshot_id string, partition_hash string, bucket int, "
    "turn_count long, bytes_processed long, wall_ms long, status string"
)


def try_iceberg(spark) -> bool:
    """True when an Iceberg catalog is on the classpath (not in this
    image — SURVEY.md §1.4 keeps the design Iceberg-shaped; parquet
    directories stand in for snapshots here)."""
    try:
        spark.sql("SELECT 1").collect()
        jvm = spark.sparkContext._jvm
        jvm.java.lang.Class.forName("org.apache.iceberg.catalog.Catalog")
        return True
    except Exception:
        return False


def bucket_of(conv_id_col, n_buckets: int):
    """Deterministic bucket: positive mod of a stable hash of conv_id.
    Salting-compatible: bucketing keys the *checkpoint* unit; the heavy
    stage still spreads turns via (conv_id, turn_idx) repartitioning."""
    return F.pmod(F.xxhash64(conv_id_col), F.lit(n_buckets)).cast("int")


def committed_buckets(spark, out_dir: str) -> set[int]:
    ldir = Path(out_dir) / "lineage"
    if not ldir.exists():
        return set()
    files = sorted(str(p) for p in ldir.glob("bucket=*.parquet"))
    if not files:
        return set()
    rows = spark.read.parquet(*files).where(F.col("status") == "committed").collect()
    return {r["bucket"] for r in rows}


def run_with_resume(
    transcripts: DataFrame,
    out_dir: str,
    cfg: ExtractionConfig = DEFAULT_CONFIG,
    n_buckets: int | None = None,
    input_snapshot_id: str = "parquet:v1",
    fail_after: int | None = None,
) -> int:
    """Run extraction bucket-by-bucket, committing lineage per bucket.

    Returns the number of buckets processed in THIS run (already
    committed buckets are skipped). ``fail_after`` injects a crash after
    N bucket commits — used by the resume tests.

    Two passes over the data, total — scale-critical: a per-bucket
    filter on ``hash(conv_id) % N`` cannot push down to a parquet scan,
    so looping buckets directly over the source would re-scan the FULL
    corpus once per bucket (4096 full scans at 100 TB). Instead:

      1. ONE staging pass shuffles the source into a
         ``__bucket``-partitioned parquet layout (resume-safe: skipped
         when its _SUCCESS marker exists);
      2. each bucket job reads ONLY its partition directory (partition
         pruning on ``__bucket``), extracts, commits output + lineage.

    At cluster scale buckets are coarse (e.g. 4096) and the driver loop
    is a cheap metadata operation per bucket.
    """
    spark = transcripts.sparkSession
    n_buckets = n_buckets or cfg.lineage_buckets
    done = committed_buckets(spark, out_dir)
    out = Path(out_dir)
    (out / "data").mkdir(parents=True, exist_ok=True)
    (out / "lineage").mkdir(parents=True, exist_ok=True)

    staging = out / "staging"
    if not (staging / "_SUCCESS").exists():
        (
            transcripts.withColumn("__bucket", bucket_of(F.col("conv_id"), n_buckets))
            .write.mode("overwrite")
            .partitionBy("__bucket")
            .parquet(str(staging))
        )
    src = spark.read.parquet(str(staging))
    processed = 0
    for b in range(n_buckets):
        if b in done:
            continue
        t0 = time.monotonic()
        # partition-pruned read: only staging/__bucket=b is scanned
        part = src.where(F.col("__bucket") == b).drop("__bucket")
        stats = part.agg(
            F.count("*").alias("n"),
            F.coalesce(F.sum(F.length("text")), F.lit(0)).alias("nbytes"),
        ).collect()[0]
        extracted = extract_turns(part, cfg, repartition=False)
        extracted.write.mode("overwrite").parquet(str(out / "data" / f"bucket={b}"))
        wall_ms = int((time.monotonic() - t0) * 1000)
        lineage_row = [
            (
                input_snapshot_id,
                f"xxhash64(conv_id)%{n_buckets}={b}",
                b,
                int(stats["n"]),
                int(stats["nbytes"]),
                wall_ms,
                "committed",
            )
        ]
        spark.createDataFrame(lineage_row, LINEAGE_SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(out / "lineage" / f"bucket={b}.parquet"))
        processed += 1
        if fail_after is not None and processed >= fail_after:
            raise RuntimeError(f"injected failure after {processed} buckets")
    return processed


def read_output(spark, out_dir: str) -> DataFrame:
    return spark.read.parquet(str(Path(out_dir) / "data" / "bucket=*"))


def read_lineage(spark, out_dir: str) -> DataFrame:
    files = sorted(str(p) for p in (Path(out_dir) / "lineage").glob("bucket=*.parquet"))
    return spark.read.parquet(*files)
