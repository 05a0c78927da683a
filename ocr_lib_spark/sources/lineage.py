"""Checkpointed, resumable extraction runs with per-partition lineage.

The reference tracks progress in mutable atoms (core.clj:15-19, 87-106)
that vanish with the process. This engine makes progress durable: work
is split into deterministic hash buckets of conv_id; each completed
bucket commits (a) its extracted output partition and (b) one lineage
row (FIXTURES.md §4 schema). A re-run skips buckets that already have a
committed lineage row FOR THE SAME INPUT SNAPSHOT — idempotent
checkpoint-resume (north_rule), the same idea as Structured Streaming's
idempotent sinks but for batch.

Snapshot semantics: ``input_snapshot_id`` keys every resume decision.
``parquet_snapshot_id()`` derives a content-addressed id from the input
file listing (names + sizes), so re-running over a changed input
invalidates both the staging layout and every committed bucket —
exactly what an Iceberg snapshot id gives, realized on plain parquet.

Iceberg status (verified this sandbox): no iceberg-spark-runtime jar is
baked in and the container has no network, so the catalog path cannot
be exercised here; ``try_iceberg()`` gates it. On a real cluster, flip
it on with

    spark.jars.packages=org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver>
    spark.sql.catalog.lake=org.apache.iceberg.spark.SparkCatalog

and substitute the table's ``snapshot_id()`` for ``parquet_snapshot_id``
— the resume contract (snapshot+bucket keyed lineage rows) is identical.

Layout (works on any filesystem):

    out_dir/
      staging/                    __bucket-partitioned one-pass shuffle
      staging_snapshot.txt        snapshot id the staging was built from
      data/bucket=K/*.parquet     committed atomically per bucket
      lineage/bucket=K.parquet    one-row lineage commit marker

Per-stage timing (lineage schema v2): each lineage row carries
segment_ms / classify_ms / assemble_ms (kernel-phase CPU time summed
across tasks via accumulators) alongside total wall_ms — the durable,
MEASURED recast of the reference's hard-coded stage-progress weights
(core.clj:108-165: grouping 46% / matching 36% / ...).
"""

from __future__ import annotations

import hashlib
import time
from pathlib import Path

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ocr_lib_spark.config import DEFAULT_CONFIG, ExtractionConfig
from ocr_lib_spark.pipeline import extract_turns

LINEAGE_SCHEMA = (
    "input_snapshot_id string, partition_hash string, bucket int, "
    "turn_count long, bytes_processed long, wall_ms long, "
    "segment_ms long, classify_ms long, assemble_ms long, status string"
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


def parquet_snapshot_id(input_path: str) -> str:
    """Content-addressed snapshot id for a parquet directory: sha256
    over the sorted (relative name, size) listing of data files. Any
    append/rewrite/compaction changes the id; a byte-identical layout
    keeps it — the plain-filesystem twin of an Iceberg snapshot id."""
    root = Path(input_path)
    h = hashlib.sha256()
    for p in sorted(root.rglob("*.parquet")):
        h.update(str(p.relative_to(root)).encode())
        h.update(str(p.stat().st_size).encode())
    return f"parquet:{h.hexdigest()[:16]}"


def bucket_of(conv_id_col, n_buckets: int):
    """Deterministic bucket: positive mod of a stable hash of conv_id.
    Salting-compatible: bucketing keys the *checkpoint* unit; the heavy
    stage still spreads turns via (conv_id, turn_idx) repartitioning."""
    return F.pmod(F.xxhash64(conv_id_col), F.lit(n_buckets)).cast("int")


def committed_buckets(spark, out_dir: str, input_snapshot_id: str | None = None) -> set[int]:
    """Buckets with a committed lineage row — for THIS snapshot when
    ``input_snapshot_id`` is given (rows committed against a different
    snapshot are stale and do not block re-processing)."""
    ldir = Path(out_dir) / "lineage"
    if not ldir.exists():
        return set()
    files = sorted(str(p) for p in ldir.glob("bucket=*.parquet"))
    if not files:
        return set()
    rows = spark.read.parquet(*files).where(F.col("status") == "committed")
    if input_snapshot_id is not None:
        rows = rows.where(F.col("input_snapshot_id") == input_snapshot_id)
    return {r["bucket"] for r in rows.collect()}


def run_with_resume(
    transcripts: DataFrame,
    out_dir: str,
    cfg: ExtractionConfig = DEFAULT_CONFIG,
    n_buckets: int | None = None,
    input_snapshot_id: str = "parquet:v1",
    fail_after: int | None = None,
    buckets_per_job: int = 1,
) -> int:
    """Run extraction bucket-by-bucket, committing lineage per bucket.

    Returns the number of buckets processed in THIS run (buckets already
    committed *for this input snapshot* are skipped; a changed snapshot
    reprocesses everything, including rebuilding the staging layout).
    ``fail_after`` injects a crash after N bucket commits — used by the
    resume tests.

    Two passes over the data, total — scale-critical: a per-bucket
    filter on ``hash(conv_id) % N`` cannot push down to a parquet scan,
    so looping buckets directly over the source would re-scan the FULL
    corpus once per bucket (4096 full scans at 100 TB). Instead:

      1. ONE staging pass shuffles the source into a
         ``__bucket``-partitioned parquet layout (resume-safe: skipped
         when its _SUCCESS marker exists AND it was built from this
         snapshot);
      2. each bucket job reads ONLY its partition directory (partition
         pruning on ``__bucket``), extracts, commits output + lineage.

    At cluster scale buckets are coarse (e.g. 4096) and the driver loop
    is a cheap metadata operation per bucket — but one Spark JOB per
    bucket still costs scheduler round-trips. ``buckets_per_job`` (>1)
    processes a GROUP of uncommitted buckets per job: one grouped stats
    pass, one extraction job written ``partitionBy(bucket)`` (dynamic
    partition overwrite), then one lineage commit marker per bucket.
    4096 buckets at buckets_per_job=32 → 128 jobs instead of 4096,
    identical outputs and resume semantics; the checkpoint GRAIN
    becomes the group (a crash mid-group re-runs that whole group), and
    per-bucket stage_ms are the group's kernel totals prorated by each
    bucket's turn share (exact when buckets_per_job=1).
    """
    import shutil

    spark = transcripts.sparkSession
    n_buckets = n_buckets or cfg.lineage_buckets
    out = Path(out_dir)

    staging = out / "staging"
    marker = out / "staging_snapshot.txt"
    staging_current = (
        (staging / "_SUCCESS").exists()
        and marker.exists()
        and marker.read_text() == input_snapshot_id
    )
    if not staging_current:
        # Snapshot changed (or first run): every committed bucket is
        # stale BY DEFINITION (resume within one snapshot never rebuilds
        # staging). Dynamic partition overwrite below only replaces
        # partitions that receive rows, so a bucket with rows under the
        # old snapshot and ZERO rows under this one would otherwise keep
        # its stale data files behind a fresh committed lineage row —
        # truncate data + lineage up front instead.
        shutil.rmtree(out / "data", ignore_errors=True)
        shutil.rmtree(out / "lineage", ignore_errors=True)
    done = committed_buckets(spark, out_dir, input_snapshot_id)
    (out / "data").mkdir(parents=True, exist_ok=True)
    (out / "lineage").mkdir(parents=True, exist_ok=True)
    if not staging_current:
        (
            transcripts.withColumn("__bucket", bucket_of(F.col("conv_id"), n_buckets))
            .write.mode("overwrite")
            .partitionBy("__bucket")
            .parquet(str(staging))
        )
        marker.write_text(input_snapshot_id)
    src = spark.read.parquet(str(staging))
    # kernel-phase accumulators: tasks add segment/classify/assemble CPU
    # seconds; per-bucket deltas land in the lineage row — the measured
    # twin of the reference's hard-coded stage weights (core.clj:153-164)
    acc = {
        k: spark.sparkContext.accumulator(0.0)
        for k in ("segment", "classify", "assemble")
    }
    pending = [b for b in range(n_buckets) if b not in done]
    processed = 0
    for gi in range(0, len(pending), max(buckets_per_job, 1)):
        group = pending[gi : gi + max(buckets_per_job, 1)]
        t0 = time.monotonic()
        before = {k: a.value for k, a in acc.items()}
        # partition-pruned read: only the group's staging/__bucket=K dirs
        part = src.where(F.col("__bucket").isin(group))
        stats = {
            r["__bucket"]: (int(r["n"]), int(r["nbytes"]))
            for r in part.groupBy("__bucket")
            .agg(
                F.count("*").alias("n"),
                F.coalesce(F.sum(F.length("text")), F.lit(0)).alias("nbytes"),
            )
            .collect()
        }
        extracted = extract_turns(
            part.drop("__bucket"), cfg, repartition=False, stage_acc=acc
        ).withColumn("bucket", bucket_of(F.col("conv_id"), n_buckets))
        (
            extracted.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("bucket")
            .parquet(str(out / "data"))
        )
        wall_ms = int((time.monotonic() - t0) * 1000)
        stage_ms = {k: int((a.value - before[k]) * 1000) for k, a in acc.items()}
        group_turns = max(sum(n for n, _ in stats.values()), 1)
        for b in group:
            n, nbytes = stats.get(b, (0, 0))
            share = n / group_turns
            lineage_row = [
                (
                    input_snapshot_id,
                    f"xxhash64(conv_id)%{n_buckets}={b}",
                    b,
                    n,
                    nbytes,
                    wall_ms if len(group) == 1 else int(wall_ms * share),
                    int(stage_ms["segment"] * (1 if len(group) == 1 else share)),
                    int(stage_ms["classify"] * (1 if len(group) == 1 else share)),
                    int(stage_ms["assemble"] * (1 if len(group) == 1 else share)),
                    "committed",
                )
            ]
            spark.createDataFrame(lineage_row, LINEAGE_SCHEMA).coalesce(1).write.mode(
                "overwrite"
            ).parquet(str(out / "lineage" / f"bucket={b}.parquet"))
        processed += len(group)
        if fail_after is not None and processed >= fail_after:
            raise RuntimeError(f"injected failure after {processed} buckets")
    return processed


def read_output(spark, out_dir: str) -> DataFrame:
    return spark.read.parquet(str(Path(out_dir) / "data" / "bucket=*"))


def read_lineage(spark, out_dir: str) -> DataFrame:
    files = sorted(str(p) for p in (Path(out_dir) / "lineage").glob("bucket=*.parquet"))
    return spark.read.parquet(*files)
