"""SparkSession factory tuned for this engine.

Local mode is the test/bench harness; the same config block is what a
`spark-submit --py-files` deployment would carry to a real cluster
(where `master`/`shuffle partitions` come from the cluster manager).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _pin_blas_threads() -> None:
    """Pin per-process BLAS/OpenMP pools to one thread.

    Every Spark python worker is already one task = one core; without
    this, each of N workers spawns an nproc-sized OpenBLAS pool for the
    numpy prototype-matrix ops (N×nproc threads on nproc cores), and at
    high parallelism the kernel-side thrash *inverts* scaling (measured:
    local[32] 2.3× slower than local[8] on this box before the pin).
    Must run before the JVM starts: workers inherit the driver env.
    """
    for var in (
        "OMP_NUM_THREADS",
        "OPENBLAS_NUM_THREADS",
        "MKL_NUM_THREADS",
        "NUMEXPR_NUM_THREADS",
        "VECLIB_MAXIMUM_THREADS",
    ):
        os.environ.setdefault(var, "1")


def get_spark(
    app: str = "ocr-lib-spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    driver_memory: str = "6g",
    extra: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's standard config.

    - AQE on: runtime partition coalescing + skew-join splitting are the
      backstop for residual skew after explicit conv_id salting.
    - Arrow on: every pandas UDF round-trips columnar batches.
    - UTC session timezone: required for DuckDB-oracle comparability.
    - Modest pre-touched heap: a large lazily-grown heap (24g) measured
      3-5× slower at local[32] — heap grow/shrink under concurrent
      allocation is kernel-bound (mmap + page zeroing showed up as
      60-70%% sys time). ``-Xms == -Xmx`` + ``AlwaysPreTouch`` keeps the
      steady state out of the kernel; on a real cluster this is the
      standard executor sizing rule (fixed heap per executor).
    """
    _pin_blas_threads()
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 4)
    if shuffle_partitions is None:
        shuffle_partitions = max(cores, 4)
    b = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config(
            "spark.driver.extraJavaOptions",
            f"-Xms{driver_memory} -XX:+AlwaysPreTouch",
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # larger Arrow batches amortize per-batch python/Arrow overhead
        # AND raise the extraction kernel's per-batch payload-memoization
        # hit rate (real corpora repeat boilerplate payloads). Measured
        # on the 3M-turn bench corpus (local[8] auto path): 10k->459k,
        # 24k->629k, 32k->694k, 48k->756k turns/s; 32k keeps 2->8
        # scaling efficiency at ~0.97 (48k thins it to ~0.88: level-2
        # gains proportionally more) and bounds in-flight batch memory
        # to ~32 MB per worker — safe at local[32] and per-executor-core
        # on a cluster
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            os.environ.get("SPARK_GRAFT_ARROW_BATCH", "32000"),
        )
        .config("spark.driver.memory", driver_memory)
        # Pre-size scan splits to >= SPARK_GRAFT_SCAN_WAVES (default 8)
        # even waves per core (VERDICT r7 item 3): with the default
        # (minPartitionNum = parallelism) a medium input lands in the
        # awkward zone — e.g. a 317 MB corpus read at local[2] packed
        # into 5 uneven splits = 2.5 task waves with a half-idle tail,
        # and 1.3 GB at local[8] into 19 skewed splits (max/median task
        # 17.2s/13.0s; profiled via tools/profile_auto.py). Asking the
        # scan for waves*cores splits makes them ~equal by construction
        # (bytesPerCore sizing) with NO exchange — the cluster-scale
        # analog is sizing maxPartitionBytes off the table census
        # before a big read. Same-session A/B at 4 vs 8 waves: level-2
        # 201k->211k turns/s, level-8 731k->780k, last-stage task-time
        # quantiles [1671..2160]ms vs [3988..12528]ms unsized — finer
        # even splits shrink the straggler wave tail faster than the
        # per-task fixed cost grows (tasks stay ~1.8s at bench scale;
        # at 100 TB they are minutes, so 8 waves is pure margin).
        .config(
            "spark.sql.files.minPartitionNum",
            str(int(os.environ.get("SPARK_GRAFT_SCAN_WAVES", "8")) * cores),
        )
        # File-open cost charged per file when packing scan splits. The
        # 4 MB default models remote-storage open latency; it also FLOORS
        # the split size, so a small-but-CPU-dense scan (e.g. a 2.6 MB
        # parquet of 150k rows feeding an explode+join stage) packs into
        # ONE task while every other core idles — measured 399 ms
        # single-task stages in the r9 battery profile. Local NVMe +
        # page cache make the true open cost ~none; 256 KB lets
        # minPartitionNum's bytesPerCore sizing actually split small
        # inputs. Scale-inert: once bytesPerCore exceeds 256 KB (any
        # real corpus), splits are sized by bytesPerCore/maxPartitionBytes
        # exactly as before; on object storage keep the 4 MB default.
        .config(
            "spark.sql.files.openCostInBytes",
            os.environ.get("SPARK_GRAFT_OPEN_COST", str(256 * 1024)),
        )
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
