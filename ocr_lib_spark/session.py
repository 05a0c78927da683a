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
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
