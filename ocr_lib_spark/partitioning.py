"""Scale-adaptive input spreading for CPU-dense Arrow kernel stages.

Guide §2/§4: a per-row Python kernel (MinHash, SimHash, image decode,
IVF assignment) is CPU-bound per ROW, but Spark sizes scan splits and
AQE-coalesced shuffle reads by BYTES. A small input (one parquet split,
or a post-shuffle stage coalesced to ~1 partition) therefore runs the
kernel on 1-2 tasks while every other core idles — measured 589 ms on
ONE task for the sf0.1 MinHash signature stage at local[32], ~8x the
parallel cost.

``spread_small`` inserts one round-robin repartition to
defaultParallelism ONLY when the optimizer's size estimate says the
input is far too small to have been split by bytes anyway
(< cores x SPARK_GRAFT_SPREAD_BYTES_PER_TASK, default 4 MB — the scan
packer's openCostInBytes, i.e. "inputs the scan itself would never
parallelize"). At production scale the estimate exceeds the threshold
and the plan is UNCHANGED — no shuffle is ever added to a big input
(the kernels stay zero-shuffle there); results are identical either
way because every kernel is row-pure (partitioning only changes batch
composition, pinned by tests).

Join outputs carry multiplicative size estimates (measured: a 254 KB
self-join estimating 353 GB), so callers spreading a post-join kernel
input pass ``probe=`` a base-table frame whose estimate is honest.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

#: per-task byte budget under which an input is considered "too small
#: for byte-based splitting" — matches spark.sql.files.openCostInBytes
SPREAD_BYTES_PER_TASK = int(
    os.environ.get("SPARK_GRAFT_SPREAD_BYTES_PER_TASK", str(4 << 20))
)

#: cap on how many partitions a spread fans out to. An input small
#: enough to trigger a spread has per-task kernel work in the tens of
#: ms, and tasks carry a fixed scheduling/python-roundtrip cost, so
#: past a handful of tasks the overhead eats the parallelism (measured
#: on the sf0.1 MinHash stage at local[32]: 1 task 0.40s, 8 tasks
#: 0.23s, 32 tasks 0.27s — and every downstream narrow stage inherits
#: the partition count, multiplying the 32-task tax). 8 is the
#: local-mode sweet spot; on a cluster the spread only fires for
#: similarly tiny inputs, where the same logic holds per executor.
SPREAD_MAX_PARTITIONS = int(os.environ.get("SPARK_GRAFT_SPREAD_MAX", "8"))


def plan_size_bytes(df: DataFrame) -> int:
    """Catalyst's size estimate for the frame's optimized plan (bytes);
    -1 when the estimate is unavailable."""
    try:
        return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:
        return -1


def spread_small(
    df: DataFrame, probe: DataFrame | None = None, target: int | None = None
) -> DataFrame:
    """Round-robin repartition ``df`` to ``target`` (default
    defaultParallelism) iff the size estimate of ``probe`` (default
    ``df``) is under target x SPREAD_BYTES_PER_TASK; otherwise return
    ``df`` unchanged. AQE never coalesces an explicit numbered
    repartition, so the kernel stage keeps its parallelism."""
    spark = df.sparkSession
    p = target or min(
        spark.sparkContext.defaultParallelism, SPREAD_MAX_PARTITIONS
    )
    size = plan_size_bytes(probe if probe is not None else df)
    if 0 <= size < p * SPREAD_BYTES_PER_TASK:
        return df.repartition(p)
    return df
