"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship main-content extraction over the transcript
                 corpus derived from sf0.001 documents.
queries()      — every implemented operator (SURVEY.md §2 + training-data
                 ops), one callable per name.
oracle_sql()   — DuckDB twin per query. EVERY query has one (round 2):
               approx_sketches emits exact companions + within-bounds
               booleans the oracle pins TRUE, so even the sketch query
               is hash-verified and driver-failable.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ocr_lib_spark.plans import build_registry

_REGISTRY = build_registry()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: derive transcripts from
    the documents table, run the extraction pipeline, return per-turn
    clean text + spans + block counts."""
    from ocr_lib_spark.pipeline import extract_turns
    from ocr_lib_spark.sources.synth import transcripts_from_documents

    tr = transcripts_from_documents(spark, "/root/testdata/sf0.001")
    return extract_turns(tr)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: qd.fn for name, qd in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: qd.oracle for name, qd in _REGISTRY.items() if qd.oracle}
