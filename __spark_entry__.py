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

from ocr_lib_spark.gatestate import current_fingerprints, load_state, priority_order
from ocr_lib_spark.plans import build_registry

_REGISTRY = build_registry()


def _gate_priority_order(names) -> list[str]:
    """Order queries for the driver gate: CHANGED-FIRST (round-5
    redesign per ADVICE.md). The harness verifies a bounded prefix of
    queries() (~50 entries), so iteration order decides which queries
    get an external CORRECTNESS row. Queries whose implementation
    fingerprint (fn source + oracle SQL) differs from the one recorded
    at their last green external gate — or that were never gated —
    sort first, in registry order; verified-unchanged queries keep
    stable registry order after them. The record lives in the
    git-TRACKED GATE_STATE.json (deterministic across checkouts),
    maintained by tools/gate_state.py at round start. Missing state
    file => plain registry order with every query in the priority tier,
    which is the same thing."""
    return priority_order(list(names), current_fingerprints(_REGISTRY), load_state())


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: derive transcripts from
    the documents table, run the extraction pipeline, return per-turn
    clean text + spans + block counts."""
    from ocr_lib_spark.pipeline import extract_turns
    from ocr_lib_spark.sources.synth import transcripts_from_documents

    tr = transcripts_from_documents(spark, "/root/testdata/sf0.001")
    return extract_turns(tr)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    order = _gate_priority_order(list(_REGISTRY))
    return {name: _REGISTRY[name].fn for name in order}


def oracle_sql() -> dict[str, str]:
    order = _gate_priority_order(list(_REGISTRY))
    return {name: _REGISTRY[name].oracle for name in order if _REGISTRY[name].oracle}
