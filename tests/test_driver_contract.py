"""Driver-contract test: every queries() entry runs, and a fast subset
is compared against its DuckDB oracle at sf0.001 (the full battery runs
at sf0.01 via tools/check_correctness.py — same comparator)."""

import duckdb
import pytest

import __spark_entry__ as entry_mod
from tools.check_correctness import TABLES, frame_hash

SF_DIR = "/root/testdata/sf0.001"

FAST_SUBSET = [
    "extract_text",
    "extract_spans",
    "conv_assembly",
    "multimodal_meta",
    "q1_scan_agg",
    "top1_argmax",
    "gap_sessionize",
    "text_stats",
    "exact_dedup",
    "cosine_topk",
    # round-4 cheap representatives: Luhn/PII closed forms, the stitched
    # conv_near_dup oracle, loss-mask offsets, rule-bit gate, k-means CTE
    "pii_scrub",
    "loss_mask_spans",
    "gopher_quality_bits",
    "conv_near_dup",
    "ivf_train_loop",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return c


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    names = [f.name for f in df.schema.fields]
    assert names == [
        "conv_id", "turn_idx", "role", "extracted_text", "spans", "n_blocks",
        "unknown_blocks",
    ]
    assert df.count() > 0


def test_every_query_has_oracle():
    qs, os_ = entry_mod.queries(), entry_mod.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 20
    missing = set(qs) - set(os_)
    # every query is oracle-verified — approx_sketches included since
    # round 2: raw sketch values are engine-defined, so it emits exact
    # companions plus within-bounds booleans the oracle pins TRUE
    assert missing == set(), f"unexpected rows-only queries: {missing}"


@pytest.mark.parametrize("name", FAST_SUBSET)
def test_query_matches_oracle(spark, con, name):
    qs, os_ = entry_mod.queries(), entry_mod.oracle_sql()
    sdf = qs[name](spark, SF_DIR).toPandas()
    odf = con.execute(os_[name]).df()
    assert len(sdf) == len(odf), f"{name}: rows {len(sdf)} vs {len(odf)}"
    assert sorted(sdf.columns) == sorted(odf.columns)
    assert frame_hash(sdf) == frame_hash(odf), f"{name}: value hash mismatch"


def test_gate_priority_ordering():
    """The driver's gate runs a bounded prefix of queries() (r03
    recorded exactly the first 50 of 57 in iteration order), so
    iteration order IS external-verification coverage: queries never
    seen in a CORRECTNESS_r*.json must come first, and within the
    gated remainder, least-recently-gated first."""
    import glob
    import json
    import os

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    last = {}
    for path in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        rnd = int("".join(c for c in os.path.basename(path) if c.isdigit()))
        for q in json.load(open(path)):
            last[q] = max(last.get(q, 0), rnd)
    order = list(entry_mod.queries())
    assert list(entry_mod.oracle_sql()) == [n for n in order if n in entry_mod.oracle_sql()]
    rounds = [last.get(n, 0) for n in order]
    assert rounds == sorted(rounds), (
        "queries() must iterate least-recently-gated first: "
        f"{[(n, last.get(n, 0)) for n in order]}"
    )
