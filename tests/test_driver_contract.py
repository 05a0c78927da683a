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
    # round-5 cheap representatives: full-width simhash, two-phase
    # vocabulary rank, conversation hygiene + packing compositions
    "simhash64_near_dup",
    "vocab_topk",
    "conv_turn_stats",
    "conv_packing",
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
    iteration order IS external-verification coverage. Round-5 policy
    (ADVICE.md): CHANGED-FIRST keyed off the git-tracked
    GATE_STATE.json — queries whose current fingerprint (fn source +
    oracle SQL) differs from the one verified at their last green
    external gate, or never gated, must all precede every
    verified-unchanged query. Round-6 extension (VERDICT r05 item 3):
    the verified-unchanged tier is ordered by last-green-gate round
    ASCENDING (oldest first) so unchanged queries cycle back through
    the externally verified prefix instead of never re-gating; ties and
    the stale tier keep stable registry order. Deterministic across
    checkouts: both inputs (registry source and state file) are
    tracked."""
    from ocr_lib_spark.gatestate import current_fingerprints, load_state
    from ocr_lib_spark.plans import build_registry

    reg = build_registry()
    fps = current_fingerprints(reg)
    state = load_state()

    def stale(n):
        rec = state.get(n)
        return not (isinstance(rec, dict) and rec.get("fp") == fps[n])

    order = list(entry_mod.queries())
    assert sorted(order) == sorted(reg), "order must be a registry permutation"
    assert list(entry_mod.oracle_sql()) == [n for n in order if n in entry_mod.oracle_sql()]
    flags = [stale(n) for n in order]
    assert flags == sorted(flags, reverse=True), (
        "changed/never-gated queries must all precede verified-unchanged ones: "
        f"{[(n, s) for n, s in zip(order, flags)]}"
    )
    pos = {n: i for i, n in enumerate(reg)}
    stale_pos = [pos[n] for n, s in zip(order, flags) if s]
    assert stale_pos == sorted(stale_pos), "stale tier must keep stable registry order"
    fresh_keys = [
        (state[n].get("round") or 0, pos[n]) for n, s in zip(order, flags) if not s
    ]
    assert fresh_keys == sorted(fresh_keys), (
        "verified-unchanged tier must age oldest-gate-round first, "
        "registry order within a round"
    )
