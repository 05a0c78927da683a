"""Unit tests for agent-transcript analytics (plans/agentops.py):
tool-flow transition census, tool-output census, context-window
truncation. Oracle parity is externally gated; these tests pin the
operator semantics on hand-built adversarial frames."""

from pyspark.sql import functions as F

from ocr_lib_spark.plans.agentops import CTX_BUDGET, ctx_truncate


def _extracted(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, extracted_text string"
    )


def test_ctx_truncate_keeps_longest_fitting_suffix(spark):
    # 1 bpe token per word on plain lowercase words ("a b" -> ["a", " b"]).
    word = "tok"
    mk = lambda n: " ".join([word] * n)  # noqa: E731
    rows = [
        # conv A: turns of 40/40/40 tokens; budget 96 keeps last two.
        ("A", 0, mk(40)),
        ("A", 1, mk(40)),
        ("A", 2, mk(40)),
        # conv B: final turn alone overflows -> zero kept, sentinel -1.
        ("B", 0, mk(5)),
        ("B", 1, mk(CTX_BUDGET + 1)),
        # conv C: everything fits exactly at the budget boundary.
        ("C", 0, mk(CTX_BUDGET)),
        # conv D: empty turns count zero and stay keepable.
        ("D", 0, mk(200)),
        ("D", 1, ""),
        ("D", 2, ""),
    ]
    out = {
        r["conv_id"]: r
        for r in ctx_truncate(_extracted(spark, rows)).collect()
    }
    a = out["A"]
    assert (a["first_kept_turn"], a["n_kept"], a["kept_tokens"]) == (1, 2, 80)
    assert (a["n_turns"], a["total_tokens"]) == (3, 120)
    b = out["B"]
    assert (b["first_kept_turn"], b["n_kept"], b["kept_tokens"]) == (-1, 0, 0)
    c = out["C"]
    assert (c["first_kept_turn"], c["n_kept"], c["kept_tokens"]) == (
        0,
        1,
        CTX_BUDGET,
    )
    d = out["D"]
    # the two empty turns form the kept suffix; the 200-token turn is cut
    assert (d["first_kept_turn"], d["n_kept"], d["kept_tokens"]) == (1, 2, 0)


def test_ctx_truncate_suffix_is_contiguous_under_repartition(spark):
    # Partitioning must not change the kept suffix (bounded-key window).
    rows = [("E", i, " ".join(["w"] * (10 * (i + 1)))) for i in range(6)]
    base = ctx_truncate(_extracted(spark, rows)).collect()[0]
    shuffled = ctx_truncate(
        _extracted(spark, rows).repartition(7, "turn_idx")
    ).collect()[0]
    assert base.asDict() == shuffled.asDict()
    # suffix sums walking back: 60 <= 96 < 110 -> keeps only turn 5.
    assert (base["first_kept_turn"], base["n_kept"], base["kept_tokens"]) == (
        5,
        1,
        60,
    )


def test_tool_bigrams_start_state_counts_first_calls(spark, tmp_path):
    # Derived fixture: run the registry query on a tiny documents table
    # staged as parquet, then check the START-row invariant: the sum of
    # START->x n_convs equals the number of conversations with >=1 tool
    # call (every conversation's first tool call lands in a START row).
    import duckdb  # noqa: F401  (parity checked externally; here Spark-only)

    from ocr_lib_spark.plans.agentops import _q_tool_call_bigrams
    from ocr_lib_spark.sources.synth import duckdb_transcripts_cte  # noqa: F401

    docs = spark.range(0, 700).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text "), F.col("id").cast("string")).alias("text"),
        F.lit("en").alias("lang"),
        F.lit("synth").alias("source"),
        F.lit(6).cast("long").alias("n_chars"),
    )
    sf_dir = str(tmp_path / "sf")
    docs.coalesce(1).write.parquet(f"{sf_dir}/documents.parquet")
    out = _q_tool_call_bigrams(spark, sf_dir).collect()
    start_convs = sum(r["n_convs"] for r in out if r["tool_a"] == "START")
    # 700 docs -> convs 0..99, turns 0..6; tool call iff doc_id%7==3 —
    # exactly one doc_id in each conv's 7 turns -> 100 conversations.
    assert start_convs == 100
    # one tool call per conv -> no non-START transitions at this layout
    assert all(r["tool_a"] == "START" for r in out)
    assert sum(r["n_pairs"] for r in out) == 100

def test_link_census_flags_boilerplate_chrome(spark):
    """NAV/FOOTER hrefs appear in every boilerplate-wrapped turn; the
    LINKFARM pages only in case-2 turns — their turn shares must order
    accordingly, and occurrence counts must exceed turn counts only via
    multi-occurrence payloads."""
    from ocr_lib_spark.plans.agentops import _q_link_census

    rows = {r["href"]: r for r in _q_link_census(spark, "/root/testdata/sf0.001").collect()}
    assert "/home" in rows and "/page1" in rows
    # nav chrome (cases 1,2,5) covers ~3/7 of turns; linkfarm only ~1/7
    assert rows["/home"]["turn_share_bp"] > rows["/page1"]["turn_share_bp"]
    for r in rows.values():
        assert r["n_occurrences"] >= r["n_turns"] > 0
        assert 0 < r["turn_share_bp"] <= 10000


def test_json_tool_parse_malformed_wrapper_census(spark, monkeypatch):
    """A '{'-prefixed payload that fails JSON extraction lands in the
    __invalid__ bucket on BOTH engines (Spark get_json_object -> NULL;
    oracle json_valid guard -> NULL); non-wrapper payloads never enter."""
    import ocr_lib_spark.plans.agentops as ag

    frame = spark.createDataFrame(
        [
            ("c", 0, "user", '{"tool_call": "search", "output": "abcd"}', "search", None),
            ("c", 1, "tool", '{"tool_call": "py", "output": "xy"}', "py", None),
            ("c", 2, "user", '{broken json', "", None),
            ("c", 3, "user", '{"other_key": 1}', "", None),
            ("c", 4, "user", "plain text, no wrapper", "", None),
        ],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    monkeypatch.setattr(ag, "transcripts_from_documents", lambda s, d: frame)
    out = {r["tool_name"]: r for r in ag._q_json_tool_parse(spark, "ignored").collect()}
    assert out["search"]["sum_output_chars"] == 4
    assert out["py"]["n_turns"] == 1
    # broken JSON and valid-JSON-without-field both fail field extraction
    assert out["__invalid__"]["n_turns"] == 2
    assert out["__invalid__"]["sum_output_chars"] == 0
    assert "plain" not in " ".join(out)  # non-wrapper rows filtered pre-parse


def test_wrapper_grammar_cross_engine_parity_adversarial():
    """ADVICE r7 (medium): Spark get_json_object is lenient where DuckDB
    json_valid is strict ('{...} trailing' extracted on Spark, bucketed
    __invalid__ by the old oracle) and json_valid is lenient where
    Jackson is strict (trailing commas, NaN, duplicate keys). The fix is
    WRAPPER_GRAMMAR — one flat-object regex both engines run. This pins
    the full adversarial battery: validity AND the extracted
    (tool_call, length(output)) must agree byte-for-byte across engines
    on every class, including the exact ADVICE reproducer."""
    import duckdb

    from ocr_lib_spark.plans.agentops import WRAPPER_GRAMMAR

    cases = [
        '{"tool_call": "x", "output": "y"}',
        '{"tool_call": "x", "output": "y"} trailing',  # the ADVICE reproducer
        '{"tool_call": "x",}',          # trailing comma: json_valid=true, Jackson=false
        "{'tool_call': 'x'}",
        '{"a": NaN}',                   # json_valid=true, Jackson=false
        "{ }", "{}",
        '{"a": 1e999}',
        '{"dup": 1, "dup": 2}',         # json_valid=true, Jackson=false
        '{"nested": {"tool_call": "x"}}',  # non-flat: outside the contract
        '{"a": [1,2]}',
        '{"tool_call": null}',
        '{"a": 01}', '{"a": .5}',
        '{"tool_call": "x\\ny"}',       # escaped newline decodes on both
        '{"tool_call": "x\\u0041"}',    # \\u escape decodes on both
        '{"tool_call": "x\\qy"}',       # invalid escape: outside the contract
        '{"tool_call":"x"}\n',          # Java $ matches before final \n; \\z must not
        '{"tool_call": "x"}\t',
        '{"a":1,"tool_call":"t","output":"o"}',
        '{"tool_call": "a\\"b", "output": "c\\\\d"}',
        '{"tool_call":"a","tool_call":"b"}',  # dup tool_call key
    ]

    from ocr_lib_spark.session import get_spark

    spark = get_spark(cores=4)
    from pyspark.sql import functions as F

    ok = F.col("text").rlike(WRAPPER_GRAMMAR)
    srows = (
        spark.createDataFrame([(c,) for c in cases], "text string")
        .select(
            ok.alias("m"),
            F.when(ok, F.get_json_object("text", "$.tool_call")).alias("tn"),
            F.when(ok, F.length(F.get_json_object("text", "$.output"))).alias("ol"),
        )
        .collect()
    )
    con = duckdb.connect()
    for c, r in zip(cases, srows):
        dm, dtn, dol = con.execute(
            "SELECT regexp_matches(?, ?), "
            "CASE WHEN regexp_matches(?, ?) THEN json_extract_string(?, '$.tool_call') END, "
            "CASE WHEN regexp_matches(?, ?) THEN length(json_extract_string(?, '$.output')) END",
            [c, WRAPPER_GRAMMAR, c, WRAPPER_GRAMMAR, c, c, WRAPPER_GRAMMAR, c],
        ).fetchone()
        assert (bool(dm), dtn, dol) == (bool(r["m"]), r["tn"], r["ol"]), (
            c, (dm, dtn, dol), (r["m"], r["tn"], r["ol"]))
