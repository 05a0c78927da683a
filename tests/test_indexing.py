"""Unit tests for corpus indexing / IR statistics (plans/indexing.py)."""

from pyspark.sql import Window
from pyspark.sql import functions as F

from ocr_lib_spark.plans.indexing import (
    HEAPS_BUCKETS,
    TFIDF_K,
    TFIDF_QK,
    TFIDF_RARE_NUM,
    _q_heaps_law_curve,
    _q_inverted_index_stats,
    _q_tfidf_topk,
)

SF = "/root/testdata/sf0.001"


def test_tfidf_two_phase_equals_single_window(spark):
    """The two-phase per-term top-k must equal the single-window plan
    (total order: score DESC, doc_id ASC) at any partitioning."""
    from ocr_lib_spark.plans.indexing import _tok_doc_counts

    out = {
        (r["tok"], r["rnk"]): r["doc_id"]
        for r in _q_tfidf_topk(spark, SF).collect()
    }
    # independent single-window recompute
    td = _tok_doc_counts(spark, SF)
    dfs = td.groupBy("tok").agg(F.count("*").alias("df_docs"))
    n = td.select("doc_id").distinct().count()
    qt = (
        dfs.where(F.col("df_docs") * TFIDF_RARE_NUM <= n)
        .orderBy(F.desc("df_docs"), F.asc("tok"))
        .limit(TFIDF_QK)
        .withColumn("idf", F.length(F.expr(f"bin({n} DIV df_docs)")) - 1)
    )
    cand = td.join(qt.select("tok", "idf"), "tok").select(
        "tok", "doc_id", (F.col("tf") * F.col("idf")).alias("score")
    )
    w = Window.partitionBy("tok").orderBy(F.desc("score"), F.asc("doc_id"))
    ref = {
        (r["tok"], r["rnk"]): r["doc_id"]
        for r in cand.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= TFIDF_K)
        .collect()
    }
    assert out == ref and len(out) > 0


def test_tfidf_query_terms_are_discriminative(spark):
    rows = _q_tfidf_topk(spark, SF).collect()
    assert all(r["idf_bits"] >= 2 for r in rows)
    assert len({r["tok"] for r in rows}) <= TFIDF_QK
    assert all(1 <= r["rnk"] <= TFIDF_K for r in rows)


def test_inverted_index_checksum_partition_invariant(spark):
    """Shard checksums are BIT_XOR folds — identical under any input
    partitioning (order independence is the design claim)."""
    a = {r["shard"]: r for r in _q_inverted_index_stats(spark, SF).collect()}

    # recompute with a hostile repartition injected into the token feed
    import ocr_lib_spark.plans.indexing as ix

    orig = ix._tok_doc_counts
    try:
        ix._tok_doc_counts = lambda s, d: orig(s, d).repartition(37)
        b = {
            r["shard"]: r for r in _q_inverted_index_stats(spark, SF).collect()
        }
    finally:
        ix._tok_doc_counts = orig
    assert set(a) == set(b)
    for s in a:
        assert a[s].asDict() == b[s].asDict()
    # conservation: postings across shards == distinct (tok, doc) pairs
    from ocr_lib_spark.plans.textops import _toks_nonempty

    n_pairs = _toks_nonempty(spark, SF).select("tok", "doc_id").distinct().count()
    assert sum(r["n_postings"] for r in a.values()) == n_pairs


def test_heaps_curve_monotone_and_conserves_totals(spark):
    from ocr_lib_spark.plans.textops import _toks_nonempty

    rows = sorted(
        _q_heaps_law_curve(spark, SF).collect(), key=lambda r: r["bucket"]
    )
    assert 0 < len(rows) <= HEAPS_BUCKETS
    occ = [r["cum_occurrences"] for r in rows]
    dis = [r["cum_distinct_tokens"] for r in rows]
    assert occ == sorted(occ) and dis == sorted(dis)
    # every prefix: distinct <= occurrences
    assert all(d <= o for d, o in zip(dis, occ))
    toks = _toks_nonempty(spark, SF)
    assert occ[-1] == toks.count()
    assert dis[-1] == toks.select("tok").distinct().count()

def test_embedding_quantize_invariants(spark):
    """int8 code range, saturation at the max-magnitude element, and the
    quantization-step error bound err <= maxabs/127 + 1."""
    from ocr_lib_spark.plans.vectors import QUANT_LEVELS, _q_embedding_quantize

    rows = _q_embedding_quantize(spark, SF).collect()
    assert len(rows) == 500
    for r in rows:
        assert -QUANT_LEVELS <= r["q_min"] <= r["q_max"] <= QUANT_LEVELS
        if r["maxabs"] > 0:
            # the max-|v| element always saturates to +/-127 with zero error
            assert r["n_saturated"] >= 1
            assert r["err_max"] <= r["maxabs"] // QUANT_LEVELS + 1
        else:
            assert (r["q_min"], r["q_max"], r["err_sum"]) == (0, 0, 0)


def test_event_funnel_strict_order_contract(spark, tmp_path):
    """Clicks BEFORE the first view must not convert; simultaneous
    timestamps must not chain (strict '>'); each stage counts a user
    at most once."""
    from datetime import datetime

    from ocr_lib_spark.plans.relational import _q_event_funnel

    t = lambda s: datetime(2024, 1, 1, 0, 0, s)  # noqa: E731
    rows = [
        # u1: full ordered funnel
        (1, t(1), 1, "view", 0.0, ""), (2, t(2), 1, "click", 0.0, ""),
        (3, t(3), 1, "purchase", 0.0, ""),
        # u2: click precedes the only view -> stalls at stage 1
        (4, t(5), 2, "click", 0.0, ""), (5, t(6), 2, "view", 0.0, ""),
        # u3: click simultaneous with view -> strict '>' blocks stage 2
        (6, t(7), 3, "view", 0.0, ""), (7, t(7), 3, "click", 0.0, ""),
        # u4: purchase without click -> stage 1 only
        (8, t(8), 4, "view", 0.0, ""), (9, t(9), 4, "purchase", 0.0, ""),
        # u5: no view at all -> not in any stage
        (10, t(10), 5, "click", 0.0, ""), (11, t(11), 5, "purchase", 0.0, ""),
    ]
    sf = str(tmp_path / "sf")
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.parquet(f"{sf}/events.parquet")
    r = _q_event_funnel(spark, sf).collect()[0]
    assert (r["n_users"], r["n_stage1"], r["n_stage2"], r["n_stage3"]) == (5, 4, 1, 1)
    assert (r["s1_bp"], r["s2_of_s1_bp"], r["s3_of_s2_bp"]) == (8000, 2500, 10000)


def test_hostile_ws_fixture_is_live_and_token_invariant(spark):
    """The hostile-whitespace derived fixture (HOSTILE_WS_SQL) must
    (a) actually inject tabs/newlines at gate scale — a rewrite that
    never fires would leave the gate blind on the whitespace axis the
    r7 ADVICE flagged — and (b) leave the token multiset invariant
    under the shared \\s+ contract, so the six toks-family greens
    carry over byte-for-byte. A single-space split (the r7 oracle
    convention) must DIVERGE on the rewritten docs, proving the probe
    can detect a contract regression on either engine."""
    import duckdb

    from ocr_lib_spark.plans.textops import HOSTILE_WS_SQL, _toks_nonempty

    hostile = HOSTILE_WS_SQL.format(d="doc_id", t="text")
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n_rewritten = docs.where(
        F.expr(f"({hostile}) <> text") & F.col("text").contains(" ")
    ).count()
    assert n_rewritten > 0  # classes 1/3/5 fire on the real fixture

    # (b) token multiset invariance: hostile + \s+ == plain + \s+
    plain = (
        docs.select("doc_id", F.explode(F.split(F.trim("text"), r"\s+")).alias("tok"))
        .where(F.col("tok") != "")
    )
    a = _toks_nonempty(spark, SF).groupBy("tok").count()
    b = plain.groupBy("tok").count()
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()

    # the probe is live: a literal single-space split over the hostile
    # text yields a DIFFERENT token count (tabs/newlines not split)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    n_regex, n_space = con.execute(
        f"""SELECT
          (SELECT count(*) FROM (SELECT unnest(regexp_split_to_array(
              trim({hostile}), '\\s+')) AS tok FROM documents) WHERE tok <> ''),
          (SELECT count(*) FROM (SELECT unnest(string_split(
              trim({hostile}), ' ')) AS tok FROM documents) WHERE tok <> '')"""
    ).fetchone()
    assert n_regex == plain.count()
    assert n_space != n_regex
