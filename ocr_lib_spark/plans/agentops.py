"""Agent-transcript analytics: tool-call flow, tool-output census,
context-window truncation.

The north-rule input table carries a ``tool`` column (BASELINE.json
input_hint) that the curation suite so far only counted
(conv_turn_stats.n_tool_calls). These plans make the agent half of the
transcript corpus first-class: what tools run, in what order, what they
return, and how a conversation is truncated to fit a training context
window. Reference analog: the per-operation progress/stage instrumentation
(core.clj:108-165) generalized from pixel stages to tool stages.

Derived-fixture convention (the boilerplate doc_id%9==4 precedent,
COVERAGE.md round-6): the synthetic corpus carries a single tool name
('search'), so a richer tool label is derived in closed form on BOTH
engines — tool_kind = CASE pmod(turn_idx, 4) — purely to exercise the
multi-tool grouping paths; a production caller feeds the real column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ocr_lib_spark.plans import QueryDef
from ocr_lib_spark.plans.extraction import _CASE, _CONV, _TURN
from ocr_lib_spark.sources.synth import transcripts_from_documents

#: tool_kind derivation, identical text on both engines (ANSI CASE).
TOOL_KINDS = ("search", "browser", "python", "editor")

_KIND_SQL = (
    "CASE CAST(turn_idx % 4 AS INT) WHEN 0 THEN 'search' WHEN 1 THEN 'browser' "
    "WHEN 2 THEN 'python' ELSE 'editor' END"
)

#: Tool-call WRAPPER GRAMMAR — the shared cross-engine validity
#: contract for json_tool_parse (ADVICE r7, medium). Native validators
#: provably disagree on malformed payloads: Spark get_json_object /
#: try_parse_json accept '{"tool_call":"x"} trailing' while DuckDB
#: json_valid rejects it, and json_valid accepts trailing commas / NaN
#: / duplicate keys that Jackson rejects — so "malformed", the exact
#: class this census exists to count, diverged cross-engine. The
#: contract is therefore a FLAT JSON-object grammar (string/number/
#: bool/null values, strict RFC-8259 numbers and escapes, \A..\z
#: anchored so trailing bytes — including Java's $-before-final-
#: newline allowance — fail) written once and run by both regex
#: engines (Java / RE2: no backrefs, no lookaround). JSON-path
#: extraction runs only on grammar-valid rows, where the engines
#: agree byte-for-byte (pinned by the injected-frame parity test in
#: tests/test_agentops.py over 21 adversarial payload classes).
_WRAPPER_STR = r'"(?:[^"\\\x00-\x1f]|\\["\\/bfnrt]|\\u[0-9a-fA-F]{4})*"'
_WRAPPER_NUM = r"-?(?:0|[1-9][0-9]*)(?:\.[0-9]+)?(?:[eE][+-]?[0-9]+)?"
_WRAPPER_VAL = f"(?:{_WRAPPER_STR}|{_WRAPPER_NUM}|true|false|null)"
WRAPPER_GRAMMAR = (
    r"\A\{\s*(?:" + _WRAPPER_STR + r"\s*:\s*" + _WRAPPER_VAL
    + r"(?:\s*,\s*" + _WRAPPER_STR + r"\s*:\s*" + _WRAPPER_VAL + r")*\s*)?\}\z"
)

#: context budget for ctx_truncate, in BPE-ish tokens. Fixture docs are
#: 0-99 tokens and the case-2 payload doubles its text (~199 tokens max
#: per turn), so 96 exercises BOTH branches on the fixture: most
#: conversations keep a 1-2 turn suffix, and a conversation whose LAST
#: non-empty turn alone exceeds 96 keeps zero turns (the left-join
#: fallback row). Production callers pass the model context length.
CTX_BUDGET = 96


def _tool_calls(spark, sf_dir) -> DataFrame:
    """Tool-call turns with the derived tool_kind label. The filter runs
    BEFORE anything expensive — at 10^12 turns the tool-call subset is
    typically 1-10% of the corpus and the predicate reaches the scan."""
    tr = transcripts_from_documents(spark, sf_dir)
    return tr.where(F.col("tool") != "").select(
        "conv_id",
        "turn_idx",
        F.expr(_KIND_SQL).alias("tool_kind"),
    )


def _q_tool_call_bigrams(spark, sf_dir) -> DataFrame:
    """Tool-flow mining: Markov transition census of tool-call pairs
    (tool_a -> tool_b) within a conversation, with a synthetic 'START'
    predecessor for each conversation's first tool call — the
    transition matrix an agent-behavior report is built from (START
    rows give the first-tool distribution, so the census is non-vacuous
    even for single-tool-call conversations).

    Scale shape: filter to tool calls first (scan-level predicate),
    ONE bounded-key window (lag per conv_id — the gap_sessionize shape,
    partition count = #convs, rows per partition = that conv's tool
    calls), then two combinable groupBys: (a,b,conv) pre-aggregate then
    (a,b) rollup — n_convs is never a COUNT(DISTINCT) over a skewable
    key. Output is (|kinds|+1) x |kinds| rows regardless of corpus size."""
    tc = _tool_calls(spark, sf_dir)
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    pairs = tc.select(
        F.coalesce(F.lag("tool_kind").over(w), F.lit("START")).alias("tool_a"),
        F.col("tool_kind").alias("tool_b"),
        "conv_id",
    )
    per_conv = pairs.groupBy("tool_a", "tool_b", "conv_id").agg(
        F.count("*").alias("c")
    )
    return per_conv.groupBy("tool_a", "tool_b").agg(
        F.sum("c").cast("long").alias("n_pairs"),
        F.count("*").cast("long").alias("n_convs"),
    )


def _tool_bigrams_oracle() -> str:
    from ocr_lib_spark.sources.synth import duckdb_transcripts_cte

    return f"""
WITH tr AS ({duckdb_transcripts_cte()}),
tc AS (
  SELECT conv_id, turn_idx, {_KIND_SQL} AS tool_kind
  FROM tr WHERE tool <> ''),
p AS (
  SELECT conv_id,
         COALESCE(LAG(tool_kind) OVER (PARTITION BY conv_id ORDER BY turn_idx),
                  'START') AS tool_a,
         tool_kind AS tool_b
  FROM tc),
pc AS (
  SELECT tool_a, tool_b, conv_id, COUNT(*) AS c
  FROM p GROUP BY tool_a, tool_b, conv_id)
SELECT tool_a, tool_b, SUM(c)::BIGINT AS n_pairs, COUNT(*)::BIGINT AS n_convs
FROM pc GROUP BY tool_a, tool_b
"""


def _q_tool_output_stats(spark, sf_dir) -> DataFrame:
    """Tool-output census per tool kind: call counts, extracted-output
    size stats, and distinct-output cardinality — the table that tells
    a pipeline owner which tools return boilerplate worth deduping
    (the turn_response_dedup signal, aggregated to the tool level).

    Composes the REAL extraction pipeline: tool-call turns are filtered
    FIRST (the kernel runs on the 1-10% tool subset only), extraction
    unwraps the tool-call JSON wrapper (case-3 payload), and distinct
    outputs are counted as a two-stage digest groupBy — never
    COUNT(DISTINCT text) over a hot tool key."""
    from ocr_lib_spark.pipeline import extract_turns

    tr = transcripts_from_documents(spark, sf_dir)
    tc = tr.where(F.col("tool") != "")
    ex = extract_turns(tc).select(
        F.expr(_KIND_SQL).alias("tool_kind"),
        F.length("extracted_text").cast("long").alias("nc"),
        F.md5(F.col("extracted_text")).alias("digest"),
    )
    per_digest = ex.groupBy("tool_kind", "digest").agg(
        F.count("*").alias("c"),
        F.max("nc").alias("nc_max"),
        F.max((F.col("nc") == 0).cast("int")).alias("empty"),
    )
    return per_digest.groupBy("tool_kind").agg(
        F.sum("c").cast("long").alias("n_calls"),
        F.count("*").cast("long").alias("n_distinct_outputs"),
        F.sum(F.col("c") * F.col("empty")).cast("long").alias("n_empty"),
        F.sum(F.col("c") * F.col("nc_max")).cast("long").alias("sum_chars"),
        F.max("nc_max").cast("long").alias("max_chars"),
    )


def _tool_output_stats_oracle() -> str:
    # Closed-form extraction twin: tool <> '' is exactly case 3, whose
    # extracted text is the inner document text (synth.py case rule).
    return f"""
WITH tc AS (
  SELECT {_TURN} AS turn_idx, text AS extracted_text
  FROM documents WHERE {_CASE} = 3),
ex AS (
  SELECT {_KIND_SQL} AS tool_kind,
         length(extracted_text)::BIGINT AS nc,
         md5(extracted_text) AS digest
  FROM tc),
pd AS (
  SELECT tool_kind, digest, COUNT(*) AS c, MAX(nc) AS nc_max,
         MAX((nc = 0)::INT) AS empty
  FROM ex GROUP BY tool_kind, digest)
SELECT tool_kind, SUM(c)::BIGINT AS n_calls,
       COUNT(*)::BIGINT AS n_distinct_outputs,
       SUM(c * empty)::BIGINT AS n_empty,
       SUM(c * nc_max)::BIGINT AS sum_chars,
       MAX(nc_max)::BIGINT AS max_chars
FROM pd GROUP BY tool_kind
"""


def ctx_truncate(extracted: DataFrame, budget: int = CTX_BUDGET) -> DataFrame:
    """Context-window fit: per conversation, keep the LONGEST SUFFIX of
    turns whose total BPE-ish token count fits ``budget`` — the
    drop-oldest-turns truncation an SFT dataloader applies before
    packing. Emits one row per conversation: suffix start, kept turn
    count, kept token total (first_kept_turn = -1 when even the final
    turn overflows the budget).

    Scale shape: one bounded-key window (reverse running sum per
    conv_id — partition rows = that conversation's turns, the same
    bound as the assembler) and one combinable groupBy; nothing global.
    The suffix property is exact: the reverse cumulative sum is
    monotone non-decreasing walking backwards, so `rcum <= budget`
    selects a contiguous suffix."""
    from ocr_lib_spark.functions.text import bpe_token_count

    t = extracted.select(
        "conv_id",
        "turn_idx",
        bpe_token_count("extracted_text").cast("long").alias("ntok"),
    )
    w = (
        Window.partitionBy("conv_id")
        .orderBy(F.desc("turn_idx"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    kept = (
        t.withColumn("rcum", F.sum("ntok").over(w))
        .where(F.col("rcum") <= budget)
        .groupBy("conv_id")
        .agg(
            F.min("turn_idx").cast("int").alias("first_kept_turn"),
            F.count("*").cast("long").alias("n_kept"),
            F.max("rcum").cast("long").alias("kept_tokens"),
        )
    )
    base = t.groupBy("conv_id").agg(
        F.count("*").cast("long").alias("n_turns"),
        F.sum("ntok").cast("long").alias("total_tokens"),
    )
    return base.join(kept, "conv_id", "left").select(
        "conv_id",
        "n_turns",
        "total_tokens",
        F.coalesce("first_kept_turn", F.lit(-1)).cast("int").alias("first_kept_turn"),
        F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
        F.coalesce("kept_tokens", F.lit(0)).cast("long").alias("kept_tokens"),
    )


def _q_ctx_truncate(spark, sf_dir) -> DataFrame:
    from ocr_lib_spark.pipeline import extract_turns

    tr = transcripts_from_documents(spark, sf_dir)
    return ctx_truncate(extract_turns(tr))


def _ctx_truncate_oracle() -> str:
    from ocr_lib_spark.functions.text import BPE_ISH_PATTERN

    bpe_sql = BPE_ISH_PATTERN.replace("'", "''")
    return f"""
WITH per_turn AS (
  SELECT {_CONV} AS conv_id, {_TURN} AS turn_idx,
         CASE {_CASE}
           WHEN 2 THEN text || chr(10) || text
           WHEN 5 THEN '' WHEN 6 THEN ''
           ELSE text END AS extracted_text
  FROM documents),
t AS (
  SELECT conv_id, turn_idx,
         len(regexp_extract_all(extracted_text, '{bpe_sql}'))::BIGINT AS ntok
  FROM per_turn),
r AS (
  SELECT conv_id, turn_idx, ntok,
         SUM(ntok) OVER (PARTITION BY conv_id ORDER BY turn_idx DESC
                         ROWS UNBOUNDED PRECEDING) AS rcum
  FROM t),
kept AS (
  SELECT conv_id, MIN(turn_idx)::INT AS first_kept_turn,
         COUNT(*)::BIGINT AS n_kept, MAX(rcum)::BIGINT AS kept_tokens
  FROM r WHERE rcum <= {CTX_BUDGET} GROUP BY conv_id),
base AS (
  SELECT conv_id, COUNT(*)::BIGINT AS n_turns, SUM(ntok)::BIGINT AS total_tokens
  FROM t GROUP BY conv_id)
SELECT base.conv_id, n_turns, total_tokens,
       COALESCE(first_kept_turn, -1)::INT AS first_kept_turn,
       COALESCE(n_kept, 0)::BIGINT AS n_kept,
       COALESCE(kept_tokens, 0)::BIGINT AS kept_tokens
FROM base LEFT JOIN kept ON base.conv_id = kept.conv_id
"""


def _q_link_census(spark, sf_dir) -> DataFrame:
    """Corpus link census over RAW transcript payloads: every href
    target's occurrence count, containing-turn count, and share of all
    turns in basis points — the corpus-wide aggregation of the
    link-density signal the extraction classifier uses per block
    (features.py link_density; check-matching-fn core.clj:1020-1069
    generalization). A target appearing in a large share of turns IS
    boilerplate (nav/footer chrome); this table is where a pipeline
    owner reads that threshold off real data.

    Scale shape: regexp_extract_all + explode (pure codegen, no UDF),
    then the two-stage distinct discipline — (href, conv, turn)
    pre-aggregate before the href rollup, never COUNT(DISTINCT) over a
    hot boilerplate key; the total-turn census broadcasts as one row."""
    tr = transcripts_from_documents(spark, sf_dir)
    links = tr.select(
        "conv_id",
        "turn_idx",
        F.explode(F.expr(r"""regexp_extract_all(text, 'href="([^"]*)"', 1)""")).alias(
            "href"
        ),
    )
    per_turn = links.groupBy("href", "conv_id", "turn_idx").agg(
        F.count("*").alias("c")
    )
    tot = tr.agg(F.count("*").cast("long").alias("total_turns"))
    return (
        per_turn.groupBy("href")
        .agg(
            F.sum("c").cast("long").alias("n_occurrences"),
            F.count("*").cast("long").alias("n_turns"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "href",
            "n_occurrences",
            "n_turns",
            F.expr("(10000 * n_turns) DIV total_turns").cast("long").alias("turn_share_bp"),
        )
    )


def _link_census_oracle() -> str:
    from ocr_lib_spark.sources.synth import duckdb_transcripts_cte

    return f"""
WITH tr AS ({duckdb_transcripts_cte()}),
links AS (
  SELECT conv_id, turn_idx,
         unnest(regexp_extract_all(text, 'href="([^"]*)"', 1)) AS href
  FROM tr),
pt AS (
  SELECT href, conv_id, turn_idx, COUNT(*) AS c
  FROM links GROUP BY href, conv_id, turn_idx),
tot AS (SELECT COUNT(*)::BIGINT AS total_turns FROM tr)
SELECT href, SUM(c)::BIGINT AS n_occurrences, COUNT(*)::BIGINT AS n_turns,
       ((10000 * COUNT(*)) // total_turns)::BIGINT AS turn_share_bp
FROM pt, tot GROUP BY href, total_turns
"""


def _q_json_tool_parse(spark, sf_dir) -> DataFrame:
    """Semi-structured parsing of tool-call wrapper payloads with the
    engines' REAL JSON paths (Spark get_json_object / DuckDB
    json_extract_string) instead of the extraction kernel's scanner —
    the census that validates the two agree, and the API surface a
    pipeline uses when the wrapper schema is known. Per extracted tool
    name: turn count, output-size total, and the count of wrapper-like
    payloads ('{'-prefixed) that fail the WRAPPER_GRAMMAR contract or
    lack a tool_call key (bucketed '__invalid__' — malformed wrappers
    are a real corpus hazard, 0 in the driver fixture by construction).
    Validity is the shared grammar, NOT each engine's native JSON
    acceptance: ADVICE r7 showed those disagree on exactly the
    malformed class this census counts (see the WRAPPER_GRAMMAR note);
    the JSON paths run only on grammar-valid rows, where the engines
    agree byte-for-byte.

    Scale shape: one codegen map (grammar + JSON path on the
    '{'-prefix subset — the predicate reaches the scan) + one
    combinable groupBy."""
    tr = transcripts_from_documents(spark, sf_dir)
    ok = F.col("text").rlike(WRAPPER_GRAMMAR)
    j = tr.where(F.col("text").startswith("{")).select(
        F.when(ok, F.get_json_object("text", "$.tool_call")).alias("tool_name"),
        F.when(ok, F.length(F.get_json_object("text", "$.output")))
        .cast("long")
        .alias("out_len"),
    )
    return j.groupBy(F.coalesce("tool_name", F.lit("__invalid__")).alias("tool_name")).agg(
        F.count("*").cast("long").alias("n_turns"),
        F.coalesce(F.sum("out_len"), F.lit(0)).cast("long").alias("sum_output_chars"),
    )


def _json_tool_parse_oracle() -> str:
    # the grammar contains no single quotes (safe to embed verbatim);
    # regexp_matches runs RE2 on the IDENTICAL pattern Spark's rlike
    # runs under Java regex — the shared-contract subset (no backrefs,
    # no lookaround, \A/\z anchors) behaves the same in both.
    from ocr_lib_spark.sources.synth import duckdb_transcripts_cte

    g = WRAPPER_GRAMMAR
    return f"""
WITH tr AS ({duckdb_transcripts_cte()}),
j AS (
  SELECT CASE WHEN regexp_matches(text, '{g}')
              THEN json_extract_string(text, '$.tool_call') END AS tool_name,
         CASE WHEN regexp_matches(text, '{g}')
              THEN length(json_extract_string(text, '$.output')) END::BIGINT AS out_len
  FROM tr WHERE text LIKE '{{%')
SELECT COALESCE(tool_name, '__invalid__') AS tool_name,
       COUNT(*)::BIGINT AS n_turns,
       COALESCE(SUM(out_len), 0)::BIGINT AS sum_output_chars
FROM j GROUP BY 1
"""


def _q_role_token_share(spark, sf_dir) -> DataFrame:
    """Per-conversation ROLE token mix in basis points (user vs
    assistant vs tool share of extracted tokens) — the SFT diagnostic
    that catches assistant-heavy synthetic data and tool-dump
    conversations before they skew a loss mask. One bounded groupBy per
    conversation; integer shares by floor DIV (shares sum to <= 10000,
    remainder on the largest bucket is NOT redistributed — pinned)."""
    from ocr_lib_spark.functions.text import bpe_token_count
    from ocr_lib_spark.pipeline import extract_turns

    tr = transcripts_from_documents(spark, sf_dir)
    t = extract_turns(tr).select(
        "conv_id",
        "role",
        bpe_token_count("extracted_text").cast("long").alias("ntok"),
    )
    g = t.groupBy("conv_id").agg(
        F.sum("ntok").cast("long").alias("total_tokens"),
        F.sum(F.when(F.col("role") == "user", F.col("ntok")).otherwise(0))
        .cast("long")
        .alias("user_tokens"),
        F.sum(F.when(F.col("role") == "assistant", F.col("ntok")).otherwise(0))
        .cast("long")
        .alias("assistant_tokens"),
        F.sum(F.when(F.col("role") == "tool", F.col("ntok")).otherwise(0))
        .cast("long")
        .alias("tool_tokens"),
    )
    bp = lambda c: F.expr(  # noqa: E731
        f"CASE WHEN total_tokens = 0 THEN 0 ELSE (10000 * {c}) DIV total_tokens END"
    ).cast("long")
    return g.select(
        "conv_id",
        "total_tokens",
        "user_tokens",
        "assistant_tokens",
        "tool_tokens",
        bp("user_tokens").alias("user_bp"),
        bp("assistant_tokens").alias("assistant_bp"),
        bp("tool_tokens").alias("tool_bp"),
    )


def _role_token_share_oracle() -> str:
    from ocr_lib_spark.functions.text import BPE_ISH_PATTERN

    bpe_sql = BPE_ISH_PATTERN.replace("'", "''")
    return f"""
WITH per_turn AS (
  SELECT {_CONV} AS conv_id,
         CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'user' WHEN 1 THEN 'assistant'
              ELSE 'tool' END AS role,
         CASE {_CASE}
           WHEN 2 THEN text || chr(10) || text
           WHEN 5 THEN '' WHEN 6 THEN ''
           ELSE text END AS extracted_text
  FROM documents),
t AS (
  SELECT conv_id, role,
         len(regexp_extract_all(extracted_text, '{bpe_sql}'))::BIGINT AS ntok
  FROM per_turn),
g AS (
  SELECT conv_id, SUM(ntok)::BIGINT AS total_tokens,
         SUM(CASE WHEN role = 'user' THEN ntok ELSE 0 END)::BIGINT AS user_tokens,
         SUM(CASE WHEN role = 'assistant' THEN ntok ELSE 0 END)::BIGINT AS assistant_tokens,
         SUM(CASE WHEN role = 'tool' THEN ntok ELSE 0 END)::BIGINT AS tool_tokens
  FROM t GROUP BY conv_id)
SELECT conv_id, total_tokens, user_tokens, assistant_tokens, tool_tokens,
       (CASE WHEN total_tokens = 0 THEN 0 ELSE (10000 * user_tokens) // total_tokens END)::BIGINT AS user_bp,
       (CASE WHEN total_tokens = 0 THEN 0 ELSE (10000 * assistant_tokens) // total_tokens END)::BIGINT AS assistant_bp,
       (CASE WHEN total_tokens = 0 THEN 0 ELSE (10000 * tool_tokens) // total_tokens END)::BIGINT AS tool_bp
FROM g
"""


QUERIES = {
    "tool_call_bigrams": QueryDef(
        _q_tool_call_bigrams,
        _tool_bigrams_oracle(),
        "agent tool-flow transition census: consecutive tool-call pairs per conversation",
    ),
    "tool_output_stats": QueryDef(
        _q_tool_output_stats,
        _tool_output_stats_oracle(),
        "tool-output census per tool kind over REAL extraction (size, emptiness, distinct outputs)",
    ),
    "ctx_truncate": QueryDef(
        _q_ctx_truncate,
        _ctx_truncate_oracle(),
        "context-window truncation: longest turn suffix fitting the token budget, per conversation",
    ),
    "link_census": QueryDef(
        _q_link_census,
        _link_census_oracle(),
        "corpus href census over raw payloads: occurrence/turn counts + boilerplate share (bp)",
    ),
    "json_tool_parse": QueryDef(
        _q_json_tool_parse,
        _json_tool_parse_oracle(),
        "JSON-path parsing of tool-call wrappers (get_json_object twin), malformed-wrapper census",
    ),
    "role_token_share": QueryDef(
        _q_role_token_share,
        _role_token_share_oracle(),
        "per-conversation role token mix in basis points (SFT loss-mask diagnostic)",
    ),
}
