"""Deterministic synthetic transcript sources.

The reference tests against two tiny committed fixtures plus a taught
prototype alphabet (SURVEY.md §5; core_test.clj:272, 3147). Our analog:
transcripts synthesized deterministically, with NO external data, in two
flavors:

1. ``transcripts_from_documents`` — a pure-SQL derivation from the
   driver's ``documents`` parquet table. Each document becomes one turn
   whose raw payload wraps the document text according to a
   ``doc_id % 7`` case rule. Because the construction is closed-form
   SQL, a DuckDB oracle can predict the *exact* extraction output
   (text, spans, block counts) that the engine must reproduce from the
   payload alone — the analog of the pinned golden
   ``"* **** i ********\\n"`` (core_test.clj:3225-3228).

2. ``generate_transcripts`` — a seeded numpy generator producing a
   skewed (Zipf-ish) conversation-length distribution for scale/bench
   runs and for pytest fixtures exercising degenerate payloads.

Case rule (case = doc_id % 7):
  0 plain prose                    -> extract: text,      1 block
  1 NAV <p>text</p> FOOTER         -> extract: text,      3 blocks
  2 NAV <p>t</p> LINKFARM <p>t</p> FOOTER
                                   -> extract: t\\nt,      5 blocks
  3 {"tool_call":..,"output":"text"} -> extract: text,    1 block
  4 data:application/pdf;base64,b64(text) -> decoded text, 1 block
  5 NAV FOOTER (pure boilerplate)  -> extract: "",        2 blocks
  6 "" (empty payload)             -> extract: "",        0 blocks
"""

from __future__ import annotations

import base64

import numpy as np
import pandas as pd

# --- boilerplate building blocks (ASCII only; no quotes/braces in visible
# --- text so the tool-wrapper case needs no escaping) -----------------------

NAV = (
    '<nav><a href="/home">Home</a> <a href="/about">About</a> '
    '<a href="/contact">Contact</a> <a href="/login">Login</a></nav>'
)
FOOTER = (
    '<footer><a href="/terms">Terms</a> <a href="/privacy">Privacy</a> '
    '<a href="/careers">Careers</a> copyright 2024 Example Corp</footer>'
)
LINKFARM = (
    '<div class="links"><a href="/page1">page1</a> <a href="/page2">page2</a> '
    '<a href="/page3">page3</a> <a href="/page4">page4</a> '
    '<a href="/page5">page5</a> <a href="/page6">page6</a></div>'
)
TOOL_PRE = '{"tool_call": "search", "output": "'
TOOL_POST = '"}'
B64_PRE = "data:application/pdf;base64,"

#: conversations the document-derived corpus is folded into
N_CONVS = 100
N_CASES = 7

ROLES = ("user", "assistant", "tool")


def build_payload(text: str, case: int) -> str:
    """Python twin of the SQL construction below (used by tests/generator)."""
    if case == 0:
        return text
    if case == 1:
        return f"{NAV}<p>{text}</p>{FOOTER}"
    if case == 2:
        return f"{NAV}<p>{text}</p>{LINKFARM}<p>{text}</p>{FOOTER}"
    if case == 3:
        return f"{TOOL_PRE}{text}{TOOL_POST}"
    if case == 4:
        return B64_PRE + base64.b64encode(text.encode()).decode()
    if case == 5:
        return NAV + FOOTER
    return ""


def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def transcripts_select_sql(documents_rel: str = "documents") -> str:
    """ANSI SQL (valid in both Spark SQL and DuckDB) deriving the
    transcripts table (conv_id, turn_idx, role, text, tool, ts) from
    ``documents``. ``base64`` of the text payload is produced by each
    engine's builtin (both emit standard RFC 4648 without line breaks).
    """
    nav, foot, lf = _sql_quote(NAV), _sql_quote(FOOTER), _sql_quote(LINKFARM)
    tp, ts_ = _sql_quote(TOOL_PRE), _sql_quote(TOOL_POST)
    b64p = _sql_quote(B64_PRE)
    # Spark: base64(cast(text as binary)); DuckDB: to_base64(text::blob).
    # Caller substitutes {B64} with the engine-specific expression.
    # {TS} likewise: both engines wrap/overflow an INT32 in
    # `CAST(doc_id AS INT) * INTERVAL` past 2^31 docs (the ADVICE-r05
    # hazard class), so each side uses its exact-BIGINT form.
    return f"""
SELECT
  printf('conv-%08d', doc_id % {N_CONVS}) AS conv_id,
  CAST(FLOOR(doc_id / {N_CONVS}) AS INT) AS turn_idx,
  CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'user' WHEN 1 THEN 'assistant' ELSE 'tool' END AS role,
  CASE CAST(doc_id % {N_CASES} AS INT)
    WHEN 0 THEN text
    WHEN 1 THEN {nav} || '<p>' || text || '</p>' || {foot}
    WHEN 2 THEN {nav} || '<p>' || text || '</p>' || {lf} || '<p>' || text || '</p>' || {foot}
    WHEN 3 THEN {tp} || text || {ts_}
    WHEN 4 THEN {b64p} || {{B64}}
    WHEN 5 THEN {nav} || {foot}
    ELSE ''
  END AS text,
  CASE WHEN CAST(doc_id % {N_CASES} AS INT) = 3 THEN 'search' ELSE '' END AS tool,
  {{TS}} AS ts
FROM {documents_rel}
"""


def transcripts_from_documents(spark, sf_dir: str):
    """Derive the transcript corpus from the driver's documents table —
    pure Catalyst SQL, no UDF: the scan stays pushdown/prune-friendly."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs.createOrReplaceTempView("__synth_documents")
    # Spark's base64() may emit MIME-chunked output (\r\n every 76 chars
    # depending on spark.sql.legacy.chunkBase64String.enabled); strip the
    # line breaks so the payload matches RFC-4648-without-breaks (DuckDB's
    # to_base64) and the span arithmetic stays closed-form.
    sql = (
        transcripts_select_sql("__synth_documents")
        .replace(
            "{B64}",
            r"regexp_replace(base64(cast(text AS BINARY)), '[\\r\\n]', '')",
        )
        # BIGINT * day-time interval is exact in Spark (no INT32 wrap)
        .replace(
            "{TS}",
            "TIMESTAMP '2024-01-01 00:00:00' + doc_id * INTERVAL '1' SECOND",
        )
    )
    return spark.sql(sql)


def duckdb_transcripts_cte() -> str:
    """The same derivation as a DuckDB CTE body over the pre-registered
    ``documents`` view (driver oracle side)."""
    return (
        transcripts_select_sql("documents")
        .replace("{B64}", "to_base64(text::BLOB)")
        # to_seconds takes BIGINT (DuckDB's n * INTERVAL casts via INT32)
        .replace(
            "{TS}",
            "TIMESTAMP '2024-01-01 00:00:00' + to_seconds(doc_id)",
        )
    )


# --- standalone seeded generator (bench / pytest scale fixtures) ------------

_WORDS = (
    "key agg row scan slow fast table value part hash join order data column "
    "window spark batch line customer query small filter merge sort group index "
    "page cache block shard stripe token vector metric plan stage"
).split()


def generate_transcripts(
    n_convs: int = 100,
    seed: int = 42,
    zipf_a: float = 1.6,
    max_turns: int = 400,
) -> pd.DataFrame:
    """Seeded transcript corpus with a Zipf-ish conversation-length
    distribution (a few very long conversations) to exercise
    conv_id-salted repartitioning — the skew the north_rule targets.

    Payload mix cycles through the same 7 cases as the document-derived
    corpus plus two extra degenerates: whitespace-only and
    markup-with-empty-paragraph.
    """
    rng = np.random.default_rng(seed)
    lens = np.minimum(rng.zipf(zipf_a, size=n_convs) * 3, max_turns)
    rows = []
    base_ts = pd.Timestamp("2024-01-01 00:00:00")
    for c in range(n_convs):
        conv_id = f"conv-{c:08d}"
        for t in range(int(lens[c])):
            nw = int(rng.integers(8, 60))
            prose = " ".join(rng.choice(_WORDS, size=nw))
            case = int(rng.integers(0, 9))
            if case < 7:
                payload = build_payload(prose, case)
            elif case == 7:
                payload = "   \t  "
            else:
                payload = f"{NAV}<p>   </p>{FOOTER}"
            rows.append(
                (
                    conv_id,
                    t,
                    ROLES[t % 3],
                    payload,
                    "search" if case == 3 else "",
                    base_ts + pd.Timedelta(seconds=c * 1000 + t),
                )
            )
    return pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )


def transcripts_spark_schema():
    from pyspark.sql import types as T

    return T.StructType(
        [
            T.StructField("conv_id", T.StringType(), False),
            T.StructField("turn_idx", T.IntegerType(), False),
            T.StructField("role", T.StringType(), True),
            T.StructField("text", T.StringType(), True),
            T.StructField("tool", T.StringType(), True),
            T.StructField("ts", T.TimestampType(), True),
        ]
    )


def generated_transcripts_df(spark, n_convs: int = 100, seed: int = 42, **kw):
    pdf = generate_transcripts(n_convs=n_convs, seed=seed, **kw)
    pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
    return spark.createDataFrame(pdf, schema=transcripts_spark_schema())
