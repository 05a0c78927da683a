"""Independent reference extractor — the test-side golden oracle.

Deliberately written as simple row-at-a-time Python (the readable,
slow, obviously-correct twin of the engine's batched numpy path), the
analog of the reference's pinned golden outputs
(core_test.clj:3225-3228). It shares NO code with
ocr_lib_spark.operators.* — semantics are re-derived from the pinned
contract in SURVEY.md §7 / FIXTURES.md §3:

  * decode: tool-call wrapper unwraps "output"; data: base64 URI decodes
    to a single kept 'blob' block spanning the base64 region.
  * segmentation: block-level tags (nav/header/footer/aside/p/div/ul/ol/
    table/pre/code/section/article/h1-6) and nonblank bare-text runs.
  * classification: 6 bounded features, nearest prototype by
    100*(1-mean L1), strictly-greater-wins / first-on-tie, keep when
    score > threshold and label is a keep label.
  * assembly: whitespace-normalized visible text, blocks merged when the
    raw gap <= attach_gap, joined by '\n'; spans index the original
    payload's visible-content region.
"""

from __future__ import annotations

import base64
import re
import string

BLOCK_TAGS = (
    "nav", "header", "footer", "aside", "p", "div", "ul", "ol", "table",
    "pre", "code", "section", "article", "h1", "h2", "h3", "h4", "h5", "h6",
)
_OPEN = re.compile(r"<(%s)(\s[^>]*)?>" % "|".join(BLOCK_TAGS), re.I | re.S)
_ANY_TAG = re.compile(r"<[^>]+>")
_A_REGION = re.compile(r"<a\s[^>]*>.*?</a\s*>", re.I | re.S)
_PUNCT = set(string.punctuation)


def _norm(s: str) -> str:
    return " ".join(s.split())


def _vis(raw: str) -> str:
    return _norm(_ANY_TAG.sub(" ", raw))


def _features(raw: str):
    n = len(raw)
    a_chars = sum(len(m.group(0)) for m in _A_REGION.finditer(raw))
    t_chars = sum(len(m.group(0)) for m in _ANY_TAG.finditer(raw))
    vis = _vis(raw)
    nv = max(1, len(vis))
    toks = vis.split()
    mtl = sum(map(len, toks)) / len(toks) if toks else 0.0
    return [
        a_chars / n,
        t_chars / n,
        len(vis) / n,
        sum(1 for c in vis if c in _PUNCT) / nv,
        sum(1 for c in vis if c.isdigit()) / nv,
        min(mtl / 10.0, 1.0),
    ]


def _prototypes():
    # independently taught from the same canonical examples (the taught
    # alphabet is *data*, shared by contract — FIXTURES.md §2)
    from ocr_lib_spark.operators.prototypes import _TAUGHT

    protos = []
    for label, keep, examples in _TAUGHT:
        fs = [_features(e) for e in examples]
        protos.append(
            (label, keep, [sum(col) / len(col) for col in zip(*fs)])
        )
    return protos


def _segment(payload: str):
    """-> list of (start, end, inner_start, inner_end, raw)."""
    out = []
    pos = 0
    while pos < len(payload):
        m = _OPEN.search(payload, pos)
        if not m:
            tail = payload[pos:]
            if tail.strip():
                out.append((pos, len(payload), pos, len(payload), tail))
            break
        if m.start() > pos and payload[pos : m.start()].strip():
            out.append((pos, m.start(), pos, m.start(), payload[pos : m.start()]))
        close = re.compile(r"</%s\s*>" % m.group(1), re.I)
        cm = close.search(payload, m.end())
        if cm:
            out.append((m.start(), cm.end(), m.end(), cm.start(), payload[m.start() : cm.end()]))
            pos = cm.end()
        else:  # unterminated block: treat rest as the block
            out.append((m.start(), len(payload), m.end(), len(payload), payload[m.start() :]))
            break
    return out


def extract_one(
    payload,
    match_threshold: float = 70.0,
    attach_gap: int = 8,
    min_block_chars: int = 3,
    keep_labels=("content", "code", "blob", "tool_output"),
    unknown_placeholder=None,
    unknown_export_limit=1,
):
    """-> (extracted_text, spans [(start, end, label)], n_blocks, unknown_blocks)."""
    if not isinstance(payload, str) or not payload.strip():
        return "", [], 0, []

    # decode: tool wrapper
    if re.match(r'^\s*\{\s*"tool_call"', payload):
        m = re.search(r'"output"\s*:\s*"', payload)
        if m:
            e = payload.find('"', m.end())
            e = e if e >= 0 else len(payload)
            inner = payload[m.end() : e]
            if not inner.strip():
                return "", [], 0, []
            segs = [(s + m.end(), t + m.end(), a + m.end(), b + m.end(), r)
                    for (s, t, a, b, r) in _segment(inner)]
        else:
            segs = _segment(payload)
        blob = None
    else:
        dm = re.match(r"^data:[A-Za-z0-9.+/-]+;base64,", payload)
        blob = None
        if dm:
            try:
                decoded = base64.b64decode(payload[dm.end():], validate=True).decode("utf-8", "replace")
                blob = (dm.end(), len(payload), _norm(decoded))
            except Exception:
                blob = None
        if blob is not None:
            return blob[2], [(blob[0], blob[1], "blob")], 1, []
        segs = _segment(payload)

    protos = _prototypes()
    kept = []
    unknowns = []
    for (s, t, a, b, raw) in segs:
        vis = _vis(raw)
        if len(vis) < min_block_chars:
            continue
        f = _features(raw)
        best_label, best_keep, best_score = None, False, -1.0
        for label, keepf, p in protos:
            score = 100.0 * (1.0 - sum(abs(x - y) for x, y in zip(f, p)) / len(p))
            if score > best_score:  # strictly greater: first wins ties
                best_label, best_keep, best_score = label, keepf, score
        if best_score <= match_threshold:
            if len(unknowns) < unknown_export_limit:
                unknowns.append(raw)
            if unknown_placeholder is not None:
                kept.append((s, t, a, b, "unknown", unknown_placeholder))
            continue
        if best_label in keep_labels and vis:
            kept.append((s, t, a, b, best_label, vis))

    merged = []
    for item in kept:
        if merged and item[0] - merged[-1][1] <= attach_gap:
            prev = merged[-1]
            merged[-1] = (prev[0], item[1], prev[2], item[3], prev[4], prev[5] + " " + item[5])
        else:
            merged.append(item)

    text = "\n".join(m[5] for m in merged)
    spans = [(m[2], m[3], m[4]) for m in merged]
    return text, spans, len(segs), unknowns


def extract_frame(pdf):
    """Row-at-a-time oracle over a transcripts pandas frame -> golden frame."""
    import pandas as pd

    recs = []
    for _, r in pdf.iterrows():
        text, spans, nb, unk = extract_one(r["text"])
        recs.append((r["conv_id"], r["turn_idx"], text, spans, nb, unk))
    return pd.DataFrame(
        recs,
        columns=[
            "conv_id", "turn_idx", "extracted_text", "spans", "n_blocks",
            "unknown_blocks",
        ],
    )
