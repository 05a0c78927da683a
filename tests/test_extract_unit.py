"""Per-operator unit tests in the reference's nil-propagation spirit
(SURVEY.md §5: every fn gets degenerate inputs first, then real ones —
e.g. contrast-fn core_test.clj:300-394)."""

import base64

import numpy as np
import pandas as pd
import pytest

from ocr_lib_spark.config import ExtractionConfig
from ocr_lib_spark.operators.extract import extract_batch
from ocr_lib_spark.operators.features import block_features, classify, match_scores
from ocr_lib_spark.operators.prototypes import taught_prototypes
from ocr_lib_spark.operators.tokenizer import segment_payload
from ocr_lib_spark.sources.synth import (
    B64_PRE,
    FOOTER,
    LINKFARM,
    NAV,
    TOOL_PRE,
    TOOL_POST,
    build_payload,
)

PROSE = "key agg row scan slow fast table value part hash join order data column"


def run_one(payload, cfg=ExtractionConfig()):
    out = extract_batch(pd.Series([payload]), cfg)
    return out.extracted_text[0], out.spans[0], int(out.n_blocks[0])


def test_unknown_block_export_capped():
    cfg = ExtractionConfig(match_threshold=100.0, unknown_export_limit=1)
    p = f"<p>{PROSE}</p>{LINKFARM}<p>{PROSE} extra words here</p>"
    out = extract_batch(pd.Series([p]), cfg)
    assert out.unknown_blocks[0] == [f"<p>{PROSE}</p>"]  # capped at 1, first wins

    cfg2 = ExtractionConfig(match_threshold=100.0, unknown_export_limit=10)
    out2 = extract_batch(pd.Series([p]), cfg2)
    assert len(out2.unknown_blocks[0]) == 3  # both paragraphs + link farm


# --- degenerate inputs (nil-guard analog, core.clj:210-239) ------------------

@pytest.mark.parametrize("payload", [None, "", "   ", " \t\n ", 42, 3.14])
def test_degenerate_payloads_yield_empty_not_null(payload):
    text, spans, nb = run_one(payload)
    assert text == ""
    assert spans == []
    assert nb == 0


def test_whitespace_only_paragraph_is_counted_but_not_kept():
    text, spans, nb = run_one(f"{NAV}<p>   </p>{FOOTER}")
    assert text == "" and spans == [] and nb == 3


# --- tokenizer offsets (bbox provenance, core.clj:640-685) -------------------

def test_segment_offsets_index_original_payload():
    p = build_payload(PROSE, 1)
    blocks = segment_payload(p)
    assert len(blocks) == 3
    content = blocks[1]
    assert p[content.inner_start : content.inner_end] == PROSE


def test_tool_wrapper_offsets():
    p = TOOL_PRE + PROSE + TOOL_POST
    blocks = segment_payload(p)
    assert len(blocks) == 1
    b = blocks[0]
    assert p[b.inner_start : b.inner_end] == PROSE
    assert b.inner_start == len(TOOL_PRE)


def test_blob_decode_roundtrip():
    p = B64_PRE + base64.b64encode(PROSE.encode()).decode()
    blocks = segment_payload(p)
    assert len(blocks) == 1
    assert blocks[0].forced_label == "blob"
    assert blocks[0].decoded_text == PROSE
    assert blocks[0].inner_start == len(B64_PRE)
    assert blocks[0].inner_end == len(p)


def test_invalid_base64_falls_through_to_text():
    blocks = segment_payload("data:application/pdf;base64,!!!notb64!!!")
    assert blocks and blocks[0].forced_label is None


# --- classification (check-matching-fn semantics, core.clj:1020-1069) -------

def test_boilerplate_classified_and_dropped():
    for b in (NAV, FOOTER, LINKFARM):
        text, spans, nb = run_one(b)
        assert text == "" and spans == []


def test_content_scores_beat_threshold():
    protos, labels, keep = taught_prototypes()
    f = block_features(f"<p>{PROSE}</p>")
    best, score = classify(f[None, :], protos)
    assert labels[best[0]] == "content"
    assert score[0] > 70.0


def test_tie_break_first_prototype_wins():
    # two identical prototypes -> argmax must return the first
    protos = np.array([[0.5] * 6, [0.5] * 6])
    best, _ = classify(np.array([[0.5] * 6]), protos)
    assert best[0] == 0


def test_match_threshold_knob_unknown_placeholder():
    cfg = ExtractionConfig(match_threshold=100.0, unknown_placeholder="*")
    text, spans, nb = run_one(f"<p>{PROSE}</p>", cfg)
    assert text == "*"
    assert spans[0]["label"] == "unknown"

    cfg2 = ExtractionConfig(match_threshold=100.0, unknown_placeholder=None)
    text2, spans2, _ = run_one(f"<p>{PROSE}</p>", cfg2)
    assert text2 == "" and spans2 == []


# --- assembly: attach gap + noise floor + separators -------------------------

def test_adjacent_blocks_merge_within_attach_gap():
    text, spans, nb = run_one("<p>alpha beta gamma</p><p>delta epsilon zeta</p>")
    assert text == "alpha beta gamma delta epsilon zeta"
    assert len(spans) == 1 and nb == 2


def test_blocks_beyond_attach_gap_stay_separate():
    p = f"<p>alpha beta gamma</p>{LINKFARM}<p>delta epsilon zeta</p>"
    text, spans, nb = run_one(p)
    assert text == "alpha beta gamma\ndelta epsilon zeta"
    assert len(spans) == 2 and nb == 3


def test_noise_floor_drops_tiny_blocks():
    cfg = ExtractionConfig(min_block_chars=20)
    text, _, nb = run_one("<p>tiny</p>", cfg)
    assert text == "" and nb == 1
    text2, _, _ = run_one(f"<p>{PROSE}</p>", cfg)
    assert text2 == PROSE


def test_whitespace_normalization_inside_block():
    text, spans, _ = run_one("<p>a   b\t\tc\n\nd</p>")
    assert text == "a b c d"
    # span still covers the raw inner region
    assert spans[0]["start"] == 3


# --- full case battery (golden contract, core_test.clj:3225-3228 analog) ----

@pytest.mark.parametrize("case,expect_text,expect_nb", [
    (0, PROSE, 1),
    (1, PROSE, 3),
    (2, PROSE + "\n" + PROSE, 5),
    (3, PROSE, 1),
    (4, PROSE, 1),
    (5, "", 2),
    (6, "", 0),
])
def test_payload_case_battery(case, expect_text, expect_nb):
    text, spans, nb = run_one(build_payload(PROSE, case))
    assert text == expect_text
    assert nb == expect_nb


def test_scores_matrix_shape_and_bounds():
    protos, _, _ = taught_prototypes()
    feats = np.stack([block_features(NAV), block_features(PROSE)])
    s = match_scores(feats, protos)
    assert s.shape == (2, protos.shape[0])
    assert (s <= 100.0).all() and (s >= 0.0).all()


# --- citaj sliding-window analog: over-merged block splitting ---------------
# (core_helper.clj:324-361: segments <37 px classify directly, wider ones
#  get the window split; segments <8 px are skipped)

def _fused_payload():
    nav = " | ".join(f'<a href="/{w}">{w}</a>' for w in
                     ["home", "about", "login", "privacy", "terms", "careers"])
    content = ("The merge scan walks both sorted runs and unions overlapping "
               "spans into one component batch value row.")
    return f"<div>{nav}.\n{content}\n{nav}</div>", content


def test_split_merged_blocks_recovers_fused_content():
    payload, content = _fused_payload()
    # default (production read-image-fn path): no splitting — the fused
    # block classifies whole as link-heavy and is dropped
    text0, spans0, nb0 = run_one(payload)
    assert text0 == "" and nb0 == 1
    # with the citaj knob on: nav units dropped, content unit recovered
    text1, spans1, nb1 = run_one(payload, ExtractionConfig(split_max_chars=120))
    assert text1 == content
    assert nb1 == 3
    assert len(spans1) == 1
    s = spans1[0]
    assert payload[s["start"]:s["end"]] == content
    assert s["label"] == "content"


def test_split_units_below_min_chars_skipped():
    payload, content = _fused_payload()
    # huge min-unit floor: every unit is "sub-glyph" noise -> fall back
    # to the unsplit block (never lose the block entirely)
    text, spans, nb = run_one(
        payload, ExtractionConfig(split_max_chars=120, split_min_unit_chars=500)
    )
    assert nb == 1


def test_split_noop_when_block_under_threshold():
    # short blocks classify directly (reference: <37 px)
    text, spans, nb = run_one(PROSE, ExtractionConfig(split_max_chars=10_000))
    assert text == PROSE and nb == 1


def test_split_degenerate_inputs():
    cfg = ExtractionConfig(split_max_chars=50)
    out = extract_batch(pd.Series([None, "", "   "]), cfg)
    assert list(out.extracted_text) == ["", "", ""]
    assert list(out.n_blocks) == [0, 0, 0]


# --- adversarial-markup robustness: segmentation must stay LINEAR ------------
# (an executor processing 10^12 turns will see broken markup; quadratic
#  regex backtracking on one bad payload stalls a whole task)

@pytest.mark.parametrize("payload", [
    "<" * 100_000,
    "<div>" * 5_000,
    "<a href=x>" * 5_000,
    "<nav " * 20_000,
])
def test_adversarial_markup_linear_time(payload):
    import time

    t0 = time.monotonic()
    out = extract_batch(pd.Series([payload]))
    assert time.monotonic() - t0 < 2.0  # was 8s+ with backtracking scans
    assert out.extracted_text[0] is not None


def test_block_matches_equals_reference_regex_fuzz():
    """The linear scanner reproduces BLOCK_TAG_RE.finditer exactly on
    randomized markup soup (the lazy-regex semantics are the pinned
    contract; the scanner is the implementation)."""
    import random

    from ocr_lib_spark.operators.tokenizer import BLOCK_TAG_RE, _block_matches

    random.seed(1234)
    pieces = ["<p>", "</p>", "<div>", "</div>", "<DIV >", "</DIV >", "<nav>",
              "</nav>", "text ", "<a href=x>l</a>", "<p attr='v'>", "<", ">",
              "\n", "<h1>", "</h1>", "</p >", "word. ", "<pre>", "</pre>"]
    for _ in range(1500):
        s = "".join(random.choice(pieces) for _ in range(random.randint(0, 25)))
        ref = [(m.start(), m.end(), m.start(2), m.end(2))
               for m in BLOCK_TAG_RE.finditer(s)]
        assert ref == _block_matches(s), repr(s)


# --- shift-tolerant matcher variant (core_helper.clj:259-322) ---------------

def test_classify_shifted_tie_break_min_difference_then_first():
    """Pinned semantics: averaged score argmax; EXACT score ties broken
    by smallest averaged L-inf difference (the find-max min-difference
    rule, core_helper.clj:226-240); remaining ties keep the first
    prototype."""
    from ocr_lib_spark.operators.features import classify_shifted

    # uniform single-token block: every shift variant has the identical
    # feature vector [0, 0, 1, 0, 0, 1]
    raw = ["x" * 40]
    f = np.array([0.0, 0.0, 1.0, 0.0, 0.0, 1.0])
    p0 = f.copy(); p0[0] = 0.2              # L1 sum 0.2, L-inf 0.2
    p1 = f.copy(); p1[1] = 0.1; p1[3] = 0.1  # L1 sum 0.2, L-inf 0.1
    p2 = p0.copy()
    best, score = classify_shifted(raw, np.stack([p0, p1, p2]))
    assert best[0] == 1  # equal avg scores -> min L-inf difference wins
    best2, _ = classify_shifted(raw, np.stack([p0, p2]))
    assert best2[0] == 0  # fully tied -> first prototype retained

    # strictly greater score beats any difference ordering
    p3 = f.copy()  # exact match
    best3, score3 = classify_shifted(raw, np.stack([p0, p3]))
    assert best3[0] == 1 and score3[0] == pytest.approx(100.0)


def test_classify_shifted_translation_tolerance():
    """One char of junk on the block boundary barely moves the averaged
    score (the point of shift averaging), while the plain single-vector
    score moves more."""
    from ocr_lib_spark.operators.features import classify_shifted

    protos, labels, _ = taught_prototypes()
    clean = PROSE
    dirty = ">" + PROSE  # stray markup char glued to the block head
    b_clean, s_clean = classify_shifted([clean], protos)
    b_dirty, s_dirty = classify_shifted([dirty], protos)
    assert labels[b_clean[0]] == labels[b_dirty[0]] == "content"
    assert abs(s_clean[0] - s_dirty[0]) < 2.0


def test_shift_avg_classifier_is_config_selectable():
    """extract_batch runs the variant end-to-end and still extracts the
    content from a standard payload."""
    cfg = ExtractionConfig(classifier="shift_avg")
    out = extract_batch(pd.Series([build_payload(PROSE, 1)]), cfg)
    assert out.extracted_text[0] == PROSE


def test_prototype_stats_size_gate_envelope(spark):
    """Alphabet-stats sanity gate (core_helper.clj:13-23 analog, round
    6): the derived keep-class envelope is well-formed — lo < hi per
    feature, bounds inside the tol-padded [0,1] feature range, and the
    keep envelope is a sub-range of the full alphabet's min/max (the
    reference's size gate would otherwise reject every block)."""
    from ocr_lib_spark.operators.prototypes import (
        SIZE_GATE_TOL_PPM,
        N_FEATURES_EXPECTED,
        prototype_stats_df,
    )

    pdf = prototype_stats_df(spark).toPandas().sort_values("feat_idx")
    assert list(pdf.feat_idx) == list(range(N_FEATURES_EXPECTED))
    assert (pdf.n_protos == pdf.n_protos.iloc[0]).all()
    assert (pdf.gate_lo < pdf.gate_hi).all()
    assert (pdf.gate_lo >= -SIZE_GATE_TOL_PPM).all()
    assert (pdf.gate_hi <= 1_000_000 + SIZE_GATE_TOL_PPM).all()
    assert (pdf.min_f <= pdf.keep_min_f).all()
    assert (pdf.keep_max_f <= pdf.max_f).all()
    # the envelope separates at least one feature: the drop classes are
    # not wholly inside the keep gate (link_farm's link_density must
    # fall outside, or the size gate gates nothing)
    assert ((pdf.min_f < pdf.gate_lo) | (pdf.max_f > pdf.gate_hi)).any()
