"""Property-based tests (hypothesis) for the tokenizer/extractor span
contract — the invariant the whole engine leans on: every offset indexes
the ORIGINAL payload string (bbox-provenance analog, core.clj:640-685).
The reference suite has no property tests (SURVEY.md §5 'absent');
this extends its per-function unit style with randomized payloads."""

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from ocr_lib_spark.config import ExtractionConfig
from ocr_lib_spark.operators.extract import extract_batch
from ocr_lib_spark.operators.tokenizer import Block, segment_payload, split_block_units

_fragments = st.lists(
    st.one_of(
        st.text(alphabet="abcdefg .|!\n<>", max_size=30),
        st.sampled_from(
            [
                "<p>some plain prose goes here</p>",
                "<nav><a href='/x'>x</a> | <a href='/y'>y</a></nav>",
                "<div>alpha beta. gamma delta!</div>",
                '{"tool_call": {"name": "t"}, "output": "inner text"}',
                "data:text/plain;base64,aGVsbG8=",
                "<pre>code block()</pre>",
                "",
            ]
        ),
    ),
    max_size=6,
).map("".join)


def _check_block(b: Block, payload: str):
    assert 0 <= b.start <= b.inner_start <= b.inner_end <= b.end <= len(payload)
    assert payload[b.start : b.end] == b.raw


@settings(max_examples=200, deadline=None)
@given(_fragments)
def test_segment_offsets_always_index_payload(payload):
    blocks = segment_payload(payload)
    for b in blocks:
        _check_block(b, payload)
    # blocks are ordered and non-overlapping in raw space
    for a, b in zip(blocks, blocks[1:]):
        assert a.end <= b.start or a.forced_label == "blob"


@settings(max_examples=200, deadline=None)
@given(_fragments)
def test_split_units_preserve_offset_contract(payload):
    for b in segment_payload(payload):
        if b.forced_label is not None:
            continue
        for u in split_block_units(b, min_unit_chars=1):
            _check_block(u, payload)
            assert b.inner_start <= u.start and u.end <= b.inner_end


@settings(max_examples=100, deadline=None)
@given(st.lists(_fragments, min_size=1, max_size=8))
def test_extract_batch_total_and_null_free(payloads):
    cfg = ExtractionConfig(split_max_chars=60)
    out = extract_batch(pd.Series(payloads, dtype=object), cfg)
    assert len(out) == len(payloads)
    for text, spans, payload in zip(out.extracted_text, out.spans, payloads):
        assert text is not None  # empty-not-null contract
        for s in spans:
            assert 0 <= s["start"] <= s["end"] <= len(payload)
