"""Property-based tests (hypothesis) for the round-2 kernels: the
vectorized hash paths must equal their definitional pure-Python folds on
arbitrary Unicode, and the header probe must be total (never crash) on
arbitrary bytes. Extends the reference's per-function unit style
(SURVEY.md §5) with randomized inputs."""

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from ocr_lib_spark.functions.text import RK_BASE, RK_MOD, rolling_hashes_pandas


def _naive_rk(t: str) -> int:
    acc = 0
    for ch in t:
        acc = (acc * RK_BASE + ord(ch)) % RK_MOD
    return acc


def _naive_min_gram(t: str, k: int = 8) -> int:
    if len(t) <= k:
        return _naive_rk(t)
    return min(_naive_rk(t[i : i + k]) for i in range(len(t) - k + 1))


# BMP-only text: Spark/DuckDB split("") walk UTF-16 units, so the pinned
# twin contract covers the basic multilingual plane (documented); astral
# codepoints would diverge between Python ord() and JVM char iteration
_bmp_text = st.text(
    alphabet=st.characters(max_codepoint=0xFFFF, blacklist_categories=("Cs",)),
    max_size=120,
)


@settings(max_examples=200, deadline=None)
@given(st.lists(_bmp_text, max_size=8))
def test_rolling_hashes_equal_naive_fold(texts):
    out = rolling_hashes_pandas(pd.Series(texts, dtype=object))
    for i, t in enumerate(texts):
        if not t:
            assert out.rk_hash[i] == 0 and out.min_gram8[i] == 0
        else:
            assert out.rk_hash[i] == _naive_rk(t)
            assert out.min_gram8[i] == _naive_min_gram(t)


@settings(max_examples=300, deadline=None)
@given(st.binary(max_size=200))
def test_probe_image_dims_total_on_arbitrary_bytes(buf):
    from ocr_lib_spark.operators.multimodal import probe_image_dims

    r = probe_image_dims(buf)
    if r is not None:
        w, h, fmt = r
        assert fmt in ("png", "gif", "jpeg", "bmp")
        assert w >= 0 and h >= 0


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=400), st.sampled_from([1, 2, 4, 8, 16]))
def test_byte_thumbnail_math_matches_naive(buf, cells):
    """The cumsum bucket means equal the definitional per-bucket mean."""
    n = len(buf)
    arr = np.frombuffer(buf, dtype=np.uint8).astype(np.int64)
    if n:
        csum = np.concatenate(([0], np.cumsum(arr)))
        idx = np.arange(cells, dtype=np.int64)
        lo, hi = n * idx // cells, n * (idx + 1) // cells
        vals = np.where(hi > lo, (csum[hi] - csum[lo]) // np.maximum(hi - lo, 1), 0)
    else:
        vals = np.zeros(cells, dtype=np.int64)
    for c in range(cells):
        lo_c, hi_c = n * c // cells, n * (c + 1) // cells
        exp = sum(buf[lo_c:hi_c]) // (hi_c - lo_c) if hi_c > lo_c else 0
        assert vals[c] == exp


@settings(max_examples=100, deadline=None)
@given(st.lists(st.text(alphabet="ab <>/.x", min_size=1, max_size=40), min_size=1, max_size=5))
def test_classify_shifted_bounds_and_determinism(raws):
    from ocr_lib_spark.operators.features import classify_shifted
    from ocr_lib_spark.operators.prototypes import taught_prototypes

    protos, labels, _ = taught_prototypes()
    b1, s1 = classify_shifted(raws, protos)
    b2, s2 = classify_shifted(raws, protos)
    assert (b1 == b2).all() and (s1 == s2).all()
    assert ((s1 >= 0) & (s1 <= 100)).all()
    assert ((b1 >= 0) & (b1 < len(labels))).all()
