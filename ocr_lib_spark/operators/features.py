"""Block feature vectors — the "zero-normalized dot set" analog.

The reference classifies a glyph by comparing its normalized pixel set
against prototype pixel sets (bring-to-zero-coordinates-fn,
core.clj:999-1018; check-matching-fn core.clj:1020-1069). This engine
classifies a markup block by comparing a 6-dim feature vector against
prototype vectors. All features are bounded to [0, 1] so the L1 score
below behaves like the reference's percentage match.

Features:
  0 link_density  — chars inside <a>...</a> regions / raw block length
  1 tag_ratio     — chars inside <...> markup / raw block length
  2 text_ratio    — visible (tag-stripped, ws-normalized) chars / raw length
  3 punct_ratio   — ASCII punctuation / visible chars
  4 digit_ratio   — digits / visible chars
  5 mean_token_len— mean visible token length / 10, clipped to 1
"""

from __future__ import annotations

import re
import string

import numpy as np

N_FEATURES = 6

#: `[^<>]*` keeps scans linear on broken markup (a stray `<` restarts
#: the tag scan, HTML5-parser-like); `[^>]*` was quadratic — see
#: tokenizer.py for the measurement
TAG_RE = re.compile(r"<[^<>]*>")
A_OPEN_RE = re.compile(r"<a\b[^<>]*>", re.I)
A_CLOSE_RE = re.compile(r"</a\s*>", re.I)


def _link_chars(raw: str) -> int:
    """Total chars inside <a>...</a> spans (first-closer pairing, like
    the lazy regex it replaces) — two linear passes + binary search,
    never the quadratic `<a[^>]*>.*?</a>` backtracking on unclosed
    anchors."""
    import bisect

    closes = [(m.start(), m.end()) for m in A_CLOSE_RE.finditer(raw)]
    if not closes:
        return 0
    total = 0
    m = A_OPEN_RE.search(raw)
    while m:
        i = bisect.bisect_left(closes, (m.end(), -1))
        if i < len(closes):
            total += closes[i][1] - m.start()
            m = A_OPEN_RE.search(raw, closes[i][1])
        else:
            m = A_OPEN_RE.search(raw, m.start() + 1)
    return total
_PUNCT = set(string.punctuation)
#: deletion tables — counting by translate-then-length runs at C speed,
#: ~8x faster than a per-char Python generator (this function is ~80% of
#: the extraction hot path, the reference's grouping+matching 82%,
#: core.clj:153-164)
_DEL_PUNCT = str.maketrans("", "", string.punctuation)
_DEL_DIGIT = str.maketrans("", "", string.digits)


def visible_text(raw: str) -> str:
    """Strip markup and normalize whitespace runs to single spaces."""
    return " ".join(TAG_RE.sub(" ", raw).split())


def block_features(raw: str) -> np.ndarray:
    """Feature vector of one raw block (markup included).

    Counting identities (exact, no semantics change for ASCII payloads):
    punct/digit counts via deletion-translate; mean token length from
    len(vis) - (ntoks - 1) — visible_text guarantees single-space
    normalization, so the space count determines the token-length sum.
    """
    n = len(raw)
    if n == 0:
        return np.zeros(N_FEATURES)
    # single C-pass counts: matched-span totals via length deltas of
    # sub/subn (identical to summing finditer spans), and the tag-subbed
    # string is reused for the visible-text normalization
    link_chars = _link_chars(raw)
    tag_sub, n_tags = TAG_RE.subn(" ", raw)
    tag_chars = n - (len(tag_sub) - n_tags)
    vis = " ".join(tag_sub.split())
    lv = len(vis)
    nv = max(lv, 1)
    if lv:
        ntoks = vis.count(" ") + 1
        mtl = (lv - (ntoks - 1)) / ntoks
    else:
        mtl = 0.0
    return np.array(
        [
            link_chars / n,
            tag_chars / n,
            lv / n,
            (lv - len(vis.translate(_DEL_PUNCT))) / nv,
            (lv - len(vis.translate(_DEL_DIGIT))) / nv,
            min(mtl / 10.0, 1.0),
        ]
    )


def match_scores(features: np.ndarray, prototypes: np.ndarray) -> np.ndarray:
    """Percentage match of each block against each prototype.

    score = 100 * (1 - mean |f - p|)  — the bounded-L1 analog of the
    reference's 100*|intersection|/|union| Jaccard (core.clj:1039-1050).
    Shapes: features (B, F), prototypes (P, F) -> (B, P).
    """
    if features.size == 0:
        return np.zeros((0, prototypes.shape[0]))
    d = np.abs(features[:, None, :] - prototypes[None, :, :]).mean(axis=2)
    return 100.0 * (1.0 - d)


def classify(features: np.ndarray, prototypes: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Best prototype index + score per block.

    Tie-break pinned to the reference's fold: strictly-greater wins, the
    earlier prototype is retained on an exact tie (core.clj:1051-1057 —
    np.argmax returns the first maximal index).
    """
    s = match_scores(features, prototypes)
    if s.size == 0:
        return np.zeros(0, dtype=np.int64), np.zeros(0)
    best = np.argmax(s, axis=1)
    return best, s[np.arange(s.shape[0]), best]


#: the 1-D text analog of the reference's pixel translations
#: (0,0), (0,-1), (-1,0), (-1,-1): chars trimmed from (head, tail)
SHIFT_VARIANTS = ((0, 0), (1, 0), (0, 1), (1, 1))


def classify_shifted(
    raw_blocks: list[str], prototypes: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Translation-tolerant matcher — the dev pipeline's shift-averaged
    scorer (pronadji-slovo/odredi-nepoznato-slovo, core_helper.clj:259-322):

      1. score the block AND its head/tail one-char-trimmed variants
         (the text recast of translating the dot set by (0,-1), (-1,0),
         (-1,-1)) against every prototype;
      2. average the four scores per prototype (the reference averages
         the four intersection counts);
      3. argmax over the averaged score; EXACT ties broken by the
         smallest averaged difference — here the L∞ feature distance,
         an independent secondary criterion like the reference's
         difference count (find-max, core_helper.clj:226-240) — then by
         first prototype index.

    Returns (best index, averaged score) aligned with ``raw_blocks``.
    """
    n = len(raw_blocks)
    if n == 0:
        return np.zeros(0, dtype=np.int64), np.zeros(0)
    avg_score = np.zeros((n, prototypes.shape[0]))
    avg_linf = np.zeros((n, prototypes.shape[0]))
    for head, tail in SHIFT_VARIANTS:
        feats = np.stack(
            [
                block_features(b[head : len(b) - tail or None])
                for b in raw_blocks
            ]
        )
        avg_score += match_scores(feats, prototypes)
        avg_linf += np.abs(feats[:, None, :] - prototypes[None, :, :]).max(axis=2)
    avg_score /= len(SHIFT_VARIANTS)
    avg_linf /= len(SHIFT_VARIANTS)
    best = np.empty(n, dtype=np.int64)
    for i in range(n):
        cand = np.flatnonzero(avg_score[i] == avg_score[i].max())
        best[i] = cand[np.argmin(avg_linf[i, cand])]  # argmin: first on tie
    return best, avg_score[np.arange(n), best]
