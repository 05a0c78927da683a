"""Payload decode + block segmentation with exact source offsets.

Reference analogs:
  - base64 -> bytes -> image decode at every entry point
    (read-base64-image-fn core.clj:190-208, ImageIO/read core.clj:1498-1500)
    -> here: data-URI base64 decode and tool-call JSON unwrapping.
  - black-dot scan + projection segmentation (read-black-dots-fn
    core.clj:332-396; oblast-reda/oblast-slova core_helper.clj:675-732)
    -> here: splitting a raw payload into block-level markup nodes and
    bare-text runs, each with [start, end) offsets into the ORIGINAL
    payload string (the span-provenance analog of bbox bookkeeping in
    find-min-max-fn core.clj:640-685).

Limitations (documented, tested): same-tag nesting inside a block
element is not split further — the outer block wins, matching the
reference's whole-component granularity.
"""

from __future__ import annotations

import base64
import binascii
import re
from dataclasses import dataclass, field

_BLOCK_TAGS = r"nav|header|footer|aside|p|div|ul|ol|table|pre|code|section|article|h[1-6]"
#: reference semantics pattern (kept for documentation/tests): lazy
#: match to the FIRST same-tag closer, case-insensitive, attrs allowed.
#: NOT used for scanning — the backtracking `(.*?)</\1>` makes broken
#: markup quadratic (measured 7.6s on a single 100 KB `<`-noise payload;
#: an executor DoS at corpus scale). `_block_matches` below reproduces
#: its exact match sequence with two linear passes.
#: `[^<>]*` (not `[^>]*`) everywhere: a stray `<` inside a tag's attr
#: region starts a new tag scan (HTML5-parser-like) — and keeps every
#: scan linear; `[^>]*` rescans to end-of-payload at each `<` of broken
#: markup (quadratic, measured 8s on one 100 KB `<`-noise payload).
BLOCK_TAG_RE = re.compile(
    rf"<({_BLOCK_TAGS})\b[^<>]*>(.*?)</\1\s*>",
    re.S | re.I,
)
_OPEN_RE = re.compile(rf"<({_BLOCK_TAGS})\b[^<>]*>", re.I)
_CLOSE_RE = re.compile(rf"</({_BLOCK_TAGS})\s*>", re.I)


def _block_matches(payload: str) -> list[tuple[int, int, int, int]]:
    """(start, end, inner_start, inner_end) for every block element,
    reproducing BLOCK_TAG_RE.finditer exactly (pinned by tests):
      - a block runs from its opening tag to the FIRST same-tag closer
        (nested same-tag stays inside, like the lazy `.*?`);
      - consumed spans are skipped (finditer resumes after a match);
      - an opener with no closer is skipped with a 1-char advance, so
        blocks hidden inside it (even inside its attr region) are found.
    Linear: one closer pass + ordered opener searches + binary search.
    """
    import bisect

    closers: dict[str, list[tuple[int, int]]] = {}
    for m in _CLOSE_RE.finditer(payload):
        closers.setdefault(m.group(1).lower(), []).append((m.start(), m.end()))
    out: list[tuple[int, int, int, int]] = []
    m = _OPEN_RE.search(payload)
    while m:
        lst = closers.get(m.group(1).lower())
        close = None
        if lst:
            i = bisect.bisect_left(lst, (m.end(), -1))
            if i < len(lst):
                close = lst[i]
        if close:
            out.append((m.start(), close[1], m.end(), close[0]))
            m = _OPEN_RE.search(payload, close[1])
        else:
            m = _OPEN_RE.search(payload, m.start() + 1)
    return out
TOOL_HEAD_RE = re.compile(r'^\s*\{\s*"tool_call"')
TOOL_OUT_RE = re.compile(r'"output"\s*:\s*"')
DATA_URI_RE = re.compile(r"^data:[A-Za-z0-9.+/-]+;base64,")


@dataclass
class Block:
    """One segmented block. Offsets index the original payload string."""

    start: int  # raw block start (incl. outer tags)
    end: int  # raw block end
    inner_start: int  # visible-content region start
    inner_end: int  # visible-content region end
    raw: str  # raw block source (markup included)
    forced_label: str | None = None  # set for decode-path blocks (blob)
    decoded_text: str | None = None  # decoded payload for blob blocks
    meta: dict = field(default_factory=dict)


def _html_blocks(payload: str, base: int) -> list[Block]:
    """Split markup into block elements + nonblank bare-text runs."""
    blocks: list[Block] = []
    pos = 0
    for start, end, inner_start, inner_end in _block_matches(payload):
        if start > pos:
            seg = payload[pos:start]
            if seg.strip():
                blocks.append(
                    Block(base + pos, base + start, base + pos, base + start, seg)
                )
        blocks.append(
            Block(
                base + start,
                base + end,
                base + inner_start,
                base + inner_end,
                payload[start:end],
            )
        )
        pos = end
    if pos < len(payload):
        seg = payload[pos:]
        if seg.strip():
            blocks.append(
                Block(base + pos, base + len(payload), base + pos, base + len(payload), seg)
            )
    return blocks


def segment_payload(payload: str) -> list[Block]:
    """Decode + segment one raw turn payload into ordered blocks.

    Decode routing (first match wins):
      1. tool-call wrapper  -> segment the "output" string value in place
         (offsets stay relative to the original payload).
      2. base64 data URI    -> single 'blob' block carrying decoded text.
      3. anything else      -> markup/bare-text block segmentation.
    """
    if not payload or not payload.strip():
        return []
    if TOOL_HEAD_RE.match(payload):
        m = TOOL_OUT_RE.search(payload)
        if m:
            vstart = m.end()
            vend = payload.find('"', vstart)
            if vend < 0:
                vend = len(payload)
            inner = payload[vstart:vend]
            if not inner.strip():
                return []
            return _html_blocks(inner, vstart)
        return _html_blocks(payload, 0)
    dm = DATA_URI_RE.match(payload)
    if dm:
        b64 = payload[dm.end() :]
        try:
            decoded = base64.b64decode(b64, validate=True).decode("utf-8", "replace")
        except (binascii.Error, ValueError):
            decoded = None
        if decoded is not None:
            return [
                Block(
                    0,
                    len(payload),
                    dm.end(),
                    len(payload),
                    payload,
                    forced_label="blob",
                    decoded_text=decoded,
                )
            ]
        # fall through: not valid base64 -> treat as text
    return _html_blocks(payload, 0)


#: unit boundaries inside an over-merged block: explicit line breaks,
#: <br> tags, or sentence-final punctuation followed by whitespace —
#: the whitespace-valley analog of the projection-profile glyph split
#: (odredi-oblast-slova core_helper.clj:415-444).
UNIT_BOUNDARY_RE = re.compile(r"<br\s*/?>|\n+|(?<=[.!?])\s+", re.I)


def split_block_units(block: Block, min_unit_chars: int = 8) -> list[Block]:
    """Split one over-merged block into classification units.

    The citaj analog (core_helper.clj:324-361): the reference slides a
    window over a too-wide segment of touching glyphs and advances by
    the matched glyph width; units narrower than 8 px are skipped. Here
    a block whose markup gave the segmenter no inner boundaries is split
    at line/sentence boundaries into units that are classified
    independently (classify-then-merge — the vectorized equivalent of
    greedy match-advance: same-label neighbors re-merge in assembly),
    and units with fewer than ``min_unit_chars`` visible chars are
    skipped as sub-glyph noise.

    Offsets of every unit index the ORIGINAL payload string, exactly
    like the parent block's.
    """
    rel0 = block.inner_start - block.start
    rel1 = block.inner_end - block.start
    inner = block.raw[rel0:rel1]
    units: list[Block] = []
    pos = 0
    bounds = [(m.start(), m.end()) for m in UNIT_BOUNDARY_RE.finditer(inner)]
    bounds.append((len(inner), len(inner)))
    for bstart, bend in bounds:
        seg = inner[pos:bstart]
        if seg.strip():
            a = block.inner_start + pos
            b = block.inner_start + bstart
            units.append(Block(a, b, a, b, seg))
        pos = bend
    return [u for u in units if len(" ".join(u.raw.split())) >= min_unit_chars]
