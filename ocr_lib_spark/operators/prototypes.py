"""The taught prototype alphabet (broadcast dimension table).

The reference learns 59 glyph prototypes from labeled fixture images at
namespace load (nauci-slova, core_helper.clj:1833-1991) and broadcasts
them (as a shared atom) to every matching thread. This engine teaches
block-class prototypes from labeled canonical example blocks at import —
same idea: prototypes are *data derived from labeled examples*, not
hand-tuned magic numbers. At runtime the (tiny) prototype matrix is
broadcast to executors via ``SparkContext.broadcast``.
"""

from __future__ import annotations

import numpy as np

from ocr_lib_spark.operators.features import block_features
from ocr_lib_spark.sources.synth import FOOTER, LINKFARM, NAV

_PROSE = (
    "key agg row scan slow fast table value part hash value table part a row "
    "fast join order data column window spark batch line customer query small"
)
_CODE = (
    "<pre>def f(x):\n    return (x + 1) * 2  # v2\nval = [f(i) for i in "
    "range(10)];\nprint(val, len(val), 3.14)</pre>"
)

#: (label, keep, canonical example blocks)
_TAUGHT: list[tuple[str, bool, list[str]]] = [
    ("content", True, [_PROSE, f"<p>{_PROSE}</p>", f"<p>{_PROSE[:60]}</p>"]),
    ("nav", False, [NAV]),
    ("footer", False, [FOOTER]),
    ("link_farm", False, [LINKFARM]),
    ("code", True, [_CODE]),
]


def taught_prototypes() -> tuple[np.ndarray, list[str], np.ndarray]:
    """(matrix (P, F), labels, keep flags) — prototype = mean feature
    vector of its labeled examples (read-signs-fn analog, core.clj:957-997).
    """
    mats, labels, keeps = [], [], []
    for label, keep, examples in _TAUGHT:
        mats.append(np.mean([block_features(e) for e in examples], axis=0))
        labels.append(label)
        keeps.append(keep)
    return np.stack(mats), labels, np.array(keeps)


def prototypes_df(spark):
    """The alphabet as a small Spark DataFrame (FIXTURES.md §2 schema) —
    broadcast-join-able when the classifier is expressed relationally."""
    m, labels, keep = taught_prototypes()
    rows = [
        (label, [float(x) for x in m[i]], bool(keep[i]))
        for i, label in enumerate(labels)
    ]
    return spark.createDataFrame(rows, "label string, features array<double>, keep boolean")
