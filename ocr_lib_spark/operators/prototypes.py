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


#: size-gate slack around the keep-class envelope, in ppm of the [0,1]
#: feature range (0.05): wide enough that any real content block's
#: features sit inside, tight enough that a degenerate taught alphabet
#: (all-zero features, collapsed classes) fails the sanity gate
SIZE_GATE_TOL_PPM = 50_000

#: pinned alphabet width — a feature-kernel change that alters the
#: vector arity must be a deliberate, test-visible event
N_FEATURES_EXPECTED = 6


def prototype_stats_df(spark, tol_ppm: int = SIZE_GATE_TOL_PPM):
    """Alphabet stats + derived size-gate envelope — the reference's
    alphabet min/max stats (core_helper.clj:13-23: width/height bounds
    over the taught glyphs, used to skip match attempts on blocks
    outside the alphabet's size range). Recast: per feature index, the
    min/max/sum of the per-prototype values over ALL prototypes and
    over the keep classes, plus the [gate_lo, gate_hi] envelope =
    keep-class bounds ± ``tol_ppm``.

    Values are exact ppm integers (``FLOOR(v * 1e6)`` per row, the repo
    determinism contract), so the DuckDB twin matches bit-for-bit. Not
    an execution prefilter here: the reference's size skip was a
    per-glyph-loop optimization, while this engine's matcher is one
    dense vectorized matrix op (operators/features.py) — the envelope
    instead serves as a drift gate on the taught alphabet itself (a
    feature-kernel or example change that collapses the keep classes
    moves these rows and fails the external gate)."""
    from pyspark.sql import functions as F

    scaled = prototypes_df(spark).select(
        "keep", F.posexplode("features").alias("feat_idx", "v")
    ).select(
        "feat_idx",
        "keep",
        F.floor(F.col("v") * 1_000_000).cast("long").alias("s"),
    )
    keep_s = F.when(F.col("keep"), F.col("s"))
    return (
        scaled.groupBy("feat_idx")
        .agg(
            F.count("*").alias("n_protos"),
            F.min("s").alias("min_f"),
            F.max("s").alias("max_f"),
            F.sum("s").alias("sum_f"),
            F.min(keep_s).alias("keep_min_f"),
            F.max(keep_s).alias("keep_max_f"),
        )
        .select(
            "feat_idx",
            "n_protos",
            "min_f",
            "max_f",
            "sum_f",
            "keep_min_f",
            "keep_max_f",
            (F.col("keep_min_f") - tol_ppm).alias("gate_lo"),
            (F.col("keep_max_f") + tol_ppm).alias("gate_hi"),
        )
    )


def prototypes_df(spark):
    """The alphabet as a small Spark DataFrame (FIXTURES.md §2 schema) —
    broadcast-join-able when the classifier is expressed relationally."""
    m, labels, keep = taught_prototypes()
    rows = [
        (label, [float(x) for x in m[i]], bool(keep[i]))
        for i, label in enumerate(labels)
    ]
    return spark.createDataFrame(rows, "label string, features array<double>, keep boolean")
