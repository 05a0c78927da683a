"""Multimodal binary-column operators (decode / feature / frame-sample).

Images, audio, and video ride through the engine as opaque ``binary``
columns with typed metadata — the byte[]-payload pattern of the
reference's every entry point (base64 → byte[] → decode,
read-base64-image-fn core.clj:190-208, ImageIO/read core.clj:1498-1500).

The container has no image/audio codecs, so the DECODE KERNEL is
stubbed behind an import-try (`_try_pil`): with PIL absent,
`decode_image_meta` produces pinned deterministic fake dims. Everything
around the kernel — BinaryType columns, Arrow batch shape, mapInPandas
signatures, schemas, partition behavior — is real and tested, and a
real codec drops into the marked slot without touching the plumbing.

`byte_histogram` and `frame_sample` are NOT stubs: they compute real
byte-level features (numpy bincount over the raw buffer; evenly-spaced
frame slicing + digest), the shape a feature-extraction stage has at
100 TB — one pass over the bytes, no shuffle, output rows bounded by
(docs × frames).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _try_pil():
    try:  # pragma: no cover - codec not present in this container
        from PIL import Image  # noqa: F401

        return Image
    except ImportError:
        return None


DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("content_md5", T.StringType()),
        T.StructField("decoder", T.StringType()),
    ]
)


def decode_image_meta(df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id") -> DataFrame:
    """Decode metadata per binary payload.

    Real codec slot: with PIL installed the kernel is
    ``Image.open(BytesIO(buf)).size``; without it, pinned fake dims
    derived from header byte + length (decoder column says which ran).
    """

    def run(batches):
        pil = _try_pil()
        for pdf in batches:
            raw = pdf[payload_col]
            n = raw.map(len)
            if pil is not None:  # pragma: no cover - codec absent here
                import io

                def dims(b):
                    try:
                        return pil.open(io.BytesIO(b)).size
                    except Exception:
                        return (0, 0)

                wh = raw.map(dims)
                w = wh.map(lambda t: t[0])
                h = wh.map(lambda t: t[1])
                dec = "pil"
            else:
                w = raw.map(lambda b: (b[0] % 64) + 1 if len(b) else 0)
                h = (n % 64) + 1
                dec = "stub"
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": n.astype("int32"),
                    "width": w.astype("int32"),
                    "height": h.astype("int32"),
                    "content_md5": raw.map(lambda b: hashlib.md5(b).hexdigest()),
                    "decoder": dec,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, schema=DECODE_SCHEMA)


HIST_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("hist", T.ArrayType(T.IntegerType())),
    ]
)


def byte_histogram(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id", bins: int = 16
) -> DataFrame:
    """Real feature extraction: ``bins``-bin histogram of payload bytes
    (byte >> log2(256/bins)), one numpy pass per Arrow batch — the
    grayscale-histogram analog of the binarization scan
    (grayscale-contrast-fn core.clj:241-330) on opaque media bytes."""
    if bins <= 0 or bins > 256 or (bins & (bins - 1)) != 0:
        raise ValueError(f"bins must be a power of two in (0, 256], got {bins}")
    shift = 8 - (bins - 1).bit_length()

    def run(batches):
        for pdf in batches:
            hists = [
                np.bincount(
                    np.frombuffer(b, dtype=np.uint8) >> shift, minlength=bins
                ).astype("int32").tolist()
                if len(b)
                else [0] * bins
                for b in pdf[payload_col]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": pdf[payload_col].map(len).astype("int32"),
                    "hist": pd.Series(hists, index=pdf.index, dtype=object),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, schema=HIST_SCHEMA)


def frame_sample(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    n_frames: int = 4,
    frame_bytes: int = 32,
) -> DataFrame:
    """Frame sampling over an opaque media payload: ``n_frames`` evenly
    spaced fixed-size byte windows (offset_i = (n-frame)·i/(k-1),
    integer math), each digested. Pure Catalyst — sequence + transform +
    explode; at scale this is the frame-manifest builder that a real
    video decoder consumes downstream."""
    n = F.length(payload_col).cast("long")
    span = F.greatest(n - frame_bytes, F.lit(0))
    idx = F.sequence(F.lit(0), F.lit(n_frames - 1))
    offsets = F.transform(
        idx, lambda i: F.floor(span * i.cast("long") / (n_frames - 1)).cast("int")
    )
    ex = df.select(
        F.col(id_col),
        n.cast("int").alias("n_bytes"),
        F.col(payload_col),
        F.posexplode(offsets).alias("frame_idx", "offset"),
    )
    frame = F.expr(f"substring({payload_col}, offset + 1, {frame_bytes})")
    return ex.select(
        id_col,
        "n_bytes",
        F.col("frame_idx").cast("int").alias("frame_idx"),
        "offset",
        F.md5(frame).alias("frame_md5"),
    )
