"""Multimodal binary-column plumbing tests: the decode kernel is a stub
(no codecs in this container), but the schema, BinaryType carriage,
Arrow batch shape, and partition invariance are real and pinned here
(SURVEY.md §2.1 — byte[]-payload decode at every reference entry point,
core.clj:190-208, 1498-1500)."""

import hashlib

import pytest

from ocr_lib_spark.operators.multimodal import (
    byte_histogram,
    decode_image_meta,
    frame_sample,
)


@pytest.fixture(scope="module")
def payloads(spark):
    rows = [
        (1, b"hello world, a payload of plain bytes"),
        (2, bytes(range(256))),  # every byte value once
        (3, b""),  # degenerate: empty payload
        (4, b"x" * 100),
    ]
    return spark.createDataFrame(rows, "doc_id long, payload binary")


def test_decode_meta_schema_and_stub(payloads):
    out = decode_image_meta(payloads).orderBy("doc_id").collect()
    assert [r.doc_id for r in out] == [1, 2, 3, 4]
    r1 = out[0]
    assert r1.n_bytes == len(b"hello world, a payload of plain bytes")
    assert r1.decoder == "stub"
    assert r1.content_md5 == hashlib.md5(b"hello world, a payload of plain bytes").hexdigest()
    # empty payload: width 1 (the oracle's closed form
    # ascii(substring(text,1,1))%64+1 = 1 on empty — ADVICE r7),
    # height 1, digest of empty bytes, never null
    r3 = out[2]
    assert (r3.width, r3.n_bytes) == (1, 0)
    assert r3.content_md5 == hashlib.md5(b"").hexdigest()


def test_byte_histogram_exact(payloads):
    out = {r.doc_id: r for r in byte_histogram(payloads, bins=16).collect()}
    # doc 2 holds every byte exactly once -> 16 per bin
    assert list(out[2].hist) == [16] * 16
    assert sum(out[1].hist) == out[1].n_bytes == 37
    assert list(out[3].hist) == [0] * 16  # empty payload -> zero histogram
    # 'x' = 0x78 -> bin 7
    assert out[4].hist[7] == 100 and sum(out[4].hist) == 100


def test_frame_sample_offsets_and_digests(payloads):
    rows = frame_sample(payloads, n_frames=4, frame_bytes=32).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert all(len(v) == 4 for v in by_doc.values())
    # doc 2: 256 bytes, span 224 -> offsets 0, 74, 149, 224
    offs = sorted(r.offset for r in by_doc[2])
    assert offs == [0, 74, 149, 224]
    payload = bytes(range(256))
    for r in by_doc[2]:
        assert r.frame_md5 == hashlib.md5(payload[r.offset : r.offset + 32]).hexdigest()
    # empty payload: all offsets 0, digest of empty slice
    assert {r.offset for r in by_doc[3]} == {0}


import struct

# hand-built container headers (format specs are public; dims chosen odd
# on purpose so a stub could never coincide)
PNG_BYTES = (
    b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR"
    + struct.pack(">II", 641, 483) + b"\x08\x06\x00\x00\x00" + b"\x00" * 8
)
GIF_BYTES = b"GIF89a" + struct.pack("<HH", 321, 203) + b"\x00" * 8
JPEG_BYTES = (
    b"\xff\xd8"
    + b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9  # APP0 (len 16 = 2 + 14 payload)
    + b"\xff\xc0" + struct.pack(">H", 17) + b"\x08" + struct.pack(">HH", 1083, 1921)
    + b"\x03" + b"\x00" * 9  # SOF0: height 1083, width 1921
)
BMP_BYTES = (
    b"BM" + b"\x00" * 12 + struct.pack("<I", 40) + struct.pack("<ii", 801, -601)
    + b"\x00" * 4
)


def test_probe_image_dims_exact_headers():
    from ocr_lib_spark.operators.multimodal import probe_image_dims

    assert probe_image_dims(PNG_BYTES) == (641, 483, "png")
    assert probe_image_dims(GIF_BYTES) == (321, 203, "gif")
    assert probe_image_dims(JPEG_BYTES) == (1921, 1083, "jpeg")
    assert probe_image_dims(BMP_BYTES) == (801, 601, "bmp")  # top-down height
    # non-images: text, text starting 'BM', truncated JPEG, empty
    assert probe_image_dims(b"hello world") is None
    assert probe_image_dims(b"BMg text that starts with BM" + b"x" * 30) is None
    assert probe_image_dims(b"\xff\xd8\xff\xe0\x00") is None
    assert probe_image_dims(b"") is None


def test_decode_meta_hdr_path_mixed_batch(spark):
    """Real header dims for image payloads, stub for the rest — per row,
    in one mixed Arrow batch."""
    rows = [
        (1, PNG_BYTES),
        (2, JPEG_BYTES),
        (3, b"plain text payload"),
        (4, GIF_BYTES),
        (5, BMP_BYTES),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r.doc_id: r for r in decode_image_meta(df).collect()}
    assert (out[1].width, out[1].height, out[1].decoder) == (641, 483, "hdr")
    assert (out[2].width, out[2].height, out[2].decoder) == (1921, 1083, "hdr")
    assert out[3].decoder == "stub"
    assert (out[4].width, out[4].height, out[4].decoder) == (321, 203, "hdr")
    assert (out[5].width, out[5].height, out[5].decoder) == (801, 601, "hdr")


def test_byte_histogram_rejects_non_power_of_two(payloads):
    with pytest.raises(ValueError, match="power of two"):
        byte_histogram(payloads, bins=10)


def test_null_payload_behaves_as_empty(spark):
    """Nil-guard discipline (reference §1.3): a NULL payload flows
    through every kernel as empty bytes — no crash, empty-not-null."""
    from ocr_lib_spark.operators.multimodal import byte_thumbnail

    df = spark.createDataFrame(
        [(1, b"abc"), (2, None)], "doc_id long, payload binary"
    )
    meta = {r.doc_id: r for r in decode_image_meta(df).collect()}
    # NULL -> empty bytes -> stub width 1 (oracle closed form, ADVICE r7)
    assert (meta[2].n_bytes, meta[2].width, meta[2].decoder) == (0, 1, "stub")
    assert meta[2].content_md5 == hashlib.md5(b"").hexdigest()
    hist = {r.doc_id: r for r in byte_histogram(df).collect()}
    assert list(hist[2].hist) == [0] * 16
    thumb = [r for r in byte_thumbnail(df, cells=4).collect() if r.doc_id == 2]
    assert [r.mean_byte for r in thumb] == [0, 0, 0, 0]
    assert frame_sample(df).count() == 8


def test_byte_thumbnail_area_average(spark, payloads):
    from ocr_lib_spark.operators.multimodal import byte_thumbnail

    out = {}
    for r in byte_thumbnail(payloads, cells=4).collect():
        out.setdefault(r.doc_id, {})[r.cell] = r.mean_byte
    # doc 2 = bytes 0..255 -> 4 buckets of 64 consecutive values:
    # means 31, 95, 159, 223 (integer floor of the arithmetic mean)
    assert out[2] == {0: 31, 1: 95, 2: 159, 3: 223}
    # constant payload -> constant cells
    assert set(out[4].values()) == {ord("x")}
    # empty payload -> zero cells, still `cells` rows
    assert out[3] == {0: 0, 1: 0, 2: 0, 3: 0}


def test_multimodal_partition_invariance(payloads):
    one = byte_histogram(payloads.repartition(1)).orderBy("doc_id").collect()
    many = byte_histogram(payloads.repartition(7)).orderBy("doc_id").collect()
    assert [list(r.hist) for r in one] == [list(r.hist) for r in many]


# --- round 3: REAL stdlib-only PNG pixel decode ------------------------------

def _encode_png(px, color_type, filters):
    """Hand-built baseline PNG encoder for fixtures: applies the given
    filter type per row (cycled from ``filters``), zlib-compresses —
    exercising the decoder's full unfilter matrix without any codec."""
    import struct
    import zlib

    import numpy as np

    px = np.asarray(px, dtype=np.uint8)
    h, w = px.shape[:2]
    ch = 1 if px.ndim == 2 else px.shape[2]
    flat = px.reshape(h, w * ch).astype(np.int64)

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    raw = bytearray()
    prev = np.zeros(w * ch, dtype=np.int64)
    for y in range(h):
        f = filters[y % len(filters)]
        row = flat[y]
        if f == 0:
            enc = row
        elif f == 1:  # sub
            left = np.concatenate((np.zeros(ch, dtype=np.int64), row[:-ch]))
            enc = (row - left) % 256
        elif f == 2:  # up
            enc = (row - prev) % 256
        elif f == 3:  # average
            left = np.concatenate((np.zeros(ch, dtype=np.int64), row[:-ch]))
            enc = (row - (left + prev) // 2) % 256
        elif f == 4:  # paeth
            enc = np.zeros_like(row)
            for x in range(w * ch):
                a = row[x - ch] if x >= ch else 0
                b = prev[x]
                c = prev[x - ch] if x >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                enc[x] = (row[x] - pred) % 256
        raw.append(f)
        raw.extend(int(v) & 0xFF for v in enc)
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def _gradient(h, w, ch):
    import numpy as np

    y, x = np.mgrid[0:h, 0:w]
    if ch == 1:
        return ((3 * x + 7 * y) % 256).astype(np.uint8)
    return np.stack([((3 * x + 7 * y + 41 * c) % 256) for c in range(ch)], axis=2).astype(
        np.uint8
    )


def test_png_decode_every_filter_and_color_type():
    import numpy as np

    from ocr_lib_spark.operators.multimodal import png_decode

    cases = [
        (np.full((5, 7), 137, dtype=np.uint8), 0, 1),        # solid gray
        (_gradient(9, 11, 1), 0, 1),                          # gray gradient
        (_gradient(8, 6, 3), 2, 3),                           # RGB gradient
        (np.full((4, 4, 4), 9, dtype=np.uint8), 6, 4),        # solid RGBA
        (_gradient(12, 5, 4), 6, 4),                          # RGBA gradient
        (_gradient(7, 13, 2), 4, 2),                          # gray+alpha
    ]
    for px, color_type, ch in cases:
        for filters in ([0], [1], [2], [3], [4], [0, 1, 2, 3, 4]):
            buf = _encode_png(px, color_type, filters)
            got = png_decode(buf)
            assert got is not None, (color_type, filters)
            want = px if px.ndim == 3 else px[:, :, None]
            assert got.shape == want.shape, (color_type, filters)
            assert (got == want).all(), (color_type, filters)


def test_png_decode_palette_and_rejects():
    import struct
    import zlib

    import numpy as np

    from ocr_lib_spark.operators.multimodal import png_decode

    # palette: indices 0..3 -> distinct RGB entries
    idx = (np.arange(24, dtype=np.uint8) % 4).reshape(4, 6)
    buf = _encode_png(idx, 3, [0, 2])
    pal = bytes([10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120])

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    # splice PLTE in after IHDR (8-byte sig + 25-byte IHDR chunk)
    cut = 8 + 12 + 13
    buf = buf[:cut] + chunk(b"PLTE", pal) + buf[cut:]
    got = png_decode(buf)
    assert got is not None and got.shape == (4, 6, 3)
    want = np.frombuffer(pal, dtype=np.uint8).reshape(4, 3)[idx]
    assert (got == want).all()

    # rejects: truncated stream, bad zlib, non-PNG
    full = _encode_png(_gradient(6, 6, 3), 2, [0])
    assert png_decode(full[: len(full) // 2]) is None
    assert png_decode(b"not a png at all") is None
    corrupt = bytearray(full)
    corrupt[40] ^= 0xFF  # inside IDAT
    res = png_decode(bytes(corrupt))  # must not raise
    assert res is None or res.shape == (6, 6, 3)


def test_decode_meta_png_pixel_path(spark):
    from ocr_lib_spark.operators.multimodal import decode_image_meta

    png = _encode_png(_gradient(17, 23, 3), 2, [0, 1, 2, 3, 4])
    df = spark.createDataFrame(
        [(1, png), (2, b"plain bytes payload")], "doc_id long, payload binary"
    )
    rows = {r["doc_id"]: r for r in decode_image_meta(df).collect()}
    assert rows[1]["decoder"] == "png"
    assert (rows[1]["width"], rows[1]["height"]) == (23, 17)
    assert rows[2]["decoder"] == "stub"


def test_byte_thumbnail_png_true_pixel_grid(spark):
    import numpy as np

    from ocr_lib_spark.operators.multimodal import byte_thumbnail

    # 8x8 gray image with 4 constant quadrants -> a 4x4 (cells=16) grid
    # thumbnail must reproduce each quadrant's constant exactly
    px = np.zeros((8, 8), dtype=np.uint8)
    px[:4, :4], px[:4, 4:], px[4:, :4], px[4:, 4:] = 10, 60, 110, 210
    png = _encode_png(px, 0, [0])
    df = spark.createDataFrame([(1, png)], "doc_id long, payload binary")
    out = byte_thumbnail(df, cells=16).orderBy("cell").collect()
    got = [r["mean_byte"] for r in out]
    want = [10, 10, 60, 60, 10, 10, 60, 60, 110, 110, 210, 210, 110, 110, 210, 210]
    assert got == want


def test_jpeg_gray_roundtrip_exact_on_quadrants():
    """Baseline-DCT JPEG decode (round 6, VERDICT r05 item 6): the
    fixture encoder (flat quant, standard Annex-K Huffman) round-trips
    a piecewise-constant image exactly — constant 8x8 blocks have one
    nonzero DCT coefficient, so flat quantization loses nothing."""
    import numpy as np

    from ocr_lib_spark.operators.multimodal import (
        jpeg_gray_decode,
        jpeg_gray_encode,
        probe_image_dims,
    )

    px = np.zeros((16, 16), dtype=np.uint8)
    px[:8, :8], px[:8, 8:], px[8:, :8], px[8:, 8:] = 10, 60, 110, 210
    buf = jpeg_gray_encode(px)
    assert probe_image_dims(buf) == (16, 16, "jpeg")
    out = jpeg_gray_decode(buf)
    assert out.shape == (16, 16)
    assert (out == px).all()


def test_jpeg_gray_roundtrip_bounded_error_odd_dims():
    """Non-multiple-of-8 dims + dense content: decode error is bounded
    by coefficient rounding (<= 1 byte level with the flat table)."""
    import numpy as np

    from ocr_lib_spark.operators.multimodal import (
        jpeg_gray_decode,
        jpeg_gray_encode,
    )

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (19, 29), dtype=np.uint8)
    out = jpeg_gray_decode(jpeg_gray_encode(img))
    assert out.shape == (19, 29)
    assert int(np.abs(out.astype(int) - img.astype(int)).max()) <= 1


def test_jpeg_decode_rejects_non_baseline_and_garbage():
    from ocr_lib_spark.operators.multimodal import jpeg_gray_decode

    assert jpeg_gray_decode(b"") is None
    assert jpeg_gray_decode(b"not a jpeg") is None
    # progressive SOF2 frame -> None (cascade falls through to hdr probe)
    import struct

    prog = (
        b"\xff\xd8"
        + b"\xff\xc2"
        + struct.pack(">H", 17)
        + b"\x08"
        + struct.pack(">HH", 8, 8)
        + b"\x03"
        + b"\x00" * 9
    )
    assert jpeg_gray_decode(prog) is None
    # truncated entropy segment -> None, not an exception
    from ocr_lib_spark.operators.multimodal import jpeg_gray_encode
    import numpy as np

    buf = jpeg_gray_encode(np.full((8, 8), 50, dtype=np.uint8))
    assert jpeg_gray_decode(buf[: len(buf) - 12]) is None


def test_byte_thumbnail_jpeg_true_pixel_grid(spark):
    """JPEG twin of test_byte_thumbnail_png_true_pixel_grid: thumbnails
    of baseline-JPEG payloads come from the reconstructed pixel grid,
    not byte space."""
    import numpy as np

    from ocr_lib_spark.operators.multimodal import byte_thumbnail, jpeg_gray_encode

    px = np.zeros((8, 8), dtype=np.uint8)
    px[:4, :4], px[:4, 4:], px[4:, :4], px[4:, 4:] = 10, 60, 110, 210
    buf = jpeg_gray_encode(px)
    df = spark.createDataFrame([(1, buf)], "doc_id long, payload binary")
    out = byte_thumbnail(df, cells=16).orderBy("cell").collect()
    got = [r["mean_byte"] for r in out]
    want = [10, 10, 60, 60, 10, 10, 60, 60, 110, 110, 210, 210, 110, 110, 210, 210]
    assert got == want


def test_decode_image_meta_jpg_tag(spark):
    """decode_image_meta reports pixel-decoded dims with the 'jpg'
    decoder tag for decodable baseline JPEGs."""
    import numpy as np

    from ocr_lib_spark.operators.multimodal import decode_image_meta, jpeg_gray_encode

    buf = jpeg_gray_encode(np.full((12, 20), 90, dtype=np.uint8))
    df = spark.createDataFrame([(5, buf)], "doc_id long, payload binary")
    r = decode_image_meta(df).collect()[0]
    assert (r["width"], r["height"], r["decoder"]) == (20, 12, "jpg")


def test_png_gray_encode_roundtrips_exact_pixels():
    import numpy as np

    from ocr_lib_spark.operators.multimodal import png_decode, png_gray_encode

    for h, w in [(1, 1), (2, 3), (5, 7), (16, 9)]:
        img = ((np.arange(h)[:, None] * 7 + np.arange(w)[None, :] * 13 + 3) % 256).astype(
            np.uint8
        )
        out = png_decode(png_gray_encode(img))
        assert out is not None and out.shape == (h, w, 1)
        assert (np.asarray(out, dtype=np.uint8)[:, :, 0] == img).all()


def test_synth_container_payloads_census_classes(spark):
    """Every census class routes through its intended decoder with the
    contract dims — the off-fixture twin of multimodal_decode_census."""
    from ocr_lib_spark.operators.multimodal import (
        MM_CLASSES,
        decode_image_meta,
        mm_census_dims,
        synth_container_payloads,
    )

    rows = [(i, f"text payload {i}") for i in range(25)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    meta = {r.doc_id: r for r in decode_image_meta(synth_container_payloads(df)).collect()}
    assert len(meta) == 25
    for doc_id, r in meta.items():
        cls = doc_id % MM_CLASSES
        if cls in (0, 1, 2):
            w, h = mm_census_dims(doc_id)
            assert (r.width, r.height) == (w, h)
            assert r.decoder == {0: "png", 1: "jpg", 2: "hdr"}[cls]
        else:
            assert r.decoder == "stub"
