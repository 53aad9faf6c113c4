"""Round-7 EXIF orientation: APP1 parse + display transform.

Phone-photo corpora are dominated by orientation-tagged JPEGs; libjpeg
(and therefore the reference's rasterio/GDAL ingest,
h3ronpy/tests/arrow/test_raster.py:21-26) returns STORED pixels and
exposes the tag as metadata, so decode_jpeg stays stored-pixel and the
transform is an opt-in consumer step (PIL exif_transpose parity).

APP1 segments here are hand-built at the TIFF byte level in BOTH byte
orders, independent of any encoder.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from h3ronpy_spark.sources.images import decode_image_with
from h3ronpy_spark.sources.jpeg import (
    apply_exif_orientation,
    decode_jpeg,
    encode_jpeg,
    exif_orientation,
)


def _app1_exif(orientation: int, byte_order: str = "II",
               extra_tags: int = 0) -> bytes:
    """Minimal EXIF APP1: TIFF header + IFD0 with the orientation tag
    (type SHORT, count 1, value inline), optionally padded with dummy
    tags before it to exercise the entry walk."""
    e = "<" if byte_order == "II" else ">"
    n = extra_tags + 1
    ifd = struct.pack(e + "H", n)
    for i in range(extra_tags):  # dummy ImageDescription-ish tags
        ifd += struct.pack(e + "HHI", 0x010E + i, 2, 4) + b"abc\x00"
    ifd += struct.pack(e + "HHI", 0x0112, 3, 1)
    ifd += struct.pack(e + "H", orientation) + b"\x00\x00"
    ifd += struct.pack(e + "I", 0)  # next-IFD offset
    tiff = byte_order.encode() + struct.pack(e + "H", 42)
    tiff += struct.pack(e + "I", 8) + ifd
    payload = b"Exif\x00\x00" + tiff
    return b"\xff\xe1" + struct.pack(">H", 2 + len(payload)) + payload


def _with_app1(jpeg: bytes, app1: bytes) -> bytes:
    assert jpeg[:2] == b"\xff\xd8"
    return jpeg[:2] + app1 + jpeg[2:]


def _asym() -> np.ndarray:
    """2x3 asymmetric array: every orientation yields a distinct image."""
    return np.arange(6, dtype=np.uint8).reshape(2, 3)


class TestParse:
    @pytest.mark.parametrize("bo", ["II", "MM"])
    @pytest.mark.parametrize("o", [1, 3, 6, 8])
    def test_roundtrip_both_byte_orders(self, bo, o):
        blob = _with_app1(
            encode_jpeg(np.zeros((8, 8), np.uint8)), _app1_exif(o, bo)
        )
        assert exif_orientation(blob) == o

    def test_tag_after_dummy_entries(self):
        blob = _with_app1(
            encode_jpeg(np.zeros((8, 8), np.uint8)),
            _app1_exif(6, "MM", extra_tags=2),
        )
        assert exif_orientation(blob) == 6

    def test_no_app1_is_none(self):
        assert exif_orientation(encode_jpeg(np.zeros((8, 8), np.uint8))) is None

    def test_out_of_range_is_none(self):
        blob = _with_app1(
            encode_jpeg(np.zeros((8, 8), np.uint8)), _app1_exif(9)
        )
        assert exif_orientation(blob) is None

    @pytest.mark.parametrize(
        "mangle",
        [
            lambda s: s[:12],  # truncated mid-TIFF-header
            lambda s: s.replace(b"II", b"XX", 1),  # bad byte order
            lambda s: s.replace(b"Exif", b"Exxf", 1),  # not EXIF
            lambda s: s[:-10],  # truncated mid-IFD
        ],
    )
    def test_malformed_exif_never_raises(self, mangle):
        app1 = _app1_exif(6)
        seg = mangle(app1[4:])
        blob = _with_app1(
            encode_jpeg(np.zeros((8, 8), np.uint8)),
            b"\xff\xe1" + struct.pack(">H", 2 + len(seg)) + seg,
        )
        assert exif_orientation(blob) is None

    def test_decode_ignores_app1(self):
        """The decoder itself must skip APP1 and return stored pixels."""
        base = encode_jpeg(np.full((8, 8), 200, np.uint8))
        tagged = _with_app1(base, _app1_exif(6))
        assert (decode_jpeg(tagged) == decode_jpeg(base)).all()


class TestApply:
    def test_identity_and_none(self):
        a = _asym()
        assert (apply_exif_orientation(a, 1) == a).all()
        assert (apply_exif_orientation(a, None) == a).all()

    def test_all_eight_pil_parity(self):
        """Closed-form expected images for the 2x3 input
        [[0,1,2],[3,4,5]] under each EXIF orientation (the PIL
        exif_transpose mapping)."""
        a = _asym()
        expect = {
            1: [[0, 1, 2], [3, 4, 5]],
            2: [[2, 1, 0], [5, 4, 3]],  # mirror horizontal
            3: [[5, 4, 3], [2, 1, 0]],  # rotate 180
            4: [[3, 4, 5], [0, 1, 2]],  # mirror vertical
            5: [[0, 3], [1, 4], [2, 5]],  # transpose
            6: [[3, 0], [4, 1], [5, 2]],  # rotate 90 CW
            7: [[5, 2], [4, 1], [3, 0]],  # transverse
            8: [[2, 5], [1, 4], [0, 3]],  # rotate 90 CCW
        }
        for o, want in expect.items():
            got = apply_exif_orientation(a, o)
            assert got.tolist() == want, o

    def test_three_channel(self):
        a = np.arange(18, dtype=np.uint8).reshape(2, 3, 3)
        got = apply_exif_orientation(a, 6)
        assert got.shape == (3, 2, 3)
        assert (got[0, 0] == a[1, 0]).all() and (got[0, 1] == a[0, 0]).all()

    def test_contiguous_output(self):
        assert apply_exif_orientation(_asym(), 7).flags["C_CONTIGUOUS"]


class TestDecodeSeam:
    def test_orient_true_applies_tag(self):
        px = np.arange(64, dtype=np.uint8).reshape(8, 8) * 3
        blob = _with_app1(encode_jpeg(px, quality=95), _app1_exif(3))
        from h3ronpy_spark.sources.jpeg import jpeg_codec

        codecs = {"jpeg": jpeg_codec}
        stored = decode_image_with(codecs, blob, 8, 8, "jpeg")
        display = decode_image_with(codecs, blob, 8, 8, "jpeg", orient=True)
        assert (display == stored[::-1, ::-1]).all()
        assert not (display == stored).all()

    def test_orient_true_untagged_unchanged(self):
        px = np.arange(64, dtype=np.uint8).reshape(8, 8) * 3
        blob = encode_jpeg(px, quality=95)
        from h3ronpy_spark.sources.jpeg import jpeg_codec

        codecs = {"jpeg": jpeg_codec}
        a = decode_image_with(codecs, blob, 8, 8, "jpeg")
        b = decode_image_with(codecs, blob, 8, 8, "jpeg", orient=True)
        assert (a == b).all()

    def test_orient_true_raw_formats_unaffected(self):
        blob = np.arange(12, dtype=np.uint8).tobytes()
        a = decode_image_with({}, blob, 4, 3, "raw8", orient=True)
        assert a.shape == (3, 4)
