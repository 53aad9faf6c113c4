"""BMP codec: hand-built byte-level golden + roundtrips."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from h3ronpy_spark.sources.bmp import bmp_codec, decode_bmp, encode_bmp
from h3ronpy_spark.sources.images import decode_image_with


def _hand_built_2x2_24bpp() -> bytes:
    """2x2 24-bit, bottom-up, rows padded to 8 bytes.  Visual rows:
    top (red, green), bottom (blue, white) -> stored bottom row first,
    BGR order."""
    bottom = bytes([255, 0, 0, 255, 255, 255]) + b"\x00\x00"
    top = bytes([0, 0, 255, 0, 255, 0]) + b"\x00\x00"
    data = bottom + top
    off = 14 + 40
    hdr = b"BM" + struct.pack("<IHHI", off + len(data), 0, 0, off)
    hdr += struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, len(data),
                       2835, 2835, 0, 0)
    return hdr + data


class TestHandBuilt:
    def test_golden_24bpp(self):
        got = decode_bmp(_hand_built_2x2_24bpp())
        assert got.shape == (2, 2, 3)
        assert got[0, 0].tolist() == [255, 0, 0]  # red
        assert got[0, 1].tolist() == [0, 255, 0]  # green
        assert got[1, 0].tolist() == [0, 0, 255]  # blue
        assert got[1, 1].tolist() == [255, 255, 255]

    def test_top_down(self):
        blob = bytearray(_hand_built_2x2_24bpp())
        blob[22:26] = struct.pack("<i", -2)  # negative height: top-down
        got = decode_bmp(bytes(blob))
        # top-down means the FIRST stored row is the top: stored order
        # was (bottom, top) for the bottom-up golden, so decoded rows
        # swap relative to the golden
        base = decode_bmp(_hand_built_2x2_24bpp())
        assert (got == base[::-1]).all()

    def test_bad_signature(self):
        with pytest.raises(ValueError, match="signature"):
            decode_bmp(b"XX" + _hand_built_2x2_24bpp()[2:])

    def test_rle_rejected(self):
        blob = bytearray(_hand_built_2x2_24bpp())
        blob[30:34] = struct.pack("<I", 1)  # BI_RLE8
        with pytest.raises(NotImplementedError, match="compression"):
            decode_bmp(bytes(blob))


class TestRoundtrip:
    @pytest.mark.parametrize("shape", [(1, 1), (5, 7), (8, 8), (13, 3)])
    def test_grey(self, shape):
        rng = np.random.default_rng(sum(shape))
        px = rng.integers(0, 256, shape).astype(np.uint8)
        got = decode_bmp(encode_bmp(px))
        assert got.shape == shape
        assert (got == px).all()

    def test_rgb(self):
        rng = np.random.default_rng(9)
        px = rng.integers(0, 256, (6, 5, 3)).astype(np.uint8)
        assert (decode_bmp(encode_bmp(px)) == px).all()

    def test_rgba(self):
        rng = np.random.default_rng(10)
        px = rng.integers(0, 256, (4, 9, 4)).astype(np.uint8)
        got = decode_bmp(encode_bmp(px))
        assert got.shape == (4, 9, 4)
        assert (got == px).all()

    def test_row_padding_odd_width(self):
        """w=3 at 24bpp -> 9 data bytes padded to 12 per row."""
        rng = np.random.default_rng(11)
        px = rng.integers(0, 256, (3, 3, 3)).astype(np.uint8)
        assert (decode_bmp(encode_bmp(px)) == px).all()


class TestRegistrySeam:
    def test_codec_adapter(self):
        px = np.arange(64, dtype=np.uint8).reshape(8, 8)
        got = decode_image_with(
            {"bmp": bmp_codec}, encode_bmp(px), 8, 8, "bmp"
        )
        assert (got == px).all()
