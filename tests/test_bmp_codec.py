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

    def test_rle8_on_24bpp_rejected(self):
        blob = bytearray(_hand_built_2x2_24bpp())
        blob[30:34] = struct.pack("<I", 1)  # BI_RLE8 but 24 bpp
        with pytest.raises(NotImplementedError, match="8 bpp"):
            decode_bmp(bytes(blob))

    def test_rle4_rejected(self):
        blob = bytearray(_hand_built_2x2_24bpp())
        blob[30:34] = struct.pack("<I", 2)  # BI_RLE4
        with pytest.raises(NotImplementedError, match="compression"):
            decode_bmp(bytes(blob))


def _rle8_bmp(w: int, h: int, rle: bytes) -> bytes:
    """8-bit grey-palette BMP whose pixel data is the given RLE8
    stream (bottom-up rows per the format)."""
    pal = b"".join(bytes([v, v, v, 0]) for v in range(256))
    off = 14 + 40 + len(pal)
    hdr = b"BM" + struct.pack("<IHHI", off + len(rle), 0, 0, off)
    hdr += struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 8, 1, len(rle), 2835, 2835, 0, 0
    )
    return hdr + pal + rle


class TestRle8:
    def test_runs_and_eol(self):
        """Bottom row: 3x10 then EOL; top row: 1x20, 2x30, EOL, EOB."""
        rle = bytes(
            [3, 10, 0, 0,  # run, end-of-line
             1, 20, 2, 30, 0, 0,  # two runs, end-of-line
             0, 1]  # end-of-bitmap
        )
        got = decode_bmp(_rle8_bmp(3, 2, rle))
        assert got.tolist() == [[20, 30, 30], [10, 10, 10]]

    def test_absolute_run_word_padded(self):
        """Absolute mode with odd count carries a pad byte."""
        rle = bytes([0, 3, 7, 8, 9, 0,  # absolute 3 literals + pad
                     0, 0, 0, 1])
        got = decode_bmp(_rle8_bmp(3, 1, rle))
        assert got.tolist() == [[7, 8, 9]]

    def test_delta_skips_stay_background(self):
        """Delta (2,1) jumps; skipped pixels remain index 0."""
        rle = bytes([1, 50, 0, 2, 2, 1, 1, 60, 0, 1])
        got = decode_bmp(_rle8_bmp(4, 2, rle))
        # bottom-up: row0 of the RLE stream is the BOTTOM image row
        assert got[1].tolist() == [50, 0, 0, 0]
        assert got[0].tolist() == [0, 0, 0, 60]


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
