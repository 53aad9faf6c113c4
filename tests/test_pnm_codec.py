"""netpbm codec: hand-built ASCII/binary streams + roundtrips."""

from __future__ import annotations

import numpy as np
import pytest

from h3ronpy_spark.sources.pnm import decode_pnm, encode_pnm, pnm_codec


class TestHandBuilt:
    def test_p2_ascii_pgm_with_comment(self):
        blob = b"P2\n# a comment\n3 2\n255\n0 10 20\n30 40 50\n"
        got = decode_pnm(blob)
        assert got.tolist() == [[0, 10, 20], [30, 40, 50]]
        assert got.dtype == np.uint8

    def test_p3_ascii_ppm(self):
        blob = b"P3\n2 1\n255\n255 0 0  0 255 0\n"
        got = decode_pnm(blob)
        assert got.shape == (1, 2, 3)
        assert got[0, 0].tolist() == [255, 0, 0]
        assert got[0, 1].tolist() == [0, 255, 0]

    def test_p1_ascii_pbm(self):
        blob = b"P1\n3 2\n1 0 1\n0 1 0\n"
        got = decode_pnm(blob)
        # 1 = black -> 0; 0 = white -> 255
        assert got.tolist() == [[0, 255, 0], [255, 0, 255]]

    def test_p4_binary_pbm_row_padding(self):
        # 10 wide: rows pack to 2 bytes; pattern 1010101010
        row = bytes([0b10101010, 0b10000000])
        blob = b"P4\n10 2\n" + row + row
        got = decode_pnm(blob)
        assert got.shape == (2, 10)
        assert got[0].tolist() == [0, 255] * 5

    def test_p5_binary_16bit_big_endian(self):
        blob = b"P5\n2 1\n65535\n" + bytes([0x01, 0x00, 0xFF, 0xFF])
        got = decode_pnm(blob)
        assert got.dtype == np.uint16
        assert got.tolist() == [[256, 65535]]

    def test_comment_between_tokens(self):
        blob = b"P5\n2 #width\n1\n255\n\x07\x08"
        got = decode_pnm(blob)
        assert got.tolist() == [[7, 8]]

    def test_bad_magic(self):
        with pytest.raises(ValueError, match="magic"):
            decode_pnm(b"P9\n1 1\n255\n\x00")

    def test_truncated_ascii(self):
        with pytest.raises(ValueError, match="truncated"):
            decode_pnm(b"P2\n2 2\n255\n1 2 3\n")


class TestRoundtrip:
    @pytest.mark.parametrize("dt", ["uint8", "uint16"])
    def test_grey(self, dt):
        rng = np.random.default_rng(3)
        px = rng.integers(0, 256 if dt == "uint8" else 65536, (9, 7)).astype(dt)
        got = decode_pnm(encode_pnm(px))
        assert got.dtype == px.dtype and (got == px).all()

    def test_rgb(self):
        rng = np.random.default_rng(5)
        px = rng.integers(0, 256, (6, 4, 3)).astype(np.uint8)
        assert (decode_pnm(encode_pnm(px)) == px).all()

    def test_binary_data_with_whitespace_bytes(self):
        """Binary pixels that HAPPEN to be whitespace values (0x0A etc.)
        must survive: only ONE separator byte follows the header."""
        px = np.array([[10, 13, 32], [9, 11, 12]], np.uint8)
        assert (decode_pnm(encode_pnm(px)) == px).all()


class TestRegistrySeam:
    def test_codec_adapter(self):
        from h3ronpy_spark.sources.images import decode_image_with

        px = np.arange(64, dtype=np.uint8).reshape(8, 8)
        got = decode_image_with(
            {"pnm": pnm_codec}, encode_pnm(px), 8, 8, "pnm"
        )
        assert (got == px).all()
