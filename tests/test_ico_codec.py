"""ICO container: hand-built classic-DIB entries + PNG-entry
roundtrips."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from h3ronpy_spark.sources.ico import decode_ico, encode_ico, ico_codec


def _dib_entry_24bpp(px_rgb: np.ndarray, mask_bits: np.ndarray) -> bytes:
    """Classic ICO DIB: BITMAPINFOHEADER (height doubled), bottom-up
    BGR XOR rows padded to 4 bytes, then bottom-up 1-bit AND mask rows
    padded to 32 bits."""
    h, w = px_rgb.shape[:2]
    hdr = struct.pack(
        "<IiiHHIIiiII", 40, w, 2 * h, 1, 24, 0, 0, 0, 0, 0, 0
    )
    xor_row = (w * 3 + 3) & ~3
    xor = np.zeros((h, xor_row), np.uint8)
    xor[:, : w * 3] = px_rgb[..., [2, 1, 0]].reshape(h, w * 3)
    and_row = ((w + 31) // 32) * 4
    mask = np.zeros((h, and_row * 8), np.uint8)
    mask[:, :w] = mask_bits
    mask_packed = np.packbits(mask, axis=1)
    return hdr + xor[::-1].tobytes() + mask_packed[::-1].tobytes()


def _wrap_ico(entries: list[tuple[int, int, int, bytes]]) -> bytes:
    """entries: (w, h, bits, data)."""
    out = struct.pack("<HHH", 0, 1, len(entries))
    off = 6 + 16 * len(entries)
    dir_part = b""
    data_part = b""
    for w, h, bits, data in entries:
        dir_part += struct.pack(
            "<BBBBHHII", w % 256, h % 256, 0, 0, 1, bits, len(data), off
        )
        data_part += data
        off += len(data)
    return out + dir_part + data_part


class TestClassicDib:
    def test_24bpp_with_mask(self):
        px = np.zeros((2, 2, 3), np.uint8)
        px[0, 0] = [255, 0, 0]
        px[1, 1] = [0, 0, 255]
        mask = np.array([[0, 1], [0, 0]], np.uint8)  # (0,1) transparent
        got = decode_ico(_wrap_ico([(2, 2, 24, _dib_entry_24bpp(px, mask))]))
        assert got.shape == (2, 2, 4)
        assert got[0, 0].tolist() == [255, 0, 0, 255]
        assert got[0, 1, 3] == 0
        assert got[1, 1].tolist() == [0, 0, 255, 255]

    def test_picks_largest_entry(self):
        small = np.full((2, 2, 3), 10, np.uint8)
        big = np.full((4, 4, 3), 200, np.uint8)
        m2 = np.zeros((2, 2), np.uint8)
        m4 = np.zeros((4, 4), np.uint8)
        blob = _wrap_ico(
            [
                (2, 2, 24, _dib_entry_24bpp(small, m2)),
                (4, 4, 24, _dib_entry_24bpp(big, m4)),
            ]
        )
        got = decode_ico(blob)
        assert got.shape == (4, 4, 4)
        assert (got[..., :3] == 200).all()

    def test_bad_icondir(self):
        with pytest.raises(ValueError, match="ICONDIR"):
            decode_ico(struct.pack("<HHH", 1, 1, 1) + b"\x00" * 16)


class TestPngEntry:
    def test_roundtrip_rgba(self):
        rng = np.random.default_rng(3)
        px = rng.integers(0, 256, (16, 16, 4)).astype(np.uint8)
        got = decode_ico(encode_ico(px))
        assert (got == px).all()

    def test_roundtrip_grey(self):
        px = np.arange(64, dtype=np.uint8).reshape(8, 8)
        got = decode_ico(encode_ico(px))
        assert (got == px).all()

    def test_256_encoded_as_zero(self):
        """ICONDIR stores 256 as 0; decode must honor it."""
        px = np.zeros((256, 256), np.uint8)
        got = decode_ico(encode_ico(px))
        assert got.shape == (256, 256)

    def test_too_large_rejected(self):
        with pytest.raises(ValueError, match="256x256"):
            encode_ico(np.zeros((257, 10), np.uint8))


class TestRegistrySeam:
    def test_codec_adapter(self):
        from h3ronpy_spark.sources.images import decode_image_with

        px = np.arange(64, dtype=np.uint8).reshape(8, 8)
        got = decode_image_with(
            {"ico": ico_codec}, encode_ico(px), 8, 8, "ico"
        )
        assert (got == px).all()
