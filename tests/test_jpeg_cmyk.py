"""Round-7 JPEG decoder breadth: Adobe APP14 color transforms (CMYK /
YCCK / transform-0 RGB) and 16-bit (Pq=1) quantization tables.

Real scraped web corpora contain Adobe-sourced 4-component CMYK/YCCK
JPEGs (print-pipeline exports) and occasional 16-bit-DQT streams from
very-low-quality or high-precision encoders; the reference ingests
them through rasterio/GDAL's libjpeg (h3ronpy/tests/arrow/
test_raster.py:21-26), so the from-scratch codec must not reject them.

All streams below are HAND-BUILT at the T.81/Adobe-TN5116 byte level —
independent of this codec's own encoder — and checked against
closed-form expected pixels (flat blocks: DC coefficient c with q=16
reconstructs to 128 + 2c).
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from h3ronpy_spark.sources.jpeg import decode_jpeg


def _dqt8(tq: int = 0, val: int = 16) -> bytes:
    q = bytes([tq]) + bytes([val] * 64)
    return b"\xff\xdb" + struct.pack(">H", 2 + len(q)) + q


def _dqt16(tq: int = 0, val: int = 16) -> bytes:
    """Pq=1: 64 big-endian 16-bit entries (T.81 B.2.4.1)."""
    q = bytes([0x10 | tq]) + b"".join(
        struct.pack(">H", val) for _ in range(64)
    )
    return b"\xff\xdb" + struct.pack(">H", 2 + len(q)) + q


def _sof(marker: int, h: int, w: int, comp_ids: list[int]) -> bytes:
    body = struct.pack(">BHHB", 8, h, w, len(comp_ids))
    for cid in comp_ids:
        body += bytes([cid, 0x11, 0])  # 1x1 sampling, DQT 0
    return bytes([0xFF, marker]) + struct.pack(">H", 2 + len(body)) + body


def _dht(tid: int, symbols: list[int]) -> bytes:
    """All listed symbols get 2-bit codes, in order."""
    bits = [0, len(symbols)] + [0] * 14
    payload = bytes([tid]) + bytes(bits) + bytes(symbols)
    return b"\xff\xc4" + struct.pack(">H", 2 + len(payload)) + payload


def _sos(n_comp: int) -> bytes:
    s = bytes([n_comp])
    for ci in range(n_comp):
        s += bytes([ci + 1, 0x00])  # DC table 0, AC table 0
    s += bytes([0, 63, 0])
    return b"\xff\xda" + struct.pack(">H", 2 + len(s)) + s


def _app14(transform: int) -> bytes:
    """Adobe TN-5116 APP14: 'Adobe' + version + flags0/1 + transform."""
    payload = b"Adobe" + struct.pack(">HHHB", 100, 0, 0, transform)
    return b"\xff\xee" + struct.pack(">H", 2 + len(payload)) + payload


def _pack_bits(bitstr: str) -> bytes:
    """MSB-first pack with 1-padding and 0xFF byte stuffing."""
    bitstr += "1" * (-len(bitstr) % 8)
    out = bytearray()
    for i in range(0, len(bitstr), 8):
        b = int(bitstr[i : i + 8], 2)
        out.append(b)
        if b == 0xFF:
            out.append(0x00)
    return bytes(out)


def _scan_bits(dc_values: list[int]) -> bytes:
    """Entropy bits for one interleaved MCU of flat 8x8 blocks.

    DC Huffman table: '00' -> size 5, '01' -> size 0.  AC table:
    '00' -> EOB.  Supported DC diffs here: 16 (5 bits '10000') and 0.
    """
    bits = ""
    for v in dc_values:
        if v == 16:
            bits += "00" + "10000" + "00"
        elif v == 0:
            bits += "01" + "00"
        else:  # pragma: no cover - test helper misuse
            raise AssertionError(v)
    return _pack_bits(bits)


def _stream(
    *,
    dqt: bytes,
    comp_dcs: list[int],
    app14: bytes = b"",
    sof_marker: int = 0xC0,
) -> bytes:
    n = len(comp_dcs)
    return (
        b"\xff\xd8"
        + app14
        + dqt
        + _sof(sof_marker, 8, 8, list(range(1, n + 1)))
        + _dht(0x00, [5, 0])
        + _dht(0x10, [0x00])
        + _sos(n)
        + _scan_bits(comp_dcs)
        + b"\xff\xd9"
    )


class TestDqt16:
    def test_16bit_dqt_flat_block(self):
        """Pq=1 table of 16s decodes identically to the 8-bit table:
        DC 16 * q 16 -> flat 160."""
        got = decode_jpeg(_stream(dqt=_dqt16(), comp_dcs=[16]))
        assert got.shape == (8, 8)
        assert (got == 160).all(), got

    def test_16bit_dqt_large_entry(self):
        """An entry above 255 must survive (the point of Pq=1):
        q=300, DC diff 16 -> coef 4800 -> flat clip(128+600)=255."""
        q = bytes([0x10]) + b"".join(
            struct.pack(">H", 300) for _ in range(64)
        )
        dqt = b"\xff\xdb" + struct.pack(">H", 2 + len(q)) + q
        got = decode_jpeg(_stream(dqt=dqt, comp_dcs=[16]))
        assert (got == 255).all(), got


class TestAdobeTransforms:
    def test_transform0_three_component_is_rgb(self):
        """APP14 transform=0 with 3 components: planes ARE RGB —
        no YCbCr conversion.  Flat planes (160, 128, 128) must come
        back exactly, not as the YCbCr interpretation (which would be
        a red-shifted (205, 137, 128))."""
        got = decode_jpeg(
            _stream(dqt=_dqt8(), comp_dcs=[16, 0, 0], app14=_app14(0))
        )
        assert got.shape == (8, 8, 3)
        assert (got == np.array([160, 128, 128], np.uint8)).all(), got[0, 0]

    def test_component_ids_rgb_heuristic(self):
        """No APP14, but component IDs 'R','G','B' (82,71,66) — the
        libjpeg heuristic: treat as RGB."""
        n = 3
        blob = (
            b"\xff\xd8"
            + _dqt8()
            + _sof(0xC0, 8, 8, [82, 71, 66])
            + _dht(0x00, [5, 0])
            + _dht(0x10, [0x00])
            + bytes([0xFF, 0xDA])
            + struct.pack(">H", 2 + 1 + 2 * n + 3)
            + bytes([n, 82, 0, 71, 0, 66, 0, 0, 63, 0])
            + _scan_bits([16, 0, 0])
            + b"\xff\xd9"
        )
        got = decode_jpeg(blob)
        assert (got == np.array([160, 128, 128], np.uint8)).all()

    def test_ycck_transform2(self):
        """YCCK (transform=2): YCC (160,128,128) -> inverted-CMY
        (160,160,160); inverted-K plane 160; RGB = icmy*ik/255 =
        round(160*160/255) = 100 on every channel."""
        got = decode_jpeg(
            _stream(dqt=_dqt8(), comp_dcs=[16, 0, 0, 16], app14=_app14(2))
        )
        assert got.shape == (8, 8, 3)
        assert (got == 100).all(), got[0, 0]

    def test_cmyk_transform0_adobe_inverted(self):
        """4-component transform=0 with APP14: Adobe stores CMYK
        INVERTED, so flat planes (160,128,128,160) are the inverted
        values directly: R=round(160*160/255)=100,
        G=B=round(128*160/255)=80."""
        got = decode_jpeg(
            _stream(
                dqt=_dqt8(), comp_dcs=[16, 0, 0, 16], app14=_app14(0)
            )
        )
        assert (got == np.array([100, 80, 80], np.uint8)).all(), got[0, 0]

    def test_cmyk_no_app14_not_inverted(self):
        """4 components with NO Adobe marker: plain (non-inverted)
        CMYK.  Planes (160,128,128,160) -> inverted (95,127,127,95):
        R=round(95*95/255)=35, G=B=round(127*95/255)=47."""
        got = decode_jpeg(_stream(dqt=_dqt8(), comp_dcs=[16, 0, 0, 16]))
        assert (got == np.array([35, 47, 47], np.uint8)).all(), got[0, 0]

    def test_transform1_three_component_still_ycbcr(self):
        """APP14 transform=1 is the JFIF default: YCbCr.  Must match
        the no-APP14 decode bit-for-bit."""
        with_t1 = decode_jpeg(
            _stream(dqt=_dqt8(), comp_dcs=[16, 0, 0], app14=_app14(1))
        )
        plain = decode_jpeg(_stream(dqt=_dqt8(), comp_dcs=[16, 0, 0]))
        assert (with_t1 == plain).all()


class TestProgressiveCmyk:
    def test_progressive_ycck_dc_only(self):
        """SOF2 4-component YCCK, single DC-first scan at Al=0 —
        APP14 must be honored on the progressive path too."""
        n = 4
        sos = bytes([n])
        for ci in range(n):
            sos += bytes([ci + 1, 0x00])
        sos += bytes([0, 0, 0])  # Ss=Se=0, Ah=Al=0
        blob = (
            b"\xff\xd8"
            + _app14(2)
            + _dqt8()
            + _sof(0xC2, 8, 8, [1, 2, 3, 4])
            + _dht(0x00, [5, 0])
            + b"\xff\xda"
            + struct.pack(">H", 2 + len(sos))
            + sos
            # DC-only interleaved MCU: per comp '00'+'10000' (16) or
            # '01' (0); Y=16, Cb=Cr=0, K=16
            + _pack_bits("0010000" + "01" + "01" + "0010000")
            + b"\xff\xd9"
        )
        got = decode_jpeg(blob)
        assert got.shape == (8, 8, 3)
        assert (got == 100).all(), got[0, 0]

    def test_progressive_16bit_dqt(self):
        """Pq=1 DQT on the progressive parser."""
        sos = bytes([1, 1, 0x00, 0, 0, 0])
        blob = (
            b"\xff\xd8"
            + _dqt16()
            + _sof(0xC2, 8, 8, [1])
            + _dht(0x00, [5, 0])
            + b"\xff\xda"
            + struct.pack(">H", 2 + len(sos))
            + sos
            + _pack_bits("0010000")
            + b"\xff\xd9"
        )
        got = decode_jpeg(blob)
        assert (got == 160).all()


class TestRejections:
    def test_five_components_rejected(self):
        with pytest.raises((NotImplementedError, ValueError)):
            decode_jpeg(_stream(dqt=_dqt8(), comp_dcs=[16, 0, 0, 0, 0]))
