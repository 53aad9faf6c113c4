"""Round-5 (VERDICT r04 item 3): pure-Python PNG codec via stdlib zlib,
registered in the image codec registry and driven through the real
multimodal operators (tile_images, resize_images,
extract_image_features) — the compressed-format path is bit-identical
to the raw8 path on the same pixels."""

import hashlib
import os
import struct
import zlib

import numpy as np
import pytest
from pyspark.sql import functions as F

os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")

from h3ronpy_spark.sources.png import (  # noqa: E402
    decode_png,
    encode_png,
    png_codec,
)


@pytest.fixture(scope="module")
def spark():
    from h3ronpy_spark.session import get_spark

    s = get_spark("local[4]", app_name="h3spark_png_tests", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


class TestPngPure:
    def test_roundtrip_all_formats(self):
        rng = np.random.default_rng(7)
        cases = [
            ((13, 17), np.uint8),  # grey8, >=5 rows -> all 5 filters
            ((6, 9), np.uint16),  # grey16
            ((11, 5, 3), np.uint8),  # rgb8
            ((7, 8, 2), np.uint8),  # grey+alpha (color type 4)
            ((1, 1), np.uint8),  # degenerate
            ((64, 64), np.uint8),
        ]
        for shape, dt in cases:
            a = rng.integers(0, np.iinfo(dt).max + 1, size=shape, dtype=dt)
            b = decode_png(encode_png(a))
            assert b.dtype == a.dtype and b.shape == a.shape
            assert (a == b).all(), (shape, dt)

    def test_encoder_bytes_golden(self):
        """Encoder output is deterministic and pinned (any change to the
        chunk layout / filter schedule / zlib level shows up here)."""
        g = np.arange(25, dtype=np.uint8).reshape(5, 5)
        blob = encode_png(g)
        assert blob[:8] == b"\x89PNG\r\n\x1a\n"
        assert (
            hashlib.sha256(blob).hexdigest()
            == "fd1317dedd0a945830ad821abaf5e499da00cbfe8767885dbc1a6a5e368dd444"
        )

    def _hand_png(self, w, h, scanlines, bit_depth=8, color_type=0):
        """Assemble a PNG from explicit (filter_type, raw_line_bytes)
        scanlines — INDEPENDENT of encode_png, so decode is checked
        against the spec, not against our own encoder."""

        def chunk(tag, payload):
            return (
                struct.pack(">I", len(payload))
                + tag
                + payload
                + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
            )

        ihdr = struct.pack(">IIBBBBB", w, h, bit_depth, color_type, 0, 0, 0)
        body = b"".join(bytes([f]) + bytes(line) for f, line in scanlines)
        return (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(body))
            + chunk(b"IEND", b"")
        )

    def test_decode_hand_assembled_filters(self):
        """Spec-exact unfilter check with hand-computed expectations.

        Row 0 (None):   raw [10, 20, 30]        -> [10, 20, 30]
        Row 1 (Sub):    deltas [5, 5, 5]        -> [5, 10, 15]
        Row 2 (Up):     deltas [1, 1, 1] over r1 -> [6, 11, 16]
        Row 3 (Average): line [4, 4, 4]:
            x0: 4 + (0 + 6)//2  = 7
            x1: 4 + (7 + 11)//2 = 13
            x2: 4 + (13 + 16)//2 = 18
        Row 4 (Paeth):  line [2, 2, 2] over r3:
            x0: a=0,b=7,c=0   -> pred 7  -> 9
            x1: a=9,b=13,c=7  -> p=15, pa=6,pb=2,pc=8 -> pred 13 -> 15
            x2: a=15,b=18,c=13 -> p=20, pa=5,pb=2,pc=7 -> pred 18 -> 20
        """
        blob = self._hand_png(
            3,
            5,
            [
                (0, [10, 20, 30]),
                (1, [5, 5, 5]),
                (2, [1, 1, 1]),
                (3, [4, 4, 4]),
                (4, [2, 2, 2]),
            ],
        )
        got = decode_png(blob)
        want = np.array(
            [
                [10, 20, 30],
                [5, 10, 15],
                [6, 11, 16],
                [7, 13, 18],
                [9, 15, 20],
            ],
            dtype=np.uint8,
        )
        assert (got == want).all()

    def test_crc_corruption_raises(self):
        blob = bytearray(encode_png(np.zeros((4, 4), np.uint8)))
        # flip a bit inside the IDAT payload
        idat_at = bytes(blob).index(b"IDAT") + 4
        blob[idat_at] ^= 0x01
        with pytest.raises(ValueError, match="CRC"):
            decode_png(bytes(blob))

    def test_geometry_mismatch_raises(self):
        blob = encode_png(np.zeros((4, 6), np.uint8))
        with pytest.raises(ValueError, match="geometry"):
            png_codec(blob, w=6, h=5, fmt="png")
        assert png_codec(blob, w=6, h=4, fmt="png").shape == (4, 6)

    def test_roundtrip_property(self):
        """Hypothesis: encode->decode is the identity for every
        supported shape/dtype, including shapes that stress each filter
        type and 16-bit byte order."""
        from hypothesis import given, settings
        from hypothesis import strategies as st

        @settings(max_examples=40, deadline=None)
        @given(
            h=st.integers(1, 12),
            w=st.integers(1, 12),
            kind=st.sampled_from(["g8", "g16", "rgb8", "rgba8", "pal8"]),
            seed=st.integers(0, 2**31 - 1),
        )
        def check(h, w, kind, seed):
            rng = np.random.default_rng(seed)
            if kind == "g8":
                a = rng.integers(0, 256, (h, w), dtype=np.uint8)
            elif kind == "g16":
                a = rng.integers(0, 65536, (h, w), dtype=np.uint16)
            elif kind == "rgb8":
                a = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            elif kind == "rgba8":
                a = rng.integers(0, 256, (h, w, 4), dtype=np.uint8)
            else:
                pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
                idx = rng.integers(0, 16, (h, w), dtype=np.uint8)
                got = decode_png(encode_png(idx, palette=pal))
                assert (got == pal[idx]).all()
                return
            b = decode_png(encode_png(a))
            assert b.dtype == a.dtype and b.shape == a.shape
            assert (a == b).all()

        check()

    def test_unsupported_color_type_raises(self):
        # 16-bit palette is out of the spec matrix (16-bit RGB is
        # supported since round 7 — see TestPngVariantBreadth)
        blob = self._hand_png(
            1, 1, [(0, [0] * 2)], bit_depth=16, color_type=3
        )
        with pytest.raises(NotImplementedError, match="color_type"):
            decode_png(blob)

    def test_grey_alpha_hand_assembled(self):
        # color type 4 (grey+alpha), spec stream independent of encoder
        blob = self._hand_png(2, 1, [(0, [7, 255, 9, 128])], color_type=4)
        got = decode_png(blob)
        assert got.shape == (1, 2, 2)
        assert (got == np.array([[[7, 255], [9, 128]]], np.uint8)).all()

    def test_rgba_roundtrip_and_filters(self):
        """Round-6 (VERDICT r05 item 8): RGBA-8 (color type 6), all five
        filters via the row%5 schedule."""
        rng = np.random.default_rng(11)
        for shape in [(7, 5, 4), (1, 1, 4), (32, 9, 4)]:
            a = rng.integers(0, 256, shape, dtype=np.uint8)
            b = decode_png(encode_png(a))
            assert b.shape == a.shape and b.dtype == np.uint8
            assert (a == b).all()

    def test_rgba_hand_assembled_sub_filter(self):
        """Spec-exact Sub unfilter for bpp=4: left neighbor is 4 bytes
        back, so each CHANNEL accumulates independently."""
        blob = self._hand_png(
            2, 1, [(1, [10, 20, 30, 40, 1, 2, 3, 4])], color_type=6
        )
        got = decode_png(blob)
        want = np.array([[[10, 20, 30, 40], [11, 22, 33, 44]]], np.uint8)
        assert (got == want).all()

    def test_palette_roundtrip_opaque_and_trns(self):
        """Palette PNGs (color type 3): decode expands through PLTE to
        RGB, and through tRNS to RGBA with 255 for entries past the
        table (per spec)."""
        rng = np.random.default_rng(3)
        pal = rng.integers(0, 256, (6, 3), dtype=np.uint8)
        idx = rng.integers(0, 6, (9, 7), dtype=np.uint8)
        got = decode_png(encode_png(idx, palette=pal))
        assert got.shape == (9, 7, 3)
        assert (got == pal[idx]).all()
        trns = np.array([0, 128, 255], np.uint8)  # shorter than palette
        got4 = decode_png(encode_png(idx, palette=pal, trns=trns))
        assert got4.shape == (9, 7, 4)
        assert (got4[..., :3] == pal[idx]).all()
        alpha_full = np.array([0, 128, 255, 255, 255, 255], np.uint8)
        assert (got4[..., 3] == alpha_full[idx]).all()

    def test_palette_hand_assembled(self):
        """Hand-built palette stream independent of our encoder."""

        def chunk(tag, payload):
            return (
                struct.pack(">I", len(payload))
                + tag
                + payload
                + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
            )

        ihdr = struct.pack(">IIBBBBB", 2, 1, 8, 3, 0, 0, 0)
        plte = bytes([255, 0, 0, 0, 255, 0])  # red, green
        body = bytes([0, 0, 1])  # filter None, indexes [0, 1]
        blob = (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", ihdr)
            + chunk(b"PLTE", plte)
            + chunk(b"IDAT", zlib.compress(body))
            + chunk(b"IEND", b"")
        )
        got = decode_png(blob)
        want = np.array([[[255, 0, 0], [0, 255, 0]]], np.uint8)
        assert (got == want).all()

    def test_palette_errors(self):
        pal = np.zeros((4, 3), np.uint8)
        with pytest.raises(ValueError, match="index out of range"):
            encode_png(np.full((2, 2), 9, np.uint8), palette=pal)
        with pytest.raises(ValueError, match="palette encode"):
            encode_png(np.zeros((2, 2, 3), np.uint8), palette=pal)
        with pytest.raises(ValueError, match="trns"):
            encode_png(
                np.zeros((2, 2, 3), np.uint8), trns=np.zeros(2, np.uint8)
            )

    def test_fixed_filter_type_roundtrip(self):
        """filter_type pin (hot-path corpus uses Up=2) stays lossless
        for every supported pixel format."""
        rng = np.random.default_rng(5)
        g = rng.integers(0, 256, (10, 6), dtype=np.uint8)
        ga = rng.integers(0, 256, (10, 6, 2), dtype=np.uint8)
        rgba = rng.integers(0, 256, (10, 6, 4), dtype=np.uint8)
        for ft in range(5):
            assert (decode_png(encode_png(g, filter_type=ft)) == g).all()
            assert (decode_png(encode_png(ga, filter_type=ft)) == ga).all()
            assert (
                decode_png(encode_png(rgba, filter_type=ft)) == rgba
            ).all()


class TestPngAdam7:
    """Adam7-interlaced decode (round 6): the interlaced stream is
    assembled TEST-SIDE from the spec's pass geometry and its own
    filter implementation, so decode is checked against ISO 15948, not
    against the codec's own code."""

    PASSES = (
        (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
        (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
    )

    @staticmethod
    def _row_bytes(sub_row, bit_depth):
        if bit_depth == 16:
            return np.ascontiguousarray(sub_row).astype(">u2").tobytes()
        return np.ascontiguousarray(sub_row).astype(np.uint8).tobytes()

    def _interlaced_png(self, img, color_type, bit_depth=8,
                        filt_cycle=(0,), plte=None, trns=None):
        """Serialize img (h, w[, c]) as an Adam7 PNG.  Filters are
        applied per PASS row (independent re-implementation: None=0,
        Sub=1, Up=2 — mod-256 byte arithmetic)."""
        h, w = img.shape[:2]
        channels = 1 if img.ndim == 2 else img.shape[2]
        bpp = channels * (bit_depth // 8)
        body = bytearray()
        fi = 0
        for x0, y0, dx, dy in self.PASSES:
            sub = img[y0::dy, x0::dx]
            if sub.shape[0] == 0 or sub.shape[1] == 0:
                continue
            prev = np.zeros(sub.shape[1] * bpp, np.uint8)
            for r in range(sub.shape[0]):
                row = np.frombuffer(
                    self._row_bytes(sub[r], bit_depth), np.uint8
                ).copy()
                f = filt_cycle[fi % len(filt_cycle)]
                fi += 1
                if f == 0:
                    line = row
                elif f == 1:  # Sub: minus the byte bpp to the left
                    left = np.zeros_like(row)
                    left[bpp:] = row[:-bpp]
                    line = (row.astype(np.int16) - left) % 256
                elif f == 2:  # Up: minus the same byte of the prior row
                    line = (row.astype(np.int16) - prev) % 256
                else:
                    raise AssertionError("test helper: unsupported filter")
                body += bytes([f]) + line.astype(np.uint8).tobytes()
                prev = row
        def chunk(tag, payload):
            return (
                struct.pack(">I", len(payload)) + tag + payload
                + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
            )
        ihdr = struct.pack(
            ">IIBBBBB", w, h, bit_depth, color_type, 0, 0, 1
        )
        out = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
        if plte is not None:
            out += chunk(b"PLTE", plte.astype(np.uint8).tobytes())
        if trns is not None:
            out += chunk(b"tRNS", bytes(trns))
        return out + chunk(b"IDAT", zlib.compress(bytes(body))) \
                   + chunk(b"IEND", b"")

    def test_adam7_all_formats_and_filters(self):
        rng = np.random.default_rng(11)
        cases = [
            ((13, 17), 0, np.uint8, 8),    # grey8
            ((9, 6), 0, np.uint16, 16),    # grey16
            ((11, 10, 3), 2, np.uint8, 8), # rgb8
            ((10, 9, 2), 4, np.uint8, 8),  # grey+alpha
            ((12, 7, 4), 6, np.uint8, 8),  # rgba8
        ]
        for shape, ctype, dt, depth in cases:
            a = rng.integers(0, np.iinfo(dt).max + 1, size=shape, dtype=dt)
            blob = self._interlaced_png(
                a, ctype, depth, filt_cycle=(0, 1, 2)
            )
            got = decode_png(blob)
            assert got.dtype == a.dtype and got.shape == a.shape
            assert (got == a).all(), (shape, ctype)

    def test_adam7_empty_pass_geometries(self):
        """Sizes where several passes have zero width or height (which
        must contribute no bytes at all, not even filter bytes)."""
        rng = np.random.default_rng(12)
        for h, w in [(1, 1), (2, 2), (3, 3), (4, 5), (5, 4),
                     (8, 8), (13, 9), (1, 20), (20, 1)]:
            a = rng.integers(0, 256, (h, w), dtype=np.uint8)
            assert (decode_png(self._interlaced_png(a, 0)) == a).all(), (h, w)

    def test_adam7_palette_with_trns(self):
        rng = np.random.default_rng(13)
        plte = rng.integers(0, 256, (16, 3), dtype=np.uint8)
        idx = rng.integers(0, 16, (10, 11), dtype=np.uint8)
        trns = [255] * 15 + [0]  # last entry transparent
        got = decode_png(
            self._interlaced_png(idx, 3, plte=plte, trns=trns,
                                 filt_cycle=(0, 2))
        )
        assert got.shape == (10, 11, 4)
        assert (got[..., :3] == plte[idx]).all()
        want_a = np.where(idx == 15, 0, 255)
        assert (got[..., 3] == want_a).all()

    def test_adam7_truncated_and_trailing_raise(self):
        a = np.arange(81, dtype=np.uint8).reshape(9, 9)
        blob = self._interlaced_png(a, 0)
        # rebuild with one extra byte in the compressed body
        body_ok = decode_png(blob)  # sanity: valid stream decodes
        assert (body_ok == a).all()
        def rebuild(extra):
            # strip IDAT, re-deflate with mutated body
            import re as _re
            # simpler: regenerate through the helper then patch
            raise NotImplementedError
        # trailing garbage: append a filter byte + row beyond pass 7
        tail = bytes([0]) + bytes(9)
        bad = self._interlaced_png(a, 0)
        # splice: decompress, add tail, recompress, rebuild chunks
        sig = bad[:8]
        pos, chunks = 8, []
        while pos < len(bad):
            (ln,) = struct.unpack(">I", bad[pos:pos + 4])
            tag = bad[pos + 4:pos + 8]
            payload = bad[pos + 8:pos + 8 + ln]
            chunks.append((tag, payload))
            pos += 12 + ln
        def chunk(tag, payload):
            return (
                struct.pack(">I", len(payload)) + tag + payload
                + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
            )
        out = sig
        for tag, payload in chunks:
            if tag == b"IDAT":
                payload = zlib.compress(zlib.decompress(payload) + tail)
            out += chunk(tag, payload)
        with pytest.raises(ValueError, match="length mismatch"):
            decode_png(out)


def _png_images(spark, n=40, seed=42):
    """The synthetic images table re-encoded as PNG payloads: same
    image_id/w/h/caption/phash as synth_images(n, seed), bytes =
    PNG-compressed band, fmt='png'."""
    from h3ronpy_spark.sources.images import gen_images_pdf

    pdf = gen_images_pdf(np.arange(n, dtype=np.int64), seed)
    rows = []
    for r in pdf.itertuples(index=False):
        band = np.frombuffer(r.bytes, np.uint8).reshape(r.h, r.w)
        rows.append(
            (r.image_id, encode_png(band), int(r.w), int(r.h), "png",
             r.caption, int(r.phash))
        )
    return spark.createDataFrame(
        rows,
        "image_id string, bytes binary, w int, h int, fmt string, "
        "caption string, phash long",
    )


class TestPngVariantBreadth:
    """Round-7 (VERDICT r06 item 3, decoder-side): 1/2/4-bit palette
    and greyscale, 16-bit RGB / grey+alpha / RGBA, and tRNS colour-key
    transparency.  All streams are hand-assembled spec-level bytes,
    independent of encode_png (which intentionally stays 8-bit)."""

    @staticmethod
    def _chunk(tag, payload):
        return (
            struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    @staticmethod
    def _pack_bits(samples, bit_depth):
        """Pack one row of samples MSB-first at bit_depth, zero-padded
        to a whole byte (spec 7.2)."""
        bits = []
        for s in samples:
            for b in range(bit_depth - 1, -1, -1):
                bits.append((int(s) >> b) & 1)
        while len(bits) % 8:
            bits.append(0)
        return np.packbits(np.array(bits, np.uint8)).tobytes()

    def _png(self, w, h, scanlines, bit_depth, color_type,
             plte=None, trns=None, interlace=0):
        ihdr = struct.pack(
            ">IIBBBBB", w, h, bit_depth, color_type, 0, 0, interlace
        )
        out = b"\x89PNG\r\n\x1a\n" + self._chunk(b"IHDR", ihdr)
        if plte is not None:
            out += self._chunk(b"PLTE", bytes(plte))
        if trns is not None:
            out += self._chunk(b"tRNS", bytes(trns))
        body = b"".join(bytes([f]) + bytes(line) for f, line in scanlines)
        return out + self._chunk(b"IDAT", zlib.compress(body)) \
                   + self._chunk(b"IEND", b"")

    def test_palette_4bit_with_filters(self):
        """5x3 4-bit palette, odd width (pad nibble trimmed), rows
        exercising None/Sub/Up filters at bpp=1 on PACKED bytes."""
        plte = bytes(v for i in range(16) for v in (i, 2 * i, 3 * i))
        # row0 idx [0,1,2,3,4] -> 0x01 0x23 0x40
        # row1 idx [5,6,7,8,9] -> 0x56 0x78 0x90 (Sub deltas)
        # row2 idx [10..14]    -> 0xAB 0xCD 0xE0 (Up deltas)
        blob = self._png(5, 3, [
            (0, [0x01, 0x23, 0x40]),
            (1, [0x56, 0x22, 0x18]),
            (2, [0x55, 0x55, 0x50]),
        ], 4, 3, plte=plte)
        got = decode_png(blob)
        assert got.shape == (3, 5, 3)
        idx = np.array([[0, 1, 2, 3, 4], [5, 6, 7, 8, 9],
                        [10, 11, 12, 13, 14]])
        want = np.stack([idx, 2 * idx, 3 * idx], axis=-1).astype(np.uint8)
        assert np.array_equal(got, want)

    def test_palette_1bit_and_2bit_with_trns(self):
        # 1-bit: w=10 -> stride 2, second byte has 6 pad bits
        plte1 = bytes([0, 0, 0, 255, 255, 255])
        blob = self._png(10, 2, [
            (0, [0b10101010, 0b10000000]),
            (0, [0xFF, 0xC0]),
        ], 1, 3, plte=plte1, trns=bytes([128]))  # index0 alpha=128
        got = decode_png(blob)
        assert got.shape == (2, 10, 4)
        idx = np.array([[1, 0] * 5, [1] * 10])
        assert np.array_equal(got[..., 0], (idx * 255).astype(np.uint8))
        assert np.array_equal(
            got[..., 3], np.where(idx == 0, 128, 255).astype(np.uint8)
        )
        # 2-bit: w=5 samples [0,1,2,3,0] -> bits 00 01 10 11 00 (+pad)
        plte2 = bytes(v for i in range(4) for v in (i * 10, i, 0))
        blob = self._png(5, 1, [(0, [0b00011011, 0b00000000])],
                         2, 3, plte=plte2)
        got = decode_png(blob)
        assert got.shape == (1, 5, 3)
        assert np.array_equal(
            got[0, :, 0], np.array([0, 10, 20, 30, 0], np.uint8)
        )

    def test_grey_low_bit_scaling(self):
        """1/2/4-bit greyscale scales to 8-bit by exact replication
        factors 255/85/17; pad bits trimmed at odd widths."""
        blob = self._png(10, 2, [
            (0, [0b10101010, 0b10000000]),
            (0, [0xFF, 0xC0]),
        ], 1, 0)
        got = decode_png(blob)
        assert got.shape == (2, 10)
        assert np.array_equal(got[0], np.array([255, 0] * 5, np.uint8))
        assert (got[1] == 255).all()
        blob = self._png(5, 1, [(0, [0b00011011, 0b00000000])], 2, 0)
        assert np.array_equal(
            decode_png(blob)[0], np.array([0, 85, 170, 255, 0], np.uint8)
        )
        blob = self._png(3, 1, [(0, [0x0F, 0x50])], 4, 0)
        assert np.array_equal(
            decode_png(blob)[0], np.array([0, 255, 85], np.uint8)
        )

    def test_rgb16_and_rgba16(self):
        px = [(0x0102, 0x0304, 0x0506), (0xFFFF, 0x0000, 0x8000)]
        row = b"".join(struct.pack(">HHH", *p) for p in px)
        blob = self._png(2, 1, [(0, row)], 16, 2)
        got = decode_png(blob)
        assert got.dtype == np.uint16 and got.shape == (1, 2, 3)
        assert np.array_equal(got[0], np.array(px, np.uint16))
        # RGBA16 with an Up-filtered second row (identical rows)
        pxa = [(1000, 2000, 3000, 65535), (40000, 50000, 60000, 0)]
        row = b"".join(struct.pack(">HHHH", *p) for p in pxa)
        blob = self._png(2, 2, [(0, row), (2, bytes(len(row)))], 16, 6)
        got = decode_png(blob)
        assert got.dtype == np.uint16 and got.shape == (2, 2, 4)
        assert np.array_equal(got[0], got[1])
        assert np.array_equal(got[0], np.array(pxa, np.uint16))

    def test_grey_alpha_16(self):
        pxa = [(256, 65535), (513, 0)]
        row = b"".join(struct.pack(">HH", *p) for p in pxa)
        blob = self._png(2, 1, [(0, row)], 16, 4)
        got = decode_png(blob)
        assert got.dtype == np.uint16 and got.shape == (1, 2, 2)
        assert np.array_equal(got[0], np.array(pxa, np.uint16))

    def test_trns_colour_key_grey_and_rgb(self):
        # 8-bit grey, key=20: alpha 0 exactly where sample == 20
        blob = self._png(3, 1, [(0, [10, 20, 30])], 8, 0,
                         trns=struct.pack(">H", 20))
        got = decode_png(blob)
        assert got.shape == (1, 3, 2)
        assert np.array_equal(got[0, :, 0], np.array([10, 20, 30], np.uint8))
        assert np.array_equal(got[0, :, 1], np.array([255, 0, 255], np.uint8))
        # 16-bit RGB, key matches second pixel
        px = [(0x0102, 0x0304, 0x0506), (0xFFFF, 0x0000, 0x8000)]
        row = b"".join(struct.pack(">HHH", *p) for p in px)
        blob = self._png(2, 1, [(0, row)], 16, 2,
                         trns=struct.pack(">HHH", 0xFFFF, 0, 0x8000))
        got = decode_png(blob)
        assert got.shape == (1, 2, 4) and got.dtype == np.uint16
        assert np.array_equal(
            got[0, :, 3], np.array([65535, 0], np.uint16)
        )
        # low-bit grey with key: keyed at RAW sample depth, then scaled
        blob = self._png(5, 1, [(0, [0b00011011, 0b00000000])], 2, 0,
                         trns=struct.pack(">H", 2))
        got = decode_png(blob)
        assert np.array_equal(
            got[0, :, 0], np.array([0, 85, 170, 255, 0], np.uint8)
        )
        assert np.array_equal(
            got[0, :, 1], np.array([255, 255, 0, 255, 255], np.uint8)
        )

    def test_trns_bad_length_raises(self):
        blob = self._png(3, 1, [(0, [10, 20, 30])], 8, 0,
                         trns=struct.pack(">HH", 20, 30))
        with pytest.raises(ValueError, match="tRNS length"):
            decode_png(blob)

    def test_adam7_palette_4bit(self):
        """Interlaced low-bit palette: per-pass strides are
        ceil(ws*4/8) with per-row pad bits."""
        rng = np.random.default_rng(5)
        idx = rng.integers(0, 16, (4, 5), dtype=np.uint8)
        plte = bytes(v for i in range(16) for v in (i, 255 - i, i * 9))
        body = bytearray()
        for x0, y0, dx, dy in (
            (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
            (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
        ):
            sub = idx[y0::dy, x0::dx]
            if sub.shape[0] == 0 or sub.shape[1] == 0:
                continue
            for r in range(sub.shape[0]):
                body += b"\x00" + self._pack_bits(sub[r], 4)
        ihdr = struct.pack(">IIBBBBB", 5, 4, 4, 3, 0, 0, 1)
        blob = (
            b"\x89PNG\r\n\x1a\n" + self._chunk(b"IHDR", ihdr)
            + self._chunk(b"PLTE", plte)
            + self._chunk(b"IDAT", zlib.compress(bytes(body)))
            + self._chunk(b"IEND", b"")
        )
        got = decode_png(blob)
        assert got.shape == (4, 5, 3)
        pal = np.frombuffer(plte, np.uint8).reshape(16, 3)
        assert np.array_equal(got, pal[idx])

    def test_adam7_rgb16(self):
        """Interlaced 16-bit RGB: bpp=6 filtering and >u2 parse per
        pass."""
        rng = np.random.default_rng(9)
        img = rng.integers(0, 65536, (5, 4, 3), dtype=np.uint16)
        body = bytearray()
        for x0, y0, dx, dy in (
            (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
            (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
        ):
            sub = img[y0::dy, x0::dx]
            if sub.shape[0] == 0 or sub.shape[1] == 0:
                continue
            for r in range(sub.shape[0]):
                body += b"\x00" + np.ascontiguousarray(
                    sub[r]).astype(">u2").tobytes()
        ihdr = struct.pack(">IIBBBBB", 4, 5, 16, 2, 0, 0, 1)
        blob = (
            b"\x89PNG\r\n\x1a\n" + self._chunk(b"IHDR", ihdr)
            + self._chunk(b"IDAT", zlib.compress(bytes(body)))
            + self._chunk(b"IEND", b"")
        )
        got = decode_png(blob)
        assert got.dtype == np.uint16
        assert np.array_equal(got, img)

    def test_still_rejected_variants(self):
        """Combinations outside the spec-supported matrix still raise
        the documented NotImplementedError (no silent garbage)."""
        for ct, bd in ((2, 4), (6, 4), (3, 16), (4, 1)):
            ihdr = struct.pack(">IIBBBBB", 2, 1, bd, ct, 0, 0, 0)
            blob = (
                b"\x89PNG\r\n\x1a\n" + self._chunk(b"IHDR", ihdr)
                + self._chunk(b"IDAT", zlib.compress(b"\x00\x00\x00"))
                + self._chunk(b"IEND", b"")
            )
            with pytest.raises(NotImplementedError):
                decode_png(blob)


class TestPngThroughOperators:
    def test_tile_images_png_equals_raw8(self, spark):
        """tile_images over PNG payloads is row-identical to the raw8
        path on the same pixels (the golden 'driven through' gate)."""
        from h3ronpy_spark.operators.tiling import tile_images
        from h3ronpy_spark.sources.images import (
            synth_images,
            unregister_codec,
        )
        from h3ronpy_spark.sources.png import register_png_codec

        register_png_codec()
        try:
            raw = synth_images(spark, 40, seed=42, partitions=2)
            png = _png_images(spark, 40, seed=42)
            t_raw = sorted(map(tuple, tile_images(raw, res=11).collect()))
            t_png = sorted(map(tuple, tile_images(png, res=11).collect()))
            assert t_raw == t_png and t_raw
        finally:
            unregister_codec("png")

    def test_resize_and_features_png_equals_raw8(self, spark):
        from h3ronpy_spark.operators.multimodal import (
            extract_image_features,
            resize_images,
        )
        from h3ronpy_spark.sources.images import (
            synth_images,
            unregister_codec,
        )
        from h3ronpy_spark.sources.png import register_png_codec

        register_png_codec()
        try:
            raw = synth_images(spark, 24, seed=7, partitions=2)
            png = _png_images(spark, 24, seed=7)
            f_raw = sorted(
                map(tuple, extract_image_features(raw).collect())
            )
            f_png = sorted(
                map(tuple, extract_image_features(png).collect())
            )
            assert f_raw == f_png and f_raw
            r_raw = sorted(
                map(
                    tuple,
                    resize_images(raw, 8, 8).select(
                        "image_id", "bytes"
                    ).collect(),
                )
            )
            r_png = sorted(
                map(
                    tuple,
                    resize_images(png, 8, 8).select(
                        "image_id", "bytes"
                    ).collect(),
                )
            )
            assert r_raw == r_png and r_raw
        finally:
            unregister_codec("png")


class TestFlagshipPng:
    def test_flagship_png_rollup_identical(self, spark):
        """flagship(fmt='png') must be row-identical to raw8 — same
        pixels, only the payload encoding differs (the bench png
        section's correctness premise)."""
        from h3ronpy_spark.plans.flagship import flagship
        from h3ronpy_spark.sources.images import unregister_codec

        try:
            a = sorted(
                map(
                    tuple,
                    flagship(spark, 400, n_polygons=8, res=9).collect(),
                )
            )
            b = sorted(
                map(
                    tuple,
                    flagship(spark, 400, n_polygons=8, res=9, fmt="png")
                    .collect(),
                )
            )
            assert a == b and a
            with pytest.raises(ValueError, match="fmt"):
                flagship(spark, 10, fmt="webp")
        finally:
            unregister_codec("png")
