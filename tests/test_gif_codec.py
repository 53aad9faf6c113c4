"""GIF codec: hand-built byte-level goldens + encoder roundtrips.

The 2x2 golden stream below is built by hand at the GIF89a/LZW bit
level (independent of this codec's own encoder) so the decoder is
pinned against the spec, not against itself.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from h3ronpy_spark.sources.gif import (
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    encode_gif,
    gif_codec,
)
from h3ronpy_spark.sources.images import decode_image_with


@pytest.fixture(scope="module")
def spark():
    from h3ronpy_spark.session import get_spark

    s = get_spark(
        "local[4]", app_name="h3spark_gif_tests", shuffle_partitions=4
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


def _hand_built_2x2() -> bytes:
    """2x2, 4-entry palette, pixels [[0,1],[2,1]].

    LZW min code size 2: clear=4, eoi=5, width starts at 3, LSB-first.
    Code sequence CLEAR 0 1 2 1 EOI.  Table growth: code 1 appends
    entry 6, code 2 appends entry 7 -> table size 8 == 2^3, so the
    LAST data code and EOI are read at width 4 (standard GIF width
    schedule).  Hand-packed LSB-first:
      (4,3): acc=4 n=3; (0,3): acc=4 n=6; (1,3): acc=4|1<<6=0x44 n=9
        -> byte0=0x44, acc=0 n=1
      (2,3): acc=2<<1=4 n=4; (1,4): acc=4|1<<4=0x14 n=8
        -> byte1=0x14, acc=0 n=0
      (5,4): acc=5 n=4 -> final byte2=0x05
    """
    gct = bytes(
        [10, 10, 10, 20, 20, 20, 30, 30, 30, 40, 40, 40]
    )  # greyscale 4-entry
    return (
        b"GIF89a"
        + struct.pack("<HHBBB", 2, 2, 0x80 | 0x01, 0, 0)  # GCT, 4 entries
        + gct
        + b"\x2c"
        + struct.pack("<HHHHB", 0, 0, 2, 2, 0)
        + bytes([2])  # min code size
        + bytes([3, 0x44, 0x14, 0x05])  # one sub-block of 3 bytes
        + b"\x00\x3b"
    )


class TestHandBuilt:
    def test_golden_2x2(self):
        got = decode_gif(_hand_built_2x2())
        # greyscale palette -> single band of palette values
        assert got.shape == (2, 2)
        assert got.tolist() == [[10, 20], [30, 20]]

    def test_gif87a_accepted(self):
        blob = b"GIF87a" + _hand_built_2x2()[6:]
        assert decode_gif(blob).tolist() == [[10, 20], [30, 20]]

    def test_bad_signature(self):
        with pytest.raises(ValueError, match="signature"):
            decode_gif(b"NOTGIF" + _hand_built_2x2()[6:])

    def test_color_palette_gives_rgb(self):
        blob = bytearray(_hand_built_2x2())
        blob[13 + 4] = 99  # entry 1 green channel: no longer greyscale
        got = decode_gif(bytes(blob))
        assert got.shape == (2, 2, 3)
        assert got[0, 1].tolist() == [20, 99, 20]

    def test_transparency_gce(self):
        core = _hand_built_2x2()
        gce = b"\x21\xf9\x04" + bytes([0x01, 0, 0, 1]) + b"\x00"
        blob = core[:25] + gce + core[25:]  # after GCT, before descriptor
        got = decode_gif(blob)
        assert got.shape == (2, 2, 4)
        assert got[0, 1, 3] == 0 and got[0, 0, 3] == 255
        assert got[0, 0, :3].tolist() == [10, 10, 10]

    def test_lzw_underrun_raises(self):
        core = _hand_built_2x2()
        # replace the 3-byte data sub-block with a 1-byte one: the
        # stream ends mid-scan, well short of 4 pixels
        blob = core[:-6] + bytes([1, 0x44]) + b"\x00\x3b"
        with pytest.raises(ValueError, match="underrun"):
            decode_gif(blob)


class TestLzw:
    def test_roundtrip_simple(self):
        idx = np.array([0, 1, 2, 1, 0, 0, 1, 2] * 10, np.uint8)
        assert (
            _lzw_decode(_lzw_encode(idx, 2), 2, len(idx)) == idx
        ).all()

    def test_cscsc_pattern(self):
        """The code==len(table) special case (KwKwK)."""
        idx = np.array([1, 1, 1, 1, 1, 1, 1], np.uint8)
        assert (
            _lzw_decode(_lzw_encode(idx, 2), 2, len(idx)) == idx
        ).all()

    def test_width_growth_past_8bit(self):
        """Enough distinct pairs to push codes past 2^9 (width growth)."""
        rng = np.random.default_rng(7)
        idx = rng.integers(0, 256, 5000).astype(np.uint8)
        assert (
            _lzw_decode(_lzw_encode(idx, 8), 8, len(idx)) == idx
        ).all()

    def test_table_overflow_clear(self):
        """> 4096 table entries forces a mid-stream CLEAR."""
        rng = np.random.default_rng(11)
        idx = rng.integers(0, 256, 30000).astype(np.uint8)
        assert (
            _lzw_decode(_lzw_encode(idx, 8), 8, len(idx)) == idx
        ).all()


class TestRoundtrip:
    @given(
        st.integers(1, 40),
        st.integers(1, 40),
        st.booleans(),
        st.integers(0, 2**32 - 1),
    )
    @settings(max_examples=25, deadline=None)
    def test_grey_roundtrip(self, h, w, interlace, seed):
        rng = np.random.default_rng(seed)
        px = rng.integers(0, 256, (h, w)).astype(np.uint8)
        got = decode_gif(encode_gif(px, interlace=interlace))
        assert got.shape == (h, w)
        assert (got == px).all()

    def test_rgb_roundtrip_exact_palette(self):
        rng = np.random.default_rng(3)
        palette = rng.integers(0, 256, (17, 3)).astype(np.uint8)
        # ensure not all-greyscale so output stays 3-channel
        palette[0] = [1, 2, 3]
        idx = rng.integers(0, 17, (23, 31))
        px = palette[idx]
        got = decode_gif(encode_gif(px))
        assert got.shape == (23, 31, 3)
        assert (got == px).all()

    def test_rgb_too_many_colors(self):
        rng = np.random.default_rng(5)
        px = rng.integers(0, 256, (32, 32, 3)).astype(np.uint8)
        assert len(np.unique(px.reshape(-1, 3), axis=0)) > 256
        with pytest.raises(ValueError, match="distinct colors"):
            encode_gif(px)

    def test_transparency_roundtrip(self):
        px = np.array([[0, 7], [9, 0]], np.uint8)
        got = decode_gif(encode_gif(px, transparent_idx=0))
        assert got.shape == (2, 2, 4)
        assert (got[..., 3] == np.where(px == 0, 0, 255)).all()
        assert (got[..., 0] == px).all()

    def test_interlace_tall(self):
        """Interlace pass structure is only exercised with h > 8."""
        rng = np.random.default_rng(9)
        px = rng.integers(0, 256, (37, 5)).astype(np.uint8)
        assert (decode_gif(encode_gif(px, interlace=True)) == px).all()

    def test_subblock_splitting(self):
        """> 255 bytes of LZW output must split into sub-blocks."""
        rng = np.random.default_rng(13)
        px = rng.integers(0, 256, (64, 64)).astype(np.uint8)
        blob = encode_gif(px)
        assert len(blob) > 300
        assert (decode_gif(blob) == px).all()


class TestRegistrySeam:
    def test_codec_adapter(self):
        px = np.arange(64, dtype=np.uint8).reshape(8, 8)
        blob = encode_gif(px)
        got = decode_image_with(
            {"gif": gif_codec}, blob, 8, 8, "gif"
        )
        assert (got == px).all()

    def test_geometry_mismatch(self):
        px = np.zeros((8, 8), np.uint8)
        with pytest.raises(ValueError, match="geometry"):
            gif_codec(encode_gif(px), 4, 4, "gif")


class TestFrameComposition:
    def test_offset_subframe_on_background(self):
        """A 1x1 frame at (1,1) inside a 3x3 screen: rest is bg index."""
        core = _hand_built_2x2()
        gct = core[13:25]
        blob = (
            b"GIF89a"
            + struct.pack("<HHBBB", 3, 3, 0x80 | 0x01, 3, 0)  # bg idx 3
            + gct
            + b"\x2c"
            + struct.pack("<HHHHB", 1, 1, 1, 1, 0)
            # 1 pixel, value 2: CLEAR(100) 2(010) EOI(101) LSB-first:
            # acc=4 n=3; 2<<3 -> acc=0x14 n=6; 5<<6 -> acc=0x154 n=9
            # byte0=0x54, byte1=0x01
            + bytes([2, 2, 0x54, 0x01])
            + b"\x00\x3b"
        )
        got = decode_gif(blob)
        assert got.shape == (3, 3)
        assert got[1, 1] == 30  # palette entry 2
        assert got[0, 0] == 40  # bg index 3 -> palette entry 3

    def test_local_color_table_overrides_global(self):
        core = _hand_built_2x2()
        lct = bytes([100, 100, 100, 110, 110, 110,
                     120, 120, 120, 130, 130, 130])
        # rebuild descriptor with LCT flag + 4-entry table
        blob = (
            core[:25]
            + b"\x2c"
            + struct.pack("<HHHHB", 0, 0, 2, 2, 0x80 | 0x01)
            + lct
            + core[35:]  # min-code-size byte onward
        )
        got = decode_gif(blob)
        assert got.tolist() == [[100, 110], [120, 110]]


class TestSparkSeam:
    def test_gif_through_resize_and_features(self, spark):
        """GIF registered on the driver flows through executor-side
        resize + feature extraction like any other registry codec."""
        from h3ronpy_spark.operators.multimodal import (
            extract_image_features,
            resize_images,
        )
        from h3ronpy_spark.sources.gif import register_gif_codec
        from h3ronpy_spark.sources.images import unregister_codec

        band = (np.arange(64, dtype=np.uint8).reshape(8, 8) * 3) % 251
        blob = encode_gif(band)
        register_gif_codec()
        try:
            imgs = spark.createDataFrame(
                [("img0", blob, 8, 8, "gif", "cap", 1)],
                "image_id string, bytes binary, w int, h int, fmt string, "
                "caption string, phash long",
            )
            resized = resize_images(imgs, 4, 4, method="nearest").first()
            got = np.frombuffer(
                bytes(resized["bytes"]), dtype=np.uint8
            ).reshape(4, 4)
            assert (got == band[::2, ::2]).all()
            feats = extract_image_features(imgs).first()
            assert abs(feats["embedding"][0] - band.mean()) < 1e-4
        finally:
            unregister_codec("gif")


class TestAnimation:
    def test_multi_frame_roundtrip(self):
        from h3ronpy_spark.sources.gif import (
            decode_gif_frames,
            encode_gif_animation,
        )

        rng = np.random.default_rng(19)
        frames = [
            rng.integers(0, 256, (6, 9)).astype(np.uint8)
            for _ in range(5)
        ]
        got = decode_gif_frames(encode_gif_animation(frames))
        assert len(got) == 5
        for f, g in zip(frames, got):
            assert g.shape == (6, 9, 3)
            assert (g[..., 0] == f).all() and (g[..., 1] == f).all()

    def test_sampling_every_n_and_cap(self):
        from h3ronpy_spark.sources.gif import (
            decode_gif_frames,
            encode_gif_animation,
        )

        frames = [
            np.full((2, 2), 10 * i, np.uint8) for i in range(1, 9)
        ]
        blob = encode_gif_animation(frames)
        every3 = decode_gif_frames(blob, every_n=3)
        assert [int(f[0, 0, 0]) for f in every3] == [10, 40, 70]
        capped = decode_gif_frames(blob, max_frames=2)
        assert len(capped) == 2

    def test_transparency_composes_over_previous(self):
        """Frame 2's transparent pixels must show frame 1's canvas."""
        from h3ronpy_spark.sources.gif import (
            decode_gif_frames,
            encode_gif_animation,
        )

        f1 = np.full((2, 2), 50, np.uint8)
        f2 = np.array([[0, 60], [60, 0]], np.uint8)  # 0 = transparent
        got = decode_gif_frames(
            encode_gif_animation([f1, f2], transparent_idx=0)
        )
        assert (got[0][..., 0] == 50).all()
        assert got[1][..., 0].tolist() == [[50, 60], [60, 50]]

    def test_disposal_2_restores_background(self):
        """Disposal 2 clears the frame rect to background before the
        next frame; a fully-transparent next frame then shows bg."""
        from h3ronpy_spark.sources.gif import (
            decode_gif_frames,
            encode_gif_animation,
        )

        f1 = np.full((2, 2), 70, np.uint8)
        f2 = np.zeros((2, 2), np.uint8)  # fully transparent (idx 0)
        blob = encode_gif_animation(
            [f1, f2], transparent_idx=0, disposals=[2, 0]
        )
        got = decode_gif_frames(blob)
        assert (got[0][..., 0] == 70).all()
        # bg index 0 -> palette grey 0
        assert (got[1][..., 0] == 0).all()

    def test_disposal_3_restores_previous(self):
        from h3ronpy_spark.sources.gif import (
            decode_gif_frames,
            encode_gif_animation,
        )

        f1 = np.full((2, 2), 40, np.uint8)
        f2 = np.full((2, 2), 90, np.uint8)
        f3 = np.zeros((2, 2), np.uint8)  # transparent: shows canvas
        blob = encode_gif_animation(
            [f1, f2, f3], transparent_idx=0, disposals=[0, 3, 0]
        )
        got = decode_gif_frames(blob)
        assert (got[1][..., 0] == 90).all()
        # disposal 3 on frame 2 restored frame 1's canvas before f3
        assert (got[2][..., 0] == 40).all()

    def test_first_frame_matches_decode_gif(self):
        from h3ronpy_spark.sources.gif import (
            decode_gif_frames,
            encode_gif_animation,
        )

        rng = np.random.default_rng(23)
        f = rng.integers(0, 256, (5, 5)).astype(np.uint8)
        frames = decode_gif_frames(encode_gif_animation([f]))
        single = decode_gif(encode_gif(f))
        assert (frames[0][..., 0] == single).all()
