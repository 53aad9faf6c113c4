"""Cross-codec invariants: every LOSSLESS image codec in the registry
must roundtrip the same pixels to the same array — a single property
sweep across png/gif/bmp/tiff so a regression in any one codec's
geometry/orientation/channel order shows up as disagreement with the
other three.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from h3ronpy_spark.sources.bmp import decode_bmp, encode_bmp
from h3ronpy_spark.sources.geotiff import read_geotiff, write_geotiff
from h3ronpy_spark.sources.gif import decode_gif, encode_gif
from h3ronpy_spark.sources.png import decode_png, encode_png

_LOSSLESS_GREY = {
    "png": (encode_png, decode_png),
    "gif": (encode_gif, decode_gif),
    "bmp": (encode_bmp, decode_bmp),
    "tiff": (write_geotiff, lambda b: read_geotiff(b).band),
}


@given(
    st.integers(1, 33),
    st.integers(1, 33),
    st.integers(0, 2**32 - 1),
)
@settings(max_examples=30, deadline=None)
def test_grey_roundtrip_agreement(h, w, seed):
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, (h, w)).astype(np.uint8)
    outs = {}
    for name, (enc, dec) in _LOSSLESS_GREY.items():
        got = dec(enc(px))
        assert got.shape == (h, w), name
        assert got.dtype == np.uint8, name
        outs[name] = got
    ref = outs["png"]
    for name, got in outs.items():
        assert (got == ref).all(), f"{name} disagrees with png"
        assert (got == px).all(), f"{name} not lossless"


@given(st.integers(0, 2**32 - 1))
@settings(max_examples=10, deadline=None)
def test_rgb_roundtrip_agreement(seed):
    rng = np.random.default_rng(seed)
    # <=256 distinct colors so GIF's exact-palette encoder qualifies
    palette = rng.integers(0, 256, (31, 3)).astype(np.uint8)
    px = palette[rng.integers(0, 31, (17, 13))]
    for name, enc, dec in (
        ("png", encode_png, decode_png),
        ("gif", encode_gif, decode_gif),
        ("bmp", encode_bmp, decode_bmp),
        ("tiff", write_geotiff, lambda b: read_geotiff(b).band),
    ):
        got = dec(enc(px))
        # gif may legally return (h, w) if the random palette happens
        # to be all-grey; with 31 random colors that is (1/65536)^31 —
        # treat any 2-dim return as failure
        assert got.shape == px.shape, name
        assert (got == px).all(), f"{name} not lossless for RGB"


def test_multi_ifd_tiff_reads_first():
    """GDAL writes overviews as later IFDs; the reader must return the
    first (full-resolution) image and ignore the rest."""
    import struct

    full = np.arange(24, dtype=np.uint8).reshape(4, 6)
    t1 = write_geotiff(full)
    # graft a second IFD: point the first IFD's next-IFD offset at a
    # copy of the IFD appended at the end (dims swapped as a marker)
    e = "<"
    (ifd_off,) = struct.unpack(e + "I", t1[4:8])
    (n,) = struct.unpack(e + "H", t1[ifd_off : ifd_off + 2])
    next_ptr_pos = ifd_off + 2 + 12 * n
    second_ifd_off = len(t1)
    # second IFD: minimal junk that would CRASH if parsed for data
    second = struct.pack(e + "H", 1)
    second += struct.pack(e + "HHI", 256, 3, 1) + struct.pack(e + "I", 2)
    second += struct.pack(e + "I", 0)
    blob = (
        t1[:next_ptr_pos]
        + struct.pack(e + "I", second_ifd_off)
        + t1[next_ptr_pos + 4 :]
        + second
    )
    ds = read_geotiff(blob)
    assert (ds.band == full).all()
