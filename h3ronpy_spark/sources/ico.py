"""Pure-Python ICO (favicon) container reader.

Web-scrape corpora are full of favicons.  ICO is a container: each
directory entry is either an embedded PNG (modern) or a headerless
DIB — a BITMAPINFOHEADER whose biHeight covers BOTH the XOR (color)
image and the 1-bit AND (transparency) mask stacked vertically.
This reader picks the best entry (largest area, then highest bit
depth), dispatches PNGs to sources.png, and decodes classic DIB
entries (8/24/32 bpp BI_RGB) with the AND mask applied as alpha.

encode_ico wraps pixels as a single PNG entry (the modern form) for
roundtrip tests and synthetic corpora.
"""

from __future__ import annotations

import struct

import numpy as np

from .png import decode_png, encode_png

__all__ = ["decode_ico", "encode_ico", "ico_codec", "register_ico_codec"]


def _decode_dib_entry(data: bytes) -> np.ndarray:
    (hdr_size,) = struct.unpack("<I", data[:4])
    if hdr_size < 40:
        raise NotImplementedError("ICO: BITMAPCOREHEADER entry")
    w, h2 = struct.unpack("<ii", data[4:12])
    _planes, bpp = struct.unpack("<HH", data[12:16])
    (compression,) = struct.unpack("<I", data[16:20])
    (clr_used,) = struct.unpack("<I", data[32:36])
    if compression != 0:
        raise NotImplementedError(
            f"ICO: compressed DIB ({compression}) unsupported"
        )
    if bpp not in (8, 24, 32):
        raise NotImplementedError(f"ICO: {bpp}-bpp DIB unsupported")
    h = abs(h2) // 2  # biHeight counts XOR + AND mask
    pos = hdr_size
    pal = None
    if bpp == 8:
        n_colors = clr_used or 256
        pal = np.frombuffer(
            data, np.uint8, count=4 * n_colors, offset=pos
        ).reshape(-1, 4)[:, [2, 1, 0]]
        pos += 4 * n_colors

    xor_row = (w * bpp // 8 + 3) & ~3
    xor = np.frombuffer(
        data, np.uint8, count=h * xor_row, offset=pos
    ).reshape(h, xor_row)[::-1]  # bottom-up
    pos += h * xor_row
    and_row = ((w + 31) // 32) * 4
    have_mask = pos + h * and_row <= len(data)
    if have_mask:
        mask_bytes = np.frombuffer(
            data, np.uint8, count=h * and_row, offset=pos
        ).reshape(h, and_row)[::-1]
        mask_bits = np.unpackbits(mask_bytes, axis=1)[:, :w]
        alpha = np.where(mask_bits == 1, 0, 255).astype(np.uint8)
    else:
        alpha = np.full((h, w), 255, np.uint8)

    if bpp == 8:
        rgb = pal[np.minimum(xor[:, :w], len(pal) - 1)]
    else:
        ch = bpp // 8
        a = xor[:, : w * ch].reshape(h, w, ch)
        if ch == 3:
            rgb = a[..., [2, 1, 0]]
        else:
            rgba = a[..., [2, 1, 0, 3]]
            # 32bpp icons carry real alpha; legacy ones write zeros
            # there and rely on the AND mask
            if rgba[..., 3].any():
                return np.ascontiguousarray(rgba)
            rgb = rgba[..., :3]
    return np.ascontiguousarray(np.dstack([rgb, alpha]))


def decode_ico(blob: bytes) -> np.ndarray:
    """Decode the best (largest, then deepest) image of an ICO.
    Returns (h, w, 4) RGBA for DIB entries (AND-mask alpha) and
    whatever decode_png returns for PNG entries."""
    if len(blob) < 6:
        raise ValueError("not an ICO: truncated header")
    reserved, typ, count = struct.unpack("<HHH", blob[:6])
    if reserved != 0 or typ not in (1, 2) or count == 0:
        raise ValueError("not an ICO: bad ICONDIR")
    best = None
    for i in range(count):
        off = 6 + 16 * i
        bw, bh, _bc, _r, _planes, bits, size, data_off = struct.unpack(
            "<BBBBHHII", blob[off : off + 16]
        )
        w = bw or 256
        h = bh or 256
        key = (w * h, bits)
        if best is None or key > best[0]:
            best = (key, data_off, size)
    _, data_off, size = best
    data = blob[data_off : data_off + size]
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        return decode_png(data)
    return _decode_dib_entry(data)


def encode_ico(arr: np.ndarray) -> bytes:
    """Wrap pixels as a single PNG-entry ICO (the modern favicon
    form).  Dimensions above 256 are not representable in ICONDIR."""
    arr = np.asarray(arr)
    h, w = arr.shape[:2]
    if w > 256 or h > 256:
        raise ValueError("ICO entries are limited to 256x256")
    png = encode_png(arr)
    entry = struct.pack(
        "<BBBBHHII", w % 256, h % 256, 0, 0, 1, 32, len(png), 6 + 16
    )
    return struct.pack("<HHH", 0, 1, 1) + entry + png


def ico_codec(blob: bytes, w: int, h: int, fmt: str) -> np.ndarray:
    a = decode_ico(blob)
    if a.shape[:2] != (int(h), int(w)):
        raise ValueError(
            f"ICO geometry mismatch: decoded {a.shape[:2]}, "
            f"metadata says {(int(h), int(w))}"
        )
    return a


def register_ico_codec() -> None:
    from .images import register_codec

    register_codec("ico", ico_codec)
