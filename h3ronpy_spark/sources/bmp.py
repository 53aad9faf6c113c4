"""Pure-Python BMP codec (stdlib + numpy only) for the codec registry.

Round-7 codec breadth: BMP still appears in scraped web corpora
(legacy content, uncompressed exports).  Uncompressed BI_RGB only —
8-bit paletted, 24-bit BGR, and 32-bit BGRA, top-down or bottom-up row
order, 4-byte row padding.  RLE4/RLE8 and bitfield formats raise, like
every other exotic variant behind the registry seam (images.py).

Output follows the png.py shape conventions: (h, w) for a greyscale
palette, (h, w, 3) for color, (h, w, 4) when an alpha channel exists.
Rows are vectorized: the whole pixel array is one reshape/stride view
of the decoded buffer — no per-pixel Python.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_bmp", "encode_bmp", "bmp_codec", "register_bmp_codec"]


def _decode_rle8(data: bytes, w: int, h: int) -> np.ndarray:
    """BI_RLE8: (count, value) runs; count==0 escapes: 0 end-of-line,
    1 end-of-bitmap, 2 delta (dx, dy — skipped pixels stay 0), else an
    absolute run of N literal bytes padded to a word boundary.  Rows
    are stored bottom-up (caller flips)."""
    out = np.zeros((h, w), np.uint8)
    x = y = 0
    pos = 0
    n = len(data)
    while pos + 1 < n and y < h:
        cnt, val = data[pos], data[pos + 1]
        pos += 2
        if cnt > 0:  # encoded run
            end = min(x + cnt, w)
            out[y, x:end] = val
            x = end
        elif val == 0:  # end of line
            x, y = 0, y + 1
        elif val == 1:  # end of bitmap
            break
        elif val == 2:  # delta
            if pos + 2 > n:
                break
            x = min(x + data[pos], w)
            y += data[pos + 1]
            pos += 2
        else:  # absolute run of `val` literals, word-padded
            run = data[pos : pos + val]
            end = min(x + val, w)
            out[y, x:end] = np.frombuffer(
                run[: end - x], np.uint8
            )
            x = end
            pos += val + (val & 1)
    return out


def decode_bmp(blob: bytes) -> np.ndarray:
    if blob[:2] != b"BM":
        raise ValueError("not a BMP: bad signature")
    (data_off,) = struct.unpack("<I", blob[10:14])
    (hdr_size,) = struct.unpack("<I", blob[14:18])
    if hdr_size < 40:
        raise NotImplementedError("BITMAPCOREHEADER BMP unsupported")
    w, h_raw = struct.unpack("<ii", blob[18:26])
    planes, bpp = struct.unpack("<HH", blob[26:30])
    (compression,) = struct.unpack("<I", blob[30:34])
    (clr_used,) = struct.unpack("<I", blob[46:50])
    if compression not in (0, 1, 3):
        raise NotImplementedError(
            f"BMP compression {compression} unsupported "
            "(BI_RGB/BI_RLE8 only)"
        )
    if compression == 3 and bpp not in (32,):
        raise NotImplementedError("BI_BITFIELDS only handled at 32bpp")
    if compression == 1 and bpp != 8:
        raise NotImplementedError("BI_RLE8 requires 8 bpp")
    top_down = h_raw < 0
    h = abs(h_raw)
    if bpp not in (8, 24, 32):
        raise NotImplementedError(f"{bpp}-bpp BMP unsupported")

    if compression == 1:
        px = _decode_rle8(blob[data_off:], w, h)
        # RLE bitmaps are always bottom-up
        px = px[::-1]
    else:
        row_bytes = (w * bpp // 8 + 3) & ~3
        px = np.frombuffer(
            blob, np.uint8, count=h * row_bytes, offset=data_off
        ).reshape(h, row_bytes)
        if not top_down:
            px = px[::-1]

    if bpp == 8:
        n_colors = clr_used or 256
        pal = np.frombuffer(
            blob, np.uint8, count=4 * n_colors, offset=14 + hdr_size
        ).reshape(-1, 4)[:, [2, 1, 0]]  # BGRA quads -> RGB
        idx = px[:, :w]
        if (pal[:, 0] == pal[:, 1]).all() and (
            pal[:, 1] == pal[:, 2]
        ).all():
            return np.ascontiguousarray(pal[idx][..., 0])
        return np.ascontiguousarray(pal[np.minimum(idx, n_colors - 1)])
    ch = bpp // 8
    a = px[:, : w * ch].reshape(h, w, ch)
    if ch == 3:
        return np.ascontiguousarray(a[..., [2, 1, 0]])  # BGR -> RGB
    return np.ascontiguousarray(a[..., [2, 1, 0, 3]])  # BGRA -> RGBA


def encode_bmp(arr: np.ndarray) -> bytes:
    """(h, w) uint8 -> 8-bit grey-palette BMP; (h, w, 3) -> 24-bit;
    (h, w, 4) -> 32-bit.  Bottom-up (the classic layout)."""
    arr = np.asarray(arr)
    if arr.dtype != np.uint8:
        raise ValueError("BMP encode requires uint8")
    h, w = arr.shape[:2]
    if arr.ndim == 2:
        bpp, pal_n = 8, 256
        pal = b"".join(bytes([v, v, v, 0]) for v in range(256))
        rows = arr
    elif arr.ndim == 3 and arr.shape[2] == 3:
        bpp, pal_n, pal = 24, 0, b""
        rows = arr[..., [2, 1, 0]].reshape(h, w * 3)
    elif arr.ndim == 3 and arr.shape[2] == 4:
        bpp, pal_n, pal = 32, 0, b""
        rows = arr[..., [2, 1, 0, 3]].reshape(h, w * 4)
    else:
        raise ValueError(f"unsupported array for BMP encode: {arr.shape}")
    row_bytes = (w * bpp // 8 + 3) & ~3
    padded = np.zeros((h, row_bytes), np.uint8)
    padded[:, : w * bpp // 8] = rows.reshape(h, -1)
    data = padded[::-1].tobytes()  # bottom-up
    data_off = 14 + 40 + len(pal)
    out = b"BM" + struct.pack(
        "<IHHI", data_off + len(data), 0, 0, data_off
    )
    out += struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, bpp, 0, len(data), 2835, 2835,
        pal_n, 0,
    )
    return out + pal + data


def bmp_codec(blob: bytes, w: int, h: int, fmt: str) -> np.ndarray:
    a = decode_bmp(blob)
    if a.shape[:2] != (int(h), int(w)):
        raise ValueError(
            f"BMP geometry mismatch: decoded {a.shape[:2]}, "
            f"metadata says {(int(h), int(w))}"
        )
    return a


def register_bmp_codec() -> None:
    from .images import register_codec

    register_codec("bmp", bmp_codec)
