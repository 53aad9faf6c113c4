"""Pure-Python GIF codec (stdlib + numpy only) for the codec registry.

Round 7 codec breadth: after baseline+progressive JPEG and full 8-bit
PNG, GIF is the next format a real scraped web corpus actually
contains (icons, stickers, memes — W3C GIF89a).  The reference ingests
whatever rasterio/GDAL decodes (h3ronpy/tests/arrow/test_raster.py:
21-26); this gives the engine the same breadth without a native
dependency, behind the same `register_codec` seam.

Scope:

  * decode: GIF87a and GIF89a, global and local color tables, LZW
    with variable code width / CLEAR / EOI and the 4096-entry table
    cap, interlaced and sequential scan order, sub-minimal-screen
    frames composed onto the logical screen (background-filled),
    Graphic Control Extension transparency.  FIRST frame only —
    animation is a sequence of frames over the same pipeline; a
    training-data ingest samples frames, it does not play them.
  * encode: static GIF89a from (h, w) uint8 greyscale (identity
    grey ramp palette) or (h, w, 3) uint8 RGB with <= 256 distinct
    colors (exact palette, no quantization), optional interlace.
  * Output shape convention matches png.py: (h, w) for a greyscale
    palette, (h, w, 3) for an opaque color palette, (h, w, 4) when a
    transparency index is active.

LZW is inherently serial per image (codes chain through the string
table), so the hot loop is Python over CODES (not pixels): indices are
emitted as table slices and materialized with ONE np.concatenate per
frame, the same sparse-collect-then-scatter shape as the JPEG entropy
decoder.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "decode_gif",
    "encode_gif",
    "gif_codec",
    "register_gif_codec",
]


# ---------------------------------------------------------------------------
# LZW (GIF variant: LSB-first bit packing, dynamic code width)
# ---------------------------------------------------------------------------


def _lzw_decode(data: bytes, min_code_size: int, n_expected: int) -> np.ndarray:
    """Decode GIF LZW into a uint8 index array of length n_expected.

    Table entries are stored as (prefix_entry, suffix_byte) chains but
    materialized lazily: each emitted code appends a numpy slice view
    to `out`, joined once at the end."""
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    # table maps code -> uint8 ndarray of indices
    base = [np.array([i], np.uint8) for i in range(clear)]

    acc = 0
    nbits = 0
    pos = 0
    n = len(data)
    out: list[np.ndarray] = []
    out_len = 0
    table: list[np.ndarray] = list(base) + [None, None]  # type: ignore
    prev: np.ndarray | None = None

    while out_len < n_expected:
        while nbits < width:
            if pos >= n:
                # truncated stream: GIF in the wild is often sloppily
                # terminated; return what decoded (caller length-checks)
                return (
                    np.concatenate(out)[:n_expected]
                    if out
                    else np.zeros(0, np.uint8)
                )
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width

        if code == clear:
            table = list(base) + [None, None]  # type: ignore
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            entry = table[code]
            if entry is None:
                raise ValueError("GIF LZW: first code not in table")
        elif code < len(table) and table[code] is not None:
            entry = table[code]
            if len(table) < 4096:
                table.append(
                    np.concatenate([prev, entry[:1]])
                )
        elif code == len(table):
            entry = np.concatenate([prev, prev[:1]])
            if len(table) < 4096:
                table.append(entry)
        else:
            raise ValueError("GIF LZW: code out of range")
        out.append(entry)
        out_len += len(entry)
        prev = entry
        # widen when the NEXT code to be assigned no longer fits
        if len(table) >= (1 << width) and width < 12:
            width += 1
    if not out:
        return np.zeros(0, np.uint8)
    return np.concatenate(out)[:n_expected]


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """GIF LZW encode of a uint8 index array (dict of bytes -> code)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1

    acc = 0
    nbits = 0
    out = bytearray()

    def emit(code: int, w: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += w
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear, width)
    data = indices.tobytes()
    cur = b""
    for i in range(len(data)):
        nxt = cur + data[i : i + 1]
        if nxt in table:
            cur = nxt
            continue
        emit(table[cur], width)
        if next_code < 4096:
            table[nxt] = next_code
            # widen when the JUST-ASSIGNED code no longer fits the
            # current width (decoder mirrors this on its side)
            if next_code == (1 << width) and width < 12:
                width += 1
            next_code += 1
        else:
            emit(clear, width)
            table = {bytes([j]): j for j in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        cur = data[i : i + 1]
    if cur:
        emit(table[cur], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# ---------------------------------------------------------------------------
# container
# ---------------------------------------------------------------------------

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    outrows = np.empty_like(rows)
    src = 0
    for start, step in _INTERLACE_PASSES:
        n = len(range(start, h, step))
        outrows[start::step] = rows[src : src + n]
        src += n
    return outrows


def _interlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    return np.concatenate(
        [rows[start::step] for start, step in _INTERLACE_PASSES]
    )


def _read_subblocks(blob: bytes, pos: int) -> tuple[bytes, int]:
    parts = []
    n = len(blob)
    while pos < n:
        size = blob[pos]
        pos += 1
        if size == 0:
            break
        parts.append(blob[pos : pos + size])
        pos += size
    return b"".join(parts), pos


def decode_gif(blob: bytes) -> np.ndarray:
    """Decode the FIRST frame of a GIF87a/89a stream.

    Returns (h, w) uint8 when the effective palette is greyscale and
    the frame is opaque, (h, w, 3) for an opaque color palette, and
    (h, w, 4) RGBA when a GCE transparency index is active (png.py
    shape conventions)."""
    if blob[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF: bad signature")
    sw, sh, packed, bg_idx, _aspect = struct.unpack_from("<HHBBB", blob, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        gct_n = 2 << (packed & 0x07)
        gct = np.frombuffer(blob[pos : pos + 3 * gct_n], np.uint8).reshape(
            -1, 3
        )
        pos += 3 * gct_n

    transparent_idx = None
    n = len(blob)
    while pos < n:
        block = blob[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = blob[pos]
            pos += 1
            payload, pos = _read_subblocks(blob, pos)
            if label == 0xF9 and len(payload) >= 4:  # GCE
                flags = payload[0]
                if flags & 0x01:
                    transparent_idx = payload[3]
            continue
        if block != 0x2C:  # not an image descriptor
            raise ValueError(f"GIF: unknown block 0x{block:02x}")
        fx, fy, fw, fh, fpacked = struct.unpack_from("<HHHHB", blob, pos)
        pos += 9
        lct = None
        if fpacked & 0x80:
            lct_n = 2 << (fpacked & 0x07)
            lct = np.frombuffer(
                blob[pos : pos + 3 * lct_n], np.uint8
            ).reshape(-1, 3)
            pos += 3 * lct_n
        interlaced = bool(fpacked & 0x40)
        min_code_size = blob[pos]
        pos += 1
        data, pos = _read_subblocks(blob, pos)

        idx = _lzw_decode(data, min_code_size, fw * fh)
        if len(idx) < fw * fh:
            raise ValueError(
                f"GIF: LZW underrun ({len(idx)}/{fw * fh} pixels)"
            )
        rows = idx.reshape(fh, fw)
        if interlaced:
            rows = _deinterlace(rows)

        palette = lct if lct is not None else gct
        if palette is None:
            raise ValueError("GIF: frame has no color table")

        # compose the (possibly smaller, offset) frame onto the
        # logical screen, background-filled
        if (fx, fy, fw, fh) != (0, 0, sw, sh):
            canvas = np.full(
                (sh, sw),
                bg_idx if gct is not None and bg_idx < len(gct) else 0,
                np.uint8,
            )
            canvas[fy : fy + fh, fx : fx + fw] = rows
            rows = canvas

        safe = np.minimum(rows, len(palette) - 1)
        rgb = palette[safe]
        if transparent_idx is not None:
            alpha = np.where(rows == transparent_idx, 0, 255).astype(
                np.uint8
            )
            return np.dstack([rgb, alpha])
        if (palette[:, 0] == palette[:, 1]).all() and (
            palette[:, 1] == palette[:, 2]
        ).all():
            return rgb[..., 0]  # greyscale palette -> single band
        return rgb
    raise ValueError("GIF: no image descriptor before trailer")


def encode_gif(
    arr: np.ndarray, interlace: bool = False,
    transparent_idx: int | None = None,
) -> bytes:
    """Encode a static GIF89a.

    (h, w) uint8 -> identity 256-grey palette; (h, w, 3) uint8 with
    <= 256 distinct colors -> exact palette (no quantization —
    synthetic corpora are palette-exact by construction)."""
    arr = np.asarray(arr)
    if arr.ndim == 2 and arr.dtype == np.uint8:
        indices = arr
        palette = np.repeat(
            np.arange(256, dtype=np.uint8)[:, None], 3, axis=1
        )
    elif arr.ndim == 3 and arr.shape[2] == 3 and arr.dtype == np.uint8:
        flat = arr.reshape(-1, 3)
        palette, inverse = np.unique(flat, axis=0, return_inverse=True)
        if len(palette) > 256:
            raise ValueError(
                f"GIF encode: {len(palette)} distinct colors > 256 "
                "(no quantizer; quantize upstream)"
            )
        indices = inverse.astype(np.uint8).reshape(arr.shape[:2])
    else:
        raise ValueError(
            f"unsupported array for GIF encode: shape={arr.shape} "
            f"dtype={arr.dtype}"
        )
    h, w = indices.shape
    # pad palette to a power of two >= 2
    pbits = max(1, int(np.ceil(np.log2(max(len(palette), 2)))))
    psize = 1 << pbits
    if len(palette) < psize:
        palette = np.vstack(
            [palette, np.zeros((psize - len(palette), 3), np.uint8)]
        )

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (pbits - 1), 0, 0)
    out += palette.tobytes()
    if transparent_idx is not None:
        out += b"\x21\xf9\x04" + bytes(
            [0x01, 0, 0, transparent_idx]
        ) + b"\x00"
    out += b"\x2c" + struct.pack(
        "<HHHHB", 0, 0, w, h, 0x40 if interlace else 0
    )
    min_code_size = max(2, pbits)
    out.append(min_code_size)
    body = _lzw_encode(
        (_interlace(indices) if interlace else indices).ravel(),
        min_code_size,
    )
    for i in range(0, len(body), 255):
        chunk = body[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)


def gif_codec(blob: bytes, w: int, h: int, fmt: str) -> np.ndarray:
    """Codec-registry adapter with geometry sanity check."""
    a = decode_gif(blob)
    if a.shape[:2] != (int(h), int(w)):
        raise ValueError(
            f"GIF geometry mismatch: decoded {a.shape[:2]}, "
            f"metadata says {(int(h), int(w))}"
        )
    return a


def register_gif_codec() -> None:
    from .images import register_codec

    register_codec("gif", gif_codec)


# ---------------------------------------------------------------------------
# animation (round 7): frame sampling with disposal compositing
# ---------------------------------------------------------------------------


def decode_gif_frames(
    blob: bytes, every_n: int = 1, max_frames: int | None = None
) -> list:
    """Decode an animated GIF into composed RGB canvases, sampling
    every `every_n`-th frame (the GIF analogue of video frame
    sampling: training pipelines sample animation frames, they do not
    play them).

    Disposal methods (GIF89a GCE): 0/1 leave the canvas in place, 2
    restores the frame RECT to the background color, 3 restores the
    canvas to its state before the frame.  Transparent pixels never
    overwrite the running canvas.  Returns a list of (h, w, 3) uint8
    arrays (the composed logical screen per sampled frame)."""
    if blob[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF: bad signature")
    sw, sh, packed, bg_idx, _aspect = struct.unpack_from("<HHBBB", blob, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        gct_n = 2 << (packed & 0x07)
        gct = np.frombuffer(blob[pos : pos + 3 * gct_n], np.uint8).reshape(
            -1, 3
        )
        pos += 3 * gct_n
    bg_rgb = (
        gct[bg_idx]
        if gct is not None and bg_idx < len(gct)
        else np.zeros(3, np.uint8)
    )
    canvas = np.broadcast_to(bg_rgb, (sh, sw, 3)).copy()

    transparent_idx = None
    disposal = 0
    out: list = []
    frame_no = 0
    n = len(blob)
    while pos < n:
        block = blob[pos]
        pos += 1
        if block == 0x3B:
            break
        if block == 0x21:
            label = blob[pos]
            pos += 1
            payload, pos = _read_subblocks(blob, pos)
            if label == 0xF9 and len(payload) >= 4:
                flags = payload[0]
                disposal = (flags >> 2) & 0x07
                transparent_idx = payload[3] if flags & 0x01 else None
            continue
        if block != 0x2C:
            raise ValueError(f"GIF: unknown block 0x{block:02x}")
        fx, fy, fw, fh, fpacked = struct.unpack_from("<HHHHB", blob, pos)
        pos += 9
        lct = None
        if fpacked & 0x80:
            lct_n = 2 << (fpacked & 0x07)
            lct = np.frombuffer(
                blob[pos : pos + 3 * lct_n], np.uint8
            ).reshape(-1, 3)
            pos += 3 * lct_n
        interlaced = bool(fpacked & 0x40)
        min_code_size = blob[pos]
        pos += 1
        data, pos = _read_subblocks(blob, pos)
        idx = _lzw_decode(data, min_code_size, fw * fh)
        if len(idx) < fw * fh:
            raise ValueError(
                f"GIF: LZW underrun ({len(idx)}/{fw * fh} pixels)"
            )
        rows = idx.reshape(fh, fw)
        if interlaced:
            rows = _deinterlace(rows)
        palette = lct if lct is not None else gct
        if palette is None:
            raise ValueError("GIF: frame has no color table")

        before = canvas.copy() if disposal == 3 else None
        region = canvas[fy : fy + fh, fx : fx + fw]
        rgb = palette[np.minimum(rows, len(palette) - 1)]
        if transparent_idx is not None:
            opaque = rows != transparent_idx
            region[opaque] = rgb[opaque]
        else:
            region[:] = rgb

        if frame_no % every_n == 0:
            out.append(canvas.copy())
            if max_frames is not None and len(out) >= max_frames:
                return out
        frame_no += 1

        # post-frame disposal for the NEXT frame's starting canvas
        if disposal == 2:
            canvas[fy : fy + fh, fx : fx + fw] = bg_rgb
        elif disposal == 3 and before is not None:
            canvas = before
        disposal = 0
        transparent_idx = None
    return out


def encode_gif_animation(
    frames: list,
    transparent_idx: int | None = None,
    disposals: list | None = None,
) -> bytes:
    """Encode greyscale uint8 frames (all same shape) as an animated
    GIF89a with an identity grey palette; per-frame disposal methods
    optional (default 0)."""
    frames = [np.asarray(f) for f in frames]
    if not frames:
        raise ValueError("no frames")
    h, w = frames[0].shape
    if any(f.shape != (h, w) or f.dtype != np.uint8 for f in frames):
        raise ValueError("all frames must be uint8 (h, w)")
    palette = np.repeat(np.arange(256, dtype=np.uint8)[:, None], 3, axis=1)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | 7, 0, 0)
    out += palette.tobytes()
    for i, f in enumerate(frames):
        disp = (disposals[i] if disposals else 0) & 0x07
        flags = (disp << 2) | (0x01 if transparent_idx is not None else 0)
        out += b"\x21\xf9\x04" + bytes(
            [flags, 0, 0, transparent_idx or 0]
        ) + b"\x00"
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        out.append(8)
        body = _lzw_encode(f.ravel(), 8)
        for j in range(0, len(body), 255):
            chunk = body[j : j + 255]
            out.append(len(chunk))
            out += chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)
