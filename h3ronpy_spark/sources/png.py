"""Pure-Python PNG codec (stdlib zlib only) for the codec registry.

VERDICT r04 item 3: the multimodal path should exercise a REAL
compressed format with zero new dependencies.  This module implements a
spec-complete subset of ISO/IEC 15948 (PNG):

  * decode: greyscale (color type 0) at 1/2/4/8/16 bits, RGB (2) and
    grey+alpha (4) and RGBA (6) at 8/16 bits, palette (3) at 1/2/4/8
    bits with optional tRNS alpha, and tRNS colour-key transparency
    for greyscale/RGB streams (round 7 breadth: web sprite/icon
    corpora are dominated by low-bit palette PNGs); sequential
    AND Adam7-interlaced streams (each of the 7 passes is an
    independently-filtered sub-image, unfiltered then scattered back
    by strided numpy assignment); all five scanline filter types
    (None/Sub/Up/Average/Paeth), chunk CRC verification.
  * encode: same pixel formats; the row filter is chosen per-row
    (row % 5) so every decoder filter branch is exercised by any
    image taller than 4 rows.

The reference's raster path converts in-memory arrays
(h3ronpy/src/raster.rs:210-219) and leaves container formats to GDAL;
here the decode step itself is part of the engine's multimodal
plumbing, registered as fmt="png" via sources.images.register_codec so
tile_images / image feature extraction run unmodified over compressed
payloads.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def encode_png(
    arr: np.ndarray,
    palette: np.ndarray | None = None,
    trns: np.ndarray | None = None,
    filter_type: int | None = None,
) -> bytes:
    """Encode (h, w) uint8/uint16 greyscale, (h, w, 2) uint8
    grey+alpha, (h, w, 3) uint8 RGB, (h, w, 4) uint8 RGBA, or —
    with `palette` ((n<=256, 3) uint8) —
    (h, w) uint8 palette indices (color type 3, optional `trns` alpha
    table, (m<=n,) uint8).

    Per-row filter = row_index % 5 by default, covering every filter
    type; pass `filter_type` 0-4 to pin one (2=Up keeps the decoder on
    its vectorized path — what the bench corpus uses)."""
    arr = np.asarray(arr)
    if palette is not None:
        palette = np.asarray(palette, dtype=np.uint8)
        if (
            arr.ndim != 2 or arr.dtype != np.uint8
            or palette.ndim != 2 or palette.shape[1] != 3
            or not 1 <= palette.shape[0] <= 256
        ):
            raise ValueError(
                "palette encode needs (h, w) uint8 indices and an "
                "(n<=256, 3) uint8 palette"
            )
        if int(arr.max(initial=0)) >= palette.shape[0]:
            raise ValueError("palette index out of range")
        color_type, bit_depth, channels = 3, 8, 1
    elif arr.ndim == 2 and arr.dtype == np.uint8:
        color_type, bit_depth, channels = 0, 8, 1
    elif arr.ndim == 2 and arr.dtype == np.uint16:
        color_type, bit_depth, channels = 0, 16, 1
    elif arr.ndim == 3 and arr.shape[2] == 2 and arr.dtype == np.uint8:
        color_type, bit_depth, channels = 4, 8, 2  # grey + alpha
    elif arr.ndim == 3 and arr.shape[2] == 3 and arr.dtype == np.uint8:
        color_type, bit_depth, channels = 2, 8, 3
    elif arr.ndim == 3 and arr.shape[2] == 4 and arr.dtype == np.uint8:
        color_type, bit_depth, channels = 6, 8, 4
    else:
        raise ValueError(
            f"unsupported array for PNG encode: shape={arr.shape} "
            f"dtype={arr.dtype}"
        )
    if trns is not None and color_type != 3:
        raise ValueError("trns only applies to palette (color type 3)")
    h, w = arr.shape[:2]
    bpp = channels * (bit_depth // 8)
    # raw scanline bytes, big-endian sample order per the spec
    if bit_depth == 16:
        rows = arr.astype(">u2").tobytes()
    else:
        rows = arr.tobytes()
    stride = w * bpp
    # Filtering is fully vectorizable on the ENCODE side: every
    # predictor (left/up/upper-left) reads RAW neighbor bytes, not
    # reconstructed ones, so there is no sequential dependency (unlike
    # decode, where Sub/Average/Paeth reconstruct left-to-right).
    mat = np.frombuffer(rows, np.uint8).reshape(h, stride).astype(np.int16)
    left_m = np.zeros_like(mat)
    left_m[:, bpp:] = mat[:, :-bpp]
    up_m = np.zeros_like(mat)
    up_m[1:] = mat[:-1]

    def _paeth_plane():
        ul_m = np.zeros_like(mat)
        ul_m[1:, bpp:] = mat[:-1, :-bpp]
        p = left_m + up_m - ul_m
        pa = np.abs(p - left_m)
        pb = np.abs(p - up_m)
        pc = np.abs(p - ul_m)
        return mat - np.where(
            (pa <= pb) & (pa <= pc), left_m, np.where(pb <= pc, up_m, ul_m)
        )

    planes = {
        0: lambda: mat,
        1: lambda: mat - left_m,
        2: lambda: mat - up_m,
        3: lambda: mat - (left_m + up_m) // 2,
        4: _paeth_plane,
    }
    needed = range(5) if filter_type is None else [int(filter_type)]
    filtered = {f: planes[f]() for f in needed}
    # assemble [filter_byte | filtered row] rows in one array op per
    # filter type instead of a per-row Python loop (round-8; byte-
    # identical, the corpus encoder runs once per image per bench rep)
    out2d = np.empty((h, stride + 1), np.uint8)
    if filter_type is None:
        ft_col = (np.arange(h) % 5).astype(np.uint8)
        out2d[:, 0] = ft_col
        for f in needed:
            rows_f = np.flatnonzero(ft_col == f)
            if rows_f.size:
                out2d[rows_f, 1:] = (
                    filtered[f][rows_f] & 0xFF
                ).astype(np.uint8)
    else:
        out2d[:, 0] = np.uint8(int(filter_type))
        out2d[:, 1:] = (filtered[int(filter_type)] & 0xFF).astype(np.uint8)
    out = out2d.tobytes()
    ihdr = struct.pack(">IIBBBBB", w, h, bit_depth, color_type, 0, 0, 0)
    chunks = _SIG + _chunk(b"IHDR", ihdr)
    if palette is not None:
        chunks += _chunk(b"PLTE", palette.tobytes())
        if trns is not None:
            chunks += _chunk(
                b"tRNS", np.asarray(trns, dtype=np.uint8).tobytes()
            )
    return (
        chunks
        + _chunk(b"IDAT", zlib.compress(bytes(out), 6))
        + _chunk(b"IEND", b"")
    )


# Adam7 pass geometry: (x0, y0, dx, dy) per pass; a pass whose
# sub-image is empty contributes NO bytes (not even filter bytes)
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _unfilter_region(raw, off, n_rows, stride, bpp):
    """Reverse PNG scanline filters over one filtered region (the whole
    image, or one Adam7 pass — each pass filters against its OWN rows
    only, so `prev` starts at zeros per region).  Returns
    (reconstructed bytes, new offset).

    Round-8: rows are processed in RUNS of a constant filter type so
    the common filters vectorize across whole runs instead of per row
    (the decode hot path runs once per image in the bench corpus, which
    is all-Up):
      * a None run is a block copy;
      * a Sub run is row-independent (left-neighbor only), one
        per-byte-lane cumsum over the whole run (uint8 wraps mod 256);
      * an Up run is a column-wise cumsum seeded with the previous
        reconstructed row — recon[y] = line[y] + recon[y-1] telescopes
        to prev + cumsum(lines) in wrapping uint8;
      * Average/Paeth reconstruct left-to-right (sequential data
        dependency) and keep the per-row scalar loop.
    Output is byte-identical to the round-7 per-row loop (pinned by the
    spec goldens in tests/test_png_codec.py)."""
    end = off + n_rows * (stride + 1)
    if end > len(raw):
        raise ValueError("PNG IDAT length mismatch")
    if n_rows == 0:
        return bytearray(), end
    mat = np.frombuffer(bytes(raw[off:end]), np.uint8).reshape(
        n_rows, stride + 1
    )
    ftypes = mat[:, 0]
    if ftypes.max(initial=0) > 4:
        y = int(np.argmax(ftypes > 4))
        raise ValueError(f"PNG: bad filter type {ftypes[y]} on row {y}")
    lines = mat[:, 1:]
    recon = np.empty((n_rows, stride), np.uint8)
    prev = np.zeros(stride, np.uint8)
    # run boundaries of constant filter type
    bounds = np.flatnonzero(np.diff(ftypes)) + 1
    starts = np.concatenate(([0], bounds))
    ends = np.concatenate((bounds, [n_rows]))
    for y0, y1 in zip(starts.tolist(), ends.tolist()):
        ftype = int(ftypes[y0])
        blk = lines[y0:y1]
        if ftype == 0:  # None
            recon[y0:y1] = blk
        elif ftype == 1:  # Sub — per-lane cumsum, rows independent
            recon[y0:y1] = np.cumsum(
                blk.reshape(y1 - y0, -1, bpp), axis=1, dtype=np.uint8
            ).reshape(y1 - y0, stride)
        elif ftype == 2:  # Up — telescoping column cumsum from prev
            recon[y0:y1] = np.cumsum(blk, axis=0, dtype=np.uint8) + prev
        else:  # Average / Paeth: sequential left dependency
            for y in range(y0, y1):
                line = blk[y - y0]
                row = bytearray(stride)
                if ftype == 3:
                    for x in range(stride):
                        left = row[x - bpp] if x >= bpp else 0
                        row[x] = (int(line[x]) + (left + prev[x]) // 2) & 0xFF
                else:
                    for x in range(stride):
                        left = row[x - bpp] if x >= bpp else 0
                        ul = int(prev[x - bpp]) if x >= bpp else 0
                        row[x] = (
                            int(line[x]) + _paeth(left, int(prev[x]), ul)
                        ) & 0xFF
                recon[y] = np.frombuffer(bytes(row), np.uint8)
                prev = recon[y]
        prev = recon[y1 - 1]
    return bytearray(recon.tobytes()), end


def decode_png(blob: bytes) -> np.ndarray:
    """Decode a greyscale-8/16, grey+alpha-8, RGB-8, RGBA-8 or
    palette-8 PNG, non-interlaced or Adam7-interlaced.  Output shape:
    (h, w) for greyscale, (h, w, 2) for grey+alpha, (h, w, 3) for RGB
    and opaque palette, (h, w, 4) for RGBA and palette-with-tRNS.
    Verifies chunk CRCs."""
    if blob[:8] != _SIG:
        raise ValueError("not a PNG: bad signature")
    pos = 8
    ihdr = None
    idat = bytearray()
    plte = None
    trns = None
    while pos < len(blob):
        (length,) = struct.unpack(">I", blob[pos : pos + 4])
        tag = blob[pos + 4 : pos + 8]
        payload = blob[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(
            ">I", blob[pos + 8 + length : pos + 12 + length]
        )
        if zlib.crc32(tag + payload) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {tag!r}: CRC mismatch")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", payload)
        elif tag == b"PLTE":
            if length % 3:
                raise ValueError("PNG PLTE length not a multiple of 3")
            plte = np.frombuffer(payload, np.uint8).reshape(-1, 3)
        elif tag == b"tRNS":
            trns = np.frombuffer(payload, np.uint8)
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, bit_depth, color_type, comp, filt, interlace = ihdr
    if comp != 0 or filt != 0 or interlace not in (0, 1):
        raise NotImplementedError(
            "only compression=0, filter=0, interlace 0/1 PNGs supported"
        )
    # round-7 variant breadth (VERDICT r06 item 3, decoder-side only):
    # 1/2/4-bit palette AND greyscale, 16-bit RGB / grey+alpha / RGBA,
    # and tRNS colour-key transparency for greyscale/RGB streams —
    # web sprite/icon corpora are dominated by low-bit palette PNGs.
    if (color_type, bit_depth) not in (
        (0, 1), (0, 2), (0, 4), (0, 8), (0, 16),
        (2, 8), (2, 16), (4, 8), (4, 16), (6, 8), (6, 16),
        (3, 1), (3, 2), (3, 4), (3, 8),
    ):
        raise NotImplementedError(
            f"unsupported PNG color_type={color_type} bit_depth={bit_depth}"
        )
    if color_type == 3 and plte is None:
        raise ValueError("palette PNG missing PLTE chunk")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]
    # filter distance: byte-packed sub-8-bit samples filter at 1 byte
    bpp = max(1, channels * bit_depth // 8)
    raw = zlib.decompress(bytes(idat))
    dtype = np.uint16 if bit_depth == 16 else np.uint8

    def _row_stride(ws: int) -> int:
        return (ws * channels * bit_depth + 7) // 8

    def _to_pixels(recon, hs, ws):
        if bit_depth == 16:
            sub = np.frombuffer(bytes(recon), ">u2").astype(np.uint16)
            return sub.reshape(hs, ws, channels)
        if bit_depth == 8:
            sub = np.frombuffer(bytes(recon), np.uint8)
            return sub.reshape(hs, ws, channels)
        # sub-byte depths (1/2/4, channels == 1): MSB-first bit groups
        # per row, trailing pad bits trimmed to ws samples
        stride = _row_stride(ws)
        a = np.frombuffer(bytes(recon), np.uint8).reshape(hs, stride)
        bits = np.unpackbits(a, axis=1)
        if bit_depth == 1:
            vals = bits
        else:
            per = stride * 8 // bit_depth
            weights = (1 << np.arange(bit_depth - 1, -1, -1)).astype(
                np.uint8
            )
            vals = (
                bits.reshape(hs, per, bit_depth) * weights
            ).sum(axis=2).astype(np.uint8)
        return vals[:, :ws, None]

    if interlace == 0:
        stride = _row_stride(w)
        if len(raw) != h * (stride + 1):
            raise ValueError("PNG IDAT length mismatch")
        recon, _ = _unfilter_region(raw, 0, h, stride, bpp)
        px = _to_pixels(recon, h, w)
    else:  # Adam7: 7 independently-filtered sub-images, scattered back
        px = np.zeros((h, w, channels), dtype=dtype)
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            ws = (w - x0 + dx - 1) // dx
            hs = (h - y0 + dy - 1) // dy
            if ws <= 0 or hs <= 0:
                continue
            recon, off = _unfilter_region(raw, off, hs, _row_stride(ws), bpp)
            px[y0::dy, x0::dx, :] = _to_pixels(recon, hs, ws)
        if off != len(raw):
            raise ValueError("PNG IDAT length mismatch")
    if color_type == 3:
        idx = px[..., 0]
        if int(idx.max(initial=0)) >= plte.shape[0]:
            raise ValueError("PNG palette index out of range")
        rgb = plte[idx]  # (h, w, 3)
        if trns is None:
            return rgb
        alpha = np.full(plte.shape[0], 255, np.uint8)
        alpha[: trns.size] = trns
        return np.concatenate([rgb, alpha[idx][..., None]], axis=2)
    if color_type in (0, 2) and trns is not None:
        # colour-key transparency: tRNS carries one 16-bit sample per
        # channel, compared at the stream's raw sample depth
        key = np.frombuffer(trns, ">u2").astype(np.uint16)
        if key.size != channels:
            raise ValueError("PNG tRNS length mismatch for color type")
        transparent = (px == key.reshape(1, 1, channels)).all(axis=2)
        opaque = np.uint16(65535) if bit_depth == 16 else np.uint8(255)
        alpha = np.where(transparent, dtype(0), opaque).astype(dtype)
        if bit_depth < 8:  # scale low-bit grey to 8-bit after keying
            px = (px * (255 // ((1 << bit_depth) - 1))).astype(np.uint8)
        return np.concatenate([px, alpha[..., None]], axis=2)
    if color_type == 0 and bit_depth < 8:
        # scale 1/2/4-bit grey to full 8-bit range (exact: 255, 85, 17)
        px = (px * (255 // ((1 << bit_depth) - 1))).astype(np.uint8)
    if channels > 1:
        return px
    return px[..., 0]


def png_codec(blob: bytes, w: int, h: int, fmt: str) -> np.ndarray:
    """Codec-registry adapter: decode and sanity-check the declared
    geometry (the images-table schema carries w/h as typed metadata)."""
    a = decode_png(blob)
    if a.shape[:2] != (int(h), int(w)):
        raise ValueError(
            f"PNG geometry mismatch: decoded {a.shape[:2]}, "
            f"metadata says {(int(h), int(w))}"
        )
    return a


def register_png_codec() -> None:
    """Register fmt='png' in the image codec registry."""
    from .images import register_codec

    register_codec("png", png_codec)
