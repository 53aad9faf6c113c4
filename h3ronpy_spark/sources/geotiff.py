"""Pure-Python baseline TIFF / GeoTIFF reader (stdlib + numpy only).

The reference's raster ingestion is rasterio/GDAL: its own test suite
opens GeoTIFFs and feeds `dataset.read(1)` + `dataset.transform` into
raster_to_dataframe (h3ronpy/tests/arrow/test_raster.py:21-36).  This
module closes that seam without a native dependency: decode the band
and derive the 6-coefficient geotransform from the GeoTIFF tags, in
exactly the (a, b, c, d, e, f) convention h3core.rasterh3 consumes
(lng = a*col + b*row + c; lat = d*col + e*row + f).

Scope (classic TIFF, the subset GDAL writes for single-band rasters):

  * II and MM byte orders; first IFD (the full-resolution image —
    later IFDs are GDAL overviews, deliberately skipped).
  * Strip (StripOffsets/StripByteCounts/RowsPerStrip) AND tiled
    (TileWidth/TileLength/TileOffsets/TileByteCounts) layouts — GDAL
    writes tiles for large rasters; edge tiles are stored padded and
    cropped on assembly.
  * Compression: none (1), LZW (5; MSB-first codes, early-change
    width schedule — NOT the GIF variant), PackBits (32773).
  * Horizontal-differencing predictor (317 = 2).
  * Sample formats: uint 8/16/32, int 8/16/32, float 32/64; 1 sample
    (grey) or N interleaved samples (RGB etc.).
  * GeoTIFF transform: ModelPixelScale (33550) + ModelTiepoint
    (33922), or the full ModelTransformation matrix (34264).
  * GDAL_NODATA (42113) ASCII tag -> float.

BigTIFF (magic 43), JPEG-in-TIFF, deflate, and tiled layouts raise
NotImplementedError — the codec-registry seam is where GDAL plugs in
at a real deployment, same as images.py.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np

__all__ = ["GeoTiff", "read_geotiff"]

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2,
              9: 4, 10: 8, 11: 4, 12: 8}
_TYPE_FMT = {1: "B", 3: "H", 4: "I", 6: "b", 8: "h", 9: "i",
             11: "f", 12: "d"}


@dataclass
class GeoTiff:
    """Decoded first-IFD image + georeferencing."""

    band: np.ndarray  # (h, w) single-sample or (h, w, spp)
    transform: tuple | None  # 6-coefficient geotransform, or None
    nodata: float | None

    def read(self, index: int = 1) -> np.ndarray:
        """rasterio-style 1-based band accessor."""
        if self.band.ndim == 2:
            if index != 1:
                raise IndexError("single-band dataset")
            return self.band
        return self.band[..., index - 1]


def _read_tag_values(blob: bytes, e: str, typ: int, cnt: int,
                     val4: bytes):
    size = _TYPE_SIZE.get(typ)
    if size is None:
        return None
    total = size * cnt
    raw = (
        val4[:total]
        if total <= 4
        else blob[
            struct.unpack(e + "I", val4)[0] : struct.unpack(e + "I", val4)[
                0
            ]
            + total
        ]
    )
    if typ == 2:  # ASCII
        return raw.split(b"\x00")[0].decode("ascii", "replace")
    if typ in (5, 10):  # RATIONAL pairs
        f = "i" if typ == 10 else "I"
        parts = struct.unpack(e + f * (2 * cnt), raw)
        return [
            parts[2 * i] / (parts[2 * i + 1] or 1) for i in range(cnt)
        ]
    fmt = _TYPE_FMT[typ]
    return list(struct.unpack(e + fmt * cnt, raw))


def _lzw_decode_tiff(data: bytes, max_bytes: int) -> bytes:
    """TIFF LZW (spec section 13): MSB-first bit order, CLEAR=256,
    EOI=257, first dynamic code 258, EARLY width change (width grows
    when the next code to assign equals 2^width - 1)."""
    CLEAR, EOI = 256, 257
    base = [bytes([i]) for i in range(256)] + [b"", b""]
    table = list(base)
    width = 9
    acc = 0
    nbits = 0
    pos = 0
    n = len(data)
    out = bytearray()
    prev: bytes | None = None
    while len(out) < max_bytes:
        while nbits < width:
            if pos >= n:
                return bytes(out)
            acc = (acc << 8) | data[pos]
            nbits += 8
            pos += 1
        code = (acc >> (nbits - width)) & ((1 << width) - 1)
        nbits -= width
        if code == CLEAR:
            table = list(base)
            width = 9
            prev = None
            continue
        if code == EOI:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < 4096:
                table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            if len(table) < 4096:
                table.append(entry)
        else:
            raise ValueError("TIFF LZW: code out of range")
        out += entry
        prev = entry
        # TIFF early change (T.IFF6 LZW section: the encoder switches
        # width right after assigning code 2^w - 2, e.g. 510 at 9
        # bits).  The decoder's table lags the encoder's by exactly
        # one entry at the same stream position, so it must switch one
        # assignment earlier in its OWN table terms: when its next
        # code to assign reaches 2^w - 2.
        if len(table) + 2 >= (1 << width) and width < 12:
            width += 1
    return bytes(out)


def _packbits_decode(data: bytes, max_bytes: int) -> bytes:
    out = bytearray()
    pos = 0
    n = len(data)
    while pos < n and len(out) < max_bytes:
        b = data[pos]
        pos += 1
        if b < 128:  # literal run of b+1
            out += data[pos : pos + b + 1]
            pos += b + 1
        elif b > 128:  # repeat next byte 257-b times
            out += data[pos : pos + 1] * (257 - b)
            pos += 1
        # b == 128: noop
    return bytes(out)


def _dtype_of(bits: int, sample_format: int, e: str) -> np.dtype:
    kind = {1: "u", 2: "i", 3: "f"}.get(sample_format)
    if kind is None or bits % 8:
        raise NotImplementedError(
            f"TIFF sample format {sample_format}/{bits}-bit unsupported"
        )
    if kind == "f" and bits not in (32, 64):
        raise NotImplementedError(f"float{bits} TIFF unsupported")
    if kind in "ui" and bits not in (8, 16, 32):
        raise NotImplementedError(f"{kind}int{bits} TIFF unsupported")
    return np.dtype(e + kind + str(bits // 8))


def read_geotiff(blob: bytes) -> GeoTiff:
    """Decode the first IFD of a classic TIFF/GeoTIFF byte string."""
    if blob[:2] == b"II":
        e = "<"
    elif blob[:2] == b"MM":
        e = ">"
    else:
        raise ValueError("not a TIFF: bad byte-order mark")
    (magic,) = struct.unpack(e + "H", blob[2:4])
    if magic == 43:
        raise NotImplementedError("BigTIFF unsupported")
    if magic != 42:
        raise ValueError("not a TIFF: bad magic")
    (ifd_off,) = struct.unpack(e + "I", blob[4:8])
    (n_entries,) = struct.unpack(e + "H", blob[ifd_off : ifd_off + 2])
    tags: dict[int, list] = {}
    for i in range(n_entries):
        p = ifd_off + 2 + 12 * i
        tag, typ, cnt = struct.unpack(e + "HHI", blob[p : p + 8])
        vals = _read_tag_values(blob, e, typ, cnt, blob[p + 8 : p + 12])
        if vals is not None:
            tags[tag] = vals

    try:
        w = int(tags[256][0])
        h = int(tags[257][0])
    except KeyError as exc:
        raise ValueError(f"TIFF missing required tag {exc}") from exc
    tiled = 324 in tags
    if not tiled and 273 not in tags:
        raise ValueError("TIFF missing StripOffsets/TileOffsets")
    spp = int(tags.get(277, [1])[0])
    bits_l = tags.get(258, [8])
    bits = int(bits_l[0])
    if any(int(b) != bits for b in bits_l):
        raise NotImplementedError("mixed BitsPerSample unsupported")
    compression = int(tags.get(259, [1])[0])
    predictor = int(tags.get(317, [1])[0])
    sample_format = int(tags.get(339, [1])[0])
    rows_per_strip = int(tags.get(278, [h])[0])
    planar = int(tags.get(284, [1])[0])
    if planar != 1:
        raise NotImplementedError("planar (non-interleaved) TIFF "
                                  "unsupported")

    dt = _dtype_of(bits, sample_format, e)

    def _decompress(raw: bytes, want: int, label: str) -> bytes:
        if compression == 1:
            data = raw[:want]
        elif compression == 5:
            data = _lzw_decode_tiff(raw, want)
        elif compression in (8, 32946):  # Deflate (and old-style code)
            import zlib

            data = zlib.decompress(raw)[:want]
        elif compression == 32773:
            data = _packbits_decode(raw, want)
        else:
            raise NotImplementedError(
                f"TIFF compression {compression} unsupported "
                "(none/LZW/Deflate/PackBits only)"
            )
        if len(data) < want:
            raise ValueError(
                f"TIFF {label} underrun ({len(data)}/{want} bytes)"
            )
        return data

    def _undiff(a: np.ndarray) -> np.ndarray:
        if predictor != 2:
            return a
        if dt.kind == "f":
            raise NotImplementedError(
                "floating-point predictor unsupported"
            )
        return np.cumsum(a.astype(np.int64), axis=1).astype(dt)

    if tiled:
        # tile grid: every tile is FULL tile_w x tile_h (edge tiles are
        # padded in the file); assemble onto a padded canvas and crop
        tile_w = int(tags.get(322, [w])[0])
        tile_h = int(tags.get(323, [h])[0])
        tile_offsets = [int(x) for x in tags[324]]
        tile_counts = [int(x) for x in tags.get(325, [])]
        if not tile_counts:
            raise ValueError("tiled TIFF missing TileByteCounts")
        tiles_x = (w + tile_w - 1) // tile_w
        tiles_y = (h + tile_h - 1) // tile_h
        canvas = np.zeros(
            (tiles_y * tile_h, tiles_x * tile_w, spp), dt
        )
        want = tile_h * tile_w * spp * dt.itemsize
        for ti, (off, cnt) in enumerate(zip(tile_offsets, tile_counts)):
            data = _decompress(blob[off : off + cnt], want, f"tile {ti}")
            a = _undiff(
                np.frombuffer(
                    data, dt, count=tile_h * tile_w * spp
                ).reshape(tile_h, tile_w, spp)
            )
            ty, tx = divmod(ti, tiles_x)
            canvas[
                ty * tile_h : (ty + 1) * tile_h,
                tx * tile_w : (tx + 1) * tile_w,
            ] = a
        band = canvas[:h, :w]
    else:
        strip_offsets = [int(x) for x in tags[273]]
        strip_counts = [int(x) for x in tags[279]]
        row_bytes = w * spp * dt.itemsize
        chunks = []
        for si, (off, cnt) in enumerate(zip(strip_offsets, strip_counts)):
            nrows = min(rows_per_strip, h - si * rows_per_strip)
            data = _decompress(
                blob[off : off + cnt], nrows * row_bytes, f"strip {si}"
            )
            chunks.append(
                _undiff(
                    np.frombuffer(
                        data, dt, count=nrows * w * spp
                    ).reshape(nrows, w, spp)
                )
            )
        band = np.concatenate(chunks, axis=0)
    band = np.ascontiguousarray(band[..., 0] if spp == 1 else band)

    transform = None
    if 34264 in tags and len(tags[34264]) >= 16:
        m = tags[34264]
        transform = (m[0], m[1], m[3], m[4], m[5], m[7])
    elif 33550 in tags and 33922 in tags:
        sx, sy = float(tags[33550][0]), float(tags[33550][1])
        tp = tags[33922]
        i, j, x, y = float(tp[0]), float(tp[1]), float(tp[3]), float(tp[4])
        transform = (sx, 0.0, x - i * sx, 0.0, -sy, y + j * sy)

    nodata = None
    if 42113 in tags:
        try:
            nodata = float(str(tags[42113]).strip())
        except ValueError:
            pass
    return GeoTiff(band=band, transform=transform, nodata=nodata)


def write_geotiff(
    band: np.ndarray,
    transform: tuple | None = None,
    nodata: float | None = None,
    rows_per_strip: int = 64,
) -> bytes:
    """Encode a single-band (h, w) or interleaved (h, w, spp) array as
    an uncompressed classic little-endian GeoTIFF.

    The reference's test suite writes rasters back out through
    rasterio's GTiff driver (h3ronpy/tests/arrow/test_raster.py
    write_gtiff); this is the no-dependency equivalent, carrying the
    (a, b, c, d, e, f) geotransform as ModelPixelScale+ModelTiepoint
    (axis-aligned transforms only — b and d must be 0) and nodata as
    GDAL_NODATA.  Uncompressed strips: at 100-TB scale compression is
    the registry codec's job; this writer exists for roundtrips and
    small exports."""
    band = np.asarray(band)
    h, w = band.shape[:2]
    spp = 1 if band.ndim == 2 else band.shape[2]
    dt = band.dtype
    kind_to_fmt = {"u": 1, "i": 2, "f": 3}
    if dt.kind not in kind_to_fmt or dt.itemsize not in (1, 2, 4, 8):
        raise ValueError(f"unsupported dtype for GeoTIFF write: {dt}")
    bits = dt.itemsize * 8
    e = "<"
    rps = min(rows_per_strip, h)

    entries = [
        (256, 3, 1, [w]),
        (257, 3, 1, [h]),
        (258, 3, spp, [bits] * spp),
        (259, 3, 1, [1]),
        (262, 3, 1, [1 if spp == 1 else 2]),
        (277, 3, 1, [spp]),
        (278, 3, 1, [rps]),
        (339, 3, 1, [kind_to_fmt[dt.kind]]),
    ]
    if transform is not None:
        a, b, c, d, e_, f = (float(t) for t in transform)
        if b or d:
            raise ValueError(
                "rotated transforms unsupported (ModelTransformation "
                "write not implemented)"
            )
        entries.append((33550, 12, 3, [a, -e_, 0.0]))
        entries.append((33922, 12, 6, [0.0, 0.0, 0.0, c, f, 0.0]))
    if nodata is not None:
        s = (
            str(int(nodata))
            if float(nodata) == int(nodata)
            else repr(float(nodata))
        )
        entries.append((42113, 2, len(s) + 1, s))

    strips = [
        np.ascontiguousarray(band[y0 : y0 + rps])
        .astype(dt.newbyteorder(e))
        .tobytes()
        for y0 in range(0, h, rps)
    ]
    n_strips = len(strips)
    n = len(entries) + 2
    ifd_size = 2 + 12 * n + 4
    oline_pos = 8 + ifd_size

    def enc_vals(typ, vals):
        if typ == 2:
            return vals.encode() + b"\x00"
        fmt = {3: "H", 4: "I", 12: "d"}[typ]
        return b"".join(struct.pack(e + fmt, v) for v in vals)

    out_of_line = bytearray()
    packed = []
    for tag, typ, cnt, vals in entries:
        raw = enc_vals(typ, vals)
        if len(raw) <= 4:
            packed.append((tag, typ, cnt, raw.ljust(4, b"\x00")))
        else:
            packed.append(
                (tag, typ, cnt,
                 struct.pack(e + "I", oline_pos + len(out_of_line)))
            )
            out_of_line += raw

    tables_pos = oline_pos + len(out_of_line)
    if n_strips == 1:
        data_pos = tables_pos
        packed.append((273, 4, 1, struct.pack(e + "I", data_pos)))
        packed.append((279, 4, 1, struct.pack(e + "I", len(strips[0]))))
        tables_raw = b""
    else:
        offsets_pos = tables_pos
        counts_pos = tables_pos + 4 * n_strips
        data_pos = counts_pos + 4 * n_strips
        offs, cur = [], data_pos
        for s in strips:
            offs.append(cur)
            cur += len(s)
        tables_raw = b"".join(
            struct.pack(e + "I", o) for o in offs
        ) + b"".join(struct.pack(e + "I", len(s)) for s in strips)
        packed.append((273, 4, n_strips, struct.pack(e + "I", offsets_pos)))
        packed.append((279, 4, n_strips, struct.pack(e + "I", counts_pos)))

    packed.sort(key=lambda x: x[0])
    ifd = struct.pack(e + "H", n)
    for tag, typ, cnt, val4 in packed:
        ifd += struct.pack(e + "HHI", tag, typ, cnt) + val4
    ifd += struct.pack(e + "I", 0)

    blob = bytearray(b"II" + struct.pack(e + "H", 42))
    blob += struct.pack(e + "I", 8)
    blob += ifd + out_of_line + tables_raw
    for s in strips:
        blob += s
    return bytes(blob)


def tiff_codec(blob: bytes, w: int, h: int, fmt: str) -> np.ndarray:
    """Codec-registry adapter (band only; transform/nodata are read
    via read_geotiff where georeferencing matters)."""
    a = read_geotiff(blob).band
    if a.shape[:2] != (int(h), int(w)):
        raise ValueError(
            f"TIFF geometry mismatch: decoded {a.shape[:2]}, "
            f"metadata says {(int(h), int(w))}"
        )
    return a


def register_tiff_codec() -> None:
    from .images import register_codec

    register_codec("tiff", tiff_codec)
