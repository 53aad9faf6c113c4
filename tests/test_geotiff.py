"""GeoTIFF reader: hand-built byte-level streams + reference-file
parity.

The two real-GDAL test vectors are the reference repo's own rasters
(h3ronpy/data/r.tiff — 2000x2000 grey, LZW, GDAL_NODATA, GeoTIFF
transform; europe-and-north-africa.tif — RGB, uncompressed).  Those
tests are skipped when the reference checkout is absent; the
hand-built streams keep the decoder pinned standalone.
"""

from __future__ import annotations

import os
import struct

import numpy as np
import pytest

from h3ronpy_spark.sources.geotiff import (
    _lzw_decode_tiff,
    _packbits_decode,
    read_geotiff,
)

_R_TIFF = "/root/reference/h3ronpy/data/r.tiff"
_EU_TIFF = "/root/reference/h3ronpy/data/europe-and-north-africa.tif"


def _build_tiff(
    band: np.ndarray,
    *,
    byte_order: str = "II",
    compression: int = 1,
    payload: bytes | None = None,
    predictor: int = 1,
    rows_per_strip: int | None = None,
    pixel_scale: tuple | None = None,
    tiepoint: tuple | None = None,
    nodata: str | None = None,
    extra_tags: list | None = None,
) -> bytes:
    """Minimal single-strip (or multi-strip) classic TIFF writer for
    tests: uncompressed unless an explicit pre-compressed `payload` is
    given (then strip tables describe that payload as ONE strip)."""
    e = "<" if byte_order == "II" else ">"
    h, w = band.shape[:2]
    spp = 1 if band.ndim == 2 else band.shape[2]
    dt = band.dtype
    sample_format = {"u": 1, "i": 2, "f": 3}[dt.kind]
    bits = dt.itemsize * 8
    rps = rows_per_strip or h

    strips = []
    if payload is not None:
        strips = [payload]
        rps = h
    else:
        for y0 in range(0, h, rps):
            part = band[y0 : y0 + rps]
            strips.append(
                np.ascontiguousarray(part).astype(dt.newbyteorder(e))
                .tobytes()
            )

    entries = []  # (tag, type, count, values)
    entries.append((256, 3, 1, [w]))
    entries.append((257, 3, 1, [h]))
    entries.append((258, 3, spp, [bits] * spp))
    entries.append((259, 3, 1, [compression]))
    entries.append((262, 3, 1, [1 if spp == 1 else 2]))
    entries.append((277, 3, 1, [spp]))
    entries.append((278, 3, 1, [rps]))
    if predictor != 1:
        entries.append((317, 3, 1, [predictor]))
    entries.append((339, 3, 1, [sample_format]))
    if pixel_scale is not None:
        entries.append((33550, 12, 3, list(pixel_scale)))
    if tiepoint is not None:
        entries.append((33922, 12, 6, list(tiepoint)))
    if nodata is not None:
        entries.append((42113, 2, len(nodata) + 1, nodata))
    for t in extra_tags or []:
        entries.append(t)

    # layout: header(8) IFD [out-of-line values] [strip data]
    type_size = {2: 1, 3: 2, 4: 4, 12: 8}
    n = len(entries) + 2  # + StripOffsets + StripByteCounts
    ifd_size = 2 + 12 * n + 4
    pos = 8 + ifd_size

    def encode_vals(typ, cnt, vals):
        if typ == 2:
            return vals.encode() + b"\x00"
        fmt = {3: "H", 4: "I", 12: "d"}[typ]
        return b"".join(struct.pack(e + fmt, v) for v in vals)

    out_of_line = bytearray()
    packed = []
    for tag, typ, cnt, vals in entries:
        raw = encode_vals(typ, cnt, vals)
        if len(raw) <= 4:
            packed.append((tag, typ, cnt, raw.ljust(4, b"\x00")))
        else:
            packed.append(
                (tag, typ, cnt, struct.pack(e + "I", pos + len(out_of_line)))
            )
            out_of_line += raw

    # strip tables
    strip_table_pos = pos + len(out_of_line)
    n_strips = len(strips)
    offsets_raw_pos = strip_table_pos
    counts_raw_pos = strip_table_pos + 4 * n_strips
    data_pos = counts_raw_pos + 4 * n_strips
    offs, cur = [], data_pos
    for s in strips:
        offs.append(cur)
        cur += len(s)
    offsets_raw = b"".join(struct.pack(e + "I", o) for o in offs)
    counts_raw = b"".join(struct.pack(e + "I", len(s)) for s in strips)
    if n_strips == 1:
        packed.append((273, 4, 1, offsets_raw.ljust(4, b"\x00")))
        packed.append((279, 4, 1, counts_raw.ljust(4, b"\x00")))
        # single-strip: tables are inline, reclaim their slots
        data_pos = strip_table_pos
        offs = [data_pos]
        packed[-2] = (273, 4, 1, struct.pack(e + "I", data_pos))
        packed[-1] = (279, 4, 1, struct.pack(e + "I", len(strips[0])))
    else:
        packed.append((273, 4, n_strips, struct.pack(e + "I", offsets_raw_pos)))
        packed.append((279, 4, n_strips, struct.pack(e + "I", counts_raw_pos)))

    packed.sort(key=lambda x: x[0])
    ifd = struct.pack(e + "H", n)
    for tag, typ, cnt, val4 in packed:
        ifd += struct.pack(e + "HHI", tag, typ, cnt) + val4
    ifd += struct.pack(e + "I", 0)

    blob = bytearray()
    blob += byte_order.encode() + struct.pack(e + "H", 42)
    blob += struct.pack(e + "I", 8)
    blob += ifd
    blob += out_of_line
    if n_strips > 1:
        blob += offsets_raw + counts_raw
    for s in strips:
        blob += s
    return bytes(blob)


class TestHandBuilt:
    @pytest.mark.parametrize("bo", ["II", "MM"])
    def test_grey_uncompressed_both_orders(self, bo):
        band = np.arange(48, dtype=np.uint8).reshape(6, 8)
        ds = read_geotiff(_build_tiff(band, byte_order=bo))
        assert (ds.band == band).all()
        assert ds.transform is None and ds.nodata is None

    def test_multi_strip(self):
        band = np.arange(120, dtype=np.uint8).reshape(12, 10)
        ds = read_geotiff(_build_tiff(band, rows_per_strip=5))
        assert (ds.band == band).all()

    @pytest.mark.parametrize("dt", ["uint16", "int16", "int32",
                                    "float32", "float64"])
    def test_typed_bands(self, dt):
        rng = np.random.default_rng(4)
        band = rng.integers(0, 1000, (7, 9)).astype(dt)
        ds = read_geotiff(_build_tiff(band))
        assert ds.band.dtype == np.dtype(dt)
        assert (ds.band == band).all()

    def test_typed_band_big_endian(self):
        band = np.arange(20, dtype=np.uint16).reshape(4, 5) * 300
        ds = read_geotiff(_build_tiff(band, byte_order="MM"))
        assert (ds.band == band).all()

    def test_rgb_interleaved(self):
        rng = np.random.default_rng(6)
        band = rng.integers(0, 256, (5, 4, 3)).astype(np.uint8)
        ds = read_geotiff(_build_tiff(band))
        assert ds.band.shape == (5, 4, 3)
        assert (ds.band == band).all()
        assert (ds.read(2) == band[..., 1]).all()

    def test_geotransform_and_nodata(self):
        band = np.ones((4, 4), np.uint8)
        ds = read_geotiff(
            _build_tiff(
                band,
                pixel_scale=(0.5, 0.25, 0.0),
                tiepoint=(0.0, 0.0, 0.0, 10.0, 50.0, 0.0),
                nodata="7",
            )
        )
        a, b, c, d, e_, f = ds.transform
        assert (a, b, c) == (0.5, 0.0, 10.0)
        assert (d, e_, f) == (0.0, -0.25, 50.0)
        assert ds.nodata == 7.0

    def test_packbits(self):
        band = np.repeat(
            np.arange(8, dtype=np.uint8)[:, None], 16, axis=1
        )
        # encode each row: 16 repeats -> (257-16=0xF1? signed -15) pair
        payload = b"".join(bytes([0xF1, v]) for v in band[:, 0])
        ds = read_geotiff(
            _build_tiff(band, compression=32773, payload=payload)
        )
        assert (ds.band == band).all()

    def test_predictor2(self):
        band = np.array([[10, 13, 13, 20], [5, 5, 6, 7]], np.uint8)
        diffed = np.diff(band.astype(np.int16), axis=1)
        stored = np.concatenate(
            [band[:, :1].astype(np.int16), diffed], axis=1
        ).astype(np.uint8)
        ds = read_geotiff(
            _build_tiff(band, predictor=2, payload=stored.tobytes())
        )
        assert (ds.band == band).all()

    def _build_tiled(self, band, tile_w, tile_h, byte_order="II"):
        """Hand-assembled tiled TIFF (uncompressed): full-size tiles
        with zero padding at the right/bottom edges."""
        e = "<" if byte_order == "II" else ">"
        h, w = band.shape
        tiles_x = (w + tile_w - 1) // tile_w
        tiles_y = (h + tile_h - 1) // tile_h
        tiles = []
        for ty in range(tiles_y):
            for tx in range(tiles_x):
                t = np.zeros((tile_h, tile_w), band.dtype)
                part = band[
                    ty * tile_h : (ty + 1) * tile_h,
                    tx * tile_w : (tx + 1) * tile_w,
                ]
                t[: part.shape[0], : part.shape[1]] = part
                tiles.append(t.tobytes())
        n_tiles = len(tiles)
        entries = [
            (256, 3, 1, [w]), (257, 3, 1, [h]), (258, 3, 1, [8]),
            (259, 3, 1, [1]), (262, 3, 1, [1]), (277, 3, 1, [1]),
            (339, 3, 1, [1]), (322, 3, 1, [tile_w]),
            (323, 3, 1, [tile_h]),
        ]
        n = len(entries) + 2
        ifd_size = 2 + 12 * n + 4
        tables_pos = 8 + ifd_size
        data_pos = tables_pos + 8 * n_tiles
        offs, cur = [], data_pos
        for t in tiles:
            offs.append(cur)
            cur += len(t)
        if n_tiles == 1:
            entries.append((324, 4, 1, [offs[0]]))
            entries.append((325, 4, 1, [len(tiles[0])]))
            data_pos = tables_pos
            offs = [data_pos]
            entries[-2] = (324, 4, 1, [data_pos])
            tables_raw = b""
        else:
            entries.append((324, 4, n_tiles, None))
            entries.append((325, 4, n_tiles, None))
            tables_raw = b"".join(
                struct.pack(e + "I", o) for o in offs
            ) + b"".join(struct.pack(e + "I", len(t)) for t in tiles)
        ifd = struct.pack(e + "H", n)
        for tag, typ, cnt, vals in sorted(entries, key=lambda x: x[0]):
            if vals is None:  # out-of-line table
                ptr = tables_pos if tag == 324 else tables_pos + 4 * n_tiles
                ifd += struct.pack(e + "HHI", tag, typ, cnt)
                ifd += struct.pack(e + "I", ptr)
            else:
                raw = b"".join(
                    struct.pack(e + {3: "H", 4: "I"}[typ], v)
                    for v in vals
                ).ljust(4, b"\x00")
                ifd += struct.pack(e + "HHI", tag, typ, cnt) + raw
        ifd += struct.pack(e + "I", 0)
        blob = byte_order.encode() + struct.pack(e + "H", 42)
        blob += struct.pack(e + "I", 8) + ifd + tables_raw
        for t in tiles:
            blob += t
        return blob

    def test_tiled_exact_grid(self):
        band = np.arange(16, dtype=np.uint8).reshape(4, 4)
        got = read_geotiff(self._build_tiled(band, 2, 2))
        assert (got.band == band).all()

    def test_tiled_padded_edges(self):
        """5x7 image with 4x4 tiles: right/bottom tiles padded."""
        rng = np.random.default_rng(51)
        band = rng.integers(0, 256, (5, 7)).astype(np.uint8)
        got = read_geotiff(self._build_tiled(band, 4, 4))
        assert got.band.shape == (5, 7)
        assert (got.band == band).all()

    def test_tiled_single_tile(self):
        band = np.arange(12, dtype=np.uint8).reshape(3, 4)
        got = read_geotiff(self._build_tiled(band, 4, 4))
        assert got.band.shape == (3, 4)
        assert (got.band == band).all()

    def test_bad_signature(self):
        with pytest.raises(ValueError, match="byte-order"):
            read_geotiff(b"XX\x2a\x00")

    def test_bigtiff_raises(self):
        with pytest.raises(NotImplementedError, match="BigTIFF"):
            read_geotiff(b"II\x2b\x00" + b"\x00" * 12)


class TestLzwTiff:
    def test_spec_early_change_and_decode(self):
        """Round-trip against an independent minimal TIFF-LZW encoder
        implemented inline (MSB-first, early change)."""

        def enc(data: bytes) -> bytes:
            CLEAR, EOI = 256, 257
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
            out = bytearray()
            acc = 0
            nbits = 0

            def emit(code, wdt):
                nonlocal acc, nbits
                acc = (acc << wdt) | code
                nbits += wdt
                while nbits >= 8:
                    out.append((acc >> (nbits - 8)) & 0xFF)
                    nbits -= 8

            emit(CLEAR, width)
            cur = b""
            for i in range(len(data)):
                nxt = cur + data[i : i + 1]
                if nxt in table:
                    cur = nxt
                    continue
                emit(table[cur], width)
                table[nxt] = next_code
                next_code += 1
                if next_code >= 4094:  # spec: CLEAR at code 4094
                    emit(CLEAR, width)
                    table = {bytes([j]): j for j in range(256)}
                    next_code, width = 258, 9
                elif next_code == (1 << width) - 1 and width < 12:
                    width += 1
                cur = data[i : i + 1]
            if cur:
                emit(table[cur], width)
            emit(EOI, width)
            if nbits:
                out.append((acc << (8 - nbits)) & 0xFF)
            return bytes(out)

        rng = np.random.default_rng(21)
        data = rng.integers(0, 40, 20000).astype(np.uint8).tobytes()
        assert _lzw_decode_tiff(enc(data), len(data)) == data

    def test_packbits_noop_128(self):
        assert _packbits_decode(b"\x80\x00\x41", 1) == b"A"


@pytest.mark.skipif(
    not os.path.exists(_R_TIFF), reason="reference checkout absent"
)
class TestReferenceFiles:
    def test_r_tiff_decodes(self):
        """The file the reference's own test_r_tiff reads via rasterio
        (h3ronpy/tests/arrow/test_raster.py:21-27): 2000x2000 grey,
        LZW strips, GDAL_NODATA '0', WGS84 transform near 8.1E 49.4N."""
        ds = read_geotiff(open(_R_TIFF, "rb").read())
        assert ds.band.shape == (2000, 2000)
        assert ds.band.dtype == np.uint8
        assert set(np.unique(ds.band)) == {0, 1}
        assert ds.nodata == 0.0
        a, b, c, d, e_, f = ds.transform
        assert b == d == 0.0
        assert 8.0 < c < 8.3 and 49.3 < f < 49.5
        assert a > 0 and e_ < 0

    def test_r_tiff_raster_to_dataframe_parity(self):
        """Mirror of the reference's test_r_tiff assertion chain,
        rasterio swapped for read_geotiff: > 100 compacted cells."""
        from h3ronpy_spark.pandas_api import raster_to_dataframe

        ds = read_geotiff(open(_R_TIFF, "rb").read())
        df = raster_to_dataframe(
            ds.read(1), ds.transform, 8, nodata_value=0, compact=True
        )
        assert len(df) > 100
        assert df["value"].dtype == np.uint8
        # every surviving value is the foreground class
        assert (df["value"] == 1).all()

    def test_europe_rgb_decodes(self):
        ds = read_geotiff(open(_EU_TIFF, "rb").read())
        assert ds.band.shape == (284, 327, 3)
        a, b, c, d, e_, f = ds.transform
        assert c == -40.078125 and f == 75.234375


class TestRegistrySeam:
    def test_tiff_codec_adapter(self):
        from h3ronpy_spark.sources.geotiff import tiff_codec
        from h3ronpy_spark.sources.images import decode_image_with

        band = np.arange(30, dtype=np.uint8).reshape(5, 6)
        blob = _build_tiff(band)
        got = decode_image_with({"tiff": tiff_codec}, blob, 6, 5, "tiff")
        assert (got == band).all()


class TestWriter:
    @pytest.mark.parametrize("dt", ["uint8", "uint16", "int32",
                                    "float32", "float64"])
    def test_write_read_roundtrip(self, dt):
        from h3ronpy_spark.sources.geotiff import write_geotiff

        rng = np.random.default_rng(31)
        band = rng.integers(0, 200, (70, 9)).astype(dt)
        tr = (0.01, 0.0, 8.0, 0.0, -0.02, 49.0)
        ds = read_geotiff(write_geotiff(band, tr, nodata=0))
        assert (ds.band == band).all() and ds.band.dtype == band.dtype
        assert ds.nodata == 0.0
        assert all(abs(x - y) < 1e-12 for x, y in zip(ds.transform, tr))

    def test_write_multi_strip_rgb(self):
        from h3ronpy_spark.sources.geotiff import write_geotiff

        rng = np.random.default_rng(33)
        band = rng.integers(0, 256, (200, 13, 3)).astype(np.uint8)
        ds = read_geotiff(write_geotiff(band, rows_per_strip=16))
        assert (ds.band == band).all()

    def test_rotated_transform_rejected(self):
        from h3ronpy_spark.sources.geotiff import write_geotiff

        with pytest.raises(ValueError, match="rotated"):
            write_geotiff(
                np.zeros((2, 2), np.uint8), (1, 0.1, 0, 0, -1, 0)
            )

    def test_raster_to_dataframe_write_read_cycle(self):
        """rasterize -> write -> read -> raster_to_dataframe: the same
        export-import cycle the reference runs through rasterio's GTiff
        driver (test_raster.py write_gtiff)."""
        from h3ronpy_spark.pandas_api import raster_to_dataframe
        from h3ronpy_spark.sources.geotiff import write_geotiff

        band = np.zeros((60, 60), np.uint8)
        band[20:40, 10:50] = 3
        tr = (0.01, 0.0, 8.0, 0.0, -0.01, 49.5)
        ds = read_geotiff(write_geotiff(band, tr, nodata=0))
        df = raster_to_dataframe(
            ds.read(1), ds.transform, 10, nodata_value=ds.nodata,
            compact=True,
        )
        df2 = raster_to_dataframe(
            band, tr, 10, nodata_value=0, compact=True
        )
        assert len(df) == len(df2) > 0
        assert sorted(df["cell"]) == sorted(df2["cell"])


class TestDeflate:
    def test_deflate_strip(self):
        import zlib

        rng = np.random.default_rng(41)
        band = rng.integers(0, 256, (11, 7)).astype(np.uint8)
        ds = read_geotiff(
            _build_tiff(
                band, compression=8, payload=zlib.compress(band.tobytes())
            )
        )
        assert (ds.band == band).all()

    def test_deflate_old_code_with_predictor(self):
        import zlib

        band = np.cumsum(
            np.arange(40, dtype=np.uint8).reshape(5, 8), axis=1
        ).astype(np.uint8)
        diffed = np.concatenate(
            [band[:, :1].astype(np.int16),
             np.diff(band.astype(np.int16), axis=1)], axis=1
        ).astype(np.uint8)
        ds = read_geotiff(
            _build_tiff(
                band, compression=32946, predictor=2,
                payload=zlib.compress(diffed.tobytes()),
            )
        )
        assert (ds.band == band).all()
