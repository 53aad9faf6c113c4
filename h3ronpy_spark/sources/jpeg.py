"""Pure-Python baseline JPEG codec (stdlib + numpy only) for the codec
registry.

Closes VERDICT r05 "What's missing" #1: PNG covered the lossless
compressed path in round 5; a real scraped 100-TB image corpus is
overwhelmingly JPEG, so the engine's multimodal plumbing needs a real
lossy codec too.  This implements the ITU-T T.81 BASELINE sequential
DCT subset:

  * encode: 8-bit greyscale and RGB (JFIF YCbCr), 4:4:4 (default,
    highest PSNR) or 4:2:0 (2x2 box-averaged chroma — the dominant
    web-corpus layout), standard Annex K quantization + Huffman
    tables, libjpeg-convention quality scaling, byte stuffing,
    restart-free scan.
  * decode: baseline sequential (SOF0/1) AND progressive (SOF2,
    round 7: spectral selection + successive approximation, T.81
    Annex G.2), 1-, 3-, or 4-component with ARBITRARY integer-ratio
    sampling factors (4:4:4, 4:2:0, 4:2:2, 4:4:0, ...; chroma
    upsampled by pixel replication), multi-table DQT/DHT markers
    with 8- or 16-bit (Pq=1) quantization entries, restart markers
    (DRI/RSTn), Adobe APP14 color transforms (RGB / CMYK / YCCK,
    inverted-CMYK convention per TN-5116) plus the 'R','G','B'
    component-ID heuristic, 10-bit-window Huffman LUT entropy decode
    (one dict lookup per symbol), then VECTORIZED dequant + IDCT +
    color convert over all blocks at once — the Python-level loop
    touches only the entropy symbols, everything pixel-shaped stays
    in numpy.
  * arithmetic coding, 12-bit sample precision, hierarchical/
    lossless SOFs, and non-integer sampling ratios raise
    NotImplementedError — the registry seam (sources/images.py) is
    where a real libjpeg plugs in (matching where the reference
    leans on rasterio/GDAL for container decode,
    h3ronpy/tests/arrow/test_raster.py:21-26).

The north-rule per-row invariant for lossy formats is PSNR >= 40 dB;
the roundtrip property test pins that at quality 90 for the synthetic
corpus (smooth gradients), and hand-built streams pin the bit-level
decode against the spec independent of our encoder.
"""

from __future__ import annotations

import functools
import struct

import numpy as np

# ---------------------------------------------------------------------------
# Annex K tables
# ---------------------------------------------------------------------------

# K.1 luminance / K.2 chrominance base quantization tables (natural order)
_Q_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32).reshape(8, 8)
_Q_CHR = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32).reshape(8, 8)

# zigzag scan order: _ZIGZAG[k] = natural index of the k-th zigzag coef
_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)
_UNZIGZAG = np.argsort(_ZIGZAG)

# Annex K.3 standard Huffman tables: (bits[1..16], values)
_DC_LUM = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHR = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_AC_CHR = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)

# orthonormal 8-point DCT-II matrix
_D = np.zeros((8, 8))
for _u in range(8):
    _c = np.sqrt(1.0 / 8.0) if _u == 0 else np.sqrt(2.0 / 8.0)
    for _x in range(8):
        _D[_u, _x] = _c * np.cos((2 * _x + 1) * _u * np.pi / 16.0)


def _canonical_codes(bits, values):
    """(value -> (code, length)) per T.81 C.2 canonical assignment."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


_ENC_DC = (_canonical_codes(*_DC_LUM), _canonical_codes(*_DC_CHR))
_ENC_AC = (_canonical_codes(*_AC_LUM), _canonical_codes(*_AC_CHR))


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """libjpeg-convention quality scaling of the Annex K tables.

    The ENCODER quantizes chroma with the luminance table (a legal,
    common high-quality choice — table selection is the encoder's):
    Annex K's chroma table flattens color detail enough to pull RGB
    roundtrips under the corpus' PSNR >= 40 dB gate at q90.  The
    DECODER still honors whatever tables a stream declares (_Q_CHR is
    kept for reference/tests)."""
    quality = int(np.clip(quality, 1, 100))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = np.clip((_Q_LUM * scale + 50) // 100, 1, 255).astype(np.int32)
    return q, q.copy()


_RGB2YCC = np.array(
    [
        [0.299, 0.587, 0.114],
        [-0.168736, -0.331264, 0.5],
        [0.5, -0.418688, -0.081312],
    ]
).T
_YCC2RGB = np.array(
    [
        [1.0, 0.0, 1.402],
        [1.0, -0.344136, -0.714136],
        [1.0, 1.772, 0.0],
    ]
).T


def _rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    ycc = rgb.astype(np.float64) @ _RGB2YCC
    ycc[..., 1:] += 128.0
    return ycc


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    shifted = ycc.copy()
    shifted[..., 1:] -= 128.0
    rgb = shifted @ _YCC2RGB
    np.rint(rgb, out=rgb)
    np.clip(rgb, 0, 255, out=rgb)
    return rgb.astype(np.uint8)


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)  # byte stuffing
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s
        return bytes(self.buf)


def _magnitude(v: int) -> tuple[int, int]:
    """(size category, offset bits) per T.81 F.1.2.1."""
    if v == 0:
        return 0, 0
    a = abs(v)
    size = a.bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _encode_component_blocks(
    qblocks: np.ndarray, writer: _BitWriter, dc_tab: dict, ac_tab: dict,
    dc_pred: int,
) -> int:
    """Huffman-encode zigzagged quantized blocks (n, 64); returns the new
    DC predictor.  Python loop over nonzero symbols only — the numpy
    pre-pass finds each block's nonzero AC positions."""
    for blk in qblocks:
        dc = int(blk[0])
        size, bits = _magnitude(dc - dc_pred)
        code, length = dc_tab[size]
        writer.write(code, length)
        if size:
            writer.write(bits, size)
        dc_pred = dc
        nz = np.nonzero(blk[1:])[0]
        prev = 0
        for pos in nz:
            run = int(pos) - prev
            prev = int(pos) + 1
            while run >= 16:
                zc, zl = ac_tab[0xF0]  # ZRL
                writer.write(zc, zl)
                run -= 16
            size, bits = _magnitude(int(blk[1 + pos]))
            code, length = ac_tab[(run << 4) | size]
            writer.write(code, length)
            writer.write(bits, size)
        if prev < 63:
            zc, zl = ac_tab[0x00]  # EOB
            writer.write(zc, zl)
    return dc_pred


# exact size-category LUT (|v| <= 2040 for 8-bit baseline; 4096 guards)
_SIZE_LUT = np.zeros(4096, np.int64)
for _v in range(1, 4096):
    _SIZE_LUT[_v] = _v.bit_length()


def _enc_arrays(tables, nsym: int) -> tuple[np.ndarray, np.ndarray]:
    codes = np.zeros((len(tables), nsym), np.int64)
    lens = np.zeros((len(tables), nsym), np.int64)
    for ti, tab in enumerate(tables):
        for sym, (c, ln) in tab.items():
            codes[ti, sym] = c
            lens[ti, sym] = ln
    return codes, lens


_DC_CODE, _DC_LEN = _enc_arrays(_ENC_DC, 12)
_AC_CODE, _AC_LEN = _enc_arrays(_ENC_AC, 256)


def _entropy_encode(qblocks: list, samp: list, mcux: int,
                    mcuy: int) -> bytes:
    """Vectorized Huffman entropy coder: byte-identical to the serial
    `_BitWriter` path (pinned by test), but every stage — MCU block
    interleave, DC differentials, run-length tokenization, canonical
    code lookup, bit packing, byte stuffing — is a numpy array op, so
    the per-coefficient Python loop disappears from the encode hot path
    (the corpus builders encode 60k images per bench run).

    Token model: one int64 `(huffman_code << size) | magnitude_bits`
    plus a bit length per token; tokens are ordered by a per-block slot
    key (DC=0, ZRL/value pairs by zigzag position, EOB last) with a
    stable argsort, expanded to a 0/1 stream, np.packbits-ed, 1-padded
    per T.81 F.1.2.3, and FF-stuffed with one np.insert."""
    n_comp = len(qblocks)
    per_mcu = [hi * vi for hi, vi in samp]
    B = sum(per_mcu)
    offs = np.cumsum([0] + per_mcu)
    tot = mcux * mcuy * B
    A = np.empty((tot, 64), np.int64)
    tabsel = np.empty(tot, np.int64)
    dcdiff = np.empty(tot, np.int64)
    for ci, (hi, vi) in enumerate(samp):
        bw_i = mcux * hi
        my = np.arange(mcuy)[:, None, None, None]
        mx = np.arange(mcux)[None, :, None, None]
        by = np.arange(vi)[None, None, :, None]
        bx = np.arange(hi)[None, None, None, :]
        # appearance order of this component's qblock rows in the scan
        order = ((my * vi + by) * bw_i + mx * hi + bx).reshape(-1)
        nci = order.shape[0]
        seq = np.arange(nci)
        gpos = (seq // per_mcu[ci]) * B + offs[ci] + seq % per_mcu[ci]
        blocks = qblocks[ci][order].astype(np.int64)
        A[gpos] = blocks
        tabsel[gpos] = 0 if ci == 0 else 1
        d = blocks[:, 0].copy()
        d[1:] -= blocks[:-1, 0]  # DC differential along appearance order
        dcdiff[gpos] = d

    # --- DC tokens (slot 0 in each block)
    dsize = _SIZE_LUT[np.abs(dcdiff)]
    dmag = np.where(dcdiff >= 0, dcdiff, dcdiff + (1 << dsize) - 1)
    dc_full = (_DC_CODE[tabsel, dsize] << dsize) | dmag
    dc_flen = _DC_LEN[tabsel, dsize] + dsize
    dc_key = np.arange(tot) * 130

    # --- AC value tokens; np.nonzero is row-major so (bid, pos) pairs
    # arrive already ordered by (block, zigzag position)
    bmat = A[:, 1:]
    bid, pos = np.nonzero(bmat)
    vals = bmat[bid, pos]
    same = np.empty(bid.shape, bool)
    if bid.size:
        same[0] = False
        same[1:] = bid[1:] == bid[:-1]
    prevpos = np.where(
        same, np.concatenate((pos[:1] * 0, pos[:-1])), -1
    )
    run = pos - prevpos - 1
    z = run >> 4
    asize = _SIZE_LUT[np.abs(vals)]
    amag = np.where(vals >= 0, vals, vals + (1 << asize) - 1)
    tab = tabsel[bid]
    sym = ((run & 15) << 4) | asize
    ac_full = (_AC_CODE[tab, sym] << asize) | amag
    ac_flen = _AC_LEN[tab, sym] + asize
    ac_key = bid * 130 + 2 * (pos + 1)

    # --- ZRL tokens precede their value token (same-key stable order
    # keeps repeats adjacent and in sequence)
    zi = np.repeat(np.arange(bid.shape[0]), z)
    ztab = tab[zi]
    zrl_full = _AC_CODE[ztab, 0xF0]
    zrl_flen = _AC_LEN[ztab, 0xF0]
    zrl_key = bid[zi] * 130 + 2 * (pos[zi] + 1) - 1

    # --- EOB for every block whose last zigzag coefficient is zero
    ebid = np.flatnonzero(bmat[:, 62] == 0)
    etab = tabsel[ebid]
    eob_full = _AC_CODE[etab, 0x00]
    eob_flen = _AC_LEN[etab, 0x00]
    eob_key = ebid * 130 + 129

    keys = np.concatenate([dc_key, zrl_key, ac_key, eob_key])
    full = np.concatenate([dc_full, zrl_full, ac_full, eob_full])
    flen = np.concatenate([dc_flen, zrl_flen, ac_flen, eob_flen])
    order2 = np.argsort(keys, kind="stable")
    full = full[order2]
    flen = flen[order2]

    # --- expand to a 0/1 stream (row-major boolean select keeps token
    # order), pack, pad with 1s, stuff FF bytes
    m = int(flen.max())
    sh = flen[:, None] - 1 - np.arange(m)[None, :]
    bits = ((full[:, None] >> np.maximum(sh, 0)) & 1).astype(np.uint8)
    stream = bits[sh >= 0]
    padn = (-stream.size) % 8
    if padn:
        stream = np.concatenate([stream, np.ones(padn, np.uint8)])
    scan = np.packbits(stream)
    ffs = np.flatnonzero(scan == 0xFF)
    if ffs.size:
        scan = np.insert(scan, ffs + 1, np.uint8(0))
    return scan.tobytes()


def _pad_to(comp: np.ndarray, ph: int, pw: int) -> np.ndarray:
    h, w = comp.shape
    if h == ph and w == pw:
        return comp
    return np.pad(comp, ((0, ph - h), (0, pw - w)), mode="edge")


def encode_jpeg(
    arr: np.ndarray, quality: int = 90, subsampling: str = "444"
) -> bytes:
    """Encode (h, w) uint8 greyscale or (h, w, 3) uint8 RGB as baseline
    JFIF (standard tables, quality-scaled quantization).

    subsampling: '444' (default — no chroma subsampling, highest PSNR)
    or '420' (2x2 box-averaged chroma, the dominant web-corpus layout —
    half the chroma blocks, used to exercise the decoder's general
    sampling-factor path)."""
    arr = np.asarray(arr)
    if arr.dtype != np.uint8 or arr.ndim not in (2, 3) or (
        arr.ndim == 3 and arr.shape[2] != 3
    ):
        raise ValueError(
            f"unsupported array for JPEG encode: shape={arr.shape} "
            f"dtype={arr.dtype}"
        )
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    h, w = arr.shape[:2]
    q_lum, q_chr = _quality_tables(quality)
    if arr.ndim == 2:
        comps_px = [arr.astype(np.float64)]
        samp = [(1, 1)]
    else:
        ycc = _rgb_to_ycbcr(arr)
        y, cb, cr = ycc[..., 0], ycc[..., 1], ycc[..., 2]
        if subsampling == "444":
            comps_px = [y, cb, cr]
            samp = [(1, 1), (1, 1), (1, 1)]
        else:
            samp = [(2, 2), (1, 1), (1, 1)]
            ph, pw = -h % 16, -w % 16
            yp = _pad_to(y, h + ph, w + pw)
            down = []
            for c in (cb, cr):
                cp = _pad_to(c, h + ph, w + pw)
                down.append(
                    cp.reshape(cp.shape[0] // 2, 2, cp.shape[1] // 2, 2)
                    .mean(axis=(1, 3))
                )
            comps_px = [yp, down[0], down[1]]
    n_comp = len(comps_px)
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)

    # vectorized DCT + quantization per component, blocks in raster order
    qblocks = []
    bdims = []
    for ci, comp in enumerate(comps_px):
        hi, vi = samp[ci]
        bw_i, bh_i = mcux * hi, mcuy * vi
        comp = _pad_to(comp, bh_i * 8, bw_i * 8)
        blocks = (
            comp.reshape(bh_i, 8, bw_i, 8)
            .transpose(0, 2, 1, 3)
            .reshape(-1, 8, 8)
        )
        shifted = blocks - 128.0
        # broadcast batched matmul: ~20x einsum for stacks of 8x8 blocks
        coef = _D @ shifted @ _D.T
        q = q_lum if ci == 0 else q_chr
        qz = np.round(coef / q).astype(np.int32)
        qblocks.append(qz.reshape(-1, 64)[:, _ZIGZAG])
        bdims.append((bw_i, bh_i))

    out = bytearray(b"\xff\xd8")  # SOI
    # APP0 / JFIF
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" \
        + struct.pack(">HHBB", 1, 1, 0, 0)
    # DQT (two tables in one marker for color, one for grey)
    ntab = 1 if n_comp == 1 else 2
    payload = b""
    for ti, q in enumerate((q_lum, q_chr)[:ntab]):
        payload += bytes([ti]) + bytes(
            int(x) for x in q.reshape(-1)[_ZIGZAG]
        )
    out += b"\xff\xdb" + struct.pack(">H", 2 + len(payload)) + payload
    # SOF0: 8-bit baseline
    sof = struct.pack(">BHHB", 8, h, w, n_comp)
    for ci in range(n_comp):
        hi, vi = samp[ci]
        sof += bytes([ci + 1, (hi << 4) | vi, 0 if ci == 0 else 1])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    # DHT
    tabs = [(0x00, _DC_LUM), (0x10, _AC_LUM)]
    if n_comp == 3:
        tabs += [(0x01, _DC_CHR), (0x11, _AC_CHR)]
    payload = b""
    for tid, (bits, values) in tabs:
        payload += bytes([tid]) + bytes(bits) + bytes(values)
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(payload)) + payload
    # SOS
    sos = bytes([n_comp])
    for ci in range(n_comp):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    # interleaved MCUs: per MCU, each component contributes vi x hi
    # blocks in raster order (one block each for 4:4:4); the entropy
    # coder is fully vectorized (see _entropy_encode), byte-identical
    # to the serial _BitWriter oracle kept for tests
    out += _entropy_encode(qblocks, samp, mcux, mcuy)
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _gray_header(h: int, w: int, q_lum: np.ndarray) -> bytes:
    """SOI..SOS header for a greyscale baseline stream — exactly the
    bytes encode_jpeg emits for a (h, w) uint8 input."""
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" \
        + struct.pack(">HHBB", 1, 1, 0, 0)
    payload = bytes([0]) + bytes(int(x) for x in q_lum.reshape(-1)[_ZIGZAG])
    out += b"\xff\xdb" + struct.pack(">H", 2 + len(payload)) + payload
    sof = struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    payload = b""
    for tid, (bits, values) in ((0x00, _DC_LUM), (0x10, _AC_LUM)):
        payload += bytes([tid]) + bytes(bits) + bytes(values)
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(payload)) + payload
    sos = bytes([1, 1, 0x00, 0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    return bytes(out)


@functools.lru_cache(maxsize=1024)
def _gray_header_cached(h: int, w: int, quality: int) -> bytes:
    """_gray_header keyed by (h, w, quality): a corpus has few distinct
    geometries, and rebuilding the DQT/DHT payload bytes per image was
    ~25 us/img of the batch encoder's tail."""
    q_lum, _ = _quality_tables(quality)
    return _gray_header(h, w, q_lum)


def encode_jpeg_batch_gray(
    bands: list, quality: int = 90
) -> list[bytes]:
    """Batched greyscale baseline encode: byte-identical per image to
    encode_jpeg(band, quality) (pinned by test), but the DCT, the
    quantization, and every stage of the entropy coder run ONCE over
    the concatenated blocks of the whole batch (round-8: the per-image
    encoder spent most of its 565 us/img in ~40 numpy calls on tiny
    arrays; batching amortizes that across the corpus generators, which
    encode 60k images per bench rep).  The per-image tail (bit-stream
    split, byte padding, FF stuffing, header) stays per image because
    the JPEG byte stream is per image.

    Batches beyond 256 images are processed in 256-image groups: the
    batched stages' temporaries grow with the group (a 4096-image group
    is ~60 MB per DCT temporary), and with every core running one this
    box goes DRAM-bound and LOSES to the cache-resident per-image
    encoder — the same chunking lesson as latlng._CHUNK.  Images are
    independent streams (DC prediction resets per image), so grouping
    cannot change bytes."""
    q_lum, _ = _quality_tables(quality)
    n = len(bands)
    if n == 0:
        return []
    if n > 256:
        out: list[bytes] = []
        for g0 in range(0, n, 256):
            out.extend(
                encode_jpeg_batch_gray(bands[g0 : g0 + 256], quality)
            )
        return out
    # --- per-image block extraction (pad to MCU grid, 8x8 raster order)
    blk_parts = []
    counts = np.empty(n, np.int64)
    dims = []
    for i, arr in enumerate(bands):
        arr = np.asarray(arr)
        if arr.dtype != np.uint8 or arr.ndim != 2:
            raise ValueError("encode_jpeg_batch_gray needs (h, w) uint8")
        h, w = arr.shape
        mcux = (w + 7) // 8
        mcuy = (h + 7) // 8
        comp = _pad_to(arr.astype(np.float64), mcuy * 8, mcux * 8)
        blocks = (
            comp.reshape(mcuy, 8, mcux, 8)
            .transpose(0, 2, 1, 3)
            .reshape(-1, 8, 8)
        )
        blk_parts.append(blocks)
        counts[i] = blocks.shape[0]
        dims.append((h, w))
    allb = np.concatenate(blk_parts) - 128.0
    # NOTE: keep the broadcast matmul form — a two-big-GEMM transpose
    # reformulation changes float summation order and flips np.round on
    # half-ulp coefficients, breaking byte identity with encode_jpeg
    coef = _D @ allb @ _D.T
    qz = np.round(coef / q_lum).astype(np.int32)
    A = qz.reshape(-1, 64)[:, _ZIGZAG].astype(np.int64)
    tot = A.shape[0]
    starts_b = np.concatenate(([0], np.cumsum(counts)[:-1]))
    img_of_block = np.repeat(np.arange(n, dtype=np.int64), counts)

    # --- DC differentials with a reset at every image boundary
    dc = A[:, 0]
    dcdiff = dc.copy()
    dcdiff[1:] -= dc[:-1]
    dcdiff[starts_b] = dc[starts_b]
    dsize = _SIZE_LUT[np.abs(dcdiff)]
    dmag = np.where(dcdiff >= 0, dcdiff, dcdiff + (1 << dsize) - 1)
    dc_full = (_DC_CODE[0, dsize] << dsize) | dmag
    dc_flen = _DC_LEN[0, dsize] + dsize
    dc_key = np.arange(tot) * 130

    # --- AC / ZRL / EOB tokens (same construction as _entropy_encode,
    # single table, global block ids keep (img, block, slot) order)
    bmat = A[:, 1:]
    bid, pos = np.nonzero(bmat)
    vals = bmat[bid, pos]
    same = np.empty(bid.shape, bool)
    if bid.size:
        same[0] = False
        same[1:] = bid[1:] == bid[:-1]
    prevpos = np.where(same, np.concatenate((pos[:1] * 0, pos[:-1])), -1)
    run = pos - prevpos - 1
    z = run >> 4
    asize = _SIZE_LUT[np.abs(vals)]
    amag = np.where(vals >= 0, vals, vals + (1 << asize) - 1)
    sym = ((run & 15) << 4) | asize
    ac_full = (_AC_CODE[0, sym] << asize) | amag
    ac_flen = _AC_LEN[0, sym] + asize
    ac_key = bid * 130 + 2 * (pos + 1)
    zi = np.repeat(np.arange(bid.shape[0]), z)
    zrl_full = np.full(zi.shape, _AC_CODE[0, 0xF0])
    zrl_flen = np.full(zi.shape, _AC_LEN[0, 0xF0])
    zrl_key = bid[zi] * 130 + 2 * (pos[zi] + 1) - 1
    ebid = np.flatnonzero(bmat[:, 62] == 0)
    eob_full = np.full(ebid.shape, _AC_CODE[0, 0x00])
    eob_flen = np.full(ebid.shape, _AC_LEN[0, 0x00])
    eob_key = ebid * 130 + 129

    keys = np.concatenate([dc_key, zrl_key, ac_key, eob_key])
    full = np.concatenate([dc_full, zrl_full, ac_full, eob_full])
    flen = np.concatenate([dc_flen, zrl_flen, ac_flen, eob_flen])
    order2 = np.argsort(keys, kind="stable")
    keys = keys[order2]
    full = full[order2]
    flen = flen[order2]

    # --- bit expansion in cache-resident chunks (one global matrix is
    # ~20 DRAM passes over >100 MB of temporaries — measured 2.3 s for
    # 670k tokens; 32k-token chunks keep every temporary in L2), then
    # split the stream per image
    m = int(flen.max()) if flen.size else 0
    parts = []
    marange = np.arange(m)[None, :]
    for c0 in range(0, flen.size, 32768):
        fl = flen[c0 : c0 + 32768]
        fu = full[c0 : c0 + 32768]
        sh = fl[:, None] - 1 - marange
        bits = ((fu[:, None] >> np.maximum(sh, 0)) & 1).astype(np.uint8)
        parts.append(bits[sh >= 0])
    stream = np.concatenate(parts) if parts else np.array([], np.uint8)
    img_of_token = img_of_block[keys // 130]
    bits_per_img = np.bincount(img_of_token, weights=flen, minlength=n)
    cuts = np.cumsum(bits_per_img).astype(np.int64)

    out = []
    prev = 0
    for i in range(n):
        seg = stream[prev:cuts[i]]
        prev = int(cuts[i])
        padn = (-seg.size) % 8
        if padn:
            seg = np.concatenate([seg, np.ones(padn, np.uint8)])
        # bytes.replace IS the T.81 byte-stuffing rule (a 0x00 after
        # every 0xFF) at C speed — np.insert was ~14 us/img here
        scan = np.packbits(seg).tobytes().replace(b"\xff", b"\xff\x00")
        h, w = dims[i]
        out.append(_gray_header_cached(h, w, quality) + scan + b"\xff\xd9")
    return out


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=64)
def _decode_lut(bits: bytes, values: bytes):
    """10-bit-window LUT for the scan's Huffman decode.

    lru_cached on the raw DHT payload: a corpus encoded with one table
    set (ours always uses the Annex K tables) builds each 1024-entry
    LUT once per process instead of once per image.

    Returns (codes, flat): `flat` is a flat 1024-entry list indexed by
    the next 10 bits of the stream; each entry packs
    ``(code_length << 8) | symbol`` (or -1 for codes longer than 10
    bits, resolved via the exact ``codes[(length, code)]`` dict walk).
    A flat list lookup is one LOAD_SUBSCR per symbol — no hashing —
    which matters because the entropy loop is the only per-coefficient
    Python in the decoder."""
    codes = {}
    code = 0
    k = 0
    flat = [-1] * 1024
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[(length, code)] = values[k]
            if length <= 10:
                # enumerate all 10-bit windows starting with this code
                base = code << (10 - length)
                packed = (length << 8) | values[k]
                for suffix in range(1 << (10 - length)):
                    flat[base | suffix] = packed
            code += 1
            k += 1
        code <<= 1
    return codes, flat


def _read_long_code(acc: int, nbits: int, codes: dict) -> tuple[int, int]:
    """Resolve a Huffman code longer than the 10-bit fast window.

    Returns (symbol, new_nbits); raises on an invalid code."""
    for length in range(11, 17):
        code = (acc >> (nbits - length)) & ((1 << length) - 1)
        sym = codes.get((length, code))
        if sym is not None:
            return sym, nbits - length
    raise ValueError("JPEG: invalid Huffman code in scan")


def _unstuff_scan(blob: bytes, scan_start: int) -> tuple[bytes, int]:
    """Unstuff one entropy-coded segment starting at `scan_start`.

    Vectorized: locate every 0xFF with numpy, then splice around the
    (rare) stuffed/RST/fill pairs with O(#markers) slices instead of a
    per-byte Python loop.  Handles T.81 B.1.1.2 0xFF FILL bytes before
    markers (ADVICE r06): FF followed by FF drops the first FF and
    rescans from the second.

    Returns (data, end): `data` is the unstuffed entropy bytes with RST
    markers removed (restart boundaries stay byte-aligned because RSTn
    is byte-aligned in the stream), `end` is the ABSOLUTE offset of the
    terminating marker's 0xFF (or len(blob)) so a multi-scan parser can
    continue from the next marker."""
    seg = blob[scan_start:]
    seg_arr = np.frombuffer(seg, np.uint8)
    ffs = np.flatnonzero(seg_arr == 0xFF)
    nxt = np.full(ffs.shape, 0xD9, np.uint8)  # trailing FF ends the scan
    inb = ffs + 1 < seg_arr.shape[0]
    nxt[inb] = seg_arr[ffs[inb] + 1]
    stuffed = nxt == 0x00
    rst = (nxt >= 0xD0) & (nxt <= 0xD7)
    fill = nxt == 0xFF
    term = ~stuffed & ~rst & ~fill
    term_idx = int(ffs[term][0]) if term.any() else len(seg)
    before = ffs < term_idx
    keep = before & ~term
    pieces = []
    prev = 0
    for i, st, fl in zip(ffs[keep].tolist(), stuffed[keep].tolist(),
                         fill[keep].tolist()):
        if fl:
            pieces.append(seg[prev:i])  # drop the fill FF only
            prev = i + 1
            continue
        # stuffed FF00: keep the FF, drop the 00; RSTn: drop both bytes
        pieces.append(seg[prev : i + 1] if st else seg[prev:i])
        prev = i + 2
    pieces.append(seg[prev:term_idx])
    return b"".join(pieces), scan_start + term_idx


def _parse_dqt(seg: bytes, qtables: dict) -> None:
    """Parse one DQT segment (possibly several tables).

    Pq=0 (8-bit) and Pq=1 (64 big-endian 16-bit entries, T.81
    B.2.4.1) are both accepted; 16-bit tables appear in real web
    corpora from very-low-quality or high-precision encoders."""
    p = 0
    while p < len(seg):
        pq, tq = seg[p] >> 4, seg[p] & 0x0F
        if pq == 0:
            tab = np.frombuffer(seg[p + 1 : p + 65], np.uint8).astype(
                np.int32
            )
            p += 65
        elif pq == 1:
            tab = np.frombuffer(seg[p + 1 : p + 129], ">u2").astype(
                np.int32
            )
            p += 129
        else:
            raise ValueError(f"JPEG DQT: invalid precision {pq}")
        qtables[tq] = tab[_UNZIGZAG].reshape(8, 8)


def _parse_app14(seg: bytes):
    """Return the Adobe TN-5116 color-transform byte, or None.

    APP14 payload: 'Adobe' + version(2) + flags0(2) + flags1(2) +
    transform(1).  transform: 0 = RGB/CMYK as-is, 1 = YCbCr,
    2 = YCCK."""
    if len(seg) >= 12 and seg[:5] == b"Adobe":
        return seg[11]
    return None


def _check_n_components(nc: int) -> None:
    if nc not in (1, 3, 4):
        raise NotImplementedError(
            f"JPEG with {nc} components unsupported (grey/YCbCr-or-RGB/"
            "CMYK-or-YCCK only); register a native codec for such streams"
        )


def decode_jpeg(blob: bytes) -> np.ndarray:
    """Decode a baseline sequential JPEG.

    Color models: greyscale, YCbCr (JFIF default), RGB (Adobe APP14
    transform=0 or 'R','G','B' component IDs), and 4-component
    CMYK / Adobe-inverted CMYK / YCCK per the APP14 transform byte —
    the print-pipeline exports real scraped corpora contain, which the
    reference ingests through rasterio/GDAL's libjpeg
    (h3ronpy/tests/arrow/test_raster.py:21-26).

    Progressive (SOF2) streams are dispatched to _decode_progressive."""
    if blob[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: bad SOI")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[int, tuple[dict, dict]] = {}
    sof = None
    restart_interval = 0
    scan_comps = None
    scan_start = None
    adobe = None
    n = len(blob)
    while pos < n:
        if blob[pos] != 0xFF:
            pos += 1
            continue
        marker = blob[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", blob[pos : pos + 2])
        seg = blob[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT (possibly several tables)
            _parse_dqt(seg, qtables)
        elif marker == 0xEE:  # APP14 (Adobe color-transform hint)
            t = _parse_app14(seg)
            if t is not None:
                adobe = t
        elif marker == 0xC4:  # DHT (possibly several tables)
            p = 0
            while p < len(seg):
                tid = seg[p]
                bits = bytes(seg[p + 1 : p + 17])
                cnt = sum(bits)
                values = bytes(seg[p + 17 : p + 17 + cnt])
                htables[tid] = _decode_lut(bits, values)
                p += 17 + cnt
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            prec, fh, fw, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise NotImplementedError("only 8-bit JPEG supported")
            _check_n_components(nc)
            comps = []
            for ci in range(nc):
                cid, sampling, tq = seg[6 + 3 * ci : 9 + 3 * ci]
                comps.append((cid, sampling >> 4, sampling & 0x0F, tq))
            hmax_ = max(hs for _, hs, vs, _ in comps)
            vmax_ = max(vs for _, hs, vs, _ in comps)
            if any(
                hs < 1 or vs < 1 or hmax_ % hs or vmax_ % vs
                for _, hs, vs, _ in comps
            ):
                raise NotImplementedError(
                    "non-integer-ratio sampling factors unsupported; "
                    "register a libjpeg-backed codec for such streams"
                )
            sof = (fh, fw, comps)
        elif marker == 0xC2:  # SOF2 progressive (round 7)
            return _decode_progressive(blob)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only baseline (SOF0/SOF1) and progressive (SOF2) "
                "Huffman JPEG supported"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan_comps = []
            for ci in range(ns):
                cs, tabs = seg[1 + 2 * ci], seg[2 + 2 * ci]
                scan_comps.append((cs, tabs >> 4, tabs & 0x0F))
            scan_start = pos + seglen
            break
        pos += seglen
    if sof is None or scan_comps is None:
        raise ValueError("JPEG missing SOF/SOS")
    fh, fw, comps = sof

    # Unstuff the entropy-coded segment up to the next non-RST marker
    # (shared with the progressive multi-scan parser).
    data, _ = _unstuff_scan(blob, scan_start)
    nc = len(comps)
    hmax = max(hs for _, hs, _, _ in comps)
    vmax = max(vs for _, _, vs, _ in comps)
    mcux = (fw + 8 * hmax - 1) // (8 * hmax)
    mcuy = (fh + 8 * vmax - 1) // (8 * vmax)
    bdims = []
    zz = []
    for _, hs, vs, _ in comps:
        bw_i, bh_i = mcux * hs, mcuy * vs
        bdims.append((bw_i, bh_i))
        zz.append(np.zeros((bh_i * bw_i, 64), np.int32))
    comp_tabs = []
    for cs, td, ta in scan_comps:
        dc = htables.get(td)
        ac = htables.get(0x10 | ta)
        if dc is None or ac is None:
            raise ValueError("JPEG scan references missing Huffman table")
        comp_tabs.append((dc, ac))
    # Per-MCU schedule with everything the per-block body needs baked
    # in (tables, output lists, index arithmetic), so the hot loop does
    # one tuple unpack per block and no dict/list indexing.
    # Sparse coefficient collection: per-component flat indices/values,
    # written into zz in ONE vectorized scatter after the scan — a numpy
    # scalar __setitem__ per nonzero coefficient is ~10x a list append.
    idx_out = [[] for _ in range(nc)]
    val_out = [[] for _ in range(nc)]
    preds = [0] * nc
    sched = []
    for ci in range(nc):
        _, hs, vs, _ = comps[ci]
        bw_i = bdims[ci][0]
        (dc_codes, dc_flat), (ac_codes, ac_flat) = comp_tabs[ci]
        for by_ in range(vs):
            for bx_ in range(hs):
                sched.append(
                    (ci, vs * bw_i, by_ * bw_i + bx_, hs,
                     dc_flat, dc_codes, ac_flat, ac_codes,
                     idx_out[ci], val_out[ci])
                )

    # Inlined MSB-first bit reader: acc/nbits/p as locals.  Refills pull
    # 32 bits at a time with int.from_bytes and mask acc down to its
    # live window ONLY there (reads below always mask explicitly, so
    # high garbage bits never escape; masking once per refill instead
    # of once per coefficient keeps acc a machine-word int).  A
    # well-formed scan overdraws at most 8 bytes past its last
    # coefficient (the 0xFF pad); a truncated or corrupt stream that
    # decodes past the pad fails the refill bounds check.
    data += b"\xff" * 8
    dlen = len(data)
    acc = 0
    nbits = 0
    p = 0
    mcu_since_rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_since_rst == restart_interval:
                nbits -= nbits % 8  # byte-align at restart
                preds = [0] * nc
                mcu_since_rst = 0
            for (ci, rowmul, boff, hs, dc_flat, dc_codes, ac_flat,
                 ac_codes, idxs, vals) in sched:
                m = (my * rowmul + mx * hs + boff) << 6
                # --- DC coefficient
                if nbits < 32:
                    if p + 4 > dlen:
                        raise ValueError("JPEG: truncated scan data")
                    acc = ((acc & ((1 << nbits) - 1)) << 32) \
                        | int.from_bytes(data[p : p + 4], "big")
                    p += 4
                    nbits += 32
                ent = dc_flat[(acc >> (nbits - 10)) & 1023]
                if ent >= 0:
                    nbits -= ent >> 8
                    size = ent & 0xFF
                else:
                    size, nbits = _read_long_code(acc, nbits, dc_codes)
                pred = preds[ci]
                if size:
                    nbits -= size
                    v = (acc >> nbits) & ((1 << size) - 1)
                    if v < (1 << (size - 1)):
                        v -= (1 << size) - 1
                    pred += v
                    preds[ci] = pred
                if pred:
                    idxs.append(m)
                    vals.append(pred)
                # --- AC coefficients
                k = 1
                while k < 64:
                    if nbits < 32:
                        if p + 4 > dlen:
                            raise ValueError("JPEG: truncated scan data")
                        acc = ((acc & ((1 << nbits) - 1)) << 32) \
                            | int.from_bytes(data[p : p + 4], "big")
                        p += 4
                        nbits += 32
                    ent = ac_flat[(acc >> (nbits - 10)) & 1023]
                    if ent >= 0:
                        nbits -= ent >> 8
                        rs = ent & 0xFF
                    else:
                        rs, nbits = _read_long_code(acc, nbits, ac_codes)
                    size = rs & 0x0F
                    if size == 0:
                        if rs == 0xF0:  # ZRL
                            k += 16
                            continue
                        break  # EOB
                    k += rs >> 4
                    if k > 63:
                        raise ValueError("JPEG: AC index out of range")
                    nbits -= size
                    v = (acc >> nbits) & ((1 << size) - 1)
                    if v < (1 << (size - 1)):
                        v -= (1 << size) - 1
                    idxs.append(m + k)
                    vals.append(v)
                    k += 1
            mcu_since_rst += 1
    for ci in range(nc):
        if idx_out[ci]:
            zz[ci].reshape(-1)[np.array(idx_out[ci])] = val_out[ci]

    return _reconstruct(
        zz, comps, qtables, bdims, fh, fw, hmax, vmax, adobe
    )


def _reconstruct(zz, comps, qtables, bdims, fh, fw, hmax, vmax,
                 adobe=None):
    """Vectorized dequant + IDCT per component, then integer-ratio
    chroma upsampling (pixel replication), crop, and color transform.
    Shared by the baseline and progressive decode paths.

    `adobe` is the APP14 transform byte (or None): with 3 components,
    transform=0 (or 'R','G','B' component IDs with no APP14) means the
    planes are RGB as-is; with 4 components, transform=2 is YCCK and
    anything else is CMYK — stored INVERTED when an Adobe marker is
    present (TN-5116), plain otherwise."""
    planes = []
    for ci, (cid, hs, vs, tq) in enumerate(comps):
        q = qtables.get(tq)
        if q is None:
            raise ValueError("JPEG component references missing DQT")
        bw_i, bh_i = bdims[ci]
        coef = (zz[ci][:, _UNZIGZAG].reshape(-1, 8, 8) * q).astype(
            np.float64
        )
        # broadcast batched matmul: ~20x einsum for stacks of 8x8 blocks
        pix = _D.T @ coef @ _D + 128.0
        plane = (
            pix.reshape(bh_i, bw_i, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(bh_i * 8, bw_i * 8)
        )
        ry, rx = vmax // vs, hmax // hs
        if ry > 1:
            plane = np.repeat(plane, ry, axis=0)
        if rx > 1:
            plane = np.repeat(plane, rx, axis=1)
        planes.append(plane[:fh, :fw])
    if len(comps) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    if len(comps) == 3:
        if adobe == 0 or (
            adobe is None and [c[0] for c in comps] == [82, 71, 66]
        ):
            # RGB as-is (Adobe transform=0, or libjpeg's 'R','G','B'
            # component-ID heuristic): no YCbCr conversion.
            rgb = np.stack(planes, axis=-1)
            return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)
        return _ycbcr_to_rgb(np.stack(planes, axis=-1))
    # 4 components: CMYK family -> RGB = inverted-CMY * inverted-K / 255
    if adobe == 2:  # YCCK: YCbCr->RGB of the first three IS inverted CMY
        icmy = _ycbcr_to_rgb(np.stack(planes[:3], axis=-1)).astype(
            np.float64
        )
        ik = np.clip(np.rint(planes[3]), 0, 255)
    elif adobe is not None:  # Adobe CMYK is stored inverted (TN-5116)
        icmy = np.clip(np.rint(np.stack(planes[:3], axis=-1)), 0, 255)
        ik = np.clip(np.rint(planes[3]), 0, 255)
    else:  # plain (non-Adobe) CMYK
        icmy = 255.0 - np.clip(np.rint(np.stack(planes[:3], axis=-1)),
                               0, 255)
        ik = 255.0 - np.clip(np.rint(planes[3]), 0, 255)
    rgb = icmy * ik[..., None] / 255.0
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# progressive (SOF2) decode — T.81 Annex G.2 (round 7, VERDICT r06 item 2)
# ---------------------------------------------------------------------------
#
# Spectral selection + successive approximation over the same flat-LUT
# entropy framework as the baseline path: each scan is unstuffed once
# (_unstuff_scan), decoded with the inlined 32-bit-refill bit reader,
# and coefficient updates are collected sparsely and applied to the
# per-component coefficient planes in ONE vectorized scatter per scan
# (first scans) / in-place for refinement scans (which must read the
# coefficient history).  The IDCT/upsample tail is the shared
# vectorized _reconstruct.
#
# Reference behavior target: h3ronpy's raster tests decode whatever
# rasterio/GDAL decodes (h3ronpy/tests/arrow/test_raster.py:21-22);
# progressive JPEG is the dominant large-photo web encoding, so a
# 100-TB corpus ingest must accept SOF2 streams.


def _decode_progressive(blob: bytes) -> np.ndarray:
    """Decode a progressive (SOF2) Huffman JPEG.

    Supports the full G.2 scan vocabulary: interleaved and
    non-interleaved DC scans, DC/AC first and refinement passes,
    spectral selection bands, EOBn runs, and restart intervals
    (which may change between scans via DRI)."""
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[int, tuple[dict, list]] = {}
    sof = None
    restart_interval = 0
    adobe = None
    zz: list[np.ndarray] = []
    bdims: list[tuple[int, int]] = []
    n = len(blob)
    while pos < n:
        if blob[pos] != 0xFF:
            pos += 1
            continue
        marker = blob[pos + 1]
        if marker == 0xFF:  # fill byte before a marker: consume one FF
            pos += 1
            continue
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        if pos + 2 > n:
            raise ValueError("JPEG: truncated stream")
        (seglen,) = struct.unpack(">H", blob[pos : pos + 2])
        if pos + seglen > n:
            raise ValueError("JPEG: truncated stream")
        seg = blob[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            _parse_dqt(seg, qtables)
        elif marker == 0xEE:  # APP14 (Adobe color-transform hint)
            t = _parse_app14(seg)
            if t is not None:
                adobe = t
        elif marker == 0xC4:  # DHT (tables may be redefined per scan)
            p = 0
            while p < len(seg):
                tid = seg[p]
                bits = bytes(seg[p + 1 : p + 17])
                cnt = sum(bits)
                values = bytes(seg[p + 17 : p + 17 + cnt])
                htables[tid] = _decode_lut(bits, values)
                p += 17 + cnt
        elif marker == 0xC2:  # SOF2
            prec, fh, fw, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise NotImplementedError("only 8-bit JPEG supported")
            _check_n_components(nc)
            comps = []
            for ci in range(nc):
                cid, sampling, tq = seg[6 + 3 * ci : 9 + 3 * ci]
                comps.append((cid, sampling >> 4, sampling & 0x0F, tq))
            hmax = max(hs for _, hs, _, _ in comps)
            vmax = max(vs for _, _, vs, _ in comps)
            if any(
                hs < 1 or vs < 1 or hmax % hs or vmax % vs
                for _, hs, vs, _ in comps
            ):
                raise NotImplementedError(
                    "non-integer-ratio sampling factors unsupported"
                )
            mcux = (fw + 8 * hmax - 1) // (8 * hmax)
            mcuy = (fh + 8 * vmax - 1) // (8 * vmax)
            for _, hs, vs, _ in comps:
                bw_i, bh_i = mcux * hs, mcuy * vs
                bdims.append((bw_i, bh_i))
                zz.append(np.zeros((bh_i * bw_i, 64), np.int32))
            sof = (fh, fw, comps, hmax, vmax, mcux, mcuy)
        elif marker in (0xC0, 0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9,
                        0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("mixed/unsupported SOF in progressive stream")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            if sof is None:
                raise ValueError("JPEG: SOS before SOF2")
            ns = seg[0]
            scan_comps = []
            for ci in range(ns):
                cs, tabs = seg[1 + 2 * ci], seg[2 + 2 * ci]
                scan_comps.append((cs, tabs >> 4, tabs & 0x0F))
            ss, se, ahal = seg[1 + 2 * ns : 4 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0x0F
            data, end = _unstuff_scan(blob, pos + seglen)
            _decode_prog_scan(
                data, sof, zz, bdims, htables, scan_comps,
                ss, se, ah, al, restart_interval,
            )
            pos = end
            continue
        pos += seglen
    if sof is None:
        raise ValueError("JPEG missing SOF2")
    fh, fw, comps, hmax, vmax, _, _ = sof
    return _reconstruct(
        zz, comps, qtables, bdims, fh, fw, hmax, vmax, adobe
    )


def _decode_prog_scan(data, sof, zz, bdims, htables, scan_comps,
                      ss, se, ah, al, restart_interval):
    """Decode one progressive scan into the coefficient planes.

    Four cases per T.81 G.2: DC first / DC refine (Ss=0, interleaved
    when ns>1), AC first / AC refine (single-component band scans).
    The bit reader is the baseline path's inlined 32-bit-refill
    acc/nbits/p pattern."""
    fh, fw, comps, hmax, vmax, mcux, mcuy = sof
    comp_idx = {cid: i for i, (cid, _, _, _) in enumerate(comps)}
    members = []
    for cs, td, ta in scan_comps:
        if cs not in comp_idx:
            raise ValueError("JPEG scan references unknown component")
        members.append((comp_idx[cs], td, ta))
    if ss == 0:
        if se != 0:
            raise ValueError("progressive DC scan must have Se=0")
    else:
        if len(members) != 1:
            raise ValueError("progressive AC scan must be single-component")
        if not (ss <= se <= 63):
            raise ValueError("bad spectral band")
        if ah and ah != al + 1:
            raise ValueError("AC refinement must step Al by 1")

    data += b"\xff" * 8
    dlen = len(data)
    acc = 0
    nbits = 0
    p = 0

    # ---- walk order ------------------------------------------------
    if ss == 0 and len(members) > 1:
        # interleaved DC: MCU walk like the baseline scan
        sched = []
        for ci, td, _ in members:
            _, hs, vs, _ = comps[ci]
            bw_i = bdims[ci][0]
            dc = htables.get(td) if ah == 0 else None
            if ah == 0 and dc is None:
                raise ValueError("JPEG scan references missing Huffman table")
            for by_ in range(vs):
                for bx_ in range(hs):
                    sched.append((ci, vs * bw_i, by_ * bw_i + bx_, hs, dc))
        units = [(my, mx) for my in range(mcuy) for mx in range(mcux)]

        def blocks_of(unit):
            my, mx = unit
            for ci, rowmul, boff, hs, dc in sched:
                yield ci, my * rowmul + mx * hs + boff, dc
    else:
        # non-interleaved: raster over the COMPONENT's own block grid,
        # whose dims derive from the component size (ceil of scaled
        # fw/fh), NOT the MCU-padded storage grid
        ci, td, ta = members[0]
        _, hs, vs, _ = comps[ci]
        bw_i = bdims[ci][0]
        cw = (fw * hs + hmax - 1) // hmax
        ch = (fh * vs + vmax - 1) // vmax
        bw_s = (cw + 7) // 8
        bh_s = (ch + 7) // 8
        tab = None
        if ss == 0:
            tab = htables.get(td) if ah == 0 else None
            if ah == 0 and tab is None:
                raise ValueError("JPEG scan references missing Huffman table")
        else:
            tab = htables.get(0x10 | ta)
            if tab is None:
                raise ValueError("JPEG scan references missing Huffman table")
        units = [
            (ci, by_ * bw_i + bx_, tab)
            for by_ in range(bh_s) for bx_ in range(bw_s)
        ]

        def blocks_of(unit):
            yield unit

    p1, m1 = 1 << al, -1 << al

    # ---- DC refinement: a pure bit stream (no Huffman), one appended
    # bit per block in walk order, byte-realigned at restarts —
    # vectorized: unpack every bit once (C speed), walk a Python-int
    # list, OR the set blocks in one scatter per component.
    if ss == 0 and ah > 0:
        bits = np.unpackbits(np.frombuffer(data, np.uint8)).tolist()
        cur = 0
        setidx: list[list[int]] = [[] for _ in range(len(comps))]
        n_since = 0
        for unit in units:
            if restart_interval and n_since == restart_interval:
                cur = (cur + 7) & ~7  # byte-align at restart
                n_since = 0
            for ci, bidx, _tab in blocks_of(unit):
                if bits[cur]:
                    setidx[ci].append(bidx)
                cur += 1
            n_since += 1
        if cur > (dlen - 8) * 8:  # read into the overdraw pad
            raise ValueError("JPEG: truncated scan data")
        for ci, idxs in enumerate(setidx):
            if idxs:
                zz[ci][np.array(idxs), 0] |= p1
        return

    preds = [0] * len(comps)
    eobrun = 0
    nunits_since_rst = 0
    # sparse first-scan collection, one vectorized scatter at the end
    idx_out: list[int] = []
    val_out: list[int] = []
    # DC-first collection: every block's value, one scatter per comp
    dc_idx: list[list[int]] = [[] for _ in range(len(comps))]
    dc_val: list[list[int]] = [[] for _ in range(len(comps))]

    for unit in units:
        if restart_interval and nunits_since_rst == restart_interval:
            nbits -= nbits % 8  # byte-align at restart
            preds = [0] * len(comps)
            eobrun = 0
            nunits_since_rst = 0
        for ci, bidx, tab in blocks_of(unit):
            if ss == 0 and ah == 0:
                # ---- DC first: baseline DC decode, scaled by 2^Al
                dc_codes, dc_flat = tab
                if nbits < 32:
                    if p + 4 > dlen:
                        raise ValueError("JPEG: truncated scan data")
                    acc = ((acc & ((1 << nbits) - 1)) << 32) \
                        | int.from_bytes(data[p : p + 4], "big")
                    p += 4
                    nbits += 32
                ent = dc_flat[(acc >> (nbits - 10)) & 1023]
                if ent >= 0:
                    nbits -= ent >> 8
                    size = ent & 0xFF
                else:
                    size, nbits = _read_long_code(acc, nbits, dc_codes)
                if size:
                    nbits -= size
                    v = (acc >> nbits) & ((1 << size) - 1)
                    if v < (1 << (size - 1)):
                        v -= (1 << size) - 1
                    preds[ci] += v
                if preds[ci]:
                    dc_idx[ci].append(bidx)
                    dc_val[ci].append(preds[ci] << al)
            elif ah == 0:
                # ---- AC first: band run-length with EOBn runs
                if eobrun > 0:
                    eobrun -= 1
                else:
                    ac_codes, ac_flat = tab
                    base = bidx << 6
                    k = ss
                    while k <= se:
                        if nbits < 32:
                            if p + 4 > dlen:
                                raise ValueError("JPEG: truncated scan data")
                            acc = ((acc & ((1 << nbits) - 1)) << 32) \
                                | int.from_bytes(data[p : p + 4], "big")
                            p += 4
                            nbits += 32
                        ent = ac_flat[(acc >> (nbits - 10)) & 1023]
                        if ent >= 0:
                            nbits -= ent >> 8
                            rs = ent & 0xFF
                        else:
                            rs, nbits = _read_long_code(acc, nbits, ac_codes)
                        r, size = rs >> 4, rs & 0x0F
                        if size == 0:
                            if r == 15:  # ZRL
                                k += 16
                                continue
                            eobrun = (1 << r) - 1
                            if r:
                                if nbits < 32:
                                    if p + 4 > dlen:
                                        raise ValueError(
                                            "JPEG: truncated scan data")
                                    acc = ((acc & ((1 << nbits) - 1)) << 32) \
                                        | int.from_bytes(
                                            data[p : p + 4], "big")
                                    p += 4
                                    nbits += 32
                                nbits -= r
                                eobrun += (acc >> nbits) & ((1 << r) - 1)
                            break
                        k += r
                        if k > se:
                            raise ValueError("JPEG: AC index out of band")
                        nbits -= size
                        v = (acc >> nbits) & ((1 << size) - 1)
                        if v < (1 << (size - 1)):
                            v -= (1 << size) - 1
                        idx_out.append(base + k)
                        val_out.append(v << al)
                        k += 1
            else:
                # ---- AC refine (G.1.2.3): correction bits on history,
                # ±1<<Al insertions at zero-history positions.  The
                # band is pulled into a Python-int list ONCE per block
                # (tolist is C speed) — per-coefficient numpy scalar
                # reads/writes were the dominant cost of this scan type
                # (round-7 profile: ~5x baseline decode before, ~2x
                # after) — and written back only when changed.
                ac_codes, ac_flat = tab
                row = zz[ci][bidx]
                bv = row[: se + 1].tolist()
                changed = False
                k = ss
                if eobrun == 0:
                    while k <= se:
                        if nbits < 32:
                            if p + 4 > dlen:
                                raise ValueError("JPEG: truncated scan data")
                            acc = ((acc & ((1 << nbits) - 1)) << 32) \
                                | int.from_bytes(data[p : p + 4], "big")
                            p += 4
                            nbits += 32
                        ent = ac_flat[(acc >> (nbits - 10)) & 1023]
                        if ent >= 0:
                            nbits -= ent >> 8
                            rs = ent & 0xFF
                        else:
                            rs, nbits = _read_long_code(acc, nbits, ac_codes)
                        r, size = rs >> 4, rs & 0x0F
                        newval = 0
                        if size == 0:
                            if r != 15:
                                eobrun = 1 << r
                                if r:
                                    if nbits < 32:
                                        if p + 4 > dlen:
                                            raise ValueError(
                                                "JPEG: truncated scan data")
                                        acc = (
                                            (acc & ((1 << nbits) - 1)) << 32
                                        ) | int.from_bytes(
                                            data[p : p + 4], "big")
                                        p += 4
                                        nbits += 32
                                    nbits -= r
                                    eobrun += (acc >> nbits) & ((1 << r) - 1)
                                break
                            # r == 15: skip 16 zero-history positions
                        else:
                            if size != 1:
                                raise ValueError(
                                    "JPEG: bad size in AC refinement")
                            if nbits < 32:
                                if p + 4 > dlen:
                                    raise ValueError(
                                        "JPEG: truncated scan data")
                                acc = ((acc & ((1 << nbits) - 1)) << 32) \
                                    | int.from_bytes(data[p : p + 4], "big")
                                p += 4
                                nbits += 32
                            nbits -= 1
                            newval = p1 if (acc >> nbits) & 1 else m1
                        # advance over r zero-history coefficients,
                        # appending correction bits to nonzero ones
                        while k <= se:
                            c = bv[k]
                            if c != 0:
                                if nbits < 32:
                                    if p + 4 > dlen:
                                        raise ValueError(
                                            "JPEG: truncated scan data")
                                    acc = (
                                        (acc & ((1 << nbits) - 1)) << 32
                                    ) | int.from_bytes(
                                        data[p : p + 4], "big")
                                    p += 4
                                    nbits += 32
                                nbits -= 1
                                if ((acc >> nbits) & 1) and not (c & p1):
                                    bv[k] = c + (p1 if c > 0 else m1)
                                    changed = True
                            else:
                                if r == 0:
                                    break
                                r -= 1
                            k += 1
                        if newval:
                            if k > se:
                                raise ValueError(
                                    "JPEG: AC refinement overruns band")
                            bv[k] = newval
                            changed = True
                        k += 1
                if eobrun > 0:
                    # end-of-band: correction bits for the remaining
                    # nonzero-history coefficients of this block
                    while k <= se:
                        c = bv[k]
                        if c != 0:
                            if nbits < 32:
                                if p + 4 > dlen:
                                    raise ValueError(
                                        "JPEG: truncated scan data")
                                acc = ((acc & ((1 << nbits) - 1)) << 32) \
                                    | int.from_bytes(data[p : p + 4], "big")
                                p += 4
                                nbits += 32
                            nbits -= 1
                            if ((acc >> nbits) & 1) and not (c & p1):
                                bv[k] = c + (p1 if c > 0 else m1)
                                changed = True
                        k += 1
                    eobrun -= 1
                if changed:
                    row[ss : se + 1] = bv[ss:]
        nunits_since_rst += 1

    if idx_out:
        # one vectorized scatter per AC-first scan (all one component)
        ci = members[0][0]
        zz[ci].reshape(-1)[np.array(idx_out)] = val_out
    for ci in range(len(comps)):
        if dc_idx[ci]:
            # one DC scatter per component for a DC-first scan
            zz[ci][np.array(dc_idx[ci]), 0] = dc_val[ci]


# ---------------------------------------------------------------------------
# progressive (SOF2) encode — spectral bands + successive approximation
# ---------------------------------------------------------------------------


def _w_dc_first(blk0s, al, dc_tab, writer, pred):
    for c in blk0s:
        v = int(c) >> al  # DC point transform is an arithmetic shift
        size, bits = _magnitude(v - pred)
        code, length = dc_tab[size]
        writer.write(code, length)
        if size:
            writer.write(bits, size)
        pred = v
    return pred


def encode_jpeg_progressive(
    arr: np.ndarray, quality: int = 90, subsampling: str = "444"
) -> bytes:
    """Encode as progressive (SOF2) JFIF.

    Scan script (exercises both G.2 axes): interleaved DC first at
    Al=1 → per-component AC first in two spectral bands (1-5, 6-63) at
    Al=1 → per-component AC refinement of both bands to Al=0 → DC
    refinement to Al=0.  Quantization is identical to the baseline
    encoder (same _quality_tables), so after all refinement passes the
    decoded image is PIXEL-IDENTICAL to the baseline roundtrip at the
    same quality — pinned by test.

    Entropy tables are the Annex K set, which lacks EOBn (n>0) symbols,
    so end-of-band runs are emitted as per-block EOB0 — valid, slightly
    less compact; the DECODER handles full EOBn runs (hand-built golden
    streams pin that path)."""
    arr = np.asarray(arr)
    if arr.dtype != np.uint8 or arr.ndim not in (2, 3) or (
        arr.ndim == 3 and arr.shape[2] != 3
    ):
        raise ValueError(
            f"unsupported array for JPEG encode: shape={arr.shape} "
            f"dtype={arr.dtype}"
        )
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    h, w = arr.shape[:2]
    q_lum, q_chr = _quality_tables(quality)
    if arr.ndim == 2:
        comps_px = [arr.astype(np.float64)]
        samp = [(1, 1)]
    else:
        ycc = _rgb_to_ycbcr(arr)
        y, cb, cr = ycc[..., 0], ycc[..., 1], ycc[..., 2]
        if subsampling == "444":
            comps_px = [y, cb, cr]
            samp = [(1, 1), (1, 1), (1, 1)]
        else:
            samp = [(2, 2), (1, 1), (1, 1)]
            ph, pw = -h % 16, -w % 16
            yp = _pad_to(y, h + ph, w + pw)
            down = []
            for c in (cb, cr):
                cp = _pad_to(c, h + ph, w + pw)
                down.append(
                    cp.reshape(cp.shape[0] // 2, 2, cp.shape[1] // 2, 2)
                    .mean(axis=(1, 3))
                )
            comps_px = [yp, down[0], down[1]]
    n_comp = len(comps_px)
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    qblocks = []
    bdims = []
    for ci, comp in enumerate(comps_px):
        hi, vi = samp[ci]
        bw_i, bh_i = mcux * hi, mcuy * vi
        comp = _pad_to(comp, bh_i * 8, bw_i * 8)
        blocks = (
            comp.reshape(bh_i, 8, bw_i, 8)
            .transpose(0, 2, 1, 3)
            .reshape(-1, 8, 8)
        )
        coef = _D @ (blocks - 128.0) @ _D.T
        q = q_lum if ci == 0 else q_chr
        qblocks.append(
            np.round(coef / q).astype(np.int32).reshape(-1, 64)[:, _ZIGZAG]
        )
        bdims.append((bw_i, bh_i))

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" \
        + struct.pack(">HHBB", 1, 1, 0, 0)
    ntab = 1 if n_comp == 1 else 2
    payload = b""
    for ti, q in enumerate((q_lum, q_chr)[:ntab]):
        payload += bytes([ti]) + bytes(
            int(x) for x in q.reshape(-1)[_ZIGZAG]
        )
    out += b"\xff\xdb" + struct.pack(">H", 2 + len(payload)) + payload
    sof = struct.pack(">BHHB", 8, h, w, n_comp)
    for ci in range(n_comp):
        hi, vi = samp[ci]
        sof += bytes([ci + 1, (hi << 4) | vi, 0 if ci == 0 else 1])
    out += b"\xff\xc2" + struct.pack(">H", 2 + len(sof)) + sof
    tabs = [(0x00, _DC_LUM), (0x10, _AC_LUM)]
    if n_comp == 3:
        tabs += [(0x01, _DC_CHR), (0x11, _AC_CHR)]
    payload = b""
    for tid, (bits, values) in tabs:
        payload += bytes([tid]) + bytes(bits) + bytes(values)
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(payload)) + payload

    def sos_header(members, ss, se, ah, al):
        s = bytes([len(members)])
        for cid, tsel in members:
            s += bytes([cid, tsel])
        s += bytes([ss, se, (ah << 4) | al])
        return b"\xff\xda" + struct.pack(">H", 2 + len(s)) + s

    # ---- scan 1: interleaved DC first, Al=1
    out += sos_header(
        [(ci + 1, 0x00 if ci == 0 else 0x11) for ci in range(n_comp)],
        0, 0, 0, 1,
    )
    writer = _BitWriter()
    preds = [0] * n_comp
    for my in range(mcuy):
        for mx in range(mcux):
            for ci in range(n_comp):
                hi, vi = samp[ci]
                bw_i = bdims[ci][0]
                dc_tab = _ENC_DC[0 if ci == 0 else 1]
                for by_ in range(vi):
                    for bx_ in range(hi):
                        bidx = (my * vi + by_) * bw_i + mx * hi + bx_
                        preds[ci] = _w_dc_first(
                            [qblocks[ci][bidx, 0]], 1, dc_tab, writer,
                            preds[ci],
                        )
    out += writer.flush()

    def comp_units(ci):
        """Non-interleaved block index walk for component ci."""
        hi, vi = samp[ci]
        bw_i = bdims[ci][0]
        cw = (w * hi + hmax - 1) // hmax
        ch = (h * vi + vmax - 1) // vmax
        return [
            by_ * bw_i + bx_
            for by_ in range((ch + 7) // 8)
            for bx_ in range((cw + 7) // 8)
        ]

    bands = [(1, 5), (6, 63)]
    # ---- AC first scans, per component per band, Al=1
    for ci in range(n_comp):
        ac_tab = _ENC_AC[0 if ci == 0 else 1]
        tsel = 0x10 if ci == 0 else 0x11
        for ss, se in bands:
            out += sos_header([(ci + 1, tsel & 0x0F)], ss, se, 0, 1)
            writer = _BitWriter()
            for bidx in comp_units(ci):
                blk = qblocks[ci][bidx]
                # AC point transform: toward-zero division by 2^Al
                vals = [
                    int(np.sign(blk[k])) * (abs(int(blk[k])) >> 1)
                    for k in range(ss, se + 1)
                ]
                nz = [i for i, v in enumerate(vals) if v]
                run = 0
                for i in range(len(vals)):
                    if not vals[i]:
                        run += 1
                        continue
                    while run >= 16:
                        zc, zl = ac_tab[0xF0]
                        writer.write(zc, zl)
                        run -= 16
                    size, bits = _magnitude(vals[i])
                    code, length = ac_tab[(run << 4) | size]
                    writer.write(code, length)
                    writer.write(bits, size)
                    run = 0
                if not nz or nz[-1] != len(vals) - 1:
                    zc, zl = ac_tab[0x00]  # EOB0
                    writer.write(zc, zl)
            out += writer.flush()
    # ---- AC refinement scans, per component per band, Ah=1 -> Al=0
    for ci in range(n_comp):
        ac_tab = _ENC_AC[0 if ci == 0 else 1]
        tsel = 0x10 if ci == 0 else 0x11
        for ss, se in bands:
            out += sos_header([(ci + 1, tsel & 0x0F)], ss, se, 1, 0)
            writer = _BitWriter()
            for bidx in comp_units(ci):
                blk = qblocks[ci][bidx]
                t = [abs(int(blk[k])) for k in range(ss, se + 1)]
                newnz = [i for i, v in enumerate(t) if v == 1]
                last = newnz[-1] if newnz else -1
                run = 0
                pending: list[int] = []
                for i in range(last + 1):
                    if t[i] == 0:
                        run += 1
                        continue
                    # ZRL flush on ANY nonzero (history or new), BEFORE
                    # buffering its correction bit: the decoder reads a
                    # history coefficient's correction bit while
                    # advancing under the symbol FOLLOWING the ZRL, so
                    # the bit must not ride the ZRL itself
                    while run > 15:
                        zc, zl = ac_tab[0xF0]
                        writer.write(zc, zl)
                        for b in pending:
                            writer.write(b, 1)
                        pending = []
                        run -= 16
                    if t[i] > 1:
                        pending.append(t[i] & 1)
                        continue
                    code, length = ac_tab[(run << 4) | 1]
                    writer.write(code, length)
                    writer.write(0 if blk[ss + i] < 0 else 1, 1)
                    for b in pending:
                        writer.write(b, 1)
                    pending = []
                    run = 0
                tail = [t[i] & 1 for i in range(last + 1, len(t)) if t[i] > 1]
                if last + 1 < len(t):
                    zc, zl = ac_tab[0x00]  # EOB0: covers trailing zeros
                    writer.write(zc, zl)
                    for b in tail:
                        writer.write(b, 1)
            out += writer.flush()
    # ---- final scan: DC refinement to Al=0 (interleaved)
    out += sos_header(
        [(ci + 1, 0x00) for ci in range(n_comp)], 0, 0, 1, 0,
    )
    writer = _BitWriter()
    for my in range(mcuy):
        for mx in range(mcux):
            for ci in range(n_comp):
                hi, vi = samp[ci]
                bw_i = bdims[ci][0]
                for by_ in range(vi):
                    for bx_ in range(hi):
                        bidx = (my * vi + by_) * bw_i + mx * hi + bx_
                        writer.write(int(qblocks[ci][bidx, 0]) & 1, 1)
    out += writer.flush()
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# EXIF orientation (round 7): phone-photo corpora are dominated by
# orientation-tagged JPEGs.  Parity note: libjpeg does NOT rotate —
# orientation is consumer-side metadata (PIL ImageOps.exif_transpose;
# GDAL exposes it as EXIF_Orientation, which is what the reference's
# rasterio ingest sees) — so decode_jpeg returns STORED pixels and
# these helpers are the opt-in display transform.
# ---------------------------------------------------------------------------


def exif_orientation(blob: bytes):
    """Return the EXIF orientation (1-8) from a JPEG's APP1 segment,
    or None when absent/malformed.  Header-only scan: stops at SOS,
    never raises on malformed EXIF (metadata must not kill a decode)."""
    try:
        if blob[:2] != b"\xff\xd8":
            return None
        pos, n = 2, len(blob)
        while pos + 4 <= n:
            if blob[pos] != 0xFF:
                pos += 1
                continue
            marker = blob[pos + 1]
            pos += 2
            if marker in (0x01,) or 0xD0 <= marker <= 0xD9:
                continue
            if marker == 0xDA:  # SOS: EXIF must precede the scan
                return None
            (seglen,) = struct.unpack(">H", blob[pos : pos + 2])
            seg = blob[pos + 2 : pos + seglen]
            pos += seglen
            if marker != 0xE1 or seg[:6] != b"Exif\x00\x00":
                continue
            tiff = seg[6:]
            if tiff[:2] == b"II":
                e = "<"
            elif tiff[:2] == b"MM":
                e = ">"
            else:
                return None
            if struct.unpack(e + "H", tiff[2:4])[0] != 42:
                return None
            (ifd0,) = struct.unpack(e + "I", tiff[4:8])
            if ifd0 + 2 > len(tiff):
                return None
            (cnt,) = struct.unpack(e + "H", tiff[ifd0 : ifd0 + 2])
            for i in range(cnt):
                off = ifd0 + 2 + 12 * i
                if off + 12 > len(tiff):
                    return None
                tag, typ = struct.unpack(e + "HH", tiff[off : off + 4])
                if tag == 0x0112 and typ == 3:  # Orientation, SHORT
                    (v,) = struct.unpack(
                        e + "H", tiff[off + 8 : off + 10]
                    )
                    return v if 1 <= v <= 8 else None
            return None
        return None
    except (struct.error, IndexError):
        return None


def apply_exif_orientation(arr: np.ndarray, orientation) -> np.ndarray:
    """Transform STORED pixels to DISPLAY pixels for an EXIF
    orientation 1-8 (PIL exif_transpose-compatible).  Orientations
    5-8 swap width and height.  Works on (h, w) and (h, w, c)."""
    o = orientation or 1
    if o == 2:
        arr = arr[:, ::-1]
    elif o == 3:
        arr = arr[::-1, ::-1]
    elif o == 4:
        arr = arr[::-1]
    elif o == 5:
        arr = arr.swapaxes(0, 1)
    elif o == 6:
        arr = arr.swapaxes(0, 1)[:, ::-1]
    elif o == 7:
        arr = arr.swapaxes(0, 1)[::-1, ::-1]
    elif o == 8:
        arr = arr.swapaxes(0, 1)[::-1]
    return np.ascontiguousarray(arr)


# ---------------------------------------------------------------------------
# batched decode (round 8) — cross-stream lockstep entropy decoding
# ---------------------------------------------------------------------------
#
# The scalar decoder's per-coefficient Python bit loop is ~77% of its
# ~500 us/image on the bench corpus (guide §4.2: move whole batches to
# vectorized native code).  Huffman decoding of ONE stream is inherently
# sequential, but a batch of images is many INDEPENDENT streams, so the
# batch decoder advances all of them in lockstep: one iteration decodes
# one token per live stream with ~30 numpy ops over stream-wide arrays
# (a 64-bit window gather, one complete-16-bit-LUT gather, masked state
# transitions).  Amortized cost falls from ~2.5 us/token (Python) to
# tens of ns/token.  Streams are sorted by entropy-data length before
# chunking so lockstep groups finish together.
#
# Byte-identity argument: the lockstep loop reproduces the scalar
# reader's token semantics exactly over INTEGER state (bit position,
# block index, run/size, DC prediction), emits the same sparse
# (index, value) coefficient set in the same order, and feeds the same
# _reconstruct math — so equality with decode_jpeg is testable
# coefficient-for-coefficient and pinned by tests/test_jpeg_batch_decode.py.
# Any stream the fast path cannot prove trivial (progressive, color,
# restart markers, missing tables, invalid codes, overdraw) falls back
# to the scalar decode_jpeg, keeping its exact result/error behavior.


def _parse_gray_baseline(blob: bytes):
    """Header walk for the batched fast path.

    Returns (fh, fw, qtable, dc_payload, ac_payload, scan_start) for an
    8-bit single-component baseline (SOF0/1) restart-free single-scan
    stream with all referenced tables present — or None for anything
    else.  A None can never change results, only speed: the caller
    falls back to the exact scalar decode_jpeg."""
    if len(blob) < 4 or blob[:2] != b"\xff\xd8":
        return None
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    hpayloads: dict[int, tuple[bytes, bytes]] = {}
    sof = None
    n = len(blob)
    while pos < n:
        if blob[pos] != 0xFF:
            pos += 1
            continue
        marker = blob[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            break
        if pos + 2 > n:
            return None
        (seglen,) = struct.unpack(">H", blob[pos : pos + 2])
        seg = blob[pos + 2 : pos + seglen]
        if marker == 0xDB:
            try:
                _parse_dqt(seg, qtables)
            except ValueError:
                return None
        elif marker == 0xC4:
            p = 0
            while p + 17 <= len(seg):
                tid = seg[p]
                bits = bytes(seg[p + 1 : p + 17])
                cnt = sum(bits)
                hpayloads[tid] = (bits, bytes(seg[p + 17 : p + 17 + cnt]))
                p += 17 + cnt
        elif marker in (0xC0, 0xC1):
            if len(seg) < 9:
                return None
            prec, fh, fw, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8 or nc != 1 or fh == 0 or fw == 0:
                return None
            if seg[7] != 0x11:  # sampling factors must be 1x1
                return None
            sof = (fh, fw, seg[8])
        elif marker == 0xDD:
            return None  # restart markers: scalar path
        elif marker == 0xDA:
            if sof is None or len(seg) < 3 or seg[0] != 1:
                return None
            td, ta = seg[2] >> 4, seg[2] & 0x0F
            dcp = hpayloads.get(td)
            acp = hpayloads.get(0x10 | ta)
            q = qtables.get(sof[2])
            if dcp is None or acp is None or q is None:
                return None
            return (sof[0], sof[1], q, dcp, acp, pos + seglen)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            return None  # progressive / exotic SOFs: scalar path
        pos += seglen
    return None


@functools.lru_cache(maxsize=64)
def _lockstep_lut(bits: bytes, values: bytes, is_ac: bool) -> np.ndarray:
    """Complete 65536-entry Huffman LUT for the lockstep decoder, fully
    pre-decoded: one gather per token yields every field the state
    transition needs.  Entry (int64) packs

        codelen | size << 5 | run << 10 | kadd << 14 | done << 21

    where `kadd` is the coefficient-index advance (DC: 1; AC
    coefficient: run+1; ZRL: 16; EOB: 0) and `done` marks EOB.  Invalid
    16-bit windows are 0 (no valid entry has codelen 0), which freezes
    the stream's state so the caller's bad-flag sweep can hand it to
    the scalar path.  JPEG codes are at most 16 bits, so this needs no
    long-code fallback."""
    lut = np.zeros(1 << 16, np.int64)
    code = 0
    k = 0
    for length in range(1, 17):
        span = 1 << (16 - length)
        for _ in range(bits[length - 1]):
            sym = values[k]
            if is_ac:
                size = sym & 0x0F
                run = sym >> 4
                if size:
                    kadd, done = run + 1, 0
                elif sym == 0xF0:  # ZRL
                    kadd, done, run = 16, 0, 0
                else:  # EOB (any size-0 symbol but ZRL, as the
                    kadd, done, run = 0, 1, 0  # scalar loop treats it)
            else:
                size, run, kadd, done = sym, 0, 1, 0
            if size <= 16:  # the 16-bit value-extract trick's ceiling;
                # a wilder size category falls back to the scalar path
                base = code << (16 - length)
                lut[base : base + span] = (
                    length
                    | (size << 5)
                    | (run << 10)
                    | (kadd << 14)
                    | (done << 21)
                )
            code += 1
            k += 1
        code <<= 1
    return lut


def _entropy_decode_gray_lockstep(datas, nblocks, dcp, acp):
    """Decode S restart-free single-component scans in lockstep.

    `datas` are unstuffed entropy segments; `nblocks[i]` the block count
    of stream i; `dcp`/`acp` the raw DHT payloads (cached packed LUTs —
    see _lockstep_lut).  Returns (idx_list, val_list, bad): per-stream
    int64 sparse coefficient indices/values in emission order (last
    write wins on scatter — same semantics as the scalar path's
    collected appends), and a bool array marking streams that hit an
    invalid window, coefficient overrun, or overdraw; the caller
    re-decodes those with the scalar path so malformed streams keep its
    exact result/error behavior.

    Loop-economy notes (this is the hot loop of the batched decoder —
    every line is one numpy op over the live-stream array):
      * finished/bad lanes are NOT compacted every iteration — they
        keep decoding garbage harmlessly (gather clamped into the
        buffer, emissions filtered afterwards by the `blk < nblocks`
        bound, bad-ness latched before `fin`), and lanes are compacted
        only when an eighth of them are dead;
      * emissions are appended UNFILTERED per iteration (arrays are
        fresh objects) and masked once at the end — no per-iteration
        .any()/boolean-gather;
      * the packed LUT folds run/size/k-advance/EOB decoding into the
        single per-token gather."""
    S = len(datas)
    lens = np.fromiter((len(d) for d in datas), np.int64, S)
    starts = np.zeros(S, np.int64)
    np.cumsum(lens[:-1] + 16, out=starts[1:])
    total = int(lens.sum()) + 16 * S
    # 16 guard bytes of 0xFF per stream: the scalar reader overdraws at
    # most 8 bytes past the last coefficient; the extra 8 keep the
    # 64-bit window gather inside this stream's slice right up to the
    # overdraw cut below
    buf = np.full(total + 8, 0xFF, np.uint8)
    for i in range(S):
        o = int(starts[i])
        buf[o : o + int(lens[i])] = np.frombuffer(datas[i], np.uint8)
    # big-endian 64-bit window at every byte offset (8 strided passes)
    b64 = buf.astype(np.uint64)
    W = np.zeros(total, np.uint64)
    for j in range(8):
        W |= b64[j : total + j] << np.uint64(56 - 8 * j)
    wmax = np.int64(total - 1)
    lut2 = np.concatenate(
        [_lockstep_lut(*acp, True), _lockstep_lut(*dcp, False)]
    )  # index = la | isdc << 16

    nblk0 = np.asarray(nblocks, np.int64)
    sid = np.arange(S, dtype=np.int64)
    bit = starts * 8
    maxbit = (starts + lens + 8) * 8
    blk = np.zeros(S, np.int64)
    k = np.zeros(S, np.int64)
    pred = np.zeros(S, np.int64)
    nblk = nblk0.copy()
    badacc = np.zeros(S, bool)
    finprev = np.zeros(S, bool)
    bad = np.zeros(S, bool)
    out_sid: list = []
    out_idx: list = []
    out_val: list = []
    out_emit: list = []
    u7 = np.uint64(7)
    u48 = np.uint64(48)

    while sid.size:
        w = W[np.minimum(bit >> 3, wmax)]
        wsh = w << (bit.view(np.uint64) & u7)
        la = (wsh >> u48).astype(np.int64)
        isdc = k == 0
        ent = lut2[la | (isdc.astype(np.int64) << 16)]
        codelen = ent & 31
        size = (ent >> 5) & 31
        run = (ent >> 10) & 15
        # value bits after the code, sign-extended (T.81 F.2.2.1);
        # size == 0 falls out naturally: raw16 >> 16 == 0
        raw = ((wsh << codelen.view(np.uint64)) >> u48).astype(
            np.int64
        ) >> (16 - size)
        half = (np.int64(1) << size) >> 1
        v = np.where(raw < half, raw + 1 - (half << 1), raw)
        bit = bit + codelen + size
        pred = pred + np.where(isdc, v, 0)
        knew = k + run
        bad_now = (ent == 0) | (knew > 63)
        # emission slab: filtered once at the end (see docstring)
        out_sid.append(sid)
        out_idx.append((blk << 6) + knew)
        out_val.append(np.where(isdc, pred, v))
        out_emit.append(
            np.where(isdc, pred != 0, size > 0) & ~bad_now
        )
        k_next = k + ((ent >> 14) & 31)
        blk_done = (ent >> 21 != 0) | (k_next >= 64)
        blk = blk + blk_done
        k = np.where(blk_done, 0, k_next)
        # latch bad-ness only for tokens decoded BEFORE the lane
        # finished (finprev): garbage tokens on finished lanes must not
        # demote them to the scalar path, but an overrun on the very
        # token that would have finished a block is still bad (the
        # scalar path raises there)
        badacc |= bad_now & ~finprev
        fin = blk >= nblk
        badacc |= (bit > maxbit) & ~fin
        finprev = fin
        dead = fin | badacc
        ndead = int(dead.sum())
        if ndead and (ndead << 3) >= sid.size:
            if badacc.any():
                bad[sid[badacc]] = True
            live = ~dead
            sid = sid[live]
            bit = bit[live]
            blk = blk[live]
            k = k[live]
            pred = pred[live]
            nblk = nblk[live]
            maxbit = maxbit[live]
            badacc = badacc[live]
            finprev = finprev[live]

    idx_list: list = [np.empty(0, np.int64)] * S
    val_list: list = [np.empty(0, np.int64)] * S
    if out_sid:
        asid = np.concatenate(out_sid)
        aidx = np.concatenate(out_idx)
        aval = np.concatenate(out_val)
        aemit = np.concatenate(out_emit)
        # drop non-emitting tokens, post-finish garbage (blk beyond the
        # stream's true block count) and bad streams in one mask
        keep = aemit & (aidx < (nblk0[asid] << 6)) & ~bad[asid]
        asid = asid[keep]
        aidx = aidx[keep]
        aval = aval[keep]
        order = np.argsort(asid, kind="stable")
        asid = asid[order]
        aidx = aidx[order]
        aval = aval[order]
        bounds = np.searchsorted(asid, np.arange(S + 1))
        for i in range(S):
            lo, hi = int(bounds[i]), int(bounds[i + 1])
            if hi > lo:
                idx_list[i] = aidx[lo:hi]
                val_list[i] = aval[lo:hi]
    return idx_list, val_list, bad


def decode_jpeg_batch(blobs, chunk: int = 512) -> list:
    """Decode a batch of JPEG blobs; result[i] == decode_jpeg(blobs[i])
    exactly (pinned by test), including raising the scalar path's error
    for malformed streams.  Single-component baseline streams sharing a
    table set run through the lockstep entropy decoder + one batched
    dequant/IDCT; everything else decodes per image."""
    out: list = [None] * len(blobs)
    fast: list = []
    for i, blob in enumerate(blobs):
        try:
            info = _parse_gray_baseline(bytes(blob))
        except Exception:
            info = None
        if info is None:
            out[i] = decode_jpeg(blob)
        else:
            fast.append((i, info))
    groups: dict = {}
    for i, info in fast:
        fh, fw, q, dcp, acp, ss = info
        groups.setdefault((dcp, acp, q.tobytes()), []).append((i, info))
    for (dcp, acp, _qb), items in groups.items():
        entries = []
        for i, (fh, fw, q, _d, _a, ss) in items:
            data, _ = _unstuff_scan(blobs[i], ss)
            entries.append((i, fh, fw, q, data))
        # sort by entropy length so lockstep chunks finish together
        entries.sort(key=lambda e: len(e[4]))
        for c0 in range(0, len(entries), chunk):
            part = entries[c0 : c0 + chunk]
            nb = np.array(
                [((e[2] + 7) // 8) * ((e[1] + 7) // 8) for e in part],
                np.int64,
            )
            idxs, vals, bad = _entropy_decode_gray_lockstep(
                [e[4] for e in part], nb, dcp, acp
            )
            good = np.flatnonzero(~bad)
            if good.size:
                nbg = nb[good]
                offs = np.zeros(good.size + 1, np.int64)
                np.cumsum(nbg, out=offs[1:])
                zzcat = np.zeros((int(offs[-1]), 64), np.int32)
                flat = zzcat.reshape(-1)
                for jj, j in enumerate(good):
                    if idxs[j].size:
                        flat[idxs[j] + (offs[jj] << 6)] = vals[j]
                q = part[int(good[0])][3]
                # same math (and the same stacked-8x8 matmul) as
                # _reconstruct's grayscale branch, over the whole chunk
                coef = (
                    zzcat[:, _UNZIGZAG].reshape(-1, 8, 8) * q
                ).astype(np.float64)
                pix = _D.T @ coef @ _D + 128.0
                # round/clip/uint8 once per chunk: elementwise, so
                # identical to the scalar path's crop-then-round order
                pixu8 = np.clip(np.round(pix), 0, 255).astype(np.uint8)
                for jj, j in enumerate(good):
                    i, fh, fw, _q, _data = part[j]
                    bw_i = (fw + 7) // 8
                    bh_i = (fh + 7) // 8
                    plane = (
                        pixu8[offs[jj] : offs[jj + 1]]
                        .reshape(bh_i, bw_i, 8, 8)
                        .transpose(0, 2, 1, 3)
                        .reshape(bh_i * 8, bw_i * 8)
                    )
                    out[i] = np.ascontiguousarray(plane[:fh, :fw])
            for j in np.flatnonzero(bad):
                out[part[int(j)][0]] = decode_jpeg(blobs[part[int(j)][0]])
    return out


def jpeg_codec(blob: bytes, w: int, h: int, fmt: str) -> np.ndarray:
    """Codec-registry adapter with geometry sanity check."""
    a = decode_jpeg(blob)
    if a.shape[:2] != (int(h), int(w)):
        raise ValueError(
            f"JPEG geometry mismatch: decoded {a.shape[:2]}, "
            f"metadata says {(int(h), int(w))}"
        )
    return a


def jpeg_codec_batch(blobs, ws, hs, fmt) -> list:
    """Batch codec-registry adapter (companion of jpeg_codec): same
    geometry check per image, decode via decode_jpeg_batch."""
    arrs = decode_jpeg_batch(blobs)
    for a, w, h in zip(arrs, ws, hs):
        if a.shape[:2] != (int(h), int(w)):
            raise ValueError(
                f"JPEG geometry mismatch: decoded {a.shape[:2]}, "
                f"metadata says {(int(h), int(w))}"
            )
    return arrs


def register_jpeg_codec() -> None:
    from .images import register_batch_codec, register_codec

    register_codec("jpeg", jpeg_codec)
    register_batch_codec("jpeg", jpeg_codec_batch, jpeg_codec)


def psnr_db(a: np.ndarray, b: np.ndarray) -> float:
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0 ** 2 / mse)
