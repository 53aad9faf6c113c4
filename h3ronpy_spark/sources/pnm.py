"""Pure-Python netpbm (PBM/PGM/PPM) codec (stdlib + numpy only).

Round-7 codec breadth: PNM is the classic uncompressed interchange
format vision/OCR pipelines emit as intermediates.  All six variants
decode — ASCII P1/P2/P3 and binary P4/P5/P6 — with 8- and 16-bit
maxvals (binary 16-bit is big-endian per the spec) and 1-bit PBM
(white=0/black=1 mapped to 255/0 like every viewer).  Comments (#)
are legal anywhere in the header.  encode_pnm writes binary P5/P6.
"""

from __future__ import annotations

import re

import numpy as np

__all__ = ["decode_pnm", "encode_pnm", "pnm_codec", "register_pnm_codec"]


def _read_header_tokens(blob: bytes, count: int) -> tuple[list, int]:
    """Read `count` whitespace-separated numeric tokens after the
    magic, skipping '#' comments; returns (tokens, data_offset)."""
    tokens: list[int] = []
    pos = 2
    n = len(blob)
    while len(tokens) < count and pos < n:
        c = blob[pos]
        if c == ord(b"#"):
            while pos < n and blob[pos] not in (10, 13):
                pos += 1
        elif c in (32, 9, 10, 13, 11, 12):
            pos += 1
        else:
            m = re.match(rb"\d+", blob[pos:])
            if m is None:
                raise ValueError("PNM: malformed header token")
            tokens.append(int(m.group()))
            pos += m.end()
    if len(tokens) < count:
        raise ValueError("PNM: truncated header")
    # exactly ONE whitespace byte separates the header from binary data
    if pos < n and blob[pos] in (32, 9, 10, 13, 11, 12):
        pos += 1
    return tokens, pos


def decode_pnm(blob: bytes) -> np.ndarray:
    if len(blob) < 2 or blob[0] != ord(b"P") or blob[1] not in b"123456":
        raise ValueError("not a PNM: bad magic")
    kind = chr(blob[1])
    bitmap = kind in "14"
    channels = 3 if kind in "36" else 1
    n_hdr = 2 if bitmap else 3
    toks, pos = _read_header_tokens(blob, n_hdr)
    w, h = toks[0], toks[1]
    maxval = 1 if bitmap else toks[2]
    if maxval < 1 or maxval > 65535:
        raise ValueError(f"PNM: bad maxval {maxval}")
    count = w * h * channels

    if kind in "123":  # ASCII
        vals = np.array(
            [int(t) for t in re.findall(rb"\d+", blob[pos:])][:count],
            np.int64,
        )
        if len(vals) < count:
            raise ValueError("PNM: truncated ASCII data")
    elif kind == "4":  # binary PBM: rows packed MSB-first
        row_bytes = (w + 7) // 8
        raw = np.frombuffer(blob, np.uint8, count=h * row_bytes,
                            offset=pos).reshape(h, row_bytes)
        vals = np.unpackbits(raw, axis=1)[:, :w].astype(np.int64).ravel()
    else:  # P5/P6 binary
        if maxval > 255:
            raw = np.frombuffer(blob, ">u2", count=count, offset=pos)
        else:
            raw = np.frombuffer(blob, np.uint8, count=count, offset=pos)
        vals = raw.astype(np.int64)

    if bitmap:  # PBM: 1 = black -> 0, 0 = white -> 255
        out = np.where(vals == 1, 0, 255).astype(np.uint8)
    elif maxval > 255:
        out = vals.astype(np.uint16)
    else:
        out = vals.astype(np.uint8)
    a = out.reshape(h, w) if channels == 1 else out.reshape(h, w, 3)
    return np.ascontiguousarray(a)


def encode_pnm(arr: np.ndarray) -> bytes:
    """(h, w) -> binary PGM (P5); (h, w, 3) -> binary PPM (P6);
    uint8 or uint16 (16-bit written big-endian per the spec)."""
    arr = np.asarray(arr)
    if arr.dtype not in (np.uint8, np.uint16):
        raise ValueError(f"unsupported dtype for PNM encode: {arr.dtype}")
    if arr.ndim == 2:
        magic = b"P5"
    elif arr.ndim == 3 and arr.shape[2] == 3:
        magic = b"P6"
    else:
        raise ValueError(f"unsupported array for PNM encode: {arr.shape}")
    h, w = arr.shape[:2]
    maxval = 255 if arr.dtype == np.uint8 else 65535
    hdr = magic + f"\n{w} {h}\n{maxval}\n".encode()
    data = (
        arr.tobytes()
        if arr.dtype == np.uint8
        else arr.astype(">u2").tobytes()
    )
    return hdr + data


def pnm_codec(blob: bytes, w: int, h: int, fmt: str) -> np.ndarray:
    a = decode_pnm(blob)
    if a.shape[:2] != (int(h), int(w)):
        raise ValueError(
            f"PNM geometry mismatch: decoded {a.shape[:2]}, "
            f"metadata says {(int(h), int(w))}"
        )
    return a


def register_pnm_codec() -> None:
    from .images import register_codec

    register_codec("pnm", pnm_codec)
