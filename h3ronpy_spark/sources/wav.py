"""Pure-Python WAV (RIFF PCM) codec (stdlib + numpy only).

Round-7 multimodal breadth: the engine's opaque-binary column model
covers image and video; audio is the third modality a training-data
pipeline ingests (task brief: "treat image/audio/video as opaque
binary columns with typed metadata").  WAV/PCM is the interchange
format actual speech corpora ship in, and it needs no entropy coding —
decode is a strided numpy view, exactly the shape the registry wants.

Scope: RIFF/WAVE with a PCM (format 1) or IEEE-float (format 3) fmt
chunk; 8-bit unsigned, 16/24/32-bit signed, float32/float64 samples;
any channel count (interleaved, returned as (n, ch) with mono
squeezed to (n,)).  Chunk walk skips unknown chunks (LIST/INFO/fact)
like every real reader.  Compressed formats (ADPCM, mp3-in-wav) raise
behind the registry seam.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np

__all__ = ["Wav", "decode_wav", "encode_wav"]


@dataclass
class Wav:
    samples: np.ndarray  # (n,) mono or (n, ch); dtype per source
    rate: int

    @property
    def seconds(self) -> float:
        return self.samples.shape[0] / self.rate


def decode_wav(blob: bytes) -> Wav:
    if blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a WAV: bad RIFF/WAVE header")
    pos = 12
    fmt = None
    data = None
    n = len(blob)
    while pos + 8 <= n:
        cid = blob[pos : pos + 4]
        (size,) = struct.unpack("<I", blob[pos + 4 : pos + 8])
        body = blob[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, channels, rate, _brate, _align, bits = fmt
    if audio_format == 0xFFFE:  # WAVE_FORMAT_EXTENSIBLE
        raise NotImplementedError(
            "WAVE_FORMAT_EXTENSIBLE unsupported; register a codec for "
            "exotic WAVs"
        )
    if audio_format == 1:  # PCM
        if bits == 8:
            a = np.frombuffer(data, np.uint8)
        elif bits == 16:
            a = np.frombuffer(data, "<i2")
        elif bits == 24:
            # 3-byte little-endian signed -> int32 (sign-extended)
            raw = np.frombuffer(data, np.uint8)
            raw = raw[: len(raw) - len(raw) % 3].reshape(-1, 3)
            a = (
                raw[:, 0].astype(np.int32)
                | (raw[:, 1].astype(np.int32) << 8)
                | (raw[:, 2].astype(np.int32) << 16)
            )
            a = (a << 8) >> 8  # sign-extend from bit 23
        elif bits == 32:
            a = np.frombuffer(data, "<i4")
        else:
            raise NotImplementedError(f"{bits}-bit PCM unsupported")
    elif audio_format == 3:  # IEEE float
        if bits == 32:
            a = np.frombuffer(data, "<f4")
        elif bits == 64:
            a = np.frombuffer(data, "<f8")
        else:
            raise NotImplementedError(f"{bits}-bit float WAV unsupported")
    else:
        raise NotImplementedError(
            f"WAV format {audio_format} unsupported (PCM/float only); "
            "register a codec for compressed audio"
        )
    if channels > 1:
        a = a[: len(a) - len(a) % channels].reshape(-1, channels)
    return Wav(samples=np.ascontiguousarray(a), rate=rate)


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """Encode (n,) or (n, ch) samples.  uint8 -> 8-bit PCM, int16 ->
    16-bit PCM, int32 -> 32-bit PCM, float32/float64 -> IEEE float."""
    a = np.asarray(samples)
    ch = 1 if a.ndim == 1 else a.shape[1]
    kind = a.dtype.kind
    if a.dtype == np.uint8:
        audio_format, bits = 1, 8
    elif a.dtype == np.int16:
        audio_format, bits = 1, 16
    elif a.dtype == np.int32:
        audio_format, bits = 1, 32
    elif kind == "f" and a.dtype.itemsize in (4, 8):
        audio_format, bits = 3, a.dtype.itemsize * 8
    else:
        raise ValueError(f"unsupported dtype for WAV encode: {a.dtype}")
    payload = np.ascontiguousarray(a).astype(
        a.dtype.newbyteorder("<")
    ).tobytes()
    align = ch * bits // 8
    fmt = struct.pack(
        "<HHIIHH", audio_format, ch, rate, rate * align, align, bits
    )
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        body += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
