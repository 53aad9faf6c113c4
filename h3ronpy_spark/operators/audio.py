"""Audio operators over opaque-binary WAV columns (round 7).

The third modality of the engine's multimodal column model (image:
operators/multimodal.py, video: sample_frames): audio clips live as
WAV blobs in a binary column with typed metadata, and every operator
here is a mapInPandas Pandas-UDF over Arrow batches — decode stays
executor-side, nothing pixel/sample-shaped ever crosses the driver.

Operators:

  * synth_audio — deterministic synthetic speech-ish clips (sum of
    id-seeded sine partials + hash noise), the audio analogue of
    sources.images.synth_images: same id -> same bytes on every
    executor, so oracles are exact.
  * extract_audio_features — (audio_id, embedding[12]): RMS, peak,
    zero-crossing rate, duration, and an 8-band log-spaced spectral
    energy profile (numpy rfft per clip, vectorized within batch).
  * resample_audio — linear-interpolation rate conversion (the
    deterministic stand-in for a real polyphase resampler; the shape
    of the pipeline — decode, transform, re-encode — is what a
    100-TB ingest needs, and a libsamplerate-backed fn can replace
    the kernel via the same column contract).
  * chunk_audio — fixed-window splitting with hop, one row per
    window (the audio analogue of video frame sampling): training
    pipelines feed fixed-length windows, not whole clips.

At 100-TB scale all four are embarrassingly parallel over rows —
no shuffle, no skew surface; partition count is inherited from the
input scan.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources.wav import decode_wav, encode_wav

AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("audio_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), False),
        T.StructField("rate", T.IntegerType(), False),
        T.StructField("n_samples", T.IntegerType(), False),
        T.StructField("fmt", T.StringType(), False),
    ]
)


def _synth_clip(idx: int, rate: int, n: int) -> np.ndarray:
    """Deterministic clip for id `idx`: three sine partials with
    id-derived frequencies + low-amplitude hash noise, int16."""
    t = np.arange(n, dtype=np.float64) / rate
    f0 = 80.0 + (idx * 37) % 240  # 80-320 Hz fundamental
    x = (
        0.5 * np.sin(2 * np.pi * f0 * t)
        + 0.25 * np.sin(2 * np.pi * 2 * f0 * t + 0.5)
        + 0.125 * np.sin(2 * np.pi * 3.5 * f0 * t + 1.0)
    )
    # deterministic "noise": splitmix-style integer hash of sample idx
    # (the multiply wraps mod 2^64 by construction — do it in Python
    # ints and mask so numpy's scalar-overflow warning stays quiet)
    salt = np.uint64((idx * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF)
    z = np.arange(n, dtype=np.uint64) + salt
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    noise = (
        (z >> np.uint64(11)).astype(np.float64) / 2**53 - 0.5
    ) * 0.05
    return np.clip((x + noise) * 20000, -32768, 32767).astype(np.int16)


def synth_audio(
    spark: SparkSession,
    n: int,
    seconds: float = 1.0,
    rate: int = 8000,
    partitions: int | None = None,
) -> DataFrame:
    """n deterministic WAV clips (audio_id 'aud<i>')."""
    n_samp = int(seconds * rate)
    parts = partitions or min(max(1, n // 50), 64)
    base = spark.range(0, n, 1, parts)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids = b["id"].to_numpy()
            rows = {
                "audio_id": [f"aud{i}" for i in ids],
                "bytes": [
                    encode_wav(_synth_clip(int(i), rate, n_samp), rate)
                    for i in ids
                ],
                "rate": rate,
                "n_samples": n_samp,
                "fmt": "wav",
            }
            yield pd.DataFrame(rows)

    return base.mapInPandas(gen, AUDIO_SCHEMA)


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("audio_id", T.StringType(), False),
        T.StructField("embedding", T.ArrayType(T.FloatType()), False),
    ]
)

_N_SPEC_BANDS = 8


def extract_audio_features(audio: DataFrame) -> DataFrame:
    """(audio_id, embedding[12]): [rms, peak, zero-crossing rate,
    seconds] + 8 log-spaced spectral energy bands (fraction of total
    energy), all from the decoded mono-mixed float signal."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            vecs = []
            for blob in b["bytes"]:
                w = decode_wav(bytes(blob))
                x = w.samples.astype(np.float64)
                if x.ndim == 2:
                    x = x.mean(axis=1)
                if w.samples.dtype == np.uint8:
                    x = (x - 128.0) / 128.0
                elif np.issubdtype(w.samples.dtype, np.integer):
                    # full-scale per sample width (int16 -> 32768, ...)
                    x = x / float(
                        2 ** (8 * w.samples.dtype.itemsize - 1)
                    )
                n = len(x)
                rms = float(np.sqrt(np.mean(x**2))) if n else 0.0
                peak = float(np.abs(x).max()) if n else 0.0
                zcr = (
                    float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1])))
                    if n > 1
                    else 0.0
                )
                spec = np.abs(np.fft.rfft(x)) ** 2
                edges = np.unique(
                    np.geomspace(1, len(spec), _N_SPEC_BANDS + 1)
                    .astype(np.int64)
                )
                total = spec.sum() or 1.0
                bands = [
                    float(spec[lo:hi].sum() / total)
                    for lo, hi in zip(edges[:-1], edges[1:])
                ]
                bands += [0.0] * (_N_SPEC_BANDS - len(bands))
                vecs.append(
                    np.array(
                        [rms, peak, zcr, n / w.rate] + bands, np.float32
                    ).tolist()
                )
            yield pd.DataFrame(
                {"audio_id": b["audio_id"], "embedding": vecs}
            )

    return audio.mapInPandas(run, AUDIO_FEATURES_SCHEMA)


def resample_audio(audio: DataFrame, out_rate: int) -> DataFrame:
    """Linear-interpolation resample; output rows keep AUDIO_SCHEMA
    (bytes re-encoded at out_rate, n_samples updated)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            blobs, n_out = [], []
            for blob in b["bytes"]:
                w = decode_wav(bytes(blob))
                x = w.samples
                if x.ndim == 2:  # resample each channel
                    cols = [
                        _lin_resample(x[:, c], w.rate, out_rate)
                        for c in range(x.shape[1])
                    ]
                    y = np.stack(cols, axis=1)
                else:
                    y = _lin_resample(x, w.rate, out_rate)
                blobs.append(encode_wav(y, out_rate))
                n_out.append(y.shape[0])
            yield pd.DataFrame(
                {
                    "audio_id": b["audio_id"],
                    "bytes": blobs,
                    "rate": out_rate,
                    "n_samples": n_out,
                    "fmt": "wav",
                }
            )

    return audio.mapInPandas(run, AUDIO_SCHEMA)


def _lin_resample(x: np.ndarray, r_in: int, r_out: int) -> np.ndarray:
    n_out = int(round(len(x) * r_out / r_in))
    if n_out <= 1 or len(x) <= 1:
        return x[:n_out].copy()
    pos = np.arange(n_out, dtype=np.float64) * (len(x) - 1) / (n_out - 1)
    lo = np.floor(pos).astype(np.int64)
    hi = np.minimum(lo + 1, len(x) - 1)
    frac = pos - lo
    y = x[lo] * (1 - frac) + x[hi] * frac
    if np.issubdtype(x.dtype, np.integer):
        return np.round(y).astype(x.dtype)
    return y.astype(x.dtype)


CHUNK_SCHEMA = T.StructType(
    [
        T.StructField("audio_id", T.StringType(), False),
        T.StructField("chunk_idx", T.IntegerType(), False),
        T.StructField("bytes", T.BinaryType(), False),
        T.StructField("rate", T.IntegerType(), False),
        T.StructField("n_samples", T.IntegerType(), False),
        T.StructField("fmt", T.StringType(), False),
    ]
)


def chunk_audio(
    audio: DataFrame, window_samples: int, hop_samples: int | None = None
) -> DataFrame:
    """Fixed windows (hop defaults to window: non-overlapping); the
    trailing partial window is dropped, matching fixed-input trainers."""
    hop = hop_samples or window_samples
    if window_samples <= 0 or hop <= 0:
        raise ValueError("window/hop must be positive")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = {k: [] for k in (
                "audio_id", "chunk_idx", "bytes", "rate", "n_samples",
                "fmt",
            )}
            for aid, blob in zip(b["audio_id"], b["bytes"]):
                w = decode_wav(bytes(blob))
                x = w.samples
                k = 0
                for start in range(
                    0, x.shape[0] - window_samples + 1, hop
                ):
                    part = x[start : start + window_samples]
                    rows["audio_id"].append(aid)
                    rows["chunk_idx"].append(k)
                    rows["bytes"].append(encode_wav(part, w.rate))
                    rows["rate"].append(w.rate)
                    rows["n_samples"].append(window_samples)
                    rows["fmt"].append("wav")
                    k += 1
            yield pd.DataFrame(rows)

    return audio.mapInPandas(run, CHUNK_SCHEMA)
