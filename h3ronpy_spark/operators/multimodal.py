"""Multimodal column operators: image resize, feature extraction, video
frame sampling.

Images/videos are opaque binary columns with typed metadata (the
input_hint schema), processed in Arrow-batched mapInPandas — never
per-row Python.  The raw8 path is fully real (decode, resize,
features, frame slicing all computed); compressed codecs (png/jpeg/h264)
raise NotImplementedError at decode, matching the documented sandbox
limitation (sources/images.py) — the Spark-side plumbing (schemas,
batch shapes, explode semantics, partitioning) is identical either way,
which is the part that matters at 10^12-row scale.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources.images import codec_snapshot, decode_image_with

# ---------------------------------------------------------------------------
# resize
# ---------------------------------------------------------------------------

RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), False),
        T.StructField("w", T.IntegerType(), False),
        T.StructField("h", T.IntegerType(), False),
        T.StructField("fmt", T.StringType(), False),
        T.StructField("caption", T.StringType(), True),
        T.StructField("phash", T.LongType(), True),
    ]
)


def _resize_band(band: np.ndarray, out_w: int, out_h: int, method: str) -> np.ndarray:
    """Nearest or bilinear resample of a single-band uint8 image."""
    h, w = band.shape
    if method == "nearest":
        yi = np.minimum((np.arange(out_h) * h) // out_h, h - 1)
        xi = np.minimum((np.arange(out_w) * w) // out_w, w - 1)
        return band[yi[:, None], xi[None, :]]
    # bilinear
    y = (np.arange(out_h) + 0.5) * h / out_h - 0.5
    x = (np.arange(out_w) + 0.5) * w / out_w - 0.5
    y0 = np.clip(np.floor(y).astype(np.int64), 0, h - 1)
    x0 = np.clip(np.floor(x).astype(np.int64), 0, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = np.clip(y - y0, 0.0, 1.0)[:, None]
    wx = np.clip(x - x0, 0.0, 1.0)[None, :]
    b = band.astype(np.float64)
    top = b[y0[:, None], x0[None, :]] * (1 - wx) + b[y0[:, None], x1[None, :]] * wx
    bot = b[y1[:, None], x0[None, :]] * (1 - wx) + b[y1[:, None], x1[None, :]] * wx
    return np.clip(np.rint(top * (1 - wy) + bot * wy), 0, 255).astype(np.uint8)


def resize_images(
    images: DataFrame, out_w: int, out_h: int, method: str = "bilinear",
    honor_exif: bool = True,
) -> DataFrame:
    """images (input_hint schema) -> same schema with bytes/w/h resized
    (fmt becomes raw8: the resample output is an uncompressed band).

    honor_exif=True (default) resamples DISPLAY pixels: JPEG payloads
    carrying an EXIF orientation tag are transposed/flipped before the
    resize, the convention of real training pipelines (PIL
    exif_transpose; round 7).  Untagged payloads are unaffected."""
    if method not in ("nearest", "bilinear"):
        raise ValueError("method must be nearest or bilinear")
    codecs = codec_snapshot()  # plan-build capture: rides the closure
    orient = honor_exif

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            blobs, wc, hc = b["bytes"].tolist(), b["w"].tolist(), b["h"].tolist()
            fmts = b["fmt"].tolist()
            out = []
            for i in range(len(b)):
                band = decode_image_with(
                    codecs, blobs[i], int(wc[i]), int(hc[i]), fmts[i],
                    orient=orient,
                )
                out.append(
                    _resize_band(band, out_w, out_h, method).tobytes()
                )
            yield pd.DataFrame(
                {
                    "image_id": b["image_id"],
                    "bytes": out,
                    "w": out_w,
                    "h": out_h,
                    "fmt": "raw8",
                    "caption": b.get("caption"),
                    "phash": b.get("phash"),
                }
            )

    return images.mapInPandas(run, RESIZED_SCHEMA)


# ---------------------------------------------------------------------------
# feature extraction
# ---------------------------------------------------------------------------

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("embedding", T.ArrayType(T.FloatType()), False),
    ]
)

_N_HIST = 8


def extract_image_features(
    images: DataFrame, honor_exif: bool = True
) -> DataFrame:
    """images -> (image_id, embedding: array<float>[12]): mean, std,
    horizontal+vertical edge energy, and an 8-bin intensity histogram —
    a deterministic, fully-computed feature vector usable by the
    similarity operators (brute_force_topk / lsh_topk).

    honor_exif=True computes features over DISPLAY pixels (EXIF
    orientation applied for tagged JPEGs) so the directional edge
    energies match what a viewer sees; untagged payloads unaffected."""
    codecs = codec_snapshot()  # plan-build capture: rides the closure
    orient = honor_exif

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            blobs, wc, hc = b["bytes"].tolist(), b["w"].tolist(), b["h"].tolist()
            fmts = b["fmt"].tolist()
            vecs = []
            for i in range(len(b)):
                band = decode_image_with(
                    codecs, blobs[i], int(wc[i]), int(hc[i]), fmts[i],
                    orient=orient,
                ).astype(np.float64)
                gx = np.abs(np.diff(band, axis=1)).mean() if band.shape[1] > 1 else 0.0
                gy = np.abs(np.diff(band, axis=0)).mean() if band.shape[0] > 1 else 0.0
                hist = np.histogram(band, bins=_N_HIST, range=(0, 256))[0]
                hist = hist / max(band.size, 1)
                vecs.append(
                    np.concatenate(
                        [[band.mean(), band.std(), gx, gy], hist]
                    ).astype(np.float32).tolist()
                )
            yield pd.DataFrame({"image_id": b["image_id"], "embedding": vecs})

    return images.mapInPandas(run, FEATURES_SCHEMA)


# ---------------------------------------------------------------------------
# video frame sampling
# ---------------------------------------------------------------------------

FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("video_id", T.StringType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("bytes", T.BinaryType(), False),
        T.StructField("w", T.IntegerType(), False),
        T.StructField("h", T.IntegerType(), False),
        T.StructField("fmt", T.StringType(), False),
    ]
)


def sample_frames(videos: DataFrame, every_n: int = 10) -> DataFrame:
    """videos (video_id, bytes, w, h, fmt, n_frames) -> one row per
    sampled frame (every `every_n`-th, always including frame 0).

    raw8 videos are w*h*n_frames contiguous bytes and are sliced for real;
    compressed codecs raise NotImplementedError at decode (documented
    sandbox limitation), with identical output schema/explode shape."""
    if every_n < 1:
        raise ValueError("every_n must be >= 1")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids, out_idx, out_bytes, ws, hs = [], [], [], [], []
            for i in range(len(b)):
                w, h = int(b["w"].iloc[i]), int(b["h"].iloc[i])
                nf = int(b["n_frames"].iloc[i])
                fmt = b["fmt"].iloc[i]
                blob = b["bytes"].iloc[i]
                if fmt != "raw8":
                    raise NotImplementedError(
                        f"video codec {fmt!r} not available in this "
                        "environment; raw8 frames are sliced natively"
                    )
                frame_sz = w * h
                for fi in range(0, nf, every_n):
                    ids.append(b["video_id"].iloc[i])
                    out_idx.append(fi)
                    out_bytes.append(
                        blob[fi * frame_sz : (fi + 1) * frame_sz]
                    )
                    ws.append(w)
                    hs.append(h)
            yield pd.DataFrame(
                {
                    "video_id": ids,
                    "frame_idx": out_idx,
                    "bytes": out_bytes,
                    "w": ws,
                    "h": hs,
                    "fmt": "raw8",
                }
            )

    return videos.mapInPandas(run, FRAMES_SCHEMA)


def synth_videos(
    spark, n: int, n_frames: int = 24, w: int = 32, h: int = 24, seed: int = 7
) -> DataFrame:
    """Deterministic raw8 test videos (each frame = base pattern + frame
    index, so any frame's provenance is checkable)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for vid in b["id"].tolist():
                rng = np.random.default_rng(seed + vid)
                base = rng.integers(0, 200, size=(h, w), dtype=np.uint8)
                frames = [
                    np.clip(base.astype(np.int64) + fi, 0, 255).astype(np.uint8)
                    for fi in range(n_frames)
                ]
                rows.append(
                    (
                        f"vid{vid:06d}",
                        b"".join(f.tobytes() for f in frames),
                        w,
                        h,
                        "raw8",
                        n_frames,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["video_id", "bytes", "w", "h", "fmt", "n_frames"],
            )

    schema = (
        "video_id string, bytes binary, w int, h int, fmt string, "
        "n_frames int"
    )
    from ..sources.images import _default_parts

    return spark.range(0, n, 1, _default_parts(spark, n)).mapInPandas(
        gen, schema
    )
