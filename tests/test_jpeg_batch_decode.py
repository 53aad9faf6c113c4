"""Round-8: decode_jpeg_batch must be element-identical per image to
decode_jpeg — the fused flagship's jpeg leg decodes through it, and the
driver's jpeg-path query values depend on the decoded pixels."""

from __future__ import annotations

import numpy as np
import pytest

from h3ronpy_spark.sources.jpeg import (
    decode_jpeg,
    decode_jpeg_batch,
    encode_jpeg,
    encode_jpeg_progressive,
)


def _same(a: np.ndarray, b: np.ndarray) -> bool:
    return a.dtype == b.dtype and a.shape == b.shape and np.array_equal(a, b)


def test_batch_identical_corpus():
    from h3ronpy_spark.sources.images import gen_images_jpeg_pdf

    pdf = gen_images_jpeg_pdf(np.arange(400, dtype=np.int64))
    blobs = pdf["bytes"].tolist()
    ref = [decode_jpeg(b) for b in blobs]
    for chunk in (400, 64, 7):  # incl. uneven multi-chunk splits
        got = decode_jpeg_batch(blobs, chunk=chunk)
        assert all(_same(a, b) for a, b in zip(ref, got))


def test_batch_identical_edge_cases():
    rng = np.random.default_rng(5)
    bands = [
        np.zeros((8, 8), np.uint8),                    # all-zero DC only
        np.full((9, 17), 255, np.uint8),               # constant, padded
        np.arange(256, dtype=np.uint8).reshape(16, 16),
        rng.integers(0, 256, (64, 64)).astype(np.uint8),  # dense ACs
        np.eye(24, 40, dtype=np.uint8) * 255,          # long zero runs (ZRL)
        rng.integers(0, 2, (33, 63)).astype(np.uint8) * 255,
        rng.integers(0, 256, (7, 200)).astype(np.uint8),  # wide strip
        rng.integers(0, 256, (200, 7)).astype(np.uint8),  # tall strip
    ]
    # mixed qualities in ONE batch: distinct quantization tables force
    # the per-table-set grouping path
    blobs = [
        encode_jpeg(b, q) for b in bands for q in (93, 75, 25, 5)
    ]
    ref = [decode_jpeg(b) for b in blobs]
    got = decode_jpeg_batch(blobs, chunk=5)
    assert all(_same(a, b) for a, b in zip(ref, got))


def test_batch_mixed_fastpath_and_fallback():
    rng = np.random.default_rng(9)
    gray = rng.integers(0, 256, (24, 24)).astype(np.uint8)
    rgb = rng.integers(0, 256, (16, 16, 3)).astype(np.uint8)
    blobs = [
        encode_jpeg(gray, 90),                      # fast path
        encode_jpeg_progressive(gray, 90),          # scalar: SOF2
        encode_jpeg(rgb, 90),                       # scalar: 3 components
        encode_jpeg(rgb, 90, subsampling="420"),    # scalar: sampling
        encode_jpeg(gray, 40),                      # fast path, other table set
    ]
    ref = [decode_jpeg(b) for b in blobs]
    got = decode_jpeg_batch(blobs)
    assert all(_same(a, b) for a, b in zip(ref, got))


def test_batch_malformed_raises_like_scalar():
    gray = np.arange(64, dtype=np.uint8).reshape(8, 8)
    good = encode_jpeg(gray, 90)
    # header truncation (dies in the marker walk) and entropy-segment
    # truncation (parses fine, overdraws in the lockstep loop -> bad ->
    # scalar fallback raises): both must raise the scalar path's error
    for cut in (len(good) // 2, len(good) - 6):
        truncated = good[:cut]
        try:
            decode_jpeg(truncated)
            scalar_err = None
        except Exception as e:  # noqa: BLE001 - capture exact type
            scalar_err = type(e)
        assert scalar_err is not None
        with pytest.raises(scalar_err):
            decode_jpeg_batch([good, truncated])
    assert decode_jpeg_batch([]) == []
    assert _same(decode_jpeg_batch([good])[0], decode_jpeg(good))


def test_decode_images_with_batch_and_override():
    from h3ronpy_spark.sources.images import (
        batch_codec_snapshot,
        codec_snapshot,
        decode_image_with,
        decode_images_with,
        gen_images_jpeg_pdf,
    )
    from h3ronpy_spark.sources.jpeg import register_jpeg_codec

    register_jpeg_codec()
    codecs = codec_snapshot()
    batch = batch_codec_snapshot()
    pdf = gen_images_jpeg_pdf(np.arange(48, dtype=np.int64))
    blobs = pdf["bytes"].tolist()
    ws = pdf["w"].tolist()
    hs = pdf["h"].tolist()
    fmts = pdf["fmt"].tolist()
    ref = [
        decode_image_with(codecs, blobs[i], ws[i], hs[i], fmts[i])
        for i in range(len(blobs))
    ]
    got = decode_images_with(codecs, batch, blobs, ws, hs, fmts)
    assert all(_same(a, b) for a, b in zip(ref, got))

    # an override replaces the per-image fn -> batch path must disable
    calls = []

    def counting(blob, w, h, fmt):
        calls.append(1)
        return codecs["jpeg"](blob, w, h, fmt)

    over = dict(codecs)
    over["jpeg"] = counting
    got2 = decode_images_with(over, batch, blobs, ws, hs, fmts)
    assert len(calls) == len(blobs)
    assert all(_same(a, b) for a, b in zip(ref, got2))
