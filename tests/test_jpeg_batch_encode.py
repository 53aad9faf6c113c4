"""Round-8: encode_jpeg_batch_gray must be byte-identical per image to
encode_jpeg — the corpus generators now use it, and every declared
JPEG-path query value depends on those bytes."""

from __future__ import annotations

import numpy as np

from h3ronpy_spark.sources.jpeg import (
    decode_jpeg,
    encode_jpeg,
    encode_jpeg_batch_gray,
)


def test_batch_identical_corpus():
    from h3ronpy_spark.sources.images import gen_images_pdf

    pdf = gen_images_pdf(np.arange(400, dtype=np.int64))
    bands = [
        np.frombuffer(b, np.uint8).reshape(h, w)
        for b, w, h in zip(pdf["bytes"], pdf["w"], pdf["h"])
    ]
    for q in (93, 75, 50):
        ref = [encode_jpeg(b, q) for b in bands]
        got = encode_jpeg_batch_gray(bands, q)
        assert all(a == b for a, b in zip(ref, got))


def test_batch_identical_edge_cases():
    rng = np.random.default_rng(5)
    bands = [
        np.zeros((8, 8), np.uint8),                    # all-zero DC only
        np.full((9, 17), 255, np.uint8),               # constant, padded
        np.arange(256, dtype=np.uint8).reshape(16, 16),
        rng.integers(0, 256, (64, 64)).astype(np.uint8),  # dense ACs
        np.eye(24, 40, dtype=np.uint8) * 255,          # long zero runs (ZRL)
        rng.integers(0, 2, (33, 63)).astype(np.uint8) * 255,
    ]
    for q in (93, 25, 5):
        ref = [encode_jpeg(b, q) for b in bands]
        got = encode_jpeg_batch_gray(bands, q)
        assert all(a == b for a, b in zip(ref, got))
    # and the streams decode back
    for b, blob in zip(bands, encode_jpeg_batch_gray(bands, 93)):
        assert decode_jpeg(blob).shape == b.shape


def test_batch_empty_and_single():
    assert encode_jpeg_batch_gray([]) == []
    b = np.arange(64, dtype=np.uint8).reshape(8, 8)
    assert encode_jpeg_batch_gray([b], 80)[0] == encode_jpeg(b, 80)
