"""WAV codec + audio operators: hand-built RIFF golden, roundtrips,
Spark-side feature/resample/chunk pipelines."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from h3ronpy_spark.sources.wav import decode_wav, encode_wav


@pytest.fixture(scope="module")
def spark():
    from h3ronpy_spark.session import get_spark

    s = get_spark(
        "local[4]", app_name="h3spark_audio_tests", shuffle_partitions=4
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


def _hand_built_16bit() -> bytes:
    """4 mono int16 samples [0, 1000, -1000, 32767] at 8000 Hz, built
    byte-by-byte (independent of encode_wav), with a LIST chunk the
    reader must skip."""
    data = struct.pack("<4h", 0, 1000, -1000, 32767)
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"LIST" + struct.pack("<I", 4) + b"INFO"  # skipped chunk
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


class TestWavCodec:
    def test_hand_built_golden(self):
        w = decode_wav(_hand_built_16bit())
        assert w.rate == 8000
        assert w.samples.tolist() == [0, 1000, -1000, 32767]
        assert w.samples.dtype == np.int16
        assert abs(w.seconds - 4 / 8000) < 1e-12

    def test_bad_signature(self):
        with pytest.raises(ValueError, match="RIFF"):
            decode_wav(b"JUNK" + _hand_built_16bit()[4:])

    @pytest.mark.parametrize(
        "dtype", ["uint8", "int16", "int32", "float32", "float64"]
    )
    def test_roundtrip_mono(self, dtype):
        rng = np.random.default_rng(1)
        if dtype == "uint8":
            x = rng.integers(0, 256, 500).astype(dtype)
        elif dtype.startswith("int"):
            x = rng.integers(-1000, 1000, 500).astype(dtype)
        else:
            x = rng.normal(size=500).astype(dtype)
        w = decode_wav(encode_wav(x, 16000))
        assert w.rate == 16000
        assert w.samples.dtype == x.dtype
        assert (w.samples == x).all()

    def test_roundtrip_stereo(self):
        rng = np.random.default_rng(2)
        x = rng.integers(-500, 500, (300, 2)).astype(np.int16)
        w = decode_wav(encode_wav(x, 44100))
        assert w.samples.shape == (300, 2)
        assert (w.samples == x).all()

    def test_24bit_decode(self):
        """24-bit PCM hand-packed: values incl. negative sign-extend."""
        vals = [0, 1, -1, 8388607, -8388608]
        raw = b"".join(
            (v & 0xFFFFFF).to_bytes(3, "little") for v in vals
        )
        fmt = struct.pack("<HHIIHH", 1, 1, 8000, 24000, 3, 24)
        body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
        body += b"data" + struct.pack("<I", len(raw)) + raw + b"\x00"
        blob = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
        w = decode_wav(blob)
        assert w.samples.tolist() == vals

    def test_odd_data_chunk_alignment(self):
        """An odd-length chunk is padded to a word boundary: a
        following chunk must still be found."""
        junk = b"zzz"
        fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
        data = bytes([128, 130, 126])
        body = b"junk" + struct.pack("<I", len(junk)) + junk + b"\x00"
        body += b"fmt " + struct.pack("<I", len(fmt)) + fmt
        body += b"data" + struct.pack("<I", len(data)) + data + b"\x00"
        blob = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
        w = decode_wav(blob)
        assert w.samples.tolist() == [128, 130, 126]

    def test_adpcm_rejected(self):
        fmt = struct.pack("<HHIIHH", 2, 1, 8000, 8000, 1, 4)
        body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
        body += b"data" + struct.pack("<I", 2) + b"\x00\x00"
        blob = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
        with pytest.raises(NotImplementedError, match="format 2"):
            decode_wav(blob)


class TestResampleKernel:
    def test_identity(self):
        from h3ronpy_spark.operators.audio import _lin_resample

        x = np.arange(100, dtype=np.int16)
        assert (_lin_resample(x, 8000, 8000) == x).all()

    def test_upsample_endpoints(self):
        from h3ronpy_spark.operators.audio import _lin_resample

        x = np.array([0.0, 1.0], np.float64)
        y = _lin_resample(x, 1, 4)
        assert len(y) == 8
        assert y[0] == 0.0 and y[-1] == 1.0
        assert (np.diff(y) >= 0).all()

    def test_downsample_preserves_ramp(self):
        from h3ronpy_spark.operators.audio import _lin_resample

        x = np.linspace(0, 1, 1000)
        y = _lin_resample(x, 16000, 8000)
        assert len(y) == 500
        assert np.allclose(y, np.linspace(0, 1, 500), atol=1e-9)


class TestSparkAudio:
    def test_synth_deterministic(self, spark):
        from h3ronpy_spark.operators.audio import synth_audio

        a = synth_audio(spark, 10, seconds=0.25).orderBy("audio_id")
        b = synth_audio(spark, 10, seconds=0.25).orderBy("audio_id")
        ra, rb = a.collect(), b.collect()
        assert [r["audio_id"] for r in ra] == [r["audio_id"] for r in rb]
        assert all(
            bytes(x["bytes"]) == bytes(y["bytes"]) for x, y in zip(ra, rb)
        )

    def test_features_shape_and_bounds(self, spark):
        from h3ronpy_spark.operators.audio import (
            extract_audio_features,
            synth_audio,
        )

        feats = extract_audio_features(
            synth_audio(spark, 20, seconds=0.25)
        ).collect()
        assert len(feats) == 20
        for r in feats:
            e = r["embedding"]
            assert len(e) == 12
            rms, peak, zcr, secs = e[:4]
            assert 0 < rms <= peak <= 1.0
            assert 0 <= zcr < 1
            assert abs(secs - 0.25) < 1e-6
            assert abs(sum(e[4:]) - 1.0) < 1e-3  # bands ~ total energy

    def test_resample_halves_samples(self, spark):
        from h3ronpy_spark.operators.audio import (
            resample_audio,
            synth_audio,
        )

        out = resample_audio(
            synth_audio(spark, 5, seconds=0.5, rate=8000), 4000
        ).collect()
        for r in out:
            assert r["rate"] == 4000
            assert r["n_samples"] == 2000
            w = decode_wav(bytes(r["bytes"]))
            assert w.rate == 4000 and len(w.samples) == 2000

    def test_chunking(self, spark):
        from h3ronpy_spark.operators.audio import chunk_audio, synth_audio

        out = chunk_audio(
            synth_audio(spark, 4, seconds=0.5, rate=8000), 1000
        ).collect()
        # 4000 samples / 1000 window -> 4 chunks per clip
        assert len(out) == 16
        for r in out:
            assert r["n_samples"] == 1000
            assert len(decode_wav(bytes(r["bytes"])).samples) == 1000

    def test_chunk_overlap_hop(self, spark):
        from h3ronpy_spark.operators.audio import chunk_audio, synth_audio

        out = chunk_audio(
            synth_audio(spark, 1, seconds=0.5, rate=8000),
            2000,
            hop_samples=1000,
        ).collect()
        # windows at 0,1000,2000 -> 3 (3000-start would exceed 4000)
        assert len(out) == 3

    def test_resample_roundtrip_tone(self, spark):
        """Down- then up-sample of a low-frequency tone stays close
        (the kernel is a stand-in, not a brick-wall resampler)."""
        from h3ronpy_spark.operators.audio import (
            resample_audio,
            synth_audio,
        )

        base = synth_audio(spark, 1, seconds=0.25, rate=8000)
        down_up = resample_audio(resample_audio(base, 4000), 8000)
        x0 = decode_wav(bytes(base.first()["bytes"])).samples.astype(
            np.float64
        )
        x1 = decode_wav(
            bytes(down_up.first()["bytes"])
        ).samples.astype(np.float64)
        n = min(len(x0), len(x1))
        err = np.sqrt(np.mean((x0[:n] - x1[:n]) ** 2))
        assert err < 0.15 * np.sqrt(np.mean(x0[:n] ** 2))


class TestG711:
    def test_ulaw_anchors(self):
        from h3ronpy_spark.sources.wav import ulaw_to_linear

        t = ulaw_to_linear(np.arange(256))
        assert t[0xFF] == 0 and t[0x7F] == 0  # digital silence (+/-0)
        # CCITT g711.c ulaw2linear max magnitude: 32124 (16-bit domain;
        # 8031 in the 14-bit domain x4)
        assert t.max() == 32124 and t.min() == -32124
        assert len(np.unique(t)) == 255  # +0 and -0 collide

    def test_alaw_anchors(self):
        from h3ronpy_spark.sources.wav import alaw_to_linear

        t = alaw_to_linear(np.arange(256))
        assert t[0xD5] == 8  # A-law 'zero' (no true 0)
        # CCITT g711.c alaw2linear max magnitude (16-bit domain)
        assert t.max() == 32256 and t.min() == -32256
        assert len(np.unique(t)) == 256

    @pytest.mark.parametrize("law", ["ulaw", "alaw"])
    def test_compand_roundtrip_exact_on_code_points(self, law):
        from h3ronpy_spark.sources import wav as W

        dec = (
            W.ulaw_to_linear if law == "ulaw" else W.alaw_to_linear
        )
        enc = (
            W.linear_to_ulaw if law == "ulaw" else W.linear_to_alaw
        )
        table = dec(np.arange(256))
        # every decode value must re-encode to a byte that decodes back
        # to itself (exact inverse on code points)
        assert (dec(enc(table)) == table).all()

    @pytest.mark.parametrize("law", ["ulaw", "alaw"])
    def test_compand_error_bound(self, law):
        from h3ronpy_spark.sources import wav as W

        dec = (
            W.ulaw_to_linear if law == "ulaw" else W.alaw_to_linear
        )
        enc = (
            W.linear_to_ulaw if law == "ulaw" else W.linear_to_alaw
        )
        rng = np.random.default_rng(17)
        lim = 8000 if law == "ulaw" else 4000
        x = rng.integers(-lim, lim, 5000).astype(np.int16)
        err = np.abs(dec(enc(x)).astype(np.int32) - x)
        # logarithmic quantization: error grows with magnitude but is
        # bounded by half the largest step
        assert err.max() <= 256
        small = np.abs(x) < 100
        assert err[small].max() <= 8

    @pytest.mark.parametrize("code,name", [(7, "ulaw"), (6, "alaw")])
    def test_wav_decode_g711(self, code, name):
        from h3ronpy_spark.sources import wav as W

        enc = (
            W.linear_to_ulaw if name == "ulaw" else W.linear_to_alaw
        )
        dec = (
            W.ulaw_to_linear if name == "ulaw" else W.alaw_to_linear
        )
        x = (np.sin(np.arange(400) / 10) * 3000).astype(np.int16)
        payload = enc(x).tobytes()
        fmt = struct.pack("<HHIIHH", code, 1, 8000, 8000, 1, 8)
        body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
        body += b"data" + struct.pack("<I", len(payload)) + payload
        blob = (
            b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
        )
        w = decode_wav(blob)
        assert w.samples.dtype == np.int16
        assert (w.samples == dec(np.frombuffer(payload, np.uint8))).all()
