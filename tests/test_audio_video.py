"""Native audio (RIFF/WAVE PCM) decode and video (ISO BMFF) container
probing. Test payloads are synthesized from the public formats with
raw struct.pack — nothing shared with the decoders — and features are
checked against closed-form expectations (known sine amplitudes,
hand-built box trees)."""

from __future__ import annotations

import math
import struct

import numpy as np
import pytest

from opentelemetry_iceberg_exporter_spark.operators.audio import (
    audio_features,
    decode_wav,
    wav_feature_row,
)
from opentelemetry_iceberg_exporter_spark.operators.video import (
    probe_mp4,
    video_probe,
)


def make_wav(samples: np.ndarray, rate: int, bits: int = 16,
             extra_chunk: bool = False) -> bytes:
    """Spec-synthesized WAV writer (RIFF little-endian, fmt + data)."""
    n_ch = samples.shape[1] if samples.ndim == 2 else 1
    frames = samples.reshape(-1, n_ch)
    if bits == 16:
        payload = frames.astype("<i2").tobytes()
    else:
        payload = ((frames.astype(np.int32) >> 8) + 128).astype(np.uint8).tobytes()
    block = n_ch * bits // 8
    fmt = struct.pack("<HHIIHH", 1, n_ch, rate, rate * block, block, bits)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    if extra_chunk:  # decoders must skip unknown chunks
        chunks += b"LIST" + struct.pack("<I", 4) + b"INFO"
    chunks += b"data" + struct.pack("<I", len(payload)) + payload
    if len(payload) % 2:
        chunks += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def sine(rate=8000, freq=440.0, seconds=0.5, amp=0.5, channels=1):
    t = np.arange(int(rate * seconds)) / rate
    mono = (amp * 32767 * np.sin(2 * math.pi * freq * t)).astype(np.int16)
    return np.repeat(mono[:, None], channels, axis=1)


def make_mp4(duration=900, timescale=600, handlers=("vide", "soun"),
             version=0) -> bytes:
    def box(btype: bytes, body: bytes) -> bytes:
        return struct.pack(">I", 8 + len(body)) + btype + body

    if version == 1:
        mvhd = box(b"mvhd", bytes([1, 0, 0, 0]) + b"\x00" * 16
                   + struct.pack(">IQ", timescale, duration) + b"\x00" * 80)
    else:
        mvhd = box(b"mvhd", bytes(4) + b"\x00" * 8
                   + struct.pack(">II", timescale, duration) + b"\x00" * 80)
    traks = b""
    for h in handlers:
        hdlr = box(b"hdlr", bytes(8) + h.encode() + bytes(12))
        traks += box(b"trak", box(b"mdia", hdlr))
    moov = box(b"moov", mvhd + traks)
    ftyp = box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2")
    return ftyp + moov


class TestWavDecode:
    def test_roundtrip_16bit_stereo(self):
        src = sine(channels=2)
        samples, rate = decode_wav(make_wav(src, 8000))
        assert rate == 8000 and samples.shape == src.shape
        assert np.array_equal(samples, src)

    def test_8bit_widens_and_recenters(self):
        src = sine(amp=0.25)
        samples, _ = decode_wav(make_wav(src, 8000, bits=8))
        # 8-bit round-trip loses the low byte only
        assert np.max(np.abs(samples.astype(int) - src.astype(int))) < 256

    def test_unknown_chunks_skipped(self):
        src = sine()
        samples, _ = decode_wav(make_wav(src, 8000, extra_chunk=True))
        assert np.array_equal(samples[:, 0], src[:, 0])

    def test_features_match_closed_form(self):
        row = wav_feature_row(make_wav(sine(amp=0.5, seconds=1.0), 8000))
        assert row["duration_s"] == 1.0
        assert row["sample_rate"] == 8000 and row["n_channels"] == 1
        # sine rms = amp/sqrt(2); zc rate = 2*freq/rate
        assert abs(row["rms"] - 0.5 / math.sqrt(2)) < 1e-3
        assert abs(row["peak"] - 0.5) < 1e-3
        assert abs(row["zero_crossing_rate"] - 2 * 440 / 8000) < 5e-3
        # a pure tone's spectrum peaks AT the tone; its centroid sits on
        # it too (spectral leakage pulls it off by well under a bin width)
        assert abs(row["dominant_freq_hz"] - 440.0) < 1.0
        assert abs(row["spectral_centroid_hz"] - 440.0) < 25.0

    def test_spectral_features_separate_tone_from_noise(self):
        tone = wav_feature_row(make_wav(sine(freq=200.0, seconds=1.0), 8000))
        rng = np.random.RandomState(5)
        noise = wav_feature_row(
            make_wav(
                (rng.uniform(-0.5, 0.5, 8000) * 32767).astype(np.int16).reshape(-1, 1),
                8000,
            )
        )
        assert abs(tone["dominant_freq_hz"] - 200.0) < 1.0
        # white noise's centroid sits near mid-band (rate/4), far above
        # the tone's
        assert noise["spectral_centroid_hz"] > 1500.0
        assert tone["spectral_centroid_hz"] < 300.0

    def test_rejects_non_wav_and_non_pcm(self):
        with pytest.raises(ValueError, match="RIFF"):
            decode_wav(b"\x00" * 64)
        bad = bytearray(make_wav(sine(), 8000))
        off = bad.find(b"fmt ") + 8
        struct.pack_into("<H", bad, off, 3)  # IEEE float format tag
        with pytest.raises(NotImplementedError, match="PCM"):
            decode_wav(bytes(bad))


class TestMp4Probe:
    def test_duration_tracks_handlers(self):
        meta = probe_mp4(make_mp4())
        assert meta["duration_s"] == 1.5
        assert meta["n_tracks"] == 2
        assert meta["handlers"] == ["soun", "vide"]

    def test_version1_64bit_mvhd(self):
        meta = probe_mp4(make_mp4(duration=1200, timescale=600, version=1))
        assert meta["duration_s"] == 2.0

    def test_malformed_raises(self):
        with pytest.raises(ValueError, match="moov"):
            probe_mp4(b"\x00" * 32)


class TestThroughSpark:
    def test_audio_features_batch(self, spark):
        rows = [
            (1, bytearray(make_wav(sine(amp=0.5), 8000))),
            (2, bytearray(make_wav(sine(amp=0.25, channels=2), 16000))),
            (3, bytearray(b"not a wav at all, definitely")),
        ]
        df = spark.createDataFrame(rows, "media_id long, content binary")
        out = {r["media_id"]: r for r in audio_features(df).collect()}
        assert abs(out[1]["rms"] - 0.5 / math.sqrt(2)) < 1e-3
        assert out[2]["sample_rate"] == 16000 and out[2]["n_channels"] == 2
        assert out[3]["decode_error"] is not None and out[3]["rms"] is None

    def test_video_probe_batch(self, spark):
        rows = [
            (1, bytearray(make_mp4())),
            (2, bytearray(make_mp4(duration=600, handlers=("vide",)))),
            (3, bytearray(b"junk")),
        ]
        df = spark.createDataFrame(rows, "media_id long, content binary")
        out = {r["media_id"]: r for r in video_probe(df).collect()}
        assert out[1]["duration_s"] == 1.5 and out[1]["n_tracks"] == 2
        assert out[2]["handlers"] == ["vide"]
        assert out[3]["probe_error"] is not None
