"""Audio column operators: native RIFF/WAVE (PCM) decode + per-clip
features, Arrow-batched.

WAV is an uncompressed container (RIFF chunks + raw PCM), so unlike
the compressed codecs it decodes natively with `struct` + numpy — no
external library. Supported: PCM 16-bit signed and 8-bit unsigned,
any channel count/sample rate, chunk order independent (fmt /data
located by walking the chunk list, extra chunks like LIST skipped).
Float/ADPCM/extensible formats raise NotImplementedError (the
documented environment stub, same policy as WebP for images).

`audio_features` is the Spark face: one mapInPandas pass computing
duration, rms, peak, and zero-crossing rate per clip — the standard
quick-reject signals for audio corpus curation (silence, clipping,
constant tones)."""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame


def decode_wav(content: bytes):
    """Parse a RIFF/WAVE byte string into (samples, sample_rate) with
    `samples` an int16 numpy array of shape [n_frames, n_channels]
    (8-bit input is widened and re-centered). Raises ValueError on a
    malformed container, NotImplementedError on non-PCM encodings."""
    if len(content) < 12 or content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(content):
        ctype = content[pos : pos + 4]
        (csize,) = struct.unpack_from("<I", content, pos + 4)
        body = content[pos + 8 : pos + 8 + csize]
        if ctype == b"fmt ":
            fmt = body
        elif ctype == b"data":
            data = body
        pos += 8 + csize + (csize & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt /data chunk")
    audio_format, n_channels, sample_rate = struct.unpack_from("<HHI", fmt, 0)
    bits_per_sample = struct.unpack_from("<H", fmt, 14)[0]
    if audio_format != 1:
        raise NotImplementedError(
            f"only PCM WAV is supported (format {audio_format})"
        )
    if n_channels < 1 or sample_rate < 1:
        raise ValueError("invalid fmt chunk")
    if bits_per_sample == 16:
        flat = np.frombuffer(data[: len(data) - (len(data) % (2 * n_channels))],
                             dtype="<i2")
        samples = flat.astype(np.int16)
    elif bits_per_sample == 8:
        flat = np.frombuffer(data[: len(data) - (len(data) % n_channels)],
                             dtype=np.uint8)
        samples = ((flat.astype(np.int16) - 128) << 8).astype(np.int16)
    else:
        raise NotImplementedError(f"{bits_per_sample}-bit PCM not supported")
    return samples.reshape(-1, n_channels), sample_rate


def wav_feature_row(content: bytes) -> dict:
    """Per-clip features from decoded PCM (numpy-vectorized), including
    two spectral signals from one rfft over the mono channel: the
    dominant frequency (peak magnitude bin, DC excluded) and the
    spectral centroid (magnitude-weighted mean frequency) — the
    standard cheap discriminators between speech, tones, and noise."""
    samples, rate = decode_wav(content)
    mono = samples[:, 0].astype(np.float64) / 32768.0
    n = len(mono)
    zc = int(np.count_nonzero(np.signbit(mono[1:]) != np.signbit(mono[:-1]))) if n > 1 else 0
    dominant = centroid = 0.0
    if n > 1:
        mag = np.abs(np.fft.rfft(mono))
        freqs = np.fft.rfftfreq(n, d=1.0 / rate)
        if len(mag) > 1:
            dominant = float(freqs[1 + int(np.argmax(mag[1:]))])
            total = float(np.sum(mag[1:]))
            if total > 0:
                centroid = float(np.sum(mag[1:] * freqs[1:]) / total)
    return {
        "sample_rate": rate,
        "n_channels": samples.shape[1],
        "n_frames": n,
        "duration_s": round(n / rate, 6),
        "rms": round(float(np.sqrt(np.mean(mono**2))) if n else 0.0, 6),
        "peak": round(float(np.max(np.abs(mono))) if n else 0.0, 6),
        "zero_crossing_rate": round(zc / (n - 1), 6) if n > 1 else 0.0,
        "dominant_freq_hz": round(dominant, 3),
        "spectral_centroid_hz": round(centroid, 3),
    }


AUDIO_FEATURE_SCHEMA = (
    "media_id long, sample_rate int, n_channels int, n_frames long, "
    "duration_s double, rms double, peak double, zero_crossing_rate double, "
    "dominant_freq_hz double, spectral_centroid_hz double, "
    "decode_error string"
)


def audio_features(df: DataFrame, id_col: str = "media_id",
                   content_col: str = "content") -> DataFrame:
    """One Arrow-batched mapInPandas pass over WAV payloads: duration,
    rms, peak, zero-crossing rate per clip. Undecodable payloads yield
    a row with `decode_error` set instead of failing the job (corrupt
    tolerance, same policy as the parquet source)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, content in zip(pdf[id_col], pdf[content_col]):
                base = {
                    "media_id": mid,
                    "sample_rate": None,
                    "n_channels": None,
                    "n_frames": None,
                    "duration_s": None,
                    "rms": None,
                    "peak": None,
                    "zero_crossing_rate": None,
                    "dominant_freq_hz": None,
                    "spectral_centroid_hz": None,
                    "decode_error": None,
                }
                try:
                    base.update(wav_feature_row(bytes(content)))
                except (ValueError, NotImplementedError) as exc:
                    base["decode_error"] = str(exc)
                rows.append(base)
            yield pd.DataFrame(rows)

    return df.mapInPandas(batches, schema=AUDIO_FEATURE_SCHEMA)
