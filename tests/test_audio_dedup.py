"""Perceptual audio dedup (operators/audio_dedup.py): spectrogram-hash
invariance (bit depth, amplitude, sample rate), noise tolerance,
tone/program discrimination, corrupt tolerance, through-Spark pairs."""

from __future__ import annotations

import math

import numpy as np
import pytest

from opentelemetry_iceberg_exporter_spark.operators.audio_dedup import (
    audio_neardup_pairs,
    audio_signatures,
    wav_hash,
)

from test_audio_video import make_wav


def tone(freq, rate=8000, secs=1.0, amp=0.5):
    t = np.arange(int(rate * secs)) / rate
    return (amp * 32767 * np.sin(2 * math.pi * freq * t)).astype(
        np.int16
    ).reshape(-1, 1)


def _ham(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


class TestHash:
    def test_invariant_to_bit_depth_amplitude_rate(self):
        base = wav_hash(make_wav(tone(440), 8000))
        assert _ham(base, wav_hash(make_wav(tone(440), 8000, bits=8))) == 0
        assert _ham(base, wav_hash(make_wav(tone(440, amp=0.25), 8000))) == 0
        assert _ham(
            base, wav_hash(make_wav(tone(440, rate=16000), 16000))
        ) == 0

    def test_noise_tolerant(self):
        base = wav_hash(make_wav(tone(440), 8000))
        rng = np.random.RandomState(4)
        noised = np.clip(
            tone(440).astype(np.int32) + rng.randint(-500, 501, tone(440).shape),
            -32768, 32767,
        ).astype(np.int16)
        assert _ham(base, wav_hash(make_wav(noised, 8000))) <= 7

    def test_different_program_far_apart(self):
        base = wav_hash(make_wav(tone(440), 8000))
        assert _ham(base, wav_hash(make_wav(tone(880), 8000))) >= 12
        assert _ham(base, wav_hash(make_wav(tone(2000), 8000))) >= 12
        sweep = np.concatenate(
            [tone(200, secs=0.5), tone(1200, secs=0.5)]
        ).reshape(-1, 1)
        assert _ham(base, wav_hash(make_wav(sweep, 8000))) >= 12

    def test_time_structure_matters(self):
        """The grid has a time axis: the same two tones in opposite
        order hash differently."""
        ab = np.concatenate([tone(300, secs=0.5), tone(1500, secs=0.5)])
        ba = np.concatenate([tone(1500, secs=0.5), tone(300, secs=0.5)])
        d = _ham(
            wav_hash(make_wav(ab.reshape(-1, 1), 8000)),
            wav_hash(make_wav(ba.reshape(-1, 1), 8000)),
        )
        assert d >= 8


class TestCli:
    def test_audio_dedup_groups(self, spark, tmp_path, capsys):
        import duckdb
        import json

        from opentelemetry_iceberg_exporter_spark.__main__ import main

        inp = str(tmp_path / "media")
        spark.createDataFrame(
            [
                (1, make_wav(tone(440), 8000)),
                (2, make_wav(tone(440), 8000, bits=8)),
                (3, make_wav(tone(1800), 8000)),
            ],
            "media_id long, content binary",
        ).write.parquet(inp)
        out = str(tmp_path / "groups")
        rc = main(["audio-dedup", "--input", inp, "--output", out])
        assert rc == 0
        stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert stats["cmd"] == "audio-dedup" and stats["rows"] == 3
        rows = duckdb.sql(
            f"SELECT media_id, group_id, is_canonical FROM '{out}/*.parquet' ORDER BY media_id"
        ).fetchall()
        assert rows == [(1, 1, True), (2, 1, False), (3, 3, True)]


class TestPairs:
    def test_reencoded_and_noised_pair_up(self, spark):
        rng = np.random.RandomState(7)
        noised = np.clip(
            tone(440).astype(np.int32) + rng.randint(-400, 401, tone(440).shape),
            -32768, 32767,
        ).astype(np.int16)
        blobs = [
            (1, make_wav(tone(440), 8000)),
            (2, make_wav(tone(440), 8000, bits=8)),  # re-encode of 1
            (3, make_wav(noised, 8000)),             # noised near-dup of 1
            (4, make_wav(tone(1800), 8000)),         # different program
            (5, b"RIFFnope"),                        # corrupt -> excluded
        ]
        df = spark.createDataFrame(blobs, "media_id long, content binary")
        sigs = audio_signatures(df)
        got = {r["media_id"]: r["ahash"] for r in sigs.collect()}
        assert got[5] is None
        pairs = {
            (r["id_a"], r["id_b"]): r["hamming"]
            for r in audio_neardup_pairs(sigs).collect()
        }
        assert pairs[(1, 2)] == 0
        assert (1, 3) in pairs and pairs[(1, 3)] <= 8
        assert not any(4 in p for p in pairs)
        assert not any(5 in p for p in pairs)
