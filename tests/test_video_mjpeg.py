"""MJPEG frame extraction from ISO BMFF (operators/video.py): the
sample tables (stsd/stsz/stsc/stco) are synthesized INDEPENDENTLY from
ISO 14496-12 box layouts, frames come from the independent T.81 test
encoder — multi-chunk layouts, strided keyframes, video near-dup via
frame dHashes, codec and corrupt stubs."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from opentelemetry_iceberg_exporter_spark.operators.video import (
    decode_mjpeg_frame,
    mjpeg_samples,
    video_keyframes,
)

from test_jpeg_decode import _smooth, make_jpeg


def _box(btype: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + btype + body


def make_mjpeg_mp4(
    frames: list, chunks: list | None = None, codec: bytes = b"jpeg",
    use_co64: bool = False,
) -> bytes:
    """ISO BMFF stream with a video track of MJPEG samples. `chunks`
    lists samples-per-chunk (default: all frames in one chunk)."""
    chunks = chunks or [len(frames)]
    assert sum(chunks) == len(frames)
    ftyp = _box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2")
    mdat_body = b"".join(frames)
    mdat_off = len(ftyp) + 8  # body offset of mdat

    # chunk offsets: consecutive runs of frames inside mdat
    offsets = []
    pos = mdat_off
    fi = 0
    for spc in chunks:
        offsets.append(pos)
        for _ in range(spc):
            pos += len(frames[fi])
            fi += 1

    # stsd with one video sample entry of the given 4CC
    entry = (
        struct.pack(">I", 16 + 70) + codec + bytes(6) + struct.pack(">H", 1)
        + bytes(16) + struct.pack(">HH", 0, 0) + struct.pack(">II", 0x480000, 0x480000)
        + bytes(4) + struct.pack(">H", 1) + bytes(32) + struct.pack(">Hh", 24, -1)
    )
    stsd = _box(b"stsd", bytes(4) + struct.pack(">I", 1) + entry)
    stsz = _box(
        b"stsz",
        bytes(4) + struct.pack(">II", 0, len(frames))
        + b"".join(struct.pack(">I", len(f)) for f in frames),
    )
    # stsc runs: collapse identical consecutive samples-per-chunk
    runs = []
    for i, spc in enumerate(chunks):
        if not runs or runs[-1][1] != spc:
            runs.append((i + 1, spc))
    stsc = _box(
        b"stsc",
        bytes(4) + struct.pack(">I", len(runs))
        + b"".join(struct.pack(">III", fc, spc, 1) for fc, spc in runs),
    )
    if use_co64:
        stco = _box(
            b"co64",
            bytes(4) + struct.pack(">I", len(offsets))
            + b"".join(struct.pack(">Q", o) for o in offsets),
        )
    else:
        stco = _box(
            b"stco",
            bytes(4) + struct.pack(">I", len(offsets))
            + b"".join(struct.pack(">I", o) for o in offsets),
        )
    stbl = _box(b"stbl", stsd + stsz + stsc + stco)
    minf = _box(b"minf", stbl)
    hdlr = _box(b"hdlr", bytes(8) + b"vide" + bytes(12))
    mdia = _box(b"mdia", hdlr + minf)
    trak = _box(b"trak", mdia)
    mvhd = _box(
        b"mvhd", bytes(4) + b"\x00" * 8 + struct.pack(">II", 600, 1200) + b"\x00" * 80
    )
    moov = _box(b"moov", mvhd + trak)
    return ftyp + _box(b"mdat", mdat_body) + moov


def _frames(n, w=48, h=32, quality=90):
    return [make_jpeg(_smooth(w + 4 * i, h), quality=quality) for i in range(n)]


class TestSampleTables:
    def test_single_chunk(self):
        frames = _frames(3)
        mp4 = make_mjpeg_mp4(frames)
        samples = mjpeg_samples(mp4)
        assert [s for _, s in samples] == [len(f) for f in frames]
        for i, (off, size) in enumerate(samples):
            assert mp4[off : off + size] == frames[i]

    def test_multi_chunk_layout(self):
        frames = _frames(5)
        mp4 = make_mjpeg_mp4(frames, chunks=[2, 2, 1])
        samples = mjpeg_samples(mp4)
        assert len(samples) == 5
        for i, (off, size) in enumerate(samples):
            assert mp4[off : off + size] == frames[i]

    def test_co64_offsets(self):
        frames = _frames(2)
        mp4 = make_mjpeg_mp4(frames, use_co64=True)
        samples = mjpeg_samples(mp4)
        assert mp4[samples[1][0] : samples[1][0] + samples[1][1]] == frames[1]

    def test_foreign_codec_stubs(self):
        mp4 = make_mjpeg_mp4(_frames(1), codec=b"avc1")
        with pytest.raises(NotImplementedError, match="codec"):
            mjpeg_samples(mp4)

    def test_not_a_movie(self):
        with pytest.raises(ValueError, match="moov"):
            mjpeg_samples(b"RIFF....WAVE")


def make_mjpeg_avi(frames: list, handler: bytes = b"MJPG",
                   audio_first: bool = False, use_rec: bool = False) -> bytes:
    """Minimal RIFF/AVI with a vids stream and its dc MJPEG frames;
    audio_first prepends an auds strl (video becomes stream 1, frames
    '01dc'), use_rec nests the frames in an AVI 1.0 'rec ' group."""

    def chunk(cid: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return cid + struct.pack("<I", len(body)) + body + pad

    def lst(subtype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", subtype + body)

    strls = b""
    stream = 0
    if audio_first:
        strls += lst(b"strl", chunk(b"strh", b"auds" + b"\x00\x00\x00\x01" + bytes(48))
                     + chunk(b"strf", bytes(16)))
        stream = 1
    strls += lst(b"strl", chunk(b"strh", b"vids" + handler + bytes(48))
                 + chunk(b"strf", bytes(40)))
    hdrl = lst(b"hdrl", chunk(b"avih", bytes(56)) + strls)
    dc = f"{stream:02d}dc".encode()
    frame_chunks = b"".join(chunk(dc, f) for f in frames)
    if use_rec:
        frame_chunks = lst(b"rec ", frame_chunks)
    movi = lst(b"movi", frame_chunks)
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


class TestAviContainer:
    def test_avi_samples_and_decode(self):
        from opentelemetry_iceberg_exporter_spark.operators.video import (
            mjpeg_samples_avi,
        )

        frames = _frames(3, w=36, h=28)
        avi = make_mjpeg_avi(frames)
        samples = mjpeg_samples_avi(avi)
        assert len(samples) == 3
        for i, (off, size) in enumerate(samples):
            assert avi[off : off + size] == frames[i]
        arr = decode_mjpeg_frame(avi, 1)
        assert arr.shape == (28, 40, 3)

    def test_avi_odd_sized_frames_pad(self):
        # force an odd-length frame to exercise word alignment
        frames = _frames(2)
        if len(frames[0]) % 2 == 0:
            frames[0] += b"\xff\xd9"[:1]  # still decodes (trailing byte)
        from opentelemetry_iceberg_exporter_spark.operators.video import (
            mjpeg_samples_avi,
        )

        avi = make_mjpeg_avi(frames)
        samples = mjpeg_samples_avi(avi)
        assert avi[samples[1][0] : samples[1][0] + samples[1][1]] == frames[1]

    def test_avi_audio_first_stream_index(self):
        """Video as stream 1 (01dc) after an audio stream — the frames
        must still be found, not silently skipped."""
        from opentelemetry_iceberg_exporter_spark.operators.video import (
            mjpeg_samples_avi,
        )

        frames = _frames(2)
        avi = make_mjpeg_avi(frames, audio_first=True)
        samples = mjpeg_samples_avi(avi)
        assert len(samples) == 2
        assert avi[samples[0][0] : samples[0][0] + samples[0][1]] == frames[0]

    def test_avi_rec_interleave_groups(self):
        from opentelemetry_iceberg_exporter_spark.operators.video import (
            mjpeg_samples_avi,
        )

        frames = _frames(3)
        avi = make_mjpeg_avi(frames, use_rec=True)
        assert len(mjpeg_samples_avi(avi)) == 3

    def test_avi_foreign_codec_stubs(self):
        from opentelemetry_iceberg_exporter_spark.operators.video import (
            mjpeg_samples_avi,
        )

        with pytest.raises(NotImplementedError, match="codec"):
            mjpeg_samples_avi(make_mjpeg_avi(_frames(1), handler=b"H264"))

    def test_avi_through_spark_keyframes(self, spark):
        frames = _frames(2, w=24, h=20)
        df = spark.createDataFrame(
            [(1, make_mjpeg_avi(frames))], "media_id long, content binary"
        )
        rows = video_keyframes(df).collect()
        assert len(rows) == 2
        assert rows[0]["width"] == 24 and rows[0]["n_frames"] == 2


class TestFrameDecode:
    def test_decode_frames_roundtrip_dims(self):
        frames = _frames(3, w=40, h=24)
        mp4 = make_mjpeg_mp4(frames, chunks=[1, 2])
        for i in range(3):
            arr = decode_mjpeg_frame(mp4, i)
            assert arr.shape == (24, 40 + 4 * i, 3)


class TestKeyframesThroughSpark:
    def test_keyframes_and_stride(self, spark):
        frames = _frames(4)
        blobs = [
            (1, make_mjpeg_mp4(frames, chunks=[2, 2])),
            (2, make_mjpeg_mp4(_frames(1, w=20, h=16))),
            (3, b"garbage not a movie"),
        ]
        df = spark.createDataFrame(blobs, "media_id long, content binary")
        rows = video_keyframes(df, stride=2).collect()
        by_id: dict = {}
        for r in rows:
            by_id.setdefault(r["media_id"], []).append(r)
        assert [r["frame_idx"] for r in sorted(by_id[1], key=lambda r: r["frame_idx"])] == [0, 2]
        assert all(r["n_frames"] == 4 for r in by_id[1])
        assert by_id[2][0]["width"] == 20 and by_id[2][0]["height"] == 16
        assert by_id[3][0]["decode_error"] is not None

    def test_clip_level_neardup_pairs(self, spark):
        """Re-encoded clip pairs at the clip level; a clip sharing only
        one of its frames does not (fraction threshold)."""
        from opentelemetry_iceberg_exporter_spark.operators.video import (
            video_neardup_pairs,
        )
        from test_image_dedup import _photo

        # genuinely distinct frames — seeds chosen mutually >14 bits apart
        # (the _photo generator reuses structure across many seeds; a
        # scaled copy of ONE gradient would make every frame pair match)
        imgs = [_photo(20), _photo(21), _photo(22)]
        clip_hq = make_mjpeg_mp4([make_jpeg(i, quality=92) for i in imgs])
        clip_lq = make_mjpeg_mp4([make_jpeg(i, quality=70) for i in imgs])
        partial = make_mjpeg_mp4(
            [make_jpeg(imgs[0], quality=85),
             make_jpeg(_photo(23), quality=85),
             make_jpeg(_photo(25), quality=85)]
        )
        df = spark.createDataFrame(
            [(1, clip_hq), (2, clip_lq), (3, partial)],
            "media_id long, content binary",
        )
        kf = video_keyframes(df)
        pairs = {
            (r["id_a"], r["id_b"]): r
            for r in video_neardup_pairs(kf, min_frame_fraction=0.6).collect()
        }
        assert (1, 2) in pairs and pairs[(1, 2)]["matched_frames"] == 3
        assert pairs[(1, 2)]["frac_a"] == 1.0
        # partial shares 1/3 of its frames -> below the 0.6 threshold
        assert (1, 3) not in pairs and (2, 3) not in pairs

    def test_black_frames_carry_no_pairing_signal(self, spark):
        """Content-free frames (all-zero/all-one dHash — fades, black
        leaders) are excluded from BOTH the matching and the per-clip
        denominators: clips sharing ONLY black frames never pair, and
        clips sharing real content still pair on their content fraction
        even when padded with black frames."""
        from opentelemetry_iceberg_exporter_spark.operators.video import (
            video_neardup_pairs,
        )

        h1, h2 = 0x1234ABCD5678EF01, 0x1234ABCD5678EF03  # hamming 1
        rows = [
            # clips 1 and 2: one real shared frame + one black frame each
            (1, 0, 2, 8, 8, h1, None),
            (1, 1, 2, 8, 8, 0, None),
            (2, 0, 2, 8, 8, h2, None),
            (2, 1, 2, 8, 8, 0, None),
            # clips 3 and 4 share ONLY black/white frames
            (3, 0, 2, 8, 8, 0, None),
            (3, 1, 2, 8, 8, -1, None),
            (4, 0, 2, 8, 8, 0, None),
            (4, 1, 2, 8, 8, -1, None),
        ]
        kf = spark.createDataFrame(
            rows,
            "media_id long, frame_idx int, n_frames int, width int, "
            "height int, dhash long, decode_error string",
        )
        pairs = video_neardup_pairs(kf, min_frame_fraction=0.9).collect()
        assert {(r["id_a"], r["id_b"]) for r in pairs} == {(1, 2)}
        p = pairs[0]
        # denominators count CONTENT frames only: 1/1 matched, not 1/2
        assert p["frac_a"] == 1.0 and p["frac_b"] == 1.0

    def test_video_dedup_cli_groups(self, spark, tmp_path, capsys):
        import duckdb
        import json

        from opentelemetry_iceberg_exporter_spark.__main__ import main
        from test_image_dedup import _photo

        imgs = [_photo(20), _photo(21)]
        inp = str(tmp_path / "media")
        spark.createDataFrame(
            [
                (1, make_mjpeg_mp4([make_jpeg(i, quality=92) for i in imgs])),
                (2, make_mjpeg_avi([make_jpeg(i, quality=72) for i in imgs])),
                (3, make_mjpeg_mp4([make_jpeg(_photo(23), quality=90)])),
            ],
            "media_id long, content binary",
        ).write.parquet(inp)
        out = str(tmp_path / "groups")
        rc = main(["video-dedup", "--input", inp, "--output", out])
        assert rc == 0
        assert json.loads(capsys.readouterr().out.strip().splitlines()[-1])["rows"] == 3
        rows = duckdb.sql(
            f"SELECT media_id, group_id, is_canonical FROM '{out}/*.parquet' ORDER BY media_id"
        ).fetchall()
        # the MP4 and its AVI re-encode group together across containers
        assert rows == [(1, 1, True), (2, 1, False), (3, 3, True)]

    def test_wav_mutation_fuzz_only_contract_errors(self):
        """Random mutations/truncations of a valid WAV through
        decode_wav must raise only the contract errors — the
        audio_features batch-safety guarantee."""
        import numpy as np

        from opentelemetry_iceberg_exporter_spark.operators.audio import (
            decode_wav,
        )
        from test_audio_video import make_wav, sine

        rng = np.random.RandomState(9)
        valid = bytearray(make_wav(sine(seconds=0.05), 8000))
        for _ in range(200):
            m = bytearray(valid)
            for _ in range(rng.randint(1, 6)):
                m[rng.randint(0, len(m))] = rng.randint(0, 256)
            try:
                decode_wav(bytes(m[: rng.randint(8, len(m))]))
            except (ValueError, NotImplementedError):
                pass

    def test_parser_fuzz_only_contract_errors(self):
        """Corrupt container bytes must raise only ValueError /
        NotImplementedError — anything else would fail Arrow batches."""
        import numpy as np

        from opentelemetry_iceberg_exporter_spark.operators.video import (
            video_samples,
        )

        rng = np.random.RandomState(11)
        seeds = [b"RIFF", b"RIFF\x10\x00\x00\x00AVI ", b"\x00\x00\x00\x18ftypisom",
                 b"", b"\x00\x00\x00\x08moov"]
        for seed in seeds:
            for n in (0, 7, 40, 200):
                junk = seed + rng.bytes(n)
                try:
                    video_samples(junk)
                except (ValueError, NotImplementedError):
                    pass

    def test_video_neardup_via_frame_hashes(self, spark):
        """The same clip re-encoded at a different JPEG quality pairs up
        frame-for-frame through the shared banded-Hamming join."""
        from opentelemetry_iceberg_exporter_spark.operators.image_dedup import (
            banded_hamming_pairs,
        )
        from pyspark.sql import functions as F

        base_imgs = [_smooth(48, 32), _smooth(64, 40)]
        clip_hq = make_mjpeg_mp4([make_jpeg(i, quality=92) for i in base_imgs])
        clip_lq = make_mjpeg_mp4([make_jpeg(i, quality=70) for i in base_imgs])
        other = make_mjpeg_mp4([make_jpeg(255 - _smooth(48, 32), quality=90)])
        df = spark.createDataFrame(
            [(1, clip_hq), (2, clip_lq), (3, other)],
            "media_id long, content binary",
        )
        kf = video_keyframes(df).filter(F.col("dhash").isNotNull())
        # per-video signature rows: hash each sampled frame
        sigs = kf.select(
            (F.col("media_id") * 1000 + F.col("frame_idx")).alias("fid"),
            F.col("media_id"),
            F.col("dhash"),
        )
        pairs = banded_hamming_pairs(
            sigs.select(F.col("fid").alias("media_id"), "dhash"),
            "media_id",
            "dhash",
            max_distance=10,
        ).collect()
        matched = {(r["id_a"], r["id_b"]) for r in pairs}
        assert (1000, 2000) in matched  # frame 0 of clip 1 ~ frame 0 of clip 2
        assert (1001, 2001) in matched
        assert not any(a // 1000 == 3 or b // 1000 == 3 for a, b in matched)
