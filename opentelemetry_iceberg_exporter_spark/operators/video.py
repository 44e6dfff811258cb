"""Video container probing + MJPEG frame decode: native ISO BMFF
(MP4/MOV) box walking, and REAL keyframe extraction for Motion-JPEG
tracks.

The ISO base-media container is plain length-tagged boxes, so duration,
timescale, and track layout parse natively (`probe_mp4`); corpus
curation filters on those before any decode. Beyond probing, the spec's
SAMPLE TABLES (stsd codec entry, stsz sizes, stsc sample-to-chunk runs,
stco/co64 chunk offsets — ISO 14496-12 §8.5-8.7) resolve every video
sample to an absolute (offset, size) in the file — and for Motion-JPEG
tracks each sample IS a baseline JPEG, which operators/jpeg.py decodes
natively. So MJPEG keyframe extraction is REAL end to end with no codec
library: `mjpeg_samples` plans the sample list (pure metadata),
`video_keyframes` decodes a strided subset per clip and emits per-frame
dims + the perceptual dHash (image_dedup), which makes VIDEO near-dup
detection a banded-Hamming join over frame hashes. Inter-coded codecs
(avc1/hevc/vp9) stay environment-stubbed like WebP — they need
entropy/motion machinery, not container work."""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame


def _boxes(buf: bytes, start: int, end: int):
    """Yield (type, body_start, body_end) for ISO BMFF boxes in range."""
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack_from(">I", buf, pos)
        btype = buf[pos + 4 : pos + 8]
        header = 8
        if size == 1:  # 64-bit largesize
            if pos + 16 > end:
                return
            (size,) = struct.unpack_from(">Q", buf, pos + 8)
            header = 16
        elif size == 0:  # box extends to end of file
            size = end - pos
        if size < header or pos + size > end:
            return  # malformed: stop cleanly
        yield btype, pos + header, pos + size
        pos += size


def probe_mp4(content: bytes) -> dict:
    """Container metadata from the moov tree. Raises ValueError when no
    moov/mvhd is present (not an ISO BMFF movie)."""
    moov = next(
        ((s, e) for t, s, e in _boxes(content, 0, len(content)) if t == b"moov"),
        None,
    )
    if moov is None:
        raise ValueError("no moov box: not an ISO BMFF movie")
    timescale = duration = None
    handlers: list[str] = []
    n_tracks = 0
    for btype, s, e in _boxes(content, *moov):
        if btype == b"mvhd":
            version = content[s]
            if version == 1:
                timescale, duration = struct.unpack_from(">IQ", content, s + 4 + 16)
            else:
                timescale, duration = struct.unpack_from(">II", content, s + 4 + 8)
        elif btype == b"trak":
            n_tracks += 1
            for t2, s2, e2 in _boxes(content, s, e):
                if t2 == b"mdia":
                    for t3, s3, _e3 in _boxes(content, s2, e2):
                        if t3 == b"hdlr":
                            handlers.append(
                                content[s3 + 8 : s3 + 12].decode("ascii", "replace")
                            )
    if timescale is None:
        raise ValueError("moov has no mvhd")
    return {
        "timescale": timescale,
        "duration_units": duration,
        "duration_s": round(duration / timescale, 6) if timescale else None,
        "n_tracks": n_tracks,
        "handlers": sorted(handlers),
    }


# sample-entry 4CCs whose samples are standalone JPEG images
MJPEG_FORMATS = {b"jpeg", b"mjpa", b"mjpb", b"MJPG", b"mjpg"}


def _find_box(content: bytes, start: int, end: int, btype: bytes):
    for t, s, e in _boxes(content, start, end):
        if t == btype:
            return s, e
    return None


def _video_stbl(content: bytes):
    """(format 4cc, stbl span) of the first track whose hdlr is 'vide'.
    Raises ValueError when no video track / sample tables exist."""
    moov = _find_box(content, 0, len(content), b"moov")
    if moov is None:
        raise ValueError("no moov box: not an ISO BMFF movie")
    for t, s, e in _boxes(content, *moov):
        if t != b"trak":
            continue
        mdia = _find_box(content, s, e, b"mdia")
        if mdia is None:
            continue
        hdlr = _find_box(content, *mdia, b"hdlr")
        if hdlr is None or content[hdlr[0] + 8 : hdlr[0] + 12] != b"vide":
            continue
        minf = _find_box(content, *mdia, b"minf")
        if minf is None:
            continue
        stbl = _find_box(content, *minf, b"stbl")
        if stbl is None:
            continue
        stsd = _find_box(content, *stbl, b"stsd")
        if stsd is None:
            raise ValueError("video track has no stsd")
        # stsd: ver/flags(4) entry_count(4) then entries (size, format)
        fmt = content[stsd[0] + 12 : stsd[0] + 16]
        return fmt, stbl
    raise ValueError("no video track with sample tables")


def mjpeg_samples(content: bytes) -> list:
    """[(absolute_offset, size)] for every sample of the first video
    track, from the spec sample tables (stsz + stsc + stco/co64) — pure
    metadata, nothing decoded. Raises NotImplementedError for
    inter-coded codecs (the environment-stub boundary) and ValueError
    on malformed tables."""
    fmt, stbl = _video_stbl(content)
    if fmt not in MJPEG_FORMATS:
        raise NotImplementedError(
            f"codec {fmt!r} needs a codec library; only MJPEG samples "
            "decode natively"
        )
    stsz = _find_box(content, *stbl, b"stsz")
    stsc = _find_box(content, *stbl, b"stsc")
    stco = _find_box(content, *stbl, b"stco")
    co64 = _find_box(content, *stbl, b"co64")
    if stsz is None or stsc is None or (stco is None and co64 is None):
        raise ValueError("video track missing stsz/stsc/stco tables")
    # stsz: ver/flags(4) sample_size(4) count(4) [sizes]
    fixed_size, n_samples = struct.unpack_from(">II", content, stsz[0] + 4)
    if fixed_size:
        sizes = [fixed_size] * n_samples
    else:
        sizes = list(
            struct.unpack_from(f">{n_samples}I", content, stsz[0] + 12)
        )
    # stco/co64: ver/flags(4) count(4) [offsets]
    if stco is not None:
        (n_chunks,) = struct.unpack_from(">I", content, stco[0] + 4)
        offsets = list(struct.unpack_from(f">{n_chunks}I", content, stco[0] + 8))
    else:
        (n_chunks,) = struct.unpack_from(">I", content, co64[0] + 4)
        offsets = list(struct.unpack_from(f">{n_chunks}Q", content, co64[0] + 8))
    # stsc: ver/flags(4) count(4) [(first_chunk, samples_per_chunk, idx)]
    (n_runs,) = struct.unpack_from(">I", content, stsc[0] + 4)
    runs = [
        struct.unpack_from(">III", content, stsc[0] + 8 + 12 * i)
        for i in range(n_runs)
    ]
    # expand: samples per chunk for every chunk (runs hold until the
    # next run's first_chunk; chunks are 1-based)
    per_chunk = []
    for i, (first, spc, _idx) in enumerate(runs):
        last = runs[i + 1][0] - 1 if i + 1 < len(runs) else n_chunks
        per_chunk.extend([spc] * (last - first + 1))
    if len(per_chunk) != n_chunks:
        raise ValueError("stsc runs do not cover the chunk list")
    out = []
    si = 0
    for chunk_i, spc in enumerate(per_chunk):
        pos = offsets[chunk_i]
        for _ in range(spc):
            if si >= n_samples:
                break
            out.append((pos, sizes[si]))
            pos += sizes[si]
            si += 1
    if si != n_samples:
        raise ValueError("sample tables inconsistent with sample count")
    return out


# -- AVI (RIFF) Motion-JPEG ------------------------------------------------

AVI_MJPEG_HANDLERS = {b"MJPG", b"mjpg", b"jpeg", b"dmb1"}


def _riff_chunks(buf: bytes, start: int, end: int):
    """Yield (fourcc, body_start, body_end) for RIFF chunks (word-
    aligned, little-endian sizes)."""
    pos = start
    while pos + 8 <= end:
        cid = buf[pos : pos + 4]
        (size,) = struct.unpack_from("<I", buf, pos + 4)
        body = pos + 8
        if body + size > end:
            return
        yield cid, body, body + size
        pos = body + size + (size & 1)  # chunks pad to even


def mjpeg_samples_avi(content: bytes) -> list:
    """[(absolute_offset, size)] of the video frames of an MJPEG AVI:
    walk hdrl's strl list to find the VIDEO stream's INDEX (streams are
    numbered by strl position — an audio-first AVI stores video frames
    as '01dc', not '00dc'), confirm its MJPEG handler, then collect
    that stream's dc/db chunks from the movi list, descending into
    AVI 1.0 'rec ' interleave groups."""
    if content[:4] != b"RIFF" or content[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI stream")
    video_handler = None
    video_stream = None
    samples = []
    stream_idx = 0
    for cid, s, e in _riff_chunks(content, 12, len(content)):
        if cid != b"LIST":
            continue
        subtype = content[s : s + 4]
        if subtype == b"hdrl":
            for c2, s2, e2 in _riff_chunks(content, s + 4, e):
                if c2 == b"LIST" and content[s2 : s2 + 4] == b"strl":
                    for c3, s3, _e3 in _riff_chunks(content, s2 + 4, e2):
                        if c3 == b"strh":
                            if (
                                content[s3 : s3 + 4] == b"vids"
                                and video_stream is None
                            ):
                                video_stream = stream_idx
                                video_handler = content[s3 + 4 : s3 + 8]
                    stream_idx += 1
    if video_handler is None or video_stream is None:
        raise ValueError("AVI has no video stream header")
    if video_handler not in AVI_MJPEG_HANDLERS:
        raise NotImplementedError(
            f"AVI codec {video_handler!r} needs a codec library; only "
            "MJPEG frames decode natively"
        )
    want = (
        f"{video_stream:02d}dc".encode(),
        f"{video_stream:02d}db".encode(),
    )

    def collect(start: int, end: int) -> None:
        for c2, s2, e2 in _riff_chunks(content, start, end):
            if c2 in want:
                samples.append((s2, e2 - s2))
            elif c2 == b"LIST" and content[s2 : s2 + 4] == b"rec ":
                collect(s2 + 4, e2)  # AVI 1.0 interleave group

    for cid, s, e in _riff_chunks(content, 12, len(content)):
        if cid == b"LIST" and content[s : s + 4] == b"movi":
            collect(s + 4, e)
    return samples


def video_samples(content: bytes) -> list:
    """Container dispatch: MJPEG sample list for ISO BMFF or AVI."""
    if content[:4] == b"RIFF":
        return mjpeg_samples_avi(content)
    return mjpeg_samples(content)


def decode_mjpeg_frame(content: bytes, index: int):
    """(H, W, 3) uint8 RGB of sample `index` (native T.81 decode;
    ISO BMFF or AVI container)."""
    from .jpeg import decode_jpeg

    samples = video_samples(content)
    off, size = samples[index]
    if off + size > len(content):
        raise ValueError("sample extends past end of file")
    return decode_jpeg(content[off : off + size])


KEYFRAME_SCHEMA = (
    "media_id long, frame_idx int, n_frames int, width int, height int, "
    "dhash long, decode_error string"
)


def video_keyframes(
    df: DataFrame,
    id_col: str = "media_id",
    content_col: str = "content",
    stride: int = 1,
) -> DataFrame:
    """One row per sampled frame (indices 0, stride, 2*stride, ...):
    dims + the perceptual dHash of the DECODED pixels — feed the hashes
    into image_dedup.banded_hamming_pairs for video near-dup detection.
    Undecodable/foreign-codec payloads yield a single row with
    `decode_error` set (corrupt-tolerance policy)."""
    import pandas as pd

    from .image_dedup import dhash_bits
    from .jpeg import decode_jpeg

    def batches(it):
        for pdf in it:
            rows = []
            for mid, content in zip(pdf[id_col], pdf[content_col]):
                b = bytes(content)
                clip_rows: list = []
                try:
                    samples = video_samples(b)
                    n = len(samples)
                    for idx in range(0, n, max(1, stride)):
                        off, size = samples[idx]
                        if off + size > len(b):
                            raise ValueError("sample extends past EOF")
                        arr = decode_jpeg(b[off : off + size])
                        h = dhash_bits(arr)
                        if h >= 1 << 63:
                            h -= 1 << 64
                        clip_rows.append(
                            {
                                "media_id": mid,
                                "frame_idx": idx,
                                "n_frames": n,
                                "width": arr.shape[1],
                                "height": arr.shape[0],
                                "dhash": h,
                                "decode_error": None,
                            }
                        )
                    rows.extend(clip_rows)
                except (ValueError, NotImplementedError) as exc:
                    # ALL-OR-ERROR per clip: keeping a truncated frame
                    # subset would shrink the clip's n_sampled
                    # denominator and let video_neardup_pairs cross its
                    # fraction threshold on truncation, not similarity
                    rows.append(
                        {
                            "media_id": mid,
                            "frame_idx": None,
                            "n_frames": None,
                            "width": None,
                            "height": None,
                            "dhash": None,
                            "decode_error": str(exc),
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "frame_idx", "n_frames", "width", "height",
                    "dhash", "decode_error",
                ],
            )

    return df.mapInPandas(batches, schema=KEYFRAME_SCHEMA)


def video_neardup_pairs(
    keyframes: DataFrame,
    min_frame_fraction: float = 0.5,
    max_distance: int = 10,
) -> DataFrame:
    """(id_a, id_b, matched_frames, frac_a, frac_b): clip-level near-dup
    pairs from `video_keyframes` output — two clips pair when at least
    `min_frame_fraction` of the SMALLER clip's sampled frames have a
    perceptual-hash match in the other (re-encodes, resolution ladders,
    trailing-credit trims).

    Shape: one banded-Hamming join over ALL frames of all clips
    (image_dedup.banded_hamming_pairs — O(frames x bands), never
    all-pairs), then a per-clip-pair aggregate. A frame matching several
    frames of the other clip counts once (distinct on the frame id).

    CONTENT-FREE frames — all-zero/all-one dHashes, i.e. black/flat
    frames, endemic in web video — are excluded from BOTH the pairing
    and the per-clip denominators: two clips sharing fade-to-black
    frames is no evidence of duplication (and a hot all-black bucket is
    the classic O(n²) candidate blowup at corpus scale; the shared
    banded join diverts degenerate hashes to a star for
    connected-components consumers, which would undercount the
    per-pair tallies here). A clip whose sampled frames are ALL
    content-free drops out entirely — it has no matchable signal."""
    from pyspark.sql import functions as F

    from .image_dedup import banded_hamming_pairs

    frames = keyframes.filter(F.col("dhash").isNotNull()).filter(
        ~F.col("dhash").isin(0, -1)
    ).select(
        F.col("media_id"),
        F.col("frame_idx"),
        F.col("dhash"),
        F.concat_ws("#", "media_id", "frame_idx").alias("fid"),
    ).localCheckpoint(eager=False)
    per_clip = frames.groupBy("media_id").agg(
        F.count("*").alias("n_sampled")
    )
    fp = banded_hamming_pairs(
        frames.select(F.col("fid").alias("media_id"), "dhash"),
        "media_id",
        "dhash",
        max_distance,
    ).select(
        F.split(F.col("id_a"), "#")[0].cast("long").alias("va"),
        F.col("id_a").alias("fa"),
        F.split(F.col("id_b"), "#")[0].cast("long").alias("vb"),
        F.col("id_b").alias("fb"),
    ).filter(F.col("va") != F.col("vb"))
    # orient pairs (lower id first) and count DISTINCT matched frames
    # on each side
    oriented = fp.select(
        F.least("va", "vb").alias("id_a"),
        F.greatest("va", "vb").alias("id_b"),
        F.when(F.col("va") < F.col("vb"), F.col("fa")).otherwise(F.col("fb")).alias("fa"),
        F.when(F.col("va") < F.col("vb"), F.col("fb")).otherwise(F.col("fa")).alias("fb"),
    )
    counts = oriented.groupBy("id_a", "id_b").agg(
        F.count_distinct("fa").alias("m_a"),
        F.count_distinct("fb").alias("m_b"),
    )
    na = per_clip.select(F.col("media_id").alias("id_a"), F.col("n_sampled").alias("n_a"))
    nb = per_clip.select(F.col("media_id").alias("id_b"), F.col("n_sampled").alias("n_b"))
    return (
        counts.join(na, "id_a")
        .join(nb, "id_b")
        .withColumn(
            "matched_frames", F.least("m_a", "m_b")
        )
        .withColumn("frac_a", F.col("m_a") / F.col("n_a"))
        .withColumn("frac_b", F.col("m_b") / F.col("n_b"))
        .filter(
            F.greatest("frac_a", "frac_b") >= F.lit(float(min_frame_fraction))
        )
        .select("id_a", "id_b", "matched_frames", "frac_a", "frac_b")
    )


VIDEO_PROBE_SCHEMA = (
    "media_id long, timescale long, duration_units long, duration_s double, "
    "n_tracks int, handlers array<string>, probe_error string"
)


def video_probe(df: DataFrame, id_col: str = "media_id",
                content_col: str = "content") -> DataFrame:
    """Arrow-batched container probe; malformed payloads produce a
    `probe_error` row instead of failing the job."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, content in zip(pdf[id_col], pdf[content_col]):
                base = {
                    "media_id": mid,
                    "timescale": None,
                    "duration_units": None,
                    "duration_s": None,
                    "n_tracks": None,
                    "handlers": None,
                    "probe_error": None,
                }
                try:
                    base.update(probe_mp4(bytes(content)))
                except ValueError as exc:
                    base["probe_error"] = str(exc)
                rows.append(base)
            yield pd.DataFrame(rows)

    return df.mapInPandas(batches, schema=VIDEO_PROBE_SCHEMA)
