"""Video container probing: native ISO BMFF (MP4/MOV) box walking.

Frame DECODE needs codec libraries the container lacks (same policy as
WebP), but the ISO base-media container itself is plain length-tagged
boxes — so duration, timescale, and track layout parse natively, which
is what corpus curation actually filters on (clip length, track
presence) before any expensive decode.

`probe_mp4` walks the top-level box list to `moov`, reads `mvhd`
(movie timescale + duration, version 0 and 1) and counts `trak`
boxes with their `hdlr` handler types (vide/soun/...). One
mapInPandas pass (`video_probe`) surfaces it per row."""

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
