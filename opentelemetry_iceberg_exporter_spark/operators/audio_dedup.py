"""Audio near-duplicate detection: a 64-bit spectrogram perceptual hash
over DECODED PCM + the shared banded Hamming join — the audio member of
the perceptual-dedup family (image sibling: operators/image_dedup.py).

Hash construction (robust-audio-hash lineage, Haitsma & Kalker 2002,
simplified to a fixed-size signature suitable for corpus-scale banded
joins):

  1. decode (native WAV/PCM), mono, resample to FP_RATE by index
     decimation (rate-invariant);
  2. magnitude spectrogram: FRAME-sample Hann-windowed rfft frames with
     FRAME/2 hop, keeping the 100 Hz..3 kHz perceptual band;
  3. POOL energy into GRID+1 log-spaced frequency bands (the
     Haitsma-Kalker band layout) x GRID contiguous time slices —
     pooling, not sampling: a narrow spectral line must land in some
     band's SUM, where nearest-neighbor decimation of the spectrogram
     would usually miss it entirely;
  4. FLOORED-LOG DIFFERENCE bits with a DEADBAND: cells become
     log(E + floor) with the floor at the MEAN cell energy
     (scale-invariant), and each bit fires only when the next band
     carries >~12% more floored energy than its neighbor
     (GRID x GRID = 64 bits). Floor + deadband are the robustness
     trick: bands whose energies are both small against the corpus-
     relative floor compress to near-equal values inside the deadband,
     so their comparison is a stable 0 — quantization/broadband noise
     cannot flip those bits (a raw median threshold makes silent-cell
     bits pure noise) — while real spectral structure clears the
     deadband by orders of magnitude. Amplitude scaling cancels
     exactly (energies and floor scale together).

Candidates/verification reuse image_dedup.banded_hamming_pairs (byte
bands, pigeonhole recall to Hamming 7, bit_count verification in
codegen). Corrupt payloads hash to NULL, never failing the batch.

No reference counterpart (LLM-pipeline extension surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from .image_dedup import banded_hamming_pairs

FP_RATE = 8000
FRAME = 1024
GRID = 8  # 8x8 cells -> 64-bit hash
FMIN, FMAX = 100.0, 3000.0
DEFAULT_MAX_DISTANCE = 8


def spectro_hash_bits(samples, rate: int) -> int:
    """64-bit spectrogram hash of a mono float array (see module doc)."""
    import numpy as np

    if rate != FP_RATE:
        idx = np.minimum(
            (np.arange(int(len(samples) * FP_RATE / rate)) * rate) // FP_RATE,
            len(samples) - 1,
        ).astype(np.int64)
        samples = samples[idx]
    hop = FRAME // 2
    n_frames = max(1, (len(samples) - FRAME) // hop + 1)
    if len(samples) < FRAME:
        samples = np.pad(samples, (0, FRAME - len(samples)))
    window = np.hanning(FRAME)
    frames = np.stack(
        [samples[i * hop : i * hop + FRAME] * window for i in range(n_frames)]
    )
    mag = np.abs(np.fft.rfft(frames, axis=1))
    freqs = np.fft.rfftfreq(FRAME, d=1.0 / FP_RATE)
    keep = (freqs >= FMIN) & (freqs <= FMAX)
    spec = mag[:, keep]  # (time, freq_bins)
    kept_freqs = freqs[keep]
    # pool into GRID+1 log-spaced frequency bands x GRID time slices
    n_bands = GRID + 1
    edges = np.logspace(np.log10(FMIN), np.log10(FMAX), n_bands + 1)
    band_of = np.clip(np.digitize(kept_freqs, edges) - 1, 0, n_bands - 1)
    band_energy = np.zeros((spec.shape[0], n_bands))
    for b in range(n_bands):
        cols = band_of == b
        if cols.any():
            band_energy[:, b] = spec[:, cols].sum(axis=1)
    slice_of = np.minimum(
        (np.arange(spec.shape[0]) * GRID) // spec.shape[0], GRID - 1
    )
    cells = np.zeros((GRID, n_bands))
    for t in range(GRID):
        rows = slice_of == t
        if rows.any():
            cells[t] = band_energy[rows].sum(axis=0)
    floor = max(float(cells.mean()), 1e-12)
    logc = np.log10(cells + floor)
    # deadband: a bit fires only when the next band carries >~12% more
    # floored energy — near-equal (noise-dominated) bands give a stable 0
    bits = logc[:, 1:] > logc[:, :-1] + 0.05
    out = 0
    for b in bits.reshape(-1):
        out = (out << 1) | int(b)
    return out


def wav_hash(content: bytes) -> int:
    """64-bit hash straight from WAV bytes."""
    import numpy as np

    from .audio import decode_wav

    samples, rate = decode_wav(content)
    mono = samples[:, 0].astype(np.float64) / 32768.0
    return spectro_hash_bits(mono, rate)


def audio_signatures(
    df: DataFrame, id_col: str = "media_id", content_col: str = "content"
) -> DataFrame:
    """(id, ahash long|NULL): one mapInPandas decode+hash pass; corrupt
    or unsupported payloads produce NULL (never a failed batch)."""
    import pandas as pd

    def batches(it):
        for pdf in it:
            out = []
            for mid, content in zip(pdf[id_col], pdf[content_col]):
                try:
                    h = wav_hash(bytes(content))
                    if h >= 1 << 63:
                        h -= 1 << 64
                except (ValueError, NotImplementedError):
                    h = None
                out.append({id_col: mid, "ahash": h})
            yield pd.DataFrame(out, columns=[id_col, "ahash"])

    id_type = dict(df.dtypes)[id_col]
    return df.mapInPandas(batches, schema=f"{id_col} {id_type}, ahash long")


def audio_neardup_pairs(
    sigs: DataFrame,
    id_col: str = "media_id",
    max_distance: int = DEFAULT_MAX_DISTANCE,
) -> DataFrame:
    """(id_a, id_b, hamming) over spectrogram hashes — see
    image_dedup.banded_hamming_pairs for the join/recall contract."""
    return banded_hamming_pairs(sigs, id_col, "ahash", max_distance)
