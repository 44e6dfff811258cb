"""Image near-duplicate detection: perceptual difference-hash (dHash)
signatures over DECODED pixels + banded candidate joins — the
multimodal member of the dedup family.

Why dHash: re-encoding an image (PNG -> BMP -> JPEG q90) changes every
byte of the payload, so content hashing can't dedup images; a
perceptual hash over the decoded, downscaled luminance is stable across
containers and mild noise/recompression while separating genuinely
different images. dHash (difference hash) is the standard cheap choice:
resize to (HASH_SIZE+1) x HASH_SIZE luminance with the repo's real
nearest-neighbor kernel, then one bit per horizontal neighbor pair —
64 bits at the default 8.

Distributed shape (the dedup.py doctrine applied to images):

* signatures: ONE Arrow-batched mapInPandas pass over the binary
  column — decode (all five native codecs), luminance, resize, 64-bit
  hash; corrupt payloads yield NULL signatures instead of failing the
  batch (same tolerance policy as extract_media_features);
* candidates: the 64-bit hash splits into BANDS byte-bands; images
  sharing ANY band become a candidate pair via an equi-join on
  (band_idx, band_value) — by the pigeonhole principle every pair
  within Hamming distance < BANDS shares at least one intact band, so
  the join has guaranteed recall for distance <= BANDS-1 while staying
  O(images x BANDS), never all-pairs — the exact SimHash banding
  argument from operators/dedup.py, applied to pixels;
* verification: exact Hamming distance on candidates (bit_count of the
  XOR, pure Catalyst), thresholded.

No reference counterpart (LLM-pipeline extension surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HASH_SIZE = 8  # 8x8 differences -> 64-bit signature
BANDS = 8  # one band per signature byte -> recall guaranteed to dist 7
DEFAULT_MAX_DISTANCE = 10


def dhash_bits(pixels) -> int:
    """64-bit dHash of an (H, W, 3) uint8 array: grayscale -> resize to
    (HASH_SIZE+1, HASH_SIZE) -> horizontal-difference bits, row-major,
    MSB first."""
    import numpy as np

    from .multimodal import resize_pixels

    gray = pixels.astype(np.float64).mean(axis=2)
    small = resize_pixels(
        gray[:, :, None].astype(np.uint8).repeat(3, axis=2),
        HASH_SIZE + 1,
        HASH_SIZE,
    ).astype(np.float64).mean(axis=2)
    bits = small[:, 1:] > small[:, :-1]
    out = 0
    for b in bits.reshape(-1):
        out = (out << 1) | int(b)
    return out


def image_signatures(
    df: DataFrame, id_col: str = "media_id", content_col: str = "content"
) -> DataFrame:
    """(id, dhash long|NULL): one mapInPandas decode+hash pass; corrupt
    or unsupported payloads produce NULL (never a failed batch)."""
    import pandas as pd

    from .multimodal import decode_image

    def batches(it):
        for pdf in it:
            out = []
            for mid, content in zip(pdf[id_col], pdf[content_col]):
                try:
                    h = dhash_bits(decode_image(bytes(content)))
                    # store as signed int64 (Iceberg/Spark long)
                    if h >= 1 << 63:
                        h -= 1 << 64
                except (ValueError, NotImplementedError):
                    h = None
                out.append({id_col: mid, "dhash": h})
            yield pd.DataFrame(out, columns=[id_col, "dhash"])

    id_type = dict(df.dtypes)[id_col]
    return df.mapInPandas(batches, schema=f"{id_col} {id_type}, dhash long")


def _band_rows(sigs: DataFrame, id_col: str, hash_col: str) -> DataFrame:
    """One row per (item, byte-band): band_value = byte i of the hash."""
    bands = F.array(
        *[
            F.expr(f"(cast({hash_col} as bigint) >> {8 * i}) & 255").cast("int")
            for i in range(BANDS)
        ]
    )
    return sigs.filter(F.col(hash_col).isNotNull()).select(
        F.col(id_col), F.posexplode(bands).alias("band_idx", "band_value")
    )


def banded_hamming_pairs(
    sigs: DataFrame,
    id_col: str,
    hash_col: str,
    max_distance: int,
) -> DataFrame:
    """Generic 64-bit perceptual-hash near-dup join, shared by the image
    (dHash) and audio (spectrogram hash) operators: candidate pairs from
    a byte-band equi-join, verified with the exact Hamming distance
    (bit_count of the XOR — whole-stage codegen), thresholded at
    `max_distance`. Guaranteed recall for distance <= BANDS-1 (= 7):
    by pigeonhole, any such pair shares at least one intact byte; pairs
    at distance 8..max_distance are found only when the damage spares a
    byte (lower the threshold for a hard guarantee)."""
    sigs = sigs.localCheckpoint(eager=False)
    rows = _band_rows(sigs, id_col, hash_col)
    a, b = rows.alias("a"), rows.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_value") == F.col("b.band_value"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )
    ha = sigs.select(F.col(id_col).alias("id_a"), F.col(hash_col).alias("__ha"))
    hb = sigs.select(F.col(id_col).alias("id_b"), F.col(hash_col).alias("__hb"))
    return (
        cands.join(ha, "id_a")
        .join(hb, "id_b")
        .withColumn("hamming", F.expr("bit_count(__ha ^ __hb)"))
        .filter(F.col("hamming") <= max_distance)
        .select("id_a", "id_b", "hamming")
    )


def image_neardup_pairs(
    sigs: DataFrame,
    id_col: str = "media_id",
    max_distance: int = DEFAULT_MAX_DISTANCE,
) -> DataFrame:
    """(id_a, id_b, hamming) over dHash signatures — see
    banded_hamming_pairs for the join/recall contract."""
    return banded_hamming_pairs(sigs, id_col, "dhash", max_distance)
