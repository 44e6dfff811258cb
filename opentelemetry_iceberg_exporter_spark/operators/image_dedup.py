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
# band-frequency skew cap, the perceptual-hash analog of d04's
# stop-shingle DEFAULT_DF_CAP: a (band_idx, band_value) bucket shared by
# n items generates O(n^2) candidate pairs, so one hot bucket is a
# scale-killer at web-corpus volumes. Buckets above the cap are dropped
# from candidate generation (recall for pairs whose ONLY shared bands
# are hot is sacrificed, same contract as d04).
DEFAULT_BAND_DF_CAP: int | None = 1000


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
    band_df_cap: int | None = DEFAULT_BAND_DF_CAP,
) -> DataFrame:
    """Generic 64-bit perceptual-hash near-dup join, shared by the image
    (dHash), audio (spectrogram hash), and video (keyframe dHash)
    operators: candidate pairs from a byte-band equi-join, verified with
    the exact Hamming distance (bit_count of the XOR — whole-stage
    codegen), thresholded at `max_distance`. Guaranteed recall for
    distance <= BANDS-1 (= 7) among non-degenerate, non-hot-band items:
    by pigeonhole, any such pair shares at least one intact byte; pairs
    at distance 8..max_distance are found only when the damage spares a
    byte (lower the threshold for a hard guarantee).

    Skew guards (both mandatory at web-corpus scale, where black frames
    and silence are endemic):

    * DEGENERATE hashes — all-zero / all-one words, what flat/black
      images and silent audio hash to — share every band, so one such
      cohort is a guaranteed hot bucket. They are diverted to an exact
      path: per degenerate hash value, a star of (min-id, other-id)
      pairs at hamming 0 — O(n) pairs that connect the cohort in the
      downstream connected-components resolver exactly as the O(n^2)
      clique would. Near-pairs BETWEEN a degenerate and an
      almost-degenerate item are sacrificed (they were precisely the
      quadratic candidates).
    * BAND-FREQUENCY CAP — (band_idx, band_value) buckets with more
      than `band_df_cap` items are dropped before any per-band id list
      materializes (a count-only aggregation finds the hot keys), the
      d04 stop-shingle contract applied to hash bands. None disables.
    """
    sigs = sigs.filter(F.col(hash_col).isNotNull()).localCheckpoint(eager=False)
    degenerate = F.col(hash_col).isin(0, -1)

    # exact path for degenerate cohorts: per-hash representative = min
    # id (map-side-partial hash agg over at most 2 groups), star pairs
    reps = (
        sigs.filter(degenerate)
        .groupBy(hash_col)
        .agg(F.min(id_col).alias("__rep"))
    )
    exact = (
        sigs.filter(degenerate)
        .join(F.broadcast(reps), hash_col)
        .filter(F.col(id_col) != F.col("__rep"))
        .select(
            F.col("__rep").alias("id_a"),
            F.col(id_col).alias("id_b"),
            F.lit(0).alias("hamming"),
        )
    )

    rows = _band_rows(sigs.filter(~degenerate), id_col, hash_col)
    if band_df_cap is not None:
        # count-only pre-aggregation: hot buckets never build an id list
        keep = (
            rows.groupBy("band_idx", "band_value")
            .agg(F.count(F.lit(1)).alias("__df"))
            .filter(F.col("__df") <= band_df_cap)
            .drop("__df")
        )
        rows = rows.join(keep, ["band_idx", "band_value"])
    # per-bucket sorted id lists (≤ cap) -> all (i < j) pairs inside
    # whole-stage codegen — no self-join, no row-level shuffle resort
    pair_expr = F.expr(
        "flatten(transform(ids, (x, i) -> "
        "transform(slice(ids, i + 2, size(ids) - i - 1), "
        "y -> struct(x AS id_a, y AS id_b))))"
    )
    cands = (
        rows.groupBy("band_idx", "band_value")
        .agg(F.sort_array(F.collect_set(id_col)).alias("ids"))
        .filter(F.size("ids") >= 2)
        .select(F.explode(pair_expr).alias("p"))
        .select(F.col("p.id_a").alias("id_a"), F.col("p.id_b").alias("id_b"))
        .distinct()
    )
    ha = sigs.select(F.col(id_col).alias("id_a"), F.col(hash_col).alias("__ha"))
    hb = sigs.select(F.col(id_col).alias("id_b"), F.col(hash_col).alias("__hb"))
    banded = (
        cands.join(ha, "id_a")
        .join(hb, "id_b")
        .withColumn("hamming", F.expr("bit_count(__ha ^ __hb)"))
        .filter(F.col("hamming") <= max_distance)
        .select("id_a", "id_b", "hamming")
    )
    return banded.unionByName(exact)


def image_neardup_pairs(
    sigs: DataFrame,
    id_col: str = "media_id",
    max_distance: int = DEFAULT_MAX_DISTANCE,
) -> DataFrame:
    """(id_a, id_b, hamming) over dHash signatures — see
    banded_hamming_pairs for the join/recall contract."""
    return banded_hamming_pairs(sigs, id_col, "dhash", max_distance)
