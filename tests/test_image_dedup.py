"""Perceptual image dedup (operators/image_dedup.py): dHash stability
across containers, noise tolerance, banded-candidate recall, corrupt
tolerance, through-Spark pair generation."""

from __future__ import annotations

import numpy as np
import pytest

from opentelemetry_iceberg_exporter_spark.operators.image_dedup import (
    BANDS,
    dhash_bits,
    image_neardup_pairs,
    image_signatures,
)

from test_image_decode import make_bmp, make_png, make_ppm
from test_gif_decode import make_gif


def _photo(seed=0, w=64, h=48):
    """Smooth 'photo-like' content: gradients + low-frequency blobs (a
    random-noise image has no stable structure for a perceptual hash —
    and neither do real corpus duplicates)."""
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.zeros((h, w, 3))
    for c in range(3):
        img[:, :, c] = (
            128
            + 80 * np.sin(xx / (8.0 + c) + rng.uniform(0, 6))
            + 40 * np.cos(yy / (6.0 + c) + rng.uniform(0, 6))
        )
    return np.clip(img, 0, 255).astype(np.uint8)


def _hamming(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


class TestDhash:
    def test_identical_pixels_any_container(self):
        img = _photo(1)
        hs = {
            dhash_bits(img),
        }
        from opentelemetry_iceberg_exporter_spark.operators.multimodal import (
            decode_image,
        )

        for payload in (make_ppm(img), make_bmp(img), make_png(img)):
            hs.add(dhash_bits(decode_image(payload)))
        assert len(hs) == 1  # container changes every byte; hash unmoved

    def test_mild_noise_small_distance(self):
        img = _photo(2)
        rng = np.random.RandomState(9)
        noised = np.clip(
            img.astype(np.int16) + rng.randint(-6, 7, img.shape), 0, 255
        ).astype(np.uint8)
        assert _hamming(dhash_bits(img), dhash_bits(noised)) <= 6

    def test_different_images_far_apart(self):
        d = _hamming(dhash_bits(_photo(3)), dhash_bits(_photo(4)))
        assert d > 16


class TestSignatures:
    def test_signatures_and_corrupt_null(self, spark):
        img = _photo(5)
        blobs = [
            (1, make_ppm(img)),
            (2, make_png(img)),
            (3, b"\x89PNG\r\n\x1a\nbroken"),
        ]
        df = spark.createDataFrame(blobs, "media_id long, content binary")
        rows = {r["media_id"]: r["dhash"] for r in image_signatures(df).collect()}
        assert rows[1] == rows[2] and rows[1] is not None
        assert rows[3] is None


    def test_string_ids_supported(self, spark):
        """The signature schema follows the input id dtype — a string
        id column must not crash the Arrow batch."""
        img = _photo(9)
        df = spark.createDataFrame(
            [("uri://a", make_ppm(img))], "media_id string, content binary"
        )
        rows = image_signatures(df).collect()
        assert rows[0]["media_id"] == "uri://a"
        assert rows[0]["dhash"] is not None


class TestPairs:
    def test_reencoded_and_noised_pair_up(self, spark):
        img_a, img_b = _photo(6), _photo(7)
        rng = np.random.RandomState(3)
        noised = np.clip(
            img_a.astype(np.int16) + rng.randint(-5, 6, img_a.shape), 0, 255
        ).astype(np.uint8)
        blobs = [
            (1, make_ppm(img_a)),
            (2, make_png(img_a)),   # exact re-encode of 1
            (3, make_bmp(noised)),  # near-dup of 1
            (4, make_png(img_b)),   # different image
            (5, b"not an image"),   # corrupt -> excluded
        ]
        df = spark.createDataFrame(blobs, "media_id long, content binary")
        sigs = image_signatures(df)
        pairs = {
            (r["id_a"], r["id_b"]): r["hamming"]
            for r in image_neardup_pairs(sigs).collect()
        }
        assert pairs[(1, 2)] == 0
        assert (1, 3) in pairs and pairs[(1, 3)] <= 10
        assert not any(4 in p for p in pairs)
        assert not any(5 in p for p in pairs)

    def test_band_recall_guarantee(self, spark):
        """Any pair within Hamming < BANDS must be found (pigeonhole:
        one of the byte-bands is intact). Flip exactly BANDS-1 bits in
        distinct bytes — the adversarial worst case."""
        base = dhash_bits(_photo(8))
        damaged = base
        for i in range(BANDS - 1):
            damaged ^= 1 << (8 * i)  # one flipped bit in bands 0..6
        to_signed = lambda h: h - (1 << 64) if h >= 1 << 63 else h
        sigs = spark.createDataFrame(
            [(1, to_signed(base)), (2, to_signed(damaged))],
            "media_id long, dhash long",
        )
        rows = image_neardup_pairs(sigs).collect()
        assert len(rows) == 1 and rows[0]["hamming"] == BANDS - 1

    def test_cli_groups(self, spark, tmp_path, capsys):
        import duckdb
        import json

        from opentelemetry_iceberg_exporter_spark.__main__ import main

        img = _photo(11)
        other = _photo(12)
        inp = str(tmp_path / "media")
        spark.createDataFrame(
            [(1, make_ppm(img)), (2, make_png(img)), (3, make_bmp(other))],
            "media_id long, content binary",
        ).write.parquet(inp)
        out = str(tmp_path / "groups")
        rc = main(["image-dedup", "--input", inp, "--output", out])
        assert rc == 0
        assert json.loads(capsys.readouterr().out.strip().splitlines()[-1])["rows"] == 3
        rows = duckdb.sql(
            f"SELECT media_id, group_id, is_canonical FROM '{out}/*.parquet' ORDER BY media_id"
        ).fetchall()
        assert rows == [(1, 1, True), (2, 1, False), (3, 3, True)]

    def test_degenerate_cohort_star_pairs(self, spark):
        """Flat/black images and silent audio all hash to the same
        all-zero (or all-one) word — every band collides, so the band
        join would be O(n^2) on the cohort. The guard diverts them to an
        exact star: n-1 pairs at hamming 0, rooted at the min id, which
        connects the cohort in dedup_groups exactly like the clique."""
        from opentelemetry_iceberg_exporter_spark.operators.image_dedup import (
            banded_hamming_pairs,
        )

        n_black, n_white = 200, 100
        rows = [(i, 0) for i in range(n_black)] + [
            (1000 + i, -1) for i in range(n_white)
        ]
        sigs = spark.createDataFrame(rows, "media_id long, dhash long")
        pairs = banded_hamming_pairs(sigs, "media_id", "dhash", 10).collect()
        assert len(pairs) == (n_black - 1) + (n_white - 1)  # stars, not cliques
        assert all(r["hamming"] == 0 for r in pairs)
        black = [r for r in pairs if r["id_b"] < 1000]
        white = [r for r in pairs if r["id_b"] >= 1000]
        assert all(r["id_a"] == 0 for r in black) and len(black) == n_black - 1
        assert all(r["id_a"] == 1000 for r in white) and len(white) == n_white - 1

    def test_black_frames_end_to_end(self, spark):
        """Decoded all-black images produce hash 0 and flow through the
        degenerate path, not the band join."""
        black = np.zeros((16, 16, 3), dtype=np.uint8)
        df = spark.createDataFrame(
            [(i, make_ppm(black)) for i in range(20)], "media_id long, content binary"
        )
        pairs = image_neardup_pairs(image_signatures(df)).collect()
        assert len(pairs) == 19
        assert all(r["id_a"] == 0 and r["hamming"] == 0 for r in pairs)

    def test_band_df_cap_drops_hot_band_only(self, spark):
        """Items whose ONLY shared band is hotter than the cap lose
        their pair (the documented d04-style recall sacrifice); pairs
        sharing a cold band are unaffected."""
        from opentelemetry_iceberg_exporter_spark.operators.image_dedup import (
            banded_hamming_pairs,
        )

        def h(b0, rest):
            out = b0
            for i in range(1, 8):
                out |= rest << (8 * i)
            return out

        # 12 items share band0=0x55; bytes 1..7 pairwise distinct except
        # items 0 and 1, which sit at hamming 7 sharing ONLY the hot band
        hot = [(i, h(0x55, [1, 3, 4, 8, 16, 32, 64, 65, 66, 67, 68, 69][i]))
               for i in range(12)]
        # a cold pair sharing band7 at small distance
        cold = [(100, (0x2A << 56) | 0xFF), (101, (0x2A << 56) | 0x0F)]
        sigs = spark.createDataFrame(hot + cold, "media_id long, dhash long")

        capped = {
            (r["id_a"], r["id_b"])
            for r in banded_hamming_pairs(
                sigs, "media_id", "dhash", 10, band_df_cap=10
            ).collect()
        }
        assert capped == {(100, 101)}  # hot-band-only pairs gone, cold intact

        uncapped = {
            (r["id_a"], r["id_b"])
            for r in banded_hamming_pairs(
                sigs, "media_id", "dhash", 10, band_df_cap=None
            ).collect()
        }
        assert (0, 1) in uncapped and (100, 101) in uncapped

    def test_no_cartesian_in_plan(self, spark):
        sigs = spark.createDataFrame(
            [(1, 7), (2, 7)], "media_id long, dhash long"
        )
        plan = (
            image_neardup_pairs(sigs)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
