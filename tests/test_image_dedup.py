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
