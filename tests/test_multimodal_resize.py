"""Real-pixel resize kernel contracts (m03 upgrade).

The codec step stays environment-stubbed (no image library in the
container), but the resize itself is now a real vectorized
nearest-neighbor kernel over RGB arrays — these tests pin its sampling
math (golden cases), provenance (every output pixel is an input pixel),
and the Arrow-batched operator shape end to end.
"""

from __future__ import annotations

import numpy as np
import pytest

from opentelemetry_iceberg_exporter_spark.operators.multimodal import (
    RESIZE_TARGET,
    fake_pixels,
    resize_media,
    resize_pixels,
)


class TestResizeKernel:
    def test_identity(self):
        arr = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
        assert np.array_equal(resize_pixels(arr, 3, 2), arr)

    def test_golden_downscale_2x2_to_1x1(self):
        """Pixel-center sampling: the single output sample lands at
        (0.5*2/1, 0.5*2/1) -> clamped index (1, 1): the bottom-right."""
        arr = np.array(
            [[[1, 1, 1], [2, 2, 2]], [[3, 3, 3], [4, 4, 4]]], dtype=np.uint8
        )
        out = resize_pixels(arr, 1, 1)
        assert out.shape == (1, 1, 3)
        assert out[0, 0, 0] == 4

    def test_golden_downscale_4_to_2(self):
        """4 columns -> 2: samples at x=1 and x=3 (centers 0.5, 1.5
        scaled by 4/2 = indices 1, 3)."""
        row = np.array([[[10] * 3, [20] * 3, [30] * 3, [40] * 3]], dtype=np.uint8)
        out = resize_pixels(row, 2, 1)
        assert out[0, :, 0].tolist() == [20, 40]

    def test_upscale_repeats_pixels(self):
        arr = np.array([[[7, 8, 9]]], dtype=np.uint8)
        out = resize_pixels(arr, 3, 2)
        assert out.shape == (2, 3, 3)
        assert (out == [7, 8, 9]).all()

    @pytest.mark.parametrize("w,h,ow,oh", [(13, 7, 5, 3), (1, 1, 4, 4), (64, 48, 64, 48)])
    def test_provenance_and_shape(self, w, h, ow, oh):
        """Every output pixel must be an actual input pixel (nearest
        neighbor never invents values)."""
        arr = fake_pixels(b"provenance-corpus", w, h)
        out = resize_pixels(arr, ow, oh)
        assert out.shape == (oh, ow, 3)
        in_set = {bytes(p) for p in arr.reshape(-1, 3)}
        assert all(bytes(p) in in_set for p in out.reshape(-1, 3))

    def test_fake_pixels_deterministic(self):
        a = fake_pixels(b"same-bytes", 10, 4)
        b = fake_pixels(b"same-bytes", 10, 4)
        assert np.array_equal(a, b)
        assert a.dtype == np.uint8 and a.shape == (4, 10, 3)


class TestResizeOperator:
    def test_mapinpandas_end_to_end(self, spark):
        rows = [
            (1, "image", b"x" * 500, None),
            (2, "image", b"y" * 20000, None),
            (3, "image", b"", None),
        ]
        df = spark.createDataFrame(
            rows, "media_id long, media_type string, content binary, metadata map<string,string>"
        )
        got = {r.media_id: r for r in resize_media(df).collect()}
        assert set(got) == {1, 2, 3}
        for r in got.values():
            assert max(r.out_width, r.out_height) <= RESIZE_TARGET
            assert r.out_bytes == r.out_width * r.out_height * 3
            assert len(r.pixels_md5) == 32
        # checksum equals a driver-side rerun of the same kernel (the
        # executor batch path computes real pixels, not a placeholder)
        import hashlib
        import math

        b = b"x" * 500
        w, h = (500 % 640) + 1, (500 % 480) + 1
        scale = min(1.0, RESIZE_TARGET / w, RESIZE_TARGET / h)
        ow, oh = max(1, math.floor(w * scale)), max(1, math.floor(h * scale))
        expect = hashlib.md5(
            resize_pixels(fake_pixels(b, w, h), ow, oh).tobytes()
        ).hexdigest()
        assert got[1].pixels_md5 == expect
