"""Tests for the native C++ host-preprocessing library
(native/preprocess.cpp): bit-exactness against PIL's LANCZOS resampler and
against the pure-PIL overlap-crop pipeline, plus fallback behavior."""

import numpy as np
import pytest
from PIL import Image

from moondream_tpu.ops import native
from moondream_tpu.ops.image_crops import overlap_crop_image, select_tiling

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable"
)


@pytest.mark.parametrize(
    "in_shape,out_shape",
    [
        ((1080, 1440), (882, 1162)),   # bench-image grid resize
        ((1080, 1440), (378, 378)),    # global crop
        ((100, 80), (378, 378)),       # upscale
        ((378, 378), (378, 378)),      # identity size
        ((2000, 3000), (378, 378)),    # big downscale
        ((51, 37), (200, 300)),        # odd sizes
    ],
)
def test_resize_bit_exact_vs_pil(in_shape, out_shape):
    rng = np.random.default_rng(hash(in_shape + out_shape) % 2**32)
    img = rng.integers(0, 256, (*in_shape, 3), dtype=np.uint8)
    ours = native.resize_lanczos(img, *out_shape)
    ref = np.asarray(
        Image.fromarray(img).resize(
            (out_shape[1], out_shape[0]), Image.Resampling.LANCZOS
        )
    )
    np.testing.assert_array_equal(ours, ref)


def test_resize_single_channel():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (200, 300, 1), dtype=np.uint8)
    ours = native.resize_lanczos(img, 120, 90)
    ref = np.asarray(
        Image.fromarray(img[:, :, 0]).resize((90, 120), Image.Resampling.LANCZOS)
    )
    np.testing.assert_array_equal(ours[:, :, 0], ref)


@pytest.mark.parametrize("shape", [(800, 600), (1080, 1440), (300, 200), (2000, 1000)])
def test_overlap_crops_matches_pil_pipeline(shape, monkeypatch):
    rng = np.random.default_rng(shape[0])
    img = rng.integers(0, 256, (*shape, 3), dtype=np.uint8)

    a = overlap_crop_image(img, overlap_margin=4, max_crops=12)

    monkeypatch.setenv("MOONDREAM_NO_NATIVE", "1")
    b = overlap_crop_image(img, overlap_margin=4, max_crops=12)

    assert a["tiling"] == b["tiling"]
    np.testing.assert_array_equal(a["crops"], b["crops"])


def test_invalid_args_return_none():
    # md_resize_lanczos rejects bad dims; wrapper surfaces None
    lib = native.load()
    assert lib.md_resize_lanczos(None, 0, 0, 0, None, 0, 0, 0) == 1


def test_env_disable(monkeypatch):
    monkeypatch.setenv("MOONDREAM_NO_NATIVE", "1")
    assert native.resize_lanczos(np.zeros((4, 4, 3), np.uint8), 2, 2) is None
