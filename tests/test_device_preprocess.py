"""Device-side (two-matmul Lanczos) preprocessing vs the host PIL path."""

import numpy as np
import pytest
from PIL import Image

import jax.numpy as jnp

from moondream_tpu.ops.device_preprocess import (
    device_overlap_crops,
    lanczos_matrix,
    preprocess_tiling,
)
from moondream_tpu.ops.image_crops import overlap_crop_image, select_tiling


def test_lanczos_matrix_rows_normalized():
    for in_s, out_s in [(1080, 882), (100, 378), (378, 378), (37, 200)]:
        m = lanczos_matrix(in_s, out_s)
        assert m.shape == (out_s, in_s)
        np.testing.assert_allclose(m.sum(axis=1), 1.0, atol=1e-5)


@pytest.mark.parametrize("shape,out", [((240, 320), (378, 378)),
                                       ((1080, 1440), (378, 378)),
                                       ((500, 400), (882, 1162))])
def test_matrix_resize_close_to_pil(shape, out):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (*shape, 3), np.uint8)
    r = lanczos_matrix(shape[0], out[0])
    c = lanczos_matrix(shape[1], out[1])
    ours = np.einsum("oh,hwc->owc", r, img.astype(np.float32))
    ours = np.einsum("owc,wi->oic", ours, c.T)
    ref = np.asarray(
        Image.fromarray(img).resize((out[1], out[0]), Image.Resampling.LANCZOS)
    ).astype(np.float32)
    # continuous-float vs PIL's uint8-quantized two-pass: a few LSB apart
    # on average; upscaling shows larger local deviations (PIL quantizes
    # the horizontal-pass intermediate to uint8 before the vertical pass)
    diff = np.abs(np.clip(ours, 0, 255) - ref)
    assert diff.mean() < 0.8, diff.mean()
    assert np.percentile(diff, 99) < 10.0


def test_preprocess_tiling_matches_host():
    cfg = dict(crop_size=378, patch_size=14, overlap_margin=4, max_crops=12)
    for h, w in [(800, 600), (1080, 1440), (300, 200), (378, 378)]:
        t = preprocess_tiling(h, w, cfg["crop_size"], cfg["patch_size"],
                              cfg["overlap_margin"], cfg["max_crops"])
        ref = overlap_crop_image(
            np.zeros((h, w, 3), np.uint8), overlap_margin=4, max_crops=12
        )["tiling"]
        assert t == tuple(ref)


def test_device_crops_match_host_geometry():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (800, 600, 3), np.uint8)
    host = overlap_crop_image(img, overlap_margin=4, max_crops=12)
    tiling = tuple(host["tiling"])
    dev = np.asarray(
        device_overlap_crops(jnp.asarray(img), tiling)
    )
    assert dev.shape == host["crops"].shape
    diff = np.abs(dev - host["crops"].astype(np.float32))
    assert diff.mean() < 1.0, diff.mean()


def test_encode_image_device_path(monkeypatch):
    """End-to-end: embeddings from the device path are close to the host
    path's on the tiny model."""
    from moondream_tpu.config import tiny_test_config
    from moondream_tpu.models.moondream import MoondreamModel
    from moondream_tpu.tokenizer import ByteTokenizer

    model = MoondreamModel(tiny_test_config(), tokenizer=ByteTokenizer(), seed=0)
    rng = np.random.default_rng(2)
    image = Image.fromarray(rng.integers(0, 255, (120, 160, 3), np.uint8))

    host_emb = np.asarray(model._run_vision_encoder(image), np.float32)
    monkeypatch.setenv("MOONDREAM_DEVICE_PREPROCESS", "1")
    dev_emb = np.asarray(model._run_vision_encoder(image), np.float32)
    assert dev_emb.shape == host_emb.shape
    # bf16 model + slightly different resample: expect close, not equal
    denom = np.abs(host_emb).mean() + 1e-6
    assert np.abs(dev_emb - host_emb).mean() / denom < 0.15
