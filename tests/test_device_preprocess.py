"""Device-side (fixed-point matmul Lanczos) preprocessing vs the host
PIL path — the device path must be uint8-BIT-EXACT with
PIL.Image.resize(LANCZOS) (it reproduces Pillow's int32 fixed-point
resampler on the MXU), so it can be the default, parity-legal path."""

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from moondream_tpu.ops.device_preprocess import (
    _pil_coeffs,
    device_overlap_crops,
    device_resize,
    preprocess_tiling,
)
from moondream_tpu.ops.image_crops import overlap_crop_image


def test_fixed_point_coeffs_shape_and_norm():
    for in_s, out_s in [(1080, 882), (100, 378), (378, 378), (37, 200)]:
        m = _pil_coeffs(in_s, out_s)
        assert m.shape == (out_s, in_s)
        assert m.dtype == np.int32
        # rows sum to ~1.0 in 22-bit fixed point (rounding moves each row
        # by at most ksize/2 ULPs)
        np.testing.assert_allclose(
            m.sum(axis=1) / (1 << 22), 1.0, atol=1e-4
        )


@pytest.mark.parametrize("shape,out", [
    ((240, 320), (378, 378)),      # upscale both axes
    ((1080, 1440), (378, 378)),    # downscale (bench shape -> global)
    ((1080, 1440), (910, 1176)),   # downscale (bench shape -> 3x4 grid)
    ((500, 400), (882, 1162)),     # upscale to a grid
    ((378, 378), (378, 378)),      # identity (PIL skips both passes)
    ((500, 378), (378, 378)),      # one axis identity (one pass skipped)
    ((97, 203), (378, 378)),       # odd small
    ((2160, 3840), (378, 378)),    # 4K downscale (wide tap windows)
])
def test_device_resize_bit_exact_vs_pil(shape, out):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (*shape, 3), np.uint8)
    want = np.asarray(
        Image.fromarray(img).resize((out[1], out[0]),
                                    Image.Resampling.LANCZOS)
    )
    got = np.asarray(
        jax.jit(lambda x: device_resize(x, out[0], out[1]))(jnp.asarray(img))
    )
    assert got.dtype == np.uint8
    np.testing.assert_array_equal(got, want)


def test_extreme_gradient_images_bit_exact():
    # structured (non-random) content: gradients and hard edges exercise
    # the negative-lobe taps and the clip8 saturation branches
    h, w = 730, 1311
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack([
        (xx * 255 // max(w - 1, 1)).astype(np.uint8),
        ((yy > h // 2) * 255).astype(np.uint8),
        ((xx % 7 == 0) * 255).astype(np.uint8),
    ], axis=-1)
    want = np.asarray(
        Image.fromarray(img).resize((378, 378), Image.Resampling.LANCZOS)
    )
    got = np.asarray(
        jax.jit(lambda x: device_resize(x, 378, 378))(jnp.asarray(img))
    )
    np.testing.assert_array_equal(got, want)


def test_preprocess_tiling_matches_host():
    cfg = dict(crop_size=378, patch_size=14, overlap_margin=4, max_crops=12)
    for h, w in [(800, 600), (1080, 1440), (300, 200), (378, 378)]:
        t = preprocess_tiling(h, w, cfg["crop_size"], cfg["patch_size"],
                              cfg["overlap_margin"], cfg["max_crops"])
        ref = overlap_crop_image(
            np.zeros((h, w, 3), np.uint8), overlap_margin=4, max_crops=12
        )["tiling"]
        assert t == tuple(ref)


@pytest.mark.parametrize("shape", [(800, 600), (1080, 1440), (240, 320)])
def test_device_crops_bit_exact_vs_host(shape):
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (*shape, 3), np.uint8)
    host = overlap_crop_image(img, overlap_margin=4, max_crops=12)
    tiling = tuple(host["tiling"])
    dev = np.asarray(
        jax.jit(lambda x: device_overlap_crops(x, tiling))(jnp.asarray(img))
    )
    assert dev.shape == host["crops"].shape
    assert dev.dtype == np.uint8  # same ViT entry signature as host crops
    np.testing.assert_array_equal(dev, host["crops"])


def test_batched_device_crops_bit_exact():
    from moondream_tpu.ops.device_preprocess import (
        device_overlap_crops_batched,
    )

    rng = np.random.default_rng(3)
    imgs = rng.integers(0, 256, (3, 700, 900, 3), np.uint8)
    hosts = [
        overlap_crop_image(im, overlap_margin=4, max_crops=12)
        for im in imgs
    ]
    tiling = tuple(hosts[0]["tiling"])
    dev = np.asarray(
        jax.jit(lambda x: device_overlap_crops_batched(x, tiling))(
            jnp.asarray(imgs)
        )
    )
    want = np.concatenate([h["crops"] for h in hosts], axis=0)
    np.testing.assert_array_equal(dev, want)


def test_encode_images_device_path_identical(monkeypatch):
    """Batched encode: the (default) device crop path produces the same
    encoded KV as the host path."""
    from moondream_tpu.config import tiny_test_config
    from moondream_tpu.models.moondream import MoondreamModel
    from moondream_tpu.tokenizer import ByteTokenizer

    model = MoondreamModel(tiny_test_config(), tokenizer=ByteTokenizer(), seed=0)
    rng = np.random.default_rng(4)
    images = [
        Image.fromarray(rng.integers(0, 255, (120, 160, 3), np.uint8))
        for _ in range(2)
    ]
    monkeypatch.setenv("MOONDREAM_DEVICE_PREPROCESS", "0")
    host_encs = model.encode_images(images)
    monkeypatch.setenv("MOONDREAM_DEVICE_PREPROCESS", "eager")
    dev_encs = model.encode_images(images)
    for he, de in zip(host_encs, dev_encs):
        np.testing.assert_array_equal(np.asarray(he.k), np.asarray(de.k))
        np.testing.assert_array_equal(np.asarray(he.v), np.asarray(de.v))


def test_encode_image_device_path_identical(monkeypatch):
    """End-to-end: embeddings from the (default) device path equal the
    host path's exactly on the tiny model — same uint8 crops in, same
    bf16 encoder, same numbers out."""
    from moondream_tpu.config import tiny_test_config
    from moondream_tpu.models.moondream import MoondreamModel
    from moondream_tpu.tokenizer import ByteTokenizer

    model = MoondreamModel(tiny_test_config(), tokenizer=ByteTokenizer(), seed=0)
    rng = np.random.default_rng(2)
    image = Image.fromarray(rng.integers(0, 255, (120, 160, 3), np.uint8))

    monkeypatch.setenv("MOONDREAM_DEVICE_PREPROCESS", "0")
    host_emb = np.asarray(model._run_vision_encoder(image), np.float32)
    monkeypatch.setenv("MOONDREAM_DEVICE_PREPROCESS", "eager")
    dev_emb = np.asarray(model._run_vision_encoder(image), np.float32)
    assert dev_emb.shape == host_emb.shape
    np.testing.assert_array_equal(dev_emb, host_emb)


def test_adaptive_routing_warms_then_routes_device(monkeypatch):
    """Default (adaptive) mode: the first image of a new shape takes the
    host path while a background thread warms the device crop graph; once
    warm, the same shape routes on-device. Outputs are bit-identical
    either way."""
    import time

    from moondream_tpu.config import tiny_test_config
    from moondream_tpu.models.moondream import MoondreamModel
    from moondream_tpu.tokenizer import ByteTokenizer

    monkeypatch.setenv("MOONDREAM_DEVICE_PREPROCESS", "adaptive")
    model = MoondreamModel(tiny_test_config(), tokenizer=ByteTokenizer(), seed=0)
    rng = np.random.default_rng(7)
    image = Image.fromarray(rng.integers(0, 255, (120, 160, 3), np.uint8))

    prepped = model._prep_crop_groups([image])
    assert prepped[0][0].ndim == 4  # first sight: host crop stack
    deadline = time.monotonic() + 60.0
    while time.monotonic() < deadline:
        with model._devpre_lock:
            if model._devpre_ready:
                break
        time.sleep(0.05)
    else:
        raise AssertionError("device crop graph never warmed")
    prepped2 = model._prep_crop_groups([image])
    assert prepped2[0][0].ndim == 3  # warm: raw image routed on-device

    monkeypatch.setenv("MOONDREAM_DEVICE_PREPROCESS", "eager")
    dev_emb = np.asarray(model._run_vision_encoder(image), np.float32)
    monkeypatch.setenv("MOONDREAM_DEVICE_PREPROCESS", "0")
    host_emb = np.asarray(model._run_vision_encoder(image), np.float32)
    np.testing.assert_array_equal(dev_emb, host_emb)
