"""Golden tests: JAX vision encoder/projection vs the reference torch
implementation (fp32, CPU, random weights via the checkpoint loader)."""

import numpy as np
import pytest

import jax.numpy as jnp

from moondream_tpu.config import VisionConfig
from moondream_tpu.models import vision as jvision
from moondream_tpu.weights import vision_params_from_flat

from conftest import add_reference_to_path, reference_available

requires_reference = pytest.mark.skipif(
    not reference_available(), reason="reference tree not mounted"
)

if reference_available():
    add_reference_to_path()

TINY = VisionConfig(
    enc_dim=64,
    enc_patch_size=14,
    enc_n_layers=3,
    enc_ff_dim=128,
    enc_n_heads=2,
    proj_out_dim=96,
    crop_size=378,
    in_channels=3,
    max_crops=12,
    overlap_margin=4,
    proj_inner_dim=128,
)


def _build_reference_vision(cfg, seed=0):
    import torch
    from moondream.torch.vision import build_vision_model

    torch.manual_seed(seed)
    model = build_vision_model(cfg, torch.float32)
    with torch.no_grad():
        for p in model.parameters():
            p.normal_(0.0, 0.05)
    return model


def _jax_params(model, cfg):
    flat = {f"vision.{k}": v for k, v in model.state_dict().items()}
    return vision_params_from_flat(flat, cfg, dtype=jnp.float32)


@requires_reference
def test_create_patches_matches_reference():
    import torch
    from moondream.torch.vision import create_patches as ref_patches

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 378, 378, 3)).astype(np.float32)

    ours = np.asarray(jvision.create_patches(jnp.asarray(x), 14))
    ref = ref_patches(torch.from_numpy(x.transpose(0, 3, 1, 2)), 14).numpy()
    np.testing.assert_array_equal(ours, ref)


@requires_reference
def test_vision_encoder_matches_reference():
    import torch
    from moondream.torch.vision import vision_encoder as ref_encoder

    model = _build_reference_vision(TINY)
    params = _jax_params(model, TINY)

    rng = np.random.default_rng(1)
    crops = (rng.standard_normal((2, 378, 378, 3)) * 0.5).astype(np.float32)

    ref = ref_encoder(
        torch.from_numpy(crops.transpose(0, 3, 1, 2)), model, TINY
    ).detach().numpy()
    ours = np.asarray(jvision.vision_encoder(jnp.asarray(crops), params, TINY))

    np.testing.assert_allclose(ours, ref, atol=3e-4, rtol=1e-3)


@requires_reference
@pytest.mark.parametrize("tiling", [(1, 1), (2, 3)])
def test_vision_projection_matches_reference(tiling):
    """Includes the non-divisible adaptive mean-pool (e.g. 46x65 -> 27x27)."""
    import torch
    from moondream.torch.vision import vision_projection as ref_projection
    from dataclasses import replace

    # The reference pools to (enc_n_layers, enc_n_layers) and hard-views to
    # 729 tokens (vision.py:84-87) — numerically the 27x27 patch grid. Our
    # implementation uses grid_size; they agree whenever enc_n_layers == 27,
    # which holds for every published config.
    cfg = replace(TINY, enc_n_layers=27)
    model = _build_reference_vision(cfg, seed=3)
    params = _jax_params(model, cfg)

    g = cfg.grid_size
    inner = g - 2 * cfg.overlap_margin
    h = inner * tiling[0] + 2 * cfg.overlap_margin
    w = inner * tiling[1] + 2 * cfg.overlap_margin

    rng = np.random.default_rng(2)
    global_feats = (rng.standard_normal((g * g, cfg.enc_dim)) * 0.3).astype(np.float32)
    recon = (rng.standard_normal((h, w, cfg.enc_dim)) * 0.3).astype(np.float32)

    ref = ref_projection(
        torch.from_numpy(global_feats), torch.from_numpy(recon), model, cfg
    ).detach().numpy()
    ours = np.asarray(
        jvision.vision_projection(
            jnp.asarray(global_feats), jnp.asarray(recon), params, cfg
        )
    )
    np.testing.assert_allclose(ours, ref, atol=3e-4, rtol=1e-3)
