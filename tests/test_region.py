"""Golden tests: region (grounding) heads vs the reference torch implementation."""

import numpy as np
import pytest

import jax.numpy as jnp

from moondream_tpu.config import RegionConfig
from moondream_tpu.models import region as jregion
from moondream_tpu.weights import region_params_from_flat

from conftest import add_reference_to_path, reference_available

requires_reference = pytest.mark.skipif(
    not reference_available(), reason="reference tree not mounted"
)

if reference_available():
    add_reference_to_path()

TINY = RegionConfig(
    dim=64, coord_feat_dim=16, coord_out_dim=1024,
    size_feat_dim=32, size_out_dim=2048, inner_dim=128,
)


def _build_reference_region(cfg, seed=0):
    """Reference region weights live inside MoondreamModel.__init__
    (moondream.py:97-136); rebuild the same structure standalone."""
    import torch
    import torch.nn as nn

    torch.manual_seed(seed)
    region = nn.ModuleDict(
        {
            "coord_encoder": nn.Linear(cfg.coord_feat_dim, cfg.dim),
            "coord_decoder": nn.ModuleDict(
                {
                    "fc1": nn.Linear(cfg.dim, cfg.inner_dim),
                    "fc2": nn.Linear(cfg.inner_dim, cfg.coord_out_dim),
                }
            ),
            "size_encoder": nn.Linear(cfg.size_feat_dim, cfg.dim),
            "size_decoder": nn.ModuleDict(
                {
                    "fc1": nn.Linear(cfg.dim, cfg.inner_dim),
                    "fc2": nn.Linear(cfg.inner_dim, cfg.size_out_dim),
                }
            ),
        }
    )
    region.coord_features = nn.Parameter(
        torch.randn(cfg.coord_feat_dim // 2, 1).T * 2.0
    )
    region.size_features = nn.Parameter(
        torch.randn(cfg.size_feat_dim // 2, 2).T * 2.0
    )
    return region


def _jax_params(region, cfg):
    flat = {f"region.{k}": v for k, v in region.state_dict().items()}
    return region_params_from_flat(flat, cfg, dtype=jnp.float32)


@requires_reference
def test_region_codecs_match_reference():
    import torch
    from moondream.torch.region import (
        decode_coordinate as ref_dec_c,
        decode_size as ref_dec_s,
        encode_coordinate as ref_enc_c,
        encode_size as ref_enc_s,
    )

    region = _build_reference_region(TINY)
    params = _jax_params(region, TINY)

    # mlp() in the reference calls module attributes; wrap decoder dicts.
    class W:
        pass

    coord = np.array([[0.37]], dtype=np.float32)
    ours = np.asarray(jregion.encode_coordinate(jnp.asarray(coord), params))
    ref = ref_enc_c(torch.from_numpy(coord), region).detach().numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-4)

    size = np.array([[0.2, 0.65]], dtype=np.float32)
    ours = np.asarray(jregion.encode_size(jnp.asarray(size), params))
    ref = ref_enc_s(torch.from_numpy(size), region).detach().numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-4)

    rng = np.random.default_rng(0)
    hidden = (rng.standard_normal((1, TINY.dim)) * 0.3).astype(np.float32)

    cd = W()
    cd.fc1, cd.fc2 = region["coord_decoder"]["fc1"], region["coord_decoder"]["fc2"]
    ours = np.asarray(jregion.decode_coordinate(jnp.asarray(hidden), params))
    ref = ref_dec_c(torch.from_numpy(hidden), region).detach().numpy()
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)

    ours = np.asarray(jregion.decode_size(jnp.asarray(hidden[0]), params))
    ref = ref_dec_s(torch.from_numpy(hidden[0]), region).detach().numpy()
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)


@requires_reference
def test_spatial_refs_match_reference():
    import torch
    from moondream.torch.region import encode_spatial_refs as ref_refs

    region = _build_reference_region(TINY, seed=4)
    params = _jax_params(region, TINY)

    refs = [(0.25, 0.5), (0.1, 0.2, 0.6, 0.9)]
    ours = jregion.encode_spatial_refs(refs, params)
    ref = ref_refs(refs, region)

    np.testing.assert_allclose(
        np.asarray(ours["coords"]), ref["coords"].detach().numpy(),
        atol=1e-4, rtol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(ours["sizes"]), ref["sizes"].detach().numpy(),
        atol=1e-4, rtol=1e-4,
    )


def test_size_bin_roundtrip():
    bins = jnp.asarray(np.array([0, 511, 1023], dtype=np.int32))
    vals = jregion.size_bin_to_value(bins)
    np.testing.assert_allclose(
        np.asarray(vals), [2.0**-10, 2.0 ** ((511 / 1023) * 10 - 10), 1.0],
        rtol=1e-6,
    )
