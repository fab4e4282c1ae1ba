"""Golden tests for primitive ops against the reference torch implementation
(numerical comparison in fp32 on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from moondream_tpu.ops import layers, rope

from conftest import add_reference_to_path, reference_available

requires_reference = pytest.mark.skipif(
    not reference_available(), reason="reference tree not mounted"
)


@requires_reference
def test_rope_matches_reference():
    add_reference_to_path()
    import torch
    from moondream.torch.rope import (
        apply_rotary_emb as ref_apply,
        precompute_freqs_cis as ref_precompute,
    )

    table = rope.precompute_freqs_cis(32, 128)
    ref_table = ref_precompute(32, 128)
    np.testing.assert_allclose(np.asarray(table), ref_table.numpy(), atol=1e-6)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 4, 16, 64)).astype(np.float32)
    pos = np.arange(16)

    ours = rope.apply_rotary_emb(jnp.asarray(x), table, jnp.asarray(pos), rot_dim=32)
    ref = ref_apply(
        torch.from_numpy(x), ref_table, torch.from_numpy(pos), num_heads=4
    )
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-5)


@requires_reference
def test_rope_single_position():
    """Decode path: one query token at an arbitrary position."""
    add_reference_to_path()
    import torch
    from moondream.torch.rope import (
        apply_rotary_emb as ref_apply,
        precompute_freqs_cis as ref_precompute,
    )

    table = rope.precompute_freqs_cis(32, 2048)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 8, 1, 64)).astype(np.float32)
    pos = np.array([731])

    ours = rope.apply_rotary_emb(jnp.asarray(x), table, jnp.asarray(pos), rot_dim=32)
    ref = ref_apply(
        torch.from_numpy(x), ref_precompute(32, 2048), torch.from_numpy(pos), 8
    )
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-5)


@requires_reference
def test_layer_norm_and_mlp_match_reference():
    add_reference_to_path()
    import torch
    import torch.nn as nn
    from moondream.torch.layers import layer_norm as ref_ln, mlp as ref_mlp

    rng = np.random.default_rng(2)
    d, ff = 64, 128
    x = rng.standard_normal((2, 8, d)).astype(np.float32)
    g = rng.standard_normal(d).astype(np.float32)
    b = rng.standard_normal(d).astype(np.float32)

    ours = layers.layer_norm(
        jnp.asarray(x), {"weight": jnp.asarray(g), "bias": jnp.asarray(b)}
    )
    ln_mod = nn.LayerNorm(d)
    ln_mod.weight.data = torch.from_numpy(g)
    ln_mod.bias.data = torch.from_numpy(b)
    ref = ref_ln(torch.from_numpy(x), ln_mod)
    np.testing.assert_allclose(np.asarray(ours), ref.detach().numpy(), atol=1e-5)

    w1 = rng.standard_normal((ff, d)).astype(np.float32) * 0.1
    b1 = rng.standard_normal(ff).astype(np.float32) * 0.1
    w2 = rng.standard_normal((d, ff)).astype(np.float32) * 0.1
    b2 = rng.standard_normal(d).astype(np.float32) * 0.1

    ours_mlp = layers.mlp(
        jnp.asarray(x),
        {
            "fc1": {"w": jnp.asarray(w1.T), "b": jnp.asarray(b1)},
            "fc2": {"w": jnp.asarray(w2.T), "b": jnp.asarray(b2)},
        },
    )

    fc1 = nn.Linear(d, ff)
    fc1.weight.data, fc1.bias.data = torch.from_numpy(w1), torch.from_numpy(b1)
    fc2 = nn.Linear(ff, d)
    fc2.weight.data, fc2.bias.data = torch.from_numpy(w2), torch.from_numpy(b2)

    class W:
        pass

    w = W()
    w.fc1, w.fc2 = fc1, fc2
    ref_out = ref_mlp(torch.from_numpy(x), w)
    np.testing.assert_allclose(
        np.asarray(ours_mlp), ref_out.detach().numpy(), atol=2e-4, rtol=1e-4
    )


@requires_reference
def test_vit_attention_matches_reference():
    add_reference_to_path()
    import torch
    import torch.nn as nn
    from moondream.torch.layers import (
        AttentionWeights,
        LinearWeights,
        attn as ref_attn,
    )

    rng = np.random.default_rng(3)
    d, heads, seq = 64, 4, 16
    x = rng.standard_normal((2, seq, d)).astype(np.float32)
    qkv_w = rng.standard_normal((3 * d, d)).astype(np.float32) * 0.1
    qkv_b = rng.standard_normal(3 * d).astype(np.float32) * 0.1
    proj_w = rng.standard_normal((d, d)).astype(np.float32) * 0.1
    proj_b = rng.standard_normal(d).astype(np.float32) * 0.1

    ours = layers.attn(
        jnp.asarray(x),
        {
            "qkv": {"w": jnp.asarray(qkv_w.T), "b": jnp.asarray(qkv_b)},
            "proj": {"w": jnp.asarray(proj_w.T), "b": jnp.asarray(proj_b)},
        },
        n_heads=heads,
    )

    ref = ref_attn(
        torch.from_numpy(x),
        AttentionWeights(
            qkv=LinearWeights(torch.from_numpy(qkv_w), torch.from_numpy(qkv_b)),
            proj=LinearWeights(torch.from_numpy(proj_w), torch.from_numpy(proj_b)),
        ),
        n_heads=heads,
    )
    np.testing.assert_allclose(
        np.asarray(ours), ref.detach().numpy(), atol=2e-5, rtol=1e-5
    )
