"""Golden tests: JAX text decoder vs the reference torch implementation
(fp32, CPU, random weights converted through the checkpoint loader)."""

import numpy as np
import pytest

import jax.numpy as jnp

from moondream_tpu.config import TextConfig
from moondream_tpu.models import text as jtext
from moondream_tpu.weights import text_params_from_flat

from conftest import add_reference_to_path, reference_available

requires_reference = pytest.mark.skipif(
    not reference_available(), reason="reference tree not mounted"
)

if reference_available():
    add_reference_to_path()

# head_dim must be 64: the reference hardcodes rot_dim=32 == dim//(2*n_heads)
# (rope.py:26, text.py:217).
TINY = TextConfig(
    dim=128,
    ff_dim=256,
    n_layers=3,
    vocab_size=512,
    max_context=1024,
    n_heads=2,
    n_kv_heads=2,
    prefix_attn=730,
)


def _build_reference_text(cfg: TextConfig, seed: int = 0):
    add_reference_to_path()
    import torch
    from moondream.torch.text import build_text_model

    torch.manual_seed(seed)
    model = build_text_model(cfg, torch.float32)
    with torch.no_grad():
        for p in model.parameters():
            p.normal_(0.0, 0.05)
    return model


def _jax_params_from_reference(model, cfg: TextConfig):
    flat = {f"text.{k}": v for k, v in model.state_dict().items()}
    flat["text.wte"] = flat.pop("text.wte")
    return text_params_from_flat(flat, cfg, dtype=jnp.float32)


@requires_reference
def test_produce_hidden_matches_reference():
    import torch
    from moondream.torch.text import _produce_hidden

    model = _build_reference_text(TINY)
    params = _jax_params_from_reference(model, TINY)

    rng = np.random.default_rng(0)
    seq = 740  # spans the bidirectional prefix boundary at 730
    x = (rng.standard_normal((1, seq, TINY.dim)) * 0.3).astype(np.float32)

    ref = _produce_hidden(torch.from_numpy(x), model, TINY).detach().numpy()
    ours = np.asarray(jtext.produce_hidden(jnp.asarray(x), params, TINY))

    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)


@requires_reference
def test_prefill_and_decode_match_reference():
    import torch
    from moondream.torch.moondream import KVCache as RefKVCache
    from moondream.torch.text import lm_head as ref_lm_head, text_decoder as ref_decoder

    cfg = TINY
    model = _build_reference_text(cfg)
    params = _jax_params_from_reference(model, cfg)

    for b in model.blocks:
        b.kv_cache = RefKVCache(
            cfg.n_heads, cfg.n_kv_heads, cfg.max_context, cfg.dim,
            device="cpu", dtype=torch.float32,
        )

    max_ctx = cfg.max_context
    full_mask = np.tril(np.ones((1, 1, max_ctx, max_ctx), dtype=bool))

    rng = np.random.default_rng(1)
    prompt_len = 12
    x = (rng.standard_normal((1, prompt_len, cfg.dim)) * 0.3).astype(np.float32)

    # --- reference prefill + lm head
    ref_mask = torch.from_numpy(full_mask[:, :, :prompt_len, :])
    pos_ids = torch.arange(prompt_len)
    ref_hidden = ref_decoder(
        torch.from_numpy(x), model, ref_mask, pos_ids, cfg, lora=None
    )
    ref_logits = ref_lm_head(ref_hidden, model)

    # --- ours
    kv = jtext.KVCache.create(cfg, batch=1, dtype=jnp.float32)
    ours_hidden, kv = jtext.text_decoder(
        jnp.asarray(x), params, kv, jnp.int32(0), jnp.int32(0), cfg,
    )
    ours_logits = jtext.lm_head(ours_hidden, params)

    np.testing.assert_allclose(
        np.asarray(ours_hidden), ref_hidden.detach().numpy(), atol=2e-4, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(ours_logits), ref_logits.detach().numpy(), atol=2e-4, rtol=1e-3
    )

    # --- three decode steps
    pos = prompt_len
    for step in range(3):
        tok = (rng.standard_normal((1, 1, cfg.dim)) * 0.3).astype(np.float32)

        dec_mask = np.zeros((1, 1, 1, max_ctx), dtype=bool)
        dec_mask[:, :, :, : pos + 1] = True

        ref_hidden = ref_decoder(
            torch.from_numpy(tok), model, torch.from_numpy(dec_mask),
            torch.tensor([pos]), cfg, lora=None,
        )
        ref_logits = ref_lm_head(ref_hidden, model)

        ours_hidden, kv = jtext.text_decoder(
            jnp.asarray(tok), params, kv, jnp.int32(pos), jnp.int32(0), cfg,
        )
        ours_logits = jtext.lm_head(ours_hidden, params)

        np.testing.assert_allclose(
            np.asarray(ours_logits), ref_logits.detach().numpy(),
            atol=5e-4, rtol=1e-3, err_msg=f"step {step}",
        )
        pos += 1


@requires_reference
def test_lora_placement_matches_reference():
    """LoRA application sites vs the reference, with every adapter nonzero.

    The subtle one is attn-proj: the reference computes its delta from the
    BLOCK INPUT (the shared-LN output), not the attention output
    (reference text.py:53-56). A placement divergence passes every
    pool-vs-single-stream consistency test but silently breaks real
    adapter checkpoints, so this pins the torch semantics directly."""
    import torch
    from moondream.torch.moondream import KVCache as RefKVCache
    from moondream.torch.text import text_decoder as ref_decoder

    cfg = TINY
    model = _build_reference_text(cfg, seed=3)
    params = _jax_params_from_reference(model, cfg)
    for b in model.blocks:
        b.kv_cache = RefKVCache(
            cfg.n_heads, cfg.n_kv_heads, cfg.max_context, cfg.dim,
            device="cpu", dtype=torch.float32,
        )

    rank = 4
    rng = np.random.default_rng(5)
    sites = {
        "attn": {"qkv": (cfg.dim, cfg.qkv_dim), "proj": (cfg.dim, cfg.dim)},
        "mlp": {"fc1": (cfg.dim, cfg.ff_dim), "fc2": (cfg.ff_dim, cfg.dim)},
    }

    def pair(fin, fout):
        return {
            "A": (rng.standard_normal((rank, fin)) * 0.1).astype(np.float32),
            "B": (rng.standard_normal((fout, rank)) * 0.1).astype(np.float32),
        }

    per_layer = [
        {g: {s: pair(*dims) for s, dims in gs.items()} for g, gs in sites.items()}
        for _ in range(cfg.n_layers)
    ]
    ref_lora = {
        "text": {
            "blocks": {
                str(i): {
                    g: {
                        s: {k: torch.from_numpy(v) for k, v in p.items()}
                        for s, p in gs.items()
                    }
                    for g, gs in per_layer[i].items()
                }
                for i in range(cfg.n_layers)
            }
        }
    }
    stacked = {
        g: {
            s: {
                k: jnp.asarray(
                    np.stack([per_layer[i][g][s][k] for i in range(cfg.n_layers)])
                )
                for k in ("A", "B")
            }
            for s in gs
        }
        for g, gs in sites.items()
    }

    rng2 = np.random.default_rng(6)
    prompt_len = 10
    x = (rng2.standard_normal((1, prompt_len, cfg.dim)) * 0.3).astype(np.float32)
    full_mask = np.tril(
        np.ones((1, 1, cfg.max_context, cfg.max_context), dtype=bool)
    )

    ref_hidden = ref_decoder(
        torch.from_numpy(x), model,
        torch.from_numpy(full_mask[:, :, :prompt_len, :]),
        torch.arange(prompt_len), cfg, lora=ref_lora,
    )

    kv = jtext.KVCache.create(cfg, batch=1, dtype=jnp.float32)
    ours_hidden, kv = jtext.text_decoder(
        jnp.asarray(x), params, kv, jnp.int32(0), jnp.int32(0), cfg,
        lora=stacked,
    )
    np.testing.assert_allclose(
        np.asarray(ours_hidden), ref_hidden.detach().numpy(),
        atol=3e-4, rtol=1e-3,
    )

    # the cache-free training path applies the same placement. The
    # reference's _produce_hidden takes no lora, so golden = its cached
    # decoder run under the same mask (T=10 < prefix 730, so the
    # training-path prefix mask is fully bidirectional).
    ours_train = jtext.produce_hidden(
        jnp.asarray(x), params, cfg, lora=stacked
    )
    mask = jtext.prefix_attn_mask(prompt_len, cfg.prefix_attn)
    assert bool(mask.all())
    for blk in model.blocks:
        blk.kv_cache = None
    ref_train = ref_decoder(
        torch.from_numpy(x), model,
        torch.from_numpy(np.asarray(mask)), torch.arange(prompt_len),
        cfg, lora=ref_lora,
    )
    np.testing.assert_allclose(
        np.asarray(ours_train), ref_train.detach().numpy(),
        atol=3e-4, rtol=1e-3,
    )


@requires_reference
def test_gqa_decode_matches_reference():
    """GQA path (n_kv_heads < n_heads) — the reference supports it via
    enable_gqa (text.py:49)."""
    import torch
    from moondream.torch.moondream import KVCache as RefKVCache
    from moondream.torch.text import text_decoder as ref_decoder

    cfg = TextConfig(
        dim=256, ff_dim=256, n_layers=2, vocab_size=128, max_context=256,
        n_heads=4, n_kv_heads=2, prefix_attn=8,
    )
    # head_dim = 64 -> rope rot_dim 32: satisfies the reference hardcode.
    model = _build_reference_text(cfg, seed=7)
    params = _jax_params_from_reference(model, cfg)
    for b in model.blocks:
        b.kv_cache = RefKVCache(
            cfg.n_heads, cfg.n_kv_heads, cfg.max_context, cfg.dim,
            device="cpu", dtype=torch.float32,
        )

    rng = np.random.default_rng(2)
    x = (rng.standard_normal((1, 6, cfg.dim)) * 0.3).astype(np.float32)
    full_mask = np.tril(np.ones((1, 1, cfg.max_context, cfg.max_context), dtype=bool))

    ref_hidden = ref_decoder(
        torch.from_numpy(x), model,
        torch.from_numpy(full_mask[:, :, :6, :]), torch.arange(6), cfg, lora=None,
    )

    kv = jtext.KVCache.create(cfg, batch=1, dtype=jnp.float32)
    ours_hidden, _ = jtext.text_decoder(
        jnp.asarray(x), params, kv, jnp.int32(0), jnp.int32(0), cfg,
    )
    np.testing.assert_allclose(
        np.asarray(ours_hidden), ref_hidden.detach().numpy(), atol=2e-4, rtol=1e-3
    )
