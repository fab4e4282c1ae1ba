"""LoRA adapter finetuning (finetune/lora.py).

The reference can only consume variants (its training runs on a hosted
service); this repo trains them. Pins: fresh adapters are exact no-ops
(B=0), the adapter-only step learns (loss drops, base frozen), and a saved
adapter round-trips through the variant loader byte-for-byte into the same
stacked pytree the inference engines consume."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import moondream_tpu.lora as lora_mod
from moondream_tpu.config import tiny_test_config
from moondream_tpu.finetune.lora import (
    init_lora_params,
    lora_text_loss,
    make_lora_train_step,
    save_variant,
)
from moondream_tpu.finetune.trainer import (
    TrainState,
    make_optimizer,
    text_loss,
)
from moondream_tpu.models import text as text_ops

CFG = tiny_test_config().text


@pytest.fixture(scope="module")
def text_params():
    return text_ops.init_text_params(CFG, jax.random.PRNGKey(0), jnp.float32)


def _batch(B=2, T=16, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "inputs_embeds": jnp.asarray(
            rng.standard_normal((B, T, CFG.dim)).astype(np.float32) * 0.1
        ),
        "labels": jnp.asarray(
            rng.integers(0, CFG.vocab_size, (B, T)).astype(np.int32)
        ),
        "label_mask": jnp.ones((B, T), jnp.float32),
    }


def test_fresh_adapter_is_exact_noop(text_params):
    lora = init_lora_params(CFG, rank=4, key=jax.random.PRNGKey(1))
    batch = _batch()
    base = text_loss(
        text_params, batch["inputs_embeds"], batch["labels"],
        batch["label_mask"], CFG,
    )
    with_lora = lora_text_loss(
        lora, text_params, batch["inputs_embeds"], batch["labels"],
        batch["label_mask"], CFG,
    )
    np.testing.assert_allclose(float(with_lora), float(base), rtol=1e-6)


def test_adapter_step_learns_and_base_stays_frozen(text_params):
    lora = init_lora_params(CFG, rank=4, key=jax.random.PRNGKey(1))
    opt = make_optimizer(lr=1e-2)
    step = make_lora_train_step(opt, CFG)
    state = TrainState(lora, opt.init(lora), jnp.int32(0))

    frozen_before = jax.tree.map(np.asarray, text_params)
    batch = _batch()
    losses = []
    for _ in range(6):
        state, loss = step(state, text_params, batch)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses

    # the base params object was never touched
    for a, b in zip(
        jax.tree.leaves(frozen_before), jax.tree.leaves(text_params)
    ):
        np.testing.assert_array_equal(np.asarray(b), a)

    # B factors actually moved off zero
    assert float(jnp.abs(state.params["attn"]["qkv"]["B"]).max()) > 0


def test_trained_adapter_roundtrips_as_variant(tmp_path, text_params):
    lora = init_lora_params(CFG, rank=4, key=jax.random.PRNGKey(1))
    opt = make_optimizer(lr=1e-2)
    step = make_lora_train_step(opt, CFG)
    state = TrainState(lora, opt.init(lora), jnp.int32(0))
    state, _ = step(state, text_params, _batch())

    path = tmp_path / "my-variant.pt"
    save_variant(str(path), state.params)

    lora_mod.variant_state_dict.cache_clear()
    loaded = lora_mod.variant_state_dict(
        str(path), n_layers=CFG.n_layers, dtype_str="float32"
    )
    for (a_path, a), (b_path, b) in zip(
        jax.tree_util.tree_flatten_with_path(state.params)[0],
        jax.tree_util.tree_flatten_with_path(loaded)[0],
    ):
        assert jax.tree_util.keystr(a_path) == jax.tree_util.keystr(b_path)
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a, dtype=np.float32), rtol=1e-6
        )

    # and the cached-decode engine consumes it: loss through the uncached
    # lora forward equals loss with the loaded adapter
    batch = _batch()
    l0 = lora_text_loss(
        state.params, text_params, batch["inputs_embeds"], batch["labels"],
        batch["label_mask"], CFG,
    )
    l1 = lora_text_loss(
        loaded, text_params, batch["inputs_embeds"], batch["labels"],
        batch["label_mask"], CFG,
    )
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-5)


def test_merge_variant_matches_lora_forward(text_params):
    """Folding the adapter into the dense weights must reproduce the
    per-step low-rank forward (fp32 params here, so near-exact)."""
    rng = jax.random.PRNGKey(3)
    lora = init_lora_params(CFG, rank=4, key=rng)
    # nonzero B so the adapter actually does something
    lora["attn"]["qkv"]["B"] = (
        jax.random.normal(rng, lora["attn"]["qkv"]["B"].shape) * 0.05
    )
    lora["mlp"]["fc2"]["B"] = (
        jax.random.normal(rng, lora["mlp"]["fc2"]["B"].shape) * 0.05
    )

    batch = _batch()
    with_lora = lora_text_loss(
        lora, text_params, batch["inputs_embeds"], batch["labels"],
        batch["label_mask"], CFG,
    )
    merged, residual = lora_mod.merge_variant(text_params, lora)
    assert residual is None  # proj adapter is zero -> fully folded
    merged_loss = text_loss(
        merged, batch["inputs_embeds"], batch["labels"],
        batch["label_mask"], CFG,
    )
    np.testing.assert_allclose(float(merged_loss), float(with_lora), rtol=1e-5)

    # nonzero attn-proj adapter: reads the block input (reference
    # text.py:53-56) so it cannot fold into W_proj — it must come back as
    # a residual adapter, and merged + residual == full lora forward
    lora["attn"]["proj"]["B"] = (
        jax.random.normal(rng, lora["attn"]["proj"]["B"].shape) * 0.05
    )
    with_proj = lora_text_loss(
        lora, text_params, batch["inputs_embeds"], batch["labels"],
        batch["label_mask"], CFG,
    )
    merged2, residual2 = lora_mod.merge_variant(text_params, lora)
    assert residual2 is not None
    merged2_loss = lora_text_loss(
        residual2, merged2, batch["inputs_embeds"], batch["labels"],
        batch["label_mask"], CFG,
    )
    np.testing.assert_allclose(float(merged2_loss), float(with_proj), rtol=1e-5)

    # int4 guard: merging after quantization is refused
    from moondream_tpu.models.text import quantize_text_params

    with pytest.raises(ValueError):
        lora_mod.merge_variant(quantize_text_params(text_params), lora)


@pytest.mark.slow
def test_finetune_text_cli_lora_smoke(tmp_path):
    """--lora-rank: 2 synthetic samples, adapter saved as a variant and
    loadable through settings={'variant': path} (the serving surface)."""
    import subprocess
    import sys

    out = tmp_path / "adapter.pt"
    r = subprocess.run(
        [
            sys.executable, "-m", "moondream_tpu.finetune.finetune_text",
            "--synthetic", "2", "--grad-accum", "1", "--epochs", "1",
            "--lora-rank", "2", "--save", str(out), "--config", "tiny",
        ],
        capture_output=True, text=True, timeout=900,
        env={
            **__import__("os").environ,
            "JAX_PLATFORMS": "cpu",
        },
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert out.exists()

    lora_mod.variant_state_dict.cache_clear()
    loaded = lora_mod.variant_state_dict(
        str(out), n_layers=CFG.n_layers, dtype_str="float32"
    )
    assert loaded["mlp"]["fc1"]["A"].shape[0] == CFG.n_layers
