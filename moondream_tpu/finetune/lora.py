"""LoRA adapter finetuning — train the "variants" the ecosystem consumes.

The reference only *loads* LoRA variants (reference lora.py:11-79, applied
in text.py:31-58 and layers.py:129-146); producing one requires their
hosted training service. This module closes the loop TPU-natively: adapters
(A, B) for the same four sites the inference path patches (attn qkv/proj,
mlp fc1/fc2) are trained with the base weights frozen, then saved in the
exact training-checkpoint naming that `moondream_tpu.lora.variant_state_dict`
(and the reference loader) expects — a finetuned adapter round-trips
straight into `model.load_variant()`.

TPU-native design: the adapter is a *stacked* pytree (leading layer axis)
riding the same `lax.scan` as the block weights, so the LoRA forward is the
ordinary produce_hidden with two extra skinny matmuls per site; the train
step differentiates w.r.t. the adapter only (the base-params cotangent is
never materialized), and the optimizer state is adapter-sized (~MBs), so
2B-scale adapter training fits where full finetuning would not.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import TextConfig
from ..models import text as text_ops
from .trainer import TrainState


# the four adapted sites: (pytree path) -> (in_features, out_features)
def _site_dims(config: TextConfig) -> dict:
    return {
        ("attn", "qkv"): (config.dim, config.qkv_dim),
        ("attn", "proj"): (config.dim, config.dim),
        ("mlp", "fc1"): (config.dim, config.ff_dim),
        ("mlp", "fc2"): (config.ff_dim, config.dim),
    }


def init_lora_params(
    config: TextConfig,
    rank: int,
    key: jax.Array,
    dtype=jnp.float32,
) -> dict:
    """Stacked adapter pytree in the variant_state_dict layout:
    A: (L, r, in) ~ N(0, 1/r²) i.e. std 1/r (torch (out,in) factor layout),
    B: (L, out, r) zeros — so a fresh adapter is an exact no-op (the
    zero-B invariant tests/test_lora.py pins)."""
    L = config.n_layers
    dims = _site_dims(config)
    keys = iter(jax.random.split(key, len(dims)))

    def pair(i, o):
        k = next(keys)
        return {
            "A": (jax.random.normal(k, (L, rank, i)) / rank).astype(dtype),
            "B": jnp.zeros((L, o, rank), dtype),
        }

    out = {"attn": {}, "mlp": {}}
    for (group, site), (i, o) in dims.items():
        out[group][site] = pair(i, o)
    return out


def lora_text_loss(
    lora: dict,
    text_params: dict,
    inputs_embeds: jax.Array,
    labels: jax.Array,
    label_mask: jax.Array,
    config: TextConfig,
) -> jax.Array:
    """Shifted CE (identical semantics to trainer.text_loss) through the
    LoRA-patched cache-free forward."""
    hidden = text_ops.produce_hidden(inputs_embeds, text_params, config, lora=lora)
    logits = text_ops.lm_head_full(hidden, text_params).astype(jnp.float32)
    logits = logits[:, :-1]
    tgt = labels[:, 1:]
    mask = label_mask[:, 1:]
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1)


def make_lora_train_step(optimizer, config: TextConfig):
    """Jitted adapter-only step: state.params is the LoRA pytree; the frozen
    base text params are a plain (non-donated, non-differentiated) input."""
    import optax

    def loss_fn(lora, text_params, batch):
        return lora_text_loss(
            lora, text_params, batch["inputs_embeds"], batch["labels"],
            batch["label_mask"], config,
        )

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(
        state: TrainState, text_params: dict, batch: dict
    ) -> Tuple[TrainState, jax.Array]:
        loss, grads = jax.value_and_grad(loss_fn)(
            state.params, text_params, batch
        )
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        lora = optax.apply_updates(state.params, updates)
        return TrainState(lora, opt_state, state.step + 1), loss

    return train_step


# ---- variant serialization (inverse of lora._RENAME_RULES) ----

_SITE_NAMES = {
    ("attn", "qkv"): "mixer.Wqkv",
    ("attn", "proj"): "mixer.out_proj",
    ("mlp", "fc1"): "mlp.fc1",
    ("mlp", "fc2"): "mlp.fc2",
}


def save_variant(path: str, lora: dict) -> None:
    """Write the adapter as a torch checkpoint in the training-run naming
    (`text_model.transformer.h.{i}.mixer.Wqkv.A` ...) that both this repo's
    variant_state_dict and the reference loader rename from — a trained
    adapter is immediately loadable as a variant."""
    import torch

    state = {}
    for (group, site), name in _SITE_NAMES.items():
        for factor in ("A", "B"):
            stacked = np.array(
                lora[group][site][factor], dtype=np.float32
            )
            for i in range(stacked.shape[0]):
                state[
                    f"text_model.transformer.h.{i}.{name}.{factor}"
                ] = torch.from_numpy(stacked[i].copy())
    torch.save(state, path)
