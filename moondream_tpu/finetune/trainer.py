"""Finetuning: losses, optimizer step, LR schedule, mesh-parallel training.

Loss semantics match the reference finetuning kit:
  * text:   shifted cross-entropy over the answer span of a
    [BOS, image, question, answer] embedding sequence, computed through the
    cache-free prefix-mask forward (reference finetune_text.py:34-51)
  * region: cross-entropy on 1024-bin coordinate and size logits at the
    token positions that precede each coordinate/size slot
    (reference finetune_region.py:38-64)
  * LR: 10% linear warmup to LR then cosine to 0.1*LR
    (reference finetune_text.py:26-31)

TPU-native: optax.adamw (the reference uses bitsandbytes AdamW8bit — an
8-bit CUDA optimizer; optax.adamw is the dense equivalent here, with
`scale_by_factored_rms`-style low-memory variants available via optax),
jitted train step with donated (params, opt_state), dp x tp mesh sharding
via moondream_tpu.parallel, orbax checkpointing for mid-run resume (the
reference can only save final weights, finetune_text.py:152-155).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..config import TextConfig
from ..models import text as text_ops


def lr_schedule(base_lr: float):
    """Warmup (10%) + cosine decay to 0.1x (reference finetune_text.py:26-31).
    Returns an optax-style schedule fn of (step, max_steps) via closure."""

    def schedule(step: jax.Array, max_steps: int) -> jax.Array:
        x = step / max_steps
        warm = 0.1 * base_lr + 0.9 * base_lr * x / 0.1
        cos = 0.1 * base_lr + 0.9 * base_lr * (1 + jnp.cos(jnp.pi * (x - 0.1))) / 2
        return jnp.where(x < 0.1, warm, cos)

    return schedule


def text_loss(
    text_params: dict,
    inputs_embeds: jax.Array,
    labels: jax.Array,
    label_mask: jax.Array,
    config: TextConfig,
) -> jax.Array:
    """Shifted CE over the answer span.

    inputs_embeds: (B, T, D) [BOS, img, question, answer] (padded);
    labels: (B, T) int32 — labels[t] is the target for position t-1 (i.e.
    the answer token ids aligned to the sequence); label_mask: (B, T) bool —
    True where labels participate. Matches reference finetune_text.py:34-51,
    generalized to batches and padding via the mask.
    """
    hidden = text_ops.produce_hidden(inputs_embeds, text_params, config)
    logits = text_ops.lm_head_full(hidden, text_params).astype(jnp.float32)

    # position t predicts labels at t+1
    logits = logits[:, :-1]
    tgt = labels[:, 1:]
    mask = label_mask[:, 1:]

    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1)


def region_coord_loss(
    coord_logits: jax.Array, coord_labels: jax.Array
) -> jax.Array:
    """CE over 1024 coordinate bins, labels = round(p * 1023)
    (reference finetune_region.py:185-190)."""
    logp = jax.nn.log_softmax(coord_logits.astype(jnp.float32), axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, coord_labels[..., None], axis=-1))


def region_loss(
    region_params: dict,
    hidden: jax.Array,
    labels: jax.Array,
    c_idx: jax.Array,
    s_idx: jax.Array,
) -> jax.Array:
    """Grounding-head loss (reference finetune_region.py:38-64).

    hidden: (1, T, D) from produce_hidden; labels: (4K,) interleaved
    [x_bin, y_bin, w_bin, h_bin] per box; c_idx/s_idx: sequence positions of
    the coordinate/size slots (the hidden state one position earlier
    predicts each slot).
    """
    from ..models.region import decode_coordinate
    from ..ops.layers import mlp

    # interleaved [x, y, w, h] per box -> static splits (boolean-mask
    # indexing is not jittable; this loss runs inside the jitted train step)
    per_box = labels.reshape(-1, 4)
    c_labels = per_box[:, :2].reshape(-1)
    s_labels = per_box[:, 2:].reshape(-1)

    c_hidden = hidden[:, c_idx - 1, :]
    c_logits = decode_coordinate(c_hidden, region_params).reshape(-1, 1024)
    c_logp = jax.nn.log_softmax(c_logits.astype(jnp.float32), axis=-1)
    c_loss = -jnp.mean(jnp.take_along_axis(c_logp, c_labels[:, None], axis=-1))

    s_hidden = hidden[:, s_idx - 1, :]
    s_logits = mlp(s_hidden, region_params["size_decoder"]).reshape(-1, 1024)
    s_logp = jax.nn.log_softmax(s_logits.astype(jnp.float32), axis=-1)
    s_loss = -jnp.mean(jnp.take_along_axis(s_logp, s_labels[:, None], axis=-1))

    return c_loss + s_loss


def size_to_bin(size: jax.Array) -> jax.Array:
    """bin = (log2(size) + 10) / 10 * 1023, clamped
    (reference finetune_region.py:193-201)."""
    s = jnp.maximum(size, 1.0 / 1024.0)
    b = (jnp.log2(s) + 10.0) / 10.0 * 1023.0
    return jnp.clip(jnp.round(b), 0, 1023).astype(jnp.int32)


class TrainState(NamedTuple):
    params: dict
    opt_state: optax.OptState
    step: jax.Array


def make_optimizer(
    lr: float = 3e-6, betas=(0.9, 0.95), eps: float = 1e-6,
    weight_decay: float = 0.0, max_steps: Optional[int] = None,
) -> optax.GradientTransformation:
    if max_steps:
        sched = lr_schedule(lr)
        return optax.adamw(
            lambda step: sched(step, max_steps), b1=betas[0], b2=betas[1],
            eps=eps, weight_decay=weight_decay,
        )
    return optax.adamw(lr, b1=betas[0], b2=betas[1], eps=eps, weight_decay=weight_decay)


def init_train_state(text_params: dict, optimizer) -> TrainState:
    return TrainState(
        params=text_params,
        opt_state=optimizer.init(text_params),
        step=jnp.int32(0),
    )


def make_train_step(optimizer, config: TextConfig):
    """Build the jitted training step (donated state). Runs identically on
    one chip or under a dp x tp mesh — GSPMD inserts the gradient
    all-reduces from the parameter/batch shardings."""

    def loss_fn(params, batch):
        return text_loss(
            params, batch["inputs_embeds"], batch["labels"],
            batch["label_mask"], config,
        )

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch: dict) -> Tuple[TrainState, jax.Array]:
        loss, grads = jax.value_and_grad(loss_fn)(state.params, batch)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    return train_step


def save_checkpoint(path: str, state: TrainState):
    """Orbax checkpoint (enables mid-run resume, absent in the reference)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, {"params": state.params, "step": int(state.step)}, force=True)
    ckptr.wait_until_finished()


def load_checkpoint(path: str, template_state: TrainState, optimizer) -> TrainState:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(
        path, {"params": template_state.params, "step": 0}
    )
    return TrainState(
        params=restored["params"],
        opt_state=optimizer.init(restored["params"]),
        step=jnp.int32(restored["step"]),
    )
