"""Pipeline-parallel (pp) training for the text decoder.

New TPU-native capability (the reference is strictly single-device,
SURVEY.md §2.5). The stacked-blocks parameter layout — every per-layer
weight is one array with a leading (n_layers, ...) axis — makes layer
sharding a plain NamedSharding: the `blocks` subtree is partitioned over a
`pp` mesh axis, so each pipeline stage holds a contiguous slab of
n_layers/pp blocks with no per-layer scatter/gather code.

The schedule is GPipe expressed the JAX way: one `lax.scan` over
M + S - 1 ticks inside a `jax.shard_map` over the ("pp", "dp") mesh.
Each tick, every stage runs its local layer slab on its activation
buffer, the buffers rotate one stage forward via `lax.ppermute` (a
point-to-point ICI hop — this is the only inter-stage communication), the
first stage injects the next microbatch, and the last stage accumulates
the shifted-CE sums for the microbatch leaving the pipe. Loss semantics
are identical to finetune.trainer.text_loss (global masked mean; the
normalizer is psum'd over pp x dp), so single-device and pipelined
training produce the same loss and the same parameter updates up to
float reassociation.

Gradients: `jax.value_and_grad` differentiates straight through the
scan + ppermute (the transpose of a ppermute is the reverse ppermute, so
backward activations flow last-stage -> first-stage exactly like a
hand-written pipeline backward pass). Per-stage block gradients stay
resident on their stage (all-reduced over dp only); gradients of the
replicated leaves (lm_head/post_ln/wte/freqs_cis) are all-reduced over
pp x dp. The optimizer step runs outside the shard_map as an ordinary
jitted elementwise update over the sharded pytrees.

Composition: dp rides the same shard_map (each dp replica feeds its own
batch shard through its own pipeline copy); tp composes by running this
module's shard_map with GSPMD-sharded inputs is NOT supported — use
pp x dp here and mesh.text_param_shardings' dp x tp trainer when tensor
parallelism is the better fit for the layer shapes (2048-dim blocks run
out of tp-splittable work before they run out of layers).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import TextConfig
from ..models.text import attn_uncached, lm_head_full, prefix_attn_mask
from ..ops.layers import layer_norm, mlp


def pp_shardings_like(params: dict, mesh: Mesh) -> dict:
    """Sharding pytree matching a concrete text-params pytree."""
    rep = NamedSharding(mesh, P())

    def stage(x):
        return NamedSharding(mesh, P("pp", *([None] * (x.ndim - 1))))

    return {
        k: (jax.tree.map(stage, v) if k == "blocks" else jax.tree.map(lambda _: rep, v))
        for k, v in params.items()
    }


def _pp_specs_like(params: dict) -> dict:
    """PartitionSpec pytree (shard_map in/out specs) matching params."""

    def stage(x):
        return P("pp", *([None] * (x.ndim - 1)))

    return {
        k: (
            jax.tree.map(stage, v)
            if k == "blocks"
            else jax.tree.map(lambda _: P(), v)
        )
        for k, v in params.items()
    }


def shard_params_pp(params: dict, mesh: Mesh) -> dict:
    """Place text params for pipeline training: layer slabs per stage."""
    return jax.device_put(params, pp_shardings_like(params, mesh))


def _nll_sums(
    hidden: jax.Array, labels: jax.Array, mask: jax.Array, w: dict
) -> Tuple[jax.Array, jax.Array]:
    """Shifted-CE numerator/denominator sums for one microbatch — the same
    math as finetune.trainer.text_loss, unreduced."""
    logits = lm_head_full(hidden, w).astype(jnp.float32)[:, :-1]
    tgt = labels[:, 1:]
    m = mask[:, 1:]
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    return jnp.sum(nll * m), jnp.sum(m)


def make_pp_loss_and_grads(config: TextConfig, mesh: Mesh, n_microbatches: int):
    """Build `fn(params, batch) -> (loss, grads)` where the forward+backward
    runs as a GPipe pipeline over the mesh's "pp" axis and a data-parallel
    replica per "dp" index. batch: inputs_embeds (B, T, D), labels (B, T),
    label_mask (B, T), with B divisible by dp * n_microbatches."""
    S = mesh.shape["pp"]
    M = n_microbatches
    if config.n_layers % S:
        raise ValueError(
            f"n_layers={config.n_layers} not divisible by pp={S}"
        )

    def stage_fn(h, local_blocks, freqs_cis, mask):
        def block(carry, bw):
            ln_in = layer_norm(carry, bw["ln"])
            attn_out = attn_uncached(ln_in, bw["attn"], freqs_cis, mask, config)
            mlp_out = mlp(ln_in, bw["mlp"])
            return carry + attn_out + mlp_out, None

        h, _ = jax.lax.scan(block, h, local_blocks)
        return h

    def pipelined_loss(params, embeds, labels, label_mask):
        # dp-local batch -> (M, b, T, D) microbatches
        B, T, D = embeds.shape
        if B % M:
            raise ValueError(f"dp-local batch {B} not divisible by M={M}")
        b = B // M
        mb_e = embeds.reshape(M, b, T, D)
        mb_l = labels.reshape(M, b, T)
        mb_m = label_mask.reshape(M, b, T)

        stage = jax.lax.axis_index("pp")
        attn_mask = prefix_attn_mask(T, config.prefix_attn)
        perm = [(i, (i + 1) % S) for i in range(S)]

        def tick(buf, t):
            h_out = stage_fn(buf, params["blocks"], params["freqs_cis"], attn_mask)
            # rotate buffers one stage forward; stage 0 injects microbatch t+1
            sent = jax.lax.ppermute(h_out, "pp", perm)
            nxt = jax.lax.dynamic_index_in_dim(
                mb_e, jnp.clip(t + 1, 0, M - 1), 0, keepdims=False
            )
            buf = jnp.where(stage == 0, nxt, sent)
            return buf, h_out

        buf0 = jnp.where(stage == 0, mb_e[0], jnp.zeros_like(mb_e[0]))
        _, hs = jax.lax.scan(tick, buf0, jnp.arange(M + S - 1))

        # Loss once, outside the scan: on the LAST stage, tick t's output is
        # the final hidden of microbatch t-(S-1), so ticks [S-1, S-1+M) are
        # exactly the M finished microbatches — a static slice. The
        # full-vocab lm_head is the heaviest projection here, so keeping it
        # out of the tick body avoids paying it on the S-1 bubble ticks
        # (the non-last stages still compute it on garbage and mask it —
        # unavoidable without a cond, which this jax version cannot
        # differentiate inside shard_map).
        final_h = hs[S - 1 : S - 1 + M].reshape(M * b, T, D)
        nll_sum, mask_sum = _nll_sums(
            final_h, mb_l.reshape(M * b, T), mb_m.reshape(M * b, T), params
        )
        is_last = (stage == S - 1).astype(jnp.float32)
        total_nll = jax.lax.psum(nll_sum * is_last, ("pp", "dp"))
        total_mask = jax.lax.psum(mask_sum * is_last, ("pp", "dp"))
        return total_nll / jnp.maximum(total_mask, 1.0)

    def loss_and_grads_local(params, embeds, labels, label_mask):
        # No manual gradient all-reduces: with vma checking on, the AD
        # transpose of consuming an axis-invariant param in axis-varying
        # compute IS the psum over that axis — block grads come back
        # summed over dp (still per-stage on pp), replicated leaves summed
        # over pp x dp.
        return jax.value_and_grad(pipelined_loss)(
            params, embeds, labels, label_mask
        )

    param_specs = None  # resolved per-call (pytree shape depends on params)

    def fn(params, batch):
        nonlocal param_specs
        if param_specs is None:
            param_specs = _pp_specs_like(params)
        sharded = jax.shard_map(
            loss_and_grads_local,
            mesh=mesh,
            in_specs=(
                param_specs,
                P("dp", None, None),
                P("dp", None),
                P("dp", None),
            ),
            out_specs=(P(), param_specs),
            # vma checking ON matters for correctness here, not just
            # hygiene: with check_vma=False every psum transposes to a
            # psum, which scales the loss cotangent by the device count
            # and yields gradients mesh-size-times too large.
            check_vma=True,
        )
        return sharded(
            params,
            batch["inputs_embeds"],
            batch["labels"],
            batch["label_mask"],
        )

    return fn


def make_pp_train_step(optimizer, config: TextConfig, mesh: Mesh,
                       n_microbatches: int):
    """Jitted pipeline-parallel training step with the same TrainState
    contract as finetune.trainer.make_train_step. The shard_map computes
    (loss, grads); the optimizer update is plain elementwise jit over the
    sharded pytrees (GSPMD keeps mu/nu co-located with their params)."""
    import optax

    from ..finetune.trainer import TrainState

    loss_and_grads = make_pp_loss_and_grads(config, mesh, n_microbatches)

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch: dict):
        loss, grads = loss_and_grads(state.params, batch)
        updates, opt_state = optimizer.update(
            grads, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    return train_step
