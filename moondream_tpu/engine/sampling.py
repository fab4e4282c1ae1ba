"""On-device sampling: temperature + nucleus (top-p).

Matches the reference's filtering semantics
(/root/reference/moondream/torch/moondream.py:270-278): sort descending,
keep tokens while the cumulative probability *before* each token is <= top_p,
renormalize, sample. Sampling happens in sorted space (categorical over the
filtered distribution, mapped back through the sort order) — equivalent to
scatter + multinomial but cheaper on TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def apply_top_p_mask(probs_desc: jax.Array, top_p: jax.Array) -> jax.Array:
    """Filter an already-descending-sorted probability vector."""
    csum = jnp.cumsum(probs_desc, axis=-1)
    keep = (csum - probs_desc) <= top_p
    filtered = jnp.where(keep, probs_desc, 0.0)
    return filtered / jnp.sum(filtered, axis=-1, keepdims=True)


def target_probs(
    logits: jax.Array, temperature: jax.Array, top_p: jax.Array
) -> jax.Array:
    """The exact distribution `sample_token` draws from at temperature > 0
    — softmax(logits/T) -> top-p filter -> renormalize — scattered back to
    vocab order. (..., V) logits -> (..., V) probabilities. Used by
    speculative sampling, whose accept/residual rule needs the target
    probabilities themselves, not just a draw."""
    logits = logits.astype(jnp.float32)
    safe_t = jnp.maximum(temperature, 1e-6)
    probs = jax.nn.softmax(logits / safe_t, axis=-1)
    order = jnp.argsort(-probs, axis=-1)
    probs_desc = jnp.take_along_axis(probs, order, axis=-1)
    filtered = apply_top_p_mask(probs_desc, top_p)
    inv = jnp.argsort(order, axis=-1)
    return jnp.take_along_axis(filtered, inv, axis=-1)


def sample_token(
    logits: jax.Array,
    rng: jax.Array,
    temperature: jax.Array,
    top_p: jax.Array,
) -> jax.Array:
    """Sample one token id from (V,) logits.

    temperature == 0 -> argmax (the greedy/parity path, reference
    moondream.py:313-318); otherwise softmax(logits/T) -> top-p filter ->
    categorical. Branches go through lax.cond so the greedy path never pays
    for the vocab-size sort (a per-token cost that matters at 51200 vocab).
    """
    logits = logits.astype(jnp.float32)

    def greedy(_):
        return jnp.argmax(logits, axis=-1)

    def nucleus(_):
        safe_t = jnp.maximum(temperature, 1e-6)
        probs = jax.nn.softmax(logits / safe_t, axis=-1)
        order = jnp.argsort(-probs, axis=-1)
        probs_desc = jnp.take_along_axis(probs, order, axis=-1)
        filtered = apply_top_p_mask(probs_desc, top_p)
        idx = jax.random.categorical(
            rng, jnp.log(jnp.maximum(filtered, 1e-30)), axis=-1
        )
        return jnp.take_along_axis(order, idx[..., None], axis=-1)[..., 0]

    return jax.lax.cond(temperature <= 0.0, greedy, nucleus, None)
