"""Sampled-decoding parity vs the torch reference (SURVEY hard part #4).

The reference's nucleus filter (moondream.py:270-278) sorts descending,
zeroes tokens where the cumulative probability *before* them exceeds
top_p (inclusive-boundary semantics), renormalizes, and scatters back to
vocab order; multinomial then draws in vocab order. These tests pin
moondream_tpu.engine.sampling against that implementation directly:
identical support sets, near-identical renormalized probabilities, and
identical inverse-CDF draws for shared uniform samples — at several
top_p values including the boundary-heavy ones. A cutoff semantics drift
(inclusive vs exclusive, renorm-before vs after) fails these."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from moondream_tpu.engine.sampling import sample_token, target_probs

from conftest import add_reference_to_path, reference_available

requires_reference = pytest.mark.skipif(
    not reference_available(), reason="reference tree not mounted"
)

if reference_available():
    add_reference_to_path()

TOP_PS = (0.0, 0.1, 0.3, 0.5, 0.9, 0.99, 1.0)
VOCAB = 257  # odd, un-padded: catches accidental shape assumptions


def _ref_top_p(probs: np.ndarray, top_p: float) -> np.ndarray:
    """The reference's _apply_top_p (moondream.py:270-278) run through
    torch on the same probabilities."""
    import torch
    from moondream.torch.moondream import MoondreamModel

    out = MoondreamModel._apply_top_p(
        None, torch.from_numpy(probs.copy()), top_p
    )
    return out.numpy()


def _probs(logits: np.ndarray, temperature: float) -> np.ndarray:
    x = (logits / temperature).astype(np.float64)
    x -= x.max(axis=-1, keepdims=True)
    e = np.exp(x)
    return (e / e.sum(axis=-1, keepdims=True)).astype(np.float32)


@requires_reference
@pytest.mark.parametrize("top_p", TOP_PS)
def test_top_p_filter_matches_reference(top_p):
    rng = np.random.default_rng(42)
    for temperature in (0.5, 1.0):
        logits = (rng.standard_normal((8, VOCAB)) * 3).astype(np.float32)
        ref = _ref_top_p(_probs(logits, temperature), top_p)
        ours = np.asarray(
            target_probs(
                jnp.asarray(logits), jnp.float32(temperature),
                jnp.float32(top_p),
            )
        )

        # identical filtered support (which tokens survive the cutoff).
        # At top_p -> 1.0 the cutoff lands in the ~1e-7-probability tail
        # where torch's and XLA's float32 cumsum orders differ; exempt
        # tokens below 1e-6 in BOTH (a semantics drift — inclusive vs
        # exclusive boundary — flips high-probability tokens, not these).
        material = np.maximum(ours, ref) > 1e-6
        np.testing.assert_array_equal(
            (ours > 0)[material], (ref > 0)[material],
            err_msg=f"support mismatch at top_p={top_p} T={temperature}",
        )
        # near-identical renormalized probabilities
        np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-4)


@requires_reference
def test_forced_uniform_draws_match_reference():
    """Inverse-CDF draws in vocab order (the reference's multinomial
    discipline) agree token-for-token for a shared grid of uniforms."""
    rng = np.random.default_rng(7)
    logits = (rng.standard_normal((VOCAB,)) * 4).astype(np.float32)
    for top_p in (0.1, 0.3, 0.9):
        ref = _ref_top_p(_probs(logits[None], 0.7), top_p)[0]
        ours = np.asarray(
            target_probs(jnp.asarray(logits), jnp.float32(0.7),
                         jnp.float32(top_p))
        )
        ref_cdf = np.cumsum(ref.astype(np.float64))
        our_cdf = np.cumsum(ours.astype(np.float64))
        # avoid u values within float tolerance of a CDF step boundary
        us = np.linspace(0.001, 0.999, 199)
        safe = np.abs(ref_cdf[None, :] - us[:, None]).min(axis=1) > 1e-4
        ref_draws = np.searchsorted(ref_cdf, us[safe], side="right")
        our_draws = np.searchsorted(our_cdf, us[safe], side="right")
        np.testing.assert_array_equal(
            our_draws, ref_draws, err_msg=f"top_p={top_p}"
        )


def test_sample_token_draws_from_target_probs():
    """sample_token's sorted-space categorical is distribution-identical
    to drawing from target_probs: empirical frequencies over many draws
    converge to the filtered distribution, and tokens outside the
    filtered support NEVER appear."""
    rng = np.random.default_rng(3)
    logits = (rng.standard_normal((33,)) * 3).astype(np.float32)
    temperature, top_p = 0.8, 0.3
    target = np.asarray(
        target_probs(jnp.asarray(logits), jnp.float32(temperature),
                     jnp.float32(top_p))
    )
    support = set(np.nonzero(target > 0)[0].tolist())

    keys = jax.random.split(jax.random.PRNGKey(0), 4000)
    draw = jax.jit(
        lambda k: sample_token(
            jnp.asarray(logits), k, jnp.float32(temperature),
            jnp.float32(top_p),
        )
    )
    draws = np.asarray(jax.vmap(draw)(keys))
    assert set(np.unique(draws).tolist()) <= support
    freq = np.bincount(draws, minlength=len(logits)) / len(draws)
    np.testing.assert_allclose(freq, target, atol=0.04)


def test_greedy_is_argmax():
    rng = np.random.default_rng(11)
    logits = (rng.standard_normal((77,)) * 3).astype(np.float32)
    tok = sample_token(
        jnp.asarray(logits), jax.random.PRNGKey(1), jnp.float32(0.0),
        jnp.float32(0.9),
    )
    assert int(tok) == int(np.argmax(logits))
