"""Pallas flash-attention kernel correctness (interpreter mode on CPU)
against the XLA masked-sdpa path."""

import numpy as np
import pytest

import jax.numpy as jnp

from moondream_tpu.ops.attention import attention, flash_attention


def _xla(q, k, v, pos, prefix):
    return np.asarray(
        attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), pos, prefix,
            force_xla=True,
        )
    )


def _pallas(q, k, v, pos, prefix):
    return np.asarray(
        flash_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), pos, prefix,
            interpret=True,
        )
    )


def test_vit_shape():
    rng = np.random.default_rng(0)
    b, h, t, d = 2, 4, 729, 72
    q = (rng.standard_normal((b, h, t, d)) * 0.3).astype(np.float32)
    k = (rng.standard_normal((b, h, t, d)) * 0.3).astype(np.float32)
    v = (rng.standard_normal((b, h, t, d)) * 0.3).astype(np.float32)
    np.testing.assert_allclose(
        _pallas(q, k, v, 0, t), _xla(q, k, v, 0, t), atol=2e-5, rtol=1e-4
    )


def test_image_prefill_shape():
    """730 query rows at pos 0 with a 730-wide bidirectional prefix over a
    768-slot kv span (dead tail masked causally)."""
    rng = np.random.default_rng(1)
    b, h, tq, tk, d = 1, 2, 730, 768, 64
    q = (rng.standard_normal((b, h, tq, d)) * 0.3).astype(np.float32)
    k = (rng.standard_normal((b, h, tk, d)) * 0.3).astype(np.float32)
    v = (rng.standard_normal((b, h, tk, d)) * 0.3).astype(np.float32)
    np.testing.assert_allclose(
        _pallas(q, k, v, 0, 730), _xla(q, k, v, 0, 730), atol=2e-5, rtol=1e-4
    )


def test_prompt_prefill_after_image():
    """16 query rows at pos 730, causal over a 1024-slot span."""
    rng = np.random.default_rng(2)
    b, h, tq, tk, d = 1, 2, 16, 1024, 64
    q = (rng.standard_normal((b, h, tq, d)) * 0.3).astype(np.float32)
    k = (rng.standard_normal((b, h, tk, d)) * 0.3).astype(np.float32)
    v = (rng.standard_normal((b, h, tk, d)) * 0.3).astype(np.float32)
    np.testing.assert_allclose(
        _pallas(q, k, v, 730, 730), _xla(q, k, v, 730, 730), atol=2e-5, rtol=1e-4
    )


def test_prefix_boundary_inside_span():
    rng = np.random.default_rng(3)
    b, h, t, d = 1, 3, 128, 32
    q = (rng.standard_normal((b, h, t, d)) * 0.3).astype(np.float32)
    k = (rng.standard_normal((b, h, t, d)) * 0.3).astype(np.float32)
    v = (rng.standard_normal((b, h, t, d)) * 0.3).astype(np.float32)
    np.testing.assert_allclose(
        _pallas(q, k, v, 5, 12), _xla(q, k, v, 5, 12), atol=2e-5, rtol=1e-4
    )


def test_pure_causal():
    rng = np.random.default_rng(4)
    b, h, t, d = 1, 2, 256, 64
    q = (rng.standard_normal((b, h, t, d)) * 0.3).astype(np.float32)
    k = (rng.standard_normal((b, h, t, d)) * 0.3).astype(np.float32)
    v = (rng.standard_normal((b, h, t, d)) * 0.3).astype(np.float32)
    np.testing.assert_allclose(
        _pallas(q, k, v, 0, 0), _xla(q, k, v, 0, 0), atol=2e-5, rtol=1e-4
    )
