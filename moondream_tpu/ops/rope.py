"""Partial rotary position embeddings.

Matches the reference semantics (/root/reference/moondream/torch/rope.py:6-48):
only the first `rot_dim` channels of each head rotate, the rotating half uses
a non-interleaved half-split (real = [:16], imag = [16:32]), rotation math is
fp32, and the rotated output re-interleaves as (r0, i0, r1, i1, ...).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def precompute_freqs_cis(dim: int, end: int, theta: float = 10000.0) -> jax.Array:
    """Cos/sin table of shape (end, dim//2, 2), fp32 (reference rope.py:6-17).

    Built host-side once per model. Angles accumulate in fp32 (matching the
    reference's fp32 `t * freqs`) while the trig itself evaluates in f64 —
    this reproduces torch's complex-exp table to ~1 ulp, which fp32 XLA trig
    on device would not.
    """
    exponents = np.arange(0, dim, 2, dtype=np.float32)[: dim // 2] / np.float32(dim)
    inv_freq = (np.float32(1.0) / np.float32(theta) ** exponents).astype(np.float32)
    angles = (np.arange(end, dtype=np.float32)[:, None] * inv_freq[None, :]).astype(
        np.float32
    )
    table = np.stack(
        [np.cos(angles.astype(np.float64)), np.sin(angles.astype(np.float64))],
        axis=-1,
    ).astype(np.float32)
    return jnp.asarray(table)


def apply_rotary_emb(
    x: jax.Array,
    freqs_cis: jax.Array,
    position_ids: jax.Array,
    rot_dim: int = 32,
) -> jax.Array:
    """Rotate the leading `rot_dim` channels of each head.

    x: (B, H, T, head_dim); freqs_cis: (max_ctx, rot_dim//2, 2);
    position_ids: (T,) int32 shared across the batch, or (B, T) per-row
    (ragged continuous-batching decode). Reference rope.py:20-48.
    """
    assert rot_dim == freqs_cis.shape[-2] * 2

    x_rot, x_pass = x[..., :rot_dim], x[..., rot_dim:]
    half = rot_dim // 2
    xr = x_rot[..., :half].astype(jnp.float32)
    xi = x_rot[..., half:].astype(jnp.float32)

    if position_ids.ndim == 2:  # (B, T): per-row positions
        cos = freqs_cis[position_ids, :, 0][:, None, :, :]  # (B,1,T,half)
        sin = freqs_cis[position_ids, :, 1][:, None, :, :]
    else:
        cos = freqs_cis[position_ids, :, 0][None, None, :, :]  # (1,1,T,half)
        sin = freqs_cis[position_ids, :, 1][None, None, :, :]

    out_r = xr * cos - xi * sin
    out_i = xr * sin + xi * cos
    # Re-interleave (r0, i0, r1, i1, ...) — reference rope.py:46.
    rotated = jnp.stack([out_r, out_i], axis=-1).reshape(x_rot.shape)

    return jnp.concatenate([rotated.astype(x.dtype), x_pass], axis=-1)
