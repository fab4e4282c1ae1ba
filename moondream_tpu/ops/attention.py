"""Pallas TPU attention kernels.

`flash_attention` fuses QK^T -> mask -> softmax -> PV in VMEM, never
materializing the (Tq, Tk) score matrix in HBM — the XLA fallback path
(ops.layers.sdpa) writes fp32 scores + probabilities back to HBM, which
dominates ViT encode time at 27 layers x (13 crops x 729 tokens).

One kernel serves both attention patterns in the model via the mask rule
    attend(row, col) = col <= pos + row  OR  (pos + row < prefix AND col < prefix)
which is exactly the reference's precomputed mask (causal OR bidirectional
block over the first `prefix` positions, moondream.py:138-146):

  * ViT (bidirectional, 729 valid tokens): pos=0, prefix=729 — the prefix
    term enables all valid columns, and padded rows/cols fall out causally.
  * Text prefill at position pos over a kv span: same rule verbatim.

Sequence lengths are padded to the 128-lane grid by the wrapper; `pos` and
`prefix` ride in SMEM so one compiled kernel serves every call site of the
same shape.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _use_pallas() -> bool:
    if os.environ.get("MOONDREAM_DISABLE_PALLAS"):
        return False
    try:
        return jax.devices()[0].platform not in ("cpu",)
    except Exception:
        return False


def _ceil_to(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def _flash_kernel(scalars_ref, q_ref, k_ref, v_ref, o_ref, *, scale: float):
    pos = scalars_ref[0]
    prefix = scalars_ref[1]

    q = q_ref[0]  # (Tq, D)
    k = k_ref[0]  # (Tk, D)
    v = v_ref[0]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    s = s * scale

    rows = pos + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    mask = (cols <= rows) | ((rows < prefix) & (cols < prefix))
    s = jnp.where(mask, s, jnp.float32(-1e30))

    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    p = (p / denom).astype(v.dtype)

    o_ref[0] = jnp.dot(p, v, preferred_element_type=jnp.float32).astype(o_ref.dtype)


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    pos,
    prefix,
    interpret: bool = False,
) -> jax.Array:
    """Fused attention. q: (B, H, Tq, D); k/v: (B, H, Tk, D).

    Query row i sits at absolute position pos+i; the mask rule above
    applies. Tq/Tk are padded to 128 internally; callers slice garbage rows
    themselves (they already do for bucketed shapes).
    """
    b, h, tq, d = q.shape
    tk = k.shape[2]
    scale = 1.0 / (d**0.5)

    tq_p, tk_p = _ceil_to(tq, 128), _ceil_to(tk, 128)
    if tq_p != tq:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, tq_p - tq), (0, 0)))
    if tk_p != tk:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, tk_p - tk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, tk_p - tk), (0, 0)))

    qf = q.reshape(b * h, tq_p, d)
    kf = k.reshape(b * h, tk_p, d)
    vf = v.reshape(b * h, tk_p, d)
    scalars = jnp.asarray([pos, prefix], jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b * h,),
        in_specs=[
            pl.BlockSpec((1, tq_p, d), lambda i, s: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk_p, d), lambda i, s: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk_p, d), lambda i, s: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tq_p, d), lambda i, s: (i, 0, 0), memory_space=pltpu.VMEM
        ),
    )

    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((b * h, tq_p, d), q.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * (b * h) * tq_p * tk_p * d,
            bytes_accessed=(b * h) * (tq_p * d + 2 * tk_p * d + tq_p * d) * 2,
            transcendentals=(b * h) * tq_p * tk_p,
        ),
    )(scalars, qf, kf, vf)

    out = out.reshape(b, h, tq_p, d)
    return out[:, :, :tq] if tq_p != tq else out


def attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    pos,
    prefix,
    force_xla: bool = False,
) -> jax.Array:
    """Dispatch: Pallas kernel on TPU, masked-XLA sdpa elsewhere
    (tests run the CPU path; kernel correctness is tested via interpret).
    Single-query decode steps stay on the XLA path — at Tq=1 the fp32 score
    row is tiny and XLA's fused softmax wins over kernel launch overhead."""
    if force_xla or q.shape[2] == 1 or not _use_pallas():
        from .layers import sdpa

        tq, tk = q.shape[2], k.shape[2]
        rows = pos + jnp.arange(tq, dtype=jnp.int32)[:, None]
        cols = jnp.arange(tk, dtype=jnp.int32)[None, :]
        mask = (cols <= rows) | ((rows < prefix) & (cols < prefix))
        return sdpa(q, k, v, mask[None, None])
    return flash_attention(q, k, v, pos, prefix)
