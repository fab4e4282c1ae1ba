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
from typing import Optional

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


def _flash_kernel(
    scalars_ref, q_ref, k_ref, v_ref, o_ref, *, scale: float, row_bias: bool,
):
    """Fused attention over one head tile.

    The fp32 (Tq, Tk) score plane is the VPU bottleneck, so the kernel
    touches it as few times as possible: scale is folded into q before the
    MXU dot, the mask bias is folded into the score plane once (so the
    row max and the fused exp pass both see masked scores), probabilities
    downcast to bf16 — half the write bytes — and the softmax division is
    deferred to the (Tq, D)-sized output. The max MUST be over MASKED
    scores: softmax is shift-invariant in exact arithmetic but not in
    float, and masked columns cover garbage KV slots (recycled pool
    buffers hold a previous generation's rows past `pos`), so an unmasked
    max would make outputs depend on stale buffer contents — enough to
    flip a near-tie argmax between runs (caught by
    tools/spec_parity_tpu.py).

    `row_bias` (static): when every real query row attends the full
    [0, prefix) span (the ViT's bidirectional case — the wrapper detects
    static pos + Tq <= prefix), the mask is row-independent and the bias
    collapses to a (1, Tk) vector; garbage rows/cols from the 128-padding
    are masked (cols) or sliced by the caller (rows).
    """
    pos = scalars_ref[0]
    prefix = scalars_ref[1]

    tq, tk = q_ref.shape[1], k_ref.shape[1]
    if row_bias:
        cols = jax.lax.broadcasted_iota(jnp.int32, (1, tk), 1)
        bias = jnp.where(cols < prefix, jnp.float32(0), jnp.float32(-1e30))
    else:
        rows = pos + jax.lax.broadcasted_iota(jnp.int32, (tq, tk), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (tq, tk), 1)
        mask = (cols <= rows) | ((rows < prefix) & (cols < prefix))
        bias = jnp.where(mask, jnp.float32(0), jnp.float32(-1e30))

    # statically-unrolled loop over the program's head tile: one-head-per-
    # program grids (e.g. 13 crops x 16 ViT heads x 27 layers) were
    # program-switch-overhead bound.
    # (Round-4 A/B, tools/flash_kernel_check.py: log2-domain scores and a
    # max-shift-free softmax both measured WITHIN NOISE of this kernel at
    # the ViT bench shape — 147.6/148.0 vs 146.6 ms per encoder's worth of
    # attention — confirming the round-2 finding that the kernel is
    # VPU-latency bound, not pass-count bound. Both knobs were deleted.)
    for hh in range(q_ref.shape[0]):
        q = (q_ref[hh].astype(jnp.float32) * scale).astype(q_ref.dtype)
        k = k_ref[hh]  # (Tk, D)
        v = v_ref[hh]

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) + bias

        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m).astype(v.dtype)
        denom = jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True)
        l_inv = jnp.where(denom == 0.0, 1.0, 1.0 / denom)

        o = jnp.dot(p, v, preferred_element_type=jnp.float32)
        o_ref[hh] = (o * l_inv).astype(o_ref.dtype)


def _flash_kernel_kvtiled(
    scalars_ref, q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref,
    *, scale: float, n_kt: int, tq_tile: int, tk_tile: int,
):
    """Online-softmax variant: both the query and KV axes are tiled across
    grid dims (kv innermost), carrying running (max, denom, output) in VMEM
    scratch — the full (Tq, Tk) score matrix is never materialized, so
    full-context (2048x2048) prefill stays far under the VMEM ceiling.
    Same mask rule as _flash_kernel. Scratch m/l are lane-replicated
    (tq_tile, 128) f32, the standard TPU layout for row statistics."""
    pos = scalars_ref[0]
    prefix = scalars_ref[1]
    qi = pl.program_id(1)
    kt = pl.program_id(2)
    d = q_ref.shape[2]

    @pl.when(kt == 0)
    def _init():
        m_ref[...] = jnp.full(m_ref.shape, -1e30, jnp.float32)
        l_ref[...] = jnp.zeros(l_ref.shape, jnp.float32)
        acc_ref[...] = jnp.zeros(acc_ref.shape, jnp.float32)

    shape = (tq_tile, tk_tile)
    row0 = pos + qi * tq_tile
    rows = row0 + jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    cols = kt * tk_tile + jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    mask = (cols <= rows) | ((rows < prefix) & (cols < prefix))
    bias = jnp.where(mask, jnp.float32(0), jnp.float32(-1e30))

    # skip kv tiles fully beyond every column this q tile can attend
    last_col = jnp.maximum(row0 + tq_tile - 1, prefix - 1)

    @pl.when(kt * tk_tile <= last_col)
    def _run():
        reps_k = tk_tile // 128
        if d % 128 == 0:
            lb = lambda x: jnp.tile(x, (1, d // 128))
        else:
            lb = lambda x: x[:, :d]
        for hh in range(q_ref.shape[0]):
            qh = q_ref[hh]
            kh = k_ref[hh]
            vh = v_ref[hh]
            s = jax.lax.dot_general(
                qh, kh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            s = s * scale + bias

            m_prev = m_ref[hh]  # (tq_tile, 128) lane-replicated
            l_prev = l_ref[hh]
            m_curr = jnp.max(s, axis=-1)[:, None]
            m_next = jnp.maximum(m_prev, m_curr)
            p = jnp.exp(s - jnp.tile(m_next[:, :128], (1, reps_k)))
            alpha = jnp.exp(m_prev - m_next)
            l_corr = alpha * l_prev
            l_next = jnp.sum(p, axis=-1)[:, None] + l_corr
            m_ref[hh] = m_next
            l_ref[hh] = l_next
            l_inv = jnp.where(l_next == 0.0, 1.0, 1.0 / l_next)
            acc_ref[hh] = acc_ref[hh] * lb(l_corr * l_inv)
            o_curr = jnp.dot(
                p.astype(vh.dtype), vh, preferred_element_type=jnp.float32
            )
            acc_ref[hh] = acc_ref[hh] + o_curr * lb(l_inv)

    @pl.when(kt == n_kt - 1)
    def _store():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def _flash_attention_kvtiled(
    q, k, v, scalars, b, h, tq_p, tk_p, d, scale, interpret
) -> jax.Array:
    """q/kv-tiled launch for long spans (online softmax, scratch-carried)."""
    tq_tile = min(tq_p, 512)
    tk_tile = 512
    tq_pp = _ceil_to(tq_p, tq_tile)
    tk_pp = _ceil_to(tk_p, tk_tile)
    if tq_pp != q.shape[1]:
        q = jnp.pad(q, ((0, 0), (0, tq_pp - q.shape[1]), (0, 0)))
    if tk_pp != k.shape[1]:
        k = jnp.pad(k, ((0, 0), (0, tk_pp - k.shape[1]), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, tk_pp - v.shape[1]), (0, 0)))
    n_qt = tq_pp // tq_tile
    n_kt = tk_pp // tk_tile

    ht = 1
    if os.environ.get("MOONDREAM_FLASH_HT"):
        ht = int(os.environ["MOONDREAM_FLASH_HT"])
    while (b * h) % ht:
        ht //= 2

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=((b * h) // ht, n_qt, n_kt),
        in_specs=[
            pl.BlockSpec((ht, tq_tile, d), lambda i, qi, kt, s: (i, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ht, tk_tile, d), lambda i, qi, kt, s: (i, kt, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ht, tk_tile, d), lambda i, qi, kt, s: (i, kt, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (ht, tq_tile, d), lambda i, qi, kt, s: (i, qi, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((ht, tq_tile, 128), jnp.float32),  # running max
            pltpu.VMEM((ht, tq_tile, 128), jnp.float32),  # running denom
            pltpu.VMEM((ht, tq_tile, d), jnp.float32),  # output accumulator
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _flash_kernel_kvtiled, scale=scale, n_kt=n_kt,
            tq_tile=tq_tile, tk_tile=tk_tile,
        ),
        out_shape=jax.ShapeDtypeStruct((b * h, tq_pp, d), q.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * (b * h) * tq_pp * tk_pp * d,
            bytes_accessed=(b * h) * (tq_pp * d + 2 * tk_pp * d + tq_pp * d) * 2,
            transcendentals=(b * h) * tq_pp * tk_pp,
        ),
    )(scalars, q, k, v)
    return out[:, :tq_p] if tq_pp != tq_p else out


# KV spans past this use the online-softmax kv-tiled kernel: a single
# (Tq, Tk) fp32 score block per head beyond ~1024 columns (2048x2048 is
# 16MB) would crowd out VMEM double-buffering.
FLASH_KV_TILE_THRESHOLD = 1024


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    pos,
    prefix,
    interpret: bool = False,
    real_rows: Optional[int] = None,
) -> jax.Array:
    """Fused attention. q: (B, H, Tq, D); k/v: (B, H, Tk, D).

    Query row i sits at absolute position pos+i; the mask rule above
    applies. Tq/Tk are padded to 128 internally; callers slice garbage rows
    themselves (they already do for bucketed shapes). Spans longer than
    FLASH_KV_TILE_THRESHOLD take the online-softmax kv-tiled kernel.

    `real_rows`: rows >= real_rows are caller-discarded padding; only rows
    < real_rows need the mask rule to hold (see `attention`).
    """
    b, h, tq, d = q.shape
    tk = k.shape[2]
    scale = 1.0 / (d**0.5)

    # Row-independent mask fast path: every real query row attends exactly
    # [0, prefix) (bidirectional ViT / pure-prefix prefills). Detectable
    # only when pos/prefix arrive as python ints (static). With real_rows,
    # only rows the caller keeps must satisfy the condition.
    n_rows = tq if real_rows is None else min(real_rows, tq)
    row_bias = (
        isinstance(pos, int)
        and isinstance(prefix, int)
        and pos + n_rows <= prefix
        and prefix <= tk
    )

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

    if tk_p > FLASH_KV_TILE_THRESHOLD:
        out = _flash_attention_kvtiled(
            qf, kf, vf, scalars, b, h, tq_p, tk_p, d, scale, interpret
        )
        out = out.reshape(b, h, tq_p, d)
        return out[:, :, :tq] if tq_p != tq else out

    # head tile: as many heads per program as the VMEM budget allows
    # (q/k/v/o blocks + fp32 score matrix per head, double buffered)
    d_pad = max(d, 128)
    per_head = 2 * (tq_p + 2 * tk_p + tq_p) * d_pad * 2 + tq_p * tk_p * 4
    ht = max(1, (10 * 1024 * 1024) // per_head)
    ht = min(b * h, 1 << (ht.bit_length() - 1))
    if os.environ.get("MOONDREAM_FLASH_HT"):
        ht = int(os.environ["MOONDREAM_FLASH_HT"])
    while (b * h) % ht:
        ht //= 2

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=((b * h) // ht,),
        in_specs=[
            pl.BlockSpec((ht, tq_p, d), lambda i, s: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ht, tk_p, d), lambda i, s: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ht, tk_p, d), lambda i, s: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (ht, tq_p, d), lambda i, s: (i, 0, 0), memory_space=pltpu.VMEM
        ),
    )

    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, row_bias=row_bias),
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


def _decode_kernel(scalars_ref, q_ref, k_ref, v_ref, o_ref, *, scale: float):
    """Single-query attention over a KV span, one (batch, head-tile) per
    program.

    Per-program work: H_TILE head-batched (1, D) x (T, D)^T score rows +
    softmax + (1, T) x (T, D) outputs — small compute; the kernel exists so
    the cache is streamed through VMEM exactly once per step in its native
    (H, T, D) layout (each head's (T, D) slab is contiguous in HBM), instead
    of XLA's transposed/relayout reads that dominated decode time. Tiling
    several heads per program keeps the grid small (program-switch overhead
    was the dominant cost at batch 8 x 32 heads x 24 layers).
    """
    pos = scalars_ref[0]
    prefix = scalars_ref[1]

    q = q_ref[...]  # (HT, 1, D)
    k = k_ref[...]  # (HT, T, D)
    v = v_ref[...]

    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (HT, 1, T)
    s = s * scale

    cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
    mask = (cols <= pos) | ((pos < prefix) & (cols < prefix))
    s = jnp.where(mask, s, jnp.float32(-1e30))

    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(v.dtype)

    o_ref[...] = jax.lax.dot_general(
        p, v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


def _decode_kernel_gqa(scalars_ref, q_ref, k_ref, v_ref, o_ref, *, scale, rep):
    """GQA tile: `rep` query heads sharing ONE KV head per program."""
    pos = scalars_ref[0]
    prefix = scalars_ref[1]

    q = q_ref[...][:, 0, :]  # (rep, D)
    k = k_ref[0]  # (T, D)
    v = v_ref[0]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (rep, T) — one shared-KV 2D dot, same MXU op as the exact kernel
    s = s * scale

    cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    mask = (cols <= pos) | ((pos < prefix) & (cols < prefix))
    s = jnp.where(mask, s, jnp.float32(-1e30))

    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(v.dtype)

    o = jnp.dot(p, v, preferred_element_type=jnp.float32)  # (rep, D)
    o_ref[...] = o[:, None, :].astype(o_ref.dtype)


def decode_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    pos,
    prefix,
    interpret: bool = False,
) -> jax.Array:
    """Fused single-token decode attention reading the persistent KV cache.

    q: (B, Hq, 1, D); k/v: (B, Hkv, T, D) with Hq a multiple of Hkv (GQA is
    resolved by the block index map — no materialized jnp.repeat of the
    cache). Returns (B, Hq, 1, D).
    """
    b, hq, tq, d = q.shape
    hkv, tk = k.shape[1], k.shape[2]
    assert tq == 1 and hq % hkv == 0
    rep = hq // hkv
    scale = 1.0 / (d**0.5)

    # Heads per program: as large as the VMEM budget allows (~12MB with
    # double buffering) — fat tiles amortize per-program overhead, which
    # dominated at small tiles. With GQA the KV tile must map to whole KV
    # heads, so tile by the group size.
    if rep == 1:
        vmem_budget = 12 * 1024 * 1024
        ht = max(1, vmem_budget // (2 * 2 * _ceil_to(tk, 128) * max(d, 128) * 2))
        ht = min(hq, 1 << (ht.bit_length() - 1))
    else:
        ht = rep
    while hq % ht:
        ht //= 2
    kv_ht = max(1, ht // rep)

    tk_p = _ceil_to(tk, 128)
    if tk_p != tk:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, tk_p - tk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, tk_p - tk), (0, 0)))
    scalars = jnp.asarray([pos, prefix], jnp.int32)

    # fold batch into the head grid axis so q blocks stay (HT, 1, D)
    qf = q.reshape(b * hq, 1, d)
    kf = k.reshape(b * hkv, tk_p, d)
    vf = v.reshape(b * hkv, tk_p, d)
    n_tiles = (b * hq) // ht

    def kv_index(i, s):
        # program i covers q heads [i*ht, (i+1)*ht) of the flattened (b*hq)
        # axis; its KV rows start at the matching flattened (b*hkv) offset.
        # BlockSpec index maps are in BLOCK units: divide the row by kv_ht.
        bi = (i * ht) // hq
        h0 = (i * ht) % hq
        return ((bi * hkv + h0 // rep) // kv_ht, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(
                (ht, 1, d), lambda i, s: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((kv_ht, tk_p, d), kv_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((kv_ht, tk_p, d), kv_index, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (ht, 1, d), lambda i, s: (i, 0, 0), memory_space=pltpu.VMEM
        ),
    )

    kernel = _decode_kernel if rep == 1 else functools.partial(
        _decode_kernel_gqa, rep=rep
    )
    out = pl.pallas_call(
        functools.partial(kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((b * hq, 1, d), q.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * hq * tk_p * d,
            bytes_accessed=b * (hq + 2 * hkv) * tk_p * d * 2,
            transcendentals=b * hq * tk_p,
        ),
    )(scalars, qf, kf, vf)
    return out.reshape(b, hq, 1, d)


def decode_attention_cached(
    q: jax.Array,
    k_cache: jax.Array,
    v_cache: jax.Array,
    layer,
    pos,
    prefix,
    kv_bound: Optional[int] = None,
    interpret: bool = False,
    k_scale: Optional[jax.Array] = None,
    v_scale: Optional[jax.Array] = None,
    pref_k: Optional[jax.Array] = None,
    pref_v: Optional[jax.Array] = None,
    pref_ks: Optional[jax.Array] = None,
    pref_vs: Optional[jax.Array] = None,
    pids: Optional[jax.Array] = None,
    prefix_len: int = 0,
) -> jax.Array:
    """Single-token (or small-span, Tq <= ~16) decode attention reading ONE
    layer of the full stacked KV cache (L, B, Hkv, T, D) — the layer is
    selected by the block index map from a scalar-prefetch operand, so the
    cache is passed whole and never sliced at the XLA level. This matters
    inside the per-layer scan: a host-side `kv[l]` slice feeding an opaque
    pallas call materializes a full-cache-layer copy every layer of every
    decode step (gigabytes per token at batch 8); the in-kernel index map
    reads only the blocks it DMAs. Small spans serve speculative verify
    forwards and short prompt prefills; query row i sits at position pos+i.

    q: (B, Hq, Tq, D). Returns (B, Hq, Tq, D).

    When the cache lane width exceeds D (head-paired layout from
    models.text.pair_kv), dispatches to the paired kernel.
    """
    b, hq, tq, d = q.shape
    L, _, hkv, t_max, d_cache = k_cache.shape
    if d_cache != d:
        return _decode_attention_paired(
            q, k_cache, v_cache, layer, pos, prefix, kv_bound, interpret,
            k_scale, v_scale,
            pref_k=pref_k, pref_v=pref_v, pref_ks=pref_ks, pref_vs=pref_vs,
            pids=pids, prefix_len=prefix_len,
        )
    assert k_scale is None, "int8 KV requires the head-paired layout"
    assert hq % hkv == 0
    rep = hq // hkv
    assert tq == 1 or rep == 1, "query spans require MHA"
    scale = 1.0 / (d**0.5)
    tk = t_max if kv_bound is None else min(kv_bound, t_max)
    tk = _ceil_to(tk, 128) if tk % 128 else tk
    tk = min(tk, t_max)

    if rep == 1:
        vmem_budget = 12 * 1024 * 1024
        per_row = 2 * 2 * tk * max(d, 128) * 2 + tq * tk * 4
        ht = max(1, vmem_budget // per_row)
        ht = min(hq, 1 << (ht.bit_length() - 1))
    else:
        ht = rep
    while hq % ht:
        ht //= 2
    kv_ht = max(1, ht // rep)

    ragged = hasattr(pos, "ndim") and getattr(pos, "ndim", 0) == 1
    tkp = 0 if pref_k is None else pref_k.shape[3]
    if ragged:
        parts = [
            jnp.asarray([prefix, layer], jnp.int32),
            jnp.asarray(pos, jnp.int32),
        ]
        if pref_k is not None:
            parts.append(jnp.asarray(pids, jnp.int32))
        scalars = jnp.concatenate(parts)
        layer_slot = 1
    else:
        assert pref_k is None, "prefix-shared decode requires ragged pos"
        scalars = jnp.asarray([pos, prefix, layer], jnp.int32)
        layer_slot = 2
    qf = q.reshape(b * hq, tq, d)
    n_tiles = (b * hq) // ht

    def kv_index(i, s):
        bi = (i * ht) // hq
        h0 = (i * ht) % hq
        return (s[layer_slot], bi, (h0 // rep) // kv_ht, 0, 0)

    in_specs = [
        pl.BlockSpec(
            (ht, tq, d), lambda i, s: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec((1, 1, kv_ht, tk, d), kv_index, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, kv_ht, tk, d), kv_index, memory_space=pltpu.VMEM),
    ]
    operands = [qf, k_cache, v_cache]
    if pref_k is not None:
        def kv_index_p(i, s):
            bi = (i * ht) // hq
            h0 = (i * ht) % hq
            return (s[layer_slot], s[2 + b + bi], (h0 // rep) // kv_ht, 0, 0)

        in_specs += [
            pl.BlockSpec((1, 1, kv_ht, tkp, d), kv_index_p,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, kv_ht, tkp, d), kv_index_p,
                         memory_space=pltpu.VMEM),
        ]
        operands += [pref_k, pref_v]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (ht, tq, d), lambda i, s: (i, 0, 0), memory_space=pltpu.VMEM
        ),
    )

    if ragged:
        assert rep == 1, "ragged decode assumes MHA (both model configs)"
        kernel = functools.partial(
            _decode_kernel_stacked_ragged, ht=ht, hq=hq,
            prefix_len=prefix_len,
        )
    elif rep == 1:
        kernel = _decode_kernel_stacked
    else:
        kernel = functools.partial(_decode_kernel_stacked_gqa, rep=rep)
    out = pl.pallas_call(
        functools.partial(kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((b * hq, tq, d), q.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * hq * (tk + tkp) * d * tq,
            bytes_accessed=b * (hq * tq + 2 * hkv) * (tk + tkp) * d * 2,
            transcendentals=b * hq * tq * (tk + tkp),
        ),
    )(scalars, *operands)
    return out.reshape(b, hq, tq, d)


def _decode_kernel_paired(
    scalars_ref, q2_ref, k_ref, v_ref, *rest, scale, ragged, ht, hp, tq=1,
    int8=False, prefix_len=0,
):
    """Head-paired decode attention: `pf` adjacent MHA heads share one cache
    row on the lane axis (lane block j of width dh belongs to head pf*i+j),
    so every KV block is 128 lanes wide — bf16 VMEM tiles are (16, 128), and
    a (T, 64) head slab half-fills them, halving effective HBM->VMEM
    bandwidth (measured 258 -> 434 GB/s on the B=8 x 32-head x 1024-slot
    decode step). q2 is the block-diagonal expansion built by the wrapper:
    q2[p, j*tq+i, j*dh:(j+1)*dh] = q_head(pf*p+j, query i), zeros elsewhere,
    which makes one batched MXU dot compute every head's scores against its
    own lanes.

    Scores land as (PT, pf*tq, T): (head, query-offset) rows on sublanes,
    tokens on lanes — the dense layout for the softmax VPU passes. `tq`
    (static) supports small query SPANS (speculative verify, short prompt
    prefills) reading the stacked cache directly — row j*tq+i sits at
    absolute position pos+i. The PV dot returns (PT, pf*tq, pf*dh) where
    row j*tq+i's lane block j holds head pf*p+j's output at query i.
    """
    rest = list(rest)
    o_ref = rest.pop()
    ks_ref = vs_ref = pk_ref = pv_ref = pks_ref = pvs_ref = None
    if int8:
        ks_ref, vs_ref = rest[0], rest[1]
        rest = rest[2:]
    if prefix_len:
        pk_ref, pv_ref = rest[0], rest[1]
        if int8:
            pks_ref, pvs_ref = rest[2], rest[3]
    if ragged:
        prefix = scalars_ref[0]
        i = pl.program_id(0)
        bi = (i * ht) // hp
        pos = scalars_ref[2 + bi]
    else:
        pos = scalars_ref[0]
        prefix = scalars_ref[1]

    q2 = q2_ref[...]  # (HT, pf*tq, pf*dh)
    pf = q2.shape[1] // tq
    dh = q2.shape[2] // pf
    if ks_ref is None:
        k = k_ref[0, 0]   # (HT, T, pf*dh)
        v = v_ref[0, 0]
    else:
        # int8 cache: attention is linear in each token row's scale, so the
        # k-scale folds into the score plane and the v-scale into the
        # softmax weights — both (HT, 1, T) lane-aligned broadcasts over
        # the (HT, pf*tq, T) scores. The (T, 128) code blocks only pay one
        # int8->bf16 cast; nothing full-plane runs in fp32.
        k = k_ref[0, 0].astype(q2.dtype)
        v = v_ref[0, 0].astype(q2.dtype)

    s = jax.lax.dot_general(
        q2, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )  # (HT, pf*tq, T)
    if ks_ref is None:
        s = s * scale
    else:
        s = s * (ks_ref[0, 0] * scale)  # (HT, 1, T) broadcast over rows
    cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
    if tq == 1:
        qpos = pos
    else:
        rows = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        qpos = pos + jax.lax.rem(rows, tq)  # row j*tq+i -> position pos+i
    if prefix_len:
        # prefix-shared cache: this (suffix) segment's col j sits at
        # GLOBAL position prefix_len + j; positions [0, prefix_len) live
        # in the shared prefix segment below. Decode queries are always
        # past the image, so the bidirectional-image clause of the
        # non-shared path cannot apply here.
        mask = (prefix_len + cols) <= qpos
    else:
        mask = (cols <= qpos) | ((qpos < prefix) & (cols < prefix))
    s = jnp.where(mask, s, jnp.float32(-1e30))
    if prefix_len:
        pk = (
            pk_ref[0, 0] if pks_ref is None
            else pk_ref[0, 0].astype(q2.dtype)
        )  # (HT, Tp, pf*dh)
        pv = (
            pv_ref[0, 0] if pvs_ref is None
            else pv_ref[0, 0].astype(q2.dtype)
        )
        sp = jax.lax.dot_general(
            q2, pk, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (HT, pf*tq, Tp)
        if pks_ref is None:
            sp = sp * scale
        else:
            sp = sp * (pks_ref[0, 0] * scale)
        colsp = jax.lax.broadcasted_iota(jnp.int32, sp.shape, 2)
        if tq == 1:
            qpos_p = pos
        else:
            rowsp = jax.lax.broadcasted_iota(jnp.int32, sp.shape, 1)
            qpos_p = pos + jax.lax.rem(rowsp, tq)
        # cols beyond prefix_len are lane padding (the pool rounds the
        # prefix to 128 lanes); cols <= qpos_p masks everything for
        # inactive rows (qpos 0), matching the non-shared kernel's
        # harmless uniform-garbage output there
        maskp = (colsp <= qpos_p) & (colsp < prefix_len)
        sp = jnp.where(maskp, sp, jnp.float32(-1e30))
        tp = sp.shape[2]
        s_all = jnp.concatenate([sp, s], axis=-1)
        m = jnp.max(s_all, axis=-1, keepdims=True)
        p_all = jnp.exp(s_all - m)
        denom = jnp.sum(p_all, axis=-1, keepdims=True)
        pp = p_all[..., :tp]
        ps = p_all[..., tp:]
        if vs_ref is not None:
            ps = ps * vs_ref[0, 0]
            pp = pp * pvs_ref[0, 0]
        o2 = jax.lax.dot_general(
            pp.astype(pv.dtype), pv, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) + jax.lax.dot_general(
            ps.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        o2 = o2 / denom
    else:
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        denom = jnp.sum(p, axis=-1, keepdims=True)
        if vs_ref is not None:
            p = p * vs_ref[0, 0]  # fold v-scales into the softmax weights
        p = p.astype(v.dtype)
        o2 = jax.lax.dot_general(
            p, v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (HT, pf*tq, pf*dh) — row j*tq+i lane block j = head pf*p+j
        o2 = o2 / denom
    # fold the pf head-rows of each query into ONE paired-layout row:
    # select row (j, i)'s lane block j (a lane-offset slice+concat is
    # unsupported in Mosaic; masked adds relayout cleanly). The wrapper
    # unpairs outside the kernel — for Tq=1 that is a free reshape.
    lane = jax.lax.broadcasted_iota(jnp.int32, (o2.shape[0], tq, pf * dh), 2)
    o = jnp.zeros((o2.shape[0], tq, pf * dh), jnp.float32)
    for j in range(pf):
        o = o + jnp.where(lane // dh == j, o2[:, j * tq : (j + 1) * tq, :], 0.0)
    o_ref[...] = o.astype(o_ref.dtype)


def _paired_q2(q: jax.Array, pf: int) -> jax.Array:
    """(B, Hq, Tq, dh) -> block-diagonal (B*Hq/pf, pf*Tq, pf*dh): row
    j*Tq+i of pair-row p holds head pf*p+j's query i in lane block j."""
    b, hq, tq, d = q.shape
    qf = q.reshape(b * (hq // pf), pf, tq, d)
    zero = jnp.zeros_like(qf[:, 0])
    rows = []
    for j in range(pf):
        blocks = [zero] * pf
        blocks[j] = qf[:, j]
        rows.append(jnp.concatenate(blocks, axis=-1))  # (B*hp, Tq, pf*dh)
    return jnp.concatenate(rows, axis=1)


def _decode_attention_paired(
    q, k_cache, v_cache, layer, pos, prefix, kv_bound, interpret,
    k_scale=None, v_scale=None,
    pref_k=None, pref_v=None, pref_ks=None, pref_vs=None, pids=None,
    prefix_len=0,
) -> jax.Array:
    """Stacked-cache decode attention over the head-paired layout
    (L, B, Hkv/pf, T, pf*dh). Dispatched from decode_attention_cached when
    the cache lane width exceeds the query head_dim (MHA only). With
    k_scale/v_scale (L, B, Hkv/pf, 1, T), the cache holds int8 codes and
    the kernel folds the scales into scores / softmax weights.

    Prefix-shared mode (`pref_k` given, ragged only): the main cache is a
    SUFFIX segment (col j = global position prefix_len + j) and
    `pref_k`/`pref_v` (L, P, Hkv/pf, Tp, pf*dh) hold shared read-only
    image prefixes; row b reads prefix entry `pids[b]` — the entry index
    feeds the BlockSpec index map from scalar prefetch, so N rows sharing
    one image hold ONE prefix copy in HBM."""
    b, hq, tq, d = q.shape
    L, _, hp_c, t_max, dd = k_cache.shape
    pf = dd // d
    assert hq == hp_c * pf, "paired layout requires MHA"
    scale = 1.0 / (d**0.5)
    tk = t_max if kv_bound is None else min(kv_bound, t_max)
    tk = _ceil_to(tk, 128) if tk % 128 else tk
    tk = min(tk, t_max)
    int8 = k_scale is not None

    tkp = 0 if pref_k is None else pref_k.shape[3]

    hp = b * hp_c  # flattened pair rows
    # Tunable for A/B only (tools/decode_kernel_ab.py --vmem-mb): smaller
    # budgets shrink the head tile (more, smaller DMA blocks); 12MB of the
    # ~16MB VMEM is the measured sweet spot and the default.
    vmem_budget = int(
        float(os.environ.get("MOONDREAM_DECODE_VMEM_MB", "12")) * 1024 * 1024
    )
    # int8 blocks: 1B codes + a transient bf16 cast copy -> ~3B/elem;
    # spans (tq > 1) add a (pf*tq, tk) fp32 score plane per pair row
    elt = 3 if int8 else 2
    per_row = 2 * 2 * (tk + tkp) * max(dd, 128) * elt + pf * tq * (tk + tkp) * 4
    ht = max(1, vmem_budget // per_row)
    ht = min(hp_c, 1 << (ht.bit_length() - 1))
    while hp_c % ht:
        ht //= 2

    ragged = hasattr(pos, "ndim") and getattr(pos, "ndim", 0) == 1
    if ragged:
        parts = [
            jnp.asarray([prefix, layer], jnp.int32),
            jnp.asarray(pos, jnp.int32),
        ]
        if pref_k is not None:
            parts.append(jnp.asarray(pids, jnp.int32))
        scalars = jnp.concatenate(parts)
        layer_slot = 1
    else:
        assert pref_k is None, "prefix-shared decode requires ragged pos"
        scalars = jnp.asarray([pos, prefix, layer], jnp.int32)
        layer_slot = 2

    q2 = _paired_q2(q, pf)  # (b*hp_c, pf*tq, pf*d)
    n_tiles = hp // ht

    def kv_index(i, s):
        bi = (i * ht) // hp_c
        h0 = (i * ht) % hp_c
        return (s[layer_slot], bi, h0 // ht, 0, 0)

    in_specs = [
        pl.BlockSpec(
            (ht, pf * tq, dd), lambda i, s: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec((1, 1, ht, tk, dd), kv_index, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, ht, tk, dd), kv_index, memory_space=pltpu.VMEM),
    ]
    operands = [q2, k_cache, v_cache]
    if int8:
        in_specs += [
            pl.BlockSpec((1, 1, ht, 1, tk), kv_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, ht, 1, tk), kv_index, memory_space=pltpu.VMEM),
        ]
        operands += [k_scale, v_scale]
    if pref_k is not None:
        # row b's prefix entry pids[b] comes from scalar prefetch (after
        # [prefix, layer] and the b per-row positions)
        def kv_index_p(i, s):
            bi = (i * ht) // hp_c
            h0 = (i * ht) % hp_c
            return (s[1], s[2 + b + bi], h0 // ht, 0, 0)

        in_specs += [
            pl.BlockSpec((1, 1, ht, tkp, dd), kv_index_p,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, ht, tkp, dd), kv_index_p,
                         memory_space=pltpu.VMEM),
        ]
        operands += [pref_k, pref_v]
        if int8:
            in_specs += [
                pl.BlockSpec((1, 1, ht, 1, tkp), kv_index_p,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, ht, 1, tkp), kv_index_p,
                             memory_space=pltpu.VMEM),
            ]
            operands += [pref_ks, pref_vs]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (ht, tq, dd), lambda i, s: (i, 0, 0), memory_space=pltpu.VMEM
        ),
    )
    out = pl.pallas_call(
        functools.partial(
            _decode_kernel_paired, scale=scale, ragged=ragged, ht=ht,
            hp=hp_c, tq=tq, int8=int8, prefix_len=prefix_len,
        ),
        out_shape=jax.ShapeDtypeStruct((hp, tq, dd), q.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * hq * (tk + tkp) * d * tq,
            bytes_accessed=2 * hp * (tk + tkp) * dd * (1 if int8 else 2)
            + b * hq * tq * d * 2,
            transcendentals=b * hq * tq * (tk + tkp),
        ),
    )(scalars, *operands)
    # unpair: (b*hp_c, tq, pf*d) rows hold pf heads side by side on lanes;
    # with Tq=1 the unpair is a pure reshape (size-1 axis swap is free)
    return (
        out.reshape(b, hp_c, tq, pf, d)
        .transpose(0, 1, 3, 2, 4)
        .reshape(b, hq, tq, d)
    )


def _decode_kernel_stacked(scalars_ref, q_ref, k_ref, v_ref, o_ref, *, scale):
    """Single-token or small-SPAN decode attention over one stacked-cache
    layer (plain, non-paired layout). Query row i of the (HT, Tq, D) block
    sits at absolute position pos+i."""
    pos = scalars_ref[0]
    prefix = scalars_ref[1]

    q = q_ref[...]  # (HT, Tq, D)
    k = k_ref[0, 0]  # (HT, T, D)
    v = v_ref[0, 0]

    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (HT, Tq, T)
    s = s * scale
    cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
    if q_ref.shape[1] == 1:
        qpos = pos
    else:
        qpos = pos + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    mask = (cols <= qpos) | ((qpos < prefix) & (cols < prefix))
    s = jnp.where(mask, s, jnp.float32(-1e30))
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(v.dtype)
    o_ref[...] = jax.lax.dot_general(
        p, v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


def _decode_kernel_stacked_ragged(
    scalars_ref, q_ref, k_ref, v_ref, *rest, scale, ht, hq, prefix_len=0
):
    """Per-row-position variant for continuous batching: scalars =
    [prefix, layer, pos_0, ..., pos_{B-1}[, pid_0, ..., pid_{B-1}]]; this
    program's batch row is derived from the program index. Query row i of
    a (HT, Tq, D) span block sits at position pos_b + i (speculative
    serving verify). With `prefix_len`, the cache is a SUFFIX segment and
    pk/pv hold the shared image prefixes (see _decode_attention_paired)."""
    rest = list(rest)
    o_ref = rest.pop()
    pk_ref = pv_ref = None
    if prefix_len:
        pk_ref, pv_ref = rest[0], rest[1]
    prefix = scalars_ref[0]
    i = pl.program_id(0)
    bi = (i * ht) // hq
    pos = scalars_ref[2 + bi]

    q = q_ref[...]  # (HT, Tq, D)
    k = k_ref[0, 0]  # (HT, T, D)
    v = v_ref[0, 0]

    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    s = s * scale
    cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
    if q_ref.shape[1] == 1:
        qpos = pos
    else:
        qpos = pos + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    if prefix_len:
        mask = (prefix_len + cols) <= qpos
        s = jnp.where(mask, s, jnp.float32(-1e30))
        pk = pk_ref[0, 0]
        pv = pv_ref[0, 0]
        sp = jax.lax.dot_general(
            q, pk, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale
        colsp = jax.lax.broadcasted_iota(jnp.int32, sp.shape, 2)
        if q_ref.shape[1] == 1:
            qpos_p = pos
        else:
            qpos_p = pos + jax.lax.broadcasted_iota(jnp.int32, sp.shape, 1)
        maskp = (colsp <= qpos_p) & (colsp < prefix_len)
        sp = jnp.where(maskp, sp, jnp.float32(-1e30))
        tp = sp.shape[2]
        s_all = jnp.concatenate([sp, s], axis=-1)
        m = jnp.max(s_all, axis=-1, keepdims=True)
        p_all = jnp.exp(s_all - m)
        p_all = p_all / jnp.sum(p_all, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p_all[..., :tp].astype(pv.dtype), pv,
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) + jax.lax.dot_general(
            p_all[..., tp:].astype(v.dtype), v,
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        o_ref[...] = o.astype(o_ref.dtype)
        return
    mask = (cols <= qpos) | ((qpos < prefix) & (cols < prefix))
    s = jnp.where(mask, s, jnp.float32(-1e30))
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(v.dtype)
    o_ref[...] = jax.lax.dot_general(
        p, v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


def _decode_kernel_stacked_gqa(
    scalars_ref, q_ref, k_ref, v_ref, o_ref, *, scale, rep
):
    pos = scalars_ref[0]
    prefix = scalars_ref[1]

    q = q_ref[...][:, 0, :]  # (rep, D)
    k = k_ref[0, 0, 0]  # (T, D)
    v = v_ref[0, 0, 0]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    s = s * scale
    cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    mask = (cols <= pos) | ((pos < prefix) & (cols < prefix))
    s = jnp.where(mask, s, jnp.float32(-1e30))
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(v.dtype)
    o = jnp.dot(p, v, preferred_element_type=jnp.float32)
    o_ref[...] = o[:, None, :].astype(o_ref.dtype)


def attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    pos,
    prefix,
    force_xla: bool = False,
    real_rows: Optional[int] = None,
) -> jax.Array:
    """Dispatch: Pallas kernels on TPU, masked-XLA sdpa elsewhere
    (tests run the CPU path; kernel correctness is tested via interpret).
    k/v may have fewer heads than q (GQA): the decode kernel resolves the
    group mapping in its index map; other paths repeat here.

    `real_rows`: caller's promise that query rows >= real_rows are dead
    padding whose outputs it discards — lets the flash kernel keep its
    row-independent-mask fast path for token-padded bidirectional planes
    (the ViT runs its whole layer stack at a 128-aligned token count)."""
    hq, hkv = q.shape[1], k.shape[1]
    if not force_xla and _use_pallas():
        if q.shape[2] == 1:
            return decode_attention(q, k, v, pos, prefix)
        if hq != hkv:
            rep = hq // hkv
            k = jnp.repeat(k, rep, axis=1)
            v = jnp.repeat(v, rep, axis=1)
        return flash_attention(q, k, v, pos, prefix, real_rows=real_rows)

    from .layers import sdpa

    if hq != hkv:
        rep = hq // hkv
        k = jnp.repeat(k, rep, axis=1)
        v = jnp.repeat(v, rep, axis=1)
    tq, tk = q.shape[2], k.shape[2]
    rows = pos + jnp.arange(tq, dtype=jnp.int32)[:, None]
    cols = jnp.arange(tk, dtype=jnp.int32)[None, :]
    mask = (cols <= rows) | ((rows < prefix) & (cols < prefix))
    return sdpa(q, k, v, mask[None, None])
