"""int4 runtime quantization: pack/unpack + fused dequant-matmul kernel.

The reference ships int4 group-128 checkpoints and either dequantizes on
load or re-quantizes through torchao CUDA kernels (reference
layers.py:38-109). Here int4 is a first-class runtime format on TPU:

  * weights are kept packed in HBM (two nibbles per uint8, groups of 128
    along the input dim with per-group scale/zero-point), cutting decode's
    dominant weight traffic 4x vs bf16;
  * the matmul kernel fuses unpack -> dequant -> MXU dot in VMEM, reading
    each packed block exactly once per step;
  * stacked per-layer weights (L, K/2, N) are passed WHOLE with the layer
    selected by a scalar-prefetch index map (same pattern as
    decode_attention_cached) so the per-layer scan never slices — a sliced
    operand feeding an opaque kernel would materialize a copy per layer
    per token.

Packing convention (ours, independent of the checkpoint format): byte row
r of `packed` holds the nibbles for input rows r (high) and r + K/2 (low),
so the kernel reconstructs the dense (K, N) weight with two block writes
and no interleave. `quantize_weight` produces it from any dense weight;
`weights.load_params(..., runtime_int4=True)` converts checkpoints.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .attention import _ceil_to, _use_pallas

GROUP = 128


def quantize_weight(w: np.ndarray, group: Optional[int] = None) -> dict:
    """Quantize a dense (..., K, N) weight to int4 groups along K.

    Returns {"packed": uint8 (..., K/2, N), "scale": f32 (..., K/group, N),
    "zero": f32 (..., K/group, N)}. Asymmetric per-(group, column)
    quantization to the 0..15 nibble range. The group size defaults to 128
    (the reference checkpoint granularity, layers.py:47) and shrinks to the
    largest compatible divisor for small test dims; consumers derive it as
    K // scale.shape[-2].
    """
    w = np.asarray(w, dtype=np.float32)
    *lead, K, N = w.shape
    if group is None:
        group = min(GROUP, K // 2)
        while group > 1 and (K % (2 * group) or K % group):
            group //= 2
    assert K % (2 * group) == 0, f"K={K} not divisible by 2*group={group}"
    g = w.reshape(*lead, K // group, group, N)
    w_min = g.min(axis=-2)
    w_max = g.max(axis=-2)
    scale = np.maximum((w_max - w_min) / 15.0, 1e-8)
    q = np.clip(np.round((g - w_min[..., None, :]) / scale[..., None, :]), 0, 15)
    q = q.reshape(*lead, K, N).astype(np.uint8)
    hi = q[..., : K // 2, :]
    lo = q[..., K // 2 :, :]
    packed = ((hi << 4) | lo).astype(np.uint8)
    return {
        "packed": packed,
        "scale": scale.astype(np.float32),
        "zero": w_min.astype(np.float32),  # dequant: q * scale + zero(=min)
    }


def quantize_weight_jax(w: jax.Array, group: Optional[int] = None) -> dict:
    """Device-side (jittable) version of `quantize_weight` — identical
    packing and rounding semantics on jnp arrays."""
    w = w.astype(jnp.float32)
    *lead, K, N = w.shape
    if group is None:
        group = min(GROUP, K // 2)
        while group > 1 and (K % (2 * group) or K % group):
            group //= 2
    assert K % (2 * group) == 0, f"K={K} not divisible by 2*group={group}"
    g = w.reshape(*lead, K // group, group, N)
    w_min = g.min(axis=-2)
    w_max = g.max(axis=-2)
    scale = jnp.maximum((w_max - w_min) / 15.0, 1e-8)
    q = jnp.clip(
        jnp.round((g - w_min[..., None, :]) / scale[..., None, :]), 0, 15
    )
    q = q.reshape(*lead, K, N).astype(jnp.uint8)
    hi = q[..., : K // 2, :]
    lo = q[..., K // 2 :, :]
    return {
        "packed": ((hi << 4) | lo).astype(jnp.uint8),
        "scale": scale.astype(jnp.float32),
        "zero": w_min.astype(jnp.float32),
    }


def dequantize_weight(qw: dict, dtype=jnp.bfloat16) -> jax.Array:
    """Dense reconstruction (XLA path / tests). Accepts leading dims."""
    packed = jnp.asarray(qw["packed"])
    scale = jnp.asarray(qw["scale"])
    zero = jnp.asarray(qw["zero"])
    hi = (packed >> 4).astype(jnp.float32)
    lo = (packed & 0x0F).astype(jnp.float32)
    q = jnp.concatenate([hi, lo], axis=-2)  # (..., K, N)
    *lead, K, N = q.shape
    groups = scale.shape[-2]
    g = q.reshape(*lead, groups, K // groups, N)
    w = g * scale[..., None, :] + zero[..., None, :]
    return w.reshape(*lead, K, N).astype(dtype)


def _q_matmul_kernel(
    scalars_ref, x_ref, p_ref, s_ref, z_ref, o_ref, *, k: int, stacked: bool
):
    """One N-tile: unpack (K/2, Nt) bytes -> dense (K, Nt) bf16 -> x @ w."""
    if stacked:
        p = p_ref[0]  # (K/2, Nt) uint8
        s = s_ref[0]  # (K/GROUP, Nt) f32
        z = z_ref[0]
    else:
        p = p_ref[...]
        s = s_ref[...]
        z = z_ref[...]
    x = x_ref[...]  # (M, K) bf16

    pi = p.astype(jnp.int32)
    hi = (pi >> 4).astype(jnp.float32)  # rows 0..K/2
    lo = (pi & 0x0F).astype(jnp.float32)  # rows K/2..K
    q = jnp.concatenate([hi, lo], axis=0)  # (K, Nt)

    groups = s.shape[0]
    glen = k // groups
    nt = q.shape[-1]
    s_full = jnp.broadcast_to(s[:, None, :], (groups, glen, nt)).reshape(k, nt)
    z_full = jnp.broadcast_to(z[:, None, :], (groups, glen, nt)).reshape(k, nt)
    w = (q * s_full + z_full).astype(x.dtype)

    o_ref[...] = jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


def _q_matmul_kernel_gd(
    scalars_ref, x_ref, p_ref, s_ref, z_ref, o_ref, *, k: int, stacked: bool,
    bittrick: bool,
):
    """Group-dot dequant matmul: the affine (scale, zero) never touches the
    (K, Nt) weight domain.

    The legacy kernel dequantizes every weight element in fp32
    (unpack -> broadcast scale/zero over the group axis -> mul-add -> cast),
    ~6 VPU passes over 1.2G elements per 2B decode step — that VPU work,
    not HBM traffic, capped int4 decode at 339 tok/s. Here the matmul is
    split per quantization group g:

        out = sum_g (x_g @ q_g) * s[g]  +  (sum_k x_g) @ zero
              [MXU, raw codes]           [(M,G) @ (G,Nt) MXU]

    so the per-element work is ONLY the nibble unpack + cast; scale lands
    on (M, Nt) partials and zero-points on per-group activation sums.

    bittrick: splice the nibble into an fp32 mantissa via bitcast
    (X = bitcast(0x43800000 | q<<19) = 256 + 16q, exact in bf16 — 4
    mantissa bits) instead of an int->float cast; the kernel rescales
    s/16 and z-16s, so the stored checkpoint format is unchanged.
    """
    p = p_ref[0] if stacked else p_ref[...]
    s = s_ref[0] if stacked else s_ref[...]
    z = z_ref[0] if stacked else z_ref[...]
    x = x_ref[...]  # (M, K) bf16

    if bittrick:
        s_eff = s * jnp.float32(1.0 / 16.0)
        z_eff = z - 16.0 * s
    else:
        s_eff = s
        z_eff = z

    groups = s.shape[0]
    glen = k // groups
    half = groups // 2  # groups in the hi-nibble half (pack puts code rows
    # 0..K/2 in the high nibbles of packed rows 0..K/2)
    m = x.shape[0]
    nt = p.shape[-1]
    acc = jnp.zeros((m, nt), jnp.float32)
    xs = []
    # per-group unpack: the live dequant scratch is one (glen, Nt) slab,
    # not the whole (K, Nt) matrix — a full materialization blows the
    # 16MB VMEM stack at prefill tile sizes (M=256, K=8192)
    for g in range(groups):
        if g < half:
            pg = p[g * glen : (g + 1) * glen].astype(jnp.int32)
            code = pg >> 4
        else:
            pg = p[(g - half) * glen : (g - half + 1) * glen].astype(jnp.int32)
            code = pg & 0x0F
        if bittrick:
            qg = jax.lax.bitcast_convert_type(
                (code << 19) | 0x43800000, jnp.float32
            ).astype(jnp.bfloat16)
        else:
            qg = code.astype(jnp.float32).astype(jnp.bfloat16)
        xg = x[:, g * glen : (g + 1) * glen]
        part = jax.lax.dot_general(
            xg, qg, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = acc + part * s_eff[g][None, :]
        xs.append(jnp.sum(xg.astype(jnp.float32), axis=1, keepdims=True))
    xsum = jnp.concatenate(xs, axis=1)  # (M, G)
    acc = acc + jax.lax.dot_general(
        xsum, z_eff, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[...] = acc.astype(o_ref.dtype)


def _pick_n_tile(k: int, n: int) -> int:
    """Largest N tile whose working set (packed + dequant scratch, double
    buffered) stays in the VMEM budget."""
    budget = 10 * 1024 * 1024
    for nt in (1024, 512, 256, 128):
        if n % nt:
            continue
        bytes_needed = 2 * (k // 2 * nt  # packed
                            + k * nt * 2  # dequant bf16
                            + 2 * (k // GROUP) * nt * 4)  # scale+zero f32
        if bytes_needed <= budget:
            return nt
    return 128


def quantized_matmul(
    x: jax.Array,
    qw: dict,
    layer=None,
    interpret: bool = False,
) -> jax.Array:
    """x (M, K) @ int4-packed weight -> (M, N) in x.dtype.

    qw: {"packed", "scale", "zero"} with optional leading layer dim; pass
    `layer` (traced scalar) to select it — the stacked arrays are passed
    whole and indexed in the kernel's block index map.
    """
    stacked = qw["packed"].ndim == 3
    if stacked:
        L, half_k, n = qw["packed"].shape
    else:
        half_k, n = qw["packed"].shape
    k = 2 * half_k
    m = x.shape[0]

    if not (_use_pallas() or interpret):
        w = dequantize_weight(qw, x.dtype)
        if stacked:
            w = jax.lax.dynamic_index_in_dim(w, layer, 0, keepdims=False)
        return jnp.dot(x, w, preferred_element_type=jnp.float32).astype(x.dtype)

    if m >= 512 and not interpret:
        # Prefill-sized M: the kernel's grid re-unpacks the same weight
        # tile for every M block (M=12k rows -> ~96x redundant dequant VPU
        # work). Slice the packed layer, dequantize ONCE in XLA (one pass,
        # 25MB bf16 materialized), and run the dot at full MXU throughput.
        # Decode/serving (M <= 32) stays on the fused kernel, where weights
        # are read exactly once and never materialized.
        if stacked:
            qw_l = {
                "packed": jax.lax.dynamic_index_in_dim(
                    qw["packed"], layer, 0, keepdims=False
                ),
                "scale": jax.lax.dynamic_index_in_dim(
                    qw["scale"], layer, 0, keepdims=False
                ),
                "zero": jax.lax.dynamic_index_in_dim(
                    qw["zero"], layer, 0, keepdims=False
                ),
            }
        else:
            qw_l = qw
        w = dequantize_weight(qw_l, x.dtype)
        return jnp.dot(x, w, preferred_element_type=jnp.float32).astype(x.dtype)

    nt = _pick_n_tile(k, n)
    groups = qw["scale"].shape[-2]
    scalars = jnp.asarray([0 if layer is None else layer], jnp.int32)

    # tile M for big prefill batches; decode (M <= ~16) is one tile.
    # K=8192 halves the M tile: the (mt, K) x block double-buffers against
    # a 16MB VMEM stack alongside the packed weights and group scratch.
    mt = min(_ceil_to(m, 8), 256 if k <= 4096 else 128)
    m_pad = _ceil_to(m, mt)
    if m_pad != m:
        x = jnp.pad(x, ((0, m_pad - m), (0, 0)))

    if stacked:
        in_specs = [
            pl.BlockSpec((mt, k), lambda mi, ni, s: (mi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, half_k, nt), lambda mi, ni, s: (s[0], 0, ni),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, groups, nt), lambda mi, ni, s: (s[0], 0, ni),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, groups, nt), lambda mi, ni, s: (s[0], 0, ni),
                memory_space=pltpu.VMEM,
            ),
        ]
    else:
        in_specs = [
            pl.BlockSpec((mt, k), lambda mi, ni, s: (mi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (half_k, nt), lambda mi, ni, s: (0, ni),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (groups, nt), lambda mi, ni, s: (0, ni),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (groups, nt), lambda mi, ni, s: (0, ni),
                memory_space=pltpu.VMEM,
            ),
        ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(m_pad // mt, n // nt),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (mt, nt), lambda mi, ni, s: (mi, ni), memory_space=pltpu.VMEM
        ),
    )
    import os as _os

    if _os.environ.get("MOONDREAM_INT4_LEGACY"):
        kernel = functools.partial(_q_matmul_kernel, k=k, stacked=stacked)
    else:
        kernel = functools.partial(
            _q_matmul_kernel_gd, k=k, stacked=stacked,
            bittrick=_os.environ.get("MOONDREAM_INT4_UNPACK", "cast")
            == "bitcast",
        )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((m_pad, n), x.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * k * n,
            bytes_accessed=half_k * n + m_pad * k * 2 + m_pad * n * 2,
            transcendentals=0,
        ),
    )(scalars, x, qw["packed"], qw["scale"], qw["zero"])
    return out[:m] if m_pad != m else out
