"""Primitive NN ops on jnp arrays.

Functional equivalents of the reference primitives
(/root/reference/moondream/torch/layers.py:24-166): tanh-GELU, linear,
layer-norm, MLP, and bidirectional multi-head attention. Parameters are plain
pytrees (dicts of jnp arrays). Weight layout convention is (in, out) —
activations multiply as `x @ w` — i.e. the transpose of torch's nn.Linear;
the checkpoint loader performs the transpose once at load time so the hot
path never does.

Numerics policy (TPU): parameters and activations are bfloat16; layer norm,
softmax, and matmul accumulation run in float32 (MXU native), matching the
effective precision of torch's bf16 F.layer_norm / SDPA closely enough for
greedy-token parity.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def gelu_approx(x: jax.Array) -> jax.Array:
    # Tanh-approximated GELU (reference layers.py:24-25).
    return jax.nn.gelu(x, approximate=True)


def _q8_act(x: jax.Array):
    """Dynamic per-row symmetric int8 quantization of activations.
    Returns (codes int8, scale fp32 broadcastable over the output)."""
    xf = x.astype(jnp.float32)
    a = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-6) / 127.0
    return jnp.round(xf / a).astype(jnp.int8), a


def linear(x: jax.Array, w: dict) -> jax.Array:
    """y = x @ w['w'] + w['b'], accumulating in fp32 on the MXU.

    When `w` carries int8-quantized weights ({'wq': int8 (in, out),
    'scale': fp32 (1, out)} from models.vision.quantize_vision_params),
    the product runs as int8 x int8 -> int32 — the MXU's int8 path is 2x
    the bf16 rate on v5e — with dynamically quantized activations, then
    rescales by (row amax/127) * per-channel weight scale.

    With STATIC activation scales ('inv_a' fp32 (1, in) present, from
    models.vision.quantize_vision_params(act_stats=...)), the runtime
    quantization is one fused elementwise multiply+round+clip — no
    per-row amax reduction pass over the activation plane (the cost that
    made dynamic int8 break even with bf16 end-to-end, BASELINE.md
    round-3 findings); the per-tensor activation scale and any
    per-channel equalizer are folded into 'inv_a' and 'scale' offline."""
    if "wq" in w:
        if "inv_a" in w:
            codes = jnp.clip(
                jnp.round(x.astype(jnp.float32) * w["inv_a"]), -127, 127
            ).astype(jnp.int8)
        else:
            codes, a = _q8_act(x)
        y = jax.lax.dot_general(
            codes, w["wq"],
            (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        y = y.astype(jnp.float32) * w["scale"]
        if "inv_a" not in w:
            y = y * a
        if w.get("b") is not None:
            y = y + w["b"].astype(jnp.float32)
        return y.astype(x.dtype)
    y = jnp.dot(x, w["w"], preferred_element_type=jnp.float32)
    if w.get("b") is not None:
        y = y + w["b"].astype(jnp.float32)
    return y.astype(x.dtype)


def lora_delta(x: jax.Array, pair: dict) -> jax.Array:
    """Low-rank residual (x @ Aᵀ) @ Bᵀ accumulated in fp32.

    LoRA checkpoints store A/B in torch (out, in) layout
    (reference text.py:31-32), so both factors multiply transposed.
    """
    a = jnp.dot(x, pair["A"].T, preferred_element_type=jnp.float32)
    return jnp.dot(a, pair["B"].T, preferred_element_type=jnp.float32)


def lora_linear(x: jax.Array, w: dict, lora: Optional[dict]) -> jax.Array:
    """Linear with an optional low-rank residual: y += (x @ A^T) @ B^T."""
    y = linear(x, w)
    if lora is not None:
        y = y + lora_delta(x, lora).astype(y.dtype)
    return y


def layer_norm(x: jax.Array, w: dict, eps: float = 1e-5) -> jax.Array:
    """LayerNorm over the trailing dim, fp32 statistics (layers.py:118-119)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    normed = (xf - mean) * jax.lax.rsqrt(var + eps)
    out = normed * w["weight"].astype(jnp.float32) + w["bias"].astype(jnp.float32)
    return out.astype(x.dtype)


def mlp(x: jax.Array, w: dict, lora: Optional[dict] = None) -> jax.Array:
    """fc1 -> tanh-GELU -> fc2, with optional per-layer LoRA adds
    (reference layers.py:129-146)."""
    if lora is not None:
        x = lora_linear(x, w["fc1"], lora.get("fc1"))
        x = gelu_approx(x)
        x = lora_linear(x, w["fc2"], lora.get("fc2"))
    else:
        x = linear(x, w["fc1"])
        x = gelu_approx(x)
        x = linear(x, w["fc2"])
    return x


def sdpa(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Scaled dot-product attention over (..., heads, seq, head_dim).

    fp32 logits + softmax; the probability @ value matmul also accumulates in
    fp32. GQA is expressed by the caller repeating K/V heads (XLA folds the
    broadcast into the einsum). `mask` is boolean, True = attend.
    """
    head_dim = q.shape[-1]
    scale = 1.0 / (head_dim**0.5)
    logits = jnp.einsum(
        "...hqd,...hkd->...hqk", q, k, preferred_element_type=jnp.float32
    )
    logits = logits * scale
    if mask is not None:
        logits = jnp.where(mask, logits, jnp.float32(-1e30))
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "...hqk,...hkd->...hqd",
        probs.astype(v.dtype),
        v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(q.dtype)


def attn(
    x: jax.Array, w: dict, n_heads: int, n_real: Optional[int] = None
) -> jax.Array:
    """Bidirectional MHA with fused QKV, used by the ViT
    (reference layers.py:155-166). x: (B, T, D). Runs the fused Pallas
    flash kernel on TPU (pos=0, prefix=T makes the unified mask rule fully
    bidirectional); XLA sdpa elsewhere.

    `n_real`: when the caller runs the encoder over a token-padded plane
    (tokens >= n_real are dead padding whose outputs it discards), pass the
    real token count — rows attend only cols < n_real, so dead tokens never
    leak into real ones, and the kernel keeps its row-independent-mask fast
    path."""
    return linear(attn_core(x, w, n_heads, n_real), w["proj"])


def attn_core(
    x: jax.Array, w: dict, n_heads: int, n_real: Optional[int] = None
) -> jax.Array:
    """The attention body up to (but excluding) the output projection —
    split out so calibration can observe the projection's input
    (models.vision.collect_vision_act_stats)."""
    from .attention import attention

    bsz, seq, d_model = x.shape
    head_dim = d_model // n_heads

    qkv = linear(x, w["qkv"])  # (B, T, 3D)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(bsz, seq, n_heads, head_dim).transpose(0, 2, 1, 3)
    k = k.reshape(bsz, seq, n_heads, head_dim).transpose(0, 2, 1, 3)
    v = v.reshape(bsz, seq, n_heads, head_dim).transpose(0, 2, 1, 3)

    prefix = seq if n_real is None else n_real
    out = attention(q, k, v, pos=0, prefix=prefix, real_rows=prefix)
    return out.transpose(0, 2, 1, 3).reshape(bsz, seq, d_model)
