"""Phi-style text decoder (functional JAX).

Behavioral parity with the reference decoder
(/root/reference/moondream/torch/text.py:12-221):

  * parallel attention + MLP residual sharing a single LayerNorm per block:
    ``x = x + attn(ln(x)) + mlp(ln(x))`` (text.py:145-158)
  * fused-QKV attention, GQA-capable (n_kv_heads <= n_heads), partial RoPE
    (rot_dim = dim // (2*n_heads), non-interleaved half-split)
  * bidirectional attention over the first `prefix_attn` (=730) positions
    (1 BOS + 729 image tokens), causal after (text.py:106-110)
  * LM head applies the final LayerNorm then projects to vocab; the decode
    path evaluates only the last position (text.py:163-173)

TPU-first design (not a port):
  * Per-block weights are stacked on a leading layer axis; the block loop is
    a `lax.scan` whose carry is the hidden state and whose per-layer inputs
    are (block weights, KV slice, optional LoRA slice). One compiled block
    body, O(1) compile time in depth.
  * The KV cache is an explicit pytree of arrays shaped
    (n_layers, batch, n_kv_heads, max_context, head_dim), threaded through
    jitted calls and donated by the engine, replacing the reference's
    in-place nn.Module buffer mutation (moondream.py:62-78).
  * Cache writes are contiguous `dynamic_update_slice`s at the current
    position (prefill writes a block, decode writes one slot).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import TextConfig
from ..ops.attention import attention
from ..ops.layers import layer_norm, linear, lora_delta, lora_linear, mlp, sdpa
from ..ops.rope import apply_rotary_emb


def kv_pair_factor(config: TextConfig) -> int:
    """How many adjacent KV heads share one cache row on the lane axis.

    TPU VMEM tiles bf16 as (16, 128) lanes: a (T, 64) per-head cache slab
    half-fills every tile, halving effective HBM bandwidth in the decode
    kernel (measured 258 -> 434 GB/s at the 2B batch-8 shape). Packing two
    adjacent heads side by side makes cache rows 128 lanes wide. MHA only
    (both model configs); disabled under GSPMD sharding (xla_attn), where
    the cache head axis must stay splittable across `tp`.
    """
    if config.xla_attn or config.n_kv_heads != config.n_heads:
        return 1
    if config.n_kv_heads % 2 or config.head_dim * 2 > 128:
        return 1
    return 2


def pair_kv(x: jax.Array, pf: int) -> jax.Array:
    """(B, H, T, Dh) -> (B, H/pf, T, pf*Dh): head pf*i+j on lane block j."""
    if pf == 1:
        return x
    b, h, t, dh = x.shape
    return (
        x.reshape(b, h // pf, pf, t, dh)
        .transpose(0, 1, 3, 2, 4)
        .reshape(b, h // pf, t, pf * dh)
    )


def unpair_kv(x: jax.Array, pf: int) -> jax.Array:
    """Inverse of pair_kv: (B, H/pf, T, pf*Dh) -> (B, H, T, Dh)."""
    if pf == 1:
        return x
    b, hp, t, dd = x.shape
    dh = dd // pf
    return (
        x.reshape(b, hp, t, pf, dh)
        .transpose(0, 1, 3, 2, 4)
        .reshape(b, hp * pf, t, dh)
    )


class KVCache(NamedTuple):
    """Per-model KV cache: arrays of shape (L, B, H_kv/pf, T, pf*Dh) where
    pf = kv_pair_factor(config) (1 for GQA / sharded configs — then the
    layout is the plain (L, B, H_kv, T, Dh)).

    With config.kv_int8, `k`/`v` hold int8 codes and `ks`/`vs` hold the
    per-(token, cache-row) fp32 scales stored TRANSPOSED as
    (L, B, H_kv/pf, 1, T): x ~ code * scale. Decode's dominant HBM traffic
    at large batch is the cache read; int8 halves it. The T-on-lanes scale
    layout matches the decode kernel's (heads, T) score plane, so the
    kernel folds k-scales into scores and v-scales into softmax weights
    (exact: attention is linear in each row's scale) instead of
    dequantizing the (T, 128) code blocks element-wise."""

    k: jax.Array
    v: jax.Array
    ks: Optional[jax.Array] = None
    vs: Optional[jax.Array] = None

    @classmethod
    def create(
        cls,
        config: TextConfig,
        batch: int = 1,
        dtype=jnp.bfloat16,
        slots: int = None,
    ) -> "KVCache":
        """`slots` right-sizes the cache below max_context when the caller
        knows the session's end position (serving-path memory saver: a
        2048-slot 2B batch-8 cache is 3.2GB; a 1024-slot one is half that)."""
        pf = kv_pair_factor(config)
        shape = (
            config.n_layers,
            batch,
            config.n_kv_heads // pf,
            slots if slots is not None else config.max_context,
            pf * config.head_dim,
        )
        if config.kv_int8:
            sshape = shape[:-2] + (1, shape[-2])
            return cls(
                k=jnp.zeros(shape, jnp.int8),
                v=jnp.zeros(shape, jnp.int8),
                ks=jnp.zeros(sshape, jnp.float32),
                vs=jnp.zeros(sshape, jnp.float32),
            )
        return cls(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype))


def quantize_kv(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Per-row symmetric int8: x (..., T, D) -> (codes int8, scale f32
    (..., T, 1)); x ~ codes * scale. Cache writers transpose the scale to
    the (..., 1, T) storage layout via jnp.swapaxes."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.maximum(amax / 127.0, 1e-8)
    codes = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
    return codes.astype(jnp.int8), scale


def dequantize_kv(codes: jax.Array, scale: jax.Array, dtype=jnp.bfloat16):
    """codes (..., T, D) * scale (..., T, 1) in the target dtype directly
    (no fp32 intermediates — this runs over full cache spans in prefill)."""
    return codes.astype(dtype) * scale.astype(dtype)


def slice_cache_span(
    kv: KVCache, span, batch=slice(None), layer=slice(None)
) -> KVCache:
    """Slice [0, span) of the time axis (and optionally a batch range) out
    of a cache pytree — the time axis is -2 for codes, -1 for the
    transposed scales."""
    sl = lambda a: a[layer, batch, :, :span, :]
    sls = lambda a: None if a is None else a[layer, batch, :, :, :span]
    return KVCache(k=sl(kv.k), v=sl(kv.v), ks=sls(kv.ks), vs=sls(kv.vs))


def slice_cache_span_from(
    kv: KVCache, start: int, span: int, batch=slice(None)
) -> KVCache:
    """Slice [start, start + span) of the time axis out of a cache pytree
    (static offsets). Prefix-shared serving slices the prompt SUFFIX out
    of a prefilled buffer — the [BOS, image] prefix lives in the shared
    prefix pool instead (engine/serving.py:_ragged_attn)."""
    sl = lambda a: a[:, batch, :, start : start + span, :]
    sls = lambda a: (
        None if a is None else a[:, batch, :, :, start : start + span]
    )
    return KVCache(k=sl(kv.k), v=sl(kv.v), ks=sls(kv.ks), vs=sls(kv.vs))


def text_encoder(input_ids: jax.Array, w: dict) -> jax.Array:
    """Token embedding lookup (reference text.py:12-13). (B, T) -> (B, T, D)."""
    return w["wte"][input_ids]


def _q_lin(
    x: jax.Array,
    qw: dict,
    b: Optional[jax.Array],
    layer: jax.Array,
    lora_pair: Optional[dict] = None,
) -> jax.Array:
    """int4 linear over stacked per-layer packed weights (+ bias + LoRA).
    x: (..., K); qw: quantized stacked tree from ops.quant."""
    from ..ops.quant import quantized_matmul

    lead = x.shape[:-1]
    y = quantized_matmul(x.reshape(-1, x.shape[-1]), qw, layer)
    y = y.reshape(*lead, -1)
    if b is not None:
        y = (y.astype(jnp.float32) + b.astype(jnp.float32)).astype(x.dtype)
    if lora_pair is not None:
        a = jnp.dot(x, lora_pair["A"].T, preferred_element_type=jnp.float32)
        y = y + jnp.dot(
            a, lora_pair["B"].T, preferred_element_type=jnp.float32
        ).astype(y.dtype)
    return y


def quantize_text_params(text_params: dict) -> dict:
    """Convert dense stacked block weights to the int4 runtime format.

    Returns a new text param tree where blocks/{attn,mlp}/*/w are replaced
    by a `blocks_q` tree of {packed, scale, zero} stacked arrays (biases
    and norms stay dense; wte / lm_head stay bf16). The decode path reads
    packed weights directly through the fused dequant-matmul kernel —
    the runtime analog of the reference's int4 checkpoints
    (layers.py:47-77) with torchao replaced by a Pallas kernel.

    Quantization itself runs as a jitted device computation (the 2B block
    weights are ~1.2G elements; host numpy takes minutes on a thin host).
    """
    from ..ops.quant import quantize_weight_jax

    blocks = text_params["blocks"]
    blocks_q = {"attn": {}, "mlp": {}}
    new_blocks = {
        "ln": blocks["ln"],
        "attn": {},
        "mlp": {},
    }
    quantize = jax.jit(quantize_weight_jax)
    for mod, names in (("attn", ("qkv", "proj")), ("mlp", ("fc1", "fc2"))):
        for nm in names:
            blocks_q[mod][nm] = quantize(jnp.asarray(blocks[mod][nm]["w"]))
            new_blocks[mod][nm] = {"b": blocks[mod][nm]["b"]}
    out = dict(text_params)
    out["blocks"] = new_blocks
    out["blocks_q"] = blocks_q
    return out


def quantize_text_params_int8(text_params: dict) -> dict:
    """Convert dense stacked block weights to the int8 w8a8 runtime format.

    Each blocks/{attn,mlp}/{qkv,proj,fc1,fc2} entry {"w": (L, K, N),
    "b": ...} becomes {"wq": int8 (L, K, N), "scale": fp32 (L, 1, N),
    "b": ...} — per-output-channel symmetric codes that ride the layer
    scan's xs exactly like the dense weights and dispatch through
    ops.layers.linear's int8 branch (int8 x int8 -> int32 on the MXU at
    2x the bf16 rate, activations dynamically quantized per row).

    Rationale vs the int4 path (quantize_text_params): the int4
    group-dot kernel is shaped for decode's M=8-16 row panels and loses
    MXU utilization at the speculative verify's M = B*k rows
    (BASELINE.md round-4 dissection). int8 halves the per-step HBM
    weight read (2.8 -> 1.4 GB on 2B) while KEEPING native-MXU matmuls
    at any M. wte / lm_head / norms / biases stay bf16, mirroring the
    reference's text-only quantization scope (torch/weights.py:183-206).
    """
    blocks = text_params["blocks"]
    new_blocks = {"ln": blocks["ln"], "attn": {}, "mlp": {}}

    @jax.jit
    def quantize(w):
        wf = jnp.asarray(w, jnp.float32)
        s = jnp.maximum(jnp.max(jnp.abs(wf), axis=-2, keepdims=True), 1e-8)
        s = s / 127.0
        return jnp.round(wf / s).astype(jnp.int8), s

    for mod, names in (("attn", ("qkv", "proj")), ("mlp", ("fc1", "fc2"))):
        for nm in names:
            wq, scale = quantize(jnp.asarray(blocks[mod][nm]["w"]))
            new_blocks[mod][nm] = {
                "wq": wq, "scale": scale, "b": blocks[mod][nm]["b"],
            }
    out = dict(text_params)
    out["blocks"] = new_blocks
    return out


def _split_qkv(qkv: jax.Array, config: TextConfig) -> Tuple[jax.Array, ...]:
    b, t, _ = qkv.shape
    q_dim = config.n_heads * config.head_dim
    kv_dim = config.n_kv_heads * config.head_dim
    q = qkv[..., :q_dim].reshape(b, t, config.n_heads, config.head_dim)
    k = qkv[..., q_dim : q_dim + kv_dim].reshape(
        b, t, config.n_kv_heads, config.head_dim
    )
    v = qkv[..., q_dim + kv_dim :].reshape(b, t, config.n_kv_heads, config.head_dim)
    # -> (B, H, T, Dh)
    return (
        q.transpose(0, 2, 1, 3),
        k.transpose(0, 2, 1, 3),
        v.transpose(0, 2, 1, 3),
    )


def attn_with_cache(
    x: jax.Array,
    w: dict,
    freqs_cis: jax.Array,
    kv: "KVCache",
    layer: jax.Array,
    pos: jax.Array,
    prefix_len: jax.Array,
    config: TextConfig,
    lora: Optional[dict],
    kv_bound: Optional[int] = None,
    quant: Optional[dict] = None,
) -> Tuple[jax.Array, "KVCache"]:
    """One attention layer reading/updating the FULL stacked KV cache.

    x: (B, T, D) pre-normed input; kv: whole-model KVCache (head-paired,
    optionally int8 with per-row scales) with `layer` a traced index;
    pos: scalar start
    position (prefill and decode both write contiguous spans); prefix_len:
    bidirectional-prefix length (730 after an image, 0 for pure causal) —
    masking follows the unified rule in ops.attention. `kv_bound` (static)
    restricts attention to the first kv_bound cache slots.

    The cache is threaded whole (updated via dynamic_update_slice at
    (layer, pos)) rather than per-layer scan xs: an XLA-level `kv[layer]`
    slice feeding the opaque decode kernel would materialize a cache-layer
    copy per layer per token. The single-token path hands the whole cache
    to `decode_attention_cached`, whose index map selects the layer block.
    Reference semantics: text.py:16-60 with the mask of moondream.py:138-146.
    """
    from ..ops.attention import _use_pallas, decode_attention_cached

    bsz, q_len, _ = x.shape
    if quant is not None:
        qkv = _q_lin(
            x, quant["qkv"], w["qkv"]["b"], layer,
            lora.get("qkv") if lora else None,
        )
    else:
        qkv = lora_linear(x, w["qkv"], lora.get("qkv") if lora else None)
    q, k, v = _split_qkv(qkv, config)

    position_ids = pos + jnp.arange(q_len, dtype=jnp.int32)
    q = apply_rotary_emb(q, freqs_cis, position_ids, config.rope_dim)
    k = apply_rotary_emb(k, freqs_cis, position_ids, config.rope_dim)

    pf = kv.k.shape[-1] // config.head_dim  # head-paired cache layout
    int8 = kv.ks is not None
    kp = pair_kv(k, pf)
    vp = pair_kv(v, pf)
    idx = (layer, 0, 0, pos, 0)
    if int8:
        kc, ksc = quantize_kv(kp)
        vc, vsc = quantize_kv(vp)
        sidx = (layer, 0, 0, 0, pos)  # scales store T on the last axis
        kv = KVCache(
            k=jax.lax.dynamic_update_slice(kv.k, kc[None], idx),
            v=jax.lax.dynamic_update_slice(kv.v, vc[None], idx),
            ks=jax.lax.dynamic_update_slice(
                kv.ks, jnp.swapaxes(ksc, -1, -2)[None], sidx
            ),
            vs=jax.lax.dynamic_update_slice(
                kv.vs, jnp.swapaxes(vsc, -1, -2)[None], sidx
            ),
        )
    else:
        kv = KVCache(
            k=jax.lax.dynamic_update_slice(
                kv.k, kp.astype(kv.k.dtype)[None], idx
            ),
            v=jax.lax.dynamic_update_slice(
                kv.v, vp.astype(kv.v.dtype)[None], idx
            ),
        )

    # int8 decode kernel exists only for the head-paired layout (pf > 1);
    # GQA/sharded configs (pf == 1) dequantize through the XLA branch.
    # Small spans (speculative verify forwards, short prompt prefills) use
    # the same stacked-cache kernels with a query-span block — the XLA
    # branch below materializes a full cache-layer copy per layer, which
    # costs as much HBM traffic as the attention itself. NOTE this routes
    # the DEFAULT short prompt prefill through the decode-span kernel on
    # TPU (not just speculation); accumulation order differs from the
    # flash/XLA path within normal fp32-accumulate tolerance, same as
    # every other kernel-vs-XLA routing choice in this file
    # (MOONDREAM_DISABLE_PALLAS opts out of all Pallas routing).
    ragged_pos = getattr(pos, "ndim", 0) == 1
    kernel_ok = q_len == 1 or (
        q_len <= 16
        and not ragged_pos
        and config.n_kv_heads == config.n_heads
    )
    if (kernel_ok and _use_pallas() and not config.xla_attn
            and not (int8 and pf == 1)):
        out = decode_attention_cached(
            q, kv.k, kv.v, layer, pos, prefix_len, kv_bound,
            k_scale=kv.ks, v_scale=kv.vs,
        )
    else:
        k_l = jax.lax.dynamic_index_in_dim(kv.k, layer, 0, keepdims=False)
        v_l = jax.lax.dynamic_index_in_dim(kv.v, layer, 0, keepdims=False)
        if int8:
            ks_l = jax.lax.dynamic_index_in_dim(kv.ks, layer, 0, keepdims=False)
            vs_l = jax.lax.dynamic_index_in_dim(kv.vs, layer, 0, keepdims=False)
        if kv_bound is not None:
            k_l = k_l[:, :, :kv_bound]
            v_l = v_l[:, :, :kv_bound]
            if int8:
                ks_l = ks_l[:, :, :, :kv_bound]
                vs_l = vs_l[:, :, :, :kv_bound]
        if int8:
            k_l = dequantize_kv(k_l, jnp.swapaxes(ks_l, -1, -2), q.dtype)
            v_l = dequantize_kv(v_l, jnp.swapaxes(vs_l, -1, -2), q.dtype)
        k_l = unpair_kv(k_l, pf)
        v_l = unpair_kv(v_l, pf)
        out = attention(q, k_l, v_l, pos, prefix_len, force_xla=config.xla_attn)

    out = out.transpose(0, 2, 1, 3).reshape(bsz, q_len, config.dim)
    if quant is not None:
        out = _q_lin(out, quant["proj"], w["proj"]["b"], layer)
    else:
        out = linear(out, w["proj"])
    # the proj adapter reads the BLOCK INPUT x (the shared-LN output),
    # not the attention output (reference text.py:53-56)
    if lora is not None and lora.get("proj") is not None:
        out = out + lora_delta(x, lora["proj"]).astype(out.dtype)
    return out, kv


def attn_uncached(
    x: jax.Array,
    w: dict,
    freqs_cis: jax.Array,
    attn_mask: jax.Array,
    config: TextConfig,
    lora: Optional[dict] = None,
) -> jax.Array:
    """Cache-free attention for the training path (reference text.py:63-99).
    Positions are 0..T-1. `lora`: optional per-layer {"qkv"/"proj": {A, B}}
    low-rank adds (the same sites the cached path applies)."""
    bsz, q_len, _ = x.shape
    q, k, v = _split_qkv(
        lora_linear(x, w["qkv"], lora.get("qkv") if lora else None), config
    )

    position_ids = jnp.arange(q_len, dtype=jnp.int32)
    q = apply_rotary_emb(q, freqs_cis, position_ids, config.rope_dim)
    k = apply_rotary_emb(k, freqs_cis, position_ids, config.rope_dim)

    if config.n_kv_heads != config.n_heads:
        rep = config.n_heads // config.n_kv_heads
        k = jnp.repeat(k, rep, axis=1)
        v = jnp.repeat(v, rep, axis=1)

    out = sdpa(q, k, v, attn_mask)
    out = linear(
        out.transpose(0, 2, 1, 3).reshape(bsz, q_len, config.dim), w["proj"]
    )
    # proj adapter reads the block input x (reference text.py:53-56)
    if lora is not None and lora.get("proj") is not None:
        out = out + lora_delta(x, lora["proj"]).astype(out.dtype)
    return out


def text_decoder(
    x: jax.Array,
    w: dict,
    kv_cache: KVCache,
    pos: jax.Array,
    prefix_len: jax.Array,
    config: TextConfig,
    lora: Optional[dict] = None,
    kv_bound: Optional[int] = None,
    steer: Optional[jax.Array] = None,
) -> Tuple[jax.Array, KVCache]:
    """Run all blocks with KV-cache update; returns (hidden, new cache).

    Reference semantics: text.py:128-160. The layer loop is a lax.scan over
    stacked block weights and cache slices.

    `steer`: optional (n_layers, dim) array added to each block's residual
    output — pre-scaled control vectors for representation engineering
    (role of the reference's LayerWrapper in notebooks/RepEng.ipynb). Its
    presence is a trace-time branch; passing None compiles the plain path.
    """

    n_layers = config.n_layers
    # quantized stacked weights stay in the closure (whole arrays; the
    # kernel's index map selects the layer) — never in scan xs
    blocks_q = w.get("blocks_q")

    def block(carry, layer_in):
        h, kv = carry
        bw, lora_l, steer_l, lidx = layer_in
        lora_mlp = lora_l.get("mlp") if lora_l else None
        ln_in = layer_norm(h, bw["ln"])
        attn_out, kv = attn_with_cache(
            ln_in, bw["attn"], w["freqs_cis"], kv, lidx, pos,
            prefix_len, config, lora_l.get("attn") if lora_l else None,
            kv_bound, quant=blocks_q["attn"] if blocks_q else None,
        )
        if blocks_q is not None:
            m = _q_lin(
                ln_in, blocks_q["mlp"]["fc1"], bw["mlp"]["fc1"]["b"], lidx,
                lora_mlp.get("fc1") if lora_mlp else None,
            )
            from ..ops.layers import gelu_approx

            m = gelu_approx(m)
            mlp_out = _q_lin(
                m, blocks_q["mlp"]["fc2"], bw["mlp"]["fc2"]["b"], lidx,
                lora_mlp.get("fc2") if lora_mlp else None,
            )
        else:
            mlp_out = mlp(ln_in, bw["mlp"], lora=lora_mlp)
        h = h + attn_out + mlp_out
        if steer_l is not None:
            h = h + steer_l.astype(h.dtype)
        return (h, kv), None

    xs = (w["blocks"], lora, steer, jnp.arange(n_layers, dtype=jnp.int32))
    (hidden, new_kv), _ = jax.lax.scan(block, (x, kv_cache), xs)
    return hidden, new_kv


def prefix_attn_mask(q_len: int, prefix: int) -> jnp.ndarray:
    """Training mask: bidirectional over the first `prefix` positions, causal
    after (reference text.py:106-110). Shape (1, 1, q_len, q_len) bool."""
    rows = jnp.arange(q_len)[:, None]
    cols = jnp.arange(q_len)[None, :]
    causal = cols <= rows
    prefix_block = (rows < prefix) & (cols < prefix)
    return (causal | prefix_block)[None, None]


def _require_dense(w: dict, op: str) -> None:
    """The cache-free training/capture paths read the dense block weights,
    which quantize_text_params / quantize_text_params_int8 replace with
    quantized runtime formats."""
    if "blocks_q" in w or "w" not in w["blocks"]["attn"]["qkv"]:
        raise ValueError(
            f"{op} is not supported with quantized runtime text params: the "
            "dense block weights were replaced by packed int4 / int8 codes. "
            "Load the checkpoint with runtime_int4=False / runtime_int8=False "
            "for finetuning / hidden-state capture."
        )


def produce_hidden(
    inputs_embeds: jax.Array,
    w: dict,
    config: TextConfig,
    lora: Optional[dict] = None,
) -> jax.Array:
    """Full-sequence cache-free forward for training (reference text.py:102-125).
    `lora`: optional stacked adapter pytree (leading layer axis, the
    lora.variant_state_dict layout) scanned alongside the block weights —
    the LoRA-finetuning forward."""
    _require_dense(w, "produce_hidden")
    q_len = inputs_embeds.shape[1]
    mask = prefix_attn_mask(q_len, config.prefix_attn)

    def block(h, xs):
        bw, lora_l = xs
        ln_in = layer_norm(h, bw["ln"])
        attn_out = attn_uncached(
            ln_in, bw["attn"], w["freqs_cis"], mask, config,
            lora_l.get("attn") if lora_l else None,
        )
        mlp_out = mlp(ln_in, bw["mlp"], lora=lora_l.get("mlp") if lora_l else None)
        return h + attn_out + mlp_out, None

    hidden, _ = jax.lax.scan(block, inputs_embeds, (w["blocks"], lora))
    return hidden


def produce_hidden_layers(
    inputs_embeds: jax.Array, w: dict, config: TextConfig
) -> jax.Array:
    """Full-sequence cache-free forward returning EVERY layer's residual
    stream: (n_layers, B, T, D).

    TPU-native hidden-state capture for representation engineering: instead
    of hooking incremental decode (the reference notebook collects
    output_hidden_states per generated token, notebooks/RepEng.ipynb cell 2),
    generate first, then run ONE batched full-sequence forward — by
    causality the hidden states at each position are identical, and the
    capture is a single MXU-friendly pass with the per-layer states emitted
    as `lax.scan` ys."""
    _require_dense(w, "produce_hidden_layers")
    q_len = inputs_embeds.shape[1]
    mask = prefix_attn_mask(q_len, config.prefix_attn)

    def block(h, bw):
        ln_in = layer_norm(h, bw["ln"])
        attn_out = attn_uncached(ln_in, bw["attn"], w["freqs_cis"], mask, config)
        mlp_out = mlp(ln_in, bw["mlp"])
        h = h + attn_out + mlp_out
        return h, h

    _, layers = jax.lax.scan(block, inputs_embeds, w["blocks"])
    return layers


def lm_head(hidden_btc: jax.Array, w: dict) -> jax.Array:
    """Logits for the last position only (reference text.py:163-167)."""
    last = layer_norm(hidden_btc[:, -1, :], w["post_ln"])
    return linear(last, w["lm_head"])


def lm_head_full(hidden_btc: jax.Array, w: dict) -> jax.Array:
    """Full-sequence logits for training (reference text.py:170-173)."""
    return linear(layer_norm(hidden_btc, w["post_ln"]), w["lm_head"])


def init_text_params(config: TextConfig, key: jax.Array, dtype=jnp.bfloat16) -> dict:
    """Random-init parameter pytree (shapes matching build_text_model,
    reference text.py:176-221, with (in, out) linears and stacked blocks)."""
    from ..ops.rope import precompute_freqs_cis

    d, ff, L, V = config.dim, config.ff_dim, config.n_layers, config.vocab_size
    keys = iter(jax.random.split(key, 8))

    def stacked_lin(k, i, o):
        return {
            "w": (jax.random.normal(k, (L, i, o)) * (i**-0.5)).astype(dtype),
            "b": jnp.zeros((L, o), dtype),
        }

    return {
        "wte": (jax.random.normal(next(keys), (V, d)) * 0.02).astype(dtype),
        "blocks": {
            "ln": {"weight": jnp.ones((L, d), dtype), "bias": jnp.zeros((L, d), dtype)},
            "attn": {
                "qkv": stacked_lin(next(keys), d, config.qkv_dim),
                "proj": stacked_lin(next(keys), d, d),
            },
            "mlp": {
                "fc1": stacked_lin(next(keys), d, ff),
                "fc2": stacked_lin(next(keys), ff, d),
            },
        },
        "post_ln": {"weight": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)},
        "lm_head": {
            "w": (jax.random.normal(next(keys), (d, V)) * (d**-0.5)).astype(dtype),
            "b": jnp.zeros((V,), dtype),
        },
        "freqs_cis": precompute_freqs_cis(config.rope_dim, config.max_context),
    }
