"""Continuous batching: slot-based serving with per-request positions.

The reference serves strictly one request at a time (its `batch_answer`
is a Python loop, hf_moondream.py:99-103). This engine is the TPU-native
serving layer: a fixed pool of KV slots, requests admitted whenever a
slot is free (each prefilled independently and copied into its slot),
and ONE fused ragged decode advancing every active request per step —
per-row positions in RoPE, per-row cache writes, per-row causal masks in
the Pallas kernel, per-row EOS. Decode steps run in device-side chunks
so the host syncs once per `chunk` tokens, not once per token.

Pure functions here; `ContinuousBatchingEngine` (models/serve.py) owns
the host-side scheduling.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import TextConfig
from ..models import text as text_ops
from ..models.text import KVCache
from ..ops.attention import _use_pallas, attention, decode_attention_cached
from ..ops.layers import layer_norm, linear, mlp
from ..ops.rope import apply_rotary_emb
from .batched import lm_logits_batched, sample_tokens_batched

NEG_INF = jnp.float32(-1e30)


def _ragged_attn(
    x: jax.Array,
    w: dict,
    freqs_cis: jax.Array,
    kv: KVCache,
    layer: jax.Array,
    pos: jax.Array,  # (S,) per-row positions
    config: TextConfig,
    kv_bound: Optional[int],
    quant: Optional[dict] = None,
) -> Tuple[jax.Array, KVCache]:
    """One ragged decode attention layer: per-row positions everywhere."""
    bsz = x.shape[0]
    if quant is not None:
        qkv = text_ops._q_lin(x, quant["qkv"], w["qkv"]["b"], layer)
    else:
        qkv = linear(x, w["qkv"])
    q, k, v = text_ops._split_qkv(qkv, config)

    position_ids = pos[:, None]  # (S, 1)
    q = apply_rotary_emb(q, freqs_cis, position_ids, config.rope_dim)
    k = apply_rotary_emb(k, freqs_cis, position_ids, config.rope_dim)

    # per-row cache writes (unrolled over the slot pool; S is small).
    # pf > 1: head-paired cache layout (text.pair_kv) — for a single token
    # the pairing is a pure reshape (adjacent heads merge on the lane axis).
    pf = kv.k.shape[-1] // config.head_dim
    hp = config.n_kv_heads // pf
    dd = pf * config.head_dim
    int8 = kv.ks is not None
    k_cache, v_cache, ks_cache, vs_cache = kv.k, kv.v, kv.ks, kv.vs
    for s in range(bsz):
        k_row = k[s : s + 1].reshape(1, 1, hp, 1, dd)
        v_row = v[s : s + 1].reshape(1, 1, hp, 1, dd)
        if int8:
            k_row, ks_row = text_ops.quantize_kv(k_row)
            v_row, vs_row = text_ops.quantize_kv(v_row)
            # scales store T on the last axis; a single token's scale is
            # (1, 1, hp, 1, 1) either way — only the write offset moves
            ks_cache = jax.lax.dynamic_update_slice(
                ks_cache, ks_row, (layer, s, 0, 0, pos[s])
            )
            vs_cache = jax.lax.dynamic_update_slice(
                vs_cache, vs_row, (layer, s, 0, 0, pos[s])
            )
        k_cache = jax.lax.dynamic_update_slice(
            k_cache, k_row.astype(k_cache.dtype), (layer, s, 0, pos[s], 0)
        )
        v_cache = jax.lax.dynamic_update_slice(
            v_cache, v_row.astype(v_cache.dtype), (layer, s, 0, pos[s], 0)
        )
    kv = KVCache(k=k_cache, v=v_cache, ks=ks_cache, vs=vs_cache)

    # int8 decode kernel exists only for the head-paired layout (pf > 1);
    # GQA/sharded configs dequantize through the XLA branch.
    if (_use_pallas() and not config.xla_attn and not (int8 and pf == 1)):
        out = decode_attention_cached(
            q, kv.k, kv.v, layer, pos, jnp.int32(0), kv_bound,
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
            k_l = text_ops.dequantize_kv(
                k_l, jnp.swapaxes(ks_l, -1, -2), q.dtype
            )
            v_l = text_ops.dequantize_kv(
                v_l, jnp.swapaxes(vs_l, -1, -2), q.dtype
            )
        k_l = text_ops.unpair_kv(k_l, pf)
        v_l = text_ops.unpair_kv(v_l, pf)
        from ..ops.layers import sdpa

        tk = k_l.shape[2]
        cols = jnp.arange(tk, dtype=jnp.int32)[None, :]
        mask = (cols <= pos[:, None])[:, None, None, :]  # (S,1,1,Tk)
        out = sdpa(q, k_l, v_l, mask)

    out = out.transpose(0, 2, 1, 3).reshape(bsz, 1, config.dim)
    if quant is not None:
        out = text_ops._q_lin(out, quant["proj"], w["proj"]["b"], layer)
    else:
        out = linear(out, w["proj"])
    return out, kv


def ragged_decode_step(
    text_params: dict,
    kv: KVCache,
    tokens: jax.Array,  # (S,)
    pos: jax.Array,  # (S,)
    config: TextConfig,
    kv_bound: Optional[int] = None,
) -> Tuple[jax.Array, KVCache]:
    """One decode step for the whole slot pool at per-row positions.
    Returns ((S, V) logits, new cache)."""
    x = text_params["wte"][tokens][:, None, :]
    blocks_q = text_params.get("blocks_q")  # int4 runtime weights (closure)

    def block(carry, layer_in):
        h, kv_ = carry
        bw, lidx = layer_in
        ln_in = layer_norm(h, bw["ln"])
        attn_out, kv_ = _ragged_attn(
            ln_in, bw["attn"], text_params["freqs_cis"], kv_,
            lidx, pos, config, kv_bound,
            quant=blocks_q["attn"] if blocks_q else None,
        )
        if blocks_q is not None:
            from ..ops.layers import gelu_approx

            m = text_ops._q_lin(
                ln_in, blocks_q["mlp"]["fc1"], bw["mlp"]["fc1"]["b"], lidx
            )
            mlp_out = text_ops._q_lin(
                gelu_approx(m), blocks_q["mlp"]["fc2"], bw["mlp"]["fc2"]["b"],
                lidx,
            )
        else:
            mlp_out = mlp(ln_in, bw["mlp"])
        return (h + attn_out + mlp_out, kv_), None

    xs = (
        text_params["blocks"],
        jnp.arange(config.n_layers, dtype=jnp.int32),
    )
    (hidden, kv_new), _ = jax.lax.scan(block, (x, kv), xs)
    return lm_logits_batched(hidden[:, 0], text_params), kv_new


class ServeChunkResult(NamedTuple):
    tokens: jax.Array  # (S, chunk) int32
    emitted: jax.Array  # (S, chunk) bool — True where tokens[i,j] is real
    active: jax.Array  # (S,) bool — active AFTER the chunk
    pos: jax.Array  # (S,) int32
    cur: jax.Array  # (S,) int32 — each slot's next input token
    budget: jax.Array  # (S,) int32 — remaining tokens per slot
    kv: KVCache
    rng: jax.Array


def serve_chunk(
    text_params: dict,
    kv: KVCache,
    cur_tokens: jax.Array,  # (S,) next input token per slot
    pos: jax.Array,  # (S,)
    active: jax.Array,  # (S,) bool
    budget: jax.Array,  # (S,) int32 remaining tokens per slot
    rng: jax.Array,
    temperature: jax.Array,
    top_p: jax.Array,
    config: TextConfig,
    eos_id: int,
    suppress_ids: Tuple[int, ...],
    chunk: int,
    kv_bound: Optional[int] = None,
) -> ServeChunkResult:
    """Advance every active slot by up to `chunk` tokens in one jitted
    device loop. Inactive slots hold position (their cache writes land on
    a frozen slot index and are never attended by others)."""
    S = cur_tokens.shape[0]
    toks0 = jnp.zeros((S, chunk), jnp.int32)
    emit0 = jnp.zeros((S, chunk), jnp.bool_)
    max_pos = (kv_bound or config.max_context) - 1

    def body(i, c):
        kv_, cur, pos_, act, bud, rng_, toks, emit = c
        toks = toks.at[:, i].set(jnp.where(act, cur, 0))
        emit = emit.at[:, i].set(act)

        logits, kv_ = ragged_decode_step(
            text_params, kv_, cur, pos_, config, kv_bound
        )
        for sid in suppress_ids:
            logits = logits.at[:, sid].set(NEG_INF)
        rng_, sub = jax.random.split(rng_)
        nxt = sample_tokens_batched(logits, sub, temperature, top_p).astype(
            jnp.int32
        )

        bud = bud - act.astype(jnp.int32)
        new_act = act & (nxt != eos_id) & (bud > 0) & (pos_ + 1 < max_pos)
        pos_ = jnp.where(act, pos_ + 1, pos_)
        cur = jnp.where(act, nxt, cur)
        return (kv_, cur, pos_, new_act, bud, rng_, toks, emit)

    kv, cur, pos, active, budget, rng, toks, emit = jax.lax.fori_loop(
        0, chunk, body,
        (kv, cur_tokens, pos, active, budget, rng, toks0, emit0),
    )
    return ServeChunkResult(
        tokens=toks, emitted=emit, active=active, pos=pos, cur=cur,
        budget=budget, kv=kv, rng=rng,
    )


def write_slot(kv_pool: KVCache, snap: KVCache, slot: jax.Array) -> KVCache:
    """Copy one request's prefilled KV span into pool slot `slot`.
    snap leaves: (L, 1, H, T_span, D) (+ (L, 1, H, T_span, 1) int8 scales)."""
    return jax.tree.map(
        lambda pool, s: jax.lax.dynamic_update_slice(
            pool, s, (0, slot, 0, 0, 0)
        ),
        kv_pool, snap,
    )
