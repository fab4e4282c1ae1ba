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
from .drafting import ngram_draft_rows

# plain Python float: a module-level jnp scalar would initialize the
# default JAX backend at IMPORT time (observed hanging every CLI
# subprocess when the TPU tunnel is down); jnp ops accept weak floats
NEG_INF = -1e30


def _lora_delta(x: jax.Array, pair: dict, vids: jax.Array) -> jax.Array:
    """Per-row low-rank residual for multi-variant serving: row s applies
    adapter `vids[s]`. `pair` holds variant-stacked factors
    {"A": (V, r, in), "B": (V, out, r)} in the torch (out, in) factor
    layout (lora.variant_state_dict / lora.stack_variant_pytrees, variant
    0 = all-zeros base); x is (S, Tq, in). Matches lora_linear semantics
    — y += (x @ Aᵀ) @ Bᵀ accumulated in fp32 — per row. V and r are tiny
    next to the dense matmuls, so the gathers and rank-r dots are noise."""
    a_rows = pair["A"][vids]  # (S, r, in)
    b_rows = pair["B"][vids]  # (S, out, r)
    a = jnp.einsum(
        "std,srd->str", x, a_rows, preferred_element_type=jnp.float32
    )
    return jnp.einsum(
        "str,sor->sto", a, b_rows, preferred_element_type=jnp.float32
    )


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
    lora_l: Optional[dict] = None,
    vids: Optional[jax.Array] = None,
    pref: Optional[KVCache] = None,
    pids: Optional[jax.Array] = None,
    prefix_len: int = 0,
) -> Tuple[jax.Array, KVCache]:
    """One ragged decode attention layer: per-row positions everywhere.
    x may be a SPAN (S, Tq, D) with Tq > 1 (speculative verify): row s's
    query i sits at position pos[s] + i, cache writes land as per-row
    Tq-token spans, and the ragged span kernel masks col <= pos[s] + i.
    `lora_l`/`vids`: per-row LoRA adapters (one layer's variant-stacked
    {"qkv"/"proj": {A, B}} factors) for multi-variant serving.

    Prefix-shared mode (`pref` + `pids` + `prefix_len`): `kv` is a SUFFIX
    cache (row s's col j = global position prefix_len + j; writes land at
    pos[s] - prefix_len) and `pref` holds P shared read-only image
    prefixes (positions [0, prefix_len), one copy per distinct image) —
    row s attends over pref[pids[s]] ++ its own suffix. pos stays GLOBAL.
    N same-image slots hold one prefix copy (reference n/a — batch-1
    reference rebuilds the full KV per request, moondream.py:620-623)."""
    bsz, q_len = x.shape[0], x.shape[1]
    if quant is not None:
        qkv = text_ops._q_lin(x, quant["qkv"], w["qkv"]["b"], layer)
    else:
        qkv = linear(x, w["qkv"])
    if lora_l is not None:
        qkv = qkv + _lora_delta(x, lora_l["qkv"], vids).astype(qkv.dtype)
    q, k, v = text_ops._split_qkv(qkv, config)

    # (S, Tq) per-row positions
    position_ids = pos[:, None] + jnp.arange(q_len, dtype=jnp.int32)[None, :]
    q = apply_rotary_emb(q, freqs_cis, position_ids, config.rope_dim)
    k = apply_rotary_emb(k, freqs_cis, position_ids, config.rope_dim)

    # per-row cache writes (unrolled over the slot pool; S is small),
    # head-paired via pair_kv (a pure reshape when Tq == 1).
    pf = kv.k.shape[-1] // config.head_dim
    hp = config.n_kv_heads // pf
    dd = pf * config.head_dim
    int8 = kv.ks is not None
    kp = text_ops.pair_kv(k, pf)  # (S, hp, Tq, dd)
    vp = text_ops.pair_kv(v, pf)
    k_cache, v_cache, ks_cache, vs_cache = kv.k, kv.v, kv.ks, kv.vs
    for s in range(bsz):
        k_row = kp[s : s + 1][None]  # (1, 1, hp, Tq, dd)
        v_row = vp[s : s + 1][None]
        # prefix-shared mode: writes land in the SUFFIX segment (global
        # position - prefix_len; clamped for idle rows at pos 0, whose
        # garbage rows are re-written at admission and causally masked)
        wpos = (
            jnp.maximum(pos[s] - prefix_len, 0) if prefix_len else pos[s]
        )
        if int8:
            k_row, ks_row = text_ops.quantize_kv(k_row)
            v_row, vs_row = text_ops.quantize_kv(v_row)
            # scales store T on the last axis: (1, 1, hp, 1, Tq)
            ks_cache = jax.lax.dynamic_update_slice(
                ks_cache, jnp.swapaxes(ks_row, -1, -2), (layer, s, 0, 0, wpos)
            )
            vs_cache = jax.lax.dynamic_update_slice(
                vs_cache, jnp.swapaxes(vs_row, -1, -2), (layer, s, 0, 0, wpos)
            )
        k_cache = jax.lax.dynamic_update_slice(
            k_cache, k_row.astype(k_cache.dtype), (layer, s, 0, wpos, 0)
        )
        v_cache = jax.lax.dynamic_update_slice(
            v_cache, v_row.astype(v_cache.dtype), (layer, s, 0, wpos, 0)
        )
    kv = KVCache(k=k_cache, v=v_cache, ks=ks_cache, vs=vs_cache)

    # int8 decode kernel exists only for the head-paired layout (pf > 1);
    # GQA/sharded configs dequantize through the XLA branch.
    if (_use_pallas() and not config.xla_attn and not (int8 and pf == 1)):
        out = decode_attention_cached(
            q, kv.k, kv.v, layer, pos, jnp.int32(0), kv_bound,
            k_scale=kv.ks, v_scale=kv.vs,
            pref_k=pref.k if pref is not None else None,
            pref_v=pref.v if pref is not None else None,
            pref_ks=pref.ks if pref is not None else None,
            pref_vs=pref.vs if pref is not None else None,
            pids=pids, prefix_len=prefix_len,
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
        if pref is not None:
            # gather each row's shared prefix and splice it ahead of the
            # suffix: col j < prefix_len is global position j, suffix col
            # j is prefix_len + j — identical math to the fused kernel
            pk_l = jax.lax.dynamic_index_in_dim(
                pref.k, layer, 0, keepdims=False
            )[pids][:, :, :prefix_len]
            pv_l = jax.lax.dynamic_index_in_dim(
                pref.v, layer, 0, keepdims=False
            )[pids][:, :, :prefix_len]
            if pref.ks is not None:
                pks_l = jax.lax.dynamic_index_in_dim(
                    pref.ks, layer, 0, keepdims=False
                )[pids][:, :, :, :prefix_len]
                pvs_l = jax.lax.dynamic_index_in_dim(
                    pref.vs, layer, 0, keepdims=False
                )[pids][:, :, :, :prefix_len]
                pk_l = text_ops.dequantize_kv(
                    pk_l, jnp.swapaxes(pks_l, -1, -2), q.dtype
                )
                pv_l = text_ops.dequantize_kv(
                    pv_l, jnp.swapaxes(pvs_l, -1, -2), q.dtype
                )
            k_l = jnp.concatenate(
                [text_ops.unpair_kv(pk_l, pf), k_l], axis=2
            )
            v_l = jnp.concatenate(
                [text_ops.unpair_kv(pv_l, pf), v_l], axis=2
            )
        from ..ops.layers import sdpa

        tk = k_l.shape[2]
        cols = jnp.arange(tk, dtype=jnp.int32)[None, None, :]  # (1,1,Tk)
        qpos = position_ids[:, :, None]  # (S, Tq, 1)
        mask = (cols <= qpos)[:, None, :, :]  # (S,1,Tq,Tk)
        out = sdpa(q, k_l, v_l, mask)

    out = out.transpose(0, 2, 1, 3).reshape(bsz, q_len, config.dim)
    if quant is not None:
        out = text_ops._q_lin(out, quant["proj"], w["proj"]["b"], layer)
    else:
        out = linear(out, w["proj"])
    # the proj adapter reads the BLOCK INPUT x (the shared-LN output),
    # not the attention output (reference text.py:53-56)
    if lora_l is not None:
        out = out + _lora_delta(x, lora_l["proj"], vids).astype(out.dtype)
    return out, kv


def ragged_hidden_step(
    text_params: dict,
    kv: KVCache,
    x: jax.Array,  # (S, 1, D) input embeddings
    pos: jax.Array,  # (S,)
    config: TextConfig,
    kv_bound: Optional[int] = None,
    loras: Optional[dict] = None,
    vids: Optional[jax.Array] = None,
    pref: Optional[KVCache] = None,
    pids: Optional[jax.Array] = None,
    prefix_len: int = 0,
) -> Tuple[jax.Array, KVCache]:
    """One decoder forward for the whole slot pool at per-row positions,
    from caller-supplied input embeddings (text tokens, coordinate
    embeddings, size embeddings — the mixed structured/text pool feeds
    different embedding kinds per row). Returns ((S, D) hidden, cache).

    `loras`/`vids`: multi-variant serving — `loras` is the
    lora.stack_variant_pytrees layout (leaves (L, V, r, d), variant 0 =
    zero base adapter) and `vids[s]` picks row s's adapter. Composes
    with runtime-int4 base weights (the low-rank residual is added after
    the quantized matmul, exactly like the dense path)."""
    blocks_q = text_params.get("blocks_q")  # int4 runtime weights (closure)
    from ..ops.layers import gelu_approx

    def block(carry, layer_in):
        h, kv_ = carry
        bw, lidx, lora_l = layer_in
        ln_in = layer_norm(h, bw["ln"])
        attn_out, kv_ = _ragged_attn(
            ln_in, bw["attn"], text_params["freqs_cis"], kv_,
            lidx, pos, config, kv_bound,
            quant=blocks_q["attn"] if blocks_q else None,
            lora_l=lora_l["attn"] if lora_l is not None else None,
            vids=vids, pref=pref, pids=pids, prefix_len=prefix_len,
        )
        lora_mlp = lora_l["mlp"] if lora_l is not None else None
        if blocks_q is not None:
            m = text_ops._q_lin(
                ln_in, blocks_q["mlp"]["fc1"], bw["mlp"]["fc1"]["b"], lidx
            )
            if lora_mlp is not None:
                m = m + _lora_delta(ln_in, lora_mlp["fc1"], vids).astype(
                    m.dtype
                )
            g = gelu_approx(m)
            mlp_out = text_ops._q_lin(
                g, blocks_q["mlp"]["fc2"], bw["mlp"]["fc2"]["b"], lidx
            )
            if lora_mlp is not None:
                mlp_out = mlp_out + _lora_delta(
                    g, lora_mlp["fc2"], vids
                ).astype(mlp_out.dtype)
        elif lora_mlp is not None:
            m = linear(ln_in, bw["mlp"]["fc1"])
            m = m + _lora_delta(ln_in, lora_mlp["fc1"], vids).astype(m.dtype)
            g = gelu_approx(m)
            mlp_out = linear(g, bw["mlp"]["fc2"])
            mlp_out = mlp_out + _lora_delta(
                g, lora_mlp["fc2"], vids
            ).astype(mlp_out.dtype)
        else:
            mlp_out = mlp(ln_in, bw["mlp"])
        return (h + attn_out + mlp_out, kv_), None

    xs = (
        text_params["blocks"],
        jnp.arange(config.n_layers, dtype=jnp.int32),
        loras,
    )
    (hidden, kv_new), _ = jax.lax.scan(block, (x, kv), xs)
    return hidden[:, 0], kv_new


def ragged_decode_step(
    text_params: dict,
    kv: KVCache,
    tokens: jax.Array,  # (S,)
    pos: jax.Array,  # (S,)
    config: TextConfig,
    kv_bound: Optional[int] = None,
    loras: Optional[dict] = None,
    vids: Optional[jax.Array] = None,
    pref: Optional[KVCache] = None,
    pids: Optional[jax.Array] = None,
    prefix_len: int = 0,
) -> Tuple[jax.Array, KVCache]:
    """One decode step for the whole slot pool at per-row positions.
    Returns ((S, V) logits, new cache)."""
    x = text_params["wte"][tokens][:, None, :]
    hidden, kv_new = ragged_hidden_step(
        text_params, kv, x, pos, config, kv_bound, loras=loras, vids=vids,
        pref=pref, pids=pids, prefix_len=prefix_len,
    )
    return lm_logits_batched(hidden, text_params), kv_new


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
    loras: Optional[dict] = None,
    vids: Optional[jax.Array] = None,
    pref: Optional[KVCache] = None,
    pids: Optional[jax.Array] = None,
    *,
    config: TextConfig,
    eos_id: int,
    suppress_ids: Tuple[int, ...],
    chunk: int,
    kv_bound: Optional[int] = None,
    prefix_len: int = 0,
) -> ServeChunkResult:
    """Advance every active slot by up to `chunk` tokens in one jitted
    device loop. Inactive slots hold position (their cache writes land on
    a frozen slot index and are never attended by others).
    `loras`/`vids`: per-slot LoRA variants (see ragged_hidden_step)."""
    S = cur_tokens.shape[0]
    toks0 = jnp.zeros((S, chunk), jnp.int32)
    emit0 = jnp.zeros((S, chunk), jnp.bool_)
    # kv_bound is the SUFFIX capacity under prefix sharing; pos is global
    max_pos = (kv_bound or config.max_context) + prefix_len - 1

    def body(i, c):
        kv_, cur, pos_, act, bud, rng_, toks, emit = c
        toks = toks.at[:, i].set(jnp.where(act, cur, 0))
        emit = emit.at[:, i].set(act)

        logits, kv_ = ragged_decode_step(
            text_params, kv_, cur, pos_, config, kv_bound,
            pref=pref, pids=pids, prefix_len=prefix_len,
            loras=loras, vids=vids,
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


def ragged_verify_step(
    text_params: dict,
    kv: KVCache,
    q_toks: jax.Array,  # (S, k)
    pos: jax.Array,  # (S,)
    config: TextConfig,
    kv_bound: Optional[int] = None,
    loras: Optional[dict] = None,
    vids: Optional[jax.Array] = None,
    x_override: Optional[jax.Array] = None,  # (S, D)
    x_mask: Optional[jax.Array] = None,  # (S,) bool
    pref: Optional[KVCache] = None,
    pids: Optional[jax.Array] = None,
    prefix_len: int = 0,
) -> Tuple[jax.Array, jax.Array, KVCache]:
    """One speculative verify forward for the whole slot pool: every row
    feeds a k-token span at its own position. Returns ((S, k, V) logits,
    (S, k, D) hidden, new cache) — the hidden feeds structured rows'
    coordinate decode in the mixed spec chunk. `loras`/`vids`: per-row
    adapters applied to the whole span (see ragged_hidden_step;
    _lora_delta handles Tq = k). `x_override`: optional (S, D) input
    embedding replacing span position 0 per row where `x_mask` is True —
    structured rows feed coordinate/size embeddings, not token
    embeddings."""
    x = text_params["wte"][q_toks]  # (S, k, D)
    if x_override is not None:
        x = jnp.where(
            x_mask[:, None, None] & (jnp.arange(x.shape[1]) == 0)[None, :, None],
            x_override[:, None, :].astype(x.dtype),
            x,
        )
    blocks_q = text_params.get("blocks_q")
    from ..ops.layers import gelu_approx

    def block(carry, layer_in):
        h, kv_ = carry
        bw, lidx, lora_l = layer_in
        ln_in = layer_norm(h, bw["ln"])
        attn_out, kv_ = _ragged_attn(
            ln_in, bw["attn"], text_params["freqs_cis"], kv_,
            lidx, pos, config, kv_bound,
            quant=blocks_q["attn"] if blocks_q else None,
            lora_l=lora_l["attn"] if lora_l is not None else None,
            vids=vids, pref=pref, pids=pids, prefix_len=prefix_len,
        )
        lora_mlp = lora_l["mlp"] if lora_l is not None else None
        if blocks_q is not None:
            m = text_ops._q_lin(
                ln_in, blocks_q["mlp"]["fc1"], bw["mlp"]["fc1"]["b"], lidx
            )
            if lora_mlp is not None:
                m = m + _lora_delta(ln_in, lora_mlp["fc1"], vids).astype(
                    m.dtype
                )
            g = gelu_approx(m)
            mlp_out = text_ops._q_lin(
                g, blocks_q["mlp"]["fc2"], bw["mlp"]["fc2"]["b"], lidx
            )
            if lora_mlp is not None:
                mlp_out = mlp_out + _lora_delta(
                    g, lora_mlp["fc2"], vids
                ).astype(mlp_out.dtype)
        elif lora_mlp is not None:
            m = linear(ln_in, bw["mlp"]["fc1"])
            m = m + _lora_delta(ln_in, lora_mlp["fc1"], vids).astype(m.dtype)
            g = gelu_approx(m)
            mlp_out = linear(g, bw["mlp"]["fc2"])
            mlp_out = mlp_out + _lora_delta(
                g, lora_mlp["fc2"], vids
            ).astype(mlp_out.dtype)
        else:
            mlp_out = mlp(ln_in, bw["mlp"])
        return (h + attn_out + mlp_out, kv_), None

    xs = (
        text_params["blocks"],
        jnp.arange(config.n_layers, dtype=jnp.int32),
        loras,
    )
    (hidden, kv_new), _ = jax.lax.scan(block, (x, kv), xs)
    S, k, D = hidden.shape
    logits = lm_logits_batched(hidden.reshape(S * k, D), text_params)
    return logits.reshape(S, k, -1), hidden, kv_new


class ServeChunkSpecResult(NamedTuple):
    tokens: jax.Array  # (S, n_iter * k) int32
    emitted: jax.Array  # (S, n_iter * k) bool
    active: jax.Array  # (S,) bool
    pos: jax.Array  # (S,) int32
    cur: jax.Array  # (S,) int32
    budget: jax.Array  # (S,) int32
    kv: KVCache
    hist: jax.Array  # (S, H) int32 — per-slot emitted-token history
    hist_cnt: jax.Array  # (S,) int32


def serve_chunk_spec(
    text_params: dict,
    kv: KVCache,
    cur_tokens: jax.Array,  # (S,)
    pos: jax.Array,  # (S,)
    active: jax.Array,  # (S,) bool
    budget: jax.Array,  # (S,) int32
    hist: jax.Array,  # (S, H) int32 emitted history per slot
    hist_cnt: jax.Array,  # (S,) int32
    loras: Optional[dict] = None,
    vids: Optional[jax.Array] = None,
    pref: Optional[KVCache] = None,
    pids: Optional[jax.Array] = None,
    *,
    config: TextConfig,
    eos_id: int,
    suppress_ids: Tuple[int, ...],
    n_iter: int,
    spec_k: int,
    kv_bound: Optional[int] = None,
    prefix_len: int = 0,
) -> ServeChunkSpecResult:
    """SPECULATIVE serving chunk (greedy): `n_iter` verify iterations, each
    advancing every active slot by 1..spec_k tokens for one weight pass —
    per-slot n-gram drafts from device-resident histories, one ragged
    span forward, per-row acceptance. Token-identical to `serve_chunk` at
    temperature 0 (verification accepts a draft token only when it equals
    the greedy continuation; see generate_text_spec's caveat — span vs
    single-step logit accumulation equality is validated empirically, not
    a bitwise XLA guarantee). The engine must admit requests with
    budget <= slot_len - pos - spec_k so every row's verify span fits its
    slot (ContinuousBatchingEngine enforces this when speculative is on).
    """
    S = cur_tokens.shape[0]
    W = n_iter * spec_k
    H = hist.shape[1]
    toks0 = jnp.zeros((S, W), jnp.int32)
    emit0 = jnp.zeros((S, W), jnp.bool_)
    col0 = jnp.zeros((S,), jnp.int32)
    rows = jnp.arange(S, dtype=jnp.int32)
    max_pos = (kv_bound or config.max_context) + prefix_len

    def body(_, c):
        kv_, cur, pos_, act, bud, h_, cnt, col, toks, emit = c

        # emit cur (the token about to be fed) and append to history
        toks = toks.at[rows, jnp.where(act, col, W)].set(cur, mode="drop")
        emit = emit.at[rows, jnp.where(act, col, W)].set(True, mode="drop")
        h_ = h_.at[rows, jnp.where(act, jnp.minimum(cnt, H - 1), H)].set(
            cur, mode="drop"
        )
        cnt1 = cnt + act.astype(jnp.int32)

        # ---- per-row longest-suffix n-gram draft from history
        draft, _ = ngram_draft_rows(h_, cnt1, cur, spec_k)  # (S, k-1)

        # ---- one ragged span verify forward for the whole pool
        q_toks = jnp.concatenate([cur[:, None], draft], axis=1)  # (S, k)
        logits, _, kv_ = ragged_verify_step(
            text_params, kv_, q_toks, pos_, config, kv_bound,
            loras=loras, vids=vids,
            pref=pref, pids=pids, prefix_len=prefix_len,
        )
        for sid in suppress_ids:
            logits = logits.at[:, :, sid].set(NEG_INF)
        g = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # (S, k)

        # ---- per-row acceptance (identical rule to generate_text_spec)
        ok = (draft == g[:, :-1]).astype(jnp.int32)
        m = 1 + jnp.sum(jnp.cumprod(ok, axis=1), axis=1)
        is_eos = g == eos_id
        eos_pos = jnp.argmax(is_eos, axis=1)
        m = jnp.where(
            jnp.any(is_eos, axis=1) & (eos_pos + 1 < m), eos_pos + 1, m
        )
        m = jnp.minimum(m, bud)
        m = jnp.where(act, m, 0)

        # interior accepted tokens g[:, :m-1] -> buffers + history
        for j in range(spec_k - 1):
            valid = act & (j + 1 < m)
            toks = toks.at[rows, jnp.where(valid, col + 1 + j, W)].set(
                g[:, j], mode="drop"
            )
            emit = emit.at[rows, jnp.where(valid, col + 1 + j, W)].set(
                True, mode="drop"
            )
            h_ = h_.at[
                rows, jnp.where(valid, jnp.minimum(cnt1 + j, H - 1), H)
            ].set(g[:, j], mode="drop")

        nxt = g[rows, jnp.maximum(m - 1, 0)]
        cur = jnp.where(act, nxt, cur)
        pos_ = pos_ + m
        bud = bud - m
        cnt2 = cnt1 + jnp.maximum(m - 1, 0) * act.astype(jnp.int32)
        col = col + m
        act = (
            act & (cur != eos_id) & (bud > 0)
            & (pos_ + spec_k <= max_pos)
        )
        return (kv_, cur, pos_, act, bud, h_, cnt2, col, toks, emit)

    (kv, cur, pos, active, budget, hist, hist_cnt, _, toks, emit) = (
        jax.lax.fori_loop(
            0, n_iter, body,
            (kv, cur_tokens, pos, active, budget, hist, hist_cnt, col0,
             toks0, emit0),
        )
    )
    return ServeChunkSpecResult(
        tokens=toks, emitted=emit, active=active, pos=pos, cur=cur,
        budget=budget, kv=kv, hist=hist, hist_cnt=hist_cnt,
    )


class ServeChunkSpecSampledResult(NamedTuple):
    tokens: jax.Array
    emitted: jax.Array
    active: jax.Array
    pos: jax.Array
    cur: jax.Array
    budget: jax.Array
    kv: KVCache
    hist: jax.Array
    hist_cnt: jax.Array
    rng: jax.Array


def serve_chunk_spec_sampled(
    text_params: dict,
    kv: KVCache,
    cur_tokens: jax.Array,
    pos: jax.Array,
    active: jax.Array,
    budget: jax.Array,
    hist: jax.Array,
    hist_cnt: jax.Array,
    rng: jax.Array,
    temperature: jax.Array,
    top_p: jax.Array,
    loras: Optional[dict] = None,
    vids: Optional[jax.Array] = None,
    pref: Optional[KVCache] = None,
    pids: Optional[jax.Array] = None,
    *,
    config: TextConfig,
    eos_id: int,
    suppress_ids: Tuple[int, ...],
    n_iter: int,
    spec_k: int,
    kv_bound: Optional[int] = None,
    prefix_len: int = 0,
) -> ServeChunkSpecSampledResult:
    """Speculative SAMPLING serving chunk: like `serve_chunk_spec` but each
    row's drafts are accepted by rejection against the row's target
    nucleus distribution, with residual/bonus draws on rejection — the
    emitted streams are distributed exactly as the plain sampled chunks'
    (see generate_text_spec_sampled), though not bit-identical per rng.
    Same slot-edge/budget contracts as the greedy spec chunk."""
    from .sampling import target_probs as _target_probs

    S = cur_tokens.shape[0]
    W = n_iter * spec_k
    H = hist.shape[1]
    toks0 = jnp.zeros((S, W), jnp.int32)
    emit0 = jnp.zeros((S, W), jnp.bool_)
    col0 = jnp.zeros((S,), jnp.int32)
    rows = jnp.arange(S, dtype=jnp.int32)
    max_pos = (kv_bound or config.max_context) + prefix_len

    def body(_, c):
        kv_, cur, pos_, act, bud, h_, cnt, col, toks, emit, rng_ = c

        toks = toks.at[rows, jnp.where(act, col, W)].set(cur, mode="drop")
        emit = emit.at[rows, jnp.where(act, col, W)].set(True, mode="drop")
        h_ = h_.at[rows, jnp.where(act, jnp.minimum(cnt, H - 1), H)].set(
            cur, mode="drop"
        )
        cnt1 = cnt + act.astype(jnp.int32)

        # ---- per-row longest-suffix n-gram draft (same as greedy chunk)
        draft, _ = ngram_draft_rows(h_, cnt1, cur, spec_k)

        q_toks = jnp.concatenate([cur[:, None], draft], axis=1)
        logits, _, kv_ = ragged_verify_step(
            text_params, kv_, q_toks, pos_, config, kv_bound,
            loras=loras, vids=vids,
            pref=pref, pids=pids, prefix_len=prefix_len,
        )
        for sid in suppress_ids:
            logits = logits.at[:, :, sid].set(NEG_INF)
        # per-request settings arrive as (S,) arrays — broadcast over the
        # (S, k, V) span; greedy rows (temp 0 -> 1e-6) reduce to a point
        # mass at the argmax, so they stay exact inside a mixed pool
        t = (
            temperature[:, None, None]
            if getattr(temperature, "ndim", 0) == 1 else temperature
        )
        pp = (
            top_p[:, None, None]
            if getattr(top_p, "ndim", 0) == 1 else top_p
        )
        p = _target_probs(logits, t, pp)  # (S, k, V)

        # ---- per-row rejection acceptance + residual/bonus draws
        rng_, k_acc, k_res = jax.random.split(rng_, 3)
        u = jax.random.uniform(k_acc, (S, spec_k - 1))
        p_draft = jnp.take_along_axis(
            p[:, : spec_k - 1], draft[..., None], axis=-1
        )[..., 0]
        acc = (u < p_draft).astype(jnp.int32)
        n_acc = jnp.sum(jnp.cumprod(acc, axis=1), axis=1)  # (S,)

        onehot = jax.nn.one_hot(draft, p.shape[-1], dtype=p.dtype)
        p_res = p.at[:, : spec_k - 1].set(
            jnp.maximum(p[:, : spec_k - 1] - onehot * 1e9, 0.0)
        )
        res_keys = jax.random.split(k_res, S * spec_k).reshape(S, spec_k, 2)
        samp = jax.vmap(
            jax.vmap(
                lambda key, pr: jax.random.categorical(
                    key, jnp.log(jnp.maximum(pr, 1e-30))
                )
            )
        )(res_keys, p_res).astype(jnp.int32)  # (S, k)
        tail = samp[rows, n_acc]

        emitted = jnp.where(
            jnp.arange(spec_k)[None, :] == n_acc[:, None],
            tail[:, None],
            jnp.concatenate([draft, tail[:, None]], axis=1),
        )  # (S, k): [:m-1] accepted drafts, [m-1] the sampled token
        m = n_acc + 1
        is_eos = (emitted == eos_id) & (
            jnp.arange(spec_k)[None, :] < m[:, None]
        )
        eos_pos = jnp.argmax(is_eos, axis=1)
        m = jnp.where(
            jnp.any(is_eos, axis=1) & (eos_pos + 1 < m), eos_pos + 1, m
        )
        m = jnp.minimum(m, bud)
        m = jnp.where(act, m, 0)

        for j in range(spec_k - 1):
            valid = act & (j + 1 < m)
            toks = toks.at[rows, jnp.where(valid, col + 1 + j, W)].set(
                emitted[:, j], mode="drop"
            )
            emit = emit.at[rows, jnp.where(valid, col + 1 + j, W)].set(
                True, mode="drop"
            )
            h_ = h_.at[
                rows, jnp.where(valid, jnp.minimum(cnt1 + j, H - 1), H)
            ].set(emitted[:, j], mode="drop")

        nxt = emitted[rows, jnp.maximum(m - 1, 0)]
        cur = jnp.where(act, nxt, cur)
        pos_ = pos_ + m
        bud = bud - m
        cnt2 = cnt1 + jnp.maximum(m - 1, 0) * act.astype(jnp.int32)
        col = col + m
        act = (
            act & (cur != eos_id) & (bud > 0)
            & (pos_ + spec_k <= max_pos)
        )
        return (kv_, cur, pos_, act, bud, h_, cnt2, col, toks, emit, rng_)

    (kv, cur, pos, active, budget, hist, hist_cnt, _, toks, emit, rng) = (
        jax.lax.fori_loop(
            0, n_iter, body,
            (kv, cur_tokens, pos, active, budget, hist, hist_cnt, col0,
             toks0, emit0, rng),
        )
    )
    return ServeChunkSpecSampledResult(
        tokens=toks, emitted=emit, active=active, pos=pos, cur=cur,
        budget=budget, kv=kv, hist=hist, hist_cnt=hist_cnt, rng=rng,
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


# ---------------------------------------------------------------- mixed pool
# Per-slot decode modes for serve_chunk_mixed. Structured rows cycle
# XN -> Y (-> SIZE) -> XN, consuming one decoder forward per transition —
# the ragged-pool generalization of generate_points_batched
# (engine/batched.py:189, reference moondream.py:653-733), sharing the
# pool with free-text rows.
MODE_TEXT = 0
MODE_XN = 1  # hidden holds BOTH the continue/EOS token and the next x
MODE_Y = 2
MODE_SIZE = 3


class ServeChunkMixedResult(NamedTuple):
    tokens: jax.Array  # (S, chunk) int32 — text rows' emitted tokens
    emitted: jax.Array  # (S, chunk) bool
    active: jax.Array  # (S,) bool
    pos: jax.Array  # (S,) int32
    cur: jax.Array  # (S,) int32
    budget: jax.Array  # (S,) int32
    kv: KVCache
    rng: jax.Array
    mode: jax.Array  # (S,) int32
    hid: jax.Array  # (S, D) — struct rows' pending hidden
    pending: jax.Array  # (S,) int32 — struct rows' pending continue token
    xbuf: jax.Array  # (S,) f32
    ybuf: jax.Array  # (S,) f32
    boxes: jax.Array  # (S, max_objects, 4) f32
    nobj: jax.Array  # (S,) int32


def serve_chunk_mixed(
    text_params: dict,
    region_params: dict,
    kv: KVCache,
    cur_tokens: jax.Array,  # (S,)
    pos: jax.Array,  # (S,)
    active: jax.Array,  # (S,) bool
    budget: jax.Array,  # (S,) int32
    rng: jax.Array,
    temperature: jax.Array,
    top_p: jax.Array,
    mode: jax.Array,  # (S,) int32 — MODE_TEXT / MODE_XN / MODE_Y / MODE_SIZE
    hid: jax.Array,  # (S, D)
    pending: jax.Array,  # (S,) int32
    xbuf: jax.Array,  # (S,) f32
    ybuf: jax.Array,  # (S,) f32
    boxes: jax.Array,  # (S, max_objects, 4) f32
    nobj: jax.Array,  # (S,) int32
    is_box: jax.Array,  # (S,) bool — detect (boxes) vs point rows
    loras: Optional[dict] = None,
    vids: Optional[jax.Array] = None,
    pref: Optional[KVCache] = None,
    pids: Optional[jax.Array] = None,
    *,
    config: TextConfig,
    eos_id: int,
    suppress_ids: Tuple[int, ...],
    chunk: int,
    max_objects: int,
    kv_bound: Optional[int] = None,
    prefix_len: int = 0,
) -> ServeChunkMixedResult:
    """One fused chunk over a pool mixing free-text rows (caption/VQA)
    and structured rows (detect/point): every active row advances one
    decoder forward per iteration, text rows sampling tokens, structured
    rows stepping their coordinate state machine — the reference's
    3-steps-per-object interleave (moondream.py:653-733) running ragged
    alongside text decoding.

    Per iteration, each structured row consumes its held hidden: XN rows
    read the continue/EOS token (the shared post-forward lm head pass —
    the same matmul text rows sample from, so structure costs no extra
    vocab projections) AND decode x; Y rows decode y (recording point
    rows); SIZE rows decode (w, h) and record the box. The row's next
    input embedding is the coordinate/size encoding, exactly like the
    sequential path, so outputs are the single-path outputs."""
    from ..models import region as region_ops
    from ..ops.layers import mlp as _mlp

    S = cur_tokens.shape[0]
    emb_dtype = text_params["wte"].dtype
    toks0 = jnp.zeros((S, chunk), jnp.int32)
    emit0 = jnp.zeros((S, chunk), jnp.bool_)
    # kv_bound is the SUFFIX capacity under prefix sharing; pos is global
    max_pos = (kv_bound or config.max_context) + prefix_len - 1

    def body(i, c):
        (kv_, cur, pos_, act, bud, rng_, toks, emit,
         mode_, hid_, pend_, xb, yb, bx, n_) = c
        is_text = mode_ == MODE_TEXT
        is_struct = ~is_text

        # ---- consume the held hidden (struct rows)
        coord_logits = region_ops.decode_coordinate(hid_, region_params)
        val = (
            jnp.argmax(coord_logits, -1).astype(jnp.float32)
            / coord_logits.shape[-1]
        )
        size_logits = _mlp(hid_, region_params["size_decoder"]).reshape(
            S, 2, -1
        )
        wh = region_ops.size_bin_to_value(jnp.argmax(size_logits, -1))

        # XN rows: stop on EOS / object cap / cache edge (margin 4 keeps
        # whole objects inside the slot, engine/batched.py:229)
        xn = is_struct & (mode_ == MODE_XN) & act
        stop = (
            (pend_ == eos_id) | (n_ >= max_objects)
            | (pos_ + 4 >= max_pos) | (bud <= 0)
        )
        act = act & ~(xn & stop)
        xn = xn & ~stop

        yrow = is_struct & (mode_ == MODE_Y) & act
        srow = is_struct & (mode_ == MODE_SIZE) & act

        # record finished objects: points at Y, boxes at SIZE
        rec_point = yrow & ~is_box
        point_row = jnp.stack(
            [xb, val, jnp.zeros_like(xb), jnp.zeros_like(xb)], -1
        )
        box_row = jnp.stack(
            [xb - wh[:, 0] / 2, yb - wh[:, 1] / 2,
             xb + wh[:, 0] / 2, yb + wh[:, 1] / 2], -1,
        )
        rec = rec_point | srow
        row = jnp.where(srow[:, None], box_row, point_row)
        upd = (jnp.arange(max_objects)[None, :] == n_[:, None]) & rec[:, None]
        bx = jnp.where(upd[..., None], row[:, None, :], bx)
        n_ = n_ + rec.astype(jnp.int32)

        # buffers + transitions
        xb = jnp.where(xn, val, xb)
        yb = jnp.where(yrow, val, yb)
        new_mode = jnp.where(
            xn, MODE_Y,
            jnp.where(
                yrow, jnp.where(is_box, MODE_SIZE, MODE_XN),
                jnp.where(srow, MODE_XN, mode_),
            ),
        )

        # ---- per-row input embedding (XN rows feed x, Y rows feed y —
        # both are this iteration's decoded `val`)
        emb_coord = region_ops.encode_coordinate(
            val[:, None].astype(emb_dtype), region_params
        )
        emb_size = region_ops.encode_size(
            wh.astype(emb_dtype), region_params
        )
        emb_text = text_params["wte"][cur]
        emb = jnp.where(
            is_text[:, None], emb_text,
            jnp.where(srow[:, None], emb_size, emb_coord),
        ).astype(emb_dtype)

        # text rows record their input token
        toks = toks.at[:, i].set(jnp.where(act & is_text, cur, 0))
        emit = emit.at[:, i].set(act & is_text)

        # ---- forward
        hid_new, kv_ = ragged_hidden_step(
            text_params, kv_, emb[:, None, :], pos_, config, kv_bound,
            loras=loras, vids=vids,
            pref=pref, pids=pids, prefix_len=prefix_len,
        )
        logits = lm_logits_batched(hid_new, text_params)

        # struct rows hold the new hidden + its continue token
        hid_ = jnp.where(is_struct[:, None], hid_new, hid_)
        pend_ = jnp.where(
            is_struct, jnp.argmax(logits, -1).astype(jnp.int32), pend_
        )
        mode_ = jnp.where(act & is_struct, new_mode, mode_)

        # text rows sample (suppressed logits), as in serve_chunk
        for sid in suppress_ids:
            logits = logits.at[:, sid].set(NEG_INF)
        rng_, sub = jax.random.split(rng_)
        nxt = sample_tokens_batched(logits, sub, temperature, top_p).astype(
            jnp.int32
        )
        bud = bud - act.astype(jnp.int32)
        text_done = is_text & ((nxt == eos_id) | (bud <= 0))
        new_act = act & ~text_done & (pos_ + 1 < max_pos)
        pos_ = jnp.where(act, pos_ + 1, pos_)
        cur = jnp.where(act & is_text, nxt, cur)
        return (kv_, cur, pos_, new_act, bud, rng_, toks, emit,
                mode_, hid_, pend_, xb, yb, bx, n_)

    (kv, cur, pos, active, budget, rng, toks, emit,
     mode, hid, pending, xbuf, ybuf, boxes, nobj) = jax.lax.fori_loop(
        0, chunk, body,
        (kv, cur_tokens, pos, active, budget, rng, toks0, emit0,
         mode, hid, pending, xbuf, ybuf, boxes, nobj),
    )
    return ServeChunkMixedResult(
        tokens=toks, emitted=emit, active=active, pos=pos, cur=cur,
        budget=budget, kv=kv, rng=rng, mode=mode, hid=hid, pending=pending,
        xbuf=xbuf, ybuf=ybuf, boxes=boxes, nobj=nobj,
    )


class ServeChunkMixedSpecResult(NamedTuple):
    tokens: jax.Array  # (S, n_iter * k) int32 — text rows' emitted tokens
    emitted: jax.Array  # (S, n_iter * k) bool
    active: jax.Array  # (S,) bool
    pos: jax.Array  # (S,) int32
    cur: jax.Array  # (S,) int32
    budget: jax.Array  # (S,) int32
    kv: KVCache
    mode: jax.Array  # (S,) int32
    hid: jax.Array  # (S, D)
    pending: jax.Array  # (S,) int32
    xbuf: jax.Array  # (S,) f32
    ybuf: jax.Array  # (S,) f32
    boxes: jax.Array  # (S, max_objects, 4) f32
    nobj: jax.Array  # (S,) int32
    hist: jax.Array  # (S, H) int32
    hist_cnt: jax.Array  # (S,) int32


def serve_chunk_mixed_spec(
    text_params: dict,
    region_params: dict,
    kv: KVCache,
    cur_tokens: jax.Array,  # (S,)
    pos: jax.Array,  # (S,)
    active: jax.Array,  # (S,) bool
    budget: jax.Array,  # (S,) int32
    hist: jax.Array,  # (S, H) int32
    hist_cnt: jax.Array,  # (S,) int32
    mode: jax.Array,  # (S,) int32
    hid: jax.Array,  # (S, D)
    pending: jax.Array,  # (S,) int32
    xbuf: jax.Array,  # (S,) f32
    ybuf: jax.Array,  # (S,) f32
    boxes: jax.Array,  # (S, max_objects, 4) f32
    nobj: jax.Array,  # (S,) int32
    is_box: jax.Array,  # (S,) bool
    loras: Optional[dict] = None,
    vids: Optional[jax.Array] = None,
    pref: Optional[KVCache] = None,
    pids: Optional[jax.Array] = None,
    *,
    config: TextConfig,
    eos_id: int,
    suppress_ids: Tuple[int, ...],
    n_iter: int,
    spec_k: int,
    max_objects: int,
    kv_bound: Optional[int] = None,
    prefix_len: int = 0,
) -> ServeChunkMixedSpecResult:
    """Speculative MIXED chunk (greedy): text rows draft k-token spans
    from their device-resident histories while structured rows
    (detect/point/gaze) advance their 1-token coordinate state machines
    inside the SAME ragged span verify forward.

    Composition of serve_chunk_spec (text acceptance) and
    serve_chunk_mixed (structured state machine): struct rows override
    span position 0 with their coordinate/size embedding
    (ragged_verify_step x_override) and always accept exactly one
    position (m = 1); span positions 1..k-1 write garbage K/V beyond the
    row's accepted position, which later steps overwrite before they can
    be attended — the same mechanism that discards rejected text drafts.
    Text rows are token-identical to serve_chunk_spec; struct rows are
    box/point-identical to serve_chunk_mixed (greedy pools)."""
    from ..models import region as region_ops
    from ..ops.layers import mlp as _mlp

    S = cur_tokens.shape[0]
    W = n_iter * spec_k
    H = hist.shape[1]
    emb_dtype = text_params["wte"].dtype
    toks0 = jnp.zeros((S, W), jnp.int32)
    emit0 = jnp.zeros((S, W), jnp.bool_)
    col0 = jnp.zeros((S,), jnp.int32)
    rows = jnp.arange(S, dtype=jnp.int32)
    max_pos = (kv_bound or config.max_context) + prefix_len

    def body(_, c):
        (kv_, cur, pos_, act, bud, h_, cnt, col, toks, emit,
         mode_, hid_, pend_, xb, yb, bx, n_) = c
        is_text = mode_ == MODE_TEXT
        is_struct = ~is_text

        # ---- struct rows consume the held hidden (as serve_chunk_mixed)
        coord_logits = region_ops.decode_coordinate(hid_, region_params)
        val = (
            jnp.argmax(coord_logits, -1).astype(jnp.float32)
            / coord_logits.shape[-1]
        )
        size_logits = _mlp(hid_, region_params["size_decoder"]).reshape(
            S, 2, -1
        )
        wh = region_ops.size_bin_to_value(jnp.argmax(size_logits, -1))

        xn = is_struct & (mode_ == MODE_XN) & act
        # span forwards write spec_k K/V rows, so struct rows stop while
        # pos + spec_k (the span) + 3 (the object's remaining steps) fits
        stop = (
            (pend_ == eos_id) | (n_ >= max_objects)
            | (pos_ + spec_k + 3 >= max_pos) | (bud <= 0)
        )
        act = act & ~(xn & stop)
        xn = xn & ~stop

        yrow = is_struct & (mode_ == MODE_Y) & act
        srow = is_struct & (mode_ == MODE_SIZE) & act

        rec_point = yrow & ~is_box
        point_row = jnp.stack(
            [xb, val, jnp.zeros_like(xb), jnp.zeros_like(xb)], -1
        )
        box_row = jnp.stack(
            [xb - wh[:, 0] / 2, yb - wh[:, 1] / 2,
             xb + wh[:, 0] / 2, yb + wh[:, 1] / 2], -1,
        )
        rec = rec_point | srow
        row = jnp.where(srow[:, None], box_row, point_row)
        upd = (jnp.arange(max_objects)[None, :] == n_[:, None]) & rec[:, None]
        bx = jnp.where(upd[..., None], row[:, None, :], bx)
        n_ = n_ + rec.astype(jnp.int32)

        xb = jnp.where(xn, val, xb)
        yb = jnp.where(yrow, val, yb)
        new_mode = jnp.where(
            xn, MODE_Y,
            jnp.where(
                yrow, jnp.where(is_box, MODE_SIZE, MODE_XN),
                jnp.where(srow, MODE_XN, mode_),
            ),
        )
        emb_coord = region_ops.encode_coordinate(
            val[:, None].astype(emb_dtype), region_params
        )
        emb_size = region_ops.encode_size(wh.astype(emb_dtype), region_params)
        emb_struct = jnp.where(srow[:, None], emb_size, emb_coord)

        # ---- text rows: emit cur + history append + bigram draft
        text_act = act & is_text
        toks = toks.at[rows, jnp.where(text_act, col, W)].set(
            cur, mode="drop"
        )
        emit = emit.at[rows, jnp.where(text_act, col, W)].set(
            True, mode="drop"
        )
        h_ = h_.at[
            rows, jnp.where(text_act, jnp.minimum(cnt, H - 1), H)
        ].set(cur, mode="drop")
        cnt1 = cnt + text_act.astype(jnp.int32)

        draft, _ = ngram_draft_rows(h_, cnt1, cur, spec_k)

        # ---- ONE ragged span verify for the whole pool; struct rows feed
        # their coordinate/size embedding at span position 0
        q_toks = jnp.concatenate([cur[:, None], draft], axis=1)
        logits, hidden, kv_ = ragged_verify_step(
            text_params, kv_, q_toks, pos_, config, kv_bound,
            loras=loras, vids=vids,
            x_override=emb_struct, x_mask=is_struct,
            pref=pref, pids=pids, prefix_len=prefix_len,
        )

        # struct rows hold span position 0's hidden + continue token
        # (UNsuppressed logits, as serve_chunk_mixed)
        hid_ = jnp.where(is_struct[:, None], hidden[:, 0], hid_)
        pend_ = jnp.where(
            is_struct, jnp.argmax(logits[:, 0], -1).astype(jnp.int32), pend_
        )
        mode_ = jnp.where(act & is_struct, new_mode, mode_)

        for sid in suppress_ids:
            logits = logits.at[:, :, sid].set(NEG_INF)
        g = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # (S, k)

        # ---- text acceptance (serve_chunk_spec's rule)
        ok = (draft == g[:, :-1]).astype(jnp.int32)
        m = 1 + jnp.sum(jnp.cumprod(ok, axis=1), axis=1)
        is_eos = g == eos_id
        eos_pos = jnp.argmax(is_eos, axis=1)
        m = jnp.where(
            jnp.any(is_eos, axis=1) & (eos_pos + 1 < m), eos_pos + 1, m
        )
        m = jnp.minimum(m, bud)
        # struct rows advance exactly one position per iteration
        m = jnp.where(is_text, m, 1)
        m = jnp.where(act, m, 0)

        for j in range(spec_k - 1):
            valid = text_act & (j + 1 < m)
            toks = toks.at[rows, jnp.where(valid, col + 1 + j, W)].set(
                g[:, j], mode="drop"
            )
            emit = emit.at[rows, jnp.where(valid, col + 1 + j, W)].set(
                True, mode="drop"
            )
            h_ = h_.at[
                rows, jnp.where(valid, jnp.minimum(cnt1 + j, H - 1), H)
            ].set(g[:, j], mode="drop")

        nxt = g[rows, jnp.maximum(m - 1, 0)]
        cur = jnp.where(text_act, nxt, cur)
        pos_ = pos_ + m
        bud = bud - m
        cnt2 = cnt1 + jnp.maximum(m - 1, 0) * text_act.astype(jnp.int32)
        col = col + m
        text_done = is_text & ((cur == eos_id) | (bud <= 0))
        act = act & ~text_done & (pos_ + spec_k <= max_pos)
        return (kv_, cur, pos_, act, bud, h_, cnt2, col, toks, emit,
                mode_, hid_, pend_, xb, yb, bx, n_)

    (kv, cur, pos, active, budget, hist, hist_cnt, _, toks, emit,
     mode, hid, pending, xbuf, ybuf, boxes, nobj) = jax.lax.fori_loop(
        0, n_iter, body,
        (kv, cur_tokens, pos, active, budget, hist, hist_cnt, col0,
         toks0, emit0, mode, hid, pending, xbuf, ybuf, boxes, nobj),
    )
    return ServeChunkMixedSpecResult(
        tokens=toks, emitted=emit, active=active, pos=pos, cur=cur,
        budget=budget, kv=kv, mode=mode, hid=hid, pending=pending,
        xbuf=xbuf, ybuf=ybuf, boxes=boxes, nobj=nobj,
        hist=hist, hist_cnt=hist_cnt,
    )
