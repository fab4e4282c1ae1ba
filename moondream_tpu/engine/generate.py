"""Generation engine: jitted prefill / decode-step / fused decode loops.

This replaces the reference's per-token Python loop with `.item()` host syncs
(/root/reference/moondream/torch/moondream.py:368-539) with device-resident
`lax.while_loop`s: the KV cache, position, sampling state, and token buffer
all live on device; one jit call produces the whole generation. A separate
single-step path (`decode_step`) powers true incremental streaming.

All functions are pure; `MoondreamModel` wraps them in jit with static
configs and donated caches.

Mask model
----------
The reference precomputes a (ctx, ctx) mask = causal OR bidirectional block
over the first 730 positions (moondream.py:138-146) and slices rows from it.
We build the same rows on the fly from (pos, prefix_len): row i (global
position pos+i) may attend column j iff ``j <= pos+i`` or
``pos+i < prefix and j < prefix``. ``prefix_len`` is a traced scalar: 0 for
text-only sessions (pure causal, moondream.py:566-574), 730 after an image.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import TextConfig
from ..models import region as region_ops
from ..models import text as text_ops
from ..models.text import KVCache
from .drafting import ngram_draft
from .sampling import sample_token

# plain Python float: a module-level jnp scalar would initialize the
# default JAX backend at IMPORT time (observed hanging every CLI
# subprocess when the TPU tunnel is down); jnp ops accept weak floats
NEG_INF = -1e30


def _lm_logits(h: jax.Array, text_params: dict) -> jax.Array:
    """Final LayerNorm + vocab projection on one hidden vector
    (reference text.py:163-167). Computed with fp32 accumulation, rounded
    through bf16 (matching the reference's bf16 lm_head output for greedy
    token parity) and returned as fp32 for sampling.
    """
    from ..ops.layers import layer_norm

    hn = layer_norm(h, text_params["post_ln"])
    logits = jnp.dot(
        hn, text_params["lm_head"]["w"], preferred_element_type=jnp.float32
    )
    b = text_params["lm_head"]["b"]
    if b is not None:
        logits = logits + b.astype(jnp.float32)
    return logits.astype(jnp.bfloat16).astype(jnp.float32)


def prefill(
    text_params: dict,
    kv: KVCache,
    embeds: jax.Array,
    pos: jax.Array,
    length: jax.Array,
    prefix_len: jax.Array,
    config: TextConfig,
    lora: Optional[dict] = None,
    kv_bound: Optional[int] = None,
    steer: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array, KVCache]:
    """Prefill a (possibly right-padded) span of embeddings.

    embeds: (1, L_pad, D); `length` = real token count. Padding rows write
    garbage K/V beyond pos+length; those slots are never attended before
    being overwritten by subsequent writes (decode writes are contiguous).
    `kv_bound` (static): when the caller guarantees pos+L <= kv_bound,
    attention reads only that prefix of the cache instead of all
    max_context slots (3x less attention traffic for the 730-token image
    prefill). `steer`: optional (L, D) pre-scaled control vectors (repeng).
    Returns (last-real-position logits (V,), hidden (D,), cache).
    """
    hidden, kv = text_ops.text_decoder(
        embeds, text_params, kv, pos, prefix_len, config, lora, kv_bound, steer
    )
    h_last = jax.lax.dynamic_index_in_dim(hidden, length - 1, axis=1, keepdims=False)[0]
    return _lm_logits(h_last, text_params), h_last, kv


def decode_step(
    text_params: dict,
    kv: KVCache,
    emb: jax.Array,
    pos: jax.Array,
    config: TextConfig,
    lora: Optional[dict] = None,
    steer: Optional[jax.Array] = None,
    kv_bound: Optional[int] = None,
) -> Tuple[jax.Array, jax.Array, KVCache]:
    """One decode step. emb: (1, 1, D). `kv_bound` (static) restricts
    attention reads to the first kv_bound cache slots when the caller knows
    the whole generation stays under it — at 2048-slot caches and ~900-token
    sessions this halves the per-step KV traffic.
    Returns (logits (V,), hidden (D,), kv)."""
    hidden, kv = text_ops.text_decoder(
        emb, text_params, kv, pos, jnp.int32(0), config, lora, kv_bound, steer
    )
    h = hidden[0, 0]
    return _lm_logits(h, text_params), h, kv


def _suppress(logits: jax.Array, ids: Tuple[int, ...]) -> jax.Array:
    for i in ids:
        logits = logits.at[i].set(NEG_INF)
    return logits


class GenerateResult(NamedTuple):
    tokens: jax.Array  # (buffer,) int32
    count: jax.Array  # scalar int32 — number of valid tokens
    kv: KVCache
    pos: jax.Array


def generate_text(
    text_params: dict,
    kv: KVCache,
    first_token: jax.Array,
    pos: jax.Array,
    rng: jax.Array,
    temperature: jax.Array,
    top_p: jax.Array,
    max_tokens: jax.Array,
    config: TextConfig,
    eos_id: int,
    suppress_ids: Tuple[int, ...],
    buffer: int,
    lora: Optional[dict] = None,
    steer: Optional[jax.Array] = None,
    kv_bound: Optional[int] = None,
) -> GenerateResult:
    """Fused answer generation (reference loop: moondream.py:471-539).

    Collects tokens until EOS / max_tokens / context end. The EOS token is
    not emitted. `suppress_ids` are masked from every step's logits (the
    answer id during answering, moondream.py:517). `steer`: optional (L, D)
    pre-scaled control vectors added per layer (repeng). `kv_bound`
    (static): cache-read bound covering pos + max_tokens."""
    tokens0 = jnp.zeros((buffer,), jnp.int32)
    limit = jnp.minimum(max_tokens, jnp.int32(config.max_context) - pos)
    if kv_bound is not None:
        limit = jnp.minimum(limit, jnp.int32(kv_bound) - pos)

    def cond(c):
        kv_, pos_, tok, i, rng_, toks = c
        return (tok != eos_id) & (i < limit)

    def body(c):
        kv_, pos_, tok, i, rng_, toks = c
        toks = toks.at[i].set(tok)
        emb = text_params["wte"][tok][None, None, :]
        logits, _, kv_ = decode_step(
            text_params, kv_, emb, pos_, config, lora, steer, kv_bound
        )
        logits = _suppress(logits, suppress_ids)
        rng_, sub = jax.random.split(rng_)
        nxt = sample_token(logits, sub, temperature, top_p).astype(jnp.int32)
        return (kv_, pos_ + 1, nxt, i + 1, rng_, toks)

    kv, pos, _, count, _, tokens = jax.lax.while_loop(
        cond, body, (kv, pos, first_token, jnp.int32(0), rng, tokens0)
    )
    return GenerateResult(tokens=tokens, count=count, kv=kv, pos=pos)


def generate_text_spec(
    text_params: dict,
    kv: KVCache,
    first_token: jax.Array,
    pos: jax.Array,
    max_tokens: jax.Array,
    config: TextConfig,
    eos_id: int,
    suppress_ids: Tuple[int, ...],
    buffer: int,
    spec_k: int = 8,
    lora: Optional[dict] = None,
    steer: Optional[jax.Array] = None,
    kv_bound: Optional[int] = None,
    seed: Optional[jax.Array] = None,
) -> GenerateResult:
    """Speculative greedy generation: n-gram (prompt-lookup) drafting with
    exact verification — output tokens match `generate_text` at
    temperature 0 (verification accepts a draft token only when it equals
    the greedy continuation), but each loop iteration advances 1..spec_k
    tokens for ONE pass over the weights. Caveat on "match": the verify
    forward computes logits over a (spec_k, D) span while the plain loop
    uses (1, D) steps; XLA does not promise bitwise-equal accumulation
    across those shapes, so a near-tie between the top-2 logits could in
    principle flip an argmax. Equality is validated empirically (CPU
    parity suites over many seeds + on-chip tools/spec_parity_tpu.py),
    not structurally guaranteed.

    Single-stream decode is HBM-bound (the 2B bf16 weights are 2.8GB per
    token); a spec_k-token verify forward costs the same weight traffic as
    one decode step, so tokens/sec scales with the draft acceptance rate.
    Drafts come from the generated history itself: the most recent position
    where the current bigram (prev, cur) occurred supplies the following
    spec_k-1 tokens (no draft model, no extra weights — the TPU-native
    analog of vLLM's prompt-lookup / ngram speculator). When no bigram
    matches, the draft is the current token repeated (covers degenerate
    repetition); wrong drafts cost nothing beyond the already-paid forward.

    The drafting, the k-token verify (a short prefill at positions
    pos..pos+k-1 — stale cache rows past the accepted prefix are
    overwritten by the next iteration's contiguous writes before they can
    be attended), acceptance, and the buffer scatter all run inside one
    device-resident `lax.while_loop`: zero host syncs per token, same as
    the plain fused loop.

    `kv_bound`, when given, must cover pos + max_tokens + spec_k (the
    verify span can overrun the last emitted token by spec_k-1 slots).
    Near the context end the loop stops spec_k-1 tokens earlier than the
    plain loop would (the verify span must fit).

    `seed`: optional fixed-width (S0,) int32 prompt tail (left-padded with
    -1) prepended to the DRAFT history — prompt-lookup proper: answers
    that copy entities from the question draft from the prompt's n-grams.
    Seeding only changes draft quality, never outputs (pad -1 can match
    no real bigram, and every draft is verified).
    """
    tokens0 = jnp.zeros((buffer,), jnp.int32)
    s0 = 0 if seed is None else seed.shape[0]
    hist0 = (
        tokens0 if seed is None
        else jnp.concatenate([seed.astype(jnp.int32), tokens0])
    )
    hlen = s0 + buffer
    limit = jnp.minimum(
        max_tokens, jnp.int32(config.max_context - spec_k + 1) - pos
    )
    if kv_bound is not None:
        limit = jnp.minimum(limit, jnp.int32(kv_bound - spec_k + 1) - pos)

    def cond(c):
        kv_, pos_, tok, i, toks, hist = c
        return (tok != eos_id) & (i < limit)

    def body(c):
        kv_, pos_, tok, i, toks, hist = c
        toks = toks.at[i].set(tok)
        hist = hist.at[s0 + i].set(tok)

        # ---- draft: longest-suffix n-gram match in [prompt seed; emitted]
        draft, _ = ngram_draft(hist, s0 + i + 1, tok, spec_k)

        # ---- verify: one spec_k-token forward (prefill-style span)
        q_toks = jnp.concatenate([tok[None], draft])
        embs = text_params["wte"][q_toks][None, :, :]
        hidden, kv_ = text_ops.text_decoder(
            embs, text_params, kv_, pos_, jnp.int32(0), config, lora,
            kv_bound, steer,
        )
        logits = _lm_logits(hidden[0], text_params)  # (spec_k, V) — _lm_logits is shape-generic
        for sid in suppress_ids:
            logits = logits.at[:, sid].set(NEG_INF)
        g = jnp.argmax(logits, -1).astype(jnp.int32)  # greedy continuations

        # ---- accept the longest draft prefix matching the greedy chain
        ok = (draft == g[:-1]).astype(jnp.int32)
        m = 1 + jnp.sum(jnp.cumprod(ok))  # tokens emitted this iteration
        # stop at EOS: cut m so the first in-range EOS becomes the carried
        # token (cond exits without emitting it, like the plain loop)
        is_eos = g == eos_id
        eos_pos = jnp.argmax(is_eos)
        m = jnp.where(jnp.any(is_eos) & (eos_pos + 1 < m), eos_pos + 1, m)
        m = jnp.minimum(m, limit - i)  # never emit past max_tokens

        # interior accepted tokens g[0..m-2] land at toks[i+1..i+m-1];
        # g[m-1] is carried and written by the next iteration
        for j in range(spec_k - 1):
            idx = jnp.where(j + 1 < m, i + 1 + j, buffer)
            toks = toks.at[idx].set(g[j], mode="drop")
            hist = hist.at[jnp.where(j + 1 < m, s0 + i + 1 + j, hlen)].set(
                g[j], mode="drop"
            )
        nxt = g[m - 1]
        return (kv_, pos_ + m, nxt, i + m, toks, hist)

    kv, pos, _, count, tokens, _ = jax.lax.while_loop(
        cond, body, (kv, pos, first_token, jnp.int32(0), tokens0, hist0)
    )
    return GenerateResult(tokens=tokens, count=count, kv=kv, pos=pos)


def generate_text_spec_sampled(
    text_params: dict,
    kv: KVCache,
    first_token: jax.Array,
    pos: jax.Array,
    rng: jax.Array,
    temperature: jax.Array,
    top_p: jax.Array,
    max_tokens: jax.Array,
    config: TextConfig,
    eos_id: int,
    suppress_ids: Tuple[int, ...],
    buffer: int,
    spec_k: int = 8,
    lora: Optional[dict] = None,
    steer: Optional[jax.Array] = None,
    kv_bound: Optional[int] = None,
    seed: Optional[jax.Array] = None,
) -> GenerateResult:
    """Speculative SAMPLING (temperature > 0): n-gram drafts accepted by
    rejection against the target nucleus distribution — the emitted
    sequence is distributed EXACTLY as the plain sampled loop's (standard
    speculative-sampling argument: a deterministic draft d is accepted
    with probability p(d); on rejection the token is drawn from the
    residual p with d removed, renormalized — the unconditional marginal
    is p either way). Outputs are NOT bit-identical to `generate_text`
    for the same rng (RNG consumption differs); the DISTRIBUTION is
    preserved, which is the contract sampling users rely on. After all
    spec_k-1 drafts are accepted, a bonus token is drawn from the last
    slot's distribution, so an iteration advances 1..spec_k tokens for
    one weight pass. The reference's default settings (temperature 0.5,
    top_p 0.3, moondream.py:26-53) are exactly this regime.

    Same cache-overwrite/seed/kv_bound contracts as `generate_text_spec`.
    """
    from .sampling import target_probs

    tokens0 = jnp.zeros((buffer,), jnp.int32)
    s0 = 0 if seed is None else seed.shape[0]
    hist0 = (
        tokens0 if seed is None
        else jnp.concatenate([seed.astype(jnp.int32), tokens0])
    )
    hlen = s0 + buffer
    limit = jnp.minimum(
        max_tokens, jnp.int32(config.max_context - spec_k + 1) - pos
    )
    if kv_bound is not None:
        limit = jnp.minimum(limit, jnp.int32(kv_bound - spec_k + 1) - pos)

    def cond(c):
        kv_, pos_, tok, i, rng_, toks, hist = c
        return (tok != eos_id) & (i < limit)

    def body(c):
        kv_, pos_, tok, i, rng_, toks, hist = c
        toks = toks.at[i].set(tok)
        hist = hist.at[s0 + i].set(tok)

        # ---- draft (same n-gram lookup as the greedy spec loop)
        draft, _ = ngram_draft(hist, s0 + i + 1, tok, spec_k)

        # ---- one spec_k-token verify forward
        q_toks = jnp.concatenate([tok[None], draft])
        embs = text_params["wte"][q_toks][None, :, :]
        hidden, kv_ = text_ops.text_decoder(
            embs, text_params, kv_, pos_, jnp.int32(0), config, lora,
            kv_bound, steer,
        )
        logits = _lm_logits(hidden[0], text_params)  # (spec_k, V)
        for sid in suppress_ids:
            logits = logits.at[:, sid].set(NEG_INF)
        p = target_probs(logits, temperature, top_p)  # (spec_k, V)

        # ---- rejection acceptance: accept draft j+1 w.p. p[j, draft[j]]
        rng_, k_acc, k_res = jax.random.split(rng_, 3)
        u = jax.random.uniform(k_acc, (spec_k - 1,))
        p_draft = p[jnp.arange(spec_k - 1), draft]
        acc = (u < p_draft).astype(jnp.int32)
        n_acc = jnp.sum(jnp.cumprod(acc))  # leading accepted drafts

        # the sampled tail token for EVERY possible rejection slot (and
        # the bonus slot), then select slot n_acc: residual = p with the
        # rejected draft removed; bonus (all accepted) = p[k-1] itself
        res_keys = jax.random.split(k_res, spec_k)
        p_res = p
        onehot = jax.nn.one_hot(draft, p.shape[-1], dtype=p.dtype)
        p_res = p_res.at[: spec_k - 1].set(
            jnp.maximum(p[: spec_k - 1] - onehot * 1e9, 0.0)
        )  # zero the draft's column in rows 0..k-2
        samp = jax.vmap(
            lambda key, pr: jax.random.categorical(
                key, jnp.log(jnp.maximum(pr, 1e-30))
            )
        )(res_keys, p_res).astype(jnp.int32)
        tail = samp[n_acc]

        # emitted sequence: draft[0..n_acc-1] then the sampled tail
        m = n_acc + 1
        emitted = jnp.concatenate([draft, tail[None]])  # only [:m] is real
        emitted = jnp.where(
            jnp.arange(spec_k) == n_acc, tail, emitted
        )
        # EOS: first emitted eos becomes the carried token
        is_eos = (emitted == eos_id) & (jnp.arange(spec_k) < m)
        eos_pos = jnp.argmax(is_eos)
        m = jnp.where(jnp.any(is_eos) & (eos_pos + 1 < m), eos_pos + 1, m)
        m = jnp.minimum(m, limit - i)

        for j in range(spec_k - 1):
            idx = jnp.where(j + 1 < m, i + 1 + j, buffer)
            toks = toks.at[idx].set(emitted[j], mode="drop")
            hist = hist.at[jnp.where(j + 1 < m, s0 + i + 1 + j, hlen)].set(
                emitted[j], mode="drop"
            )
        nxt = emitted[m - 1]
        return (kv_, pos_ + m, nxt, i + m, rng_, toks, hist)

    kv, pos, _, count, _, tokens, _ = jax.lax.while_loop(
        cond, body, (kv, pos, first_token, jnp.int32(0), rng, tokens0, hist0)
    )
    return GenerateResult(tokens=tokens, count=count, kv=kv, pos=pos)


def verify_step(
    text_params: dict,
    kv: KVCache,
    q_toks: jax.Array,
    pos: jax.Array,
    config: TextConfig,
    suppress_ids: Tuple[int, ...] = (),
    lora: Optional[dict] = None,
    steer: Optional[jax.Array] = None,
    kv_bound: Optional[int] = None,
) -> Tuple[jax.Array, KVCache]:
    """One speculative verify step for the STREAMING path: forward the
    (spec_k,) token span q_toks at positions pos..pos+spec_k-1 and return
    (greedy continuation ids (spec_k,) int32, kv). The host drafts (bigram
    lookup over its own generated-id list), computes acceptance, and feeds
    the streamer — so each host round trip advances 1..spec_k tokens
    instead of 1 (the tunnel RTT dominates per-token streaming here)."""
    embs = text_params["wte"][q_toks][None, :, :]
    hidden, kv = text_ops.text_decoder(
        embs, text_params, kv, pos, jnp.int32(0), config, lora, kv_bound,
        steer,
    )
    logits = _lm_logits(hidden[0], text_params)
    for sid in suppress_ids:
        logits = logits.at[:, sid].set(NEG_INF)
    return jnp.argmax(logits, -1).astype(jnp.int32), kv


def verify_step_sampled(
    text_params: dict,
    kv: KVCache,
    q_toks: jax.Array,  # (spec_k,) = [cur, draft...]
    pos: jax.Array,
    rng: jax.Array,
    temperature: jax.Array,
    top_p: jax.Array,
    config: TextConfig,
    suppress_ids: Tuple[int, ...] = (),
    lora: Optional[dict] = None,
    steer: Optional[jax.Array] = None,
    kv_bound: Optional[int] = None,
) -> Tuple[jax.Array, jax.Array, KVCache]:
    """One speculative-SAMPLING verify step for the streaming path: the
    rejection test and residual/bonus draws all run on device; returns
    (emitted (spec_k,) where [:m] are the iteration's new tokens,
    m scalar, kv). The host applies EOS/max_tokens cuts and feeds the
    streamer — each round trip advances 1..spec_k tokens with the exact
    plain-loop output distribution (see generate_text_spec_sampled)."""
    from .sampling import target_probs

    spec_k = q_toks.shape[0]
    draft = q_toks[1:]
    embs = text_params["wte"][q_toks][None, :, :]
    hidden, kv = text_ops.text_decoder(
        embs, text_params, kv, pos, jnp.int32(0), config, lora, kv_bound,
        steer,
    )
    logits = _lm_logits(hidden[0], text_params)
    for sid in suppress_ids:
        logits = logits.at[:, sid].set(NEG_INF)
    p = target_probs(logits, temperature, top_p)

    k_acc, k_res = jax.random.split(rng)
    u = jax.random.uniform(k_acc, (spec_k - 1,))
    p_draft = p[jnp.arange(spec_k - 1), draft]
    n_acc = jnp.sum(jnp.cumprod((u < p_draft).astype(jnp.int32)))

    res_keys = jax.random.split(k_res, spec_k)
    onehot = jax.nn.one_hot(draft, p.shape[-1], dtype=p.dtype)
    p_res = p.at[: spec_k - 1].set(
        jnp.maximum(p[: spec_k - 1] - onehot * 1e9, 0.0)
    )
    samp = jax.vmap(
        lambda key, pr: jax.random.categorical(
            key, jnp.log(jnp.maximum(pr, 1e-30))
        )
    )(res_keys, p_res).astype(jnp.int32)
    tail = samp[n_acc]

    emitted = jnp.where(jnp.arange(spec_k) == n_acc, tail, q_toks)
    # shift: emitted[j] for j < n_acc is draft[j] (= q_toks[j+1])
    emitted = jnp.where(
        jnp.arange(spec_k) < n_acc, jnp.roll(q_toks, -1), emitted
    )
    return emitted, n_acc + 1, kv


class ReasoningResult(NamedTuple):
    tokens: jax.Array  # (buffer,) int32
    is_coord: jax.Array  # (buffer,) bool — token i was a grounding coordinate
    coord_vals: jax.Array  # (buffer,) f32 — decoded coordinate when is_coord
    count: jax.Array
    kv: KVCache
    pos: jax.Array


def generate_reasoning(
    text_params: dict,
    region_params: dict,
    kv: KVCache,
    first_token: jax.Array,
    first_hidden: jax.Array,
    pos: jax.Array,
    rng: jax.Array,
    temperature: jax.Array,
    top_p: jax.Array,
    max_tokens: jax.Array,
    config: TextConfig,
    answer_id: int,
    coord_id: int,
    suppress_ids: Tuple[int, ...],
    buffer: int,
    lora: Optional[dict] = None,
    kv_bound: Optional[int] = None,
) -> ReasoningResult:
    """Fused reasoning loop with inline grounding
    (reference moondream.py:323-432): when the model emits `coord_id`, the
    previous hidden state decodes to a coordinate whose embedding feeds the
    next step instead of a token embedding; EOS for this phase is the answer
    id; eos/size ids are suppressed every step (moondream.py:397-398)."""
    tokens0 = jnp.zeros((buffer,), jnp.int32)
    coords0 = jnp.zeros((buffer,), jnp.float32)
    isco0 = jnp.zeros((buffer,), jnp.bool_)
    limit = jnp.minimum(max_tokens, jnp.int32(config.max_context) - pos)
    if kv_bound is not None:
        limit = jnp.minimum(limit, jnp.int32(kv_bound) - pos)
    emb_dtype = text_params["wte"].dtype

    def cond(c):
        kv_, pos_, tok, hid, i, rng_, toks, cvals, isco = c
        return (tok != answer_id) & (i < limit)

    def body(c):
        kv_, pos_, tok, hid, i, rng_, toks, cvals, isco = c
        toks = toks.at[i].set(tok)

        def coord_emb(_):
            logits_c = region_ops.decode_coordinate(hid, region_params)
            val = (
                jnp.argmax(logits_c, axis=-1).astype(jnp.float32)
                / logits_c.shape[-1]
            )
            emb = region_ops.encode_coordinate(
                val[None].astype(emb_dtype), region_params
            )
            return emb, val

        def tok_emb(_):
            return text_params["wte"][tok].astype(emb_dtype), jnp.float32(0.0)

        emb, cval = jax.lax.cond(tok == coord_id, coord_emb, tok_emb, None)
        cvals = cvals.at[i].set(cval)
        isco = isco.at[i].set(tok == coord_id)

        logits, hid, kv_ = decode_step(
            text_params, kv_, emb[None, None, :], pos_, config, lora, None,
            kv_bound,
        )
        logits = _suppress(logits, suppress_ids)
        rng_, sub = jax.random.split(rng_)
        nxt = sample_token(logits, sub, temperature, top_p).astype(jnp.int32)
        return (kv_, pos_ + 1, nxt, hid, i + 1, rng_, toks, cvals, isco)

    kv, pos, _, _, count, _, tokens, coord_vals, is_coord = jax.lax.while_loop(
        cond,
        body,
        (kv, pos, first_token, first_hidden, jnp.int32(0), rng, tokens0, coords0, isco0),
    )
    return ReasoningResult(
        tokens=tokens, is_coord=is_coord, coord_vals=coord_vals,
        count=count, kv=kv, pos=pos,
    )


class PointsResult(NamedTuple):
    boxes: jax.Array  # (max_objects, 4) f32 — [x,y,0,0] rows when points-only
    count: jax.Array
    kv: KVCache
    pos: jax.Array


def generate_points(
    text_params: dict,
    region_params: dict,
    kv: KVCache,
    first_hidden: jax.Array,
    first_token: jax.Array,
    pos: jax.Array,
    config: TextConfig,
    eos_id: int,
    include_size: bool,
    max_objects: int,
    lora: Optional[dict] = None,
    kv_bound: Optional[int] = None,
) -> PointsResult:
    """Fused structured coordinate decode (reference moondream.py:653-733).

    Per object: x from the current hidden; one step on enc(x) gives y;
    with sizes, a further step decodes (w, h) log-bins; a final step on the
    object's last embedding yields continue/EOS. All greedy (argmax).
    """
    boxes0 = jnp.zeros((max_objects, 4), jnp.float32)
    emb_dtype = text_params["wte"].dtype

    def step(kv_, emb, pos_):
        return decode_step(
            text_params, kv_, emb[None, None, :], pos_, config, lora, None,
            kv_bound,
        )

    pos_limit = config.max_context if kv_bound is None else kv_bound

    def cond(c):
        kv_, pos_, hid, tok, n, boxes = c
        return (tok != eos_id) & (n < max_objects) & (pos_ < pos_limit - 4)

    def body(c):
        kv_, pos_, hid, tok, n, boxes = c

        x_logits = region_ops.decode_coordinate(hid, region_params)
        x = jnp.argmax(x_logits, -1).astype(jnp.float32) / x_logits.shape[-1]
        emb = region_ops.encode_coordinate(x[None].astype(emb_dtype), region_params)

        _, hid, kv_ = step(kv_, emb, pos_)
        pos_ = pos_ + 1
        y_logits = region_ops.decode_coordinate(hid, region_params)
        y = jnp.argmax(y_logits, -1).astype(jnp.float32) / y_logits.shape[-1]
        emb = region_ops.encode_coordinate(y[None].astype(emb_dtype), region_params)

        if include_size:
            _, hid, kv_ = step(kv_, emb, pos_)
            pos_ = pos_ + 1
            size_logits = region_ops.decode_size(hid, region_params)
            wh = region_ops.size_bin_to_value(jnp.argmax(size_logits, -1))
            emb = region_ops.encode_size(wh.astype(emb_dtype), region_params)
            row = jnp.stack(
                [x - wh[0] / 2, y - wh[1] / 2, x + wh[0] / 2, y + wh[1] / 2]
            )
        else:
            row = jnp.stack([x, y, jnp.float32(0), jnp.float32(0)])

        boxes = boxes.at[n].set(row)

        logits, hid, kv_ = step(kv_, emb, pos_)
        pos_ = pos_ + 1
        tok = jnp.argmax(logits, -1).astype(jnp.int32)
        return (kv_, pos_, hid, tok, n + 1, boxes)

    kv, pos, _, _, count, boxes = jax.lax.while_loop(
        cond, body, (kv, pos, first_hidden, first_token, jnp.int32(0), boxes0)
    )
    return PointsResult(boxes=boxes, count=count, kv=kv, pos=pos)
