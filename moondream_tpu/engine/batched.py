"""Lockstep batched inference engine.

The reference is strictly batch-1 (`batch_answer` is a Python loop,
hf_moondream.py:99-103; KV caches are allocated with batch 1,
moondream.py:66). On TPU, single-request decode is weight-bandwidth-bound —
every generated token re-reads all model weights from HBM — so batching B
requests multiplies throughput nearly B-fold until the MXU saturates.

This module batches *symmetric* requests (same prompt tokens, e.g. caption
over N images) in lockstep: one shared position counter, per-request EOS
tracking, one fused `lax.while_loop`. Identical-prompt batching is
parity-exact with the single-request path (same positions, same mask).
Asymmetric continuous batching (rolling admission, per-row positions) builds
on the same cache layout later.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import TextConfig
from ..models import text as text_ops
from ..models.text import KVCache
from .drafting import ngram_draft_rows
from .generate import NEG_INF
from .sampling import apply_top_p_mask


def lm_logits_batched(h: jax.Array, text_params: dict) -> jax.Array:
    """(B, D) -> (B, V) fp32 logits (bf16-rounded, see generate._lm_logits)."""
    from ..ops.layers import layer_norm

    hn = layer_norm(h, text_params["post_ln"])
    logits = jnp.dot(
        hn, text_params["lm_head"]["w"], preferred_element_type=jnp.float32
    )
    b = text_params["lm_head"]["b"]
    if b is not None:
        logits = logits + b.astype(jnp.float32)
    return logits.astype(jnp.bfloat16).astype(jnp.float32)


def sample_tokens_batched(
    logits: jax.Array, rng: jax.Array, temperature: jax.Array, top_p: jax.Array
) -> jax.Array:
    """Per-row sampling over (B, V) logits; same semantics as
    sampling.sample_token. `temperature`/`top_p` may be scalars (whole
    pool shares one setting — the greedy fast path skips the vocab sort
    entirely) or (B,) arrays (per-request settings in the serving pool —
    greedy rows select their argmax via a per-row where, so they stay
    exact inside a mixed pool)."""
    per_row = getattr(temperature, "ndim", 0) == 1

    def greedy(_):
        return jnp.argmax(logits, axis=-1)

    def nucleus(_):
        t = temperature[:, None] if per_row else temperature
        p_lim = top_p[:, None] if getattr(top_p, "ndim", 0) == 1 else top_p
        safe_t = jnp.maximum(t, 1e-6)
        probs = jax.nn.softmax(logits / safe_t, axis=-1)
        order = jnp.argsort(-probs, axis=-1)
        probs_desc = jnp.take_along_axis(probs, order, axis=-1)
        filtered = apply_top_p_mask(probs_desc, p_lim)
        idx = jax.random.categorical(
            rng, jnp.log(jnp.maximum(filtered, 1e-30)), axis=-1
        )
        return jnp.take_along_axis(order, idx[:, None], axis=-1)[:, 0]

    if per_row:
        return jnp.where(temperature <= 0.0, greedy(None), nucleus(None))
    return jax.lax.cond(temperature <= 0.0, greedy, nucleus, None)


def prefill_batched(
    text_params: dict,
    kv: KVCache,
    embeds: jax.Array,
    pos: jax.Array,
    length: jax.Array,
    prefix_len: jax.Array,
    config: TextConfig,
    lora: Optional[dict] = None,
    kv_bound: Optional[int] = None,
) -> Tuple[jax.Array, jax.Array, KVCache]:
    """Batched prefill: embeds (B, L_pad, D), shared pos/length.
    Returns ((B, V) logits, (B, D) hidden, cache)."""
    hidden, kv = text_ops.text_decoder(
        embeds, text_params, kv, pos, prefix_len, config, lora, kv_bound
    )
    h_last = jax.lax.dynamic_index_in_dim(hidden, length - 1, axis=1, keepdims=False)
    return lm_logits_batched(h_last, text_params), h_last, kv


def decode_step_batched(
    text_params: dict,
    kv: KVCache,
    emb: jax.Array,
    pos: jax.Array,
    config: TextConfig,
    lora: Optional[dict] = None,
    kv_bound: Optional[int] = None,
) -> Tuple[jax.Array, jax.Array, KVCache]:
    """One lockstep decode step. emb: (B, 1, D), shared position.
    Returns ((B, V) logits, (B, D) hidden, kv)."""
    hidden, kv = text_ops.text_decoder(
        emb, text_params, kv, pos, jnp.int32(0), config, lora, kv_bound
    )
    h = hidden[:, 0]
    return lm_logits_batched(h, text_params), h, kv


class BatchedGenerateResult(NamedTuple):
    tokens: jax.Array  # (B, buffer) int32
    counts: jax.Array  # (B,) int32 — valid tokens per row
    kv: KVCache
    pos: jax.Array


def generate_text_batched(
    text_params: dict,
    kv: KVCache,
    first_tokens: jax.Array,  # (B,)
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
    kv_bound: Optional[int] = None,
) -> BatchedGenerateResult:
    """Lockstep batched fused generation: shared position, per-row EOS.

    Rows that hit EOS keep stepping (their writes are masked and their K/V
    garbage sits at positions only they would attend) until every row is
    done or limits hit.
    """
    bsz = first_tokens.shape[0]
    tokens0 = jnp.zeros((bsz, buffer), jnp.int32)
    counts0 = jnp.zeros((bsz,), jnp.int32)
    done0 = first_tokens == eos_id
    limit = jnp.minimum(max_tokens, jnp.int32(config.max_context) - pos)
    if kv_bound is not None:
        limit = jnp.minimum(limit, jnp.int32(kv_bound) - pos)

    def cond(c):
        kv_, pos_, toks_cur, done, i, rng_, toks, counts = c
        return (~jnp.all(done)) & (i < limit)

    def body(c):
        kv_, pos_, toks_cur, done, i, rng_, toks, counts = c
        toks = toks.at[:, i].set(jnp.where(done, 0, toks_cur))
        counts = counts + (~done).astype(jnp.int32)

        emb = text_params["wte"][toks_cur][:, None, :]
        hidden, kv_ = text_ops.text_decoder(
            emb, text_params, kv_, pos_, jnp.int32(0), config, lora, kv_bound
        )
        logits = lm_logits_batched(hidden[:, 0], text_params)
        for s in suppress_ids:
            logits = logits.at[:, s].set(NEG_INF)

        rng_, sub = jax.random.split(rng_)
        nxt = sample_tokens_batched(logits, sub, temperature, top_p).astype(jnp.int32)
        done = done | (nxt == eos_id)
        return (kv_, pos_ + 1, nxt, done, i + 1, rng_, toks, counts)

    kv, pos, _, _, _, _, tokens, counts = jax.lax.while_loop(
        cond,
        body,
        (kv, pos, first_tokens, done0, jnp.int32(0), rng, tokens0, counts0),
    )
    return BatchedGenerateResult(tokens=tokens, counts=counts, kv=kv, pos=pos)


class BatchedPointsResult(NamedTuple):
    boxes: jax.Array  # (B, max_objects, 4) f32 — [x,y,0,0] rows points-only
    counts: jax.Array  # (B,) int32 — objects found per row
    kv: KVCache
    pos: jax.Array


def generate_points_batched(
    text_params: dict,
    region_params: dict,
    kv: KVCache,
    first_hidden: jax.Array,
    first_tokens: jax.Array,
    pos: jax.Array,
    config: TextConfig,
    eos_id: int,
    include_size: bool,
    max_objects: int,
    lora: Optional[dict] = None,
    kv_bound: Optional[int] = None,
) -> BatchedPointsResult:
    """Lockstep batched structured coordinate decode — generate_points
    (engine/generate.py, reference moondream.py:653-733) over B symmetric
    rows: same prompt, shared position counter, per-row object counts and
    EOS. One fused loop detects the same object across B images (the video
    recipes' per-frame `detect` becomes one device program per frame
    batch). Rows that finish keep stepping with frozen outputs until the
    whole batch is done, exactly like generate_text_batched.
    """
    from ..models import region as region_ops
    from ..ops.layers import mlp as _mlp

    bsz = first_tokens.shape[0]
    emb_dtype = text_params["wte"].dtype
    boxes0 = jnp.zeros((bsz, max_objects, 4), jnp.float32)
    pos_limit = config.max_context if kv_bound is None else kv_bound

    def step(kv_, emb, pos_):
        hidden, kv_ = text_ops.text_decoder(
            emb[:, None, :], text_params, kv_, pos_, jnp.int32(0), config,
            lora, kv_bound,
        )
        h = hidden[:, 0]
        return lm_logits_batched(h, text_params), h, kv_

    def cond(c):
        kv_, pos_, hid, tok, n, boxes, done = c
        return jnp.any(~done) & (pos_ < pos_limit - 4)

    def body(c):
        kv_, pos_, hid, tok, n, boxes, done = c
        active = ~done

        x_logits = region_ops.decode_coordinate(hid, region_params)
        x = jnp.argmax(x_logits, -1).astype(jnp.float32) / x_logits.shape[-1]
        emb = region_ops.encode_coordinate(
            x[:, None].astype(emb_dtype), region_params
        )
        _, hid, kv_ = step(kv_, emb, pos_)
        pos_ = pos_ + 1

        y_logits = region_ops.decode_coordinate(hid, region_params)
        y = jnp.argmax(y_logits, -1).astype(jnp.float32) / y_logits.shape[-1]
        emb = region_ops.encode_coordinate(
            y[:, None].astype(emb_dtype), region_params
        )

        if include_size:
            _, hid, kv_ = step(kv_, emb, pos_)
            pos_ = pos_ + 1
            size_logits = _mlp(hid, region_params["size_decoder"]).reshape(
                bsz, 2, -1
            )
            wh = region_ops.size_bin_to_value(jnp.argmax(size_logits, -1))
            emb = region_ops.encode_size(wh.astype(emb_dtype), region_params)
            row = jnp.stack(
                [
                    x - wh[:, 0] / 2, y - wh[:, 1] / 2,
                    x + wh[:, 0] / 2, y + wh[:, 1] / 2,
                ],
                axis=-1,
            )
        else:
            zeros = jnp.zeros_like(x)
            row = jnp.stack([x, y, zeros, zeros], axis=-1)

        upd = (jnp.arange(max_objects)[None, :] == n[:, None]) & active[:, None]
        boxes = jnp.where(upd[..., None], row[:, None, :], boxes)
        n = n + active.astype(jnp.int32)

        logits, hid, kv_ = step(kv_, emb, pos_)
        pos_ = pos_ + 1
        tok = jnp.argmax(logits, -1).astype(jnp.int32)
        done = done | (tok == eos_id) | (n >= max_objects)
        return (kv_, pos_, hid, tok, n, boxes, done)

    done0 = first_tokens == eos_id
    kv, pos, _, _, counts, boxes, _ = jax.lax.while_loop(
        cond,
        body,
        (
            kv, pos, first_hidden, first_tokens,
            jnp.zeros((bsz,), jnp.int32), boxes0, done0,
        ),
    )
    return BatchedPointsResult(boxes=boxes, counts=counts, kv=kv, pos=pos)


class BatchedSpecGenerateResult(NamedTuple):
    tokens: jax.Array  # (B, buffer) int32
    counts: jax.Array  # (B,) int32
    kv: KVCache
    pos: jax.Array  # (B,) int32 — rows desync as acceptance varies
    iters: jax.Array  # scalar int32 — verify passes used (acceptance =
    #     counts.sum() / (iters * active rows); a serving-metrics hook)


def generate_text_spec_batched(
    text_params: dict,
    kv: KVCache,
    first_tokens: jax.Array,  # (B,)
    pos: jax.Array,  # scalar int32 — shared start position
    max_tokens: jax.Array,
    config: TextConfig,
    eos_id: int,
    suppress_ids: Tuple[int, ...],
    buffer: int,
    spec_k: int = 8,
    kv_bound: Optional[int] = None,
    hist_init: Optional[jax.Array] = None,  # (B, H) prompt-seeded history
    hist_cnt_init: Optional[jax.Array] = None,  # (B,)
) -> BatchedSpecGenerateResult:
    """SPECULATIVE lockstep batched generation (greedy, exact).

    The lockstep loop starts every row at the same position; per-row
    n-gram drafts are verified in ONE ragged span forward per iteration
    (engine/serving.py:ragged_verify_step), so each iteration advances
    every active row by 1..spec_k tokens for a single pass over the
    weights. Rows desync as acceptance varies — positions become (B,) —
    but the whole generation stays ONE fused lax.while_loop: no per-chunk
    host syncs, no slot-admission copies (the gap that made a pooled spec
    stream slower than this). Token-identical to generate_text_batched at
    temperature 0 (same caveat as generate_text_spec: span vs single-step
    logit accumulation equality is validated empirically).

    `hist_init`/`hist_cnt_init`: optional prompt-seeded draft histories
    (prompt-lookup); defaults to empty (drafts warm up from generated
    tokens)."""
    from .serving import ragged_verify_step

    bsz = first_tokens.shape[0]
    H = buffer
    tokens0 = jnp.zeros((bsz, buffer), jnp.int32)
    counts0 = jnp.zeros((bsz,), jnp.int32)
    rows = jnp.arange(bsz, dtype=jnp.int32)
    max_pos = kv_bound or config.max_context

    if hist_init is None:
        hist0 = jnp.zeros((bsz, H), jnp.int32)
        cnt0 = jnp.zeros((bsz,), jnp.int32)
    else:
        pad = H - hist_init.shape[1]
        hist0 = (
            jnp.pad(hist_init, ((0, 0), (0, pad))) if pad > 0
            else hist_init[:, :H]
        ).astype(jnp.int32)
        cnt0 = jnp.minimum(hist_cnt_init, H).astype(jnp.int32)

    posv0 = jnp.broadcast_to(jnp.asarray(pos, jnp.int32), (bsz,))
    bud0 = jnp.minimum(
        jnp.asarray(max_tokens, jnp.int32),
        jnp.int32(max_pos) - posv0 - jnp.int32(spec_k),
    )
    act0 = (first_tokens != eos_id) & (bud0 > 0)

    def cond(c):
        act = c[3]
        return jnp.any(act)

    def body(c):
        kv_, cur, posv, act, bud, h_, cnt, toks, counts, it = c

        # emit cur + append to history (same scheme as serve_chunk_spec)
        toks = toks.at[rows, jnp.where(act, counts, buffer)].set(
            cur, mode="drop"
        )
        h_ = h_.at[rows, jnp.where(act, jnp.minimum(cnt, H - 1), H)].set(
            cur, mode="drop"
        )
        cnt1 = cnt + act.astype(jnp.int32)

        # per-row longest-suffix n-gram draft from the history
        draft, _ = ngram_draft_rows(h_, cnt1, cur, spec_k)

        q_toks = jnp.concatenate([cur[:, None], draft], axis=1)
        logits, _, kv_ = ragged_verify_step(
            text_params, kv_, q_toks, posv, config, kv_bound
        )
        for sid in suppress_ids:
            logits = logits.at[:, :, sid].set(NEG_INF)
        g = jnp.argmax(logits, axis=-1).astype(jnp.int32)

        ok = (draft == g[:, :-1]).astype(jnp.int32)
        m = 1 + jnp.sum(jnp.cumprod(ok, axis=1), axis=1)
        is_eos = g == eos_id
        eos_pos = jnp.argmax(is_eos, axis=1)
        m = jnp.where(
            jnp.any(is_eos, axis=1) & (eos_pos + 1 < m), eos_pos + 1, m
        )
        m = jnp.minimum(m, bud)
        m = jnp.where(act, m, 0)

        for j in range(spec_k - 1):
            valid = act & (j + 1 < m)
            toks = toks.at[rows, jnp.where(valid, counts + 1 + j, buffer)].set(
                g[:, j], mode="drop"
            )
            h_ = h_.at[
                rows, jnp.where(valid, jnp.minimum(cnt1 + j, H - 1), H)
            ].set(g[:, j], mode="drop")

        nxt = g[rows, jnp.maximum(m - 1, 0)]
        cur = jnp.where(act, nxt, cur)
        posv = posv + m
        bud = bud - m
        cnt2 = cnt1 + jnp.maximum(m - 1, 0) * act.astype(jnp.int32)
        counts = counts + m
        act = (
            act & (cur != eos_id) & (bud > 0) & (posv + spec_k <= max_pos)
        )
        return (kv_, cur, posv, act, bud, h_, cnt2, toks, counts, it + 1)

    kv, _, posv, _, _, _, _, tokens, counts, iters = jax.lax.while_loop(
        cond, body,
        (kv, first_tokens, posv0, act0, bud0, hist0, cnt0, tokens0, counts0,
         jnp.int32(0)),
    )
    return BatchedSpecGenerateResult(
        tokens=tokens, counts=counts, kv=kv, pos=posv, iters=iters
    )
