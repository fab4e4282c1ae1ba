"""Measure speculative acceptance in the lockstep batched caption loop.

Runs the pipelined-bench decode shape (2B random weights, B rows, 128
tokens, prompt-seeded histories) and reports iterations used + mean
accepted tokens per verify, for the current drafting scheme. Random
weights repeat, so acceptance here is an UPPER bound vs real
checkpoints — but the RELATIVE ranking of drafting schemes transfers.
Diagnostic for engine/batched.py:generate_text_spec_batched.
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=12)
    p.add_argument("--decode-tokens", type=int, default=128)
    p.add_argument("--spec-k", type=int, default=8)
    p.add_argument("--kv-int8", action="store_true")
    p.add_argument("--int4", action="store_true",
                   help="runtime-int4 text block weights (the bench's "
                        "int4 cells) — for like-for-like verify-iteration "
                        "timing vs bf16 in the same chip window")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from moondream_tpu.config import MOONDREAM_2B
    from moondream_tpu.engine import batched
    from moondream_tpu.models.moondream import MoondreamModel
    from moondream_tpu.tokenizer import ByteTokenizer

    config_in = MOONDREAM_2B
    if args.kv_int8:
        import dataclasses

        config_in = dataclasses.replace(
            config_in,
            text=dataclasses.replace(config_in.text, kv_int8=True),
        )
    model = MoondreamModel(config_in, tokenizer=ByteTokenizer(), seed=0)
    cfg = model.config
    B = args.batch

    # image-free prefill: BOS + caption prompt, like the pipelined bench
    # but without the ViT (decode acceptance doesn't depend on it)
    prompt = list(cfg.tokenizer.templates["caption"]["normal"])
    seq = 736  # typical [BOS, image] length rounded to the pipeline's pad
    bound = model._decode_bound(seq + 8 + args.decode_tokens + 1)
    kv = model._take_kv_buffer(B, bound)
    emb = jax.random.normal(
        jax.random.PRNGKey(1), (B, seq, cfg.text.dim), model.dtype
    )
    _, _, kv = model._prefill_batched_fn(model._kv_bound(seq))(
        model.params["text"], kv, emb,
        jnp.int32(0), jnp.int32(seq), jnp.int32(seq),
    )
    ids = prompt + [0] * (8 - len(prompt) % 8 if len(prompt) % 8 else 0)
    pe = jnp.broadcast_to(
        model.params["text"]["wte"][jnp.asarray(ids)][None],
        (B, len(ids), cfg.text.dim),
    ).astype(model.dtype)
    logits, _, kv = model._prefill_batched_fn(model._kv_bound(seq + len(ids)))(
        model.params["text"], kv, pe,
        jnp.int32(seq), jnp.int32(len(prompt)), jnp.int32(cfg.text.prefix_attn),
    )
    first = jnp.argmax(logits, axis=-1).astype(jnp.int32).reshape(B)

    seed = prompt[-(cfg.text.max_context // 2):]
    hist = jnp.broadcast_to(
        jnp.asarray(seed, jnp.int32)[None, :], (B, len(seed))
    )
    fn = jax.jit(
        lambda tp, kv_, f, p_, mt, h, hc: batched.generate_text_spec_batched(
            tp, kv_, f, p_, mt, cfg.text, -1, (cfg.tokenizer.answer_id,),
            cfg.text.max_context, spec_k=args.spec_k, kv_bound=bound,
            hist_init=h, hist_cnt_init=hc,
        ),
        donate_argnums=(1,),
    )
    pos = jnp.int32(seq + len(prompt))
    mt = jnp.int32(args.decode_tokens)
    hc = jnp.full((B,), len(seed), jnp.int32)

    res = fn(model.params["text"], kv, first, pos, mt, hist, hc)
    jax.block_until_ready(res.counts)
    counts = jax.device_get(res.counts)
    endpos = jax.device_get(res.pos)

    # iterations come straight from res.iters below; this second
    # prefill+run exists only as a warm-compile TIMING run (the first run
    # above paid compilation).
    kv2 = model._take_kv_buffer(B, bound)
    _, _, kv2 = model._prefill_batched_fn(model._kv_bound(seq))(
        model.params["text"], kv2, emb,
        jnp.int32(0), jnp.int32(seq), jnp.int32(seq),
    )
    _, _, kv2 = model._prefill_batched_fn(model._kv_bound(seq + len(ids)))(
        model.params["text"], kv2, pe,
        jnp.int32(seq), jnp.int32(len(prompt)), jnp.int32(cfg.text.prefix_attn),
    )
    t0 = time.perf_counter()
    res2 = fn(model.params["text"], kv2, first, pos, mt, hist, hc)
    jax.block_until_ready(res2.counts)
    dt = time.perf_counter() - t0
    iters = int(jax.device_get(res.iters))
    total = int(counts.sum())
    print(f"B={B} k={args.spec_k}: {total} tokens in {iters} verify "
          f"iterations -> {total/(iters*B):.2f} accepted/row/iter")
    print(f"decode {dt*1000:.0f} ms -> {total/dt:.0f} tok/s aggregate, "
          f"{dt*1000/iters:.2f} ms/iter")
    print(f"counts: {counts.tolist()}")
    print(f"end pos: {endpos.tolist()} (start {int(pos)})")


if __name__ == "__main__":
    main()
