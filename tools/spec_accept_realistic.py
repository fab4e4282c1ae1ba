#!/usr/bin/env python
"""Speculative-decoding acceptance on NON-degenerate text (round-3
verdict #5).

Every earlier spec measurement ran random weights, whose greedy captions
degenerate into repetition — acceptance (~2.0 tok/row/iter at k=8) was
an acknowledged UPPER bound. This tool trains a tiny byte-level LM for a
few hundred steps on the repo's own English prose (README/SURVEY/
ARCHITECTURE/... — real text, no egress needed), generates greedily from
HELD-OUT prompts, and reports the n-gram (prompt-lookup) drafter's
acceptance vs k for:

  * single-stream  (B=1,   engine/batched.py generate_text_spec_batched)
  * batched        (B=12,  same fused lockstep loop the pipelines use)
  * pooled serving (ContinuousBatchingEngine, spec chunks,
                    eng.spec_accept_rate)

Caveats, recorded so the numbers are read honestly:
  * byte-level ids (ByteTokenizer): English orthography repeats more at
    byte granularity than at BPE granularity, so acceptance reads a bit
    HIGHER than a BPE checkpoint would;
  * ~120KB corpus x ~25 epochs partially memorizes; prompts come from a
    held-out tail slice the training windows never saw, which limits
    (not eliminates) the flattering effect;
  * the POOLED measurement must condition on an image, and the tiny
    vision tower is untrained noise — that pushes the LM
    off-distribution into repetition, so the pooled figure reads
    upper-bound-ish (round-4 run: 2.40 vs 1.10-1.23 for the text-only
    engines). Trust the single/batched rows.
Measured (round 4, 600 steps, loss 1.14): single-stream 1.23, batched
B=12 1.10-1.11 accepted/row/iter, flat in k — the realistic band is
~1.1-1.2 vs the random-weight ~2.0 upper bound.

Usage:
    python tools/spec_accept_realistic.py            # full run (TPU or CPU)
    python tools/spec_accept_realistic.py --steps 50 --smoke   # quick check
"""

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def load_corpus(repo):
    paths = sorted(
        glob.glob(os.path.join(repo, "*.md"))
        + glob.glob(os.path.join(repo, "docs", "*.md"))
        + glob.glob(os.path.join(repo, "*", "README.md"))
    )
    text = "\n\n".join(open(p, encoding="utf-8").read() for p in paths)
    log(f"corpus: {len(paths)} files, {len(text)} chars")
    return text


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=600)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--seq", type=int, default=256)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--decode-tokens", type=int, default=128)
    p.add_argument("--ks", type=int, nargs="*", default=[4, 6, 8])
    p.add_argument("--pool-batch", type=int, default=12)
    p.add_argument("--smoke", action="store_true",
                   help="skip the pooled-serving measurement")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache"),
    )
    log(f"devices: {jax.devices()}")

    from moondream_tpu.config import TextConfig, tiny_test_config
    from moondream_tpu.engine import batched
    from moondream_tpu.models import text as text_ops
    from moondream_tpu.tokenizer import ByteTokenizer

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    tok = ByteTokenizer()
    corpus = load_corpus(repo)
    ids = np.asarray(tok.encode(corpus), np.int32)
    # hold out the final 8% as the prompt source (never in a train window)
    split = int(len(ids) * 0.92)
    train_ids, held = ids[:split], ids[split:]

    # Tiny but real decoder: same structural invariants as the 2B (partial
    # RoPE, fused qkv, stacked-scan blocks); head_dim 32 keeps the decode
    # kernels on their production paths.
    cfg = TextConfig(
        dim=256, ff_dim=1024, n_layers=4, vocab_size=512,
        max_context=1024, n_heads=8, n_kv_heads=8, prefix_attn=1,
    )
    params = text_ops.init_text_params(cfg, jax.random.PRNGKey(0), jnp.float32)

    optimizer = optax.adamw(args.lr)
    opt_state = optimizer.init(params)

    def loss_fn(pr, tokens):
        # embed INSIDE the loss so wte trains too
        emb = pr["wte"][tokens]
        hidden = text_ops.produce_hidden(emb, pr, cfg)
        logits = text_ops.lm_head_full(hidden, pr).astype(jnp.float32)
        logp = jax.nn.log_softmax(logits[:, :-1], axis=-1)
        nll = -jnp.take_along_axis(
            logp, tokens[:, 1:][..., None], axis=-1
        )[..., 0]
        return jnp.mean(nll)

    @jax.jit
    def step(pr, st, tokens):
        loss, grads = jax.value_and_grad(loss_fn)(pr, tokens)
        updates, st = optimizer.update(grads, st, pr)
        return optax.apply_updates(pr, updates), st, loss

    rng = np.random.default_rng(0)
    t0 = time.time()
    for i in range(args.steps):
        starts = rng.integers(0, len(train_ids) - args.seq - 1, args.batch)
        batch = np.stack([train_ids[s:s + args.seq] for s in starts])
        params, opt_state, loss = step(params, opt_state, jnp.asarray(batch))
        if i % 100 == 0 or i == args.steps - 1:
            log(f"step {i}: loss {float(loss):.3f} "
                f"({time.time() - t0:.0f}s)")

    # ---------------------------------------------------------- measurement
    params32 = params
    prompt_len = 64

    def held_prompt(j):
        s = (j * 977) % max(len(held) - prompt_len - 1, 1)
        return held[s:s + prompt_len].tolist()

    def spec_acceptance(B, spec_k):
        """Greedy spec decode from B held-out prompts; returns
        (accepted tok/row/iter, tokens, iters)."""
        from moondream_tpu.models.text import KVCache

        bound = 512
        kv = KVCache.create(cfg, batch=B, dtype=jnp.float32, slots=bound)
        prompts = np.stack([held_prompt(j) for j in range(B)]).astype(np.int32)
        emb = params32["wte"][jnp.asarray(prompts)]
        logits, _, kv = batched.prefill_batched(
            params32, kv, emb, jnp.int32(0), jnp.int32(prompt_len),
            jnp.int32(cfg.prefix_attn), config=cfg,
        )
        first = jnp.argmax(logits, -1).astype(jnp.int32).reshape(B)
        hist = jnp.asarray(prompts)
        res = jax.jit(
            lambda pr, kv_, f: batched.generate_text_spec_batched(
                pr, kv_, f, jnp.int32(prompt_len),
                jnp.int32(args.decode_tokens), cfg, -1, (),
                buffer=bound, spec_k=spec_k, kv_bound=bound,
                hist_init=hist,
                hist_cnt_init=jnp.full((B,), prompt_len, jnp.int32),
            ),
            donate_argnums=(1,),
        )(params32, kv, first)
        counts = jax.device_get(res.counts)
        iters = int(jax.device_get(res.iters))
        total = int(counts.sum())
        return total / (iters * B), total, iters

    out = {"train_steps": args.steps, "final_loss": round(float(loss), 3),
           "decode_tokens": args.decode_tokens, "per_engine": {}}
    for label, B in (("single_stream_b1", 1), ("batched_b12", 12)):
        rows = {}
        for k in args.ks:
            acc, total, iters = spec_acceptance(B, k)
            log(f"{label} k={k}: {total} tokens / {iters} iters "
                f"-> {acc:.2f} accepted/row/iter")
            rows[f"k{k}"] = round(acc, 3)
        out["per_engine"][label] = rows

    # sample of generated text (to eyeball non-degeneracy)
    acc, _, _ = spec_acceptance(1, 8)
    from moondream_tpu.models.text import KVCache

    kv = KVCache.create(cfg, batch=1, dtype=jnp.float32, slots=512)
    pr = held_prompt(0)
    emb = params32["wte"][jnp.asarray([pr])]
    logits, _, kv = batched.prefill_batched(
        params32, kv, emb, jnp.int32(0), jnp.int32(prompt_len),
        jnp.int32(cfg.prefix_attn), config=cfg,
    )
    res = batched.generate_text_batched(
        params32, kv, jnp.argmax(logits, -1).astype(jnp.int32).reshape(1),
        jnp.int32(prompt_len), jax.random.PRNGKey(0), jnp.float32(0.0),
        jnp.float32(0.0), jnp.int32(96), config=cfg, eos_id=-1,
        suppress_ids=(), buffer=512, kv_bound=512,
    )
    toks = jax.device_get(res.tokens[0, : int(res.counts[0])])
    sample = tok.decode([int(t) for t in toks])
    log(f"prompt: {tok.decode(pr)!r}")
    log(f"greedy continuation: {sample!r}")
    out["sample_continuation"] = sample[:200]

    # ------------------------------------------------- pooled serving spec
    if not args.smoke:
        from PIL import Image

        from moondream_tpu.config import MoondreamConfig
        from moondream_tpu.models.moondream import MoondreamModel
        from moondream_tpu.models.serve import ContinuousBatchingEngine

        import dataclasses

        tiny = tiny_test_config(vocab_size=512)
        pool_cfg = MoondreamConfig(
            tokenizer=tiny.tokenizer,
            # vision must project into the trained text width
            vision=dataclasses.replace(tiny.vision, proj_out_dim=cfg.dim),
            region=dataclasses.replace(tiny.region, dim=cfg.dim),
            text=cfg,
        )
        model = MoondreamModel(pool_cfg, tokenizer=tok, seed=0)
        # swap in the TRAINED text weights (cast to the model dtype)
        model.params = {
            **model.params,
            "text": jax.tree.map(
                lambda x: x.astype(model.dtype), params32
            ),
        }
        model._kv_pool.clear()
        # slot_len must hold the 730-token [BOS, image] prefix + prompt +
        # generation
        eng = ContinuousBatchingEngine(
            model, n_slots=args.pool_batch, slot_len=1024, chunk=8,
            speculative=8, eos_id=-1,
        )
        img = Image.fromarray(
            np.zeros((64, 64, 3), np.uint8)
        )
        enc = model.encode_image(img)
        for j in range(args.pool_batch):
            # per-slot question from held-out text: realistic prompt-seeded
            # histories like production VQA
            q = tok.decode(held_prompt(j))[:48]
            eng.submit(enc, question=q, max_tokens=args.decode_tokens)
        eng.drain()
        acc_pool = eng.spec_accept_rate
        log(f"pooled serving k=8: accept {acc_pool:.2f} tok/slot-iter")
        out["per_engine"]["pooled_serving_k8"] = round(acc_pool, 3)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
