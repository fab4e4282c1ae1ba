"""Stage-by-stage device timing of the pipelined caption path (real TPU).

Times each component of one B-image batch separately — host crops, H2D,
ViT, stitch+projection, image prefill, prompt prefill, fused decode — to
locate the throughput bottleneck the pipelined engine is bound by.
Diagnostic tool, not part of the library.

Usage: python tools/stage_times.py [--batch 12] [--kv-int8] [--int4]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=12)
    p.add_argument("--decode-tokens", type=int, default=128)
    p.add_argument("--kv-int8", action="store_true")
    p.add_argument("--int4", action="store_true")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from PIL import Image

    from moondream_tpu.config import MOONDREAM_2B
    from moondream_tpu.models.moondream import (
        PROMPT_PAD,
        MoondreamModel,
        _ceil_to,
    )
    from moondream_tpu.ops.image_crops import overlap_crop_image
    from moondream_tpu.tokenizer import ByteTokenizer

    config = MOONDREAM_2B
    if args.kv_int8:
        import dataclasses

        config = dataclasses.replace(
            config, text=dataclasses.replace(config.text, kv_int8=True)
        )
    model = MoondreamModel(config, tokenizer=ByteTokenizer(), seed=0)
    if args.int4:
        from moondream_tpu.models.text import quantize_text_params

        model.params = {
            **model.params, "text": quantize_text_params(model.params["text"])
        }
    jax.block_until_ready(model.params["text"]["wte"])
    log("model ready")

    rng = np.random.default_rng(0)
    B = args.batch
    imgs = [
        Image.fromarray(rng.integers(0, 255, (1080, 1440, 3), dtype=np.uint8))
        for _ in range(B)
    ]
    cfg = config.vision

    t0 = time.perf_counter()
    prepped = []
    for im in imgs:
        co = overlap_crop_image(
            np.asarray(im.convert("RGB")),
            overlap_margin=cfg.overlap_margin, max_crops=cfg.max_crops,
        )
        prepped.append((co["crops"], tuple(co["tiling"])))
    log(f"host crops: {1000*(time.perf_counter()-t0):.0f} ms for {B} images")

    crops = np.concatenate([p[0] for p in prepped], axis=0)
    n = prepped[0][0].shape[0]
    tiling = prepped[0][1]
    log(f"crops: {crops.shape} tiling {tiling}")

    for rep in range(3):
        t0 = time.perf_counter()
        crops_dev = jnp.asarray(crops) + rep  # defeat caching
        jax.block_until_ready(crops_dev)
        log(f"H2D+fence: {1000*(time.perf_counter()-t0):.0f} ms "
            f"({crops.nbytes/1e6:.0f} MB)")
    crops_dev = jnp.asarray(crops)

    def fence(x):
        jax.device_get(x.ravel()[0])

    vis = model._vis_enc_fn()
    t0 = time.perf_counter()
    feats = vis(model.params["vision"], crops_dev)
    jax.block_until_ready(feats)
    log(f"ViT first call: {time.perf_counter()-t0:.1f} s")
    for rep in range(3):
        t0 = time.perf_counter()
        feats = vis(model.params["vision"], crops_dev)
        fence(feats)
        log(f"ViT {crops.shape[0]} crops: "
            f"{1000*(time.perf_counter()-t0):.0f} ms")

    feats_r = feats.reshape(B, n, *feats.shape[1:])
    stitch = model._stitch_proj_batched_fn(tiling)
    embs = stitch(model.params["vision"], feats_r[:, 0], feats_r[:, 1:n])
    jax.block_until_ready(embs)
    for rep in range(2):
        t0 = time.perf_counter()
        embs = stitch(model.params["vision"], feats_r[:, 0], feats_r[:, 1:n])
        fence(embs)
        log(f"stitch+proj: {1000*(time.perf_counter()-t0):.0f} ms")

    wte = model.params["text"]["wte"]
    bos_emb = wte[jnp.asarray([config.tokenizer.bos_id])]
    embeds = jnp.stack(
        [jnp.concatenate([bos_emb, e], axis=0) for e in embs]
    ).astype(model.dtype)
    seq = embeds.shape[1]
    max_tokens = args.decode_tokens
    prompt = list(config.tokenizer.templates["caption"]["normal"])
    pad = max(_ceil_to(len(prompt), PROMPT_PAD), PROMPT_PAD)
    bound = model._decode_bound(seq + pad + max_tokens + 1)
    log(f"seq={seq} pad={pad} bound={bound}")

    prefill = model._prefill_batched_fn(model._kv_bound(seq))
    kv = model._take_kv_buffer(B, bound)
    _, _, kv = prefill(
        model.params["text"], kv, embeds,
        jnp.int32(0), jnp.int32(seq), jnp.int32(seq),
    )
    jax.block_until_ready(kv.k)
    for rep in range(2):
        kv2 = model._take_kv_buffer(B, bound)
        t0 = time.perf_counter()
        _, _, kv2 = prefill(
            model.params["text"], kv2, embeds,
            jnp.int32(0), jnp.int32(seq), jnp.int32(seq),
        )
        fence(kv2.k)
        log(f"image prefill (B={B}, T={seq}): "
            f"{1000*(time.perf_counter()-t0):.0f} ms")
        model._recycle_kv(kv2, B)

    ids_padded = prompt + [0] * (pad - len(prompt))
    emb = jnp.broadcast_to(
        wte[jnp.asarray(ids_padded)][None], (B, pad, config.text.dim)
    ).astype(model.dtype)
    pp = model._prefill_batched_fn(model._kv_bound(seq + pad))
    logits, _, kv = pp(
        model.params["text"], kv, emb,
        jnp.int32(seq), jnp.int32(len(prompt)),
        jnp.int32(config.text.prefix_attn),
    )
    jax.block_until_ready(logits)
    t0 = time.perf_counter()
    logits2, _, kv = pp(
        model.params["text"], kv, emb,
        jnp.int32(seq), jnp.int32(len(prompt)),
        jnp.int32(config.text.prefix_attn),
    )
    fence(logits2)
    log(f"prompt prefill: {1000*(time.perf_counter()-t0):.0f} ms")

    first = model._sample_batched_fn()(
        logits, jax.random.PRNGKey(0), jnp.float32(0.0), jnp.float32(0.0)
    ).astype(jnp.int32)

    gen = model._generate_batched_fn(
        -1, (config.tokenizer.answer_id,), config.text.max_context, bound
    )
    res = gen(
        model.params["text"], kv, first, jnp.int32(seq + len(prompt)),
        jax.random.PRNGKey(0), jnp.float32(0.0), jnp.float32(0.0),
        jnp.int32(max_tokens),
    )
    jax.block_until_ready(res.tokens)
    kvy = res.kv
    for rep in range(3):
        t0 = time.perf_counter()
        res2 = gen(
            model.params["text"], kvy, first, jnp.int32(seq + len(prompt)),
            jax.random.PRNGKey(0), jnp.float32(0.0), jnp.float32(0.0),
            jnp.int32(max_tokens),
        )
        fence(res2.tokens)
        log(f"fused decode {max_tokens} steps B={B}: "
            f"{1000*(time.perf_counter()-t0):.0f} ms")
        kvy = res2.kv
    log("done")


if __name__ == "__main__":
    main()
