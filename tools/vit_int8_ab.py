"""A/B the ViT encoder: bf16 vs int8 block matmuls, at the pipelined-bench
shape (120 crops of 378^2 -> 729 tokens each). Diagnostic."""

import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from moondream_tpu.config import MOONDREAM_2B
    from moondream_tpu.models.vision import (
        collect_vision_act_stats, init_vision_params,
        quantize_vision_params, vision_encoder,
    )

    cfg = MOONDREAM_2B.vision
    w = init_vision_params(cfg, jax.random.PRNGKey(0))
    wq = quantize_vision_params(w)
    x = jax.random.uniform(
        jax.random.PRNGKey(1), (120, cfg.crop_size, cfg.crop_size, 3),
        jnp.bfloat16, -1.0, 1.0,
    )
    # statically calibrated arm (round-4 verdict #4): per-channel act amax
    # observed on 16 calibration crops, SmoothQuant equalizer folded into
    # the weights, per-tensor act scale folded into inv_a/scale — no
    # runtime amax reduction passes. Calibration runs on the HOST CPU
    # backend against a bit-identical weight twin (same PRNG key; threefry
    # is platform-invariant): it is a one-time offline step, and the
    # tunnel's remote-compile service repeatedly dropped the ~25-min
    # calibration-graph compile (broken pipe, 2026-08-20) — the host is
    # where real deployments calibrate anyway (next to the checkpoint
    # loader, before weights ship to the chip).
    t0 = time.perf_counter()
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        w_cpu = init_vision_params(cfg, jax.random.PRNGKey(0))
        cal = jax.random.uniform(
            jax.random.PRNGKey(1), (16, cfg.crop_size, cfg.crop_size, 3),
            jnp.bfloat16, -1.0, 1.0,
        )
    stats = collect_vision_act_stats(cal, w_cpu, cfg, chunk=16, backend="cpu")
    wq_s = quantize_vision_params(w, act_stats=stats)
    print(f"calibration (host cpu): {time.perf_counter()-t0:.1f}s", flush=True)

    def probe():
        a = jnp.ones((8192, 8192), jnp.bfloat16)
        f = jax.jit(lambda a: a @ a)
        f(a).block_until_ready()
        t0 = time.perf_counter()
        for _ in range(10):
            c = f(a)
        jax.device_get(c.ravel()[0])
        return 10 * 2 * 8192**3 / (time.perf_counter() - t0) / 1e12

    print(f"probe: {probe():.1f} TF/s", flush=True)
    enc = jax.jit(lambda x, w: vision_encoder(x, w, cfg))
    for name, params in [("bf16", w), ("int8-dyn", wq), ("int8-static", wq_s)]:
        o = enc(x, params)
        jax.device_get(o.ravel()[0])
        best = 1e9
        for _ in range(5):
            t0 = time.perf_counter()
            o = enc(x, params)
            jax.device_get(o.ravel()[0])
            best = min(best, time.perf_counter() - t0)
        print(f"{name}: {1000*best:.1f} ms for 120 crops "
              f"({1000*best/120:.2f} ms/crop)", flush=True)
    print(f"probe after: {probe():.1f} TF/s", flush=True)


if __name__ == "__main__":
    main()
