"""A/B the paired decode-attention kernel: bf16 cache vs int8+scales, at
the 2B pipelined-bench shapes (B=12, 24 layers, 1024 slots). Reports
per-step kernel time and effective cache-read bandwidth. Diagnostic.

--vmem-mb N sets MOONDREAM_DECODE_VMEM_MB before import, shrinking/
growing the kernel's head tile (the round-3 verdict #10 "wider tiles"
lever): 12 -> ht=8 (default), 6 -> ht=4, 3 -> ht=2 at the bench shape.
ht=16 is infeasible — double-buffered k+v blocks would need ~17MB of the
~16MB VMEM."""

import argparse
import os
import sys
import time

sys.path.insert(0, "/root/repo")

_ap = argparse.ArgumentParser()
_ap.add_argument("--vmem-mb", type=float, default=None)
_args = _ap.parse_args()
if _args.vmem_mb:
    os.environ["MOONDREAM_DECODE_VMEM_MB"] = str(_args.vmem_mb)


def log(*a):
    print(*a, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    def probe_tfs(iters=10):
        a = jnp.ones((8192, 8192), jnp.bfloat16)
        f = jax.jit(lambda x: x @ x)
        f(a).block_until_ready()
        t0 = time.perf_counter()
        for _ in range(iters):
            c = f(a)
        jax.device_get(c.ravel()[0])
        return iters * 2 * 8192**3 / (time.perf_counter() - t0) / 1e12

    # chip-state gate (BASELINE caution: A/Bs on the time-shared chip are
    # garbage without it) — warm, then wait out degraded windows
    probe_tfs(iters=2)
    for _ in range(10):
        tfs = probe_tfs()
        log(f"chip probe: {tfs:.1f} TF/s")
        if tfs >= 80:
            break
        log("degraded; waiting 60s...")
        time.sleep(60)

    from moondream_tpu.models.text import quantize_kv
    from moondream_tpu.ops.attention import decode_attention_cached

    key = jax.random.PRNGKey(0)
    L, B, hp, pf, dh, T = 24, 12, 16, 2, 64, 1024
    dd = pf * dh
    hq = hp * pf
    kb = 1024

    q = jax.random.normal(key, (B, hq, 1, dh), jnp.bfloat16)
    k = jax.random.normal(key, (L, B, hp, T, dd), jnp.float32)
    v = jax.random.normal(key, (L, B, hp, T, dd), jnp.float32)
    kb16 = k.astype(jnp.bfloat16)
    vb16 = v.astype(jnp.bfloat16)
    kc, ks = quantize_kv(k)
    vc, vs = quantize_kv(v)
    ks = jnp.swapaxes(ks, -1, -2)
    vs = jnp.swapaxes(vs, -1, -2)
    pos = jnp.int32(900)
    prefix = jnp.int32(730)

    # The tunneled backend's dispatch+fetch round trip is ~25-30ms — far
    # larger than the 24-layer kernel pass itself. Repeat the pass REPS
    # times inside one jit (carrying q so XLA can't elide iterations) and
    # fence once, so the RTT amortizes to noise.
    REPS = 50

    def loop_bf16(q, k, v):
        def body(c, layer):
            o = decode_attention_cached(c, k, v, layer, pos, prefix, kb)
            return o.astype(c.dtype), None

        def rep(_, c):
            o, _ = jax.lax.scan(body, c, jnp.arange(L, dtype=jnp.int32))
            return o

        return jax.lax.fori_loop(0, REPS, rep, q)

    def loop_int8(q, k, v, ks, vs):
        def body(c, layer):
            o = decode_attention_cached(
                c, k, v, layer, pos, prefix, kb, k_scale=ks, v_scale=vs
            )
            return o.astype(c.dtype), None

        def rep(_, c):
            o, _ = jax.lax.scan(body, c, jnp.arange(L, dtype=jnp.int32))
            return o

        return jax.lax.fori_loop(0, REPS, rep, q)

    fb = jax.jit(loop_bf16)
    fq = jax.jit(loop_int8)

    for name, fn, args, bytes_step in [
        ("bf16", fb, (q, kb16, vb16), L * 2 * B * hp * kb * dd * 2),
        ("int8", fq, (q, kc, vc, ks, vs),
         L * 2 * B * hp * kb * (dd * 1 + 4)),
    ]:
        o = fn(*args)
        jax.device_get(o.ravel()[0])
        best = 1e9
        pre = probe_tfs()
        for _ in range(5):
            t0 = time.perf_counter()
            o = fn(*args)
            jax.device_get(o.ravel()[0])
            best = min(best, (time.perf_counter() - t0) / REPS)
        post = probe_tfs()
        healthy = pre >= 80 and post >= 80
        log(f"{name}: {1000*best:.2f} ms for {L} layers "
            f"({1000*best/L:.3f} ms/layer-step, "
            f"{bytes_step/best/1e9:.0f} GB/s cache read) "
            f"[probe {pre:.0f}/{post:.0f} "
            f"{'healthy' if healthy else 'DEGRADED — discard'}]")


if __name__ == "__main__":
    main()
