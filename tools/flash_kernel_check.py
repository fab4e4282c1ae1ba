#!/usr/bin/env python
"""Flash-attention kernel harness: numerics vs an XLA reference (both
mask paths, plus adversarial large-score inputs), and healthy-probe-
bracketed timing at the ViT bench shape on TPU.

HISTORY (round 4): this tool A/B'd the round-3 experimental knobs
MOONDREAM_FLASH_EXP2 (log2-domain scores) and MOONDREAM_FLASH_MAXFREE
(no max-shift softmax). Both measured WITHIN NOISE of the default kernel
(147.6 / 148.0 vs 146.6 ms per 27-layer encoder's worth of attention at
120 crops, healthy probes both sides) and numerics-matched the XLA
reference; the kernel is VPU-latency bound (round-2 finding confirmed),
so both branches were DELETED from ops/attention.py. This file remains
as the default kernel's regression harness. Usage:
    python tools/flash_kernel_check.py --numerics   # CPU ok (interpret)
    python tools/flash_kernel_check.py --time       # needs the TPU chip
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def xla_ref(q, k, v, pos, prefix):
    import jax.numpy as jnp
    import numpy as np

    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    d = q.shape[-1]
    s = jnp.einsum("bhqd,bhkd->bhqk", qf, kf) / np.sqrt(d)
    tq, tk = q.shape[2], k.shape[2]
    rows = pos + jnp.arange(tq)[:, None]
    cols = jnp.arange(tk)[None, :]
    mask = (cols <= rows) | ((rows < prefix) & (cols < prefix))
    s = jnp.where(mask, s, -1e30)
    p = jnp.exp(s - jnp.max(s, axis=-1, keepdims=True))
    return (
        jnp.einsum("bhqk,bhkd->bhqd", p, vf)
        / jnp.sum(p, axis=-1, keepdims=True)
    ).astype(q.dtype)


def run_numerics():
    import jax.numpy as jnp
    import numpy as np

    from moondream_tpu.ops import attention as A

    rng = np.random.default_rng(0)
    cases = [
        # (name, b, h, tq, tk, pos, prefix, qk_scale)
        ("vit_row_bias", 2, 4, 729, 729, 0, 729, 1.0),
        ("causal_decode_span", 1, 4, 8, 512, 400, 130, 1.0),
        ("prefill_causal", 1, 4, 256, 256, 0, 130, 1.0),
        # adversarial sharp-softmax case: 8x-scaled q pushes raw scores to
        # ~ +-60; bf16 probabilities blur near-one-hot rows for every
        # kernel variant, so the bound is looser here
        ("vit_large_scores", 1, 2, 729, 729, 0, 729, 8.0),
    ]
    fails = 0
    for name, b, h, tq, tk, pos, prefix, qs in cases:
        d = 72
        q = jnp.asarray(rng.standard_normal((b, h, tq, d)) * qs, jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((b, h, tk, d)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((b, h, tk, d)), jnp.bfloat16)
        want = xla_ref(q, k, v, pos, prefix)
        got = A.flash_attention(q, k, v, pos, prefix, interpret=True)
        err = float(
            jnp.max(jnp.abs(got.astype(jnp.float32)
                            - want.astype(jnp.float32)))
        )
        tol = 0.10 if qs > 1 else 0.05
        ok = err <= tol
        fails += not ok
        log(f"{name:20s} max_abs_err={err:.4f} (tol {tol}) "
            f"{'ok' if ok else 'FAIL'}")
    return fails


def run_timing(reps=7):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from moondream_tpu.ops import attention as A

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache"),
    )

    def probe_tfs(iters=10):
        a = jnp.ones((8192, 8192), jnp.bfloat16)
        f = jax.jit(lambda x: x @ x)
        f(a).block_until_ready()
        t0 = time.perf_counter()
        for _ in range(iters):
            c = f(a)
        jax.device_get(c.ravel()[0])
        return iters * 2 * 8192**3 / (time.perf_counter() - t0) / 1e12

    rng = np.random.default_rng(0)
    # bench ViT shape: 120 crops x 16 heads, 768 padded tokens, d=72,
    # 27 layer calls per rep (one encoder forward's worth of attention)
    b, h, t, d, layers = 120, 16, 768, 72, 27
    q = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.bfloat16)

    def many(q, k, v):
        x = q
        for _ in range(layers):
            x = A.flash_attention(x, k, v, 0, 729)
        return x

    f = jax.jit(many)
    jax.device_get(f(q, k, v).ravel()[0])
    meds = []
    for _ in range(reps):
        pre = probe_tfs()
        t0 = time.perf_counter()
        out = f(q, k, v)
        jax.device_get(out.ravel()[0])
        dt = time.perf_counter() - t0
        post = probe_tfs()
        healthy = pre >= 80 and post >= 80
        log(f"{dt*1000:.1f} ms ({layers} layers) probe "
            f"{pre:.0f}/{post:.0f} {'ok' if healthy else 'DEGRADED'}")
        if healthy:
            meds.append(dt)
        if len(meds) >= 3:
            break
    if meds:
        log(f"median: {float(np.median(meds))*1000:.1f} ms")
    else:
        log("no healthy window")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--numerics", action="store_true")
    p.add_argument("--time", action="store_true")
    args = p.parse_args()
    rc = 0
    if args.numerics or not args.time:
        rc = run_numerics()
    if args.time:
        run_timing()
    sys.exit(1 if rc else 0)
