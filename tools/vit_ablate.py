"""ViT cost decomposition on the real chip: time the full encoder vs
ablated variants (attention->identity, mlp->identity, no LN, pure-matmul
floor) to find where the non-MXU time goes. `--core` runs the
attention-core decomposition (head-transpose cost vs score/softmax
cost, einsum-shaped projections) that used to live in vit_ablate2.py.
Findings recorded in BASELINE.md. Diagnostic tool."""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def log(*a):
    print(*a, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from moondream_tpu.config import MOONDREAM_2B
    from moondream_tpu.models import vision as V
    from moondream_tpu.ops.layers import attn, layer_norm, linear, mlp

    cfg = MOONDREAM_2B.vision
    key = jax.random.PRNGKey(0)
    w = V.init_vision_params(cfg, key, jnp.bfloat16)
    B = 120
    x0 = jax.random.normal(key, (B, 729, cfg.enc_dim), jnp.bfloat16)

    def bench(name, fn, *args, reps=3):
        out = fn(*args)
        jax.block_until_ready(out)
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn(*args)
            jax.device_get(out.ravel()[0])
            best = min(best, time.perf_counter() - t0)
        log(f"{name}: {1000*best:.0f} ms")
        return best

    heads = cfg.enc_n_heads

    @jax.jit
    def full(x, w):
        def block(h, bw):
            h = h + attn(layer_norm(h, bw["ln1"]), bw["attn"], heads)
            h = h + mlp(layer_norm(h, bw["ln2"]), bw["mlp"])
            return h, None

        x, _ = jax.lax.scan(block, x, w["blocks"])
        return x

    @jax.jit
    def no_attn_kernel(x, w):
        # attention matmuls kept (qkv, proj) but score/softmax replaced
        # with identity on v — isolates the attention-core cost
        def block(h, bw):
            y = layer_norm(h, bw["ln1"])
            qkv = linear(y, bw["attn"]["qkv"])
            v = qkv[..., 2 * cfg.enc_dim :]
            h = h + linear(v, bw["attn"]["proj"])
            h = h + mlp(layer_norm(h, bw["ln2"]), bw["mlp"])
            return h, None

        x, _ = jax.lax.scan(block, x, w["blocks"])
        return x

    @jax.jit
    def no_ln(x, w):
        def block(h, bw):
            h = h + attn(h, bw["attn"], heads)
            h = h + mlp(h, bw["mlp"])
            return h, None

        x, _ = jax.lax.scan(block, x, w["blocks"])
        return x

    @jax.jit
    def matmuls_only(x, w):
        # pure MXU floor: the 4 matmuls per block, no LN/attn-core/gelu
        def block(h, bw):
            qkv = linear(h, bw["attn"]["qkv"])
            h = h + linear(qkv[..., 2 * cfg.enc_dim :], bw["attn"]["proj"])
            h = h + linear(linear(h, bw["mlp"]["fc1"]), bw["mlp"]["fc2"])
            return h, None

        x, _ = jax.lax.scan(block, x, w["blocks"])
        return x

    @jax.jit
    def xla_attn_variant(x, w):
        import os

        from moondream_tpu.ops.layers import sdpa

        def block(h, bw):
            y = layer_norm(h, bw["ln1"])
            bsz, seq, d = y.shape
            hd = d // heads
            qkv = linear(y, bw["attn"]["qkv"])
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q = q.reshape(bsz, seq, heads, hd).transpose(0, 2, 1, 3)
            k = k.reshape(bsz, seq, heads, hd).transpose(0, 2, 1, 3)
            v = v.reshape(bsz, seq, heads, hd).transpose(0, 2, 1, 3)
            o = sdpa(q, k, v, None)
            o = o.transpose(0, 2, 1, 3).reshape(bsz, seq, d)
            h = h + linear(o, bw["attn"]["proj"])
            h = h + mlp(layer_norm(h, bw["ln2"]), bw["mlp"])
            return h, None

        x, _ = jax.lax.scan(block, x, w["blocks"])
        return x

    t_full = bench("full (pallas flash)", full, x0, w)
    t_na = bench("attention-core removed (matmuls kept)", no_attn_kernel, x0, w)
    t_nl = bench("LN removed", no_ln, x0, w)
    t_mm = bench("matmuls only", matmuls_only, x0, w)
    t_xla = bench("xla sdpa attention", xla_attn_variant, x0, w)

    log(f"attention core cost: {1000*(t_full-t_na):.0f} ms")
    log(f"LN cost: {1000*(t_full-t_nl):.0f} ms")
    log(f"matmul floor: {1000*t_mm:.0f} ms")
    flops = 27 * (4 * 1152 * 1152 + 2 * 1152 * 4304) * 2 * 729 * B
    log(f"matmul-floor MXU rate: {flops/t_mm/1e12:.0f} TF/s "
        f"(block matmuls {flops/1e12:.1f} TFLOP)")


def core_main():

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from moondream_tpu.config import MOONDREAM_2B
    from moondream_tpu.models import vision as V
    from moondream_tpu.ops.attention import attention
    from moondream_tpu.ops.layers import attn, layer_norm, linear, mlp

    cfg = MOONDREAM_2B.vision
    key = jax.random.PRNGKey(0)
    w = V.init_vision_params(cfg, key, jnp.bfloat16)
    B = 120
    heads = cfg.enc_n_heads
    d = cfg.enc_dim
    hd = d // heads
    x0 = jax.random.normal(key, (B, 729, d), jnp.bfloat16)

    def bench(name, fn, *args, reps=3):
        out = fn(*args)
        jax.block_until_ready(out)
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn(*args)
            jax.device_get(out.ravel()[0])
            best = min(best, time.perf_counter() - t0)
        log(f"{name}: {1000*best:.0f} ms")
        return best

    @jax.jit
    def transpose_identity(x, w):
        # transposes + reshapes kept, attention core replaced by identity:
        # measures the pure layout-shuffle cost
        def block(h, bw):
            y = layer_norm(h, bw["ln1"])
            bsz, seq, dm = y.shape
            qkv = linear(y, bw["attn"]["qkv"])
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q = q.reshape(bsz, seq, heads, hd).transpose(0, 2, 1, 3)
            k = k.reshape(bsz, seq, heads, hd).transpose(0, 2, 1, 3)
            v = v.reshape(bsz, seq, heads, hd).transpose(0, 2, 1, 3)
            o = q + k + v  # consume all three, no attention math
            o = o.transpose(0, 2, 1, 3).reshape(bsz, seq, dm)
            h = h + linear(o, bw["attn"]["proj"])
            h = h + mlp(layer_norm(h, bw["ln2"]), bw["mlp"])
            return h, None

        x, _ = jax.lax.scan(block, x, w["blocks"])
        return x

    @jax.jit
    def einsum_qkv(x, w):
        # per-head projections via einsum with (B,H,T,e) output — lets XLA
        # fold the head split into the matmul epilogue if it can
        def block(h, bw):
            y = layer_norm(h, bw["ln1"])
            wq = bw["attn"]["qkv"]["w"].reshape(d, 3, heads, hd)
            bq = bw["attn"]["qkv"]["b"].reshape(3, heads, hd)
            qkv = jnp.einsum(
                "btd,dshe->sbhte", y, wq,
                preferred_element_type=jnp.float32,
            )
            qkv = (qkv + bq[:, None, :, None, :].astype(jnp.float32)).astype(
                y.dtype
            )
            o = attention(qkv[0], qkv[1], qkv[2], pos=0, prefix=729)
            o = o.transpose(0, 2, 1, 3).reshape(*y.shape)
            h = h + linear(o, bw["attn"]["proj"])
            h = h + mlp(layer_norm(h, bw["ln2"]), bw["mlp"])
            return h, None

        x, _ = jax.lax.scan(block, x, w["blocks"])
        return x

    @jax.jit
    def core_only(q, k, v):
        # pallas flash on pre-transposed inputs: pure kernel cost x27
        def body(c, _):
            o = attention(c, k, v, pos=0, prefix=729)
            return o, None

        o, _ = jax.lax.scan(body, q, None, length=27)
        return o

    t_ti = bench("transposes only (identity core)", transpose_identity, x0, w)
    t_eq = bench("einsum qkv + flash", einsum_qkv, x0, w)
    q = jax.random.normal(key, (B, heads, 729, hd), jnp.bfloat16)
    t_core = bench("flash kernel x27 (no transposes)", core_only, q, q, q)




if __name__ == "__main__":
    if "--core" in sys.argv:
        core_main()
    else:
        main()
