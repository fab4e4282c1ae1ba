"""ViT attention-core decomposition: isolate the head-transpose cost from
the score/softmax cost, and try einsum-shaped projections that ask XLA to
emit the (B,H,T,d) layout directly. Diagnostic tool."""

import sys
import time

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
    main()
