"""SigLIP-style vision encoder + projection (functional JAX).

Behavioral parity with the reference encoder
(/root/reference/moondream/torch/vision.py:25-147): linear patch embedding,
learned position embeddings, `enc_n_layers` pre-LN transformer blocks with
fused-QKV bidirectional attention and tanh-GELU MLP, final LN, then a
projection that mean-pools stitched local features to a 27x27 grid, concats
with the global crop's features, and maps to the text width via a 2-layer MLP.

TPU-first design choices (not ports):
  * Per-block weights are stacked along a leading layer axis and the block
    loop is a `lax.scan` — one compiled block body regardless of depth.
  * Crop batches are padded to static bucket sizes by the caller so the
    encoder compiles for a handful of shapes only.
  * The adaptive mean-pool is expressed as a dense pooling matrix (built once
    per input grid size) applied as two matmuls — MXU-friendly, and exactly
    equal to torch's adaptive_avg_pool2d bin semantics.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from ..config import VisionConfig
from ..ops.layers import attn_core, gelu_approx, layer_norm, linear, mlp


def create_patches(x: jax.Array, patch_size: int) -> jax.Array:
    """(B, H, W, C) uint/float image tensor -> (B, n_patches, C*P*P).

    Channel-last input (natural layout for host arrays); the per-patch feature
    order matches the reference's (C, P1, P2) flattening
    (vision.py:44-61) so patch-embedding weights are interchangeable.
    """
    b, h, w, c = x.shape
    p = patch_size
    x = x.reshape(b, h // p, p, w // p, p, c)
    # -> (B, H/P, W/P, C, P, P): same per-patch element order as the reference.
    x = x.transpose(0, 1, 3, 5, 2, 4)
    return x.reshape(b, (h // p) * (w // p), c * p * p)


def vision_encoder(crops_bhwc: jax.Array, w: dict, config: VisionConfig) -> jax.Array:
    """Encode a batch of crops: (B, 378, 378, 3) in [-1, 1] -> (B, 729, enc_dim).

    Reference: vision.py:64-74.
    """
    x = create_patches(crops_bhwc, config.enc_patch_size)
    x = linear(x, w["patch_emb"])
    x = x + w["pos_emb"]

    # Token padding is hoisted OUT of the layer scan: pad once to the flash
    # kernel's 128-lane grid (729 -> 768) and slice once at the end, instead
    # of the kernel wrapper re-padding q/k/v (three full-activation copies)
    # and re-slicing the output every layer. Dead tokens are provably
    # isolated: real rows attend only cols < n_real (`attn(n_real=...)`
    # mask prefix) and every other block op (LN/MLP/linear) is
    # token-independent, so real-token outputs are unchanged.
    n_real = x.shape[1]
    t_pad = -(-n_real // 128) * 128
    if t_pad != n_real:
        x = jnp.pad(x, ((0, 0), (0, t_pad - n_real), (0, 0)))

    def block(h, bw):
        return _encoder_block(h, bw, config.enc_n_heads, n_real), None

    x, _ = jax.lax.scan(block, x, w.get("blocks_q") or w["blocks"])
    return layer_norm(x[:, :n_real], w["post_ln"])


def _encoder_block(h, bw, n_heads: int, n_real: int, capture: bool = False):
    """One pre-LN ViT block. With `capture`, also returns the per-channel
    abs-max of each quantized matmul's INPUT over the real tokens — the
    observation record for static activation calibration. One body serves
    both the encoder scan and the calibration scan so the two can't drift."""
    a_qkv = layer_norm(h, bw["ln1"])
    core = attn_core(a_qkv, bw["attn"], n_heads, n_real=n_real)
    h = h + linear(core, bw["attn"]["proj"])
    a_fc1 = layer_norm(h, bw["ln2"])
    hid = gelu_approx(linear(a_fc1, bw["mlp"]["fc1"]))
    h = h + linear(hid, bw["mlp"]["fc2"])
    if not capture:
        return h
    def amax(t):
        return jnp.max(jnp.abs(t[:, :n_real].astype(jnp.float32)), axis=(0, 1))
    return h, {"qkv": amax(a_qkv), "proj": amax(core),
               "fc1": amax(a_fc1), "fc2": amax(hid)}


def collect_vision_act_stats(
    crops_bhwc: jax.Array,
    w: dict,
    config: VisionConfig,
    chunk: int = 16,
    backend: str | None = None,
) -> dict:
    """Per-layer, per-input-channel activation abs-max for the four ViT
    block matmuls (qkv/proj/fc1/fc2 inputs), observed by running the bf16
    encoder over calibration crops. Feeds
    `quantize_vision_params(act_stats=...)`. Returns
    {"qkv"|"proj"|"fc1"|"fc2": fp32 (n_layers, in_dim)}.

    `backend` pins the observation run to that JAX backend (e.g. "cpu").
    Calibration is a one-time OFFLINE step, so the natural place for it
    is the host, next to the checkpoint loader, before weights ship to
    the accelerator — host-resident `w` then costs no transfer. Passing
    device-resident `w` with backend="cpu" pulls the weights D2H first
    (fine on PCIe; expensive over a tunneled test chip)."""
    if backend is not None:
        dev = jax.devices(backend)[0]
        w = jax.device_put(w, dev)
        crops_bhwc = jax.device_put(crops_bhwc, dev)

    @partial(jax.jit, backend=backend)
    def run(x):
        # Trace-time switch: on a CPU observation backend the Pallas
        # flash kernel cannot lower (interpret-only), so route attention
        # through the XLA fallback (parity-tested vs the kernel). Scoped
        # to this trace; the encoder proper is unaffected.
        import os as _os

        if backend == "cpu":
            _os.environ["MOONDREAM_DISABLE_PALLAS"] = "1"
        try:
            return _run_body(x)
        finally:
            if backend == "cpu":
                _os.environ.pop("MOONDREAM_DISABLE_PALLAS", None)

    def _run_body(x):
        x = create_patches(x, config.enc_patch_size)
        x = linear(x, w["patch_emb"])
        x = x + w["pos_emb"]
        n_real = x.shape[1]
        t_pad = -(-n_real // 128) * 128
        if t_pad != n_real:
            x = jnp.pad(x, ((0, 0), (0, t_pad - n_real), (0, 0)))

        def block(h, bw):
            return _encoder_block(
                h, bw, config.enc_n_heads, n_real, capture=True
            )

        _, stats = jax.lax.scan(block, x, w["blocks"])
        return stats

    merged = None
    n = crops_bhwc.shape[0]
    if n > chunk:  # keep one compiled chunk shape; drop the ragged tail
        n = (n // chunk) * chunk
    # Keep host-CPU executables out of the persistent compilation cache:
    # cache entries are not keyed on host machine features, and loading a
    # CPU AOT result compiled on a different machine warns about
    # potential SIGILL (seen with the tunneled remote-compile service).
    # Calibration compiles in ~seconds on CPU, so caching buys nothing.
    prev_cache = None
    if backend == "cpu":
        prev_cache = jax.config.jax_compilation_cache_dir
        jax.config.update("jax_compilation_cache_dir", None)
    try:
        for i in range(0, n, chunk):
            s = run(crops_bhwc[i : i + chunk])
            merged = s if merged is None else jax.tree.map(
                jnp.maximum, merged, s
            )
    finally:
        if backend == "cpu":
            jax.config.update("jax_compilation_cache_dir", prev_cache)
    return jax.tree.map(lambda t: np.asarray(t), merged)


def quantize_vision_params(
    w: dict, act_stats: dict | None = None, alpha: float = 0.5
) -> dict:
    """Per-output-channel symmetric int8 quantization of the ViT block
    matmuls (qkv/proj/fc1/fc2) — the encoder's FLOPs. The MXU's int8 path
    runs at 2x the bf16 rate on v5e (measured 277 vs 151 TF/s), and the
    encoder is compute-bound, so this targets the pipeline's dominant
    stage. LN, biases, patch/pos embeddings and the projection MLP stay
    bf16. Accuracy note: standard PTQ — validate with eval/quant_drift.py
    (and on real checkpoints) before production use.

    Without `act_stats`, activations are quantized DYNAMICALLY per row at
    runtime (ops.layers.linear) — an extra amax reduction pass over every
    block input that was measured to eat the entire 2x MXU win
    (BASELINE.md round-3). With `act_stats` (per-channel activation
    abs-max from `collect_vision_act_stats`), quantization is STATIC:
    a SmoothQuant-style per-input-channel equalizer
    c = amax_act^alpha / amax_w^(1-alpha) migrates activation outliers
    into the weights offline, the per-tensor activation scale is folded
    into a single elementwise 'inv_a' multiplier (no runtime reductions),
    and the output rescale is pre-multiplied into 'scale'."""

    def q(lin, amax_in=None):
        wt = lin["w"].astype(jnp.float32)  # (L, in, out)
        if amax_in is None:
            s = jnp.maximum(
                jnp.max(jnp.abs(wt), axis=1, keepdims=True) / 127.0, 1e-8
            )
            codes = jnp.round(wt / s).astype(jnp.int8)
            return {"wq": codes, "scale": s, "b": lin["b"]}
        amax_in = jnp.maximum(jnp.asarray(amax_in, jnp.float32), 1e-6)
        w_amax = jnp.maximum(jnp.max(jnp.abs(wt), axis=2), 1e-6)  # (L, in)
        c = jnp.clip(
            amax_in**alpha / w_amax ** (1.0 - alpha), 1e-3, 1e3
        )  # (L, in)
        # normalize per layer so the equalizer shifts scale between
        # activations and weights without changing their joint magnitude
        c = c / jnp.median(c, axis=1, keepdims=True)
        wt_eq = wt * c[:, :, None]
        s = jnp.maximum(
            jnp.max(jnp.abs(wt_eq), axis=1, keepdims=True) / 127.0, 1e-8
        )  # (L, 1, out)
        codes = jnp.round(wt_eq / s).astype(jnp.int8)
        a = jnp.max(amax_in / c, axis=1) / 127.0  # (L,) per-tensor act scale
        return {
            "wq": codes,
            "scale": s * a[:, None, None],
            "inv_a": (1.0 / (c * a[:, None]))[:, None, :],  # (L, 1, in)
            "b": lin["b"],
        }

    b = w["blocks"]
    st = act_stats or {}
    return {
        **{k: v for k, v in w.items() if k != "blocks"},
        "blocks_q": {
            "ln1": b["ln1"],
            "ln2": b["ln2"],
            "attn": {
                "qkv": q(b["attn"]["qkv"], st.get("qkv")),
                "proj": q(b["attn"]["proj"], st.get("proj")),
            },
            "mlp": {
                "fc1": q(b["mlp"]["fc1"], st.get("fc1")),
                "fc2": q(b["mlp"]["fc2"], st.get("fc2")),
            },
        },
    }


@lru_cache(maxsize=8)
def _pool_matrix(in_size: int, out_size: int) -> np.ndarray:
    """Dense (out_size, in_size) row-stochastic matrix replicating
    torch.adaptive_avg_pool2d's bin edges: bin i averages input rows
    [floor(i*n/out), ceil((i+1)*n/out))."""
    m = np.zeros((out_size, in_size), dtype=np.float32)
    for i in range(out_size):
        lo = (i * in_size) // out_size
        hi = -((-(i + 1) * in_size) // out_size)  # ceil
        m[i, lo:hi] = 1.0 / (hi - lo)
    return m


def adaptive_avg_pool2d(x: jax.Array, out_hw: tuple) -> jax.Array:
    """(H, W, C) -> (out_h, out_w, C) adaptive mean pool as two matmuls."""
    in_h, in_w = int(x.shape[0]), int(x.shape[1])
    out_h, out_w = out_hw
    ph = jnp.asarray(_pool_matrix(in_h, out_h), dtype=jnp.float32)
    pw = jnp.asarray(_pool_matrix(in_w, out_w), dtype=jnp.float32)
    xf = x.astype(jnp.float32)
    pooled = jnp.einsum("oh,hwc->owc", ph, xf)
    pooled = jnp.einsum("pw,owc->opc", pw, pooled)
    return pooled.astype(x.dtype)


def vision_projection(
    global_features: jax.Array,
    reconstructed: jax.Array,
    w: dict,
    config: VisionConfig,
) -> jax.Array:
    """Fuse global crop features with pooled stitched local features.

    global_features: (729, enc_dim); reconstructed: (H, W, enc_dim) stitched
    local feature plane. Returns (729, proj_out_dim). Reference vision.py:77-89.
    """
    g = config.grid_size
    pooled = adaptive_avg_pool2d(reconstructed, (g, g)).reshape(g * g, config.enc_dim)
    fused = jnp.concatenate([global_features, pooled], axis=-1)
    return mlp(fused, w["proj_mlp"])


def init_vision_params(config: VisionConfig, key: jax.Array, dtype=jnp.bfloat16) -> dict:
    """Random-init parameter pytree (shapes matching build_vision_model,
    reference vision.py:92-147, with (in, out) linear layout and stacked
    blocks)."""
    d, ff, L = config.enc_dim, config.enc_ff_dim, config.enc_n_layers
    pd = config.patch_dim
    keys = iter(jax.random.split(key, 16))

    def lin(k, i, o):
        return {
            "w": (jax.random.normal(k, (i, o)) * (i**-0.5)).astype(dtype),
            "b": jnp.zeros((o,), dtype),
        }

    def ln():
        return {"weight": jnp.ones((L, d), dtype), "bias": jnp.zeros((L, d), dtype)}

    def stacked_lin(k, i, o):
        return {
            "w": (jax.random.normal(k, (L, i, o)) * (i**-0.5)).astype(dtype),
            "b": jnp.zeros((L, o), dtype),
        }

    return {
        "patch_emb": lin(next(keys), pd, d),
        "pos_emb": (
            jax.random.normal(next(keys), (1, config.num_patches, d)) * 0.02
        ).astype(dtype),
        "blocks": {
            "ln1": ln(),
            "attn": {
                "qkv": stacked_lin(next(keys), d, 3 * d),
                "proj": stacked_lin(next(keys), d, d),
            },
            "ln2": ln(),
            "mlp": {
                "fc1": stacked_lin(next(keys), d, ff),
                "fc2": stacked_lin(next(keys), ff, d),
            },
        },
        "post_ln": {"weight": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)},
        "proj_mlp": {
            "fc1": lin(next(keys), 2 * d, config.proj_inner_dim),
            "fc2": lin(next(keys), config.proj_inner_dim, config.proj_out_dim),
        },
    }
