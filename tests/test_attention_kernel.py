"""Pallas flash-attention kernel correctness (interpreter mode on CPU)
against the XLA masked-sdpa path."""

import numpy as np
import pytest

import jax.numpy as jnp

from moondream_tpu.ops.attention import attention, flash_attention


def _xla(q, k, v, pos, prefix):
    return np.asarray(
        attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), pos, prefix,
            force_xla=True,
        )
    )


def _pallas(q, k, v, pos, prefix):
    return np.asarray(
        flash_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), pos, prefix,
            interpret=True,
        )
    )


def test_vit_shape():
    rng = np.random.default_rng(0)
    b, h, t, d = 2, 4, 729, 72
    q = (rng.standard_normal((b, h, t, d)) * 0.3).astype(np.float32)
    k = (rng.standard_normal((b, h, t, d)) * 0.3).astype(np.float32)
    v = (rng.standard_normal((b, h, t, d)) * 0.3).astype(np.float32)
    np.testing.assert_allclose(
        _pallas(q, k, v, 0, t), _xla(q, k, v, 0, t), atol=2e-5, rtol=1e-4
    )


def test_image_prefill_shape():
    """730 query rows at pos 0 with a 730-wide bidirectional prefix over a
    768-slot kv span (dead tail masked causally)."""
    rng = np.random.default_rng(1)
    b, h, tq, tk, d = 1, 2, 730, 768, 64
    q = (rng.standard_normal((b, h, tq, d)) * 0.3).astype(np.float32)
    k = (rng.standard_normal((b, h, tk, d)) * 0.3).astype(np.float32)
    v = (rng.standard_normal((b, h, tk, d)) * 0.3).astype(np.float32)
    np.testing.assert_allclose(
        _pallas(q, k, v, 0, 730), _xla(q, k, v, 0, 730), atol=2e-5, rtol=1e-4
    )


def test_prompt_prefill_after_image():
    """16 query rows at pos 730, causal over a 1024-slot span."""
    rng = np.random.default_rng(2)
    b, h, tq, tk, d = 1, 2, 16, 1024, 64
    q = (rng.standard_normal((b, h, tq, d)) * 0.3).astype(np.float32)
    k = (rng.standard_normal((b, h, tk, d)) * 0.3).astype(np.float32)
    v = (rng.standard_normal((b, h, tk, d)) * 0.3).astype(np.float32)
    np.testing.assert_allclose(
        _pallas(q, k, v, 730, 730), _xla(q, k, v, 730, 730), atol=2e-5, rtol=1e-4
    )


def test_prefix_boundary_inside_span():
    rng = np.random.default_rng(3)
    b, h, t, d = 1, 3, 128, 32
    q = (rng.standard_normal((b, h, t, d)) * 0.3).astype(np.float32)
    k = (rng.standard_normal((b, h, t, d)) * 0.3).astype(np.float32)
    v = (rng.standard_normal((b, h, t, d)) * 0.3).astype(np.float32)
    np.testing.assert_allclose(
        _pallas(q, k, v, 5, 12), _xla(q, k, v, 5, 12), atol=2e-5, rtol=1e-4
    )


def test_pure_causal():
    rng = np.random.default_rng(4)
    b, h, t, d = 1, 2, 256, 64
    q = (rng.standard_normal((b, h, t, d)) * 0.3).astype(np.float32)
    k = (rng.standard_normal((b, h, t, d)) * 0.3).astype(np.float32)
    v = (rng.standard_normal((b, h, t, d)) * 0.3).astype(np.float32)
    np.testing.assert_allclose(
        _pallas(q, k, v, 0, 0), _xla(q, k, v, 0, 0), atol=2e-5, rtol=1e-4
    )


def test_kvtiled_full_context_prefill():
    """Spans past FLASH_KV_TILE_THRESHOLD route to the online-softmax
    kv-tiled kernel: full-context 2048-wide prefill with the 730
    bidirectional prefix, no materialized (Tq, Tk) score block."""
    rng = np.random.default_rng(5)
    b, h, tq, tk, d = 1, 2, 2048, 2048, 64
    q = (rng.standard_normal((b, h, tq, d)) * 0.3).astype(np.float32)
    k = (rng.standard_normal((b, h, tk, d)) * 0.3).astype(np.float32)
    v = (rng.standard_normal((b, h, tk, d)) * 0.3).astype(np.float32)
    np.testing.assert_allclose(
        _pallas(q, k, v, 0, 730), _xla(q, k, v, 0, 730), atol=3e-5, rtol=1e-4
    )


def test_kvtiled_prompt_after_long_context():
    """Short prompt rows attending a long (1536) span, pure causal, with a
    non-tile-aligned kv length exercising the tail tile padding."""
    rng = np.random.default_rng(6)
    b, h, tq, tk, d = 1, 2, 16, 1500, 64
    q = (rng.standard_normal((b, h, tq, d)) * 0.3).astype(np.float32)
    k = (rng.standard_normal((b, h, tk, d)) * 0.3).astype(np.float32)
    v = (rng.standard_normal((b, h, tk, d)) * 0.3).astype(np.float32)
    np.testing.assert_allclose(
        _pallas(q, k, v, 1400, 730), _xla(q, k, v, 1400, 730),
        atol=3e-5, rtol=1e-4,
    )


def test_kvtiled_vit_headdim():
    """72-wide ViT heads (d < 128) through the kv-tiled kernel's
    l-broadcast slice path."""
    rng = np.random.default_rng(7)
    b, h, tq, tk, d = 1, 2, 1280, 1280, 72
    q = (rng.standard_normal((b, h, tq, d)) * 0.3).astype(np.float32)
    k = (rng.standard_normal((b, h, tk, d)) * 0.3).astype(np.float32)
    v = (rng.standard_normal((b, h, tk, d)) * 0.3).astype(np.float32)
    np.testing.assert_allclose(
        _pallas(q, k, v, 0, tk), _xla(q, k, v, 0, tk), atol=3e-5, rtol=1e-4
    )


# ------------------------------------------------- decode kernel (Tq == 1)
def _pallas_decode(q, k, v, pos, prefix):
    from moondream_tpu.ops.attention import decode_attention

    return np.asarray(
        decode_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), pos, prefix,
            interpret=True,
        )
    )


def test_decode_kernel_matches_xla():
    rng = np.random.default_rng(2)
    b, h, tk, d = 1, 8, 512, 64
    q = (rng.standard_normal((b, h, 1, d)) * 0.3).astype(np.float32)
    k = (rng.standard_normal((b, h, tk, d)) * 0.3).astype(np.float32)
    v = (rng.standard_normal((b, h, tk, d)) * 0.3).astype(np.float32)
    for pos in (0, 100, 511):
        np.testing.assert_allclose(
            _pallas_decode(q, k, v, pos, 0), _xla(q, k, v, pos, 0),
            atol=2e-5, rtol=1e-4,
        )


def test_decode_kernel_masks_garbage_tail():
    """Slots beyond pos hold garbage between requests — they must not leak."""
    rng = np.random.default_rng(3)
    b, h, tk, d = 1, 4, 256, 64
    q = (rng.standard_normal((b, h, 1, d)) * 0.3).astype(np.float32)
    k = (rng.standard_normal((b, h, tk, d)) * 0.3).astype(np.float32)
    v = (rng.standard_normal((b, h, tk, d)) * 0.3).astype(np.float32)
    pos = 97
    k_dirty = k.copy()
    v_dirty = v.copy()
    k_dirty[:, :, pos + 1 :] = 1e4
    v_dirty[:, :, pos + 1 :] = -1e4
    np.testing.assert_allclose(
        _pallas_decode(q, k_dirty, v_dirty, pos, 0),
        _pallas_decode(q, k, v, pos, 0),
        atol=1e-6,
    )


def test_decode_kernel_gqa_group_mapping():
    """Hq > Hkv: each query head must read its own KV group via the index
    map, matching XLA with an explicit repeat."""
    rng = np.random.default_rng(4)
    b, hq, hkv, tk, d = 2, 8, 2, 128, 64
    q = (rng.standard_normal((b, hq, 1, d)) * 0.3).astype(np.float32)
    k = (rng.standard_normal((b, hkv, tk, d)) * 0.3).astype(np.float32)
    v = (rng.standard_normal((b, hkv, tk, d)) * 0.3).astype(np.float32)
    rep = hq // hkv
    k_rep = np.repeat(k, rep, axis=1)
    v_rep = np.repeat(v, rep, axis=1)
    np.testing.assert_allclose(
        _pallas_decode(q, k, v, 64, 0), _xla(q, k_rep, v_rep, 64, 0),
        atol=2e-5, rtol=1e-4,
    )


def test_decode_kernel_prefix_rule():
    """A decode step *inside* the bidirectional prefix (pos < prefix) may
    attend to the whole prefix block."""
    rng = np.random.default_rng(5)
    b, h, tk, d = 1, 2, 128, 64
    q = (rng.standard_normal((b, h, 1, d)) * 0.3).astype(np.float32)
    k = (rng.standard_normal((b, h, tk, d)) * 0.3).astype(np.float32)
    v = (rng.standard_normal((b, h, tk, d)) * 0.3).astype(np.float32)
    np.testing.assert_allclose(
        _pallas_decode(q, k, v, 10, 100), _xla(q, k, v, 10, 100),
        atol=2e-5, rtol=1e-4,
    )


def test_decode_kernel_multi_tile_block_mapping():
    """b=2 with 32 heads exercises multiple 8-head tiles per batch row —
    the KV block index map must be in block units, not rows."""
    rng = np.random.default_rng(6)
    b, h, tk, d = 2, 32, 256, 64
    q = (rng.standard_normal((b, h, 1, d)) * 0.3).astype(np.float32)
    # make each head's KV distinct so a block-mapping error is visible
    k = (rng.standard_normal((b, h, tk, d)) * 0.3).astype(np.float32)
    v = np.broadcast_to(
        np.arange(b * h, dtype=np.float32).reshape(b, h, 1, 1), (b, h, tk, d)
    ).copy()
    out = _pallas_decode(q, k, v, 200, 0)
    ref = _xla(q, k, v, 200, 0)
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)


# ---------------------------------------- head-paired stacked cache kernel
def _pair(x, pf=2):
    """(B, H, T, D) -> head-paired (B, H/pf, T, pf*D)."""
    b, h, t, d = x.shape
    return (
        x.reshape(b, h // pf, pf, t, d)
        .transpose(0, 1, 3, 2, 4)
        .reshape(b, h // pf, t, pf * d)
    )


def test_decode_cached_paired_matches_xla():
    """Head-paired (L, B, H/2, T, 2D) cache through the paired kernel ==
    XLA sdpa on the plain layout, across layers and positions."""
    from moondream_tpu.ops.attention import decode_attention_cached

    rng = np.random.default_rng(7)
    L, b, h, tk, d = 3, 2, 8, 256, 64
    q = (rng.standard_normal((b, h, 1, d)) * 0.3).astype(np.float32)
    k = (rng.standard_normal((L, b, h, tk, d)) * 0.3).astype(np.float32)
    v = (rng.standard_normal((L, b, h, tk, d)) * 0.3).astype(np.float32)
    kp = np.stack([_pair(k[l]) for l in range(L)])
    vp = np.stack([_pair(v[l]) for l in range(L)])
    for layer in (0, 2):
        for pos, prefix in ((0, 0), (100, 0), (50, 100), (255, 0)):
            got = np.asarray(
                decode_attention_cached(
                    jnp.asarray(q), jnp.asarray(kp), jnp.asarray(vp),
                    layer, pos, prefix, interpret=True,
                )
            )
            ref = _xla(q, k[layer], v[layer], pos, prefix)
            np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)


def test_decode_cached_paired_ragged():
    """Per-row positions (continuous batching) through the paired kernel."""
    from moondream_tpu.ops.attention import decode_attention_cached

    rng = np.random.default_rng(8)
    L, b, h, tk, d = 2, 4, 4, 128, 64
    q = (rng.standard_normal((b, h, 1, d)) * 0.3).astype(np.float32)
    k = (rng.standard_normal((L, b, h, tk, d)) * 0.3).astype(np.float32)
    v = (rng.standard_normal((L, b, h, tk, d)) * 0.3).astype(np.float32)
    kp = np.stack([_pair(k[l]) for l in range(L)])
    vp = np.stack([_pair(v[l]) for l in range(L)])
    pos = np.asarray([3, 60, 127, 0], np.int32)
    got = np.asarray(
        decode_attention_cached(
            jnp.asarray(q), jnp.asarray(kp), jnp.asarray(vp),
            1, jnp.asarray(pos), 0, interpret=True,
        )
    )
    for r in range(b):
        ref = _xla(q[r : r + 1], k[1, r : r + 1], v[1, r : r + 1],
                   int(pos[r]), 0)
        np.testing.assert_allclose(got[r : r + 1], ref, atol=2e-5, rtol=1e-4)


def test_decode_cached_paired_kv_bound():
    """kv_bound restricts reads to the first `bound` slots (time axis is
    unchanged by head pairing); garbage beyond must not leak."""
    from moondream_tpu.ops.attention import decode_attention_cached

    rng = np.random.default_rng(9)
    L, b, h, tk, d = 1, 1, 4, 512, 64
    q = (rng.standard_normal((b, h, 1, d)) * 0.3).astype(np.float32)
    k = (rng.standard_normal((L, b, h, tk, d)) * 0.3).astype(np.float32)
    v = (rng.standard_normal((L, b, h, tk, d)) * 0.3).astype(np.float32)
    k[:, :, :, 256:] = 1e4
    v[:, :, :, 256:] = -1e4
    kp = np.stack([_pair(k[l]) for l in range(L)])
    vp = np.stack([_pair(v[l]) for l in range(L)])
    got = np.asarray(
        decode_attention_cached(
            jnp.asarray(q), jnp.asarray(kp), jnp.asarray(vp),
            0, 200, 0, kv_bound=256, interpret=True,
        )
    )
    ref = _xla(q[:, :, :, :], k[0][:, :, :256], v[0][:, :, :256], 200, 0)
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)


# --------------------------------- small query SPANS over the stacked cache
def test_decode_cached_paired_span():
    """Tq > 1 (speculative verify / short prompt prefill) through the
    paired kernel: query row i sits at position pos+i."""
    from moondream_tpu.ops.attention import decode_attention_cached

    rng = np.random.default_rng(10)
    L, b, h, tk, d, tq = 2, 2, 8, 256, 64, 8
    q = (rng.standard_normal((b, h, tq, d)) * 0.3).astype(np.float32)
    k = (rng.standard_normal((L, b, h, tk, d)) * 0.3).astype(np.float32)
    v = (rng.standard_normal((L, b, h, tk, d)) * 0.3).astype(np.float32)
    kp = np.stack([_pair(k[l]) for l in range(L)])
    vp = np.stack([_pair(v[l]) for l in range(L)])
    for layer in (0, 1):
        for pos, prefix in ((0, 0), (100, 0), (4, 100), (248, 0)):
            got = np.asarray(
                decode_attention_cached(
                    jnp.asarray(q), jnp.asarray(kp), jnp.asarray(vp),
                    layer, pos, prefix, interpret=True,
                )
            )
            ref = _xla(q, k[layer], v[layer], pos, prefix)
            np.testing.assert_allclose(
                got, ref, atol=2e-5, rtol=1e-4,
                err_msg=f"layer={layer} pos={pos} prefix={prefix}",
            )


def test_decode_cached_plain_span():
    """Tq > 1 through the plain (non-paired) stacked kernel — odd head
    count keeps pair_factor at 1."""
    from moondream_tpu.ops.attention import decode_attention_cached

    rng = np.random.default_rng(11)
    L, b, h, tk, d, tq = 2, 1, 3, 256, 64, 4
    q = (rng.standard_normal((b, h, tq, d)) * 0.3).astype(np.float32)
    k = (rng.standard_normal((L, b, h, tk, d)) * 0.3).astype(np.float32)
    v = (rng.standard_normal((L, b, h, tk, d)) * 0.3).astype(np.float32)
    for pos in (0, 97, 252):
        got = np.asarray(
            decode_attention_cached(
                jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                1, pos, 0, interpret=True,
            )
        )
        ref = _xla(q, k[1], v[1], pos, 0)
        np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)


def test_decode_cached_paired_span_masks_future_garbage():
    """Span rows must not attend slots past their own position — garbage
    just beyond each query row's reach must not leak into any row."""
    from moondream_tpu.ops.attention import decode_attention_cached

    rng = np.random.default_rng(12)
    L, b, h, tk, d, tq = 1, 1, 4, 128, 64, 4
    pos = 60
    q = (rng.standard_normal((b, h, tq, d)) * 0.3).astype(np.float32)
    k = (rng.standard_normal((L, b, h, tk, d)) * 0.3).astype(np.float32)
    v = (rng.standard_normal((L, b, h, tk, d)) * 0.3).astype(np.float32)
    k_dirty = k.copy()
    v_dirty = v.copy()
    k_dirty[:, :, :, pos + tq :] = 1e4
    v_dirty[:, :, :, pos + tq :] = -1e4

    def run(kk, vv):
        kp = np.stack([_pair(kk[l]) for l in range(L)])
        vp = np.stack([_pair(vv[l]) for l in range(L)])
        return np.asarray(
            decode_attention_cached(
                jnp.asarray(q), jnp.asarray(kp), jnp.asarray(vp),
                0, pos, 0, interpret=True,
            )
        )

    np.testing.assert_allclose(run(k_dirty, v_dirty), run(k, v), atol=1e-6)
    np.testing.assert_allclose(run(k, v), _xla(q, k[0], v[0], pos, 0),
                               atol=2e-5, rtol=1e-4)


def test_token_padded_plane_real_rows():
    """The ViT runs its whole layer stack at a 128-aligned token count
    (vision.py pads 729 -> 768 ONCE before the scan): rows/cols beyond
    `real_rows` carry live garbage, and the kernel must (a) keep real rows
    exactly equal to the unpadded computation and (b) still take the
    row-independent-mask fast path."""
    rng = np.random.default_rng(7)
    b, h, t_real, t_pad, d = 2, 4, 729, 768, 72
    q = (rng.standard_normal((b, h, t_pad, d)) * 0.3).astype(np.float32)
    k = (rng.standard_normal((b, h, t_pad, d)) * 0.3).astype(np.float32)
    v = (rng.standard_normal((b, h, t_pad, d)) * 0.3).astype(np.float32)
    # dead tokens are bounded but arbitrary — make them adversarial
    q[:, :, t_real:] = 5.0
    k[:, :, t_real:] = -5.0
    v[:, :, t_real:] = 1e3

    padded = np.asarray(
        flash_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            0, t_real, interpret=True, real_rows=t_real,
        )
    )[:, :, :t_real]
    unpadded = _pallas(
        q[:, :, :t_real], k[:, :, :t_real], v[:, :, :t_real], 0, t_real
    )
    np.testing.assert_allclose(padded, unpadded, atol=2e-5, rtol=1e-4)


def test_prefill_bitwise_independent_of_stale_kv():
    """Recycled KV-pool buffers hold a PREVIOUS generation's rows past the
    prefill frontier; those columns are causally masked, but the softmax
    row max must be taken over MASKED scores or the max (and hence every
    exp/sum rounding) depends on that garbage — enough to flip a near-tie
    argmax between otherwise identical runs (the tools/spec_parity_tpu.py
    plain='H' vs spec='' mismatch). Pin bitwise equality, not closeness."""
    rng = np.random.default_rng(8)
    b, h, tq, tk, d = 1, 2, 16, 896, 64
    pos = 742  # prompt prefill after an image; rows pos+tq.. are stale
    q = (rng.standard_normal((b, h, tq, d)) * 0.3).astype(np.float32)
    k = (rng.standard_normal((b, h, tk, d)) * 0.3).astype(np.float32)
    v = (rng.standard_normal((b, h, tk, d)) * 0.3).astype(np.float32)
    k2, v2 = k.copy(), v.copy()
    # different stale tails, including values far above every real score
    k2[:, :, pos + tq:] = 9.0
    v2[:, :, pos + tq:] = -7.0
    a = _pallas(q, k, v, pos, 730)
    bb = _pallas(q, k2, v2, pos, 730)
    assert np.array_equal(a[:, :, :tq], bb[:, :, :tq])
