"""int4 runtime quantization tests: pack/unpack roundtrip, fused kernel
parity (interpret mode) against the XLA dequant+dot path, stacked layer
indexing, and an end-to-end quantized tiny model."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from moondream_tpu.ops.quant import (
    GROUP,
    dequantize_weight,
    quantize_weight,
    quantized_matmul,
)


def test_quantize_roundtrip_error_bound():
    rng = np.random.default_rng(0)
    w = rng.standard_normal((512, 256)).astype(np.float32)
    q = quantize_weight(w)
    assert q["packed"].shape == (256, 256)
    assert q["scale"].shape == (512 // GROUP, 256)
    back = np.asarray(dequantize_weight(q, jnp.float32))
    # max error is half a quantization step per (group, column)
    step = q["scale"]
    err = np.abs(back - w).reshape(512 // GROUP, GROUP, 256).max(axis=1)
    assert np.all(err <= step * 0.5 + 1e-5)


def test_quantize_packing_halves():
    """Byte row r holds nibbles for rows r (high) and r + K/2 (low)."""
    w = np.zeros((256, 128), np.float32)
    w[3, 0] = 15.0    # row 3 -> high nibble of byte row 3
    w[131, 0] = 7.0   # row 131 = 3 + 128 -> low nibble of byte row 3
    w[200, 0] = 15.0  # anchors group 1's scale at 1.0 (affects byte row 72)
    q = quantize_weight(w)
    b = int(q["packed"][3, 0])
    assert b >> 4 == 15
    assert b & 0x0F == 7


def _xla_matmul(x, qw, layer=None):
    w = dequantize_weight(qw, x.dtype)
    if layer is not None and w.ndim == 3:
        w = w[layer]
    return np.asarray(
        jnp.dot(x, w, preferred_element_type=jnp.float32).astype(x.dtype),
        np.float32,
    )


@pytest.mark.parametrize("m", [1, 8, 300])
def test_kernel_matches_xla(m):
    rng = np.random.default_rng(m)
    k, n = 512, 256
    x = jnp.asarray(rng.standard_normal((m, k)) * 0.2, jnp.float32)
    qw = jax.tree.map(
        jnp.asarray, quantize_weight(rng.standard_normal((k, n)) * 0.1)
    )
    out = np.asarray(quantized_matmul(x, qw, interpret=True), np.float32)
    ref = _xla_matmul(x, qw)
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-3)


def test_kernel_stacked_layer_indexing():
    rng = np.random.default_rng(7)
    L, k, n = 3, 256, 128
    x = jnp.asarray(rng.standard_normal((4, k)) * 0.2, jnp.float32)
    dense = rng.standard_normal((L, k, n)).astype(np.float32) * 0.1
    qw = jax.tree.map(jnp.asarray, quantize_weight(dense))
    assert qw["packed"].shape == (L, k // 2, n)
    for layer in range(L):
        out = np.asarray(
            quantized_matmul(x, qw, layer=jnp.int32(layer), interpret=True),
            np.float32,
        )
        ref = _xla_matmul(x, qw, layer)
        np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-3)


def test_quantized_model_end_to_end():
    """quantize_text_params + full caption pipeline on the tiny model."""
    from PIL import Image

    from moondream_tpu.config import tiny_test_config
    from moondream_tpu.models.moondream import MoondreamModel
    from moondream_tpu.models.text import quantize_text_params
    from moondream_tpu.tokenizer import ByteTokenizer

    cfg = tiny_test_config()
    model = MoondreamModel(cfg, tokenizer=ByteTokenizer(), seed=0)
    dense_params = model.params

    qtext = quantize_text_params(dense_params["text"])
    assert "blocks_q" in qtext
    assert "w" not in qtext["blocks"]["attn"]["qkv"]
    # packed weights are ~4x smaller than the dense bf16 originals
    dense_bytes = dense_params["text"]["blocks"]["attn"]["qkv"]["w"].size * 2
    packed_bytes = qtext["blocks_q"]["attn"]["qkv"]["packed"].size
    assert packed_bytes * 3 < dense_bytes

    qmodel = MoondreamModel(
        cfg,
        params={**dense_params, "text": qtext},
        tokenizer=ByteTokenizer(),
    )
    rng = np.random.default_rng(0)
    image = Image.fromarray(
        rng.integers(0, 255, size=(96, 128, 3), dtype=np.uint8)
    )
    greedy = {"temperature": 0.0, "top_p": 0.0, "max_tokens": 6}
    out1 = qmodel.caption(image, "normal", settings=greedy)["caption"]
    out2 = qmodel.caption(image, "normal", settings=greedy)["caption"]
    assert out1 == out2  # deterministic
    ans = qmodel.query(image=image, question="what?", settings=greedy)["answer"]
    assert isinstance(ans, str)
    det = qmodel.detect(image, "thing", settings=greedy)
    assert "objects" in det


def test_int8_vision_encoder_close_to_bf16():
    """quantize_vision_params: int8 block matmuls track the bf16 encoder
    closely (per-output-channel weights + dynamic per-row activations)."""
    from moondream_tpu.config import tiny_test_config
    from moondream_tpu.models.vision import (
        init_vision_params,
        quantize_vision_params,
        vision_encoder,
    )

    cfg = tiny_test_config().vision
    w = init_vision_params(cfg, jax.random.PRNGKey(0))
    wq = quantize_vision_params(w)
    assert "blocks" not in wq and "wq" in wq["blocks_q"]["attn"]["qkv"]

    x = jax.random.uniform(
        jax.random.PRNGKey(1),
        (2, cfg.crop_size, cfg.crop_size, 3),
        jnp.bfloat16, -1.0, 1.0,
    )
    ref = np.asarray(vision_encoder(x, w, cfg), dtype=np.float32)
    out = np.asarray(vision_encoder(x, wq, cfg), dtype=np.float32)
    # cosine similarity per token embedding
    num = (ref * out).sum(-1)
    den = np.linalg.norm(ref, axis=-1) * np.linalg.norm(out, axis=-1) + 1e-9
    cos = num / den
    assert cos.min() > 0.99, cos.min()


def test_int8_vision_static_act_scales_close_to_bf16():
    """Statically calibrated activation scales (collect_vision_act_stats +
    quantize_vision_params(act_stats=...)): no runtime amax reductions,
    accuracy comparable to the dynamic per-row path on in-distribution
    inputs (round-4 verdict #4)."""
    from moondream_tpu.config import tiny_test_config
    from moondream_tpu.models.vision import (
        collect_vision_act_stats,
        init_vision_params,
        quantize_vision_params,
        vision_encoder,
    )

    cfg = tiny_test_config().vision
    w = init_vision_params(cfg, jax.random.PRNGKey(0))
    cal = jax.random.uniform(
        jax.random.PRNGKey(2),
        (4, cfg.crop_size, cfg.crop_size, 3),
        jnp.bfloat16, -1.0, 1.0,
    )
    stats = collect_vision_act_stats(cal, w, cfg, chunk=2)
    assert set(stats) == {"qkv", "proj", "fc1", "fc2"}
    assert stats["qkv"].shape == (cfg.enc_n_layers, cfg.enc_dim)
    assert (stats["qkv"] > 0).all()

    ws = quantize_vision_params(w, act_stats=stats)
    qkv = ws["blocks_q"]["attn"]["qkv"]
    assert "inv_a" in qkv and qkv["inv_a"].shape == (
        cfg.enc_n_layers, 1, cfg.enc_dim,
    )

    # disjoint eval crops (same distribution)
    x = jax.random.uniform(
        jax.random.PRNGKey(1),
        (2, cfg.crop_size, cfg.crop_size, 3),
        jnp.bfloat16, -1.0, 1.0,
    )
    ref = np.asarray(vision_encoder(x, w, cfg), dtype=np.float32)
    dyn = np.asarray(
        vision_encoder(x, quantize_vision_params(w), cfg), dtype=np.float32
    )
    sta = np.asarray(vision_encoder(x, ws, cfg), dtype=np.float32)

    def cos(a, b):
        num = (a * b).sum(-1)
        den = np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1) + 1e-9
        return (num / den).min()

    assert cos(ref, sta) > 0.99, cos(ref, sta)
    # static must not be meaningfully worse than dynamic
    err_dyn = np.abs(dyn - ref).mean()
    err_sta = np.abs(sta - ref).mean()
    assert err_sta < 2.0 * err_dyn + 1e-4, (err_sta, err_dyn)


def test_int8_vision_model_end_to_end():
    """Full caption/detect pipeline with an int8-quantized ViT."""
    from PIL import Image

    from moondream_tpu.config import tiny_test_config
    from moondream_tpu.models.moondream import MoondreamModel
    from moondream_tpu.models.vision import quantize_vision_params
    from moondream_tpu.tokenizer import ByteTokenizer

    cfg = tiny_test_config()
    model = MoondreamModel(cfg, tokenizer=ByteTokenizer(), seed=0)
    qmodel = MoondreamModel(
        cfg,
        params={
            **model.params,
            "vision": quantize_vision_params(model.params["vision"]),
        },
        tokenizer=ByteTokenizer(),
    )
    rng = np.random.default_rng(0)
    image = Image.fromarray(
        rng.integers(0, 255, size=(96, 128, 3), dtype=np.uint8)
    )
    greedy = {"temperature": 0.0, "top_p": 0.0, "max_tokens": 6}
    out1 = qmodel.caption(image, "normal", settings=greedy)["caption"]
    out2 = qmodel.caption(image, "normal", settings=greedy)["caption"]
    assert out1 == out2
    det = qmodel.detect(image, "thing", settings=greedy)
    assert "objects" in det


def test_int8_text_decoder_close_to_dense():
    """quantize_text_params_int8: the w8a8 block path tracks the dense
    decoder closely (per-output-channel weights, dynamic per-row
    activations) through prefill AND cached decode steps."""
    from moondream_tpu.config import tiny_test_config
    from moondream_tpu.models import text as jtext
    from moondream_tpu.models.text import quantize_text_params_int8

    cfg = tiny_test_config().text
    params = jtext.init_text_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    q = quantize_text_params_int8(params)
    assert "blocks_q" not in q
    assert "w" not in q["blocks"]["attn"]["qkv"]
    assert q["blocks"]["attn"]["qkv"]["wq"].dtype == jnp.int8
    L = cfg.n_layers
    assert q["blocks"]["mlp"]["fc1"]["scale"].shape[0] == L

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((1, 12, cfg.dim)) * 0.3, jnp.float32)
    kv_d = jtext.KVCache.create(cfg, batch=1, dtype=jnp.float32)
    kv_q = jtext.KVCache.create(cfg, batch=1, dtype=jnp.float32)
    h_d, kv_d = jtext.text_decoder(x, params, kv_d, jnp.int32(0), jnp.int32(0), cfg)
    h_q, kv_q = jtext.text_decoder(x, q, kv_q, jnp.int32(0), jnp.int32(0), cfg)
    # int8 error budget: per-channel weights (~0.4% rel) x 2 linears/block
    cos = np.sum(np.asarray(h_d) * np.asarray(h_q)) / (
        np.linalg.norm(h_d) * np.linalg.norm(h_q)
    )
    assert cos > 0.999, cos
    np.testing.assert_allclose(np.asarray(h_q), np.asarray(h_d), atol=0.15)

    pos = 12
    for step in range(3):
        tok = jnp.asarray(
            rng.standard_normal((1, 1, cfg.dim)) * 0.3, jnp.float32
        )
        h_d, kv_d = jtext.text_decoder(
            tok, params, kv_d, jnp.int32(pos), jnp.int32(0), cfg
        )
        h_q, kv_q = jtext.text_decoder(
            tok, q, kv_q, jnp.int32(pos), jnp.int32(0), cfg
        )
        np.testing.assert_allclose(np.asarray(h_q), np.asarray(h_d), atol=0.15)
        pos += 1


def test_int8_text_model_end_to_end():
    """runtime_int8 text params through the full caption/query pipeline:
    the quantized tree rides the layer scan's xs and dispatches through
    ops.layers.linear's int8 branch with no engine changes."""
    from PIL import Image

    from moondream_tpu.config import tiny_test_config
    from moondream_tpu.models.moondream import MoondreamModel
    from moondream_tpu.models.text import quantize_text_params_int8
    from moondream_tpu.tokenizer import ByteTokenizer

    cfg = tiny_test_config()
    model = MoondreamModel(cfg, tokenizer=ByteTokenizer(), seed=0)
    qmodel = MoondreamModel(
        cfg,
        params={
            **model.params,
            "text": quantize_text_params_int8(model.params["text"]),
        },
        tokenizer=ByteTokenizer(),
    )
    rng = np.random.default_rng(0)
    image = Image.fromarray(
        rng.integers(0, 255, size=(96, 128, 3), dtype=np.uint8)
    )
    greedy = {"temperature": 0.0, "top_p": 0.0, "max_tokens": 6}
    out1 = qmodel.caption(image, "normal", settings=greedy)["caption"]
    out2 = qmodel.caption(image, "normal", settings=greedy)["caption"]
    assert out1 == out2
    ans = qmodel.query(image=image, question="what?", settings=greedy)["answer"]
    assert isinstance(ans, str)


def test_int8_text_finetune_guard():
    """Cache-free training paths refuse quantized runtime text params."""
    from moondream_tpu.config import tiny_test_config
    from moondream_tpu.models import text as jtext
    from moondream_tpu.models.text import quantize_text_params_int8

    cfg = tiny_test_config().text
    params = jtext.init_text_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    q = quantize_text_params_int8(params)
    x = jnp.zeros((1, 4, cfg.dim), jnp.float32)
    with pytest.raises(ValueError, match="quantized runtime"):
        jtext.produce_hidden(x, q, cfg)
