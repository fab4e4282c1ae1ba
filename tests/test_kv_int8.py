"""int8 KV cache (config.text.kv_int8) correctness.

The cache stores int8 codes plus per-(token, cache-row) fp32 scales
(models/text.py KVCache docstring); decode reads half the HBM bytes of a
bf16 cache. New TPU-native capability — the reference's cache is always
bf16/fp16 (reference moondream/torch/text.py). These tests pin:

  * the quantize/dequantize roundtrip error bound,
  * decoder prefill + decode parity vs a dense fp32 cache (XLA branch),
  * the head-paired Pallas decode kernel reading int8 blocks vs the
    dequantized oracle (interpret mode),
  * the full public API (encode / snapshot / restore / caption / batch)
    on a tiny kv_int8 model.
"""

import dataclasses

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from moondream_tpu.config import tiny_test_config
from moondream_tpu.models import text as text_ops
from moondream_tpu.models.text import (
    KVCache,
    dequantize_kv,
    kv_pair_factor,
    quantize_kv,
    text_decoder,
)
from moondream_tpu.models.moondream import MoondreamModel
from moondream_tpu.ops.attention import decode_attention_cached
from moondream_tpu.tokenizer import ByteTokenizer

GREEDY = {"temperature": 0.0, "top_p": 0.0, "max_tokens": 8}


def test_quantize_roundtrip_error_bound():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 4, 16, 64)).astype(np.float32))
    codes, scale = quantize_kv(x)
    assert codes.dtype == jnp.int8
    deq = dequantize_kv(codes, scale, jnp.float32)
    # Max rounding error is half a quantization step per element.
    err = jnp.max(jnp.abs(deq - x) / scale)
    assert float(err) <= 0.501


def _tiny_text(kv_int8: bool):
    cfg = dataclasses.replace(tiny_test_config().text, kv_int8=kv_int8)
    key = jax.random.PRNGKey(0)
    params = text_ops.init_text_params(cfg, key, jnp.float32)
    return cfg, params


def test_decoder_parity_vs_dense_cache():
    """Prefill + one decode step with kv_int8 matches the fp32-cache run to
    within the int8 quantization noise (fp32 params isolate that noise)."""
    cfg_f, params = _tiny_text(False)
    cfg_q, _ = _tiny_text(True)

    rng = np.random.default_rng(1)
    B, T = 2, 16
    x = jnp.asarray(rng.normal(size=(B, T, cfg_f.dim)).astype(np.float32))
    x1 = jnp.asarray(rng.normal(size=(B, 1, cfg_f.dim)).astype(np.float32))

    outs = {}
    for cfg in (cfg_f, cfg_q):
        kv = KVCache.create(cfg, batch=B, dtype=jnp.float32)
        h, kv = text_decoder(
            x, params, kv, jnp.int32(0), jnp.int32(T), cfg
        )
        h1, kv = text_decoder(
            x1, params, kv, jnp.int32(T), jnp.int32(0), cfg
        )
        outs[cfg.kv_int8] = (np.asarray(h), np.asarray(h1))
        if cfg.kv_int8:
            assert kv.k.dtype == jnp.int8 and kv.ks is not None

    for a, b in zip(outs[False], outs[True]):
        denom = np.maximum(np.abs(a), 1.0)
        assert np.max(np.abs(a - b) / denom) < 0.05

    # Same fresh random vector through both decode paths must differ
    # somewhere (quantization actually happened) — guards against the int8
    # branch silently falling back to dense.
    assert not np.array_equal(outs[False][1], outs[True][1])


def test_paired_kernel_int8_matches_dequantized_oracle():
    """decode_attention_cached with int8 codes + scales (interpret mode)
    equals the same kernel run on the dequantized bf16 cache."""
    rng = np.random.default_rng(2)
    L, B, hp, pf, dh, T = 2, 2, 2, 2, 32, 256
    dd = pf * dh
    hq = hp * pf

    q = jnp.asarray(rng.normal(size=(B, hq, 1, dh)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    k = jnp.asarray(rng.normal(size=(L, B, hp, T, dd)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(L, B, hp, T, dd)).astype(np.float32))

    kc, ks = quantize_kv(k)
    vc, vs = quantize_kv(v)

    layer = jnp.int32(1)
    pos = jnp.int32(200)  # attend to [0, pos]
    prefix = jnp.int32(0)

    out_q = decode_attention_cached(
        q, kc, vc, layer, pos, prefix, kv_bound=T, interpret=True,
        k_scale=jnp.swapaxes(ks, -1, -2), v_scale=jnp.swapaxes(vs, -1, -2),
    )
    out_ref = decode_attention_cached(
        q,
        dequantize_kv(kc, ks, jnp.bfloat16),
        dequantize_kv(vc, vs, jnp.bfloat16),
        layer, pos, prefix, kv_bound=T, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(out_q, np.float32),
        np.asarray(out_ref, np.float32),
        atol=2e-2, rtol=2e-2,
    )


def test_paired_kernel_int8_ragged_positions():
    """Ragged decode (per-row positions, the serving path) with int8
    blocks matches the dequantized oracle."""
    rng = np.random.default_rng(3)
    L, B, hp, pf, dh, T = 2, 3, 2, 2, 32, 256
    dd = pf * dh
    hq = hp * pf

    q = jnp.asarray(rng.normal(size=(B, hq, 1, dh)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    k = jnp.asarray(rng.normal(size=(L, B, hp, T, dd)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(L, B, hp, T, dd)).astype(np.float32))
    kc, ks = quantize_kv(k)
    vc, vs = quantize_kv(v)

    layer = jnp.int32(0)
    pos = jnp.asarray([10, 100, 255], jnp.int32)  # per-slot positions

    out_q = decode_attention_cached(
        q, kc, vc, layer, pos, jnp.int32(0), kv_bound=T, interpret=True,
        k_scale=jnp.swapaxes(ks, -1, -2), v_scale=jnp.swapaxes(vs, -1, -2),
    )
    out_ref = decode_attention_cached(
        q,
        dequantize_kv(kc, ks, jnp.bfloat16),
        dequantize_kv(vc, vs, jnp.bfloat16),
        layer, pos, jnp.int32(0), kv_bound=T, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(out_q, np.float32),
        np.asarray(out_ref, np.float32),
        atol=2e-2, rtol=2e-2,
    )


@pytest.fixture(scope="module")
def int8_model():
    cfg = tiny_test_config()
    cfg = dataclasses.replace(
        cfg, text=dataclasses.replace(cfg.text, kv_int8=True)
    )
    return MoondreamModel(cfg, tokenizer=ByteTokenizer(), seed=0)


@pytest.fixture(scope="module")
def image():
    rng = np.random.default_rng(0)
    return Image.fromarray(
        rng.integers(0, 255, size=(120, 160, 3), dtype=np.uint8)
    )


def test_e2e_encode_snapshot_restore(int8_model, image):
    enc = int8_model.encode_image(image)
    assert enc.k.dtype == jnp.int8
    assert enc.ks is not None and enc.ks.shape[-2:] == (1, 730)
    pf = kv_pair_factor(int8_model.config.text)
    L = int8_model.config.text.n_layers
    assert enc.k.shape == (
        L, 1, int8_model.config.text.n_kv_heads // pf, 730,
        pf * int8_model.config.text.head_dim,
    )
    kv = int8_model.load_encoded_image(enc)
    assert kv.k.dtype == jnp.int8 and kv.ks is not None
    int8_model._recycle_kv(kv)


def test_e2e_caption_query_point(int8_model, image):
    out = int8_model.caption(image, "normal", settings=GREEDY)
    assert isinstance(out["caption"], str)
    out = int8_model.query(image=image, question="?", settings=GREEDY)
    assert isinstance(out["answer"], str)
    out = int8_model.point(image, "x", settings=GREEDY)
    assert isinstance(out["points"], list)


@pytest.mark.slow
def test_e2e_batched_caption(int8_model, image):
    outs = int8_model.caption_batch([image, image], "normal", settings=GREEDY)
    assert len(outs) == 2 and all(isinstance(o, str) for o in outs)
    # Lockstep batching of identical rows must agree with the single path.
    single = int8_model.caption(image, "normal", settings=GREEDY)["caption"]
    assert outs[0] == outs[1] == single


def test_serving_int8_matches_sequential(int8_model, image):
    """Continuous batching on an int8-cache model reproduces the
    sequential greedy caption (both paths quantize identically: cache
    codes written at prefill are the ones ragged decode reads)."""
    from moondream_tpu.models.serve import ContinuousBatchingEngine
    from moondream_tpu.utils.streaming import stream_text

    enc = int8_model.encode_image(image)
    kv = int8_model.load_encoded_image(enc)
    prompt = list(int8_model.config.tokenizer.templates["caption"]["normal"])
    _, _, next_token, pos, kv = int8_model._prefill_prompt(
        kv, prompt, enc.pos, 0.0, 0.0
    )
    toks = int8_model._generate_answer_tokens(
        kv, next_token, pos,
        {"temperature": 0.0, "top_p": 0.0, "max_tokens": 12},
    )
    ref = "".join(stream_text(toks, int8_model._decode_tokens))

    eng = ContinuousBatchingEngine(
        int8_model, n_slots=2, slot_len=1024, chunk=4
    )
    assert eng.kv.k.dtype == jnp.int8 and eng.kv.ks is not None
    rid = eng.submit(image, max_tokens=12)
    out = eng.drain()
    assert out[rid] == ref


@pytest.mark.slow
def test_int4_weights_with_int8_cache(image):
    """Runtime-int4 text weights compose with the int8 KV cache (the two
    quantizations are orthogonal: weight blocks vs cache codes). Batched
    lockstep decode must agree with the single path on the combined
    model, and serving must reproduce the sequential output."""
    from moondream_tpu.models.serve import ContinuousBatchingEngine
    from moondream_tpu.models.text import quantize_text_params

    cfg = tiny_test_config()
    cfg = dataclasses.replace(
        cfg, text=dataclasses.replace(cfg.text, kv_int8=True)
    )
    base = MoondreamModel(cfg, tokenizer=ByteTokenizer(), seed=0)
    model = MoondreamModel(
        cfg,
        params={**base.params, "text": quantize_text_params(base.params["text"])},
        tokenizer=ByteTokenizer(),
    )
    single = model.caption(image, "normal", settings=GREEDY)["caption"]
    outs = model.caption_batch([image, image], "normal", settings=GREEDY)
    assert outs[0] == outs[1] == single

    eng = ContinuousBatchingEngine(model, n_slots=2, slot_len=1024, chunk=4)
    assert eng.kv.k.dtype == jnp.int8
    rid = eng.submit(image, max_tokens=8)
    out = eng.drain()
    assert out[rid] == single

    # the bench's int4+kv8 throughput config drives BatchPipeline
    from moondream_tpu.engine.pipeline import BatchPipeline

    pipe = BatchPipeline(model, batch_size=2, eos_id=-1)
    got = pipe.caption([image, image], "normal", settings=GREEDY)
    assert got == [single, single]


@pytest.mark.slow
def test_sharded_engine_int8_decodes():
    """kv_int8 under a dp x tp mesh: the GQA/sharded path dequantizes
    through XLA (pf == 1) and the scale arrays shard on the head axis."""
    import dataclasses

    from jax.sharding import NamedSharding

    from moondream_tpu.config import TextConfig
    from moondream_tpu.parallel import ShardedTextEngine, create_mesh

    cfg = TextConfig(
        dim=256, ff_dim=512, n_layers=2, vocab_size=512, max_context=256,
        n_heads=8, n_kv_heads=8, prefix_attn=8, kv_int8=True,
    )
    params = text_ops.init_text_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    rng = np.random.default_rng(1)
    embeds = jnp.asarray(
        rng.standard_normal((1, 16, cfg.dim)).astype(np.float32) * 0.1
    )

    # unsharded int8 reference (XLA branch on CPU)
    kv0 = KVCache.create(cfg, batch=1, dtype=jnp.float32)
    from moondream_tpu.engine import generate as engine

    logits0, _, kv0 = engine.prefill(
        params, kv0, embeds, jnp.int32(0), jnp.int32(16), jnp.int32(0),
        config=dataclasses.replace(cfg, xla_attn=True),
    )
    first0 = jnp.argmax(logits0, -1).astype(jnp.int32)

    mesh = create_mesh({"dp": 1, "tp": 8})
    eng = ShardedTextEngine(params, cfg, mesh)
    logits1, _, kv1 = eng.prefill(embeds, pos=0, length=16, prefix_len=0)
    assert kv1.k.dtype == jnp.int8 and kv1.ks is not None
    assert int(jnp.argmax(logits1, -1)[0]) == int(first0)
    # scales shard on the head axis alongside the codes
    shard_shape = kv1.ks.sharding.shard_shape(kv1.ks.shape)
    assert shard_shape[2] == cfg.n_kv_heads // 8

    res = eng.generate(
        kv1, jnp.argmax(logits1, -1).astype(jnp.int32), 16,
        max_tokens=8, eos_id=-1, buffer=64,
    )
    assert int(res.counts[0]) == 8


def test_paired_kernel_int8_span():
    """Small query spans (speculative verify) with int8 blocks: the
    (HT, 1, T) scale rows broadcast over all pf*tq score rows."""
    rng = np.random.default_rng(4)
    L, B, hp, pf, dh, T, tq = 2, 1, 2, 2, 32, 256, 4
    dd = pf * dh
    hq = hp * pf

    q = jnp.asarray(
        rng.normal(size=(B, hq, tq, dh)).astype(np.float32)
    ).astype(jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(L, B, hp, T, dd)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(L, B, hp, T, dd)).astype(np.float32))
    kc, ks = quantize_kv(k)
    vc, vs = quantize_kv(v)

    out_q = decode_attention_cached(
        q, kc, vc, jnp.int32(1), jnp.int32(180), jnp.int32(0), kv_bound=T,
        interpret=True,
        k_scale=jnp.swapaxes(ks, -1, -2), v_scale=jnp.swapaxes(vs, -1, -2),
    )
    out_ref = decode_attention_cached(
        q,
        dequantize_kv(kc, ks, jnp.bfloat16),
        dequantize_kv(vc, vs, jnp.bfloat16),
        jnp.int32(1), jnp.int32(180), jnp.int32(0), kv_bound=T,
        interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(out_q, np.float32),
        np.asarray(out_ref, np.float32),
        atol=2e-2, rtol=2e-2,
    )
