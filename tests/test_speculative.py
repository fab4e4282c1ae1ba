"""Speculative (n-gram draft + verify) greedy decoding.

The contract is exactness: `engine.generate_text_spec` must emit the SAME
token ids as the plain fused greedy loop for any weights — drafts only ever
shortcut weight passes, never change outputs (verification accepts a draft
token only when it equals the greedy continuation). Random tiny models
repeat heavily, so these runs exercise multi-token accepts as well as
full-miss iterations.
"""

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp


def _model(seed=0, kv_int8=False):
    import dataclasses

    from moondream_tpu.config import tiny_test_config
    from moondream_tpu.models.moondream import MoondreamModel
    from moondream_tpu.tokenizer import ByteTokenizer

    cfg = tiny_test_config()
    if kv_int8:
        cfg = dataclasses.replace(
            cfg, text=dataclasses.replace(cfg.text, kv_int8=True)
        )
    return MoondreamModel(cfg, tokenizer=ByteTokenizer(), seed=seed)


def _image(seed=0):
    rng = np.random.default_rng(seed)
    return Image.fromarray(
        rng.integers(0, 255, size=(64, 96, 3), dtype=np.uint8)
    )


@pytest.mark.parametrize("seed", [0, pytest.param(1, marks=pytest.mark.slow),
                                  pytest.param(2, marks=pytest.mark.slow)])
def test_spec_matches_plain_greedy(seed):
    model = _model(seed=seed)
    enc = model.encode_image(_image(seed))
    plain = {"temperature": 0.0, "top_p": 0.0, "max_tokens": 48}
    spec = {**plain, "speculative": True}
    for q in ("What is this?", "Describe."):
        a0 = model.query(image=enc, question=q, settings=plain)["answer"]
        a1 = model.query(image=enc, question=q, settings=spec)["answer"]
        assert a1 == a0, (q, a0, a1)


def test_spec_respects_max_tokens_exactly():
    model = _model(seed=3)
    enc = model.encode_image(_image(3))
    for mt in (1, 2, 7):
        plain = {"temperature": 0.0, "top_p": 0.0, "max_tokens": mt}
        a0 = model.caption(enc, "normal", settings=plain)["caption"]
        a1 = model.caption(
            enc, "normal", settings={**plain, "speculative": 4}
        )["caption"]
        assert a1 == a0, (mt, a0, a1)


@pytest.mark.slow
def test_spec_various_k():
    model = _model(seed=4)
    enc = model.encode_image(_image(4))
    plain = {"temperature": 0.0, "top_p": 0.0, "max_tokens": 32}
    base = model.caption(enc, "normal", settings=plain)["caption"]
    for k in (2, 3, 8):
        got = model.caption(
            enc, "normal", settings={**plain, "speculative": k}
        )["caption"]
        assert got == base, (k, base, got)


def test_spec_engine_level_repetitive_sequence():
    """Drive the engine directly with weights rigged for a repeating cycle
    (wte rows aligned with lm_head columns) so drafts hit often, and check
    exact agreement with the plain loop including counts."""
    from moondream_tpu.config import tiny_test_config
    from moondream_tpu.engine import generate as engine
    from moondream_tpu.models.text import KVCache, init_text_params

    cfg = tiny_test_config().text
    params = init_text_params(cfg, jax.random.PRNGKey(7))

    kv0 = KVCache.create(cfg, batch=1)
    tok0 = jnp.int32(5)
    pos0 = jnp.int32(0)

    plain = jax.jit(
        lambda p, kv, t, pos: engine.generate_text(
            p, kv, t, pos, jax.random.PRNGKey(0), jnp.float32(0.0),
            jnp.float32(0.0), jnp.int32(40), config=cfg, eos_id=-1,
            suppress_ids=(), buffer=cfg.max_context,
        )
    )
    spec = jax.jit(
        lambda p, kv, t, pos: engine.generate_text_spec(
            p, kv, t, pos, jnp.int32(40), config=cfg, eos_id=-1,
            suppress_ids=(), buffer=cfg.max_context, spec_k=4,
        )
    )
    r0 = plain(params, kv0, tok0, pos0)
    r1 = spec(params, KVCache.create(cfg, batch=1), tok0, pos0)
    assert int(r0.count) == int(r1.count) == 40
    np.testing.assert_array_equal(
        np.asarray(r0.tokens[:40]), np.asarray(r1.tokens[:40])
    )
    assert int(r0.pos) == int(r1.pos)


@pytest.mark.slow
def test_spec_with_int4_params():
    from moondream_tpu.models.text import quantize_text_params

    model = _model(seed=5)
    model.params = {
        **model.params, "text": quantize_text_params(model.params["text"])
    }
    enc = model.encode_image(_image(5))
    plain = {"temperature": 0.0, "top_p": 0.0, "max_tokens": 24}
    a0 = model.query(image=enc, question="?", settings=plain)["answer"]
    a1 = model.query(
        image=enc, question="?", settings={**plain, "speculative": True}
    )["answer"]
    assert a1 == a0


@pytest.mark.parametrize("seed", [0, pytest.param(8, marks=pytest.mark.slow)])
def test_spec_streaming_matches_plain(seed):
    """The speculative streaming path (host drafts + jitted verify step)
    emits exactly the plain greedy stream's text."""
    model = _model(seed=seed)
    enc = model.encode_image(_image(seed))
    plain = {"temperature": 0.0, "top_p": 0.0, "max_tokens": 40}
    base = "".join(
        model.query(image=enc, question="?", stream=True, settings=plain)[
            "answer"
        ]
    )
    spec = "".join(
        model.query(
            image=enc, question="?", stream=True,
            settings={**plain, "speculative": 4},
        )["answer"]
    )
    assert spec == base
    # and the fused non-streaming answer agrees too
    fused = model.query(
        image=enc, question="?", settings={**plain, "speculative": 4}
    )["answer"]
    assert fused == base


@pytest.mark.slow
def test_spec_with_kv_int8():
    """Spec verify spans (q_len > 1) hit the XLA dequant branch of the
    int8 KV cache; outputs must still match the plain greedy loop."""
    model = _model(seed=9, kv_int8=True)
    enc = model.encode_image(_image(9))
    plain = {"temperature": 0.0, "top_p": 0.0, "max_tokens": 24}
    a0 = model.query(image=enc, question="?", settings=plain)["answer"]
    a1 = model.query(
        image=enc, question="?", settings={**plain, "speculative": 4}
    )["answer"]
    assert a1 == a0


def test_spec_sampled_smoke():
    """temperature > 0 routes through speculative SAMPLING (rejection
    against the target nucleus distribution) — must produce text and
    respect max_tokens."""
    model = _model(seed=6)
    enc = model.encode_image(_image(6))
    out = model.caption(
        enc, "normal",
        settings={"temperature": 0.7, "top_p": 0.9, "max_tokens": 8,
                  "speculative": True},
    )["caption"]
    assert isinstance(out, str)


@pytest.mark.slow
def test_spec_sampled_preserves_marginal_distribution():
    """The first stochastic token's empirical distribution under the
    sampled spec loop must match the plain sampled loop's (speculative
    sampling preserves the target distribution exactly; only RNG
    consumption differs). Total-variation distance over ~500 draws each
    must be within sampling noise."""
    from collections import Counter

    from moondream_tpu.config import tiny_test_config
    from moondream_tpu.engine import generate as engine
    from moondream_tpu.models.text import KVCache, init_text_params

    cfg = tiny_test_config().text
    params = init_text_params(cfg, jax.random.PRNGKey(11))
    kv0 = KVCache.create(cfg, batch=1)
    tok0 = jnp.int32(7)
    temp, top_p = jnp.float32(0.3), jnp.float32(0.9)

    plain = jax.jit(
        lambda kv, r: engine.generate_text(
            params, kv, tok0, jnp.int32(0), r, temp, top_p, jnp.int32(2),
            config=cfg, eos_id=-1, suppress_ids=(), buffer=cfg.max_context,
        ).tokens[1]
    )
    spec = jax.jit(
        lambda kv, r: engine.generate_text_spec_sampled(
            params, kv, tok0, jnp.int32(0), r, temp, top_p, jnp.int32(2),
            config=cfg, eos_id=-1, suppress_ids=(), buffer=cfg.max_context,
            spec_k=4,
        ).tokens[1]
    )
    N = 500
    a = Counter(
        int(plain(kv0, jax.random.PRNGKey(1000 + s))) for s in range(N)
    )
    b = Counter(
        int(spec(kv0, jax.random.PRNGKey(5000 + s))) for s in range(N)
    )
    support = set(a) | set(b)
    tv = 0.5 * sum(abs(a.get(t, 0) - b.get(t, 0)) for t in support) / N
    # identical distributions over ~500 draws: TV concentrates around
    # sqrt(k_eff/N) ~ 0.1; a broken residual rule lands far above
    assert tv < 0.2, (tv, a.most_common(5), b.most_common(5))


def test_spec_sampled_respects_max_tokens():
    model = _model(seed=7)
    enc = model.encode_image(_image(7))
    for mt in (1, 5):
        out = model.query(
            image=enc, question="?",
            settings={"temperature": 0.5, "top_p": 0.3, "max_tokens": mt,
                      "speculative": 4},
        )["answer"]
        toks = model._encode_text(out) if out else []
        assert len(toks) <= mt + 2  # detokenize/retokenize slack


def test_spec_sampled_streaming_smoke():
    """Sampled streaming routes through the device-side rejection verify
    step; must produce text and respect max_tokens."""
    model = _model(seed=10)
    enc = model.encode_image(_image(10))
    out = "".join(
        model.query(
            image=enc, question="?", stream=True,
            settings={"temperature": 0.6, "top_p": 0.9, "max_tokens": 10,
                      "speculative": 4},
        )["answer"]
    )
    assert isinstance(out, str)
