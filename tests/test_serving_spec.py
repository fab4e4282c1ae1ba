"""Speculative continuous batching: serve_chunk_spec must emit exactly the
same tokens as the plain greedy serving chunks (per-slot n-gram drafts +
one ragged span verify per iteration only shortcut weight passes)."""

import dataclasses

import numpy as np
import pytest
from PIL import Image

from moondream_tpu.config import tiny_test_config
from moondream_tpu.models.moondream import MoondreamModel
from moondream_tpu.models.serve import ContinuousBatchingEngine
from moondream_tpu.tokenizer import ByteTokenizer


@pytest.fixture(scope="module")
def model():
    return MoondreamModel(tiny_test_config(), tokenizer=ByteTokenizer(), seed=0)


@pytest.fixture(scope="module")
def images():
    rng = np.random.default_rng(1)
    return [
        Image.fromarray(rng.integers(0, 255, (80 + 16 * i, 100, 3), np.uint8))
        for i in range(3)
    ]


def _plain(model, images, **submit_kw):
    eng = ContinuousBatchingEngine(model, n_slots=4, slot_len=1024, chunk=3)
    rids = [eng.submit(img, **submit_kw) for img in images]
    out = eng.drain()
    return [out[r] for r in rids]


def _spec(model, images, spec_k=4, **submit_kw):
    eng = ContinuousBatchingEngine(
        model, n_slots=4, slot_len=1024, chunk=3, speculative=spec_k
    )
    rids = [eng.submit(img, **submit_kw) for img in images]
    out = eng.drain()
    return [out[r] for r in rids]


def test_spec_serving_matches_plain(model, images):
    ref = _plain(model, images, max_tokens=14)
    got = _spec(model, images, spec_k=4, max_tokens=14)
    assert got == ref


def test_spec_serving_various_k(model, images):
    ref = _plain(model, images[:2], max_tokens=10)
    for k in (2, 8):
        got = _spec(model, images[:2], spec_k=k, max_tokens=10)
        assert got == ref, k


@pytest.mark.slow
def test_spec_serving_staggered_admission(model, images):
    plain = ContinuousBatchingEngine(model, n_slots=3, slot_len=1024, chunk=3)
    spec = ContinuousBatchingEngine(
        model, n_slots=3, slot_len=1024, chunk=3, speculative=4
    )
    outs = {}
    for eng in (plain, spec):
        r0 = eng.submit(images[0], max_tokens=12)
        eng.step()
        r1 = eng.submit(images[1], question="what?", max_tokens=12)
        eng.step()
        r2 = eng.submit(images[2], max_tokens=12)
        out = eng.drain()
        outs[eng] = [out[r0], out[r1], out[r2]]
    assert outs[spec] == outs[plain]


def test_spec_serving_slot_reuse(model, images):
    """Histories must reset on slot reuse — a stale history can only change
    drafts (never outputs), but the reuse path itself must run clean."""
    eng = ContinuousBatchingEngine(
        model, n_slots=1, slot_len=1024, chunk=4, speculative=4
    )
    r0 = eng.submit(images[0], max_tokens=6)
    eng.drain()
    r1 = eng.submit(images[1], max_tokens=6)
    out = eng.drain()
    ref = _plain(model, [images[0], images[1]], max_tokens=6)
    assert [out == {**out}, True]
    assert eng.results[r0] == ref[0]
    assert eng.results[r1] == ref[1]


def test_spec_accept_rate_and_adaptive_off(model, images):
    """The engine reports accepted tokens per slot-iteration, and with an
    impossibly high adaptive threshold it falls back to plain chunks after
    the warm-up — outputs unchanged either way."""
    ref = _plain(model, images[:2], max_tokens=40)
    eng = ContinuousBatchingEngine(
        model, n_slots=2, slot_len=1024, chunk=2, speculative=4,
        spec_adaptive=100.0,  # rate can never reach this -> must disable
    )
    rids = [eng.submit(img, max_tokens=40) for img in images[:2]]
    out = eng.drain()
    assert [out[r] for r in rids] == ref
    assert eng.spec_k == 0  # adaptive fallback fired
    assert eng.spec_accept_rate is not None
    assert 0.0 < eng.spec_accept_rate <= 4.0


def test_mixed_pool_greedy_request_stays_exact(model, images):
    """Per-request sampling settings: a greedy request sharing the pool
    with a sampled one must still emit exactly the sequential greedy
    output (plain chunks use a per-row where; spec chunks reduce greedy
    rows to a point mass)."""
    ref = _plain(model, [images[0]], max_tokens=12)[0]
    for spec in (0, 4):
        eng = ContinuousBatchingEngine(
            model, n_slots=2, slot_len=1024, chunk=3, speculative=spec,
        )
        r_greedy = eng.submit(images[0], max_tokens=12)  # pool default: greedy
        r_sampled = eng.submit(
            images[1], max_tokens=12, temperature=0.8, top_p=0.9
        )
        out = eng.drain()
        assert out[r_greedy] == ref, spec
        assert isinstance(out[r_sampled], str)


def test_spec_serving_sampled_pool(model, images):
    """Sampled pools (temperature > 0) speculate via per-row rejection
    sampling — requests must complete with budget respected."""
    eng = ContinuousBatchingEngine(
        model, n_slots=3, slot_len=1024, chunk=3, speculative=4,
        temperature=0.6, top_p=0.9,
    )
    rids = [eng.submit(img, max_tokens=9) for img in images]
    out = eng.drain()
    for r in rids:
        assert isinstance(out[r], str)
    for s in eng.slots:
        assert len(s.tokens) <= 9
    assert eng.spec_accept_rate is not None


@pytest.mark.slow
def test_spec_serving_int4_kv8(images):
    from moondream_tpu.models.text import quantize_text_params

    cfg = tiny_test_config()
    cfg = dataclasses.replace(
        cfg, text=dataclasses.replace(cfg.text, kv_int8=True)
    )
    model = MoondreamModel(cfg, tokenizer=ByteTokenizer(), seed=0)
    model.params = {
        **model.params, "text": quantize_text_params(model.params["text"])
    }
    ref = _plain(model, images[:2], max_tokens=10)
    got = _spec(model, images[:2], spec_k=4, max_tokens=10)
    assert got == ref
