"""Tests for representation engineering (control vectors) — capability
parity with the reference's notebooks/RepEng.ipynb."""

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from moondream_tpu.config import tiny_test_config
from moondream_tpu.models import text as text_ops
from moondream_tpu.models.moondream import MoondreamModel
from moondream_tpu.repeng import (
    ControlVector,
    HiddenStateCollector,
    train_control_vectors,
)
from moondream_tpu.tokenizer import ByteTokenizer

GREEDY = {"temperature": 0.0, "top_p": 0.0, "max_tokens": 8}


@pytest.fixture(scope="module")
def model():
    return MoondreamModel(tiny_test_config(), tokenizer=ByteTokenizer(), seed=0)


@pytest.fixture(scope="module")
def image():
    rng = np.random.default_rng(3)
    return Image.fromarray(
        rng.integers(0, 255, size=(96, 128, 3), dtype=np.uint8)
    )


def test_produce_hidden_layers_matches_final(model):
    """Last ys slice of the capture scan == produce_hidden's final state."""
    cfg = model.config.text
    rng = np.random.default_rng(0)
    embeds = jnp.asarray(
        rng.standard_normal((1, 16, cfg.dim)).astype(np.float32) * 0.1
    )
    layers = text_ops.produce_hidden_layers(embeds, model.params["text"], cfg)
    final = text_ops.produce_hidden(embeds, model.params["text"], cfg)
    assert layers.shape == (cfg.n_layers, 1, 16, cfg.dim)
    np.testing.assert_allclose(
        np.asarray(layers[-1], np.float32), np.asarray(final, np.float32),
        rtol=1e-5, atol=1e-5,
    )


def test_steering_changes_logits(model, image):
    """Steering shifts the distribution; zero-scale steering is a no-op.
    (Asserted at the logit level: the tiny random model greedily emits EOS
    immediately, so caption strings are empty either way.)"""
    from moondream_tpu.models.text import KVCache

    cfg = model.config.text
    enc = model.encode_image(image)
    prompt = list(model.config.tokenizer.templates["caption"]["normal"])

    def prefill_logits(steer):
        kv = model.load_encoded_image(enc)
        logits, _, _, _, _ = model._prefill_prompt(
            kv, prompt, enc.pos, 0.0, 0.0, steer=steer
        )
        return np.asarray(logits, np.float32)

    base = prefill_logits(None)
    np.testing.assert_array_equal(base, prefill_logits(None))  # deterministic

    rng = np.random.default_rng(1)
    vec = rng.standard_normal((cfg.n_layers, cfg.dim)).astype(np.float32)
    vec /= np.linalg.norm(vec, axis=-1, keepdims=True)

    steered = prefill_logits(jnp.asarray(vec) * 50.0)
    assert not np.array_equal(steered, base)
    assert np.all(np.isfinite(steered))

    null = prefill_logits(jnp.asarray(vec) * 0.0)
    np.testing.assert_array_equal(null, base)


def test_steering_streams_too(model, image):
    cfg = model.config.text
    vec = np.ones((cfg.n_layers, cfg.dim), np.float32)
    out = model.caption(
        image, "normal", stream=True,
        settings={**GREEDY, "steer": vec, "steer_scale": 10.0},
    )
    chunks = list(out["caption"])
    whole = model.caption(
        image, "normal",
        settings={**GREEDY, "steer": vec, "steer_scale": 10.0},
    )["caption"]
    assert "".join(chunks) == whole


def test_train_control_vectors_recovers_planted_direction():
    rng = np.random.default_rng(0)
    L, D, N = 3, 32, 64
    planted = rng.standard_normal((L, D)).astype(np.float32)
    planted /= np.linalg.norm(planted, axis=-1, keepdims=True)

    pos, neg = [], []
    for _ in range(N):
        base = rng.standard_normal((L, D)).astype(np.float32) * 0.3
        shift = rng.uniform(0.5, 1.5)
        pos.append(base + shift * planted)
        neg.append(base - shift * planted)

    cv = train_control_vectors(pos, neg)
    assert cv.directions.shape == (L, D)
    for layer in range(L):
        cos = float(cv.directions[layer] @ planted[layer])
        assert cos > 0.95, f"layer {layer}: cos={cos}"


def test_train_control_vectors_errors_on_empty():
    with pytest.raises(ValueError):
        train_control_vectors([], [])


def test_control_vector_save_load_negate(tmp_path):
    cv = ControlVector(np.eye(4, 8, dtype=np.float32), default_scale=2.0)
    path = str(tmp_path / "cv.npz")
    cv.save(path)
    loaded = ControlVector.load(path)
    np.testing.assert_array_equal(loaded.directions, cv.directions)
    assert loaded.default_scale == 2.0
    np.testing.assert_array_equal((-loaded).directions, -cv.directions)
    # scaled() applies default scale by default
    assert float(jnp.sum(loaded.scaled())) == pytest.approx(
        2.0 * float(np.sum(cv.directions))
    )


def test_hidden_state_collector_end_to_end(model, image):
    cfg = model.config.text
    reps = HiddenStateCollector(model)
    states = reps.collect(
        [image], "describe", samples_per_image=1, max_tokens=4,
        temperature=0.0,
    )
    assert len(states) >= 1
    for s in states:
        assert s.shape == (cfg.n_layers, cfg.dim)
        assert np.all(np.isfinite(s))

    # full loop: collect two prompts, train, steer
    neg = reps.collect(
        [image], "ignore", samples_per_image=1, max_tokens=4, temperature=0.0
    )
    n = min(len(states), len(neg))
    cv = train_control_vectors(states[:n], neg[:n])
    out = model.query(
        image=image, question="what?",
        settings={**GREEDY, "steer": cv, "steer_scale": 4.2},
    )
    assert isinstance(out["answer"], str)
