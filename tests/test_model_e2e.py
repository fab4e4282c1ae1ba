"""End-to-end structural tests of the public API on a tiny random-weight
model (CPU). These verify every capability path runs, shapes/positions are
consistent, and the fused device loops agree with the incremental streaming
path token-for-token under greedy decoding."""

import numpy as np
import pytest
from PIL import Image

import jax.numpy as jnp

from moondream_tpu.config import tiny_test_config
from moondream_tpu.models.moondream import EncodedImage, MoondreamModel
from moondream_tpu.tokenizer import ByteTokenizer

GREEDY = {"temperature": 0.0, "top_p": 0.0, "max_tokens": 8}


@pytest.fixture(scope="module")
def model():
    return MoondreamModel(tiny_test_config(), tokenizer=ByteTokenizer(), seed=0)


@pytest.fixture(scope="module")
def image():
    rng = np.random.default_rng(0)
    return Image.fromarray(
        rng.integers(0, 255, size=(120, 160, 3), dtype=np.uint8)
    )


def test_encode_image(model, image):
    enc = model.encode_image(image)
    assert isinstance(enc, EncodedImage)
    assert enc.pos == 730
    L = model.config.text.n_layers
    from moondream_tpu.models.text import kv_pair_factor

    pf = kv_pair_factor(model.config.text)
    assert enc.k.shape == (L, 1, model.config.text.n_kv_heads // pf, 730,
                           pf * model.config.text.head_dim)
    # Idempotent on EncodedImage input.
    assert model.encode_image(enc) is enc


def test_caption_and_stream_agree(model, image):
    out = model.caption(image, "normal", settings=GREEDY)
    assert isinstance(out["caption"], str)

    chunks = list(model.caption(image, "normal", stream=True, settings=GREEDY)["caption"])
    assert "".join(chunks) == out["caption"]


def test_caption_lengths_and_errors(model, image):
    for length in ("short", "long"):
        out = model.caption(image, length, settings=GREEDY)
        assert isinstance(out["caption"], str)
    with pytest.raises(ValueError):
        model.caption(image, "epic")


def test_query_with_image(model, image):
    out = model.query(image=image, question="What is this?", settings=GREEDY)
    assert isinstance(out["answer"], str)


def test_query_without_image(model):
    out = model.query(question="Hello?", settings=GREEDY)
    assert isinstance(out["answer"], str)


def test_query_requires_question(model, image):
    with pytest.raises(ValueError):
        model.query(image=image)


def test_query_spatial_refs(model, image):
    out = model.query(
        image=image,
        question="Is this a cat?",
        spatial_refs=[(0.3, 0.4), (0.1, 0.2, 0.5, 0.6)],
        settings=GREEDY,
    )
    assert isinstance(out["answer"], str)
    with pytest.raises(ValueError):
        model.query(question="x", spatial_refs=[(0.5, 0.5)])


def test_query_reasoning(model, image):
    out = model.query(
        image=image, question="Why?", reasoning=True, settings=GREEDY
    )
    assert "reasoning" in out
    assert isinstance(out["reasoning"]["text"], str)
    assert isinstance(out["reasoning"]["grounding"], list)
    assert isinstance(out["answer"], str)


def test_detect_and_point(model, image):
    out = model.detect(image, "cat", settings={"max_objects": 3})
    assert isinstance(out["objects"], list)
    assert len(out["objects"]) <= 3
    for obj in out["objects"]:
        assert set(obj) == {"x_min", "y_min", "x_max", "y_max"}
        # box center within [0,1), size positive
        assert obj["x_max"] >= obj["x_min"]
        assert obj["y_max"] >= obj["y_min"]

    out = model.point(image, "dog", settings={"max_objects": 2})
    assert isinstance(out["points"], list)
    assert len(out["points"]) <= 2
    for p in out["points"]:
        assert set(p) == {"x", "y"}
        assert 0.0 <= p["x"] < 1.0 and 0.0 <= p["y"] < 1.0


def test_detect_determinism(model, image):
    a = model.detect(image, "cat", settings={"max_objects": 3})
    b = model.detect(image, "cat", settings={"max_objects": 3})
    assert a == b


def test_detect_gaze(model, image):
    out = model.detect_gaze(image, eye=(0.5, 0.5))
    assert "gaze" in out
    g = out["gaze"]
    assert g is None or set(g) == {"x", "y"}
    with pytest.raises(ValueError):
        model.detect_gaze(image)  # eye required in fast mode


def test_sampled_generation_runs(model, image):
    out = model.caption(
        image, "normal", settings={"temperature": 0.7, "top_p": 0.9, "max_tokens": 8}
    )
    assert isinstance(out["caption"], str)


def test_encoded_image_reuse(model, image):
    enc = model.encode_image(image)
    a = model.caption(enc, "normal", settings=GREEDY)["caption"]
    b = model.caption(enc, "normal", settings=GREEDY)["caption"]
    assert a == b


def test_compile_warms_hot_paths(model):
    """compile() runs every capability (incl. reasoning + gaze) once with
    the session's settings and is idempotent (API parity with reference
    moondream.py:194-204). Warming with the same settings real requests
    use means their kv_bound jit buckets are the ones compiled."""
    s = {**GREEDY, "max_objects": 2}
    n_before = len(model._jits)
    assert model.compile(settings=s) is model
    assert len(model._jits) >= n_before
    # cached: a real request with the same settings must not add new jit
    # entries, and neither must a second compile()
    n_mid = len(model._jits)
    img = Image.new("RGB", (model.config.vision.crop_size,) * 2)
    model.caption(img, "normal", settings=s)
    model.query(image=img, question="?", settings=s)
    model.compile(settings=s)
    assert len(model._jits) == n_mid


def test_detect_gaze_batch_matches_sequential(model, image):
    """The lockstep-batched gaze decode must reproduce the sequential
    single-row path exactly (same positions, same masks)."""
    enc = model.encode_image(image)
    flipped = model.encode_image(
        image.transpose(method=Image.Transpose.FLIP_LEFT_RIGHT)
    )
    sources = [(0.31, 0.42), (0.55, 0.38), (0.47, 0.51), (0.62, 0.44)]
    encs = [enc, flipped, enc, flipped]
    for force in (False, True):
        batch = model._detect_gaze_batch(encs, sources, force_detect=force)
        for e, s, got in zip(encs, sources, batch):
            want = model._detect_gaze(e, s, force_detect=force)
            assert (got is None) == (want is None), (s, force)
            if want is not None:
                assert abs(got["x"] - want["x"]) < 1e-5
                assert abs(got["y"] - want["y"]) < 1e-5


def test_detect_gaze_accuracy_mode(model, image):
    """prioritize_accuracy: 10 samples + flipped-image samples + outlier
    filtering (reference moondream.py:906-973)."""
    face = {"x_min": 0.3, "y_min": 0.3, "x_max": 0.6, "y_max": 0.6}
    out = model.detect_gaze(
        image, face=face,
        unstable_settings={"prioritize_accuracy": True},
    )
    g = out["gaze"]
    if g is not None:  # random weights may yield no detections
        assert 0.0 <= g["x"] <= 1.0 and 0.0 <= g["y"] <= 1.0

    with pytest.raises(ValueError):
        model.detect_gaze(image, unstable_settings={"prioritize_accuracy": True})

    enc = model.encode_image(image)
    with pytest.raises(ValueError):
        model.detect_gaze(
            enc, face=face, unstable_settings={"prioritize_accuracy": True}
        )
