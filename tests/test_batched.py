"""Batched engine tests: lockstep batching must agree with the
single-request path token-for-token under greedy decoding."""

import numpy as np
import pytest
from PIL import Image

from moondream_tpu.config import tiny_test_config
from moondream_tpu.models.moondream import MoondreamModel
from moondream_tpu.tokenizer import ByteTokenizer

GREEDY = {"temperature": 0.0, "top_p": 0.0, "max_tokens": 8}


@pytest.fixture(scope="module")
def model():
    return MoondreamModel(tiny_test_config(), tokenizer=ByteTokenizer(), seed=0)


@pytest.fixture(scope="module")
def images():
    rng = np.random.default_rng(7)
    return [
        Image.fromarray(rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8))
        for h, w in [(120, 160), (200, 100), (160, 160)]
    ]


def test_encode_images_matches_single(model, images):
    batched = model.encode_images(images)
    for im, enc_b in zip(images, batched):
        enc_s = model.encode_image(im)
        assert enc_b.pos == enc_s.pos
        np.testing.assert_allclose(
            np.asarray(enc_b.k, dtype=np.float32),
            np.asarray(enc_s.k, dtype=np.float32),
            atol=1e-2, rtol=1e-2,
        )


def test_caption_batch_matches_single(model, images):
    batch = model.caption_batch(images, "normal", settings=GREEDY)
    singles = [
        model.caption(im, "normal", settings=GREEDY)["caption"] for im in images
    ]
    assert batch == singles


def test_query_batch_matches_single(model, images):
    q = "What is this?"
    batch = model.query_batch(images, q, settings=GREEDY)
    singles = [model.query(im, q, settings=GREEDY)["answer"] for im in images]
    assert batch == singles


def test_caption_batch_accepts_encoded(model, images):
    encs = model.encode_images(images)
    a = model.caption_batch(encs, "short", settings=GREEDY)
    b = model.caption_batch(images, "short", settings=GREEDY)
    assert a == b


def test_detect_batch_consistency_and_structure(model, images):
    """Identical rows in one batch are bit-identical (one program, same
    inputs). Exact parity with the single path is NOT asserted on random
    weights: batched matmuls change reduction order, and random-weight
    coordinate logits are flat enough that 1024-bin argmax ties flip (with
    trained weights the bins are decisively peaked)."""
    S = {"max_objects": 6}
    out = model.detect_batch(
        [images[0], images[1], images[0]], "object", settings=S
    )
    assert out[0] == out[2]
    for row in out:
        assert len(row["objects"]) <= 6
        for b in row["objects"]:
            assert b["x_max"] >= b["x_min"] and b["y_max"] >= b["y_min"]

    pts = model.point_batch(
        [images[0], images[1], images[0]], "thing", settings=S
    )
    assert pts[0] == pts[2]
    assert all(len(r["points"]) <= 6 for r in pts)


def test_detect_batch_matches_single_with_peaked_decoder(model, images):
    """Tie-free parity oracle: bias the coordinate/size decoders so every
    argmax is decisively peaked (margin >> reduction-order noise), then
    batched detect/point must reproduce the single path exactly — pinning
    the loop mechanics (positions, embeddings, box assembly, EOS handling)
    without depending on near-tie argmax luck."""
    import copy

    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    orig = model.params["region"]
    region = copy.deepcopy(orig)
    for site in ("coord_decoder", "size_decoder"):
        b = np.asarray(region[site]["fc2"]["b"], np.float32)
        region[site]["fc2"]["b"] = jnp.asarray(
            b + rng.standard_normal(b.shape).astype(np.float32) * 50
        ).astype(orig[site]["fc2"]["b"].dtype)
    model.params["region"] = region
    try:
        S = {"max_objects": 5}
        batched = model.detect_batch(images, "object", settings=S)
        for im, got in zip(images, batched):
            assert got == model.detect(im, "object", settings=S)
        pts = model.point_batch(images, "thing", settings=S)
        for im, got in zip(images, pts):
            assert got == model.point(im, "thing", settings=S)
    finally:
        model.params["region"] = orig


def test_detect_batch_accepts_encoded(model, images):
    encs = model.encode_images(images[:2])
    out = model.detect_batch(encs, "object", settings={"max_objects": 3})
    assert len(out) == 2
    for o in out:
        assert len(o["objects"]) <= 3


