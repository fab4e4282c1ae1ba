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
