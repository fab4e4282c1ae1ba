"""BatchPipeline must agree with caption_batch / the single-request path
token-for-token under greedy decoding — it reorders work (prefetch thread,
direct prefill into the decode buffer) but runs the same kernels at the
same positions."""

import numpy as np
import pytest
from PIL import Image

from moondream_tpu.config import tiny_test_config
from moondream_tpu.engine.pipeline import BatchPipeline
from moondream_tpu.models.moondream import MoondreamModel
from moondream_tpu.tokenizer import ByteTokenizer

GREEDY = {"temperature": 0.0, "top_p": 0.0, "max_tokens": 8}


@pytest.fixture(scope="module")
def model():
    return MoondreamModel(tiny_test_config(), tokenizer=ByteTokenizer(), seed=0)


def _images(n, seed=7, sizes=None):
    rng = np.random.default_rng(seed)
    sizes = sizes or [(120, 160)] * n
    return [
        Image.fromarray(rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8))
        for h, w in sizes[:n]
    ]


def test_pipeline_matches_caption_batch(model):
    images = _images(4)
    pipe = BatchPipeline(model, batch_size=2)
    got = pipe.caption(images, "normal", settings=GREEDY)
    want = model.caption_batch(images[:2], "normal", settings=GREEDY)
    want += model.caption_batch(images[2:], "normal", settings=GREEDY)
    assert got == want


def test_pipeline_tail_padding(model):
    # 5 images through batch_size=2: final batch is padded internally,
    # padded row's output must be dropped
    images = _images(5)
    pipe = BatchPipeline(model, batch_size=2)
    got = pipe.caption(images, "short", settings=GREEDY)
    singles = [
        model.caption(im, "short", settings=GREEDY)["caption"] for im in images
    ]
    assert got == singles


def test_pipeline_mixed_tilings(model):
    # different aspect ratios within one batch -> multiple ViT groups
    images = _images(4, sizes=[(120, 160), (200, 100), (120, 160), (160, 160)])
    pipe = BatchPipeline(model, batch_size=4)
    got = pipe.caption(images, "normal", settings=GREEDY)
    singles = [
        model.caption(im, "normal", settings=GREEDY)["caption"] for im in images
    ]
    assert got == singles


def test_pipeline_query(model):
    images = _images(3)
    pipe = BatchPipeline(model, batch_size=3)
    got = pipe.query(images, "What is this?", settings=GREEDY)
    want = model.query_batch(images, "What is this?", settings=GREEDY)
    assert got == want


def test_pipeline_empty_and_single(model):
    pipe = BatchPipeline(model, batch_size=2)
    assert pipe.caption([], settings=GREEDY) == []
    images = _images(1)
    got = pipe.caption(images, "normal", settings=GREEDY)
    want = [model.caption(images[0], "normal", settings=GREEDY)["caption"]]
    assert got == want


def test_pipeline_producer_error_propagates(model):
    class Broken:
        def convert(self, mode):
            raise ValueError("bad image")

    pipe = BatchPipeline(model, batch_size=2)
    with pytest.raises(ValueError, match="bad image"):
        pipe.caption([Broken(), Broken()], settings=GREEDY)
