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


# --------------------------------------------------------- PooledPipeline


def test_pooled_pipeline_matches_singles(model):
    """The pooled stream (producer-thread encode + pool decode) must emit
    exactly the single-request captions under greedy decoding."""
    from moondream_tpu.engine.pipeline import PooledPipeline

    images = _images(5, seed=11)
    pipe = PooledPipeline(model, n_slots=2, slot_len=1024, chunk=4, wave=2)
    got = pipe.caption(images, "short", settings=GREEDY)
    singles = [
        model.caption(im, "short", settings=GREEDY)["caption"] for im in images
    ]
    assert got == singles


def test_pooled_pipeline_speculative_identical(model):
    """With speculative chunks the pooled stream stays token-identical:
    spec verify accepts a draft only when it equals the greedy token."""
    from moondream_tpu.engine.pipeline import PooledPipeline

    images = _images(4, seed=13)
    plain = PooledPipeline(model, n_slots=2, slot_len=1024, chunk=4, wave=2)
    spec = PooledPipeline(
        model, n_slots=2, slot_len=1024, chunk=4, wave=2, speculative=3
    )
    settings = {**GREEDY, "max_tokens": 12}
    assert spec.caption(images, "short", settings=settings) == plain.caption(
        images, "short", settings=settings
    )


def test_pooled_pipeline_query(model):
    from moondream_tpu.engine.pipeline import PooledPipeline

    images = _images(3, seed=17)
    pipe = PooledPipeline(model, n_slots=2, slot_len=1024, chunk=4, wave=2)
    got = pipe.query(images, "What?", settings=GREEDY)
    singles = [
        model.query(im, "What?", settings=GREEDY)["answer"] for im in images
    ]
    assert got == singles


def test_pooled_pipeline_producer_error_propagates(model):
    from moondream_tpu.engine.pipeline import PooledPipeline

    class Broken:
        def convert(self, mode):
            raise RuntimeError("bad image")

    pipe = PooledPipeline(model, n_slots=2, slot_len=1024, chunk=4, wave=2)
    with pytest.raises(RuntimeError, match="bad image"):
        pipe.caption([Broken()], "short", settings=GREEDY)


def test_pipeline_speculative_matches_plain(model):
    """BatchPipeline(speculative=k) decodes via the fused lockstep
    speculative loop (generate_text_spec_batched) — greedy outputs must be
    token-identical to the plain lockstep loop, including rows that hit
    EOS at different lengths (rows desync internally)."""
    images = _images(4, seed=21)
    settings = {**GREEDY, "max_tokens": 12}
    plain = BatchPipeline(model, batch_size=2)
    spec = BatchPipeline(model, batch_size=2, speculative=3)
    assert spec.caption(images, "short", settings=settings) == plain.caption(
        images, "short", settings=settings
    )

    # sampled settings route back to the plain loop (speculative batched
    # decode is greedy-only); this must not crash and must return strings
    sampled = spec.caption(
        images[:2], "short",
        settings={"temperature": 0.7, "top_p": 0.9, "max_tokens": 6},
    )
    assert all(isinstance(t, str) for t in sampled)
