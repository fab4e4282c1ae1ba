"""Structured decode (detect/point) through the continuous-batching pool
(engine/serving.py:serve_chunk_mixed): coordinate state machines advance
ragged alongside free-text rows in ONE fused chunk per step.

Exactness oracle: with peaked coordinate/size decoders (margin >> batched
reduction-order noise, same trick as tests/test_batched.py:86) the pooled
path must reproduce model.detect/model.point exactly while a caption
sharing the pool stays byte-identical to the sequential engine."""

import copy

import numpy as np
import pytest
from PIL import Image

import jax.numpy as jnp

from moondream_tpu.config import tiny_test_config
from moondream_tpu.models.moondream import MoondreamModel
from moondream_tpu.models.serve import ContinuousBatchingEngine
from moondream_tpu.tokenizer import ByteTokenizer
from moondream_tpu.utils.streaming import stream_text

GREEDY = {"temperature": 0.0, "top_p": 0.0}


@pytest.fixture(scope="module")
def model():
    m = MoondreamModel(tiny_test_config(), tokenizer=ByteTokenizer(), seed=0)
    # peak the coordinate/size decoders so every argmax is decisive:
    # ties under batched reduction order would otherwise make pooled vs
    # single comparisons flaky on random weights
    rng = np.random.default_rng(3)
    region = copy.deepcopy(m.params["region"])
    for site in ("coord_decoder", "size_decoder"):
        b = np.asarray(region[site]["fc2"]["b"], np.float32)
        region[site]["fc2"]["b"] = jnp.asarray(
            b + rng.standard_normal(b.shape).astype(np.float32) * 50
        ).astype(m.params["region"][site]["fc2"]["b"].dtype)
    m.params["region"] = region
    return m


@pytest.fixture(scope="module")
def images():
    rng = np.random.default_rng(0)
    return [
        Image.fromarray(
            rng.integers(0, 255, (90 + 25 * i, 120, 3), np.uint8)
        )
        for i in range(3)
    ]


def _sequential_caption(model, image, max_tokens):
    enc = model.encode_image(image)
    kv = model.load_encoded_image(enc)
    prompt = list(model.config.tokenizer.templates["caption"]["normal"])
    _, _, next_token, pos, kv = model._prefill_prompt(
        kv, prompt, enc.pos, 0.0, 0.0
    )
    toks = model._generate_answer_tokens(
        kv, next_token, pos, {**GREEDY, "max_tokens": max_tokens}
    )
    return "".join(stream_text(toks, model._decode_tokens))


def test_pooled_detect_point_match_single(model, images):
    S = {"max_objects": 5}
    want_det = model.detect(images[0], "object", settings=S)
    want_pts = model.point(images[1], "thing", settings=S)

    eng = ContinuousBatchingEngine(
        model, n_slots=3, slot_len=1024, chunk=3, max_objects=5
    )
    r_det = eng.submit_detect(images[0], "object")
    r_pts = eng.submit_point(images[1], "thing")
    out = eng.drain()
    assert out[r_det] == want_det
    assert out[r_pts] == want_pts


@pytest.mark.slow
def test_mixed_text_and_structured_pool(model, images):
    """A caption, a detect, and a point share the pool; each must equal
    its single-path result, and a text request admitted into the slot a
    structured request vacated must decode correctly (mode reset)."""
    S = {"max_objects": 4}
    want_cap = _sequential_caption(model, images[2], 12)
    want_det = model.detect(images[0], "object", settings=S)
    want_pts = model.point(images[1], "thing", settings=S)

    eng = ContinuousBatchingEngine(
        model, n_slots=3, slot_len=1024, chunk=3, max_objects=4
    )
    r_cap = eng.submit(images[2], max_tokens=12)
    r_det = eng.submit_detect(images[0], "object")
    eng.step()
    r_pts = eng.submit_point(images[1], "thing")
    out = eng.drain()
    assert out[r_cap] == want_cap
    assert out[r_det] == want_det
    assert out[r_pts] == want_pts

    # slot reuse: text after structured in the same pool
    r_cap2 = eng.submit(images[0], max_tokens=8)
    out = eng.drain()
    assert out[r_cap2] == _sequential_caption(model, images[0], 8)


def test_structured_cancel_and_spec_guard(model, images):
    eng = ContinuousBatchingEngine(
        model, n_slots=2, slot_len=1024, chunk=2, max_objects=5
    )
    rid = eng.submit_detect(images[0], "object")
    eng.step()
    assert eng.cancel(rid) is True
    out = eng.results[rid]
    assert "objects" in out  # partial (possibly empty) boxes

    # pool keeps working after the cancel
    r2 = eng.submit_point(images[1], "thing")
    out = eng.drain()
    assert "points" in out[r2]

    with pytest.raises(ValueError, match="max_objects"):
        eng.submit_detect(images[0], "object", max_objects=50)


@pytest.mark.slow
def test_structured_composes_with_speculative(model, images):
    """Speculative x structured composition (serve_chunk_mixed_spec): one
    greedy pool serves a caption at spec speed AND detect/point/gaze
    concurrently, each token/box-identical to its single-path result and
    to the non-spec pool."""
    S = {"max_objects": 4}
    want_cap = _sequential_caption(model, images[2], 12)
    want_det = model.detect(images[0], "object", settings=S)
    want_pts = model.point(images[1], "thing", settings=S)
    want_gaze = model.detect_gaze(images[0], eye=(0.4, 0.3))

    eng = ContinuousBatchingEngine(
        model, n_slots=4, slot_len=1024, chunk=3, max_objects=4,
        speculative=3,
    )
    r_cap = eng.submit(images[2], max_tokens=12)
    r_det = eng.submit_detect(images[0], "object")
    eng.step()  # struct + text advance together mid-flight
    r_pts = eng.submit_point(images[1], "thing")
    r_gaze = eng.submit_gaze(images[0], (0.4, 0.3))
    out = eng.drain()
    assert out[r_cap] == want_cap
    assert out[r_det] == want_det
    assert out[r_pts] == want_pts
    assert out[r_gaze] == want_gaze

    # slot reuse after spec-mixed chunks: a fresh text request in a slot a
    # structured one vacated decodes correctly (mode + history reset)
    r_cap2 = eng.submit(images[0], max_tokens=8)
    out = eng.drain()
    assert out[r_cap2] == _sequential_caption(model, images[0], 8)


@pytest.mark.slow
def test_spec_pool_structured_only(model, images):
    """An all-structured pool under speculation: every chunk routes
    through the mixed-spec path (no text rows at all)."""
    S = {"max_objects": 3}
    want_det = model.detect(images[0], "object", settings=S)
    want_pts = model.point(images[1], "thing", settings=S)
    eng = ContinuousBatchingEngine(
        model, n_slots=2, slot_len=1024, chunk=2, max_objects=3,
        speculative=4,
    )
    r_det = eng.submit_detect(images[0], "object")
    r_pts = eng.submit_point(images[1], "thing")
    out = eng.drain()
    assert out[r_det] == want_det
    assert out[r_pts] == want_pts


def test_spec_pool_sampled_falls_back_to_plain_mixed(model, images):
    """A SAMPLED pool containing structured rows must still produce
    correct boxes (the engine falls back to the plain mixed chunk when
    sampling is in use — spec drafting pauses, correctness holds)."""
    S = {"max_objects": 3}
    want_det = model.detect(images[0], "object", settings=S)
    eng = ContinuousBatchingEngine(
        model, n_slots=2, slot_len=1024, chunk=2, max_objects=3,
        speculative=4,
    )
    r_txt = eng.submit(images[2], max_tokens=8, temperature=0.7, top_p=0.9)
    r_det = eng.submit_detect(images[0], "object")
    out = eng.drain()
    assert out[r_det] == want_det
    assert isinstance(out[r_txt], str)


@pytest.mark.slow
def test_structured_pool_with_int8_kv(images):
    """Mixed chunks compose with the int8 KV cache: pooled detect equals
    the single-path detect on the same kv8 model."""
    import dataclasses

    cfg = tiny_test_config()
    cfg = dataclasses.replace(
        cfg, text=dataclasses.replace(cfg.text, kv_int8=True)
    )
    m = MoondreamModel(cfg, tokenizer=ByteTokenizer(), seed=0)
    rng = np.random.default_rng(3)
    region = copy.deepcopy(m.params["region"])
    for site in ("coord_decoder", "size_decoder"):
        b = np.asarray(region[site]["fc2"]["b"], np.float32)
        region[site]["fc2"]["b"] = jnp.asarray(
            b + rng.standard_normal(b.shape).astype(np.float32) * 50
        ).astype(m.params["region"][site]["fc2"]["b"].dtype)
    m.params["region"] = region

    S = {"max_objects": 4}
    want = m.detect(images[0], "object", settings=S)
    eng = ContinuousBatchingEngine(
        m, n_slots=2, slot_len=1024, chunk=3, max_objects=4
    )
    rid = eng.submit_detect(images[0], "object")
    out = eng.drain()
    assert out[rid] == want


@pytest.mark.slow
def test_structured_pool_sharded(model, images):
    """Mixed chunks compose with the tensor-parallel pool: pooled detect
    over a dp x tp mesh equals the single-device pooled result."""
    import dataclasses

    import jax

    from moondream_tpu.parallel import make_sharded_serving_engine
    from moondream_tpu.parallel.mesh import create_mesh

    cfg = dataclasses.replace(
        model.config,
        text=dataclasses.replace(model.config.text, xla_attn=True),
    )
    xmodel = MoondreamModel(
        cfg, params=model.params, tokenizer=ByteTokenizer()
    )
    ref_eng = ContinuousBatchingEngine(
        xmodel, n_slots=4, slot_len=1024, chunk=3, max_objects=4
    )
    r0 = ref_eng.submit_detect(images[0], "object")
    r1 = ref_eng.submit(images[1], max_tokens=8)
    ref = ref_eng.drain()

    mesh = create_mesh({"dp": 4, "tp": 2})
    eng = make_sharded_serving_engine(
        xmodel, mesh, n_slots=4, slot_len=1024, chunk=3, max_objects=4
    )
    s0 = eng.submit_detect(images[0], "object")
    s1 = eng.submit(images[1], max_tokens=8)
    out = eng.drain()
    assert out[s0] == ref[r0]
    assert out[s1] == ref[r1]


def test_pooled_gaze_matches_single(model, images):
    """Gaze through the pool equals model.detect_gaze (same embedding-
    space prompt prefill + 2-step point decode, pooled)."""
    want = model.detect_gaze(images[0], eye=(0.4, 0.3))
    eng = ContinuousBatchingEngine(
        model, n_slots=2, slot_len=1024, chunk=3, max_objects=4
    )
    rid = eng.submit_gaze(images[0], (0.4, 0.3))
    out = eng.drain()
    assert out[rid] == want

    # mixes with text + detect in one pool
    S = {"max_objects": 3}
    want_det = model.detect(images[1], "object", settings=S)
    eng2 = ContinuousBatchingEngine(
        model, n_slots=3, slot_len=1024, chunk=3, max_objects=3
    )
    r_g = eng2.submit_gaze(images[0], (0.4, 0.3))
    r_d = eng2.submit_detect(images[1], "object")
    r_c = eng2.submit(images[2], max_tokens=8)
    out = eng2.drain()
    assert out[r_g] == want
    assert out[r_d] == want_det
    assert out[r_c] == _sequential_caption(model, images[2], 8)
