"""Continuous batching engine tests: ragged decode parity with the
sequential engine, staggered admission, slot reuse, budgets."""

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
    return MoondreamModel(tiny_test_config(), tokenizer=ByteTokenizer(), seed=0)


@pytest.fixture(scope="module")
def images():
    rng = np.random.default_rng(0)
    return [
        Image.fromarray(rng.integers(0, 255, (80 + 16 * i, 100, 3), np.uint8))
        for i in range(3)
    ]


def _sequential_caption(model, image, max_tokens):
    enc = model.encode_image(image)
    kv = model.load_encoded_image(enc)
    prompt = list(model.config.tokenizer.templates["caption"]["normal"])
    _, _, next_token, pos, kv = model._prefill_prompt(kv, prompt, enc.pos, 0.0, 0.0)
    toks = model._generate_answer_tokens(
        kv, next_token, pos, {**GREEDY, "max_tokens": max_tokens}
    )
    return "".join(stream_text(toks, model._decode_tokens))


def _sequential_query(model, image, question, max_tokens):
    return model.query(
        image=image, question=question,
        settings={**GREEDY, "max_tokens": max_tokens},
    )["answer"]


def test_single_request_matches_sequential(model, images):
    ref = _sequential_caption(model, images[0], 12)
    eng = ContinuousBatchingEngine(model, n_slots=2, slot_len=1024, chunk=4)
    rid = eng.submit(images[0], max_tokens=12)
    out = eng.drain()
    assert out[rid] == ref


def test_staggered_mixed_requests_match_sequential(model, images):
    refs = [
        _sequential_caption(model, images[0], 10),
        _sequential_query(model, images[1], "what?", 10),
        _sequential_caption(model, images[2], 10),
    ]
    eng = ContinuousBatchingEngine(model, n_slots=3, slot_len=1024, chunk=3)
    r0 = eng.submit(images[0], max_tokens=10)
    eng.step()  # r0 alone for one chunk
    r1 = eng.submit(images[1], question="what?", max_tokens=10)
    eng.step()
    r2 = eng.submit(images[2], max_tokens=10)
    out = eng.drain()
    assert out[r0] == refs[0]
    assert out[r1] == refs[1]
    assert out[r2] == refs[2]


def test_slot_reuse_and_backpressure(model, images):
    eng = ContinuousBatchingEngine(model, n_slots=1, slot_len=1024, chunk=4)
    r0 = eng.submit(images[0], max_tokens=6)
    with pytest.raises(RuntimeError):
        eng.submit(images[1], max_tokens=6)
    eng.drain()
    r1 = eng.submit(images[1], max_tokens=6)  # slot freed
    out = eng.drain()
    assert r0 in out and r1 in out
    assert out[r0] == _sequential_caption(model, images[0], 6)
    assert out[r1] == _sequential_caption(model, images[1], 6)


def test_budget_respected(model, images):
    eng = ContinuousBatchingEngine(model, n_slots=2, slot_len=1024, chunk=8)
    rid = eng.submit(images[0], max_tokens=5)
    eng.drain()
    assert len(eng.slots[0].tokens) <= 5
    assert rid in eng.results


def test_submit_many_matches_sequential(model, images):
    refs = [_sequential_caption(model, im, 8) for im in images]
    eng = ContinuousBatchingEngine(model, n_slots=4, slot_len=1024, chunk=4)
    rids = eng.submit_many(images, max_tokens=8)
    out = eng.drain()
    for rid, ref in zip(rids, refs):
        assert out[rid] == ref

    with pytest.raises(RuntimeError):
        # 4 slots, 3 now free? all finished -> 4 free; ask for 5
        eng.submit_many(images + images[:2], max_tokens=4)


@pytest.mark.slow
def test_serving_with_int4_model(images):
    """Continuous batching over a runtime-int4 model matches the int4
    sequential engine (both quantized: same weights, same rounding)."""
    from moondream_tpu.models.text import quantize_text_params

    base = MoondreamModel(tiny_test_config(), tokenizer=ByteTokenizer(), seed=0)
    qmodel = MoondreamModel(
        tiny_test_config(),
        params={**base.params, "text": quantize_text_params(base.params["text"])},
        tokenizer=ByteTokenizer(),
    )
    ref = _sequential_caption(qmodel, images[0], 6)
    eng = ContinuousBatchingEngine(qmodel, n_slots=2, slot_len=1024, chunk=4)
    rid = eng.submit(images[0], max_tokens=6)
    out = eng.drain()
    assert out[rid] == ref


def test_serving_streaming_callback(model, images):
    """on_text chunks concatenate to exactly the final result (the same
    word-boundary flushing as the single-stream API)."""
    chunks = {}

    def on_text(rid, chunk):
        chunks.setdefault(rid, []).append(chunk)

    eng = ContinuousBatchingEngine(model, n_slots=2, slot_len=1024, chunk=4)
    r1, r2 = eng.submit_many(images[:2], max_tokens=10, on_text=on_text)
    out = eng.drain()
    assert "".join(chunks.get(r1, [])) == out[r1]
    assert "".join(chunks.get(r2, [])) == out[r2]


def test_serving_cancel(model, images):
    eng = ContinuousBatchingEngine(model, n_slots=2, slot_len=1024, chunk=4)
    r1 = eng.submit(images[0], max_tokens=64)
    r2 = eng.submit(images[1], max_tokens=8)
    eng.step()
    partial_len = len(eng.slots[[s.req_id for s in eng.slots].index(r1)].tokens)
    assert eng.cancel(r1) is True
    assert eng.cancel(r1) is False  # already finished
    assert eng.cancel(999) is False
    # the slot is immediately reusable
    assert len(eng.free_slots()) == 1
    r3 = eng.submit(images[0], max_tokens=6)
    out = eng.drain()
    assert set(out) == {r1, r2, r3}
    # cancelled result is the partial text decoded so far
    assert isinstance(out[r1], str)
    assert partial_len <= 4  # one chunk's worth

def test_pipelined_step_overlap_matches_depth1(model, images):
    """pipeline_depth=2 (dispatch chunk i+1 before fetching chunk i's
    tokens) must produce identical results and streams under staggered
    admission — only the host-visible timing may differ."""
    refs = [
        _sequential_caption(model, images[0], 10),
        _sequential_query(model, images[1], "what?", 10),
        _sequential_caption(model, images[2], 10),
    ]
    stream = []
    eng = ContinuousBatchingEngine(
        model, n_slots=3, slot_len=1024, chunk=3, pipeline_depth=2
    )
    r0 = eng.submit(images[0], max_tokens=10,
                    on_text=lambda rid, ch: stream.append((rid, ch)))
    eng.step()  # dispatch only — results lag one chunk
    r1 = eng.submit(images[1], question="what?", max_tokens=10)
    eng.step()
    r2 = eng.submit(images[2], max_tokens=10)
    out = eng.drain()
    assert not eng._inflight
    assert out[r0] == refs[0]
    assert out[r1] == refs[1]
    assert out[r2] == refs[2]
    assert "".join(ch for rid, ch in stream if rid == r0) == refs[0]


def test_pipelined_cancel_and_slot_reuse(model, images):
    """Cancel while a chunk is in flight, then resubmit into the freed
    slot: the old chunk's rows must not be credited to the new request."""
    eng = ContinuousBatchingEngine(
        model, n_slots=1, slot_len=1024, chunk=4, pipeline_depth=2
    )
    r0 = eng.submit(images[0], max_tokens=12)
    eng.step()  # chunk 1 in flight, nothing processed yet
    assert eng.cancel(r0)
    r1 = eng.submit(images[1], max_tokens=6)
    out = eng.drain()
    assert out[r1] == _sequential_caption(model, images[1], 6)
    assert r0 in out  # cancelled: text decoded so far (may be empty)


def test_prepare_admit_matches_submit(model, images):
    """prepare()+admit_prepared() (the server's non-blocking admission
    path) must be byte-identical to submit()."""
    ref = _sequential_caption(model, images[0], 10)
    eng = ContinuousBatchingEngine(model, n_slots=2, slot_len=1024, chunk=4)
    # prepare while another request is mid-decode: stepping between
    # prepare and admit must not disturb the prepared request
    other = eng.submit(images[1], max_tokens=12)
    eng.step()
    prep = eng.prepare(images[0])
    eng.step()
    rid = eng.admit_prepared(prep, max_tokens=10)
    out = eng.drain()
    assert out[rid] == ref
    assert other in out


def test_prepare_release_and_double_admit(model, images):
    eng = ContinuousBatchingEngine(model, n_slots=1, slot_len=1024, chunk=4)
    pool_before = len(model._kv_pool)
    prep = eng.prepare(images[0])
    eng.release_prepared(prep)
    assert len(model._kv_pool) >= pool_before  # buffer returned
    eng.release_prepared(prep)  # idempotent
    with pytest.raises(ValueError):
        eng.admit_prepared(prep)  # already released

    # no-free-slot: prep stays valid for a later retry
    r0 = eng.submit(images[1], max_tokens=4)
    prep2 = eng.prepare(images[0])
    with pytest.raises(RuntimeError):
        eng.admit_prepared(prep2)
    eng.drain()
    rid = eng.admit_prepared(prep2, max_tokens=6)
    out = eng.drain()
    assert out[rid] == _sequential_caption(model, images[0], 6)
    assert r0 in out
