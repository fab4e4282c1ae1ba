"""Prefix-shared image KV in the serving pool.

Slots hold only the SUFFIX (prompt + generated tokens); distinct images
hold ONE shared read-only [BOS, image] prefix entry, selected per row by
`pids` inside the ragged kernels (engine/serving.py:_ragged_attn).
Everything here must be byte-identical to the non-shared pool: same
tokens, same boxes/points, across plain, speculative, mixed
(text + structured), int8-KV, and multi-variant configurations.
"""

import numpy as np
import pytest
from PIL import Image

import dataclasses
import jax.numpy as jnp

from moondream_tpu.config import tiny_test_config
from moondream_tpu.models.moondream import MoondreamModel
from moondream_tpu.models.serve import ContinuousBatchingEngine
from moondream_tpu.tokenizer import ByteTokenizer

GREEDY = {"temperature": 0.0, "top_p": 0.0}


@pytest.fixture(scope="module")
def model():
    return MoondreamModel(tiny_test_config(), tokenizer=ByteTokenizer(), seed=0)


@pytest.fixture(scope="module")
def model_kv8():
    cfg = tiny_test_config()
    cfg = dataclasses.replace(
        cfg, text=dataclasses.replace(cfg.text, kv_int8=True)
    )
    return MoondreamModel(cfg, tokenizer=ByteTokenizer(), seed=0)


@pytest.fixture(scope="module")
def images():
    rng = np.random.default_rng(0)
    return [
        Image.fromarray(rng.integers(0, 255, (80 + 16 * i, 100, 3), np.uint8))
        for i in range(3)
    ]


def _pools(model, images, n_slots=4, **kw):
    """Submit the same mixed workload (two requests sharing one encode,
    one distinct) to a plain and a prefix-shared pool; return both
    result dicts plus the shared engine."""
    encs = [model.encode_image(im) for im in images[:2]]

    def run(prefix_share):
        eng = ContinuousBatchingEngine(
            model, n_slots=n_slots, slot_len=1024, chunk=4,
            prefix_share=prefix_share, **kw,
        )
        rids = [
            eng.submit(encs[0], max_tokens=10),
            eng.submit(encs[1], max_tokens=10),
            eng.submit(encs[0], max_tokens=10, question="what?"),
        ]
        return eng, rids, eng.drain()

    _, rids0, out0 = run(False)
    eng1, rids1, out1 = run(True)
    return eng1, list(zip(rids0, rids1)), out0, out1


def test_pool_identical_and_shared(model, images):
    eng, pairs, out0, out1 = _pools(model, images)
    for a, b in pairs:
        assert out1[b] == out0[a]
    # two same-image requests held ONE prefix entry
    assert eng._pref_refs.count(0) == len(eng._pref_refs)  # all released
    assert eng._pref_pid_of  # entries stay mapped for later re-hits


def test_spec_pool_identical(model, images):
    _, pairs, out0, out1 = _pools(model, images, speculative=3)
    for a, b in pairs:
        assert out1[b] == out0[a]


@pytest.mark.slow
def test_int8_kv_pool_identical(model_kv8, images):
    _, pairs, out0, out1 = _pools(model_kv8, images)
    for a, b in pairs:
        assert out1[b] == out0[a]


def _mixed_pools(model, images, speculative=0):
    enc = model.encode_image(images[0])

    def run(prefix_share):
        eng = ContinuousBatchingEngine(
            model, n_slots=4, slot_len=1024, chunk=4,
            prefix_share=prefix_share, speculative=speculative,
        )
        r_cap = eng.submit(enc, max_tokens=8)
        r_det = eng.submit_detect(enc, "thing", max_objects=2)
        r_pt = eng.submit_point(images[1], "spot")
        return eng, (r_cap, r_det, r_pt), eng.drain()

    _, rids0, out0 = run(False)
    eng1, rids1, out1 = run(True)
    return eng1, list(zip(rids0, rids1)), out0, out1


def test_mixed_pool_identical(model, images):
    _, pairs, out0, out1 = _mixed_pools(model, images)
    for a, b in pairs:
        assert out1[b] == out0[a]


def test_mixed_spec_pool_identical(model, images):
    _, pairs, out0, out1 = _mixed_pools(model, images, speculative=3)
    for a, b in pairs:
        assert out1[b] == out0[a]


def test_gaze_through_prefix_pool(model, images):
    enc = model.encode_image(images[0])

    def run(prefix_share):
        eng = ContinuousBatchingEngine(
            model, n_slots=2, slot_len=1024, chunk=4,
            prefix_share=prefix_share,
        )
        rid = eng.submit_gaze(enc, eye=(0.4, 0.6))
        return eng.drain()[rid]

    assert run(True) == run(False)


def test_prefix_pool_exhaustion_raises(model, images):
    eng = ContinuousBatchingEngine(
        model, n_slots=3, slot_len=1024, chunk=4,
        prefix_share=True, prefix_entries=1,
    )
    encs = [model.encode_image(im) for im in images[:2]]
    eng.submit(encs[0], max_tokens=4)
    eng.submit(encs[0], max_tokens=4)  # same entry — fine
    with pytest.raises(RuntimeError, match="prefix pool exhausted"):
        eng.submit(encs[1], max_tokens=4)
    eng.drain()
    # after the pool drains the entry frees up and a new image fits
    rid = eng.submit(encs[1], max_tokens=4)
    assert rid in eng.drain()


def test_slot_reuse_rebinds_prefix(model, images):
    """A retired slot's next request must read ITS OWN prefix entry, not
    the previous tenant's."""
    encs = [model.encode_image(im) for im in images[:2]]
    eng = ContinuousBatchingEngine(
        model, n_slots=1, slot_len=1024, chunk=4, prefix_share=True,
    )
    r0 = eng.submit(encs[0], max_tokens=6)
    out0 = eng.drain()[r0]
    r1 = eng.submit(encs[1], max_tokens=6)
    out1 = eng.drain()[r1]

    eng2 = ContinuousBatchingEngine(
        model, n_slots=1, slot_len=1024, chunk=4,
    )
    r0b = eng2.submit(encs[0], max_tokens=6)
    assert eng2.drain()[r0b] == out0
    r1b = eng2.submit(encs[1], max_tokens=6)
    assert eng2.drain()[r1b] == out1


def test_suffix_cache_is_small(model):
    eng = ContinuousBatchingEngine(
        model, n_slots=4, slot_len=1024, chunk=4, prefix_share=True,
    )
    # per-slot cache holds only ceil128(1024 - 730) = 384 positions
    assert eng.kv.k.shape[3] == 384
    assert eng.kv_pref.k.shape[3] == 768
    assert eng.kv_pref.k.shape[1] == 4  # default prefix_entries = n_slots


def test_prefix_rejects_wrong_span(model, images):
    eng = ContinuousBatchingEngine(
        model, n_slots=2, slot_len=1024, chunk=4, prefix_share=True,
    )
    enc = model.encode_image(images[0])
    bad = dataclasses.replace(enc, pos=enc.pos - 1)
    with pytest.raises(ValueError, match="shared prefix"):
        eng.submit(bad, max_tokens=4)
