"""Eval-harness orchestration smoke: run real eval loops over synthetic
datasets (datasets.load_dataset monkeypatched) with the tiny model, and
exercise the HF legacy shim. Metric math itself is covered by
tests/test_eval_metrics.py; these tests prove the per-benchmark loops
drive the public API correctly end to end."""

import numpy as np
import pytest
from PIL import Image

from moondream_tpu.config import tiny_test_config
from moondream_tpu.models.moondream import MoondreamModel
from moondream_tpu.tokenizer import ByteTokenizer


@pytest.fixture(scope="module")
def model():
    m = MoondreamModel(tiny_test_config(), tokenizer=ByteTokenizer(), seed=0)
    # keep eval loops fast: tiny decode budgets
    m._settings_orig = m._settings
    m._settings = lambda s: (4, 0.0, 0.0)
    return m


def _img(seed, size=(64, 80)):
    rng = np.random.default_rng(seed)
    return Image.fromarray(
        rng.integers(0, 255, (size[0], size[1], 3), np.uint8)
    )


class _FakeDataset(list):
    pass


def test_pope_loop(model, monkeypatch):
    import datasets

    rows = [
        {
            "image": _img(0),
            "random": [{"question": "Is there a dog?", "answer": "no"}],
            "popular": [{"question": "Is there a cat?", "answer": "yes"}],
            "adversarial": [{"question": "Is there a car?", "answer": "no"}],
        }
    ]
    monkeypatch.setattr(datasets, "load_dataset", lambda *a, **k: _FakeDataset(rows))
    from moondream_tpu.eval.pope import evaluate_pope

    res = evaluate_pope(model, debug=True)
    assert set(res) == {"random", "popular", "adversarial"}
    for v in res.values():
        assert 0.0 <= v <= 100.0


def test_realworldqa_loop(model, monkeypatch):
    import datasets

    rows = [
        {"image": _img(1), "question": "What?", "answer": "something"},
        {"image": _img(2), "question": "Where?", "answer": "here"},
    ]
    monkeypatch.setattr(datasets, "load_dataset", lambda *a, **k: _FakeDataset(rows))
    from moondream_tpu.eval.realworldqa import eval_realworldqa

    res = eval_realworldqa(model, debug=True)
    assert res["total"] == 2 if "total" in res else True
    acc = res.get("accuracy", res.get("acc"))
    assert acc is not None and 0.0 <= acc <= 100.0


def test_hf_shim_legacy_api(model):
    from moondream_tpu.hf_moondream import HfMoondream

    hf = HfMoondream(model)
    img = _img(3)

    enc = hf.encode_image(img)
    ans = hf.answer_question(enc, "what is this?")
    assert isinstance(ans, str)

    answers = hf.batch_answer([img, _img(4)], ["a?", "b?"])
    assert len(answers) == 2 and all(isinstance(a, str) for a in answers)

    gen = hf.generate(img, "hello")
    assert isinstance(gen, list) and len(gen) == 1

    cap = hf.caption(img)
    assert isinstance(cap["caption"], str)
    det = hf.detect(img, "thing")
    assert "objects" in det


def test_hf_shim_embedding_accessors(model):
    """get/set_input_embeddings + input_embeds (reference
    hf_moondream.py:142-183): swapped tables must drive generation."""
    import numpy as np

    from moondream_tpu.hf_moondream import HfMoondream

    hf = HfMoondream(model)
    wte = hf.get_input_embeddings()
    assert wte.shape[1] == model.config.text.dim

    emb = hf.input_embeds([1, 2, 3])
    np.testing.assert_allclose(
        np.asarray(emb[0], np.float32),
        np.asarray(wte, np.float32)[[1, 2, 3]],
    )

    img = _img(5)
    before = hf.answer_question(hf.encode_image(img), "what?")
    rng = np.random.default_rng(0)
    new = rng.standard_normal(wte.shape).astype(np.float32) * 0.02
    hf.set_input_embeddings(new)
    np.testing.assert_allclose(
        np.asarray(hf.get_input_embeddings(), np.float32),
        np.asarray(new, np.float32), atol=1e-2, rtol=1e-2,
    )
    after = hf.answer_question(hf.encode_image(img), "what?")
    assert isinstance(after, str) and after != before

    with pytest.raises(ValueError):
        hf.set_input_embeddings(np.zeros((4, 4), np.float32))

    hf.set_input_embeddings(wte)  # restore for other tests
