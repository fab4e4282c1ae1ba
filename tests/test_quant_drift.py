"""Quantized-config accuracy gates (eval/quant_drift.py).

Real-checkpoint gates can't run here (no weights reachable —
BASELINE.md), so CI pins the MECHANISM at the tiny config: the drift
harness measures real (bounded, nonzero) int8-ViT drift, the agreement
metric is exact for identical models, and the gate logic itself is
machine-checkable."""

import numpy as np
import pytest

from moondream_tpu.config import tiny_test_config
from moondream_tpu.eval.quant_drift import (
    GATES,
    _images,
    caption_agreement,
    check_gates,
    vision_projection_drift,
)
from moondream_tpu.models.moondream import MoondreamModel
from moondream_tpu.tokenizer import ByteTokenizer


@pytest.fixture(scope="module")
def model():
    return MoondreamModel(tiny_test_config(), tokenizer=ByteTokenizer(), seed=0)


def _small_images(n=3):
    from PIL import Image

    rng = np.random.default_rng(5)
    return [
        Image.fromarray(rng.integers(0, 255, (96, 128, 3), dtype=np.uint8))
        for _ in range(n)
    ]


def test_vision_drift_bounded_and_nonzero(model):
    rep = vision_projection_drift(model, images=_small_images(2))
    assert rep["n_images"] == 2
    # int8 PTQ changes the embedding (quantization actually happened) ...
    assert rep["rel_l2"] > 0
    assert rep["max_abs_err"] > 0
    # ... but stays a perturbation, not a blow-up (mechanism bound; the
    # real-checkpoint gate is the tighter GATES["vit8_rel_l2_max"])
    assert rep["rel_l2"] < 0.2, rep
    # model params restored after the measurement
    assert "blocks" in model.params["vision"]


def test_caption_agreement_exact_for_identical_models(model):
    rep = caption_agreement(model, model, images=_small_images(2), max_tokens=6)
    assert rep["token_agreement"] == 1.0
    assert rep["exact_caption_rate"] == 1.0


def test_gate_logic():
    ok = check_gates({
        "rel_l2": GATES["vit8_rel_l2_max"] / 2,
        "max_abs_err": GATES["vit8_abs_err_max"] / 2,
        "token_agreement": 1.0,
    })
    assert ok == {"vit8_rel_l2": True, "vit8_abs_err": True,
                  "caption_agreement": True}
    bad = check_gates({
        "rel_l2": GATES["vit8_rel_l2_max"] * 2,
        "token_agreement": 0.5,
    })
    assert bad["vit8_rel_l2"] is False
    assert bad["caption_agreement"] is False
    assert "vit8_abs_err" not in bad


def test_drift_refuses_quantized_model(model):
    from moondream_tpu.models.vision import quantize_vision_params

    q = MoondreamModel(
        tiny_test_config(),
        params={**model.params,
                "vision": quantize_vision_params(model.params["vision"])},
        tokenizer=ByteTokenizer(),
    )
    with pytest.raises(ValueError, match="quantized vision"):
        vision_projection_drift(q, images=_small_images(1))


def test_gate_corpus_builds():
    imgs = _images(6)
    assert len(imgs) == 6
    assert all(im.size == (504, 378) for im in imgs)
