"""LoRA "variant" tests: checkpoint-name mapping, pytree stacking, and the
runtime application invariants (zero-B adapters are exact no-ops; nonzero
adapters change the logits) — all offline via a locally written variant
file (the reference downloads from api.moondream.ai, lora.py:23-40)."""

import numpy as np
import pytest
import torch

import moondream_tpu.lora as lora_mod
from moondream_tpu.config import tiny_test_config
from moondream_tpu.models.moondream import MoondreamModel
from moondream_tpu.tokenizer import ByteTokenizer

RANK = 4


def _fake_variant_file(path, cfg, b_scale: float):
    """Write a torch state dict using the reference's LEGACY naming (the
    download format): text_model.transformer.h.{i}.mixer.Wqkv.A etc."""
    rng = np.random.default_rng(0)
    state = {}
    d, ff = cfg.text.dim, cfg.text.ff_dim
    sites = {
        "mixer.Wqkv": (d, cfg.text.qkv_dim),
        "mixer.out_proj": (d, d),
        "mlp.fc1": (d, ff),
        "mlp.fc2": (ff, d),
    }
    for i in range(cfg.text.n_layers):
        for site, (fin, fout) in sites.items():
            a = rng.standard_normal((RANK, fin)).astype(np.float32) * 0.1
            b = rng.standard_normal((fout, RANK)).astype(np.float32) * b_scale
            state[f"text_model.transformer.h.{i}.{site}.A"] = torch.from_numpy(a)
            state[f"text_model.transformer.h.{i}.{site}.B"] = torch.from_numpy(b)
    torch.save(state, path)


@pytest.fixture(scope="module")
def model():
    return MoondreamModel(tiny_test_config(), tokenizer=ByteTokenizer(), seed=0)


@pytest.fixture()
def variant_files(tmp_path, monkeypatch):
    cfg = tiny_test_config()
    zero = tmp_path / "variant-zero.pt"
    real = tmp_path / "variant-real.pt"
    _fake_variant_file(str(zero), cfg, b_scale=0.0)
    _fake_variant_file(str(real), cfg, b_scale=0.5)

    monkeypatch.setattr(
        lora_mod, "cached_variant_path",
        lambda vid: {"zero": zero, "real": real}[vid],
    )
    lora_mod.variant_state_dict.cache_clear()
    yield {"zero": "zero", "real": "real"}
    lora_mod.variant_state_dict.cache_clear()


def test_variant_state_dict_shapes(model, variant_files):
    cfg = model.config.text
    tree = lora_mod.variant_state_dict(
        variant_files["real"], n_layers=cfg.n_layers, dtype_str="float32"
    )
    assert tree["attn"]["qkv"]["A"].shape == (cfg.n_layers, RANK, cfg.dim)
    assert tree["attn"]["qkv"]["B"].shape == (cfg.n_layers, cfg.qkv_dim, RANK)
    assert tree["mlp"]["fc2"]["A"].shape == (cfg.n_layers, RANK, cfg.ff_dim)
    assert tree["mlp"]["fc2"]["B"].shape == (cfg.n_layers, cfg.dim, RANK)


def test_lora_zero_b_is_noop_and_nonzero_changes_logits(model, variant_files):
    from PIL import Image

    rng = np.random.default_rng(1)
    image = Image.fromarray(rng.integers(0, 255, (96, 128, 3), np.uint8))
    greedy = {"temperature": 0.0, "top_p": 0.0, "max_tokens": 4}

    enc = model.encode_image(image)
    prompt = list(model.config.tokenizer.templates["caption"]["normal"])

    def first_logits(variant):
        lora = model._variant({"variant": variant} if variant else None)
        kv = model.load_encoded_image(enc)
        logits, _, _, _, _ = model._prefill_prompt(
            kv, prompt, enc.pos, 0.0, 0.0, lora=lora
        )
        return np.asarray(logits, np.float32)

    base = first_logits(None)
    np.testing.assert_array_equal(first_logits(variant_files["zero"]), base)
    assert not np.array_equal(first_logits(variant_files["real"]), base)

    # full public-API path with a variant
    out = model.caption(
        image, "normal", settings={**greedy, "variant": variant_files["real"]}
    )
    assert isinstance(out["caption"], str)
