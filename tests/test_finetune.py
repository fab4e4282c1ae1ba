"""Finetuning tests: loss parity with the reference and checkpoint
save/load roundtrip."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from moondream_tpu.config import tiny_test_config
from moondream_tpu.finetune.trainer import lr_schedule, region_loss, size_to_bin, text_loss
from moondream_tpu.models import region as jregion, text as jtext

from conftest import add_reference_to_path, reference_available

requires_reference = pytest.mark.skipif(
    not reference_available(), reason="reference tree not mounted"
)

if reference_available():
    add_reference_to_path()


def _ref_text_loss(inputs_embeds, w, labels, config):
    """Reference text_loss formula (finetune_text.py:34-51), inlined because
    the reference module imports bitsandbytes/wandb which aren't installed.
    Uses the reference's own _produce_hidden/_lm_head."""
    import torch
    import torch.nn as nn
    from moondream.torch.text import _lm_head, _produce_hidden

    _, q_len, _ = inputs_embeds.shape
    hidden = _produce_hidden(inputs_embeds, w, config)
    lm_logits = _lm_head(hidden, w)
    _, _, l_len = labels.shape
    shift_index = (q_len - l_len) - 1
    shifted_logits = lm_logits[..., shift_index:-1, :].contiguous()
    return nn.CrossEntropyLoss()(
        shifted_logits.view(-1, shifted_logits.size(-1)),
        labels.contiguous().view(-1),
    )


@requires_reference
def test_text_loss_matches_reference():
    import torch

    from moondream_tpu.config import TextConfig
    from moondream_tpu.weights import text_params_from_flat
    from moondream.torch.text import build_text_model

    cfg = TextConfig(
        dim=128, ff_dim=256, n_layers=2, vocab_size=128, max_context=1024,
        n_heads=2, n_kv_heads=2, prefix_attn=730,
    )
    torch.manual_seed(0)
    ref_model = build_text_model(cfg, torch.float32)
    with torch.no_grad():
        for p in ref_model.parameters():
            p.normal_(0.0, 0.05)
    params = text_params_from_flat(
        {f"text.{k}": v for k, v in ref_model.state_dict().items()}, cfg,
        dtype=jnp.float32,
    )

    rng = np.random.default_rng(0)
    seq, ans_len = 740, 6
    embeds = (rng.standard_normal((1, seq, cfg.dim)) * 0.2).astype(np.float32)
    answer_ids = rng.integers(0, cfg.vocab_size, ans_len).astype(np.int64)

    ref = _ref_text_loss(
        torch.from_numpy(embeds), ref_model,
        torch.from_numpy(answer_ids[None, None]), cfg,
    )

    # Our interface aligns labels to positions (label at t predicted from
    # t-1): answer tokens occupy the last ans_len positions.
    labels = np.zeros((1, seq), np.int32)
    mask = np.zeros((1, seq), np.float32)
    labels[0, seq - ans_len :] = answer_ids
    mask[0, seq - ans_len :] = 1.0
    ours = text_loss(
        params, jnp.asarray(embeds), jnp.asarray(labels), jnp.asarray(mask), cfg
    )
    np.testing.assert_allclose(float(ours), float(ref), rtol=2e-3)


def _ref_region_loss(hidden_states, w, labels, c_idx, s_idx):
    """Reference region_loss formula (finetune_region.py:38-64), inlined
    (module imports wandb). Uses the reference's decode fns."""
    import torch
    import torch.nn.functional as F
    from moondream.torch.region import decode_coordinate, decode_size

    l_idx = torch.arange(len(labels))
    c_hidden = hidden_states[:, c_idx - 1, :]
    c_logits = decode_coordinate(c_hidden, w)
    c_labels = labels[(l_idx % 4) < 2]
    c_loss = F.cross_entropy(c_logits.view(-1, c_logits.size(-1)), c_labels)

    s_hidden = hidden_states[:, s_idx - 1, :]
    s_logits = decode_size(s_hidden, w).view(-1, 1024)
    s_labels = labels[(l_idx % 4) >= 2]
    s_loss = F.cross_entropy(s_logits, s_labels)
    return c_loss + s_loss


@requires_reference
def test_region_loss_matches_reference():
    import torch

    cfg = tiny_test_config().region
    key = jax.random.PRNGKey(0)
    params = jregion.init_region_params(cfg, key, dtype=jnp.float32)

    # Build a torch mirror of the region params for the reference fn.
    import torch.nn as nn

    region = nn.ModuleDict(
        {
            "coord_decoder": nn.ModuleDict(
                {"fc1": nn.Linear(cfg.dim, cfg.inner_dim),
                 "fc2": nn.Linear(cfg.inner_dim, cfg.coord_out_dim)}
            ),
            "size_decoder": nn.ModuleDict(
                {"fc1": nn.Linear(cfg.dim, cfg.inner_dim),
                 "fc2": nn.Linear(cfg.inner_dim, cfg.size_out_dim)}
            ),
        }
    )
    with torch.no_grad():
        for name in ("coord_decoder", "size_decoder"):
            for fc in ("fc1", "fc2"):
                region[name][fc].weight.copy_(
                    torch.from_numpy(np.asarray(params[name][fc]["w"]).T)
                )
                region[name][fc].bias.copy_(
                    torch.from_numpy(np.asarray(params[name][fc]["b"]))
                )

    rng = np.random.default_rng(1)
    seq, n_boxes, prefix = 24, 2, 10
    hidden = (rng.standard_normal((1, seq, cfg.dim)) * 0.3).astype(np.float32)
    labels = rng.integers(0, 1024, 4 * n_boxes).astype(np.int64)
    c_idx = np.array([prefix, prefix + 1, prefix + 3, prefix + 4])
    s_idx = np.array([prefix + 2, prefix + 5])

    ref = _ref_region_loss(
        torch.from_numpy(hidden), region, torch.from_numpy(labels),
        torch.from_numpy(c_idx), torch.from_numpy(s_idx),
    )
    ours = region_loss(
        params, jnp.asarray(hidden), jnp.asarray(labels.astype(np.int32)),
        jnp.asarray(c_idx.astype(np.int32)), jnp.asarray(s_idx.astype(np.int32)),
    )
    np.testing.assert_allclose(float(ours), float(ref), rtol=2e-3)


def test_lr_schedule_matches_reference_formula():
    # Reference formula (finetune_text.py:26-31), inlined (module imports
    # bitsandbytes).
    import math

    REF_LR = 3e-6

    def ref_sched(step, max_steps):
        x = step / max_steps
        if x < 0.1:
            return 0.1 * REF_LR + 0.9 * REF_LR * x / 0.1
        return 0.1 * REF_LR + 0.9 * REF_LR * (1 + math.cos(math.pi * (x - 0.1))) / 2

    sched = lr_schedule(REF_LR)
    for step in (0, 5, 10, 50, 99, 100):
        ours = float(sched(jnp.float32(step), 100))
        assert ours == pytest.approx(ref_sched(step, 100), rel=1e-5), step


def test_size_to_bin():
    assert int(size_to_bin(jnp.asarray(1.0))) == 1023
    assert int(size_to_bin(jnp.asarray(1 / 1024))) == 0
    assert int(size_to_bin(jnp.asarray(0.0))) == 0  # clamped


def test_checkpoint_roundtrip(tmp_path):
    """save_params -> load_params preserves every tensor."""
    from moondream_tpu.finetune.finetune_text import save_params
    from moondream_tpu.models.moondream import MoondreamModel
    from moondream_tpu.tokenizer import ByteTokenizer
    from moondream_tpu.weights import load_params

    config = tiny_test_config()
    model = MoondreamModel(config, tokenizer=ByteTokenizer(), seed=3, dtype=jnp.float32)
    path = str(tmp_path / "ckpt.safetensors")
    save_params(path, model)

    reloaded = load_params(path, config, dtype=jnp.float32)

    def compare(a, b, name=""):
        if isinstance(a, dict):
            for k in a:
                if k == "freqs_cis":
                    continue
                compare(a[k], b[k], f"{name}.{k}")
        elif a is not None:
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-6, err_msg=name
            )

    compare(model.params, reloaded)
