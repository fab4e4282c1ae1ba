"""Pipeline-parallel (pp) training correctness.

The GPipe-style shard_map pipeline (parallel/pipeline.py) must reproduce
the single-device train step bit-closely: same global masked-mean loss,
same gradients, same parameter update — layer slabs on stages and
microbatched injection are pure re-schedulings of the same math.
Runs on the 8-device virtual CPU mesh from tests/conftest.py.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from moondream_tpu.config import TextConfig
from moondream_tpu.finetune.trainer import (
    init_train_state,
    make_optimizer,
    make_train_step,
    text_loss,
)
from moondream_tpu.models import text as text_ops
from moondream_tpu.parallel import create_mesh
from moondream_tpu.parallel.pipeline import (
    make_pp_loss_and_grads,
    make_pp_train_step,
    shard_params_pp,
)

CFG = TextConfig(
    dim=64, ff_dim=128, n_layers=4, vocab_size=256, max_context=64,
    n_heads=4, n_kv_heads=4, prefix_attn=4,
)


def _params():
    return text_ops.init_text_params(CFG, jax.random.PRNGKey(0), jnp.float32)


def _batch(B=8, T=16):
    rng = np.random.default_rng(0)
    return {
        "inputs_embeds": jnp.asarray(
            rng.standard_normal((B, T, CFG.dim)).astype(np.float32) * 0.1
        ),
        "labels": jnp.asarray(
            rng.integers(0, CFG.vocab_size, (B, T)).astype(np.int32)
        ),
        "label_mask": jnp.asarray(
            (rng.random((B, T)) > 0.3).astype(np.float32)
        ),
    }


@pytest.mark.parametrize(
    "axes,microbatches",
    [pytest.param({"pp": 2, "dp": 2}, 2, marks=pytest.mark.slow),
     pytest.param({"pp": 4, "dp": 1}, 4, marks=pytest.mark.slow),
     ({"pp": 2, "dp": 1}, 1)],
)
def test_pp_loss_and_grads_match_single_device(axes, microbatches):
    params = _params()
    batch = _batch()
    mesh = create_mesh(axes)

    def ref_loss(p):
        return text_loss(
            p, batch["inputs_embeds"], batch["labels"],
            batch["label_mask"], CFG,
        )

    ref_l, ref_g = jax.value_and_grad(ref_loss)(params)

    fn = make_pp_loss_and_grads(CFG, mesh, microbatches)
    pp_params = shard_params_pp(params, mesh)
    loss, grads = fn(pp_params, batch)

    np.testing.assert_allclose(float(loss), float(ref_l), rtol=1e-5)
    flat_ref, _ = jax.tree.flatten(ref_g)
    flat_pp, _ = jax.tree.flatten(grads)
    for a, b in zip(flat_ref, flat_pp):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-4, atol=2e-5
        )


def test_pp_train_step_matches_single_device():
    params = _params()
    batch = _batch()
    mesh = create_mesh({"pp": 2, "dp": 2})

    opt = make_optimizer(lr=1e-3)
    ref_step = make_train_step(opt, CFG)
    ref_state, ref_loss_v = ref_step(init_train_state(_params(), opt), batch)

    pp_step = make_pp_train_step(opt, CFG, mesh, n_microbatches=2)
    pp_state = init_train_state(shard_params_pp(params, mesh), opt)
    pp_state, pp_loss_v = pp_step(pp_state, batch)

    np.testing.assert_allclose(
        float(pp_loss_v), float(ref_loss_v), rtol=1e-5
    )
    flat_ref, _ = jax.tree.flatten(ref_state.params)
    flat_pp, _ = jax.tree.flatten(pp_state.params)
    for a, b in zip(flat_ref, flat_pp):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-4, atol=2e-5
        )
    assert int(pp_state.step) == 1

    # a second step runs (donated buffers re-jit cleanly)
    pp_state, l2 = pp_step(pp_state, _batch())
    assert np.isfinite(float(l2))


@pytest.mark.slow
def test_pp_matches_single_device_gqa():
    """Pipeline stages run the GQA attention path identically."""
    cfg = TextConfig(
        dim=64, ff_dim=128, n_layers=4, vocab_size=256, max_context=64,
        n_heads=8, n_kv_heads=2, prefix_attn=4,
    )
    params = text_ops.init_text_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    batch = _batch()
    mesh = create_mesh({"pp": 2, "dp": 2})

    def ref_loss(p):
        return text_loss(
            p, batch["inputs_embeds"], batch["labels"],
            batch["label_mask"], cfg,
        )

    ref_l, ref_g = jax.value_and_grad(ref_loss)(params)
    fn = make_pp_loss_and_grads(cfg, mesh, 2)
    loss, grads = fn(shard_params_pp(params, mesh), batch)
    np.testing.assert_allclose(float(loss), float(ref_l), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(ref_g), jax.tree.leaves(grads)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-4, atol=2e-5
        )


def test_pp_state_checkpoint_roundtrip(tmp_path):
    """Orbax save/restore of a pp-sharded TrainState: the sharded layer
    slabs round-trip and training continues from the restored step."""
    from moondream_tpu.finetune.trainer import (
        load_checkpoint,
        make_optimizer,
        save_checkpoint,
    )

    params = _params()
    batch = _batch()
    mesh = create_mesh({"pp": 2, "dp": 2})
    opt = make_optimizer(lr=1e-3)
    step = make_pp_train_step(opt, CFG, mesh, n_microbatches=2)
    state = init_train_state(shard_params_pp(params, mesh), opt)
    state, _ = step(state, batch)

    path = str(tmp_path / "ckpt")
    save_checkpoint(path, state)

    template = init_train_state(shard_params_pp(_params(), mesh), opt)
    restored = load_checkpoint(path, template, opt)
    assert int(restored.step) == 1
    for a, b in zip(
        jax.tree.leaves(state.params), jax.tree.leaves(restored.params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # training continues from the restored state
    restored2, loss = step(restored, _batch())
    assert np.isfinite(float(loss))


def test_pp_rejects_bad_divisibility():
    mesh = create_mesh({"pp": 2, "dp": 1})
    with pytest.raises(ValueError):
        make_pp_loss_and_grads(
            TextConfig(
                dim=64, ff_dim=128, n_layers=3, vocab_size=256,
                max_context=64, n_heads=4, n_kv_heads=4, prefix_attn=4,
            ),
            mesh, 2,
        )
