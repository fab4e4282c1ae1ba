"""Multi-variant (per-slot LoRA) serving: one continuous-batching pool
mixing base-model rows and rows decoding through DIFFERENT LoRA adapters
in the same fused chunk. The reference applies one variant per model
instance (lora.py via moondream.py settings["variant"]); serving many
tenants concurrently from one slot pool is TPU-native new ground, so
parity is asserted against the reference-shaped single-stream path
(model.caption/query/detect with settings={"variant": ...}) per row."""

import numpy as np
import pytest
import torch
from PIL import Image

import moondream_tpu.lora as lora_mod
from moondream_tpu.config import tiny_test_config
from moondream_tpu.lora import stack_variant_pytrees
from moondream_tpu.models.moondream import MoondreamModel
from moondream_tpu.models.serve import ContinuousBatchingEngine
from moondream_tpu.tokenizer import ByteTokenizer

GREEDY = {"temperature": 0.0, "top_p": 0.0}


def _fake_variant_file(path, cfg, rank, seed, b_scale=0.5):
    """A variant checkpoint in the download format (legacy torch names)."""
    rng = np.random.default_rng(seed)
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
            a = rng.standard_normal((rank, fin)).astype(np.float32) * 0.1
            b = rng.standard_normal((fout, rank)).astype(np.float32) * b_scale
            state[f"text_model.transformer.h.{i}.{site}.A"] = torch.from_numpy(a)
            state[f"text_model.transformer.h.{i}.{site}.B"] = torch.from_numpy(b)
    torch.save(state, path)


@pytest.fixture(scope="module")
def model():
    # fp32: the pool's per-row LoRA delta (gathered batched einsum) and the
    # single-stream lora_linear reduce in different orders, so they are
    # equal only to rounding — bf16's ~1e-2 logit wobble can flip greedy
    # near-ties on random weights; fp32 keeps the string parity stable.
    # (Bitwise plumbing exactness is covered by the zero-B adapter test.)
    import jax.numpy as jnp

    return MoondreamModel(
        tiny_test_config(), tokenizer=ByteTokenizer(), seed=0,
        dtype=jnp.float32,
    )


@pytest.fixture()
def variant_trees(tmp_path, monkeypatch, model):
    """Two adapters of DIFFERENT ranks (exercises rank padding), loaded
    through the real checkpoint path, as both the engine's stacked trees
    and the names the single-stream settings={"variant": ...} API sees."""
    cfg = tiny_test_config()
    paths = {"v1": tmp_path / "v1.pt", "v2": tmp_path / "v2.pt"}
    _fake_variant_file(paths["v1"], cfg, rank=4, seed=1)
    _fake_variant_file(paths["v2"], cfg, rank=2, seed=2)
    monkeypatch.setattr(
        lora_mod, "cached_variant_path", lambda vid: paths[vid]
    )
    lora_mod.variant_state_dict.cache_clear()
    import jax.numpy as jnp

    dtype_str = str(jnp.dtype(model.dtype))
    trees = {
        name: lora_mod.variant_state_dict(
            name, n_layers=cfg.text.n_layers, dtype_str=dtype_str
        )
        for name in paths
    }
    yield trees
    lora_mod.variant_state_dict.cache_clear()


@pytest.fixture()
def images():
    rng = np.random.default_rng(0)
    return [
        Image.fromarray(rng.integers(0, 255, (80 + 16 * i, 100, 3), np.uint8))
        for i in range(3)
    ]


def test_stacked_shapes_and_zero_base(variant_trees):
    stacked = stack_variant_pytrees(
        [variant_trees["v1"], variant_trees["v2"]]
    )
    cfg = tiny_test_config().text
    # (L, V+1, r_max, in) with v2's rank-2 factors zero-padded to 4
    assert stacked["attn"]["qkv"]["A"].shape == (cfg.n_layers, 3, 4, cfg.dim)
    assert stacked["attn"]["qkv"]["B"].shape == (
        cfg.n_layers, 3, cfg.qkv_dim, 4
    )
    assert not np.asarray(stacked["attn"]["qkv"]["A"][:, 0]).any()
    assert not np.asarray(stacked["mlp"]["fc2"]["B"][:, 0]).any()
    # padded tail rows of the narrower adapter are zero
    assert not np.asarray(stacked["mlp"]["fc1"]["A"][:, 2, 2:]).any()


@pytest.mark.slow
def test_pool_mixes_base_and_two_variants(model, variant_trees, images):
    s = {**GREEDY, "max_tokens": 10}
    ref_base = model.caption(images[0], settings=s)["caption"]
    ref_v1 = model.caption(
        images[1], settings={**s, "variant": "v1"}
    )["caption"]
    ref_v2 = model.query(
        images[2], "what?", settings={**s, "variant": "v2"}
    )["answer"]
    assert ref_v1 != ref_base or ref_v2 != ref_base  # adapters do something

    eng = ContinuousBatchingEngine(
        model, n_slots=3, slot_len=1024, chunk=3, variants=variant_trees
    )
    r0 = eng.submit(images[0], max_tokens=10)
    r1 = eng.submit(images[1], max_tokens=10, variant="v1")
    eng.step()  # staggered: r2 admitted after a chunk already ran
    r2 = eng.submit(images[2], question="what?", max_tokens=10, variant="v2")
    out = eng.drain()
    assert out[r0] == ref_base
    assert out[r1] == ref_v1
    assert out[r2] == ref_v2


def test_slot_reuse_switches_adapter(model, variant_trees, images):
    """A slot freed by a variant request must not leak its adapter into
    the next (base) request that lands on the same slot."""
    s = {**GREEDY, "max_tokens": 8}
    eng = ContinuousBatchingEngine(
        model, n_slots=1, slot_len=1024, chunk=4, variants=variant_trees
    )
    r0 = eng.submit(images[0], max_tokens=8, variant="v1")
    eng.drain()
    r1 = eng.submit(images[0], max_tokens=8)  # same slot, base model
    out = eng.drain()
    assert out[r1] == model.caption(images[0], settings=s)["caption"]


def test_structured_rows_with_variant(model, variant_trees, tmp_path,
                                      monkeypatch, images):
    """detect through an adapter rides the mixed chunk next to a base
    text row. Coordinate-bin argmaxes amplify reduction-order rounding
    into bin/count flips across implementations, so the pinned claims
    are: a zero-B adapter's detect is BITWISE the plain pool's detect
    (plumbing through the mixed chunk), a real adapter changes the
    boxes (it actually reaches structured rows), and a base text row
    sharing the pool is unaffected."""
    import jax.numpy as jnp

    cfg = tiny_test_config()
    pz = tmp_path / "z.pt"
    _fake_variant_file(pz, cfg, rank=4, seed=3, b_scale=0.0)
    monkeypatch.setattr(lora_mod, "cached_variant_path", lambda vid: pz)
    lora_mod.variant_state_dict.cache_clear()
    ztree = lora_mod.variant_state_dict(
        "z", n_layers=cfg.text.n_layers, dtype_str=str(jnp.dtype(model.dtype))
    )

    plain = ContinuousBatchingEngine(model, n_slots=2, slot_len=1024, chunk=3)
    pd = plain.submit_detect(images[0], "cat", max_objects=3)
    ref_detect = plain.drain()[pd]

    eng = ContinuousBatchingEngine(
        model, n_slots=3, slot_len=1024, chunk=3,
        variants={**variant_trees, "z": ztree},
    )
    rt = eng.submit(images[1], max_tokens=8)
    rz = eng.submit_detect(images[0], "cat", max_objects=3, variant="z")
    rv = eng.submit_detect(images[0], "cat", max_objects=3, variant="v1")
    out = eng.drain()
    assert out[rz]["objects"] == ref_detect["objects"]
    assert out[rv]["objects"] != ref_detect["objects"]
    assert out[rt] == model.caption(
        images[1], settings={**GREEDY, "max_tokens": 8}
    )["caption"]


@pytest.mark.slow
def test_int4_base_composes_with_variants(variant_trees, images):
    """Per-slot adapters over a runtime-int4 base: the low-rank residual
    adds after the fused dequant matmul, matching the single-stream
    int4+lora path."""
    import jax.numpy as jnp

    from moondream_tpu.models.text import quantize_text_params

    m = MoondreamModel(
        tiny_test_config(), tokenizer=ByteTokenizer(), seed=0,
        dtype=jnp.float32,
    )
    m.params = {**m.params, "text": quantize_text_params(m.params["text"])}
    s = {**GREEDY, "max_tokens": 8}
    ref_v1 = m.caption(images[0], settings={**s, "variant": "v1"})["caption"]
    ref_base = m.caption(images[1], settings=s)["caption"]

    eng = ContinuousBatchingEngine(
        m, n_slots=2, slot_len=1024, chunk=4, variants=variant_trees
    )
    r0 = eng.submit(images[0], max_tokens=8, variant="v1")
    r1 = eng.submit(images[1], max_tokens=8)
    out = eng.drain()
    assert out[r0] == ref_v1
    assert out[r1] == ref_base


def test_zero_b_adapter_is_bitwise_noop(model, tmp_path, monkeypatch, images):
    """An adapter with all-zero B factors contributes an exactly-zero
    delta, so its pool rows must be BITWISE identical to a pool with no
    variants at all — this pins the plumbing (gather, padding, threading)
    independent of floating-point reduction order."""
    import jax.numpy as jnp

    cfg = tiny_test_config()
    p = tmp_path / "z.pt"
    _fake_variant_file(p, cfg, rank=4, seed=3, b_scale=0.0)
    monkeypatch.setattr(lora_mod, "cached_variant_path", lambda vid: p)
    lora_mod.variant_state_dict.cache_clear()
    tree = lora_mod.variant_state_dict(
        "z", n_layers=cfg.text.n_layers, dtype_str=str(jnp.dtype(model.dtype))
    )

    plain = ContinuousBatchingEngine(model, n_slots=2, slot_len=1024, chunk=4)
    p0 = plain.submit(images[0], max_tokens=10)
    p1 = plain.submit(images[1], question="what?", max_tokens=10)
    ref = plain.drain()

    eng = ContinuousBatchingEngine(
        model, n_slots=2, slot_len=1024, chunk=4, variants={"z": tree}
    )
    r0 = eng.submit(images[0], max_tokens=10, variant="z")
    r1 = eng.submit(images[1], question="what?", max_tokens=10)
    out = eng.drain()
    assert out[r0] == ref[p0]
    assert out[r1] == ref[p1]


def test_unknown_variant_rejected(model, variant_trees, images):
    eng = ContinuousBatchingEngine(
        model, n_slots=1, slot_len=1024, chunk=4, variants=variant_trees
    )
    with pytest.raises(KeyError, match="unknown variant"):
        eng.submit(images[0], variant="nope")


def test_speculative_composes_with_variants(model, variant_trees, images):
    """Greedy speculative chunks over a mixed-tenant pool: the ragged
    span verify applies each row's adapter, so emitted streams equal the
    plain (non-spec) variant pool token-for-token."""
    plain = ContinuousBatchingEngine(
        model, n_slots=3, slot_len=1024, chunk=4, variants=variant_trees
    )
    p0 = plain.submit(images[0], max_tokens=12, variant="v1")
    p1 = plain.submit(images[1], max_tokens=12)
    p2 = plain.submit(images[2], question="what?", max_tokens=12,
                      variant="v2")
    ref = plain.drain()

    spec = ContinuousBatchingEngine(
        model, n_slots=3, slot_len=1024, chunk=4, speculative=4,
        variants=variant_trees,
    )
    s0 = spec.submit(images[0], max_tokens=12, variant="v1")
    s1 = spec.submit(images[1], max_tokens=12)
    s2 = spec.submit(images[2], question="what?", max_tokens=12,
                     variant="v2")
    out = spec.drain()
    assert out[s0] == ref[p0]
    assert out[s1] == ref[p1]
    assert out[s2] == ref[p2]


def test_variants_compose_with_prefix_share(model, variant_trees, images):
    """Prefix-shared pool with per-row adapters: a variant's image prefix
    is encoded UNDER the adapter, so base and variant requests for the
    same image hold separate prefix entries, and outputs match the plain
    multi-variant pool byte for byte."""
    s = {"temperature": 0.0, "top_p": 0.0, "max_tokens": 10}
    enc_base = model.encode_image(images[0])
    enc_v1 = model.encode_image(
        images[0],
        settings={"variant_tree": variant_trees["v1"], "variant_label": "v1"},
    )

    def run(prefix_share):
        eng = ContinuousBatchingEngine(
            model, n_slots=3, slot_len=1024, chunk=3,
            variants=variant_trees, prefix_share=prefix_share,
        )
        r0 = eng.submit(enc_base, max_tokens=10)
        r1 = eng.submit(enc_v1, max_tokens=10, variant="v1")
        r2 = eng.submit(enc_base, question="what?", max_tokens=10)
        return eng, (r0, r1, r2), eng.drain()

    _, rids0, out0 = run(False)
    eng, rids1, out1 = run(True)
    for a, b in zip(rids0, rids1):
        assert out1[b] == out0[a]
    # base (x2, shared) and v1 prefixes are distinct entries
    assert len(eng._pref_pid_of) == 2
