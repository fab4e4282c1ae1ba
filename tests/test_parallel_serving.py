"""Tensor-parallel continuous batching (parallel/serving.py): the pool's
fused ragged chunks run SPMD over a dp x tp mesh with byte-identical
outputs to the single-device pool (same XLA-attention program, GSPMD
partitions it from the text-param + KV shardings)."""

import dataclasses

import numpy as np
import pytest
from PIL import Image

import jax

from moondream_tpu.config import tiny_test_config
from moondream_tpu.models.moondream import MoondreamModel
from moondream_tpu.models.serve import ContinuousBatchingEngine
from moondream_tpu.parallel import make_sharded_serving_engine
from moondream_tpu.parallel.mesh import create_mesh
from moondream_tpu.tokenizer import ByteTokenizer


def _xla_cfg():
    cfg = tiny_test_config()
    return dataclasses.replace(
        cfg, text=dataclasses.replace(cfg.text, xla_attn=True)
    )


@pytest.fixture(scope="module")
def base_model():
    return MoondreamModel(_xla_cfg(), tokenizer=ByteTokenizer(), seed=0)


@pytest.fixture(scope="module")
def images():
    rng = np.random.default_rng(0)
    return [
        Image.fromarray(
            rng.integers(0, 255, (100 + 20 * i, 120, 3), np.uint8)
        )
        for i in range(3)
    ]


def test_sharded_pool_matches_single_device(base_model, images):
    ref_eng = ContinuousBatchingEngine(
        base_model, n_slots=4, slot_len=1024, chunk=4
    )
    ref_ids = [ref_eng.submit(im, max_tokens=8) for im in images]
    ref = ref_eng.drain()

    mesh = create_mesh({"dp": 4, "tp": 2})
    eng = make_sharded_serving_engine(
        base_model, mesh, n_slots=4, slot_len=1024, chunk=4
    )
    ids = [eng.submit(im, max_tokens=8) for im in images]
    out = eng.drain()
    for i, r in zip(ids, ref_ids):
        assert out[i] == ref[r]
    # pool KV keeps its mesh placement through donated chunk steps
    spec = eng.kv.k.sharding.spec
    assert "dp" in spec and "tp" in spec


@pytest.mark.slow
def test_sharded_pool_staggered_and_vqa(base_model, images):
    """Staggered admission + mixed caption/VQA through the sharded pool:
    slot writes at different times recompose correctly across the dp
    shards of the slots axis."""
    ref_eng = ContinuousBatchingEngine(
        base_model, n_slots=4, slot_len=1024, chunk=3
    )
    r0 = ref_eng.submit(images[0], max_tokens=8)
    ref_eng.step()
    r1 = ref_eng.submit(images[1], question="what?", max_tokens=8)
    ref = ref_eng.drain()

    mesh = create_mesh({"dp": 4, "tp": 2})
    eng = make_sharded_serving_engine(
        base_model, mesh, n_slots=4, slot_len=1024, chunk=3
    )
    s0 = eng.submit(images[0], max_tokens=8)
    eng.step()
    s1 = eng.submit(images[1], question="what?", max_tokens=8)
    out = eng.drain()
    assert out[s0] == ref[r0]
    assert out[s1] == ref[r1]


def test_sharded_pool_validation(base_model):
    mesh = create_mesh({"dp": 4, "tp": 2})
    with pytest.raises(ValueError, match="n_slots"):
        make_sharded_serving_engine(base_model, mesh, n_slots=2)

    cfg = tiny_test_config()  # xla_attn False
    pallas_model = MoondreamModel(cfg, tokenizer=ByteTokenizer(), seed=0)
    with pytest.raises(ValueError, match="xla_attn"):
        make_sharded_serving_engine(pallas_model, mesh, n_slots=4)


@pytest.mark.slow
def test_http_frontend_over_sharded_pool(base_model, images):
    """The HTTP server's --tp path: ServingFrontend(mesh=...) serves
    concurrent requests through the SPMD pool with outputs matching the
    single-device engine."""
    import base64
    import io
    import json
    import threading
    import urllib.request

    from moondream_tpu.serve_http import make_server

    ref_eng = ContinuousBatchingEngine(
        base_model, n_slots=4, slot_len=1024, chunk=4
    )
    ref_ids = [ref_eng.submit(im, max_tokens=8) for im in images[:2]]
    ref = ref_eng.drain()

    mesh = create_mesh({"dp": 4, "tp": 2})
    srv, frontend = make_server(
        base_model, "127.0.0.1", 0, n_slots=4, chunk=4, mesh=mesh
    )
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        results = {}

        def run(i, im):
            buf = io.BytesIO()
            im.save(buf, format="PNG")
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/v1/caption",
                data=json.dumps({
                    "image_b64": base64.b64encode(buf.getvalue()).decode(),
                    "max_tokens": 8,
                }).encode(),
                headers={"Content-Type": "application/json"},
                method="POST",
            )
            with urllib.request.urlopen(req, timeout=600) as r:
                results[i] = json.loads(r.read())["caption"]

        threads = [
            threading.Thread(target=run, args=(i, im))
            for i, im in enumerate(images[:2])
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=600)
        for i, r in enumerate(ref_ids):
            assert results[i] == ref[r]
    finally:
        srv.shutdown()
        frontend.shutdown()


@pytest.mark.slow
def test_sharded_pool_with_speculation(base_model, images):
    """Speculative chunks (n-gram drafts + ragged span verify) compose
    with the sharded pool: greedy outputs stay byte-identical to the
    plain single-device engine."""
    ref_eng = ContinuousBatchingEngine(
        base_model, n_slots=4, slot_len=1024, chunk=3
    )
    ref_ids = [ref_eng.submit(im, max_tokens=10) for im in images[:2]]
    ref = ref_eng.drain()

    mesh = create_mesh({"dp": 4, "tp": 2})
    eng = make_sharded_serving_engine(
        base_model, mesh, n_slots=4, slot_len=1024, chunk=3, speculative=4
    )
    ids = [eng.submit(im, max_tokens=10) for im in images[:2]]
    out = eng.drain()
    for i, r in zip(ids, ref_ids):
        assert out[i] == ref[r]


@pytest.mark.slow
def test_sharded_vision_encoder_bit_exact(base_model, images):
    """shard_map ViT over all 8 devices: per-crop math is
    batch-independent, so the sharded encoder's features — and therefore
    full caption outputs — must match the single-device path exactly,
    including crop counts not divisible by the device count (padding)."""
    from moondream_tpu.parallel.serving import shard_vision_encoder

    ref = [
        base_model.caption(
            im, "normal",
            settings={"temperature": 0.0, "top_p": 0.0, "max_tokens": 8},
        )["caption"]
        for im in images
    ]

    mesh = create_mesh({"dp": 4, "tp": 2})
    smodel = MoondreamModel(
        _xla_cfg(), params=base_model.params, tokenizer=ByteTokenizer()
    )
    shard_vision_encoder(smodel, mesh)
    for im, want in zip(images, ref):
        got = smodel.caption(
            im, "normal",
            settings={"temperature": 0.0, "top_p": 0.0, "max_tokens": 8},
        )["caption"]
        assert got == want

    # composes with the sharded pool
    eng = make_sharded_serving_engine(
        base_model, mesh, shard_vision=True, n_slots=4, slot_len=1024,
        chunk=4,
    )
    rid = eng.submit(images[0], max_tokens=8)
    out = eng.drain()
    ref_eng = ContinuousBatchingEngine(
        base_model, n_slots=4, slot_len=1024, chunk=4
    )
    r = ref_eng.submit(images[0], max_tokens=8)
    assert out[rid] == ref_eng.drain()[r]


@pytest.mark.slow
def test_sharded_pool_with_variants(base_model, images):
    """Per-slot LoRA adapters through the tp-sharded pool: the stacked
    factors and (S,) vids ride the SPMD chunk as replicated inputs, so
    outputs equal the single-device variant pool byte-for-byte."""
    import jax.numpy as jnp

    cfg = base_model.config.text
    rng = np.random.default_rng(5)

    def pair(fin, fout, rank=4, b_scale=0.5):
        return {
            "A": jnp.asarray(
                rng.standard_normal(
                    (cfg.n_layers, rank, fin)
                ).astype(np.float32) * 0.1,
                base_model.dtype,
            ),
            "B": jnp.asarray(
                rng.standard_normal(
                    (cfg.n_layers, fout, rank)
                ).astype(np.float32) * b_scale,
                base_model.dtype,
            ),
        }

    tree = {
        "attn": {
            "qkv": pair(cfg.dim, cfg.qkv_dim),
            "proj": pair(cfg.dim, cfg.dim),
        },
        "mlp": {
            "fc1": pair(cfg.dim, cfg.ff_dim),
            "fc2": pair(cfg.ff_dim, cfg.dim),
        },
    }

    ref_eng = ContinuousBatchingEngine(
        base_model, n_slots=4, slot_len=1024, chunk=4,
        variants={"v": tree},
    )
    r0 = ref_eng.submit(images[0], max_tokens=8, variant="v")
    r1 = ref_eng.submit(images[1], max_tokens=8)
    ref = ref_eng.drain()

    mesh = create_mesh({"dp": 4, "tp": 2})
    eng = make_sharded_serving_engine(
        base_model, mesh, n_slots=4, slot_len=1024, chunk=4,
        variants={"v": tree},
    )
    s0 = eng.submit(images[0], max_tokens=8, variant="v")
    s1 = eng.submit(images[1], max_tokens=8)
    out = eng.drain()
    assert out[s0] == ref[r0]
    assert out[s1] == ref[r1]
