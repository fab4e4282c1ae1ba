"""Tensor-parallel continuous batching: the serving pool over a device mesh.

New TPU-native capability (the reference is strictly single-device and has
no serving at all — SURVEY.md §2.5): the ContinuousBatchingEngine's text
params, pool KV cache, and fused ragged decode chunks are sharded over a
`jax.sharding.Mesh`. Placement does all the work — the engine's host-side
scheduler and the serve_chunk program are unchanged; XLA GSPMD partitions
the chunk across the mesh from the argument shardings and inserts the
all-reduces after the row-parallel proj/fc2 matmuls over ICI:

- text params: Megatron splits (mesh.text_param_shardings) — qkv/fc1
  column-parallel on `tp`, proj/fc2 row-parallel, norms replicated
- pool KV cache (L, S, Hkv, T, D): request slots S on `dp`, KV heads on
  `tp` (inference.kv_cache_sharding)
- cur/pos/active/budget row state: replicated (tiny int vectors)

Requires `config.text.xla_attn=True`: the ragged Pallas decode kernel is
opaque to GSPMD, while the XLA attention path partitions across head
shards (engine/serving.py picks the XLA branch under xla_attn).

    mesh = create_mesh({"dp": 2, "tp": 4})
    eng = make_sharded_serving_engine(model, mesh, n_slots=8)
    eng.submit(image); eng.drain()          # same API, mesh-wide chunks

Output parity with the single-device pool is exact (same XLA-attention
program, partitioned): tests/test_parallel_serving.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..models.moondream import MoondreamModel
from ..models.serve import ContinuousBatchingEngine
from .inference import kv_cache_sharding
from .mesh import text_param_shardings


def shard_vision_encoder(model: MoondreamModel, mesh: Mesh) -> None:
    """Make the model's crop-batch ViT run data-parallel over ALL mesh
    devices (the crop axis shards across the flattened dp x tp device
    grid via shard_map; vision params replicate). Per-crop math is
    batch-independent — attention and LN reduce within a crop — so the
    sharded encoder is numerically identical to the single-device stack;
    crop stacks pad to a multiple of the device count and slice back.
    Every encode path (encode_image, encode_images, the pipelines) goes
    through the same jit-cache seam, so one override covers them all."""
    from ..models import vision as vision_ops

    cfg = model.config.vision
    dtype = model.dtype
    axes = tuple(mesh.axis_names)
    world = mesh.size

    def body(vision_params, crops_u8):
        x = crops_u8.astype(dtype) / 255.0
        x = (x - 0.5) / 0.5
        return vision_ops.vision_encoder(x, vision_params, cfg)

    sharded = jax.jit(
        jax.shard_map(
            body, mesh=mesh,
            in_specs=(P(), P(axes, None, None, None)),
            out_specs=P(axes, None, None),
        )
    )

    def run(vision_params, crops_u8):
        n = crops_u8.shape[0]
        pad = (-n) % world
        if pad:
            crops_u8 = jnp.concatenate(
                [crops_u8,
                 jnp.zeros((pad, *crops_u8.shape[1:]), crops_u8.dtype)]
            )
        return sharded(vision_params, crops_u8)[:n]

    model._jits["vis_enc"] = run


def make_sharded_serving_engine(
    model: MoondreamModel, mesh: Mesh, shard_vision: bool = False,
    **engine_kwargs,
) -> ContinuousBatchingEngine:
    """Build a ContinuousBatchingEngine whose decode chunks run SPMD over
    `mesh`. The vision encoder and single-row prefill stay on the default
    device placement (encode is per-request, compute-light relative to the
    pool's aggregate decode); the steady-state chunk loop — where the
    weights stream once per step for every active request — is what
    shards.

    Constraints (validated): `config.text.xla_attn` must be True,
    `n_kv_heads` divisible by the `tp` axis, `n_slots` divisible by the
    `dp` axis.

    The engine serves a twin model holding mesh-sharded text params; the
    caller's `model` still references the unsharded copies (GBs of
    device-0 HBM at 2B) — drop that reference when the original model is
    no longer needed."""
    cfg = model.config
    tp = int(mesh.shape.get("tp", 1))
    dp = int(mesh.shape.get("dp", 1))
    if not cfg.text.xla_attn:
        raise ValueError(
            "sharded serving requires config.text.xla_attn=True: the "
            "ragged Pallas decode kernel is opaque to GSPMD partitioning "
            "(dataclasses.replace(config.text, xla_attn=True))"
        )
    if cfg.text.n_kv_heads % tp:
        raise ValueError(
            f"n_kv_heads={cfg.text.n_kv_heads} not divisible by tp={tp}"
        )
    shardings = text_param_shardings(mesh, cfg)
    smodel = MoondreamModel(
        cfg,
        params={
            **model.params,
            "text": jax.device_put(model.params["text"], shardings),
        },
        tokenizer=model.tokenizer,
    )
    if shard_vision:
        # crop-axis data parallelism for admissions' encodes — bit-exact
        # with the single-device ViT (per-crop independence)
        shard_vision_encoder(smodel, mesh)
    eng = ContinuousBatchingEngine(smodel, **engine_kwargs)
    if eng.n_slots % dp:
        raise ValueError(f"n_slots={eng.n_slots} not divisible by dp={dp}")
    eng.kv = jax.device_put(eng.kv, kv_cache_sharding(mesh, cfg.text))
    return eng
