"""Device mesh construction and parameter sharding rules.

The reference has no distributed runtime (SURVEY.md §2.5) — this is new,
TPU-native capability. The communication substrate is `jax.sharding`:
parameters are placed with NamedShardings and jitted computations let
XLA GSPMD insert the collectives (all-gather / reduce-scatter / psum) over
ICI. Supported axes:

  dp — data parallel (batch axis of training / batched inference)
  tp — tensor parallel (Megatron-style column/row splits of qkv/proj/fc1/fc2,
       vocab-parallel lm_head)

Pipeline (pp) / expert (ep) axes are not used by this dense 24-layer model at
v5e-pod scale; the KV cache layout keeps heads on `tp` so a context-parallel
axis can be added without relayout.
"""

from __future__ import annotations

from typing import Dict

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import MoondreamConfig


def create_mesh(axes: Dict[str, int], devices=None) -> Mesh:
    """Build a Mesh with named axes, e.g. {"dp": 2, "tp": 4}."""
    devices = devices if devices is not None else jax.devices()
    names = tuple(axes.keys())
    shape = tuple(axes.values())
    n = int(np.prod(shape))
    if n > len(devices):
        raise ValueError(f"mesh needs {n} devices, have {len(devices)}")
    dev_array = np.asarray(devices[:n]).reshape(shape)
    return Mesh(dev_array, names)


def default_mesh_axes(n_devices: int) -> Dict[str, int]:
    """A sensible dp x tp factorization: tp gets the largest power-of-two
    divisor up to 8 (tp rides ICI within a pod slice), dp the rest."""
    tp = 1
    for cand in (8, 4, 2):
        if n_devices % cand == 0:
            tp = cand
            break
    return {"dp": n_devices // tp, "tp": tp}


def _ns(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))


def batch_shardings(mesh: Mesh, seq_axis: str = None) -> dict:
    """NamedShardings for a training batch: rows on "dp" and, when
    `seq_axis` names a mesh axis (e.g. "sp"), the sequence axis sharded
    across it — sequence parallelism by annotation alone. The train step
    is unchanged: XLA partitions the full-sequence forward over the
    sharded length and inserts the K/V all-gathers attention needs.
    Requires config.xla_attn=True (an opaque Pallas attention call cannot
    be partitioned over the sequence). Verified loss/update-identical to
    the single-device step in tests/test_parallel.py."""
    return {
        "inputs_embeds": _ns(mesh, "dp", seq_axis, None),
        "labels": _ns(mesh, "dp", seq_axis),
        "label_mask": _ns(mesh, "dp", seq_axis),
    }


def shard_batch(batch: dict, mesh: Mesh, seq_axis: str = None) -> dict:
    """Place a host batch onto the mesh (optionally sequence-parallel)."""
    shardings = batch_shardings(mesh, seq_axis)
    return {k: jax.device_put(v, shardings[k]) for k, v in batch.items()}


def text_param_shardings(mesh: Mesh, config: MoondreamConfig) -> dict:
    """NamedSharding pytree for text params (stacked-blocks layout).

    Megatron split: qkv/fc1 column-parallel (output features on tp),
    proj/fc2 row-parallel (input features on tp), embeddings/lm_head
    sharded on the vocab-free axis, norms replicated.
    """
    rep = _ns(mesh)
    return {
        "wte": _ns(mesh, None, "tp"),
        "blocks": {
            "ln": {"weight": rep, "bias": rep},
            "attn": {
                "qkv": {"w": _ns(mesh, None, None, "tp"), "b": _ns(mesh, None, "tp")},
                "proj": {"w": _ns(mesh, None, "tp", None), "b": rep},
            },
            "mlp": {
                "fc1": {"w": _ns(mesh, None, None, "tp"), "b": _ns(mesh, None, "tp")},
                "fc2": {"w": _ns(mesh, None, "tp", None), "b": rep},
            },
        },
        "post_ln": {"weight": rep, "bias": rep},
        "lm_head": {"w": _ns(mesh, None, "tp"), "b": _ns(mesh, "tp")},
        "freqs_cis": rep,
    }


def vision_param_shardings(mesh: Mesh, config: MoondreamConfig) -> dict:
    rep = _ns(mesh)
    return {
        "patch_emb": {"w": rep, "b": rep},
        "pos_emb": rep,
        "blocks": {
            "ln1": {"weight": rep, "bias": rep},
            "attn": {
                "qkv": {"w": _ns(mesh, None, None, "tp"), "b": _ns(mesh, None, "tp")},
                "proj": {"w": _ns(mesh, None, "tp", None), "b": rep},
            },
            "ln2": {"weight": rep, "bias": rep},
            "mlp": {
                "fc1": {"w": _ns(mesh, None, None, "tp"), "b": _ns(mesh, None, "tp")},
                "fc2": {"w": _ns(mesh, None, "tp", None), "b": rep},
            },
        },
        "post_ln": {"weight": rep, "bias": rep},
        # proj_mlp is a single (un-stacked) MLP — no leading layer dim
        # (caught by __graft_entry__._lower_2b_shardings' rank check: the
        # stacked-blocks specs here silently mis-sharded at 2B shapes)
        "proj_mlp": {
            "fc1": {"w": _ns(mesh, None, "tp"), "b": _ns(mesh, "tp")},
            "fc2": {"w": _ns(mesh, "tp", None), "b": rep},
        },
    }


def region_param_shardings(mesh: Mesh, config: MoondreamConfig) -> dict:
    rep = _ns(mesh)
    return jax.tree.map(
        lambda _: rep,
        {
            "coord_features": 0,
            "coord_encoder": {"w": 0, "b": 0},
            "coord_decoder": {"fc1": {"w": 0, "b": 0}, "fc2": {"w": 0, "b": 0}},
            "size_features": 0,
            "size_encoder": {"w": 0, "b": 0},
            "size_decoder": {"fc1": {"w": 0, "b": 0}, "fc2": {"w": 0, "b": 0}},
        },
    )


def param_shardings(mesh: Mesh, config: MoondreamConfig) -> dict:
    return {
        "vision": vision_param_shardings(mesh, config),
        "text": text_param_shardings(mesh, config),
        "region": region_param_shardings(mesh, config),
    }


def shard_params(params: dict, mesh: Mesh, config: MoondreamConfig) -> dict:
    """Place a parameter pytree onto the mesh."""
    shardings = param_shardings(mesh, config)
    return jax.device_put(params, shardings)
