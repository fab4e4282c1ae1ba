"""LoRA "variant" adapters.

Parity with the reference variant loader
(/root/reference/moondream/torch/lora.py:11-79): adapters are downloaded from
the Moondream API (or read from a local file), key-renamed from training
checkpoint names, and applied as low-rank additions inside attention and MLP
layers (text.py:31-58, layers.py:129-146).

TPU-native difference: instead of a nested per-layer dict threaded through
Python module calls, the adapter is converted to a *stacked* pytree
(leading layer axis) so it rides the same `lax.scan` as the block weights —
LoRA presence is a static compile-time flag, its values are traced inputs.
"""

from __future__ import annotations

import functools
import os
import shutil
from pathlib import Path
from typing import Optional

import jax.numpy as jnp
import numpy as np


def variant_cache_dir() -> Path:
    hf_hub_cache = os.environ.get("HF_HUB_CACHE")
    if hf_hub_cache is not None:
        return Path(hf_hub_cache) / "md_variants"
    hf_home = os.environ.get("HF_HOME")
    if hf_home is not None:
        return Path(hf_home) / "hub" / "md_variants"
    return Path("~/.cache/huggingface/hub").expanduser() / "md_variants"


def cached_variant_path(variant_id: str) -> Path:
    """Local file path for a variant, downloading through the Moondream API
    when absent (reference lora.py:23-40)."""
    if os.path.exists(variant_id):
        return Path(variant_id)

    cache_dir = variant_cache_dir() / variant_id
    os.makedirs(cache_dir, exist_ok=True)
    dest = cache_dir / "final.pt"
    if dest.exists():
        return dest

    from urllib.request import Request, urlopen

    endpoint = os.getenv("MOONDREAM_ENDPOINT", "https://api.moondream.ai")
    headers = {"User-Agent": "moondream-tpu"}
    api_key = os.getenv("MOONDREAM_API_KEY")
    if api_key is not None:
        headers["X-Moondream-Auth"] = api_key

    req = Request(f"{endpoint}/v1/variants/{variant_id}/download", headers=headers)
    with urlopen(req) as r, open(dest, "wb") as f:
        shutil.copyfileobj(r, f)
    return dest


_RENAME_RULES = [
    ("text_model.transformer.h", "text.blocks"),
    (".mixer", ".attn"),
    (".out_proj", ".proj"),
    (".Wqkv", ".qkv"),
    (".parametrizations.weight.0", ""),
]


def _to_numpy(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    t = t.detach().cpu()
    if str(t.dtype) == "torch.bfloat16":
        t = t.float()
    return t.numpy()


@functools.lru_cache(maxsize=5)
def variant_state_dict(
    variant_id: Optional[str] = None, n_layers: int = 24, dtype_str: str = "bfloat16"
):
    """Load a variant and return the stacked LoRA pytree:
    {"attn": {"qkv"/"proj": {"A": (L,r,in), "B": (L,out,r)}},
     "mlp": {"fc1"/"fc2": {...}}}  (torch (out,in)-layout factors, consumed
    transposed by ops.layers.lora_linear)."""
    if variant_id is None:
        return None

    import torch

    state = torch.load(
        cached_variant_path(variant_id), map_location="cpu", weights_only=True
    )

    flat = {}
    for key, tensor in state.items():
        for old, new in _RENAME_RULES:
            key = key.replace(old, new)
        flat[key] = _to_numpy(tensor)

    dtype = jnp.dtype(dtype_str)

    def stacked(site: str, factor: str):
        return jnp.asarray(
            np.stack(
                [flat[f"text.blocks.{i}.{site}.{factor}"] for i in range(n_layers)]
            ),
            dtype=dtype,
        )

    return {
        "attn": {
            "qkv": {"A": stacked("attn.qkv", "A"), "B": stacked("attn.qkv", "B")},
            "proj": {"A": stacked("attn.proj", "A"), "B": stacked("attn.proj", "B")},
        },
        "mlp": {
            "fc1": {"A": stacked("mlp.fc1", "A"), "B": stacked("mlp.fc1", "B")},
            "fc2": {"A": stacked("mlp.fc2", "A"), "B": stacked("mlp.fc2", "B")},
        },
    }


def merge_variant(text_params: dict, lora: dict, scale: float = 1.0):
    """Fold a stacked adapter into the dense block weights where the
    adapter input equals the matmul input: W (L, in, out) += scale·AᵀBᵀ
    for qkv / fc1 / fc2. The attn **proj** adapter reads the BLOCK INPUT
    (the shared-LN output), not the proj input (reference text.py:53-56),
    so it cannot be folded into the proj weight; it is returned as a
    residual adapter to keep passing per step.

    Returns ``(merged_params, residual_lora)`` where ``residual_lora`` is
    None when the proj adapter is identically zero (then serving the
    merged variant costs ZERO extra matmuls per step), else a stacked
    adapter pytree containing only ``{"attn": {"proj": pair}}``.
    Accumulation runs in fp32 and rounds back to the weight dtype.
    Requires dense weights (merge before quantize_text_params for int4
    serving)."""
    if "w" not in text_params["blocks"]["attn"]["qkv"]:
        raise ValueError(
            "merge_variant needs dense block weights — merge before "
            "runtime-int4 quantization"
        )

    def fold(w, pair):
        delta = jnp.einsum(
            "lri,lor->lio",
            pair["A"].astype(jnp.float32),
            pair["B"].astype(jnp.float32),
        )
        return (w.astype(jnp.float32) + scale * delta).astype(w.dtype)

    blocks = text_params["blocks"]
    merged = {
        **text_params,
        "blocks": {
            **blocks,
            "attn": {
                **blocks["attn"],
                "qkv": {
                    **blocks["attn"]["qkv"],
                    "w": fold(blocks["attn"]["qkv"]["w"], lora["attn"]["qkv"]),
                },
            },
            "mlp": {
                **blocks["mlp"],
                "fc1": {
                    **blocks["mlp"]["fc1"],
                    "w": fold(blocks["mlp"]["fc1"]["w"], lora["mlp"]["fc1"]),
                },
                "fc2": {
                    **blocks["mlp"]["fc2"],
                    "w": fold(blocks["mlp"]["fc2"]["w"], lora["mlp"]["fc2"]),
                },
            },
        },
    }
    proj = lora["attn"]["proj"]
    if not bool(jnp.any(proj["B"]).item() and jnp.any(proj["A"]).item()):
        return merged, None
    if scale != 1.0:
        proj = {"A": proj["A"], "B": proj["B"] * scale}
    return merged, {"attn": {"proj": proj}}


def stack_variant_pytrees(loras):
    """Stack V adapters for per-slot multi-variant serving.

    Input: a list of stacked LoRA pytrees (the `variant_state_dict`
    layout — leaves (L, r, in) / (L, out, r)). Output: the same structure
    with a VARIANT axis inserted after the layer axis — leaves
    (L, V+1, r_max, in) / (L, V+1, out, r_max) — where variant index 0 is
    an all-zeros base adapter (so `vid == 0` means "no adapter" in the
    serving pool) and narrower-rank adapters are zero-padded to the widest
    rank (zero rows contribute nothing to (x @ Aᵀ) @ Bᵀ).

    The (L, V, ...) ordering keeps the layer axis leading so the decode
    scan slices one layer's (V, ...) factor stack per step; the per-row
    gather by vid happens inside the step (engine/serving._lora_delta)."""
    if not loras:
        raise ValueError("stack_variant_pytrees needs at least one adapter")

    def pad_stack(pairs, rank_axis_a, rank_axis_b):
        rmax = max(int(p["A"].shape[rank_axis_a]) for p in pairs)

        def pad(x, axis):
            width = [(0, 0)] * x.ndim
            width[axis] = (0, rmax - x.shape[axis])
            return jnp.pad(x, width)

        a_list = [pad(p["A"], rank_axis_a) for p in pairs]
        b_list = [pad(p["B"], rank_axis_b) for p in pairs]
        A = jnp.stack([jnp.zeros_like(a_list[0])] + a_list, axis=1)
        B = jnp.stack([jnp.zeros_like(b_list[0])] + b_list, axis=1)
        return {"A": A, "B": B}

    return {
        grp: {
            site: pad_stack([l[grp][site] for l in loras], 1, 2)
            for site in sites
        }
        for grp, sites in (("attn", ("qkv", "proj")), ("mlp", ("fc1", "fc2")))
    }
