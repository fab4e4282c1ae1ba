"""Checkpoint loading: safetensors / torch-pt -> JAX parameter pytrees.

Supports both checkpoint naming schemes the reference accepts
(/root/reference/moondream/torch/weights.py:30-153):

  * legacy:  ``vision_encoder.encoder.model.visual.*``,
             ``text_model.transformer.h.{i}.*``, ``region_model.*``
  * new:     ``vision.blocks.{i}.*``, ``text.blocks.{i}.*``, ``region.*``
             (optionally under a ``model.`` prefix, with ``._orig_mod``
             normalization)

plus int4 group-128 quantized checkpoints (``...weight.packed/scale/
zero_point``, reference layers.py:38-77), dequantized to bf16 at load time.

Conversion rules into the TPU layout:
  * torch nn.Linear weights are (out, in); ours are (in, out) -> transpose.
  * per-block weights are stacked along a leading layer axis for lax.scan.
  * region coord/size Fourier feature matrices are stored transposed in the
    checkpoint (reference weights.py:114-117).
"""

from __future__ import annotations

import re
from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from .config import MoondreamConfig
from .ops.rope import precompute_freqs_cis


def _to_numpy(t) -> np.ndarray:
    """torch.Tensor | np.ndarray -> np.ndarray (bf16-safe via float32)."""
    if isinstance(t, np.ndarray):
        return t
    # torch tensor
    t = t.detach().cpu()
    if str(t.dtype) == "torch.bfloat16":
        t = t.float()
    return t.numpy()


def dequantize_int4(
    packed: np.ndarray, scale: np.ndarray, zero_point: np.ndarray, out_shape
) -> np.ndarray:
    """Unpack int4 group-128 weights (reference layers.py:38-44).

    packed: (N/256, 128) uint8, two nibbles per byte — high nibbles are the
    first half of each 256-element strip, low nibbles the second.
    scale/zero_point: (N/128, 1). Returns fp32 array of `out_shape`.
    """
    step = packed.shape[0]
    w = np.empty((2 * step, packed.shape[1]), dtype=np.float32)
    w[:step] = (packed >> 4).astype(np.float32)
    w[step:] = (packed & 0x0F).astype(np.float32)
    w = (w - zero_point.astype(np.float32)) * scale.astype(np.float32)
    return w.reshape(out_shape)


_LEGACY_VISION = "vision_encoder.encoder.model.visual"


def _legacy_to_new(key: str) -> Optional[str]:
    """Map a legacy checkpoint key to new-scheme naming
    (inverse of reference weights.py:36-109)."""
    k = key
    if k.startswith(_LEGACY_VISION):
        k = k[len(_LEGACY_VISION) + 1 :]
        if k.startswith("patch_embed.linear."):
            return "vision.patch_emb." + k.split(".")[-1]
        if k == "pos_embed":
            return "vision.pos_emb"
        if k.startswith("norm."):
            return "vision.post_ln." + k.split(".")[-1]
        m = re.match(r"blocks\.(\d+)\.(.*)", k)
        if m:
            i, rest = m.group(1), m.group(2)
            rest = (
                rest.replace("norm1.", "ln1.")
                .replace("norm2.", "ln2.")
            )
            return f"vision.blocks.{i}.{rest}"
        return None
    if key.startswith("vision_encoder.projection.mlp."):
        return "vision.proj_mlp." + key[len("vision_encoder.projection.mlp.") :]
    if key == "text_model.transformer.embd.wte.weight":
        return "text.wte"
    if key.startswith("text_model.lm_head.ln."):
        return "text.post_ln." + key.split(".")[-1]
    if key.startswith("text_model.lm_head.linear."):
        return "text.lm_head." + key.split(".")[-1]
    m = re.match(r"text_model\.transformer\.h\.(\d+)\.(.*)", key)
    if m:
        i, rest = m.group(1), m.group(2)
        rest = (
            rest.replace("mixer.Wqkv", "attn.qkv")
            .replace("mixer.out_proj", "attn.proj")
            .replace("mixer", "attn")
        )
        return f"text.blocks.{i}.{rest}"
    if key.startswith("region_model."):
        rest = key[len("region_model.") :]
        rest = rest.replace("coordinate_encoder", "coord_encoder").replace(
            "coordinate_decoder", "coord_decoder"
        ).replace("coordinate_features", "coord_features")
        return "region." + rest
    return None


def _normalize_keys(flat: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Strip model./._orig_mod and map legacy names to the new scheme."""
    any_new = any(
        k.replace("model.", "", 1).startswith(("vision.blocks", "text.blocks"))
        for k in flat
    )
    out = {}
    for k, v in flat.items():
        k = k.replace("._orig_mod", "")
        if k.startswith("model."):
            k = k[len("model.") :]
        if not any_new:
            mapped = _legacy_to_new(k)
            if mapped is None:
                continue
            k = mapped
        out[k] = v
    return out


def _dequantize_flat(flat: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Replace {base}.weight.packed/scale/zero_point triples with a dense
    {base}.weight, inferring the dense shape from (bias, peer weights)."""
    packed_bases = sorted(
        k[: -len(".weight.packed")] for k in flat if k.endswith(".weight.packed")
    )
    if not packed_bases:
        return flat

    out = {k: v for k, v in flat.items() if ".weight.packed" not in k
           and ".weight.scale" not in k and ".weight.zero_point" not in k}
    for base in packed_bases:
        packed = flat[base + ".weight.packed"]
        scale = flat[base + ".weight.scale"]
        zero = flat[base + ".weight.zero_point"]
        n_elems = packed.size * 2
        bias = flat.get(base + ".bias")
        if bias is None:
            raise ValueError(f"cannot infer dense shape for {base}")
        out_features = bias.shape[0]
        in_features = n_elems // out_features
        out[base + ".weight"] = dequantize_int4(
            packed, scale, zero, (out_features, in_features)
        )
    return out


def _lin(flat: Dict[str, np.ndarray], base: str, dtype) -> dict:
    w = jnp.asarray(_to_numpy(flat[base + ".weight"]).T, dtype=dtype)
    b = flat.get(base + ".bias")
    return {"w": w, "b": jnp.asarray(_to_numpy(b), dtype=dtype) if b is not None else None}


def _ln(flat: Dict[str, np.ndarray], base: str, dtype) -> dict:
    return {
        "weight": jnp.asarray(_to_numpy(flat[base + ".weight"]), dtype=dtype),
        "bias": jnp.asarray(_to_numpy(flat[base + ".bias"]), dtype=dtype),
    }


def _stack(trees: list) -> dict:
    """Stack a list of identically-shaped pytrees along a new leading axis."""
    import jax

    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *trees)


def vision_params_from_flat(flat, config, dtype=jnp.bfloat16) -> dict:
    """Vision pytree from new-scheme flat keys. config: VisionConfig."""
    vision_blocks = [
        {
            "ln1": _ln(flat, f"vision.blocks.{i}.ln1", dtype),
            "attn": {
                "qkv": _lin(flat, f"vision.blocks.{i}.attn.qkv", dtype),
                "proj": _lin(flat, f"vision.blocks.{i}.attn.proj", dtype),
            },
            "ln2": _ln(flat, f"vision.blocks.{i}.ln2", dtype),
            "mlp": {
                "fc1": _lin(flat, f"vision.blocks.{i}.mlp.fc1", dtype),
                "fc2": _lin(flat, f"vision.blocks.{i}.mlp.fc2", dtype),
            },
        }
        for i in range(config.enc_n_layers)
    ]
    return {
        "patch_emb": _lin(flat, "vision.patch_emb", dtype),
        "pos_emb": jnp.asarray(_to_numpy(flat["vision.pos_emb"]), dtype=dtype),
        "blocks": _stack(vision_blocks),
        "post_ln": _ln(flat, "vision.post_ln", dtype),
        "proj_mlp": {
            "fc1": _lin(flat, "vision.proj_mlp.fc1", dtype),
            "fc2": _lin(flat, "vision.proj_mlp.fc2", dtype),
        },
    }


def text_params_from_flat(flat, config, dtype=jnp.bfloat16) -> dict:
    """Text pytree from new-scheme flat keys. config: TextConfig."""
    text_blocks = [
        {
            "ln": _ln(flat, f"text.blocks.{i}.ln", dtype),
            "attn": {
                "qkv": _lin(flat, f"text.blocks.{i}.attn.qkv", dtype),
                "proj": _lin(flat, f"text.blocks.{i}.attn.proj", dtype),
            },
            "mlp": {
                "fc1": _lin(flat, f"text.blocks.{i}.mlp.fc1", dtype),
                "fc2": _lin(flat, f"text.blocks.{i}.mlp.fc2", dtype),
            },
        }
        for i in range(config.n_layers)
    ]
    return {
        "wte": jnp.asarray(_to_numpy(flat["text.wte"]), dtype=dtype),
        "blocks": _stack(text_blocks),
        "post_ln": _ln(flat, "text.post_ln", dtype),
        "lm_head": _lin(flat, "text.lm_head", dtype),
        "freqs_cis": precompute_freqs_cis(config.rope_dim, config.max_context),
    }


def region_params_from_flat(flat, config, dtype=jnp.bfloat16) -> dict:
    """Region pytree from new-scheme flat keys. config: RegionConfig."""
    # Fourier feature matrices: checkpoint stores (n_freq, d_in); runtime
    # layout is (d_in, n_freq) (reference weights.py:114-117 transposes too).
    def feat(key):
        arr = _to_numpy(flat[key])
        if key.endswith(".weight") or arr.shape[0] > arr.shape[-1]:
            arr = arr.T
        return jnp.asarray(arr, dtype=dtype)

    coord_feat_key = (
        "region.coord_features.weight"
        if "region.coord_features.weight" in flat
        else "region.coord_features"
    )
    size_feat_key = (
        "region.size_features.weight"
        if "region.size_features.weight" in flat
        else "region.size_features"
    )
    return {
        "coord_features": feat(coord_feat_key),
        "coord_encoder": _lin(flat, "region.coord_encoder", dtype),
        "coord_decoder": {
            "fc1": _lin(flat, "region.coord_decoder.fc1", dtype),
            "fc2": _lin(flat, "region.coord_decoder.fc2", dtype),
        },
        "size_features": feat(size_feat_key),
        "size_encoder": _lin(flat, "region.size_encoder", dtype),
        "size_decoder": {
            "fc1": _lin(flat, "region.size_decoder.fc1", dtype),
            "fc2": _lin(flat, "region.size_decoder.fc2", dtype),
        },
    }


def params_from_flat(
    flat: Dict[str, np.ndarray], config: MoondreamConfig, dtype=jnp.bfloat16
) -> dict:
    """Build the full {vision, text, region} parameter pytree from a flat
    name->array dict in either checkpoint naming scheme."""
    flat = _normalize_keys(dict(flat))
    flat = _dequantize_flat(flat)
    return {
        "vision": vision_params_from_flat(flat, config.vision, dtype),
        "text": text_params_from_flat(flat, config.text, dtype),
        "region": region_params_from_flat(flat, config.region, dtype),
    }


def load_safetensors_flat(path: str) -> Dict[str, np.ndarray]:
    """Read every tensor in a safetensors file as numpy (framework-agnostic)."""
    from safetensors import safe_open

    flat = {}
    with safe_open(path, framework="np") as f:
        for k in f.keys():
            try:
                flat[k] = f.get_tensor(k)
            except Exception:
                # bf16 tensors are not directly expressible in numpy<2 —
                # fall back through torch.
                flat[k] = None
    if any(v is None for v in flat.values()):
        import torch
        from safetensors import safe_open as so

        with so(path, framework="pt") as f:
            for k in list(flat):
                if flat[k] is None:
                    flat[k] = _to_numpy(f.get_tensor(k))
    return flat


def load_params(
    path: str,
    config: MoondreamConfig,
    dtype=jnp.bfloat16,
    runtime_int4: bool = False,
    runtime_int8: bool = False,
) -> dict:
    """Load a .safetensors or torch .pt/.bin checkpoint into the parameter
    pytree (reference entry point: weights.py:156-171).

    runtime_int4=True re-quantizes the text block weights into the packed
    int4 runtime format served by the fused dequant-matmul kernel
    (ops.quant) — 4x less decode weight traffic; vision/region/embeddings
    stay bf16. Works for both bf16 and int4-quantized checkpoints (the
    latter round-trip through the load-time dequant).

    runtime_int8=True instead re-quantizes the text block weights to the
    int8 w8a8 format (models.text.quantize_text_params_int8): 2x less
    weight traffic with native-MXU int8 matmuls at any batch — the
    large-M (speculative verify / prefill) counterpart to int4's
    small-M decode kernel."""
    if path.endswith(".safetensors"):
        flat = load_safetensors_flat(path)
    else:
        import torch

        state = torch.load(path, map_location="cpu", weights_only=True)
        flat = {k: _to_numpy(v) for k, v in state.items()}
    params = params_from_flat(flat, config, dtype)
    if runtime_int4 and runtime_int8:
        raise ValueError("runtime_int4 and runtime_int8 are exclusive")
    if runtime_int4:
        from .models.text import quantize_text_params

        params = {**params, "text": quantize_text_params(params["text"])}
    elif runtime_int8:
        from .models.text import quantize_text_params_int8

        params = {**params, "text": quantize_text_params_int8(params["text"])}
    return params
