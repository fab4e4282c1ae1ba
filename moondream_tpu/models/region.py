"""Region (grounding) heads: Fourier-feature coordinate/size codecs.

Behavioral parity with /root/reference/moondream/torch/region.py:12-136.
Coordinates are single normalized floats encoded through sin/cos Fourier
features into text-width embeddings; decoders map hidden states to 1024-bin
distributions (linear bins for coordinates, log2-scale bins for sizes:
bin = (log2(size) + 10) / 10 * 1023, reference region.py:74-93).
"""

from __future__ import annotations

from typing import List, Tuple, Union

import jax
import jax.numpy as jnp

from ..config import RegionConfig
from ..ops.layers import linear, mlp

SpatialRefs = List[Union[Tuple[float, float], Tuple[float, float, float, float]]]


def fourier_features(x: jax.Array, freqs: jax.Array) -> jax.Array:
    """x: (..., d_in) @ freqs: (d_in, n_freq) -> (..., 2*n_freq) cos/sin feats
    (reference region.py:12-29). fp32 trig for accuracy, cast back."""
    f = 2 * jnp.pi * jnp.dot(
        x.astype(jnp.float32), freqs.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    return jnp.concatenate([jnp.cos(f), jnp.sin(f)], axis=-1).astype(x.dtype)


def encode_coordinate(coord: jax.Array, w: dict) -> jax.Array:
    """(..., 1) float -> (..., dim) embedding (reference region.py:32-43)."""
    return linear(fourier_features(coord, w["coord_features"]), w["coord_encoder"])


def decode_coordinate(hidden: jax.Array, w: dict) -> jax.Array:
    """(..., dim) -> (..., 1024) coordinate-bin logits (region.py:46-57)."""
    return mlp(hidden, w["coord_decoder"])


def encode_size(size: jax.Array, w: dict) -> jax.Array:
    """(..., 2) (w, h) -> (..., dim) embedding (region.py:60-71)."""
    return linear(fourier_features(size, w["size_features"]), w["size_encoder"])


def decode_size(hidden: jax.Array, w: dict) -> jax.Array:
    """(dim,) -> (2, 1024) log-scale size-bin logits (region.py:74-93)."""
    return mlp(hidden, w["size_decoder"]).reshape(2, -1)


def encode_spatial_refs(spatial_refs: SpatialRefs, w: dict) -> dict:
    """Encode prompt-side points/boxes into embeddings (region.py:96-136).

    Boxes become (center, size); points contribute two coordinate embeddings.
    Returns {"coords": (N, dim), "sizes": (M, dim) | None}.
    """
    coords, sizes = [], []
    for ref in spatial_refs:
        if len(ref) == 2:
            coords.extend([ref[0], ref[1]])
        else:
            coords.extend([(ref[0] + ref[2]) / 2, (ref[1] + ref[3]) / 2])
            sizes.append([ref[2] - ref[0], ref[3] - ref[1]])

    dtype = w["coord_features"].dtype
    coord_arr = jnp.asarray(coords, dtype=dtype).reshape(-1, 1)
    out = {"coords": encode_coordinate(coord_arr, w), "sizes": None}
    if sizes:
        out["sizes"] = encode_size(jnp.asarray(sizes, dtype=dtype), w)
    return out


def size_bin_to_value(bin_idx: jax.Array) -> jax.Array:
    """Inverse of the log-scale size binning: 2^((bin/1023)*10 - 10)."""
    return jnp.exp2((bin_idx.astype(jnp.float32) / 1023.0) * 10.0 - 10.0)


def init_region_params(config: RegionConfig, key: jax.Array, dtype=jnp.bfloat16) -> dict:
    keys = iter(jax.random.split(key, 8))
    d = config.dim

    def lin(k, i, o):
        return {
            "w": (jax.random.normal(k, (i, o)) * (i**-0.5)).astype(dtype),
            "b": jnp.zeros((o,), dtype),
        }

    return {
        "coord_features": (
            jax.random.normal(next(keys), (1, config.coord_feat_dim // 2)) * 10.0
        ).astype(dtype),
        "coord_encoder": lin(next(keys), config.coord_feat_dim, d),
        "coord_decoder": {
            "fc1": lin(next(keys), d, config.inner_dim),
            "fc2": lin(next(keys), config.inner_dim, config.coord_out_dim),
        },
        "size_features": (
            jax.random.normal(next(keys), (2, config.size_feat_dim // 2)) * 10.0
        ).astype(dtype),
        "size_encoder": lin(next(keys), config.size_feat_dim, d),
        "size_decoder": {
            "fc1": lin(next(keys), d, config.inner_dim),
            "fc2": lin(next(keys), config.inner_dim, config.size_out_dim),
        },
    }
