"""Device-side overlap-crop preprocessing: Lanczos resize as two matmuls.

The SURVEY build plan's north-star kernel (§7, item 3): instead of
resizing on the host (PIL / native C++) and shipping crops, ship the raw
image once and run the whole resize + tile-extraction on the TPU. A
separable Lanczos-3 resample is exactly two small matrix products
    out = R @ X @ C      R: (out_h, in_h), C: (in_w, out_w)
which the MXU does in ~0.1ms — versus ~30ms of single-threaded host
resampling per image.

Numerics: continuous float Lanczos taps (same tap positions/normalization
as PIL's resampler but without PIL's uint8-quantized intermediate pass
and fixed-point rounding), so outputs differ from the PIL path by a few
8-bit LSBs. This is an opt-in path (MOONDREAM_DEVICE_PREPROCESS=1); the
bit-exact host path stays the default for reference parity.

Layout: CHANNEL-PLANAR. Round 1 ran the tensordots channel-last
((H, W, 3) with C on the 128-lane axis — 3/128 lanes used), measuring
456ms vs the 336ms host path. The rewrite transposes once to (3, H, W)
so both resize contractions run as C-batched (out, in) @ (in, W) matmuls
with the full W/H on the lane axis, then transposes the 5.6MB crop stack
back once. The resize matrices are cached per (in, out) size; the jitted
pipeline per (image shape, tiling).
"""

from __future__ import annotations

from functools import lru_cache
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .image_crops import select_tiling

_SUPPORT = 3.0


def _lanczos(x: np.ndarray) -> np.ndarray:
    out = np.sinc(x) * np.sinc(x / _SUPPORT)
    out[np.abs(x) >= _SUPPORT] = 0.0
    return out


@lru_cache(maxsize=64)
def lanczos_matrix(in_size: int, out_size: int) -> np.ndarray:
    """(out_size, in_size) float32 resampling matrix with PIL's tap
    geometry (anti-aliased when downscaling) and row normalization."""
    scale = in_size / out_size
    fscale = max(scale, 1.0)
    support = _SUPPORT * fscale
    centers = (np.arange(out_size) + 0.5) * scale  # (out,)
    lo = np.floor(centers - support + 0.5).astype(np.int64)
    idx = lo[:, None] + np.arange(int(np.ceil(support)) * 2 + 1)[None, :]
    w = _lanczos((idx + 0.5 - centers[:, None]) / fscale)
    # PIL clips the tap window to the image and normalizes over the
    # in-range taps
    w[(idx < 0) | (idx >= in_size)] = 0.0
    idx_c = np.clip(idx, 0, in_size - 1)
    m = np.zeros((out_size, in_size), np.float32)
    np.add.at(
        m,
        (np.repeat(np.arange(out_size), idx.shape[1]), idx_c.ravel()),
        w.ravel(),
    )
    m /= m.sum(axis=1, keepdims=True)
    return m


def _resize_dev_planar(x_chw: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """x: (C, H, W) float32 -> (C, out_h, out_w) via two C-batched matmuls
    (H and W ride the MXU sublane/lane axes; C is the tiny batch dim)."""
    _, h, w = x_chw.shape
    r = jnp.asarray(lanczos_matrix(h, out_h))  # (out_h, H)
    c = jnp.asarray(lanczos_matrix(w, out_w))  # (out_w, W)
    y = jnp.einsum(
        "oh,chw->cow", r, x_chw, preferred_element_type=jnp.float32
    )
    return jnp.einsum(
        "pw,cow->cop", c, y, preferred_element_type=jnp.float32
    )


def device_overlap_crops(
    image_u8: jax.Array,
    tiling: Tuple[int, int],
    base_size: int = 378,
    patch_size: int = 14,
    overlap_margin: int = 4,
) -> jax.Array:
    """(H, W, 3) uint8 on device -> (rows*cols + 1, base, base, 3) float32
    crops in [0, 255], same geometry as ops.image_crops.overlap_crop_image.
    Call under jit with static tiling (use select_tiling on the host)."""
    n_rows, n_cols = tiling
    margin_px = patch_size * overlap_margin
    window = base_size - 2 * margin_px
    target_h = n_rows * window + 2 * margin_px
    target_w = n_cols * window + 2 * margin_px

    x = image_u8.astype(jnp.float32).transpose(2, 0, 1)  # planar (3, H, W)
    global_crop = _resize_dev_planar(x, base_size, base_size)
    grid = _resize_dev_planar(x, target_h, target_w)

    crops = [global_crop]
    for r in range(n_rows):
        for c in range(n_cols):
            y0, x0 = r * window, c * window
            crops.append(
                jax.lax.dynamic_slice(
                    grid, (0, y0, x0), (3, base_size, base_size)
                )
            )
    # one transpose back to the encoder's channel-last layout at the end
    return jnp.clip(jnp.stack(crops), 0.0, 255.0).transpose(0, 2, 3, 1)


def preprocess_tiling(h: int, w: int, crop_size: int, patch_size: int,
                      overlap_margin: int, max_crops: int) -> Tuple[int, int]:
    """Host-side tiling decision matching overlap_crop_image's geometry."""
    margin_px = patch_size * overlap_margin
    window = (crop_size // patch_size - 2 * overlap_margin) * patch_size
    return select_tiling(h - 2 * margin_px, w - 2 * margin_px, window, max_crops)
