"""Overlap-crop image tiling (host-side preprocessing).

Behavioral parity with the reference preprocessor
(/root/reference/moondream/torch/image_crops.py:17-231): a global crop resized
to 378x378 plus a grid of overlapping local crops whose non-overlapping
interiors stitch back into the full image. Geometry (margins, crop windows,
tiling selection) matches the reference exactly; the LANCZOS resize uses PIL,
matching the reference's non-pyvips branch (image_crops.py:137-150).

Feature-plane stitching (`reconstruct_from_crops`) is reimplemented as a
single vectorized gather so the whole stitch lowers to one XLA op per call
instead of a Python loop of dynamic-update-slices; the per-tile interior
selection semantics match image_crops.py:170-231.

When the in-repo native library (native/preprocess.cpp) is built, the whole
resize + tile-extraction pipeline runs in one multithreaded C++ call that is
bit-exact with the PIL path — the same structure as the reference's
pyvips-if-present-else-PIL switch (image_crops.py:124-150), but with the
native half shipped in-repo. Set MOONDREAM_NO_NATIVE=1 to force PIL.
"""

from __future__ import annotations

import math
from typing import Tuple, TypedDict

import numpy as np

from PIL import Image


def select_tiling(height: int, width: int, crop_size: int, max_crops: int) -> Tuple[int, int]:
    """Choose the (rows, cols) tile grid covering an image with <= max_crops
    tiles of `crop_size` usable pixels. Same decision procedure as reference
    image_crops.py:17-50."""
    if height <= crop_size or width <= crop_size:
        return (1, 1)

    min_h = math.ceil(height / crop_size)
    min_w = math.ceil(width / crop_size)

    if min_h * min_w > max_crops:
        # Infeasible: distribute proportionally under the budget.
        ratio = math.sqrt(max_crops / (min_h * min_w))
        return (
            max(1, math.floor(min_h * ratio)),
            max(1, math.floor(min_w * ratio)),
        )

    # Aspect-ratio-preserving allotment, raised to the feasibility minimum.
    h_tiles = max(math.floor(math.sqrt(max_crops * height / width)), min_h)
    w_tiles = max(math.floor(math.sqrt(max_crops * width / height)), min_w)

    if h_tiles * w_tiles > max_crops:
        if w_tiles > h_tiles:
            w_tiles = math.floor(max_crops / h_tiles)
        else:
            h_tiles = math.floor(max_crops / w_tiles)

    return (max(1, h_tiles), max(1, w_tiles))


class OverlapCropOutput(TypedDict):
    crops: np.ndarray  # (n_tiles + 1, base, base, C) uint8; index 0 = global
    tiling: Tuple[int, int]


def overlap_crop_image(
    image: np.ndarray,
    overlap_margin: int,
    max_crops: int,
    base_size: Tuple[int, int] = (378, 378),
    patch_size: int = 14,
) -> OverlapCropOutput:
    """Split an image into a global crop plus overlapping local crops.

    Each local crop covers `crop_window` = base - 2*margin usable pixels and
    overlaps its neighbours by `margin` pixels on each side, where margin is
    given in patch units (reference image_crops.py:58-167).
    """
    orig_h, orig_w = image.shape[:2]
    channels = image.shape[2]

    margin_px = patch_size * overlap_margin
    both_margins = 2 * margin_px
    patches_per_side = base_size[0] // patch_size
    window_px = (patches_per_side - 2 * overlap_margin) * patch_size

    tiling = select_tiling(orig_h - both_margins, orig_w - both_margins, window_px, max_crops)
    n_rows, n_cols = tiling

    if base_size[0] == base_size[1] and channels in (1, 3, 4):
        from . import native

        crops = native.overlap_crops(image, base_size[0], margin_px, tiling)
        if crops is not None:
            return {"crops": crops, "tiling": tiling}

    out = np.zeros(
        (n_rows * n_cols + 1, base_size[0], base_size[1], channels), dtype=np.uint8
    )

    # Resize so the tile grid plus margins covers the image exactly.
    target_h = n_rows * window_px + both_margins
    target_w = n_cols * window_px + both_margins

    pil = Image.fromarray(image)
    resized = np.asarray(
        pil.resize((target_w, target_h), resample=Image.Resampling.LANCZOS)
    )
    out[0] = np.asarray(
        pil.resize((base_size[1], base_size[0]), resample=Image.Resampling.LANCZOS)
    )

    for r in range(n_rows):
        for c in range(n_cols):
            y0 = r * window_px
            x0 = c * window_px
            tile = resized[y0 : y0 + base_size[0], x0 : x0 + base_size[1]]
            out[1 + r * n_cols + c, : tile.shape[0], : tile.shape[1]] = tile

    return {"crops": out, "tiling": tiling}


def reconstruct_from_crops(
    crops,
    tiling: Tuple[int, int],
    overlap_margin: int,
    patch_size: int = 14,
):
    """Stitch per-crop planes back into one seamless plane.

    Accepts a stacked array (n_tiles, H, W, C) — numpy or jax — or a sequence
    of (H, W, C) planes. Interior margins are dropped except at the outer
    border, mirroring reference image_crops.py:194-229. Implemented as one
    vectorized index gather: for every output pixel we compute which tile and
    which intra-tile offset owns it, then gather. This keeps the device path
    a single XLA gather regardless of tile count.
    """
    import jax.numpy as jnp

    stacked = crops if hasattr(crops, "shape") else np.stack(list(crops))
    is_jax = not isinstance(stacked, np.ndarray)
    xp = jnp if is_jax else np

    n_rows, n_cols = tiling
    tile_h, tile_w = int(stacked.shape[1]), int(stacked.shape[2])
    margin = overlap_margin * patch_size
    inner_h, inner_w = tile_h - 2 * margin, tile_w - 2 * margin
    out_h = inner_h * n_rows + 2 * margin
    out_w = inner_w * n_cols + 2 * margin

    def axis_index(out_len, inner, n_tiles, tile_len):
        # Owner tile for each output coordinate: coordinate y belongs to tile
        # floor((y - margin)/inner) clamped to [0, n_tiles); its intra-tile
        # offset is y - tile*inner. Border margins fall through to the first/
        # last tile, matching the reference's keep-outer-margin rule.
        pos = np.arange(out_len)
        tile = np.clip((pos - margin) // max(inner, 1), 0, n_tiles - 1)
        off = pos - tile * inner
        # Clamp (defensive; off is always within [0, tile_len) by construction)
        off = np.clip(off, 0, tile_len - 1)
        return tile, off

    tile_r, off_r = axis_index(out_h, inner_h, n_rows, tile_h)
    tile_c, off_c = axis_index(out_w, inner_w, n_cols, tile_w)

    tile_idx = tile_r[:, None] * n_cols + tile_c[None, :]
    if is_jax:
        tile_idx = jnp.asarray(tile_idx)
        off_r = jnp.asarray(off_r)
        off_c = jnp.asarray(off_c)
    return stacked[tile_idx, off_r[:, None], off_c[None, :]]
