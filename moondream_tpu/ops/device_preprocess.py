"""Device-side overlap-crop preprocessing: PIL-BIT-EXACT Lanczos resize
as MXU matmuls.

The SURVEY build plan's north-star kernel (§7, item 3): instead of
resizing on the host (PIL / native C++) and shipping crops, ship the raw
image once and run the whole resize + tile-extraction on the TPU. A
separable Lanczos-3 resample is two small matrix contractions per pass,
which the MXU does in ~0.1ms — versus ~30ms of single-threaded host
resampling per image.

Numerics — exact uint8 equality with ``PIL.Image.resize(LANCZOS)``
(reference contract: /root/reference/moondream/torch/image_crops.py:124-150).
PIL's 8-bit resampler is NOT float math; it is fixed-point integer
arithmetic (Pillow Resample.c):

  * tap weights are computed in float64, clipped to the image, normalized
    over the in-range window, then rounded half-away-from-zero to int32
    with PRECISION_BITS = 22 fractional bits;
  * a HORIZONTAL pass runs first over uint8 pixels with an int32
    accumulator seeded with the rounding constant 2**21, producing a
    uint8 intermediate via ``clip8``: clamp(acc >> 22, 0, 255);
  * a VERTICAL pass repeats that arithmetic on the uint8 intermediate.

We reproduce that arithmetic exactly on the MXU:

  * the int32 tap matrix (host-computed in PIL's float64 evaluation
    order, ``_pil_coeffs``) is decomposed into THREE signed 8-bit digit
    planes (magnitude digits at 2**16 / 2**8 / 2**0, sign applied per
    digit);
  * pixels (<=255) and digits (|d|<=255) are both exactly representable
    in bfloat16, so one bf16 x bf16 -> f32 matmul per plane computes
    exact integer products, and f32 accumulation of integer partials
    below 2**24 is exact (guarded: ``_EXACT_MAX_TAPS``);
  * the three exact f32 partial sums are recombined in int32
    (p2 << 16) + (p1 << 8) + p0 — the same 32-bit arithmetic (and
    overflow contract) as PIL's accumulator — then shifted and clamped
    exactly like ``clip8``.

The result is uint8-identical to the host PIL/C++ path (asserted across
a shape corpus in tests/test_device_preprocess.py), so this path is
DEFAULT-ON and parity-legal; set MOONDREAM_DEVICE_PREPROCESS=0 to force
host-side preprocessing.

Layout: CHANNEL-PLANAR. Round 1 ran the contractions channel-last
((H, W, 3) with C on the 128-lane axis — 3/128 lanes used), measuring
456ms vs the 336ms host path. Planar (3, H, W) puts full H/W extents on
the MXU sublane/lane axes; the crop stack transposes back once at the
end. Tap matrices are cached per (in, out) size; the jitted pipeline per
(image shape, tiling).
"""

from __future__ import annotations

import math
import os
from functools import lru_cache
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .image_crops import select_tiling


_FALSY = ("0", "", "false", "off", "no", "n")
_TRUTHY = ("1", "true", "on", "yes", "y")


def mode() -> str:
    """MOONDREAM_DEVICE_PREPROCESS parsing: 'off' (host path), 'adaptive'
    (default: device path once the shape's crop graph is compiled, host +
    background warm for shapes not yet seen — a fresh (H, W, tiling)
    costs a one-off compile that would otherwise stall a varied-resolution
    stream), or 'eager' (always device, compile inline — fixed-shape
    benches/tests). Unrecognized values raise so a typo'd opt-out never
    silently stays on."""
    raw = os.environ.get("MOONDREAM_DEVICE_PREPROCESS", "1").lower()
    if raw in _FALSY:
        return "off"
    if raw in _TRUTHY or raw == "adaptive":
        return "adaptive"
    if raw == "eager":
        return "eager"
    raise ValueError(
        f"MOONDREAM_DEVICE_PREPROCESS={raw!r} not understood: use one of "
        "0/off/no (host), 1/on/yes/adaptive (default), or eager"
    )


def enabled() -> bool:
    """Device preprocessing is DEFAULT-ON (it is uint8-bit-exact with the
    host PIL/C++ path); MOONDREAM_DEVICE_PREPROCESS=0 forces host."""
    return mode() != "off"

_SUPPORT = 3.0
PRECISION_BITS = 22  # Pillow 8bpc fixed point: 32 - 8 - 2

# f32 accumulation of 8-bit x 8-bit integer products stays exact while
# taps * 255 * 255 < 2**24  ->  taps <= 258. Lanczos-3 tap count is
# 2*ceil(3*scale)+1, so any practical downscale (scale < 42, e.g. an
# 8K input) is covered; beyond that the caller must pre-shrink on host.
_EXACT_MAX_TAPS = 258


def _lanczos_f64(x: float) -> float:
    """Pillow's lanczos_filter/sinc_filter, float64 op-for-op
    (Resample.c): sin is evaluated at x*pi and (x/3)*pi in that order so
    the doubles round identically."""
    if -_SUPPORT <= x < _SUPPORT:
        if x == 0.0:
            return 1.0
        a = x * math.pi
        b = (x / _SUPPORT) * math.pi
        return (math.sin(a) / a) * (math.sin(b) / b)
    return 0.0


@lru_cache(maxsize=64)
def _pil_coeffs(in_size: int, out_size: int) -> np.ndarray:
    """(out_size, in_size) int32 fixed-point tap matrix, exactly as
    Pillow computes it (precompute_coeffs + normalize_coeffs_8bpc):
    float64 taps over the clipped window, sequential-order normalization
    sum, then round-half-away-from-zero to 22-bit fixed point."""
    scale = in_size / out_size
    filterscale = max(scale, 1.0)
    support = _SUPPORT * filterscale
    ss = 1.0 / filterscale
    if 2 * math.ceil(support) + 1 > _EXACT_MAX_TAPS:
        raise ValueError(
            f"resize {in_size}->{out_size} needs more taps than the "
            "exact-f32 device path guarantees; pre-shrink on host"
        )
    m = np.zeros((out_size, in_size), np.int32)
    for xx in range(out_size):
        center = (xx + 0.5) * scale
        xmin = int(center - support + 0.5)  # C cast: trunc toward zero
        if xmin < 0:
            xmin = 0
        xmax = int(center + support + 0.5)
        if xmax > in_size:
            xmax = in_size
        n = xmax - xmin
        w = [0.0] * n
        ww = 0.0
        for x in range(n):  # sequential sum, like Pillow's `ww += w`
            v = _lanczos_f64((x + xmin - center + 0.5) * ss)
            w[x] = v
            ww += v
        for x in range(n):
            c = w[x] / ww if ww != 0.0 else w[x]
            scaled = c * (1 << PRECISION_BITS)
            m[xx, xmin + x] = int(
                scaled + 0.5 if scaled >= 0 else scaled - 0.5
            )
    return m


@lru_cache(maxsize=64)
def _digit_planes(in_size: int, out_size: int) -> np.ndarray:
    """(3, out_size, in_size) float32 signed 8-bit digit planes of the
    int32 tap matrix: planes[0]*2**16 + planes[1]*2**8 + planes[2]
    reconstructs it exactly. Every digit is in [-255, 255], so it is
    bfloat16-exact."""
    k = _pil_coeffs(in_size, out_size)
    sign = np.sign(k).astype(np.int64)
    a = np.abs(k).astype(np.int64)
    return np.stack([
        ((a >> 16) & 255) * sign,
        ((a >> 8) & 255) * sign,
        (a & 255) * sign,
    ]).astype(np.float32)


def _clip8(acc: jax.Array) -> jax.Array:
    """Pillow's clip8 on an int32 accumulator that already contains the
    2**21 rounding constant: 0 below, 255 at/above 2**30, else
    acc >> 22. Returns float32 holding exact uint8 values."""
    shifted = jax.lax.shift_right_arithmetic(
        acc, jnp.int32(PRECISION_BITS)
    )
    out = jnp.where(
        acc <= 0, 0, jnp.where(acc >= (1 << 30), 255, shifted)
    )
    return out.astype(jnp.float32)


def _combine_i32(p: jax.Array) -> jax.Array:
    """Three exact f32 digit partial sums (leading axis) -> Pillow's
    int32 accumulator + rounding constant."""
    p2 = p[0].astype(jnp.int32)
    p1 = p[1].astype(jnp.int32)
    p0 = p[2].astype(jnp.int32)
    return (
        jax.lax.shift_left(p2, jnp.int32(16))
        + jax.lax.shift_left(p1, jnp.int32(8))
        + p0
        + jnp.int32(1 << (PRECISION_BITS - 1))
    )


def _resize_dev_planar(x_chw: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """x: (C, H, W) float32 holding exact uint8 values ->
    (C, out_h, out_w) float32 holding exact uint8 values, bit-identical
    to PIL.Image.resize(..., LANCZOS) on the same pixels.

    Pillow's pass order: HORIZONTAL first (uint8 intermediate at
    (C, H, out_w)), then VERTICAL; a pass whose size doesn't change is
    skipped entirely (no fixed-point round-trip on that axis)."""
    _, h, w = x_chw.shape
    if w != out_w:
        cw = jnp.asarray(_digit_planes(w, out_w))  # (3, out_w, W)
        p = jnp.einsum(
            "kpw,chw->kchp",
            cw.astype(jnp.bfloat16),
            x_chw.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        x_chw = _clip8(_combine_i32(p))
    if h != out_h:
        rh = jnp.asarray(_digit_planes(h, out_h))  # (3, out_h, H)
        p = jnp.einsum(
            "koh,chw->kcow",
            rh.astype(jnp.bfloat16),
            x_chw.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        x_chw = _clip8(_combine_i32(p))
    return x_chw


def exact_path_supported(h: int, w: int, base_size: int = 378) -> bool:
    """True when every resize the crop pipeline needs stays inside the
    exact-f32 tap guarantee (the global crop's downscale is the binding
    constraint — the grid target is never smaller than base_size)."""
    scale = max(h, w) / base_size
    return 2 * math.ceil(_SUPPORT * max(scale, 1.0)) + 1 <= _EXACT_MAX_TAPS


def device_resize(image_u8: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """(H, W, C) uint8 on device -> (out_h, out_w, C) uint8, exactly
    PIL.Image.resize((out_w, out_h), LANCZOS). Call under jit."""
    x = image_u8.astype(jnp.float32).transpose(2, 0, 1)
    y = _resize_dev_planar(x, out_h, out_w)
    return y.transpose(1, 2, 0).astype(jnp.uint8)


def device_overlap_crops(
    image_u8: jax.Array,
    tiling: Tuple[int, int],
    base_size: int = 378,
    patch_size: int = 14,
    overlap_margin: int = 4,
) -> jax.Array:
    """(H, W, 3) uint8 on device -> (rows*cols + 1, base, base, 3) uint8
    crops — bit-identical to ops.image_crops.overlap_crop_image's
    PIL/native output, same geometry. Call under jit with static tiling
    (use select_tiling on the host)."""
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
    # one transpose back to the encoder's channel-last layout at the end;
    # uint8 keeps the ViT entry signature identical to host crops (one jit
    # trace either way) and the crop stack 4x smaller in HBM
    return jnp.stack(crops).transpose(0, 2, 3, 1).astype(jnp.uint8)


def device_overlap_crops_batched(
    images_u8: jax.Array,
    tiling: Tuple[int, int],
    base_size: int = 378,
    patch_size: int = 14,
    overlap_margin: int = 4,
) -> jax.Array:
    """(B, H, W, 3) uint8 same-shape images -> (B * (rows*cols+1), base,
    base, 3) uint8 crops, image-major — the concatenation the batched ViT
    paths (encode_images, BatchPipeline) feed per tiling group."""
    crops = jax.vmap(
        lambda im: device_overlap_crops(
            im, tiling, base_size, patch_size, overlap_margin
        )
    )(images_u8)
    return crops.reshape(-1, *crops.shape[2:])


def preprocess_tiling(h: int, w: int, crop_size: int, patch_size: int,
                      overlap_margin: int, max_crops: int) -> Tuple[int, int]:
    """Host-side tiling decision matching overlap_crop_image's geometry."""
    margin_px = patch_size * overlap_margin
    window = (crop_size // patch_size - 2 * overlap_margin) * patch_size
    return select_tiling(h - 2 * margin_px, w - 2 * margin_px, window, max_crops)
