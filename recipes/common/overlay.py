"""Frame annotation: boxes, censor styles, hitmarkers, gaze lines.

Covers the drawing surface of the reference recipes
(recipes/promptable-video-redaction/main.py:250-425 "censor/bounding-box/
hitmarker" styles; recipes/gaze-detection-video/gaze-detection-video.py:91-198
matplotlib overlay) in plain cv2/numpy — no per-frame matplotlib figure
round-trip, which dominated the reference's drawing cost.

All boxes/points are normalized [0,1]; frames are RGB uint8 HxWx3.
"""

from __future__ import annotations

from typing import Iterable, List, Optional, Sequence, Tuple

import numpy as np

from .tiling import Box

# distinct, high-contrast color cycle (RGB)
_PALETTE = [
    (231, 76, 60),
    (46, 204, 113),
    (52, 152, 219),
    (241, 196, 15),
    (155, 89, 182),
    (26, 188, 156),
    (230, 126, 34),
    (236, 240, 241),
]


def color_cycle(i: int) -> Tuple[int, int, int]:
    return _PALETTE[i % len(_PALETTE)]


def _cv2():
    import cv2

    return cv2


def _to_px(box: Box, shape) -> Tuple[int, int, int, int]:
    h, w = shape[:2]
    x0 = int(np.clip(box[0], 0, 1) * w)
    y0 = int(np.clip(box[1], 0, 1) * h)
    x1 = int(np.clip(box[2], 0, 1) * w)
    y1 = int(np.clip(box[3], 0, 1) * h)
    return x0, y0, x1, y1


def draw_boxes(
    frame: np.ndarray,
    boxes: Sequence[Box],
    labels: Optional[Sequence[str]] = None,
    colors: Optional[Sequence[Tuple[int, int, int]]] = None,
    thickness: int = 2,
) -> np.ndarray:
    cv2 = _cv2()
    out = frame.copy()
    for i, box in enumerate(boxes):
        color = colors[i] if colors else color_cycle(i)
        x0, y0, x1, y1 = _to_px(box, out.shape)
        cv2.rectangle(out, (x0, y0), (x1, y1), color, thickness)
        if labels and labels[i]:
            (tw, th), _ = cv2.getTextSize(
                labels[i], cv2.FONT_HERSHEY_SIMPLEX, 0.5, 1
            )
            ty = y0 - 4 if y0 - th - 6 >= 0 else y1 + th + 4
            cv2.rectangle(
                out, (x0, ty - th - 2), (x0 + tw + 4, ty + 2), color, -1
            )
            cv2.putText(
                out, labels[i], (x0 + 2, ty),
                cv2.FONT_HERSHEY_SIMPLEX, 0.5, (0, 0, 0), 1, cv2.LINE_AA,
            )
    return out


def pixelate_regions(
    frame: np.ndarray, boxes: Sequence[Box], block: int = 16, pad: float = 0.02
) -> np.ndarray:
    """Censor style: mosaic-pixelate each box region (reference draws an
    opaque black rectangle; pixelation preserves scene context)."""
    out = frame.copy()
    h, w = out.shape[:2]
    for box in boxes:
        x0, y0, x1, y1 = _to_px(
            (box[0] - pad, box[1] - pad, box[2] + pad, box[3] + pad), out.shape
        )
        x0, y0 = max(0, x0), max(0, y0)
        x1, y1 = min(w, x1), min(h, y1)
        if x1 <= x0 or y1 <= y0:
            continue
        region = out[y0:y1, x0:x1]
        rh, rw = region.shape[:2]
        bh, bw = max(1, rh // block), max(1, rw // block)
        small = region[:: max(1, rh // bh), :: max(1, rw // bw)][:bh, :bw]
        out[y0:y1, x0:x1] = np.repeat(
            np.repeat(small, -(-rh // bh), axis=0)[:rh],
            -(-rw // bw), axis=1,
        )[:, :rw]
    return out


def blackout_regions(
    frame: np.ndarray, boxes: Sequence[Box], pad: float = 0.01
) -> np.ndarray:
    """Censor style: opaque fill (the reference's default censor)."""
    out = frame.copy()
    for box in boxes:
        x0, y0, x1, y1 = _to_px(
            (box[0] - pad, box[1] - pad, box[2] + pad, box[3] + pad), out.shape
        )
        out[max(0, y0) : y1, max(0, x0) : x1] = 0
    return out


def draw_hitmarker(
    frame: np.ndarray,
    points: Sequence[Tuple[float, float]],
    size: int = 14,
    color: Tuple[int, int, int] = (255, 255, 255),
) -> np.ndarray:
    """FPS-style corner cross at each point (reference main.py:250-348)."""
    cv2 = _cv2()
    out = frame.copy()
    h, w = out.shape[:2]
    gap = size // 3
    for px, py in points:
        cx, cy = int(px * w), int(py * h)
        for dx, dy in ((-1, -1), (1, -1), (-1, 1), (1, 1)):
            cv2.line(
                out,
                (cx + dx * gap, cy + dy * gap),
                (cx + dx * size, cy + dy * size),
                color, 2, cv2.LINE_AA,
            )
    return out


def _clip_region(box: Box, shape, pad: float = 0.0):
    """Padded, clipped pixel window for a normalized box; None if empty."""
    h, w = shape[:2]
    x0, y0, x1, y1 = _to_px(
        (box[0] - pad, box[1] - pad, box[2] + pad, box[3] + pad), shape
    )
    x0, y0 = max(0, x0), max(0, y0)
    x1, y1 = min(w, x1), min(h, y1)
    if x1 <= x0 or y1 <= y0:
        return None
    return x0, y0, x1, y1


def _odd(k: int) -> int:
    return max(3, k | 1)


def blur_regions(
    frame: np.ndarray,
    boxes: Sequence[Box],
    strength: float = 1.0,
    pad: float = 0.02,
) -> np.ndarray:
    """Censor style "fuzzy-blur": heavy Gaussian blur of each region
    (reference main.py:596-602 uses a fixed 125px kernel; here the kernel
    scales with the region so small boxes still obliterate detail)."""
    cv2 = _cv2()
    out = frame.copy()
    for box in boxes:
        win = _clip_region(box, out.shape, pad)
        if win is None:
            continue
        x0, y0, x1, y1 = win
        k = _odd(int(max(y1 - y0, x1 - x0) * 0.6 * strength))
        out[y0:y1, x0:x1] = cv2.GaussianBlur(out[y0:y1, x0:x1], (k, k), 0)
    return out


def pixelated_blur_regions(
    frame: np.ndarray,
    boxes: Sequence[Box],
    grid: int = 10,
    noise: int = 40,
    smooth: int = 15,
    pad: float = 0.02,
    seed: int = 0,
) -> np.ndarray:
    """Censor styles "pixelated-blur" / "intense-pixelated-blur": collapse
    the region to a coarse grid, add pixel noise so the mosaic cannot be
    deconvolved, then smooth the blocks (reference main.py:603-618)."""
    cv2 = _cv2()
    rng = np.random.default_rng(seed)
    out = frame.copy()
    for box in boxes:
        win = _clip_region(box, out.shape, pad)
        if win is None:
            continue
        x0, y0, x1, y1 = win
        region = out[y0:y1, x0:x1]
        rh, rw = region.shape[:2]
        small = cv2.resize(region, (grid, grid), interpolation=cv2.INTER_LINEAR)
        pix = cv2.resize(small, (rw, rh), interpolation=cv2.INTER_NEAREST)
        if noise > 0:
            pix = cv2.add(
                pix, rng.integers(0, noise, (rh, rw, 3), dtype=np.uint8)
            )
        k = _odd(smooth)
        out[y0:y1, x0:x1] = cv2.GaussianBlur(pix, (k, k), 0)
    return out


def obfuscated_pixel_regions(
    frame: np.ndarray,
    boxes: Sequence[Box],
    block: int = 8,
    pad: float = 0.10,
    seed: int = 0,
) -> np.ndarray:
    """Censor style "obfuscated-pixel": replace the region with a block
    mosaic SAMPLED FROM THE SURROUNDING BACKGROUND, so the censored patch
    matches the scene's palette instead of advertising itself (role of
    reference main.py:619-700, which samples a 100px padded background
    ring). Here the ring is proportional to the box and the fill is
    per-block draws from the ring's pixel population."""
    cv2 = _cv2()
    rng = np.random.default_rng(seed)
    out = frame.copy()
    h, w = out.shape[:2]
    for box in boxes:
        win = _clip_region(box, out.shape, pad)
        if win is None:
            continue
        x0, y0, x1, y1 = win
        rh, rw = y1 - y0, x1 - x0
        ring = max(8, rh // 4, rw // 4)
        rx0, ry0 = max(0, x0 - ring), max(0, y0 - ring)
        rx1, ry1 = min(w, x1 + ring), min(h, y1 + ring)
        outer = out[ry0:ry1, rx0:rx1]
        mask = np.ones(outer.shape[:2], bool)
        mask[y0 - ry0 : y1 - ry0, x0 - rx0 : x1 - rx0] = False
        bg = outer[mask]
        if len(bg) == 0:  # box covers the whole frame: fall back to gray
            bg = np.full((1, 3), 127, np.uint8)
        bh, bw = -(-rh // block), -(-rw // block)
        picks = bg[rng.integers(0, len(bg), bh * bw)].reshape(bh, bw, 3)
        fill = cv2.resize(picks, (rw, rh), interpolation=cv2.INTER_NEAREST)
        out[y0:y1, x0:x1] = cv2.GaussianBlur(fill, (5, 5), 0)
    return out


def soft_box_mask(
    shape, boxes: Sequence[Box], feather: float = 0.25, power: float = 3.0
) -> np.ndarray:
    """Soft superellipse mask (float [0,1], HxW) for a set of boxes.

    The in-kind replacement for the reference's SAM segmentation masks
    (main.py:153-183): without an extra segmentation model, the best
    box-derived "object-shaped" region is a rounded superellipse inscribed
    in the box with a feathered edge. Multiple boxes combine by max."""
    h, w = shape[:2]
    mask = np.zeros((h, w), np.float32)
    for box in boxes:
        win = _clip_region(box, shape)
        if win is None:
            continue
        x0, y0, x1, y1 = win
        # normalized [-1, 1] coords over the box interior
        v = (np.arange(y0, y1) - (y0 + y1 - 1) / 2) / max((y1 - y0) / 2, 1)
        u = (np.arange(x0, x1) - (x0 + x1 - 1) / 2) / max((x1 - x0) / 2, 1)
        d = (
            np.abs(v[:, None]) ** power + np.abs(u[None, :]) ** power
        ) ** (1.0 / power)
        m = np.clip((1.0 - d) / max(feather, 1e-6), 0.0, 1.0)
        mask[y0:y1, x0:x1] = np.maximum(mask[y0:y1, x0:x1], m)
    return mask


def mask_overlay_regions(
    frame: np.ndarray,
    boxes: Sequence[Box],
    colors: Optional[Sequence[Tuple[int, int, int]]] = None,
    alpha: float = 0.4,
    outline: bool = True,
) -> np.ndarray:
    """Style "mask": translucent object-shaped fill + dark contour line —
    the look of the reference's SAM overlay (main.py:84-150) from boxes
    alone."""
    cv2 = _cv2()
    out = frame.astype(np.float32)
    for i, box in enumerate(boxes):
        color = np.array(colors[i] if colors else color_cycle(i), np.float32)
        m = soft_box_mask(frame.shape, [box])
        out = out * (1 - alpha * m[..., None]) + color * (alpha * m[..., None])
        if outline:
            cnts, _ = cv2.findContours(
                (m > 0.5).astype(np.uint8),
                cv2.RETR_EXTERNAL,
                cv2.CHAIN_APPROX_SIMPLE,
            )
            out = out.astype(np.uint8)
            cv2.drawContours(
                out, cnts, -1, tuple(int(c * 0.5) for c in color), 2,
                cv2.LINE_AA,
            )
            out = out.astype(np.float32)
    return np.clip(out, 0, 255).astype(np.uint8)


def mask_censor_regions(
    frame: np.ndarray,
    boxes: Sequence[Box],
    fill: Tuple[int, int, int] = (0, 0, 0),
    blur: bool = False,
) -> np.ndarray:
    """Styles "mask-censor" / "mask-blur": censor through the soft
    object-shaped mask instead of the hard rectangle — the redaction
    follows the object silhouette (in-kind with the reference's SAM-masked
    censoring) and the feathered edge avoids hard censor borders."""
    cv2 = _cv2()
    m = soft_box_mask(frame.shape, boxes, feather=0.35)[..., None]
    if blur:
        k = _odd(max(frame.shape[:2]) // 12)
        filled = cv2.GaussianBlur(frame, (k, k), 0).astype(np.float32)
    else:
        filled = np.broadcast_to(
            np.array(fill, np.float32), frame.shape
        )
    out = frame.astype(np.float32) * (1 - m) + filled * m
    return np.clip(out, 0, 255).astype(np.uint8)


# every region-censoring/annotation style across the video recipes, in one
# dispatcher (reference spreads these over promptable-video-redaction
# main.py:250-425 and promptable-content-moderation main.py:501-700)
REGION_STYLES = (
    "censor",
    "bounding-box",
    "hitmarker",
    "pixelate",
    "fuzzy-blur",
    "pixelated-blur",
    "intense-pixelated-blur",
    "obfuscated-pixel",
    "mask",
    "mask-censor",
    "mask-blur",
)


def apply_style(
    frame: np.ndarray,
    boxes: Sequence[Box],
    style: str,
    labels: Optional[Sequence[str]] = None,
    colors: Optional[Sequence[Tuple[int, int, int]]] = None,
) -> np.ndarray:
    if not boxes:
        return frame
    if style == "censor":
        return blackout_regions(frame, boxes)
    if style == "bounding-box":
        return draw_boxes(frame, boxes, labels=labels, colors=colors)
    if style == "hitmarker":
        centers = [((b[0] + b[2]) / 2, (b[1] + b[3]) / 2) for b in boxes]
        return draw_hitmarker(frame, centers)
    if style == "pixelate":
        return pixelate_regions(frame, boxes)
    if style == "fuzzy-blur":
        return blur_regions(frame, boxes)
    if style == "pixelated-blur":
        return pixelated_blur_regions(frame, boxes)
    if style == "intense-pixelated-blur":
        return pixelated_blur_regions(frame, boxes, grid=6, noise=50, smooth=31)
    if style == "obfuscated-pixel":
        return obfuscated_pixel_regions(frame, boxes)
    if style == "mask":
        return mask_overlay_regions(frame, boxes, colors=colors)
    if style == "mask-censor":
        return mask_censor_regions(frame, boxes)
    if style == "mask-blur":
        return mask_censor_regions(frame, boxes, blur=True)
    raise ValueError(f"unknown style {style!r}; one of {REGION_STYLES}")


def draw_gaze(
    frame: np.ndarray,
    face_box: Box,
    gaze_point: Tuple[float, float],
    color: Tuple[int, int, int],
    trail: Optional[Iterable[Tuple[float, float]]] = None,
) -> np.ndarray:
    """Face box + line from face center to gaze target + target dot, with an
    optional fading trail of recent gaze points (the reference draws a
    gradient line via matplotlib; here a cv2 polyline with alpha steps)."""
    cv2 = _cv2()
    out = frame.copy()
    h, w = out.shape[:2]
    x0, y0, x1, y1 = _to_px(face_box, out.shape)
    cv2.rectangle(out, (x0, y0), (x1, y1), color, 2)
    fcx, fcy = (x0 + x1) // 2, (y0 + y1) // 2
    gx, gy = int(gaze_point[0] * w), int(gaze_point[1] * h)

    # fading line: blend segments progressively toward the target
    steps = 12
    overlay = out.copy()
    for s in range(steps):
        t0, t1 = s / steps, (s + 1) / steps
        p0 = (int(fcx + (gx - fcx) * t0), int(fcy + (gy - fcy) * t0))
        p1 = (int(fcx + (gx - fcx) * t1), int(fcy + (gy - fcy) * t1))
        alpha = 0.3 + 0.7 * t1
        seg = overlay.copy()
        cv2.line(seg, p0, p1, color, 2, cv2.LINE_AA)
        overlay = cv2.addWeighted(seg, alpha, overlay, 1 - alpha, 0)
    out = overlay

    if trail:
        for i, (tx, ty) in enumerate(trail):
            r = max(2, 5 - i)
            cv2.circle(
                out, (int(tx * w), int(ty * h)), r, color, -1, cv2.LINE_AA
            )
    cv2.circle(out, (gx, gy), 6, color, -1, cv2.LINE_AA)
    cv2.circle(out, (gx, gy), 6, (255, 255, 255), 1, cv2.LINE_AA)
    return out
