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
