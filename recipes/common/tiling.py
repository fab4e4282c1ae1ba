"""Grid tiling for detecting small objects in large frames.

The reference splits frames into a grid, runs `detect()` per tile, maps tile
coordinates back to frame space, and merges overlapping tile detections by
IoU union (recipes/promptable-video-redaction/main.py:72-180,
recipes/promptable-content-moderation/main.py:221-329). Same behavior here,
vectorized, with the per-tile detects batched through the TPU engine by the
caller.

Boxes are normalized [x_min, y_min, x_max, y_max] in [0, 1] frame space.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

Box = Tuple[float, float, float, float]


def split_into_tiles(
    frame: np.ndarray, rows: int, cols: int
) -> List[Tuple[np.ndarray, Tuple[int, int]]]:
    """Split an HxWx3 frame into rows*cols tiles. Returns (tile, (r, c))."""
    h, w = frame.shape[:2]
    tiles = []
    for r in range(rows):
        for c in range(cols):
            y0, y1 = (h * r) // rows, (h * (r + 1)) // rows
            x0, x1 = (w * c) // cols, (w * (c + 1)) // cols
            tiles.append((frame[y0:y1, x0:x1], (r, c)))
    return tiles


def tile_box_to_frame(
    box: Box, tile_pos: Tuple[int, int], rows: int, cols: int
) -> Box:
    """Map a box normalized to tile space back to frame-normalized coords."""
    r, c = tile_pos
    return (
        (c + box[0]) / cols,
        (r + box[1]) / rows,
        (c + box[2]) / cols,
        (r + box[3]) / rows,
    )


def box_iou(a: Box, b: Box) -> float:
    ix0, iy0 = max(a[0], b[0]), max(a[1], b[1])
    ix1, iy1 = min(a[2], b[2]), min(a[3], b[3])
    iw, ih = max(0.0, ix1 - ix0), max(0.0, iy1 - iy0)
    inter = iw * ih
    area_a = max(0.0, a[2] - a[0]) * max(0.0, a[3] - a[1])
    area_b = max(0.0, b[2] - b[0]) * max(0.0, b[3] - b[1])
    union = area_a + area_b - inter
    return inter / union if union > 0 else 0.0


def is_valid_box(box: Sequence[float]) -> bool:
    """Finite, ordered, in-range normalized box."""
    if len(box) != 4:
        return False
    arr = np.asarray(box, dtype=np.float64)
    if not np.all(np.isfinite(arr)):
        return False
    x0, y0, x1, y1 = arr
    return 0.0 <= x0 < x1 <= 1.0 and 0.0 <= y0 < y1 <= 1.0


def merge_tile_boxes(boxes: List[Box], iou_threshold: float = 0.5) -> List[Box]:
    """Union-merge boxes that overlap above threshold (objects straddling
    tile borders get detected once per tile)."""
    boxes = [b for b in boxes if is_valid_box(b)]
    merged: List[Box] = []
    for box in sorted(
        boxes, key=lambda b: (b[2] - b[0]) * (b[3] - b[1]), reverse=True
    ):
        for i, m in enumerate(merged):
            if box_iou(box, m) >= iou_threshold:
                merged[i] = (
                    min(m[0], box[0]),
                    min(m[1], box[1]),
                    max(m[2], box[2]),
                    max(m[3], box[3]),
                )
                break
        else:
            merged.append(box)
    return merged


def filter_temporal_outliers(
    detections: dict, window: int = 5, factor: float = 3.0
) -> dict:
    """Drop frames whose detection count spikes far above the local median —
    the reference's heuristic against hallucinated detections
    (recipes/promptable-video-redaction/main.py:427-453), re-done as a
    rolling-median test instead of a global mean."""
    frames = sorted(detections)
    counts = np.array([len(detections[f]) for f in frames], dtype=np.float64)
    if len(frames) < 3:
        return detections
    out = {}
    half = window // 2
    for i, f in enumerate(frames):
        lo, hi = max(0, i - half), min(len(frames), i + half + 1)
        local = np.concatenate([counts[lo:i], counts[i + 1 : hi]])
        med = float(np.median(local)) if len(local) else 0.0
        if counts[i] <= max(1.0, factor * max(med, 1.0)):
            out[f] = detections[f]
        else:  # keep the most confident-looking (largest) boxes up to median
            keep = int(max(1.0, med))
            boxes = sorted(
                detections[f],
                key=lambda b: (b[2] - b[0]) * (b[3] - b[1]),
                reverse=True,
            )
            out[f] = boxes[:keep]
    return out
