"""Batched frame→detection pipeline shared by the video recipes.

The reference recipes call `model.detect(frame, keyword)` one frame at a
time (recipes/promptable-video-redaction/main.py:455-501). On TPU the win
is batching the expensive half: sampled frames (and their grid tiles) are
encoded through the ViT + prefill as ONE device batch via
`MoondreamModel.encode_images`, and only the short structured decode runs
per frame. Encoded images are the reusable KV snapshots of the public API,
so nothing here reaches into model internals.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image

from .tiling import (
    Box,
    is_valid_box,
    merge_tile_boxes,
    split_into_tiles,
    tile_box_to_frame,
)


def _to_pil(frame: np.ndarray) -> Image.Image:
    return Image.fromarray(np.ascontiguousarray(frame))


def detect_frames(
    model,
    frames: Sequence[np.ndarray],
    keyword: str,
    grid: Tuple[int, int] = (1, 1),
    encode_batch: int = 8,
    iou_merge: float = 0.5,
    progress: Optional[Callable[[int, int], None]] = None,
) -> List[List[Box]]:
    """Detect `keyword` in each RGB frame. Returns normalized boxes per frame.

    grid=(rows, cols) > (1,1) splits each frame into tiles for small-object
    recall; tile boxes are mapped back to frame space and IoU-union-merged
    (reference main.py:124-180 semantics).
    """
    rows, cols = grid
    # flatten: per frame, its tiles (or the frame itself)
    units: List[Tuple[int, Optional[Tuple[int, int]], np.ndarray]] = []
    for fi, frame in enumerate(frames):
        if rows == 1 and cols == 1:
            units.append((fi, None, frame))
        else:
            for tile, pos in split_into_tiles(frame, rows, cols):
                units.append((fi, pos, tile))

    per_frame: Dict[int, List[Box]] = {fi: [] for fi in range(len(frames))}
    done = 0
    for start in range(0, len(units), encode_batch):
        chunk = units[start : start + encode_batch]
        imgs = [_to_pil(u[2]) for u in chunk]
        # one batched encode AND one fused lockstep structured decode for
        # the whole chunk (detect_batch) — the decode loop advances all
        # frames per device step instead of running B sequential detects
        encs = (
            model.encode_images(imgs)
            if len(imgs) > 1
            else [model.encode_image(imgs[0])]
        )
        try:
            results = (
                model.detect_batch(encs, keyword)
                if len(encs) > 1
                else [model.detect(encs[0], keyword)]
            )
        except Exception as e:  # decode-stage fallback: per-frame
            # resilience on the already-computed encodings
            print(f"batched detect failed ({e}); falling back per-frame")
            results = []
            for enc in encs:
                try:
                    results.append(model.detect(enc, keyword))
                except Exception as e2:
                    print(f"detect failed: {e2}")
                    results.append({"objects": []})
        for (fi, pos, _), det in zip(chunk, results):
            for o in det["objects"]:
                box = (o["x_min"], o["y_min"], o["x_max"], o["y_max"])
                if pos is not None:
                    box = tile_box_to_frame(box, pos, rows, cols)
                if is_valid_box(box):
                    per_frame[fi].append(box)
            done += 1
            if progress:
                progress(done, len(units))

    if rows != 1 or cols != 1:
        for fi in per_frame:
            per_frame[fi] = merge_tile_boxes(per_frame[fi], iou_merge)
    return [per_frame[i] for i in range(len(frames))]


def spread_detections(
    n_frames: int, sampled_idx: Sequence[int], sampled_boxes: Sequence[List[Box]]
) -> Dict[int, List[Box]]:
    """Carry each sampled frame's detections forward to the frames until the
    next sample (the reference redraws the last detection on skipped
    frames)."""
    out: Dict[int, List[Box]] = {}
    si = 0
    current: List[Box] = []
    for f in range(n_frames):
        if si < len(sampled_idx) and f >= sampled_idx[si]:
            current = sampled_boxes[si]
            si += 1
        out[f] = current
    return out
