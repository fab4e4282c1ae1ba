"""Dependency-free multi-object IoU tracker.

Replaces the reference's external DeepSORT dependency
(recipes/promptable-content-moderation/deep_sort_integration.py, which wraps
`deep_sort_realtime` with a mobilenet appearance embedder). On the
moderation workload the boxes come from a VLM at ~1 detection pass per N
frames, so greedy IoU + constant-velocity extrapolation is both sufficient
and dependency-free; appearance embedding would need another network.

Tracks carry: id, box (normalized), age since last match, hit count, and a
velocity estimate used to coast through skipped frames.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np

from .tiling import Box, box_iou


@dataclass
class Track:
    track_id: int
    box: Box
    hits: int = 1
    misses: int = 0
    velocity: Tuple[float, float] = (0.0, 0.0)
    history: List[Box] = field(default_factory=list)

    def center(self) -> Tuple[float, float]:
        return ((self.box[0] + self.box[2]) / 2, (self.box[1] + self.box[3]) / 2)

    def predict(self) -> Box:
        dx, dy = self.velocity
        return (
            self.box[0] + dx,
            self.box[1] + dy,
            self.box[2] + dx,
            self.box[3] + dy,
        )


class IoUTracker:
    """Greedy IoU association with constant-velocity coasting.

    update() takes the detections for the current (sampled) frame and
    returns the list of live tracks. Unmatched tracks coast for up to
    `max_age` updates before being dropped; tracks need `min_hits` matches
    before being reported (suppresses one-frame hallucinations — the role
    of the reference's temporal outlier filter at track level).
    """

    def __init__(
        self,
        iou_threshold: float = 0.3,
        max_age: int = 5,
        min_hits: int = 1,
        smoothing: float = 0.5,
    ):
        self.iou_threshold = iou_threshold
        self.max_age = max_age
        self.min_hits = min_hits
        self.smoothing = smoothing
        self.tracks: Dict[int, Track] = {}
        self._next_id = 1

    def reset(self):
        """Drop all tracks (call on scene cuts)."""
        self.tracks.clear()

    def update(self, detections: List[Box]) -> List[Track]:
        live = list(self.tracks.values())
        # score all (track, detection) pairs against the *predicted* boxes
        pairs = []
        for ti, t in enumerate(live):
            pred = t.predict()
            for di, d in enumerate(detections):
                iou = box_iou(pred, d)
                if iou >= self.iou_threshold:
                    pairs.append((iou, ti, di))
        pairs.sort(reverse=True)

        matched_t, matched_d = set(), set()
        for iou, ti, di in pairs:
            if ti in matched_t or di in matched_d:
                continue
            matched_t.add(ti)
            matched_d.add(di)
            t, d = live[ti], detections[di]
            a = self.smoothing
            old_cx, old_cy = t.center()
            new_box = tuple(a * n + (1 - a) * o for n, o in zip(d, t.box))
            t.box = new_box  # type: ignore[assignment]
            cx, cy = t.center()
            t.velocity = (cx - old_cx, cy - old_cy)
            t.hits += 1
            t.misses = 0
            t.history.append(t.box)

        for ti, t in enumerate(live):
            if ti not in matched_t:
                t.misses += 1
                t.box = t.predict()
                t.velocity = (t.velocity[0] * 0.8, t.velocity[1] * 0.8)
                if t.misses > self.max_age:
                    del self.tracks[t.track_id]

        for di, d in enumerate(detections):
            if di not in matched_d:
                t = Track(self._next_id, tuple(d), history=[tuple(d)])
                self.tracks[self._next_id] = t
                self._next_id += 1

        return [
            t
            for t in self.tracks.values()
            if t.hits >= self.min_hits and t.misses == 0
        ]

    def coasting(self) -> List[Track]:
        """Tracks that missed the last update but are still alive —
        used to keep censoring objects between detection frames."""
        return [
            t
            for t in self.tracks.values()
            if t.hits >= self.min_hits and 0 < t.misses <= self.max_age
        ]
