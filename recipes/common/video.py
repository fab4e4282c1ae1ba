"""Video IO helpers (cv2-based, no ffmpeg binary required).

Equivalent role to the reference's per-recipe `video_handler` /
`get_video_properties` (recipes/gaze-detection-video/gaze-detection-video.py:56-79,
recipes/promptable-video-redaction/main.py:44-53), factored out once.
"""

from __future__ import annotations

import contextlib
from dataclasses import dataclass
from typing import Iterator, List, Optional, Tuple

import numpy as np


def _cv2():
    try:
        import cv2

        return cv2
    except ImportError as e:  # pragma: no cover - cv2 is present in CI image
        raise RuntimeError(
            "opencv-python is required for the video recipes"
        ) from e


@dataclass
class VideoProps:
    fps: float
    width: int
    height: int
    n_frames: int


class VideoSource:
    """Iterates RGB frames from a video file."""

    def __init__(self, path: str):
        cv2 = _cv2()
        self._cv2 = cv2
        self.cap = cv2.VideoCapture(path)
        if not self.cap.isOpened():
            raise ValueError(f"could not open video: {path}")
        self.props = VideoProps(
            fps=float(self.cap.get(cv2.CAP_PROP_FPS) or 30.0),
            width=int(self.cap.get(cv2.CAP_PROP_FRAME_WIDTH)),
            height=int(self.cap.get(cv2.CAP_PROP_FRAME_HEIGHT)),
            n_frames=int(self.cap.get(cv2.CAP_PROP_FRAME_COUNT)),
        )

    def __iter__(self) -> Iterator[np.ndarray]:
        while True:
            ok, frame_bgr = self.cap.read()
            if not ok:
                return
            yield frame_bgr[:, :, ::-1]  # BGR -> RGB

    def release(self):
        self.cap.release()


class VideoSink:
    """Writes RGB frames to an mp4 file."""

    def __init__(self, path: str, fps: float, size: Tuple[int, int]):
        cv2 = _cv2()
        self._cv2 = cv2
        fourcc = cv2.VideoWriter_fourcc(*"mp4v")
        self.writer = cv2.VideoWriter(path, fourcc, fps, size)
        if not self.writer.isOpened():
            raise ValueError(f"could not open video writer: {path}")

    def write(self, frame_rgb: np.ndarray):
        self.writer.write(np.ascontiguousarray(frame_rgb[:, :, ::-1]))

    def release(self):
        self.writer.release()


@contextlib.contextmanager
def video_io(input_path: str, output_path: str):
    src = VideoSource(input_path)
    sink = VideoSink(
        output_path, src.props.fps, (src.props.width, src.props.height)
    )
    try:
        yield src, sink
    finally:
        src.release()
        sink.release()


def sample_frames(
    frames: List[np.ndarray], every_n: int
) -> Tuple[List[int], List[np.ndarray]]:
    """Pick every Nth frame for model inference (detections are carried
    forward to the skipped frames by the caller / tracker)."""
    idx = list(range(0, len(frames), max(1, every_n)))
    return idx, [frames[i] for i in idx]


def scene_cut(prev: Optional[np.ndarray], cur: np.ndarray, threshold: float = 0.5) -> bool:
    """Cheap scene-change detector: correlation of downsampled gray
    histograms. Replaces the reference's Frame-count heuristic reset
    (recipes/promptable-content-moderation/deep_sort_integration.py:26-55)
    with an actual content signal."""
    if prev is None:
        return False

    def hist(im):
        g = im.mean(axis=2) if im.ndim == 3 else im
        h, _ = np.histogram(g, bins=32, range=(0, 255))
        h = h.astype(np.float64)
        return h / max(h.sum(), 1)

    a, b = hist(prev), hist(cur)
    corr = float((a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9))
    return corr < (1.0 - threshold)
