"""Tests for the expanded recipe surface: the full redaction style set
(recipes/common/overlay.py:REGION_STYLES), the detection-analysis suite,
and the animated timeline renderer (recipes/common/analysis.py) — the
in-kind counterparts of the reference's promptable-content-moderation
main.py styles, app.py create_visualization_plots, and
video_visualization.py."""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from recipes.common.analysis import (  # noqa: E402
    analysis_plots,
    flatten_detections,
    format_stats,
    render_timeline_video,
    stats_summary,
)
from recipes.common.overlay import (  # noqa: E402
    REGION_STYLES,
    apply_style,
    obfuscated_pixel_regions,
    soft_box_mask,
)


def _frame(h=90, w=120):
    rng = np.random.default_rng(7)
    return rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)


BOX = (0.25, 0.25, 0.7, 0.8)


@pytest.mark.parametrize("style", REGION_STYLES)
def test_every_style_modifies_region_only(style):
    frame = _frame()
    out = apply_style(frame, [BOX], style, labels=["thing"])
    assert out.shape == frame.shape and out.dtype == np.uint8
    # region must change (redaction/annotation happened)...
    h, w = frame.shape[:2]
    y0, y1 = int(BOX[1] * h), int(BOX[3] * h)
    x0, x1 = int(BOX[0] * w), int(BOX[2] * w)
    assert not np.array_equal(
        out[y0:y1, x0:x1], frame[y0:y1, x0:x1]
    ), f"{style} left the box region untouched"
    # ...and the far corner must not (padding/labels stay near the box)
    assert np.array_equal(out[:4, -4:], frame[:4, -4:])


def test_apply_style_empty_boxes_is_identity():
    frame = _frame()
    for style in REGION_STYLES:
        assert apply_style(frame, [], style) is frame


def test_apply_style_unknown_raises():
    with pytest.raises(ValueError, match="unknown style"):
        apply_style(_frame(), [BOX], "solid-gold")


def test_soft_box_mask_profile():
    m = soft_box_mask((100, 100), [(0.2, 0.2, 0.8, 0.8)])
    assert m.shape == (100, 100)
    assert 0.0 <= m.min() and m.max() <= 1.0
    assert m[50, 50] == 1.0  # box center fully masked
    assert m[5, 5] == 0.0  # outside the box untouched
    # feathered edge: strictly between 0 and 1 near the box boundary
    edge = m[50, int(0.8 * 100) - 2]
    assert 0.0 < edge < 1.0


def test_obfuscated_pixel_samples_background():
    # uniform green background: the censored fill must come out green-ish,
    # not black/noise — that is the style's whole point
    frame = np.zeros((80, 80, 3), np.uint8)
    frame[:] = (30, 200, 40)
    frame[20:60, 20:60] = (255, 0, 0)  # the "object" to censor
    out = obfuscated_pixel_regions(
        frame, [(0.25, 0.25, 0.75, 0.75)], pad=0.0
    )
    center = out[35:45, 35:45].reshape(-1, 3).mean(axis=0)
    assert center[1] > 150 and center[0] < 80, center


def _detections_json(tmp_path, n_frames=40, fps=10.0):
    rng = np.random.default_rng(0)
    det = {}
    for f in range(0, n_frames, 2):
        boxes = []
        for _ in range(int(rng.integers(0, 3))):
            x0, y0 = rng.uniform(0, 0.6, 2)
            boxes.append([x0, y0, x0 + 0.3, y0 + 0.3])
        det[f] = boxes
    data = {
        "video": "clip.mp4",
        "keyword": "widget",
        "every_n": 2,
        "video_metadata": {
            "fps": fps, "width": 64, "height": 48, "n_frames": n_frames,
        },
        "detections": det,
    }
    p = tmp_path / "dets.json"
    p.write_text(json.dumps(data))
    return str(p), data


def test_flatten_and_stats(tmp_path):
    path, data = _detections_json(tmp_path)
    t = flatten_detections(path)
    n_boxes = sum(len(v) for v in data["detections"].values())
    assert len(t["frame"]) == n_boxes
    assert t["boxes"].shape == (n_boxes, 4)
    assert t["n_frames"] == 40 and t["fps"] == 10.0
    assert int(t["counts"].sum()) == n_boxes

    s = stats_summary(path)
    assert s["total_detections"] == n_boxes
    assert s["frames_sampled"] == 20
    assert s["duration_s"] == 4.0
    assert 0.0 <= s["detection_rate"] <= 1.0
    text = format_stats(s)
    assert "keyword: widget" in text


def test_stats_empty_detections():
    s = stats_summary({"detections": {}, "keyword": "x"})
    assert s["total_detections"] == 0 and s["detection_rate"] == 0.0


def test_analysis_plots_writes_eight(tmp_path):
    path, _ = _detections_json(tmp_path)
    paths = analysis_plots(path, str(tmp_path / "plots"))
    assert len(paths) == 8
    for p in paths:
        assert os.path.exists(p) and os.path.getsize(p) > 1000


def test_analysis_plots_empty_data(tmp_path):
    p = tmp_path / "empty.json"
    p.write_text(json.dumps({"detections": {}, "keyword": "x"}))
    paths = analysis_plots(str(p), str(tmp_path / "plots"))
    assert len(paths) == 8  # empty data still renders labeled axes


def test_timeline_video(tmp_path):
    cv2 = pytest.importorskip("cv2")
    path, _ = _detections_json(tmp_path, n_frames=12)
    out = render_timeline_video(path, str(tmp_path / "tl.mp4"),
                                size=(320, 180))
    cap = cv2.VideoCapture(out)
    assert cap.isOpened()
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 12
    ok, frame = cap.read()
    assert ok and frame.shape[1] == 320
    cap.release()


def test_timeline_video_composites_source(tmp_path):
    cv2 = pytest.importorskip("cv2")
    from recipes.common import VideoSink

    src = str(tmp_path / "src.mp4")
    sink = VideoSink(src, 10.0, (64, 48))
    for _ in range(12):
        sink.write(_frame(48, 64))
    sink.release()

    path, _ = _detections_json(tmp_path, n_frames=12)
    out = render_timeline_video(path, str(tmp_path / "tlc.mp4"),
                                size=(320, 180), source_video=src)
    cap = cv2.VideoCapture(out)
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 12
    # composite is taller than the bare chart strip
    assert int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT)) > 60
    cap.release()


def test_webapp_backends_importable_without_gradio(tmp_path):
    # the gradio UI is optional; the tab backends must work standalone
    from recipes.webapp import run_analyze, run_timeline

    path, _ = _detections_json(tmp_path, n_frames=8)
    plots, stats_text = run_analyze(path)
    assert len(plots) == 8 and "widget" in stats_text
    out = run_timeline(path)
    assert os.path.exists(out) and os.path.getsize(out) > 0
