"""Tests for the video recipe infrastructure (recipes/common/) plus an
end-to-end smoke run of each recipe CLI pipeline on a tiny random-weight
model and a synthetic video. Mirrors the role of the reference's manual
recipe testing, but automated."""

import os

import numpy as np
import pytest

from recipes.common.overlay import (
    blackout_regions,
    draw_boxes,
    draw_gaze,
    draw_hitmarker,
    pixelate_regions,
)
from recipes.common.persistence import load_detection_data, save_detection_data
from recipes.common.tiling import (
    box_iou,
    filter_temporal_outliers,
    is_valid_box,
    merge_tile_boxes,
    split_into_tiles,
    tile_box_to_frame,
)
from recipes.common.tracker import IoUTracker
from recipes.common.video import VideoSink, VideoSource, scene_cut


# ------------------------------------------------------------------ tiling
def test_split_into_tiles_covers_frame():
    frame = np.arange(60 * 80 * 3, dtype=np.uint8).reshape(60, 80, 3)
    tiles = split_into_tiles(frame, 2, 3)
    assert len(tiles) == 6
    assert sum(t.size for t, _ in tiles) == frame.size
    # top-left tile is the top-left of the frame
    np.testing.assert_array_equal(tiles[0][0], frame[:30, :26])


def test_tile_box_roundtrip():
    # a box filling tile (1,2) of a 2x3 grid maps to that tile's frame region
    box = tile_box_to_frame((0.0, 0.0, 1.0, 1.0), (1, 2), 2, 3)
    assert box == pytest.approx((2 / 3, 0.5, 1.0, 1.0))


def test_box_iou_and_validity():
    assert box_iou((0, 0, 1, 1), (0, 0, 1, 1)) == pytest.approx(1.0)
    assert box_iou((0, 0, 0.5, 0.5), (0.5, 0.5, 1, 1)) == 0.0
    assert is_valid_box((0.1, 0.1, 0.4, 0.4))
    assert not is_valid_box((0.4, 0.1, 0.1, 0.4))   # reversed
    assert not is_valid_box((0.0, 0.0, 1.5, 1.0))   # out of range
    assert not is_valid_box((np.nan, 0, 1, 1))      # non-finite


def test_merge_tile_boxes_unions_overlaps():
    a = (0.10, 0.10, 0.52, 0.50)
    b = (0.48, 0.12, 0.90, 0.52)  # IoU small; straddle merge needs low thresh
    merged = merge_tile_boxes([a, b], iou_threshold=0.01)
    assert len(merged) == 1
    m = merged[0]
    assert m == pytest.approx((0.10, 0.10, 0.90, 0.52))
    # disjoint boxes stay separate
    assert len(merge_tile_boxes([a, (0.6, 0.6, 0.9, 0.9)])) == 2


def test_filter_temporal_outliers_caps_spikes():
    det = {f: [(0.1, 0.1, 0.2, 0.2)] for f in range(10)}
    det[5] = [(0.1 * i, 0.1, 0.1 * i + 0.05, 0.2) for i in range(1, 9)]  # spike
    out = filter_temporal_outliers(det)
    assert len(out[5]) <= 3  # capped near local median
    assert all(len(out[f]) == 1 for f in range(10) if f != 5)


# ----------------------------------------------------------------- tracker
def test_tracker_id_stability_and_coasting():
    tr = IoUTracker(max_age=2, min_hits=1)
    box = (0.4, 0.4, 0.6, 0.6)
    t1 = tr.update([box])
    assert len(t1) == 1
    tid = t1[0].track_id

    moved = (0.42, 0.4, 0.62, 0.6)
    t2 = tr.update([moved])
    assert t2[0].track_id == tid  # same object, same id

    # miss: track coasts with its velocity, stays alive
    t3 = tr.update([])
    assert t3 == []
    assert len(tr.coasting()) == 1
    coasted = tr.coasting()[0]
    assert coasted.box[0] > moved[0]  # extrapolated forward

    # reappears near prediction: re-associates to the same id
    t4 = tr.update([(0.46, 0.4, 0.66, 0.6)])
    assert t4[0].track_id == tid


def test_tracker_new_object_and_reset():
    tr = IoUTracker()
    tr.update([(0.1, 0.1, 0.2, 0.2)])
    tracks = tr.update([(0.1, 0.1, 0.2, 0.2), (0.7, 0.7, 0.9, 0.9)])
    assert len(tracks) == 2
    assert len({t.track_id for t in tracks}) == 2
    tr.reset()
    assert tr.update([]) == []
    assert tr.tracks == {}


def test_tracker_ages_out():
    tr = IoUTracker(max_age=1)
    tr.update([(0.1, 0.1, 0.2, 0.2)])
    tr.update([])
    tr.update([])  # misses exceed max_age -> dropped
    assert tr.tracks == {}


# ----------------------------------------------------------------- overlay
def test_overlays_shapes_and_effects():
    frame = np.full((100, 120, 3), 200, np.uint8)
    boxes = [(0.2, 0.2, 0.5, 0.6)]

    boxed = draw_boxes(frame, boxes, labels=["x"])
    assert boxed.shape == frame.shape and boxed.dtype == np.uint8
    assert not np.array_equal(boxed, frame)

    black = blackout_regions(frame, boxes, pad=0.0)
    assert black[40, 40].tolist() == [0, 0, 0]
    assert black[5, 5].tolist() == [200, 200, 200]  # outside untouched

    pix = pixelate_regions(frame, boxes)
    assert pix.shape == frame.shape

    hm = draw_hitmarker(frame, [(0.5, 0.5)])
    assert not np.array_equal(hm, frame)

    gz = draw_gaze(frame, boxes[0], (0.9, 0.9), (255, 0, 0),
                   trail=[(0.8, 0.8)])
    assert gz.shape == frame.shape


# ------------------------------------------------------------- persistence
def test_persistence_roundtrip(tmp_path):
    data = {
        "keyword": "face",
        "detections": {3: [(0.1, 0.2, 0.3, 0.4)], 6: []},
    }
    path = str(tmp_path / "d.json")
    assert save_detection_data(data, path)
    loaded = load_detection_data(path)
    assert loaded["keyword"] == "face"
    assert loaded["detections"][3] == [(0.1, 0.2, 0.3, 0.4)]
    assert loaded["detections"][6] == []


# ------------------------------------------------------------------- video
def _write_test_video(path, n=12, size=(64, 48)):
    sink = VideoSink(path, 10.0, size)
    for i in range(n):
        frame = np.full((size[1], size[0], 3), 10 * i, np.uint8)
        sink.write(frame)
    sink.release()


def test_video_roundtrip(tmp_path):
    path = str(tmp_path / "v.mp4")
    _write_test_video(path)
    src = VideoSource(path)
    frames = list(src)
    src.release()
    assert len(frames) == 12
    assert frames[0].shape == (48, 64, 3)


def test_scene_cut():
    dark = np.zeros((50, 50, 3), np.uint8)
    bright = np.full((50, 50, 3), 250, np.uint8)
    assert scene_cut(dark, bright)
    assert not scene_cut(dark, dark + 3)
    assert not scene_cut(None, dark)


# ------------------------------------------------- end-to-end (tiny model)
@pytest.fixture(scope="module")
def tiny_model():
    from moondream_tpu.config import tiny_test_config
    from moondream_tpu.models.moondream import MoondreamModel
    from moondream_tpu.tokenizer import ByteTokenizer

    return MoondreamModel(tiny_test_config(), tokenizer=ByteTokenizer(), seed=0)


@pytest.fixture(scope="module")
def tiny_video(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("vid") / "in.mp4")
    _write_test_video(path, n=6, size=(96, 64))
    return path


def test_redaction_pipeline_e2e(tiny_model, tiny_video, tmp_path):
    from recipes.promptable_video_redaction import process_video

    out = str(tmp_path / "out.mp4")
    dets = str(tmp_path / "d.json")
    stats = process_video(
        tiny_model, tiny_video, out, "thing",
        style="pixelate", every_n=3, save_detections=dets,
    )
    assert stats["frames"] == 6
    assert os.path.exists(out)
    assert os.path.exists(dets)

    # restyle from persisted detections without re-running the model
    out2 = str(tmp_path / "out2.mp4")
    stats2 = process_video(
        tiny_model, tiny_video, out2, "thing",
        style="censor", load_detections=dets,
    )
    assert stats2["inference_s"] == 0.0
    assert os.path.exists(out2)


def test_moderation_pipeline_e2e(tiny_model, tiny_video, tmp_path):
    from recipes.promptable_content_moderation import (
        process_video,
        visualize_detections,
    )

    out = str(tmp_path / "out.mp4")
    dets = str(tmp_path / "d.json")
    stats = process_video(
        tiny_model, tiny_video, out, "thing",
        style="bounding-box", every_n=2, save_detections=dets,
    )
    assert stats["frames"] == 6
    assert os.path.exists(out)
    png = visualize_detections(dets, str(tmp_path / "t.png"))
    assert os.path.exists(png)


def test_gaze_pipeline_e2e(tiny_model, tiny_video, tmp_path):
    from recipes.gaze_detection_video import process_video

    out = str(tmp_path / "out.mp4")
    stats = process_video(tiny_model, tiny_video, out, every_n=3)
    assert stats["frames"] == 6
    assert os.path.exists(out)
