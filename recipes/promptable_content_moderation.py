#!/usr/bin/env python
"""Promptable content moderation: detect a target concept per frame, TRACK it
across frames, and censor it with temporal consistency.

TPU-native re-design of recipes/promptable-content-moderation/main.py +
deep_sort_integration.py: batched TPU frame encodes (`encode_images`),
a dependency-free IoU tracker with constant-velocity coasting in place of
DeepSORT (recipes/common/tracker.py), scene-cut tracker resets driven by a
histogram signal, temporal outlier filtering, JSON persistence, and a
matplotlib detection-timeline visualization (the reference's
visualization.py role).

Usage:
  python -m recipes.promptable_content_moderation --input in.mp4 \
      --detect "cigarette" --model model.safetensors \
      [--style censor|mask-censor|fuzzy-blur|obfuscated-pixel|...] \
      [--every-n 3] \
      [--save-detections d.json | --load-detections d.json] \
      [--visualize d.json] [--analyze d.json] [--timeline-video d.json]

Styles: the reference's full surface (censor, bounding-box, hitmarker,
fuzzy-blur, pixelated-blur, intense-pixelated-blur, obfuscated-pixel) plus
mask-shaped redaction (mask / mask-censor / mask-blur) — see
recipes/common/overlay.py:REGION_STYLES. `--analyze` writes the 8-plot
analysis suite + stats (reference app.py:119-369); `--timeline-video`
renders the animated playhead timeline (reference video_visualization.py),
composited under the source frames when --input is also given.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from recipes.common import (  # noqa: E402
    REGION_STYLES as STYLES,  # noqa: F401 - full style surface (overlay.py)
    IoUTracker,
    VideoSink,
    VideoSource,
    apply_style,
    load_detection_data,
    save_detection_data,
)
from recipes.common.overlay import color_cycle  # noqa: E402
from recipes.common.pipeline import detect_frames  # noqa: E402
from recipes.common.tiling import filter_temporal_outliers  # noqa: E402
from recipes.common.video import scene_cut  # noqa: E402
from recipes.gaze_detection_video import load_model  # noqa: E402


def process_video(
    model,
    input_path: str,
    output_path: str,
    keyword: str,
    style: str = "censor",
    grid=(1, 1),
    every_n: int = 3,
    encode_batch: int = 8,
    max_age: int = 5,
    save_detections: str = "",
    load_detections: str = "",
) -> dict:
    src = VideoSource(input_path)
    frames = list(src)
    src.release()
    if not frames:
        raise ValueError(f"no frames in {input_path}")

    infer_s = 0.0
    if load_detections:
        data = load_detection_data(load_detections)
        raw = data["detections"]
        sampled_idx = sorted(raw)
        sampled_boxes = [raw[i] for i in sampled_idx]
    else:
        sampled_idx = list(range(0, len(frames), max(1, every_n)))
        print(
            f"{len(frames)} frames; moderating '{keyword}' on "
            f"{len(sampled_idx)} sampled frames"
        )
        t0 = time.perf_counter()
        sampled_boxes = detect_frames(
            model,
            [frames[i] for i in sampled_idx],
            keyword,
            grid=grid,
            encode_batch=encode_batch,
            progress=lambda d, n: print(f"  {d}/{n} encodes", end="\r"),
        )
        infer_s = time.perf_counter() - t0
        print()
        filtered = filter_temporal_outliers(
            dict(zip(sampled_idx, sampled_boxes))
        )
        sampled_boxes = [filtered[i] for i in sampled_idx]
        if save_detections:
            save_detection_data(
                {
                    "video": os.path.basename(input_path),
                    "keyword": keyword,
                    "every_n": every_n,
                    "video_metadata": {
                        "fps": src.props.fps,
                        "width": src.props.width,
                        "height": src.props.height,
                        "n_frames": len(frames),
                    },
                    "detections": {
                        int(i): [list(b) for b in bs]
                        for i, bs in zip(sampled_idx, sampled_boxes)
                    },
                },
                save_detections,
            )
            print(f"saved detections -> {save_detections}")

    # tracking pass over full frame rate: update on sampled frames, coast on
    # the rest; reset on scene cuts
    tracker = IoUTracker(max_age=max_age, min_hits=1)
    sink = VideoSink(
        output_path, src.props.fps, (src.props.width, src.props.height)
    )
    det_by_frame = dict(zip(sampled_idx, sampled_boxes))
    prev_frame = None
    timeline = {}
    for f, frame in enumerate(frames):
        if scene_cut(prev_frame, frame):
            tracker.reset()
        prev_frame = frame
        if f in det_by_frame:
            active = tracker.update(det_by_frame[f])
        else:
            active = [
                t for t in list(tracker.tracks.values())
                if t.hits >= tracker.min_hits and t.misses <= tracker.max_age
            ]
        boxes = [t.box for t in active]
        timeline[f] = len(boxes)
        sink.write(apply_style(
            frame, boxes, style,
            labels=[f"{keyword} #{t.track_id}" for t in active],
            colors=[color_cycle(t.track_id) for t in active],
        ))
    sink.release()

    stats = {
        "frames": len(frames),
        "sampled": len(sampled_idx),
        "tracks_created": tracker._next_id - 1,
        "inference_s": round(infer_s, 2),
        "output": output_path,
    }
    print(f"done: {stats}")
    return stats


def visualize_detections(json_path: str, out_png: str = ""):
    """Detection-count timeline + per-frame box area plot (role of the
    reference's visualization.py:7-96)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    data = load_detection_data(json_path)
    det = data["detections"]
    frames = sorted(det)
    counts = [len(det[f]) for f in frames]
    areas = [
        sum((b[2] - b[0]) * (b[3] - b[1]) for b in det[f]) for f in frames
    ]

    fig, (ax1, ax2) = plt.subplots(2, 1, figsize=(10, 6), sharex=True)
    ax1.plot(frames, counts, drawstyle="steps-post")
    ax1.set_ylabel("detections")
    ax1.set_title(f"'{data.get('keyword', '?')}' in {data.get('video', '?')}")
    ax2.plot(frames, areas, drawstyle="steps-post")
    ax2.set_ylabel("total box area (frac)")
    ax2.set_xlabel("frame")
    out = out_png or os.path.splitext(json_path)[0] + "_timeline.png"
    fig.savefig(out, dpi=120, bbox_inches="tight")
    plt.close(fig)
    print(f"wrote {out}")
    return out


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", default="")
    p.add_argument("--output", default=None)
    p.add_argument("--detect", default="face")
    p.add_argument("--model", default="", help="safetensors checkpoint")
    p.add_argument("--config", default="2b", choices=["2b", "05b"])
    p.add_argument("--style", default="censor", choices=STYLES)
    p.add_argument("--grid", default="1x1",
                   help="RxC detection grid, e.g. 2x2")
    p.add_argument("--every-n", type=int, default=3)
    p.add_argument("--encode-batch", type=int, default=8)
    p.add_argument("--max-age", type=int, default=5)
    p.add_argument("--save-detections", default="")
    p.add_argument("--load-detections", default="")
    p.add_argument("--visualize", default="",
                   help="plot a saved detection JSON instead of processing")
    p.add_argument("--analyze", default="",
                   help="write the 8-plot analysis suite + stats for a "
                        "saved detection JSON and exit")
    p.add_argument("--timeline-video", default="",
                   help="render the animated timeline video for a saved "
                        "detection JSON and exit (composites the source "
                        "frames when --input is also given)")
    args = p.parse_args()

    if args.visualize:
        visualize_detections(args.visualize)
        return
    if args.analyze:
        from recipes.common.analysis import (
            analysis_plots, format_stats, stats_summary,
        )

        out_dir = os.path.splitext(args.analyze)[0] + "_analysis"
        paths = analysis_plots(args.analyze, out_dir)
        print("\n".join(paths))
        print(format_stats(stats_summary(args.analyze)))
        return
    if args.timeline_video:
        from recipes.common.analysis import render_timeline_video

        out = os.path.splitext(args.timeline_video)[0] + "_timeline.mp4"
        render_timeline_video(
            args.timeline_video, out, source_video=args.input or None
        )
        print(f"wrote {out}")
        return
    if not args.input:
        p.error("--input is required unless --visualize/--analyze/"
                "--timeline-video is given")

    from recipes.promptable_video_redaction import parse_grid

    output = args.output or os.path.splitext(args.input)[0] + "_moderated.mp4"
    model = None if args.load_detections else load_model(args.model, args.config)
    process_video(
        model, args.input, output, args.detect,
        style=args.style, grid=parse_grid(args.grid),
        every_n=args.every_n, encode_batch=args.encode_batch,
        max_age=args.max_age,
        save_detections=args.save_detections,
        load_detections=args.load_detections,
    )


if __name__ == "__main__":
    main()
