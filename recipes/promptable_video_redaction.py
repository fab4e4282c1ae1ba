#!/usr/bin/env python
"""Promptable video redaction: detect anything by open-vocabulary prompt and
censor / box / hitmarker it in every frame.

TPU-native re-design of recipes/promptable-video-redaction/main.py: the
frame (and optional grid-tile) image encodes run as TPU batches via
`encode_images`, detections are union-merged across tiles, temporally
filtered, persisted to JSON for restyling, and carried across skipped
frames. Drawing is direct cv2 (no matplotlib round-trip).

Usage:
  python -m recipes.promptable_video_redaction --input in.mp4 \
      --detect "license plate" --model model.safetensors \
      [--style censor|mask-censor|fuzzy-blur|obfuscated-pixel|...] \
      [--grid 2x2] [--every-n 3] \
      [--save-detections d.json | --load-detections d.json]

Styles cover the reference's full censoring surface (censor, bounding-box,
hitmarker, fuzzy-blur, pixelated-blur, intense-pixelated-blur,
obfuscated-pixel) plus mask-shaped redaction (mask / mask-censor /
mask-blur — soft object-silhouette fills, the SAM-overlay role without a
segmentation model). See recipes/common/overlay.py:REGION_STYLES.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from recipes.common import (  # noqa: E402
    REGION_STYLES as STYLES,  # noqa: F401 - full style surface (overlay.py)
    VideoSink,
    VideoSource,
    apply_style,
    load_detection_data,
    save_detection_data,
)
from recipes.common.pipeline import detect_frames, spread_detections  # noqa: E402
from recipes.common.tiling import filter_temporal_outliers  # noqa: E402
from recipes.gaze_detection_video import load_model  # noqa: E402


def render(frame, boxes, style: str, label: str):
    return apply_style(frame, boxes, style, labels=[label] * len(boxes))


def parse_grid(s: str):
    try:
        r, c = s.lower().split("x")
        r, c = int(r), int(c)
        if r < 1 or c < 1:
            raise ValueError
        return r, c
    except ValueError:
        raise argparse.ArgumentTypeError(
            f"invalid grid {s!r}: expected RxC with positive integers, e.g. 2x2"
        )


def process_video(
    model,
    input_path: str,
    output_path: str,
    keyword: str,
    style: str = "censor",
    grid=(1, 1),
    every_n: int = 3,
    encode_batch: int = 8,
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
        per_frame = data["detections"]
        sampled_idx = sorted(per_frame)
        sampled_boxes = [per_frame[i] for i in sampled_idx]
        print(f"loaded detections for {len(sampled_idx)} frames")
    else:
        sampled_idx = list(range(0, len(frames), max(1, every_n)))
        print(
            f"{len(frames)} frames; detecting '{keyword}' on "
            f"{len(sampled_idx)} sampled frames, grid={grid[0]}x{grid[1]}"
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
                    "grid": list(grid),
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

    full = spread_detections(len(frames), sampled_idx, sampled_boxes)
    sink = VideoSink(
        output_path, src.props.fps, (src.props.width, src.props.height)
    )
    n_boxes = 0
    for f, frame in enumerate(frames):
        boxes = full[f]
        n_boxes += len(boxes)
        sink.write(render(frame, boxes, style, keyword))
    sink.release()

    stats = {
        "frames": len(frames),
        "sampled": len(sampled_idx),
        "total_boxes_drawn": n_boxes,
        "inference_s": round(infer_s, 2),
        "output": output_path,
    }
    print(f"done: {stats}")
    return stats


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True)
    p.add_argument("--output", default=None)
    p.add_argument("--detect", default="face", help="what to redact")
    p.add_argument("--model", default="", help="safetensors checkpoint")
    p.add_argument("--config", default="2b", choices=["2b", "05b"])
    p.add_argument("--style", default="censor", choices=STYLES)
    p.add_argument("--grid", default="1x1", type=parse_grid,
                   help="RxC detection grid")
    p.add_argument("--every-n", type=int, default=3)
    p.add_argument("--encode-batch", type=int, default=8)
    p.add_argument("--save-detections", default="")
    p.add_argument("--load-detections", default="")
    args = p.parse_args()

    output = args.output or os.path.splitext(args.input)[0] + "_redacted.mp4"
    # restyling from persisted detections needs no model at all
    model = None if args.load_detections else load_model(args.model, args.config)
    process_video(
        model, args.input, output, args.detect,
        style=args.style, grid=args.grid,
        every_n=args.every_n, encode_batch=args.encode_batch,
        save_detections=args.save_detections,
        load_detections=args.load_detections,
    )


if __name__ == "__main__":
    main()
