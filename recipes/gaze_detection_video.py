#!/usr/bin/env python
"""Gaze detection on video: find faces, detect each face's gaze target, and
render face boxes + fading gaze lines per frame.

TPU-native re-design of recipes/gaze-detection-video/gaze-detection-video.py:
instead of one `detect`+`detect_gaze` model call per face per frame with a
matplotlib figure round-trip, sampled frames are encoded as one TPU batch
(`encode_images`), each frame's encoded KV snapshot is reused for the face
detect AND every per-face gaze decode, and drawing is direct cv2. Detections
are carried to skipped frames so output keeps full frame rate.

Usage:
  python -m recipes.gaze_detection_video --input in.mp4 --output out.mp4 \
      --model model.safetensors [--config 2b] [--every-n 5]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from typing import List

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from recipes.common import (  # noqa: E402
    VideoSink,
    VideoSource,
    color_cycle,
    draw_gaze,
)
from recipes.common.pipeline import _to_pil, spread_detections  # noqa: E402


def load_model(model_path: str, config_name: str = "2b"):
    """Build a MoondreamModel from a checkpoint (or random weights for a
    dry run when no checkpoint is given)."""
    from moondream_tpu.config import MOONDREAM_05B, MOONDREAM_2B
    from moondream_tpu.models.moondream import MoondreamModel

    config = MOONDREAM_2B if config_name == "2b" else MOONDREAM_05B
    if model_path:
        from moondream_tpu.tokenizer import load_tokenizer
        from moondream_tpu.weights import load_params

        params = load_params(model_path, config)
        tok_path = os.environ.get("MOONDREAM_TOKENIZER", "tokenizer.json")
        tokenizer = load_tokenizer(tok_path) if os.path.exists(tok_path) else None
        return MoondreamModel(config, params=params, tokenizer=tokenizer)
    print("WARNING: no --model given; using random weights (smoke test only)")
    return MoondreamModel(config, seed=0)


def process_video(
    model,
    input_path: str,
    output_path: str,
    every_n: int = 5,
    encode_batch: int = 8,
    trail_len: int = 12,
) -> dict:
    src = VideoSource(input_path)
    frames = list(src)
    src.release()
    if not frames:
        raise ValueError(f"no frames in {input_path}")

    sampled_idx = list(range(0, len(frames), max(1, every_n)))
    print(
        f"{len(frames)} frames @ {src.props.fps:.1f} fps; "
        f"running model on {len(sampled_idx)} sampled frames"
    )

    # batch-encode sampled frames, then per frame: detect faces on the
    # shared snapshot, then one gaze decode per face on the same snapshot
    t0 = time.perf_counter()
    results: List[List[dict]] = []
    for start in range(0, len(sampled_idx), encode_batch):
        batch_idx = sampled_idx[start : start + encode_batch]
        imgs = [_to_pil(frames[i]) for i in batch_idx]
        encs = (
            model.encode_images(imgs)
            if len(imgs) > 1
            else [model.encode_image(imgs[0])]
        )
        # ONE fused lockstep face-detect across the whole frame batch
        try:
            face_results = [
                r["objects"] for r in model.detect_batch(encs, "face")
            ]
        except Exception as e:
            print(f"batched face detect failed ({e}); falling back per-frame")
            face_results = []
            for fi, enc in zip(batch_idx, encs):
                try:
                    face_results.append(model.detect(enc, "face")["objects"])
                except Exception as e2:
                    print(f"frame {fi}: face detect failed: {e2}")
                    face_results.append([])
        for fi, enc, faces in zip(batch_idx, encs, face_results):
            faces_out = []
            # stable color assignment: sort faces by position
            faces = sorted(faces, key=lambda f: (f["y_min"], f["x_min"]))
            for face in faces:
                center = (
                    (face["x_min"] + face["x_max"]) / 2,
                    (face["y_min"] + face["y_max"]) / 2,
                )
                try:
                    gaze = model.detect_gaze(enc, eye=center)["gaze"]
                except Exception as e:
                    print(f"frame {fi}: gaze failed: {e}")
                    gaze = None
                faces_out.append({"face": face, "gaze": gaze})
            results.append(faces_out)
            print(
                f"  frame {fi}: {len(faces)} face(s), "
                f"{sum(1 for f in faces_out if f['gaze'])} gaze(s)"
            )
    infer_s = time.perf_counter() - t0

    # spread to full frame rate and render
    per_frame = spread_detections(
        len(frames), sampled_idx, results  # type: ignore[arg-type]
    )
    sink = VideoSink(
        output_path, src.props.fps, (src.props.width, src.props.height)
    )
    trails: dict = {}
    for f, frame in enumerate(frames):
        out = frame
        for i, det in enumerate(per_frame[f]):
            face, gaze = det["face"], det["gaze"]
            if gaze is None:
                continue
            box = (face["x_min"], face["y_min"], face["x_max"], face["y_max"])
            trail = trails.setdefault(i, [])
            out = draw_gaze(
                out, box, (gaze["x"], gaze["y"]), color_cycle(i), trail=trail
            )
            if f in sampled_idx:
                trail.insert(0, (gaze["x"], gaze["y"]))
                del trail[trail_len:]
        sink.write(out)
    sink.release()

    stats = {
        "frames": len(frames),
        "sampled": len(sampled_idx),
        "inference_s": round(infer_s, 2),
        "model_fps": round(len(sampled_idx) / max(infer_s, 1e-9), 2),
        "output": output_path,
    }
    print(f"done: {stats}")
    return stats


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True, help="input video path")
    p.add_argument("--output", default=None, help="output video path")
    p.add_argument("--model", default="", help="safetensors checkpoint")
    p.add_argument("--config", default="2b", choices=["2b", "05b"])
    p.add_argument("--every-n", type=int, default=5,
                   help="run the model every N frames")
    p.add_argument("--encode-batch", type=int, default=8,
                   help="frames per batched TPU image-encode")
    args = p.parse_args()

    output = args.output or os.path.splitext(args.input)[0] + "_gaze.mp4"
    model = load_model(args.model, args.config)
    process_video(
        model, args.input, output,
        every_n=args.every_n, encode_batch=args.encode_batch,
    )


if __name__ == "__main__":
    main()
