#!/usr/bin/env python
"""Gradio web UI over the video recipes (role of the reference's
recipes/promptable-video-redaction/app.py and
recipes/promptable-content-moderation/app.py:371-617).

Three tabs, mirroring the reference app surface:
  * Process Video — open-vocabulary detect + redact with the full style
    set (censor/blur/pixel/mask variants), grid tiling, frame sampling,
    tracking toggle, and a test mode that limits processing to the first
    N seconds; detections are persisted next to the output for analysis.
  * Analyze Results — the 8-plot analysis suite + stats text over a saved
    detection JSON (reference app.py:119-369).
  * Timeline Video — the animated playhead timeline render, optionally
    composited under the source frames (reference video_visualization.py).

Gradio is an optional dependency: this module degrades to a clear error
message when it is not installed (this build environment has no gradio).
The `run_*` helpers are pure and importable without gradio for testing.
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _limit_video(path: str, max_seconds: float) -> str:
    """Test mode: copy the first `max_seconds` of a video to a temp file."""
    from recipes.common import VideoSink, VideoSource

    src = VideoSource(path)
    out = os.path.join(tempfile.mkdtemp(), "test_clip.mp4")
    sink = VideoSink(out, src.props.fps, (src.props.width, src.props.height))
    limit = int(src.props.fps * max_seconds)
    for i, frame in enumerate(src):
        if i >= limit:
            break
        sink.write(frame)
    src.release()
    sink.release()
    return out


def run_process(model, video, keyword, style, every_n, grid_rows, grid_cols,
                track, test_mode=False, test_seconds=3.0):
    """Process-tab backend; returns (output_mp4, detections_json)."""
    from recipes.promptable_content_moderation import (
        process_video as moderate,
    )
    from recipes.promptable_video_redaction import process_video as redact

    if test_mode:
        video = _limit_video(video, test_seconds)
    work = tempfile.mkdtemp()
    out = os.path.join(work, "out.mp4")
    dets = os.path.join(work, "detections.json")
    kwargs = dict(
        style=style, grid=(int(grid_rows), int(grid_cols)),
        every_n=int(every_n), save_detections=dets,
    )
    if track:
        moderate(model, video, out, keyword, **kwargs)
    else:
        redact(model, video, out, keyword, **kwargs)
    return out, dets


def run_analyze(json_path):
    """Analyze-tab backend; returns (list of 8 plot PNGs, stats text)."""
    from recipes.common.analysis import (
        analysis_plots, format_stats, stats_summary,
    )

    out_dir = tempfile.mkdtemp()
    paths = analysis_plots(json_path, out_dir)
    return paths, format_stats(stats_summary(json_path))


def run_timeline(json_path, source_video=None):
    """Timeline-tab backend; returns the rendered mp4 path."""
    from recipes.common.analysis import render_timeline_video

    out = os.path.join(tempfile.mkdtemp(), "timeline.mp4")
    return render_timeline_video(
        json_path, out, source_video=source_video or None
    )


def build_app(model):
    try:
        import gradio as gr
    except ImportError as e:
        raise RuntimeError(
            "gradio is not installed; install it to use the web UI, or use "
            "the CLI entry points (recipes.promptable_video_redaction / "
            "recipes.promptable_content_moderation) directly"
        ) from e

    from recipes.common import REGION_STYLES

    def process(video, keyword, style, every_n, rows, cols, track,
                test_mode, test_seconds):
        if not video:
            raise gr.Error("Please upload a video file")
        if not keyword:
            raise gr.Error("Please enter what to detect")
        return run_process(model, video, keyword, style, every_n, rows,
                           cols, track, test_mode, test_seconds)

    def analyze(json_file):
        if not json_file:
            raise gr.Error("Please upload a detection JSON")
        return run_analyze(json_file)

    def timeline(json_file, video):
        if not json_file:
            raise gr.Error("Please upload a detection JSON")
        return run_timeline(json_file, video)

    with gr.Blocks(title="moondream-tpu video moderation") as demo:
        gr.Markdown("# Promptable video redaction / moderation (TPU)")
        with gr.Tabs():
            with gr.Tab("Process Video"):
                with gr.Row():
                    with gr.Column():
                        video = gr.Video(label="input video")
                        keyword = gr.Textbox(
                            label="detect", value="face",
                            placeholder="anything: cigarette, logo, "
                                        "license plate...",
                        )
                        style = gr.Radio(
                            list(REGION_STYLES), value="censor",
                            label="redaction style",
                        )
                        btn = gr.Button("Process", variant="primary")
                        with gr.Accordion("Advanced settings", open=False):
                            every_n = gr.Slider(
                                1, 30, value=3, step=1,
                                label="detect every N frames",
                            )
                            with gr.Row():
                                rows = gr.Slider(1, 4, value=1, step=1,
                                                 label="grid rows")
                                cols = gr.Slider(1, 4, value=1, step=1,
                                                 label="grid cols")
                            track = gr.Checkbox(
                                label="track between frames "
                                      "(scene-cut-aware)", value=True,
                            )
                            test_mode = gr.Checkbox(
                                label="test mode (first N seconds only)",
                                value=False,
                            )
                            test_seconds = gr.Slider(
                                1, 30, value=3, step=1,
                                label="test duration (s)",
                            )
                    with gr.Column():
                        out_video = gr.Video(label="processed video")
                        out_json = gr.File(
                            label="detections JSON (feed to Analyze / "
                                  "Timeline)",
                        )
                btn.click(
                    process,
                    [video, keyword, style, every_n, rows, cols, track,
                     test_mode, test_seconds],
                    [out_video, out_json],
                )
            with gr.Tab("Analyze Results"):
                with gr.Row():
                    json_in = gr.File(label="detection JSON",
                                      file_types=[".json"])
                    analyze_btn = gr.Button("Analyze", variant="primary")
                plots = gr.Gallery(label="analysis plots", columns=4)
                stats = gr.Textbox(label="stats", lines=12)
                analyze_btn.click(analyze, [json_in], [plots, stats])
            with gr.Tab("Timeline Video"):
                with gr.Row():
                    json_tl = gr.File(label="detection JSON",
                                      file_types=[".json"])
                    video_tl = gr.Video(
                        label="source video (optional composite)",
                    )
                tl_btn = gr.Button("Render timeline", variant="primary")
                tl_out = gr.Video(label="timeline video")
                tl_btn.click(timeline, [json_tl, video_tl], [tl_out])
    return demo


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", default="", help="safetensors checkpoint")
    p.add_argument("--config", default="2b", choices=["2b", "05b"])
    p.add_argument("--port", type=int, default=7860)
    args = p.parse_args()

    from recipes.gaze_detection_video import load_model

    model = load_model(args.model, args.config)
    build_app(model).launch(server_port=args.port)


if __name__ == "__main__":
    main()
