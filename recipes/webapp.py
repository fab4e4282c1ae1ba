#!/usr/bin/env python
"""Gradio web UI over the video recipes (role of the reference's
recipes/promptable-video-redaction/app.py and
recipes/promptable-content-moderation/app.py).

Gradio is an optional dependency: this module degrades to a clear error
message when it is not installed (this build environment has no gradio).
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def build_app(model):
    try:
        import gradio as gr
    except ImportError as e:
        raise RuntimeError(
            "gradio is not installed; install it to use the web UI, or use "
            "the CLI entry points (recipes.promptable_video_redaction / "
            "recipes.promptable_content_moderation) directly"
        ) from e

    from recipes.promptable_content_moderation import (
        process_video as moderate,
    )
    from recipes.promptable_video_redaction import STYLES
    from recipes.promptable_video_redaction import process_video as redact

    def run(video, keyword, style, every_n, track):
        out = os.path.join(tempfile.mkdtemp(), "out.mp4")
        fn = moderate if track else redact
        fn(model, video, out, keyword, style=style, every_n=int(every_n))
        return out

    with gr.Blocks(title="moondream-tpu video redaction") as demo:
        gr.Markdown("## Promptable video redaction / moderation (TPU)")
        with gr.Row():
            with gr.Column():
                video = gr.Video(label="input video")
                keyword = gr.Textbox(label="detect", value="face")
                style = gr.Dropdown(list(STYLES), value="censor", label="style")
                every_n = gr.Slider(1, 30, value=3, step=1,
                                    label="detect every N frames")
                track = gr.Checkbox(label="track between frames", value=True)
                btn = gr.Button("process")
            with gr.Column():
                out = gr.Video(label="output")
        btn.click(run, [video, keyword, style, every_n, track], out)
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
