"""Webcam Gradio demo: live VQA over webcam frames.

Modernized replacement for the reference's stale webcam_gradio_demo.py.
Requires `pip install gradio`.
"""

import argparse
import sys

sys.path.insert(0, ".")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", type=str, default=None)
    parser.add_argument("--config", type=str, default=None)
    args = parser.parse_args()

    try:
        import gradio as gr
    except ImportError:
        raise SystemExit("gradio is not installed: pip install gradio")

    from moondream_tpu.config import MoondreamConfig  # noqa: F401
    from moondream_tpu.finetune import resolve_config
    from moondream_tpu.models.moondream import MoondreamModel
    from moondream_tpu.tokenizer import load_tokenizer
    from moondream_tpu.weights import load_params

    config = (
        resolve_config(args.config)
    )
    params = load_params(args.model, config) if args.model else None
    model = MoondreamModel(config, params=params, tokenizer=load_tokenizer())

    def answer(img, prompt):
        if img is None:
            return ""
        return model.query(img, prompt)["answer"]

    with gr.Blocks(title="moondream-tpu webcam") as demo:
        gr.Markdown("# 🌔 moondream-tpu — webcam")
        with gr.Row():
            cam = gr.Image(sources=["webcam"], type="pil", streaming=True)
            with gr.Column():
                prompt = gr.Textbox(label="Question", value="What do you see?")
                out = gr.Textbox(label="Answer")
        cam.stream(answer, [cam, prompt], out, time_limit=30, stream_every=2.0)

    demo.launch()


if __name__ == "__main__":
    main()
