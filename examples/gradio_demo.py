"""Gradio demo: streaming caption/query + detect overlay.

Modernized replacement for the reference's stale gradio_demo.py. Requires
`pip install gradio` (not bundled).
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

    from PIL import ImageDraw

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
            yield "", None
            return
        buffer = ""
        for chunk in model.query(img, prompt, stream=True)["answer"]:
            buffer += chunk
            yield buffer, None

    def detect(img, obj):
        if img is None:
            return None
        out = model.detect(img, obj)["objects"]
        img = img.copy()
        draw = ImageDraw.Draw(img)
        for o in out:
            draw.rectangle(
                [o["x_min"] * img.width, o["y_min"] * img.height,
                 o["x_max"] * img.width, o["y_max"] * img.height],
                outline="red", width=3,
            )
        return img

    with gr.Blocks(title="moondream-tpu") as demo:
        gr.Markdown("# 🌔 moondream-tpu")
        with gr.Row():
            img = gr.Image(type="pil", label="Image")
            with gr.Column():
                prompt = gr.Textbox(label="Question", value="Describe this image.")
                out = gr.Textbox(label="Answer")
                btn = gr.Button("Ask")
                obj = gr.Textbox(label="Detect object", value="face")
                det_btn = gr.Button("Detect")
                det_img = gr.Image(type="pil", label="Detections")
        btn.click(answer, [img, prompt], [out, det_img])
        det_btn.click(detect, [img, obj], det_img)

    demo.queue().launch()


if __name__ == "__main__":
    main()
