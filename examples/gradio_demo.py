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

    # ---- multi-turn chat with history (the reference's legacy demos
    # documented this flow, gradio_demo.py:52-105 / root sample.py): prior
    # turns fold into the question as "Question/Answer" pairs, and the
    # image encodes ONCE per upload (EncodedImage reuse across turns).
    import hashlib

    import numpy as np

    _enc_cache = {}

    def _encoded(img):
        key = hashlib.sha256(np.asarray(img).tobytes()).hexdigest()
        if key not in _enc_cache:
            _enc_cache.clear()  # keep exactly one image's KV snapshot
            _enc_cache[key] = model.encode_image(img)
        return _enc_cache[key]

    def chat_fn(img, history, msg):
        history = list(history or [])
        if img is None or not (msg or "").strip():
            return history, ""
        convo = "".join(
            f"Question: {u}\n\nAnswer: {a}\n\n" for u, a in history
        )
        question = (convo + "Question: " + msg) if convo else msg
        ans = model.query(_encoded(img), question)["answer"]
        return history + [(msg, ans)], ""

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

        gr.Markdown("## Chat (multi-turn, history folded into the prompt)")
        with gr.Row():
            chatbox = gr.Chatbot(label="Conversation")
        with gr.Row():
            chat_msg = gr.Textbox(
                label="Message", value="What is in this image?", scale=4
            )
            chat_btn = gr.Button("Send")
            chat_clear = gr.Button("Clear")
        chat_btn.click(chat_fn, [img, chatbox, chat_msg], [chatbox, chat_msg])
        chat_msg.submit(chat_fn, [img, chatbox, chat_msg], [chatbox, chat_msg])
        chat_clear.click(lambda: ([], ""), None, [chatbox, chat_msg])

    demo.queue().launch()


if __name__ == "__main__":
    main()
