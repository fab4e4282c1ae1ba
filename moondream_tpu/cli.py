"""CLI: demo of every capability + benchmark mode.

Run: python -m moondream_tpu.cli --image x.jpg --prompt "..." --model ckpt.safetensors
     python -m moondream_tpu.cli ... --benchmark

Capability-parity with the reference CLI
(/root/reference/moondream/torch/sample.py): captions (short/normal),
query, reasoning query, detect (+box overlay), spatial-ref queries, point
(+dot overlay), gaze detection, and a --benchmark mode reporting image-encode
ms and decode tokens/sec (5 warmups, 10 timed runs).
"""

from __future__ import annotations

import argparse
import os
import time


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--image", "-i", type=str, default=None)
    parser.add_argument("--prompt", "-p", type=str, default=None)
    parser.add_argument("--demo", action="store_true",
                        help="run every capability once on --image (or a "
                             "generated test image); no prompt needed")
    parser.add_argument("--model", "-m", type=str, default=None,
                        help="checkpoint path (omit for random weights)")
    parser.add_argument("--config", "-c", type=str, default=None)
    parser.add_argument("--tokenizer", type=str, default=None)
    parser.add_argument("--max-tokens", "-t", type=int, default=200)
    parser.add_argument("--sampler", "-s", type=str, default="greedy")
    parser.add_argument("--benchmark", "-b", action="store_true")
    parser.add_argument("--int4", action="store_true",
                        help="serve text weights packed int4 through the "
                             "fused dequant-matmul kernel (1.7x decode)")
    parser.add_argument("--int8-text", action="store_true",
                        help="serve text weights as int8 w8a8 (native MXU "
                             "int8 matmuls; 2x less weight traffic at any "
                             "batch — the large-batch/speculative-verify "
                             "counterpart to --int4)")
    parser.add_argument("--kv-int8", action="store_true",
                        help="store the KV cache as int8 codes + per-row "
                             "scales: halves cache HBM footprint and "
                             "decode cache-read traffic (slight numeric "
                             "drift vs bf16 caches)")
    parser.add_argument("--spec", type=int, default=0, metavar="K",
                        help="speculative greedy decoding with K-token "
                             "n-gram drafts (exact: outputs identical to "
                             "plain greedy; applies when temperature=0)")
    parser.add_argument("--int8-vision", action="store_true",
                        help="quantize the ViT block matmuls to int8 "
                             "(2x MXU rate; ~15%% faster encode). PTQ — "
                             "validate accuracy on your checkpoint first; "
                             "the reference's int4 checkpoints quantize "
                             "text+region only")
    args = parser.parse_args()

    import jax
    from PIL import Image, ImageDraw

    from .models.moondream import MoondreamModel
    from .tokenizer import load_tokenizer
    from .weights import load_params

    print(f"Devices: {jax.devices()}")

    from .finetune import resolve_config

    config = resolve_config(args.config)  # None/'2b'/'05b' or a JSON path
    if args.kv_int8:
        import dataclasses

        config = dataclasses.replace(
            config, text=dataclasses.replace(config.text, kv_int8=True)
        )
    params = (
        load_params(args.model, config, runtime_int4=args.int4,
                    runtime_int8=args.int8_text)
        if args.model
        else None
    )
    model = MoondreamModel(
        config, params=params, tokenizer=load_tokenizer(args.tokenizer)
    )
    if params is None and (args.int4 or args.int8_text):
        # random-weights demo path: quantize the freshly initialized text tree
        from .models.text import (
            quantize_text_params, quantize_text_params_int8,
        )

        q = quantize_text_params if args.int4 else quantize_text_params_int8
        model.params = {
            **model.params, "text": q(model.params["text"])
        }
    if args.int8_vision:
        from .models.vision import quantize_vision_params

        model.params = {
            **model.params,
            "vision": quantize_vision_params(model.params["vision"]),
        }

    if args.image:
        if not os.path.exists(args.image):
            raise FileNotFoundError(f"Image not found at {args.image}")
        image = Image.open(args.image)
    elif args.demo:
        import numpy as np

        rng = np.random.default_rng(0)
        arr = rng.integers(0, 255, (480, 640, 3), dtype=np.uint8)
        arr[160:320, 220:420] = (250, 250, 250)  # a "white square" to find
        image = Image.fromarray(arr)
        print("(no --image given: using a generated test image)")
    else:
        parser.error("--image is required unless --demo is given")

    if args.prompt is None:
        if not args.demo:
            parser.error("--prompt is required unless --demo is given")
        args.prompt = "What is the white shape in this image?"

    settings = {"max_tokens": args.max_tokens}
    if args.sampler == "greedy":
        settings["temperature"] = 0.0
    if args.spec:
        settings["speculative"] = args.spec

    if args.benchmark:
        _benchmark(model, image, args.prompt, settings)
        return

    encoded_image = model.encode_image(image)

    for length in ("short", "normal"):
        print(f"Caption: {length}")
        for t in model.caption(encoded_image, length, stream=True, settings=settings)[
            "caption"
        ]:
            print(t, end="", flush=True)
        print("\n")

    print("Query:", args.prompt)
    for t in model.query(encoded_image, args.prompt, stream=True, settings=settings)[
        "answer"
    ]:
        print(t, end="", flush=True)
    print("\n")

    reasoning_prompt = "How many objects are in this image?"
    print("Query (reasoning):", reasoning_prompt)
    resp = model.query(
        encoded_image, reasoning_prompt, reasoning=True, stream=True,
        settings=settings,
    )
    print("Reasoning:", resp["reasoning"])
    for t in resp["answer"]:
        print(t, end="", flush=True)
    print("\n")

    obj = "object"
    print(f"Detect: {obj}")
    objs = model.detect(encoded_image, obj)["objects"]
    print(f"Found {len(objs)}")
    draw = ImageDraw.Draw(image)
    for o in objs:
        draw.rectangle(
            [o["x_min"] * image.width, o["y_min"] * image.height,
             o["x_max"] * image.width, o["y_max"] * image.height],
            outline="red", width=2,
        )
    image.save("detect.jpg")

    if objs:
        print("Spatial query: What is this?")
        for t in model.query(
            encoded_image,
            "What is this?",
            spatial_refs=[
                (objs[0]["x_min"], objs[0]["y_min"], objs[0]["x_max"], objs[0]["y_max"])
            ],
            stream=True,
            settings=settings,
        )["answer"]:
            print(t, end="", flush=True)
        print("\n")

    print("Point: object")
    points = model.point(encoded_image, "object")["points"]
    print(f"Found {len(points)}")
    for p in points:
        x, y = p["x"] * image.width, p["y"] * image.height
        draw.ellipse([x - 5, y - 5, x + 5, y + 5], fill="red")
    image.save("point.jpg")

    print("Gaze:", model.detect_gaze(encoded_image, (0.5, 0.5))["gaze"])


def _benchmark(model, image, prompt, settings):
    import jax

    for _ in range(5):
        encoded_image = model.encode_image(image)
        for _ in model.query(encoded_image, prompt, stream=True, settings=settings)[
            "answer"
        ]:
            pass

    encode_times = []
    query_speeds = []
    for _ in range(10):
        t0 = time.perf_counter()
        encoded_image = model.encode_image(image)
        jax.block_until_ready(encoded_image.k)
        encode_times.append((time.perf_counter() - t0) * 1000)

        tokens = []
        t0 = time.perf_counter()
        for t in model.query(encoded_image, prompt, stream=True, settings=settings)[
            "answer"
        ]:
            tokens.append(t)
        dt = time.perf_counter() - t0
        query_speeds.append(len(tokens) / dt if dt > 0 else 0.0)

    print("\nBenchmark Results (10 runs):")
    print("Image Encoding Time (ms):")
    print(f"  Mean: {sum(encode_times)/len(encode_times):.2f}")
    print(f"  Min:  {min(encode_times):.2f}")
    print(f"  Max:  {max(encode_times):.2f}")
    print("\nQuery Speed (tokens/sec):")
    print(f"  Mean: {sum(query_speeds)/len(query_speeds):.2f}")
    print(f"  Min:  {min(query_speeds):.2f}")
    print(f"  Max:  {max(query_speeds):.2f}")


if __name__ == "__main__":
    main()
