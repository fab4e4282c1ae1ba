"""Batched multi-image pipeline.

Modernized replacement for the reference's stale batch_generate_example.py
(which imports a deleted module and loops sequentially,
/root/reference/batch_generate_example.py): encodes and answers a list of
(image, prompt) pairs, overlapping host preprocessing with device compute.

Run: python examples/batch_generate_example.py --model ckpt.safetensors \
        --images a.jpg b.jpg --prompt "Describe this image."
"""

import argparse
import sys
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, ".")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", type=str, default=None)
    parser.add_argument("--config", type=str, default=None)
    parser.add_argument("--images", nargs="+", required=True)
    parser.add_argument("--prompt", type=str, default="Describe this image.")
    args = parser.parse_args()

    from PIL import Image

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

    images = [Image.open(p) for p in args.images]

    # Pipeline: host-side crop preprocessing for image i+1 overlaps device
    # compute for image i (the reference's batch_answer is a plain loop).
    with ThreadPoolExecutor(max_workers=2) as pool:
        encoded = list(pool.map(model.encode_image, images))

    for path, enc in zip(args.images, encoded):
        answer = model.query(enc, args.prompt)["answer"]
        print(f"{path}: {answer}")


if __name__ == "__main__":
    main()
