#!/usr/bin/env python
"""Real-checkpoint smoke test against released vikhyatk/moondream2 weights.

The reference works out of the box with hub checkpoints
(/root/reference/moondream/torch/weights.py:30-117, int4 pack
layers.py:38-77); this repo's loaders are otherwise validated against
synthetic checkpoints only (tests/test_checkpoint_loading.py). Run this the
moment the bench host has network access:

    python tools/real_checkpoint_smoke.py                  # bf16 2B
    python tools/real_checkpoint_smoke.py --int4           # int4 2B
    python tools/real_checkpoint_smoke.py --file path.st   # already downloaded

It downloads the safetensors checkpoint (legacy naming scheme), loads it
through moondream_tpu.weights (both naming schemes are auto-detected),
runs caption / query / detect / point / gaze sanity checks on a synthetic
image, and prints the outputs for eyeball validation plus basic
plausibility asserts (non-empty caption, detect returns a list, outputs
differ between two different images).

Environment status (2026-08-18, round 3): NO egress from this host —
`urllib.request.urlopen("https://huggingface.co/...")` fails with
`URLError <urlopen error [Errno -2] Name or service not known>` (DNS).
Recorded in BASELINE.md; this script is the prepared path for when that
changes.
"""

import argparse
import sys
import urllib.request

URLS = {
    "bf16": (
        "https://huggingface.co/vikhyatk/moondream2/resolve/main/"
        "model.safetensors"
    ),
    # the int4 variant ships as a separate revision/file; check the repo
    # listing at download time (naming has changed across releases)
    "int4": (
        "https://huggingface.co/vikhyatk/moondream2/resolve/main/"
        "model.int4.safetensors"
    ),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--file", help="already-downloaded checkpoint path")
    ap.add_argument("--int4", action="store_true")
    ap.add_argument("--config", default="2b", choices=["2b", "05b"])
    ap.add_argument("--eval", default="",
                    help="optionally run one eval subset, e.g. 'pope'")
    ap.add_argument("--tokenizer", default="moondream/starmie-v1",
                    help="hub name or tokenizer.json path (released 2B "
                         "checkpoints pair with moondream/starmie-v1; "
                         "legacy ones with gpt2 ids — see SURVEY §2.4)")
    args = ap.parse_args()

    path = args.file
    if path is None:
        url = URLS["int4" if args.int4 else "bf16"]
        path = "/tmp/" + url.rsplit("/", 1)[-1]
        print(f"downloading {url} -> {path}", file=sys.stderr)
        try:
            urllib.request.urlretrieve(url, path)
        except Exception as e:
            print(
                f"DOWNLOAD BLOCKED: {type(e).__name__}: {e}\n"
                "(expected on the sandboxed bench host — record this in "
                "BASELINE.md; rerun where egress exists)",
                file=sys.stderr,
            )
            return 2

    import numpy as np
    from PIL import Image

    from moondream_tpu.config import MOONDREAM_05B, MOONDREAM_2B
    from moondream_tpu.models.moondream import MoondreamModel
    from moondream_tpu.weights import load_params
    from moondream_tpu.tokenizer import load_tokenizer

    config = MOONDREAM_2B if args.config == "2b" else MOONDREAM_05B
    print(f"loading {path} ...", file=sys.stderr)
    params = load_params(path, config, runtime_int4=args.int4)
    model = MoondreamModel(
        config, params=params, tokenizer=load_tokenizer(args.tokenizer)
    )

    rng = np.random.default_rng(0)
    img_a = Image.fromarray(
        rng.integers(0, 255, size=(480, 640, 3), dtype=np.uint8)
    )
    img_b = Image.new("RGB", (640, 480), (200, 30, 30))
    greedy = {"temperature": 0.0, "top_p": 0.0, "max_tokens": 64}

    cap_a = model.caption(img_a, "normal", settings=greedy)["caption"]
    cap_b = model.caption(img_b, "normal", settings=greedy)["caption"]
    print(f"caption A: {cap_a!r}")
    print(f"caption B: {cap_b!r}")
    assert cap_a.strip() and cap_b.strip(), "empty caption from real weights"
    assert cap_a != cap_b, "identical captions for different images"

    ans = model.query(img_b, "What color is the image?", settings=greedy)
    print(f"query: {ans['answer']!r}")
    assert ans["answer"].strip()

    det = model.detect(img_b, "red square", settings={"max_objects": 5})
    print(f"detect: {det['objects']}")
    assert isinstance(det["objects"], list)

    pts = model.point(img_b, "center", settings={"max_objects": 5})
    print(f"point: {pts['points']}")
    assert isinstance(pts["points"], list)

    gaze = model.detect_gaze(img_a, eye=(0.5, 0.5))
    print(f"gaze: {gaze}")

    if args.eval:
        import importlib

        mod = importlib.import_module(f"moondream_tpu.eval.{args.eval}")
        fn = getattr(mod, f"eval_{args.eval}")
        print(fn(model))

    print("real-checkpoint smoke OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
