#!/usr/bin/env python
"""Load generator for the moondream-tpu HTTP server.

Drives a running `python -m moondream_tpu.serve_http` instance with
concurrent caption/query traffic and reports throughput + latency
percentiles, cross-checked against the server's own /metrics deltas
(generated tokens, error counts). Prints ONE JSON line.

    python tools/serving_load_test.py --url http://127.0.0.1:8080 \
        --requests 64 --concurrency 8 --max-tokens 64

No dependencies beyond the standard library + numpy + PIL (for the
synthetic image).
"""

from __future__ import annotations

import argparse
import base64
import io
import json
import sys
import threading
import time
import urllib.request


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_image_b64(seed: int, size=(1080, 1440)) -> str:
    import numpy as np
    from PIL import Image

    rng = np.random.default_rng(seed)
    im = Image.fromarray(
        rng.integers(0, 255, size=(size[0], size[1], 3), dtype=np.uint8)
    )
    buf = io.BytesIO()
    im.save(buf, format="JPEG", quality=90)
    return base64.b64encode(buf.getvalue()).decode()


def get_json(url: str, timeout: float = 60.0):
    with urllib.request.urlopen(url, timeout=timeout) as r:
        return json.loads(r.read())


def post_json(url: str, payload: dict, timeout: float):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return json.loads(r.read())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--url", default="http://127.0.0.1:8080")
    ap.add_argument("--requests", type=int, default=32)
    ap.add_argument("--concurrency", type=int, default=8)
    ap.add_argument("--max-tokens", type=int, default=64)
    ap.add_argument("--question", default=None,
                    help="send /v1/query with this question instead of "
                         "/v1/caption")
    ap.add_argument("--images", type=int, default=4,
                    help="number of distinct synthetic images cycled "
                         "through (exercises the encode path; 1 + "
                         "--encode-cache on the server = pure decode)")
    ap.add_argument("--image-size", default="1080x1440",
                    help="HxW of the synthetic images (full 12-crop "
                         "tiling at the default)")
    ap.add_argument("--timeout", type=float, default=600.0)
    args = ap.parse_args()

    h, w = (int(v) for v in args.image_size.split("x"))
    log(f"building {args.images} synthetic {h}x{w} images...")
    images = [make_image_b64(i, (h, w)) for i in range(args.images)]

    path = "/v1/query" if args.question else "/v1/caption"

    def payload(i):
        p = {"image_b64": images[i % len(images)],
             "max_tokens": args.max_tokens}
        if args.question:
            p["question"] = args.question
        return p

    # health + warm the compile before timing
    health = get_json(args.url + "/healthz")
    log(f"server: {health}")
    m0 = get_json(args.url + "/metrics")
    log("warming (1 request per distinct image shape)...")
    post_json(args.url + path, payload(0), args.timeout)

    m0 = get_json(args.url + "/metrics")
    latencies: list = []
    errors = [0]
    counter = [0]
    lock = threading.Lock()

    def worker():
        while True:
            with lock:
                if counter[0] >= args.requests:
                    return
                i = counter[0]
                counter[0] += 1
            t0 = time.perf_counter()
            try:
                post_json(args.url + path, payload(i), args.timeout)
                dt = time.perf_counter() - t0
                with lock:
                    latencies.append(dt)
            except Exception as e:
                log(f"request {i} failed: {e}")
                with lock:
                    errors[0] += 1

    log(f"running {args.requests} requests at concurrency "
        f"{args.concurrency}...")
    t0 = time.perf_counter()
    threads = [
        threading.Thread(target=worker) for _ in range(args.concurrency)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    duration = time.perf_counter() - t0
    m1 = get_json(args.url + "/metrics")

    lat = sorted(latencies)
    tokens = m1["generated_tokens"] - m0["generated_tokens"]
    out = {
        "requests": args.requests,
        "concurrency": args.concurrency,
        "duration_s": round(duration, 2),
        "requests_per_sec": round(len(lat) / duration, 3) if duration else 0,
        "latency_ms": {
            "p50": round(1000 * lat[len(lat) // 2], 1) if lat else None,
            "p95": round(
                1000 * lat[min(len(lat) - 1, int(len(lat) * 0.95))], 1
            ) if lat else None,
            "max": round(1000 * lat[-1], 1) if lat else None,
        },
        "generated_tokens": tokens,
        "tokens_per_sec": round(tokens / duration, 1) if duration else 0,
        "errors": errors[0],
        "endpoint": path,
        "max_tokens": args.max_tokens,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
