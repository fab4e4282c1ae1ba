#!/usr/bin/env python
"""On-chip parity + capacity check for prefix-shared serving.

CPU tests (tests/test_prefix_share.py) exercise the XLA fallback; this
drives the REAL Pallas ragged kernels (paired layout, int8 KV variant)
on the TPU: a prefix-shared pool must emit byte-identical tokens to the
plain pool over a mixed same-image/distinct-image workload, and the
script reports the per-slot HBM saving (suffix cache + shared prefixes
vs full slots).

    python tools/prefix_share_tpu.py --config 05b [--kv8] [--spec 4]
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
from PIL import Image

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="05b", choices=["2b", "05b"])
    ap.add_argument("--kv8", action="store_true")
    ap.add_argument("--spec", type=int, default=0)
    ap.add_argument("--n-slots", type=int, default=8)
    ap.add_argument("--slot-len", type=int, default=1024)
    ap.add_argument("--max-tokens", type=int, default=16)
    args = ap.parse_args()

    import dataclasses

    from moondream_tpu.config import MOONDREAM_05B, MOONDREAM_2B
    from moondream_tpu.models.moondream import MoondreamModel
    from moondream_tpu.models.serve import ContinuousBatchingEngine
    from moondream_tpu.tokenizer import ByteTokenizer

    config = MOONDREAM_2B if args.config == "2b" else MOONDREAM_05B
    if args.kv8:
        config = dataclasses.replace(
            config, text=dataclasses.replace(config.text, kv_int8=True)
        )
    print(f"building {args.config} (random weights, kv8={args.kv8})...")
    model = MoondreamModel(config, tokenizer=ByteTokenizer(), seed=0)

    rng = np.random.default_rng(0)
    imgs = [
        Image.fromarray(rng.integers(0, 255, (480, 640, 3), np.uint8))
        for _ in range(2)
    ]
    encs = [model.encode_image(im) for im in imgs]

    def run(prefix_share):
        eng = ContinuousBatchingEngine(
            model, n_slots=args.n_slots, slot_len=args.slot_len, chunk=8,
            speculative=args.spec, prefix_share=prefix_share,
        )
        rids = []
        for i in range(args.n_slots):
            enc = encs[i % 2] if i < args.n_slots - 1 else encs[1]
            q = "what?" if i % 3 == 2 else None
            rids.append(
                eng.submit(enc, question=q, max_tokens=args.max_tokens)
            )
        t0 = time.perf_counter()
        out = eng.drain()
        dt = time.perf_counter() - t0
        kv_bytes = sum(
            x.nbytes for x in [eng.kv.k, eng.kv.v]
            + ([eng.kv.ks, eng.kv.vs] if eng.kv.ks is not None else [])
        )
        pref_bytes = 0
        if prefix_share:
            pref_bytes = sum(
                x.nbytes
                for x in [eng.kv_pref.k, eng.kv_pref.v]
                + ([eng.kv_pref.ks, eng.kv_pref.vs]
                   if eng.kv_pref.ks is not None else [])
            )
        return [out[r] for r in rids], dt, kv_bytes, pref_bytes, eng

    plain, dt0, kvb0, _, _ = run(False)
    shared, dt1, kvb1, pb1, eng = run(True)

    ok = plain == shared
    print(f"parity: {'IDENTICAL' if ok else 'MISMATCH'} "
          f"({len(plain)} requests)")
    if not ok:
        for i, (a, b) in enumerate(zip(plain, shared)):
            if a != b:
                print(f"  row {i}: {a!r} != {b!r}")
        raise SystemExit(1)

    n_uniq = len({id(e) for e in encs})
    print(f"pool KV: plain {kvb0 / 2**20:.0f} MiB -> shared "
          f"{kvb1 / 2**20:.0f} MiB suffix + {pb1 / 2**20:.0f} MiB prefix "
          f"pool ({args.n_slots} slots, {n_uniq} distinct images)")
    # what the prefix pool ACTUALLY needs for this workload: one entry
    # per distinct image (the allocation is prefix_entries, conservatively
    # n_slots by default)
    per_entry = pb1 / eng.kv_pref.k.shape[1]
    eff = kvb1 + per_entry * n_uniq
    print(f"effective (suffix + {n_uniq} live entries): "
          f"{eff / 2**20:.0f} MiB = {eff / kvb0:.2f}x of plain; "
          f"same-HBM slot capacity x{kvb0 / eff:.2f}")
    print(f"drain wall: plain {dt0:.2f}s, shared {dt1:.2f}s")


if __name__ == "__main__":
    main()
