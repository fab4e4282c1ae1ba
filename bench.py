#!/usr/bin/env python
"""Benchmark harness (real TPU).

Measures the BASELINE.json north-star: images/sec/chip for 2B captioning
(encode + decode) plus component timings, mirroring the reference harness's
methodology (5 warmups, timed runs — /root/reference/moondream/torch/
sample.py:159-207). Weights are random-initialized on device: throughput is
weight-value-independent (identical matmul shapes), and no checkpoint is
reachable in this environment.

Architecture: each serving configuration runs in its OWN subprocess
(`--run-config NAME`). Two reasons, both learned the hard way:
  * an HBM OOM poisons the process's TPU backend permanently (verify
    SKILL gotcha) — in-process config sweeps lose every config after the
    first OOM;
  * per-config isolation keeps one config's leaked buffers from eating
    the next one's headroom.
The orchestrating parent aggregates the per-config JSON fragments and
prints exactly ONE JSON line to stdout:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N|null, ...extras}
Diagnostics go to stderr.

Chip-state policy: the tunneled chip is time-shared and intermittently
degrades several-fold for minutes, so per-config best-of-N cannot
separate config quality from chip-state luck. Every timed stream is
bracketed by a TF/s probe on BOTH sides; a rep counts as healthy only
when both probes pass, configs are compared on the MEDIAN of their
healthy reps, and the policy is symmetric across configs.
"""

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


HEALTHY_TFS = 80.0
# Tunnel H2D floor for a healthy rep: observed healthy windows read
# 46-92 MB/s on the 16MB device_put probe; the collapse mode reads
# ~1.5 MB/s (2026-08-20 full-sweep artifact — a spec_bf16 rep lost 23%
# throughput to it while both TF/s brackets passed). 20 MB/s separates
# the modes with wide margin on both sides.
HEALTHY_H2D_MBS = 20.0

# Configs ordered by SCORING VALUE (round-4 verdict #1): `headline_ab`
# interleaves ALL FOUR headline candidates A/B/A/B inside one probe
# window (round-4 verdict #2: serial per-config runs showed a 30% swing
# on bf16-spec across two healthy windows, so serial measurement cannot
# rank configs), then `single` (p50 — half the north star, driver-
# invisible since round 2) and `serving_full`. The legacy B=16 cells and
# the isolate-one-variable B=12 cells remain runnable via --configs but
# are out of the default order: the driver window (~1800s) fits ~4-6
# configs and these were all measured in BENCH_r02-r04/BASELINE.md.
CONFIG_ORDER = [
    "headline_ab",
    "single",
    "serving_full",
    "int4kv8_spec_pipelined_b12",
    "vit8s_spec_ab_b12",
    "vit8_ab_b12",
    "serving_decode",
    "vit8",
    "int4_spec_pipelined_b12",
]
EXTRA_CONFIGS = [  # runnable via --configs, not in the default order
    "spec_pipelined_bf16",
    "pipelined_bf16",
    "int8w_spec_pipelined_b12",
    "int8w_pipelined_b12",
    "int4kv8_pipelined",
    "int4kv8_spec_pipelined",
    "int4kv8_pipelined_b12",  # superseded: vit8_ab_b12 arm A is this cell
]
BF16_ONLY = ["spec_pipelined_bf16", "single", "pipelined_bf16"]


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default="2b", choices=["2b", "05b"])
    parser.add_argument("--decode-tokens", type=int, default=128,
                        help="decode length per image (typical caption length)")
    parser.add_argument("--runs", type=int, default=5)
    parser.add_argument("--warmup", type=int, default=2)
    parser.add_argument("--int4", action="store_true",
                        help="(decode-only) serve text weights packed int4")
    parser.add_argument("--int4-batch", type=int, default=16,
                        help="batch size / slot count for the int4 configs "
                             "(packed weights free ~1.9GB HBM vs bf16)")
    parser.add_argument("--kv-int8", action="store_true",
                        help="(decode-only) int8 KV cache")
    parser.add_argument("--skip-int4", action="store_true",
                        help="run only the bf16 configs (faster A/B runs)")
    parser.add_argument("--decode-only", action="store_true",
                        help="measure just the single-stream fused decode "
                             "loop (tok/s) and exit — for kernel A/Bs")
    parser.add_argument("--spec", type=int, default=0, metavar="K",
                        help="with --decode-only: use the speculative "
                             "(n-gram draft + K-token verify) greedy loop. "
                             "NOTE: random weights degenerate to repetition "
                             "so acceptance — and tok/s — is an UPPER bound "
                             "vs real checkpoints")
    parser.add_argument("--spec-temp", type=float, default=0.0, metavar="T",
                        help="with --decode-only --spec: speculative "
                             "SAMPLING loop at this temperature (top_p 0.3)")
    parser.add_argument("--profile", default="",
                        help="write a jax.profiler trace of one caption to "
                             "this directory (view with tensorboard/xprof)")
    parser.add_argument("--batch", type=int, default=12,
                        help="batch size / slot count for the bf16 "
                             "throughput configs (12 fits v5e-1 HBM "
                             "alongside the bf16 2B weights)")
    parser.add_argument("--run-config", default=None,
                        choices=CONFIG_ORDER + EXTRA_CONFIGS,
                        help="internal: run ONE configuration in this "
                             "process and print its JSON fragment")
    parser.add_argument("--configs", nargs="*", default=None,
                        help="subset of configs to run (default: all)")
    parser.add_argument("--deadline", type=float, default=1650.0,
                        help="global wall-clock budget (s); remaining "
                             "configs are SKIPPED once it is spent, so the "
                             "aggregate line is always printed well inside "
                             "the driver's timeout (round-4's 3000s default "
                             "outlived the driver window — rc=124 with the "
                             "p50 config mid-flight)")
    parser.add_argument("--child-deadline", type=float, default=0.0,
                        help="internal: absolute time.time() at which a "
                             "child must stop measuring and print what "
                             "it has")
    return parser.parse_args()


# --------------------------------------------------------------- orchestrator


def aggregate(args, fields, configs_done, configs_skipped,
              configs_failed=()):
    """Build the single canonical JSON line from the per-config fields
    gathered SO FAR. Called (and printed) after EVERY config so a driver
    kill at any moment leaves the last stdout line parseable (round-3
    verdict #1: BENCH_r03 was rc=124/parsed=null because the old
    orchestrator printed only after all 7 configs)."""
    B = args.batch
    int4_batch = args.int4_batch
    # headline = best measured serving configuration (int4 checkpoints are
    # a supported reference mode, torch/layers.py:47-77; quantized and
    # speculative serving are legitimate production configs, not different
    # tasks). All stream configs measured as median-of-healthy under the
    # same probe-bracketed policy — comparable despite the time-shared chip.
    candidates = [
        (fields.get("bf16_images_per_sec"), f"bf16 pipelined B={B}"),
        (fields.get("spec_pipelined_bf16_images_per_sec"),
         f"bf16 spec pipelined B={B}"),
        (fields.get("int4_kv8_b12_images_per_sec"),
         f"int4+kv8 pipelined B={B}"),
        (fields.get("spec_pipelined_int4_b12_images_per_sec"),
         f"int4 (bf16 KV) spec pipelined B={B}"),
        (fields.get("spec_pipelined_int4_kv8_b12_images_per_sec"),
         f"int4+kv8 spec pipelined B={B}"),
        (fields.get("spec_pipelined_int8_b12_images_per_sec"),
         f"int8 w8a8 spec pipelined B={B}"),
        (fields.get("int8_b12_images_per_sec"),
         f"int8 w8a8 pipelined B={B}"),
        (fields.get("int4_kv8_b16_images_per_sec"),
         f"int4+kv8 pipelined B={int4_batch}"),
        (fields.get("spec_pipelined_int4_kv8_images_per_sec"),
         f"int4+kv8 spec pipelined B={int4_batch}"),
    ]
    live = [v for v in candidates if v[0]]
    best, best_config = (max(live, key=lambda t: t[0]) if live
                         else (None, None))
    # DUAL HEADLINE (round-4 verdict #3): spec acceptance measured on a
    # tiny LM trained on real prose is 1.1-1.2 tok/row/iter (near break-
    # even) vs ~2.0 on degenerate random-weight captions, so the best
    # PLAIN (non-speculative) config is the honest expected-real-
    # checkpoint number; `value` stays the best measured config overall.
    plain_candidates = [
        (fields.get("bf16_images_per_sec"), f"bf16 pipelined B={B}"),
        (fields.get("int8_b12_images_per_sec"),
         f"int8 w8a8 pipelined B={B}"),
        (fields.get("int4_kv8_b12_images_per_sec"),
         f"int4+kv8 pipelined B={B}"),
        (fields.get("int4_kv8_b16_images_per_sec"),
         f"int4+kv8 pipelined B={int4_batch}"),
    ]
    plain_live = [v for v in plain_candidates if v[0]]
    plain_best, plain_config = (
        max(plain_live, key=lambda t: t[0]) if plain_live else (None, None)
    )

    work = dict(fields)
    hbm_keys = [k for k in work if k.startswith("live_hbm_gb")]
    peak_live = max(
        (work[k] for k in hbm_keys if work[k] is not None), default=None
    )
    for k in hbm_keys:
        work.pop(k)
    tfs_keys = [k for k in work if k.startswith("chip_tfs_")]
    chip_tfs = max((work[k] for k in tfs_keys), default=0.0)
    for k in tfs_keys:
        work.pop(k)
    defaults = {k: None for k in (
        "bf16_images_per_sec", "spec_pipelined_bf16_images_per_sec",
        "int4_kv8_b12_images_per_sec",
        "spec_pipelined_int4_b12_images_per_sec",
        "spec_pipelined_int4_kv8_b12_images_per_sec",
        "spec_pipelined_int8_b12_images_per_sec",
        "int8_b12_images_per_sec",
        "int4_kv8_b16_images_per_sec",
        "spec_pipelined_int4_kv8_images_per_sec",
        "int4_kv8_vit8_b16_images_per_sec",
        "int4_kv8_vit8_b12_images_per_sec",
        "spec_bf16_b12_vit8ab_images_per_sec",
        "spec_vit8s_b12_images_per_sec",
        "serving_decode_tok_s_int4", "serving_decode_tok_s_int4_kv8",
        "serving_full_tok_s", "serving_full_req_p50_ms",
        "serving_full_req_p99_ms", "serving_full_accept_tok_per_iter",
        "encode_ms_median", "decode_tokens_per_sec",
        "p50_caption_latency_ms", "p50_caption_plain_ms",
        "p50_caption_spec_ms", "single_image_images_per_sec",
    )}
    work = {**defaults, **work}

    return {
        "metric": f"images_per_sec_per_chip_{args.config}_caption",
        "value": round(best, 4) if best else None,
        "unit": "images/sec",
        "vs_baseline": None,
        "value_config": best_config,
        "expected_real_checkpoint_images_per_sec": (
            round(plain_best, 4) if plain_best else None
        ),
        "expected_real_checkpoint_config": plain_config,
        "headline_policy": (
            "value = best measured config (random weights; spec configs "
            "are exact greedy but acceptance is inflated by degenerate "
            "repetition); expected_real_checkpoint_* = best PLAIN config "
            "(spec is ~break-even at the 1.1-1.2 tok/row/iter acceptance "
            "measured on realistic text, tools/spec_accept_realistic.py)"
        ),
        "batch": B,
        "int4_batch": int4_batch,
        "pipelined": True,
        **work,
        "decode_tokens": args.decode_tokens,
        "chip_matmul_tfs": round(chip_tfs, 1),
        # device.memory_stats() returns None on this backend; live array
        # bytes (sampled after each config's main stream) is the honest
        # substitute for the reference's peak-memory print (sample.py:207)
        "peak_live_hbm_gb": peak_live,
        "configs_done": configs_done,
        "configs_skipped": configs_skipped,
        "configs_failed": list(configs_failed),
        "health_policy": (
            "per-config subprocess isolation; probe-bracketed reps; "
            f"median of healthy (>= {HEALTHY_TFS:.0f} TF/s pre+post, "
            f"h2d >= {HEALTHY_H2D_MBS:.0f} MB/s)"
        ),
        "spec_note": (
            "spec configs are exact greedy; random weights accept ~2.0 "
            "tok/row/iter (upper bound) vs ~1.1-1.2 measured on a tiny LM "
            "trained on real text (tools/spec_accept_realistic.py; "
            "BASELINE.md table) — spec gains mostly close on real "
            "checkpoints"
        ),
        "notes": "random weights; reference publishes no baseline numbers "
                 "(BASELINE.md)",
    }


def orchestrate(args):
    t_start = time.time()
    names = args.configs or (BF16_ONLY if args.skip_int4 else CONFIG_ORDER)
    passthrough = [
        "--config", args.config,
        "--decode-tokens", str(args.decode_tokens),
        "--runs", str(args.runs),
        "--warmup", str(args.warmup),
        "--batch", str(args.batch),
        "--int4-batch", str(args.int4_batch),
    ]
    fields = {}
    done, skipped, failed = [], [], []
    for idx, name in enumerate(names):
        remaining = args.deadline - (time.time() - t_start)
        if remaining < 240:
            skipped = names[idx:]
            log(f"deadline: {remaining:.0f}s left; skipping {skipped}")
            break
        log(f"===== config: {name} ({remaining:.0f}s of budget left) =====")
        child_stop = time.time() + remaining - 60  # child's own margin
        cmd = [sys.executable, os.path.abspath(__file__),
               "--run-config", name,
               "--child-deadline", str(child_stop)] + passthrough
        out_text = ""
        try:
            proc = subprocess.Popen(cmd, stdout=subprocess.PIPE, stderr=None)
            try:
                out, _ = proc.communicate(timeout=remaining)
            except subprocess.TimeoutExpired:
                # children self-exit 60s before this fires (child_stop), so
                # reaching here means a hang. SIGTERM first and give the
                # child 15s to unwind — a SIGKILL mid-device-op can wedge
                # the tunneled chip for the NEXT child (observed: the
                # following child's first probe hung for its whole budget).
                proc.terminate()
                try:
                    out, _ = proc.communicate(timeout=15)
                except subprocess.TimeoutExpired:
                    proc.kill()
                    out, _ = proc.communicate()
                log(f"config {name} hit the budget; keeping partial "
                    "fragments")
            out_text = (out or b"").decode()
            if proc.returncode not in (0, None):
                log(f"config {name} exited {proc.returncode}; keeping any "
                    "fragments it printed")
        except Exception as e:
            log(f"config {name} FAILED ({type(e).__name__}: {e}); "
                "fields stay null")
        contributed = False
        for ln in out_text.strip().splitlines():
            ln = ln.strip()
            if ln.startswith("{"):
                try:
                    fields.update(json.loads(ln))
                    contributed = True
                except json.JSONDecodeError:
                    pass
        # a config counts as DONE only when it printed at least one
        # parseable fragment — a crashed/timed-out child that measured
        # nothing goes to configs_failed so the canonical record
        # distinguishes measured from attempted (round-4 advisor)
        (done if contributed else failed).append(name)
        # cumulative aggregate after EVERY config: the LAST stdout line is
        # always a complete, valid record of everything measured so far
        print(json.dumps(
            aggregate(args, fields, list(done), [], list(failed))
        ), flush=True)

    final = aggregate(args, fields, done, list(skipped), list(failed))
    if final["value"] is None:
        log("WARNING: no throughput config produced a number")
    print(json.dumps(final), flush=True)


# -------------------------------------------------------------------- children


def child_main(args):
    # fixed-shape bench: route device preprocessing eagerly (the default
    # 'adaptive' mode sends the FIRST image of each shape down the host
    # path while the crop graph warms in the background — correct for a
    # varied-resolution production stream, nondeterministic for timing)
    os.environ.setdefault("MOONDREAM_DEVICE_PREPROCESS", "eager")
    import jax
    import jax.numpy as jnp

    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache"
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # threshold 0: even the small random-init compiles persist, so
        # every child after the first skips most of its init compiles
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception as e:
        log(f"compilation cache unavailable: {e}")
    log(f"devices: {jax.devices()}")

    def time_left():
        if not args.child_deadline:
            return float("inf")
        return args.child_deadline - time.time()

    def probe_tfs(iters=10):
        # enough chained matmuls (~11 TFLOP) to amortize the ~25 ms tunnel
        # RTT of the closing scalar fetch — a 3-iteration probe reads 40%
        # low from that overhead alone
        a = jnp.ones((8192, 8192), jnp.bfloat16)
        f = jax.jit(lambda x: x @ x)
        f(a).block_until_ready()
        t0 = time.perf_counter()
        for _ in range(iters):
            c = f(a)
        jax.device_get(c.ravel()[0])
        return iters * 2 * 8192**3 / (time.perf_counter() - t0) / 1e12

    _h2d_buf = np.ones((16, 1024, 1024), np.uint8)  # 16 MB

    def probe_h2d_mbs():
        # The matmul probe misses the OTHER chip-state axis: tunnel H2D
        # throughput, which bounds pipelined streams (56 MB of raw images
        # per stream; at the nominal ~42 MB/s it fully overlaps device
        # work, but observed stream scatter of 2.8-5.8 img/s with ALL
        # probes 124-130 TF/s healthy implicates H2D drops). Recorded
        # per-rep for diagnosis — not (yet) part of the health gate.
        t0 = time.perf_counter()
        x = jax.device_put(_h2d_buf)
        jax.block_until_ready(x)
        return _h2d_buf.nbytes / (time.perf_counter() - t0) / 2**20

    # Every round-3 child's FIRST probe read ~0.0-0.3 TF/s and burned a
    # 60 s "degraded" wait — a freshly-connected backend warms up over the
    # first couple of dispatches, which is indistinguishable from a
    # degraded chip to a single reading. Warm explicitly, and on a low
    # reading retry after 5 s before concluding the chip is degraded.
    probe_tfs(iters=2)
    chip_tfs = 0.0
    for attempt in range(5):
        chip_tfs = probe_tfs()
        log(f"chip probe: {chip_tfs:.1f} TF/s bf16 matmul")
        if chip_tfs > HEALTHY_TFS:
            break
        if time_left() < 120:
            log("chip degraded but child budget nearly spent; proceeding")
            break
        wait = 5 if attempt == 0 else 60
        log(f"chip degraded; waiting {wait}s before retry...")
        time.sleep(wait)

    def run_healthy(run_once, tag, want=2, max_tries=4, wait_s=45,
                    higher_is_better=True):
        """Run `run_once` until `want` reps executed inside healthy probe
        windows (pre AND post >= HEALTHY_TFS). Returns the median of
        healthy reps; falls back to the best rep when no healthy window
        appears within max_tries — flagged in the log. Respects the
        child deadline: returns what it has rather than overrunning."""
        healthy, everything = [], []
        for i in range(max_tries):
            pre = probe_tfs()
            if pre < HEALTHY_TFS:
                # first low reading may be warmup noise — cheap 5s retry
                time.sleep(5)
                pre = probe_tfs()
            if pre < HEALTHY_TFS and time_left() > wait_s + 60:
                log(f"[{tag}] degraded chip ({pre:.0f} TF/s); "
                    f"waiting {wait_s}s...")
                time.sleep(wait_s)
                pre = probe_tfs()
            h2d_pre = probe_h2d_mbs()
            val = run_once()
            post = probe_tfs()
            h2d = probe_h2d_mbs()
            ok = (pre >= HEALTHY_TFS and post >= HEALTHY_TFS
                  and min(h2d_pre, h2d) >= HEALTHY_H2D_MBS)
            everything.append(val)
            log(f"[{tag}] rep {i}: {val:.4g} (probe {pre:.0f}/{post:.0f} "
                f"TF/s, h2d {h2d_pre:.0f}/{h2d:.0f} MB/s, "
                f"{'healthy' if ok else 'DEGRADED'})")
            if ok:
                healthy.append(val)
            if len(healthy) >= want or time_left() < 60:
                break
        if healthy:
            return float(np.median(healthy))
        log(f"[{tag}] NO healthy window in {max_tries} tries; reporting "
            "best-of-all (suspect)")
        pick = max if higher_is_better else min
        return float(pick(everything))

    def live_hbm_gb():
        try:
            return round(
                sum(a.nbytes for a in jax.live_arrays()) / 2**30, 2
            )
        except Exception:
            return None

    from functools import partial

    from PIL import Image

    from moondream_tpu.config import MOONDREAM_05B, MOONDREAM_2B
    from moondream_tpu.engine import generate as engine
    from moondream_tpu.models.moondream import MoondreamModel
    from moondream_tpu.tokenizer import ByteTokenizer

    name = args.run_config
    want_kv8 = (
        args.kv_int8 or (name or "").startswith("int4kv8")
        or name in ("serving_full", "vit8", "vit8_ab_b12")
    )
    want_int4 = args.int4 or (name or "").startswith("int4") or name in (
        "serving_decode", "serving_full", "vit8", "vit8_ab_b12"
    )
    want_int8w = (name or "").startswith("int8w")

    config = MOONDREAM_2B if args.config == "2b" else MOONDREAM_05B
    if want_kv8:
        import dataclasses

        config = dataclasses.replace(
            config, text=dataclasses.replace(config.text, kv_int8=True)
        )
        log("KV cache: int8 codes + per-row scales")
    log(f"building {args.config} model (random weights, bf16)...")
    t0 = time.perf_counter()
    model = MoondreamModel(config, tokenizer=ByteTokenizer(), seed=0)
    if want_int4:
        from moondream_tpu.models.text import quantize_text_params

        model.params = {
            **model.params, "text": quantize_text_params(model.params["text"])
        }
        model._kv_pool.clear()
        log("text weights quantized to runtime int4")
    if want_int8w:
        from moondream_tpu.models.text import quantize_text_params_int8

        model.params = {
            **model.params,
            "text": quantize_text_params_int8(model.params["text"]),
        }
        model._kv_pool.clear()
        log("text weights quantized to runtime int8 (w8a8, native MXU)")
    def static_vit8_vision():
        """Static-int8 twin of the model's vision params (round-4 verdict
        #4): per-channel act amax observed on 16 bench-distribution crops,
        no runtime amax reduction passes (the cost that made dynamic int8
        break even with bf16 — BASELINE.md round-3). Calibration runs on
        the HOST CPU backend against a bit-identical weight twin (same
        PRNG derivation as MoondreamModel(seed=0); threefry is platform-
        invariant) — a one-time offline step, and the tunnel's remote-
        compile service drops the calibration-graph compile (broken
        pipe); real deployments calibrate on host next to the checkpoint
        loader anyway."""
        from moondream_tpu.models.vision import (
            collect_vision_act_stats, init_vision_params,
            quantize_vision_params,
        )

        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            kv_, _, _ = jax.random.split(jax.random.PRNGKey(0), 3)
            w_cpu = init_vision_params(config.vision, kv_, jnp.bfloat16)
            cal = jax.random.uniform(
                jax.random.PRNGKey(7),
                (16, config.vision.crop_size, config.vision.crop_size, 3),
                jnp.bfloat16, -1.0, 1.0,
            )
        stats = collect_vision_act_stats(
            cal, w_cpu, config.vision, backend="cpu"
        )
        return quantize_vision_params(
            model.params["vision"], act_stats=stats
        )

    if name == "vit8":
        model.params = {**model.params, "vision": static_vit8_vision()}
        log("vision block matmuls quantized to int8 (static act scales)")
    jax.block_until_ready(model.params["text"]["wte"])
    log(f"init: {time.perf_counter() - t0:.1f}s")

    # Fixed high-res input -> full 12-crop tiling (the expensive path).
    rng = np.random.default_rng(0)
    image = Image.fromarray(
        rng.integers(0, 255, size=(1080, 1440, 3), dtype=np.uint8)
    )
    settings = {
        "max_tokens": args.decode_tokens, "temperature": 0.0, "top_p": 0.0,
    }
    prompt = list(config.tokenizer.templates["caption"]["normal"])

    # Fixed-length fused decode: eos_id=-1 never fires, so every run decodes
    # exactly --decode-tokens tokens (timing must not depend on random
    # logits). Bound KV reads to the 256-rounded bucket like production.
    kv_bound = min(
        -(-(768 + args.decode_tokens + 64) // 256) * 256,
        config.text.max_context,
    )
    gen_fixed = jax.jit(
        partial(
            engine.generate_text,
            config=config.text,
            eos_id=-1,
            suppress_ids=(config.tokenizer.answer_id,),
            buffer=config.text.max_context,
            kv_bound=kv_bound if kv_bound < config.text.max_context else None,
        ),
        donate_argnums=(1,),
    )

    def one_caption():
        enc = model.encode_image(image)
        kv = model.load_encoded_image(enc)
        _, _, next_tok, pos, kv = model._prefill_prompt(
            kv, prompt, enc.pos, temperature=0.0, top_p=0.0
        )
        res = gen_fixed(
            model.params["text"], kv, next_tok, jnp.int32(pos),
            jax.random.PRNGKey(0), jnp.float32(0.0), jnp.float32(0.0),
            jnp.int32(args.decode_tokens),
        )
        # fence with a scalar fetch: block_until_ready returns EARLY for
        # some graphs on this backend (verify SKILL gotcha; observed 42 ms
        # "captions" with the spec loop)
        jax.device_get(res.tokens[-1])
        return res

    # ---------------------------------------------------------- decode-only
    if args.decode_only:
        log("decode-only: warmup...")
        enc = model.encode_image(image)
        if args.spec:
            spec_fixed = jax.jit(
                partial(
                    engine.generate_text_spec_sampled
                    if args.spec_temp > 0 else engine.generate_text_spec,
                    config=config.text,
                    eos_id=-1,
                    suppress_ids=(config.tokenizer.answer_id,),
                    buffer=config.text.max_context,
                    spec_k=args.spec,
                    kv_bound=(
                        kv_bound if kv_bound < config.text.max_context
                        else None
                    ),
                ),
                donate_argnums=(1,),
            )

        def one_decode():
            kv = model.load_encoded_image(enc)
            _, _, next_tok, pos, kv = model._prefill_prompt(
                kv, prompt, enc.pos, temperature=0.0, top_p=0.0
            )
            jax.block_until_ready(next_tok)
            t0 = time.perf_counter()
            if args.spec and args.spec_temp > 0:
                res = spec_fixed(
                    model.params["text"], kv, next_tok, jnp.int32(pos),
                    jax.random.PRNGKey(0), jnp.float32(args.spec_temp),
                    jnp.float32(0.3), jnp.int32(args.decode_tokens),
                )
            elif args.spec:
                res = spec_fixed(
                    model.params["text"], kv, next_tok, jnp.int32(pos),
                    jnp.int32(args.decode_tokens),
                )
            else:
                res = gen_fixed(
                    model.params["text"], kv, next_tok, jnp.int32(pos),
                    jax.random.PRNGKey(0), jnp.float32(0.0),
                    jnp.float32(0.0), jnp.int32(args.decode_tokens),
                )
            jax.device_get(res.tokens[-1])
            return time.perf_counter() - t0

        one_decode()
        times = [one_decode() for _ in range(args.runs)]
        tps = args.decode_tokens / float(np.median(times))
        tag = f" (spec k={args.spec})" if args.spec else ""
        log(f"decode{tag}: {tps:.1f} tok/s (median of {args.runs})")
        out = {
            "metric": f"decode_tokens_per_sec_{args.config}",
            "value": round(tps, 2), "unit": "tokens/sec",
            "vs_baseline": None, "int4": args.int4, "kv_int8": args.kv_int8,
            "decode_tokens": args.decode_tokens,
            "chip_matmul_tfs": round(chip_tfs, 1),
        }
        if args.spec:
            out["spec_k"] = args.spec
            if args.spec_temp > 0:
                out["spec_temp"] = args.spec_temp
            out["spec_note"] = (
                "random weights repeat heavily; acceptance (and tok/s) is "
                "an upper bound vs real checkpoints"
            )
        print(json.dumps(out))
        return

    fields = {f"chip_tfs_{name}": round(chip_tfs, 1)}

    def emit():
        # cumulative fragment after every sub-measurement: the parent
        # keeps whatever a killed/timed-out child already printed
        print(json.dumps(fields), flush=True)

    # ------------------------------------------------------------- "single"
    if name == "single":
        log("warmup/compile...")
        for i in range(args.warmup):
            one_caption()

        if args.profile:
            log(f"tracing one caption to {args.profile}...")
            with jax.profiler.trace(args.profile):
                one_caption()

        def _median_loop(fn, n):
            ts = []
            for _ in range(n):
                t0 = time.perf_counter()
                fn()
                ts.append(time.perf_counter() - t0)
            return float(np.median(ts))

        def _encode_once():
            enc = model.encode_image(image)
            jax.device_get(enc.k[0, 0, 0, 0, 0])

        log("timing encode (device preprocessing — PIL-bit-exact, default)...")
        encode_ms = run_healthy(
            lambda: 1000 * _median_loop(_encode_once, args.runs),
            "encode", max_tries=3, higher_is_better=False,
        )
        fields["encode_ms_median"] = round(encode_ms, 2)
        emit()

        log("timing plain full captions (encode + prefill + decode)...")
        p50_plain_ms = run_healthy(
            lambda: 1000 * _median_loop(one_caption, args.runs),
            "caption-plain", max_tries=3, higher_is_better=False,
        )
        fields["p50_caption_plain_ms"] = round(p50_plain_ms, 2)
        emit()

        log("timing decode loop alone...")
        enc = model.encode_image(image)

        def _decode_once():
            kv = model.load_encoded_image(enc)
            _, _, next_tok, pos, kv = model._prefill_prompt(
                kv, prompt, enc.pos, temperature=0.0, top_p=0.0
            )
            jax.block_until_ready(next_tok)
            t0 = time.perf_counter()
            res = gen_fixed(
                model.params["text"], kv, next_tok, jnp.int32(pos),
                jax.random.PRNGKey(0), jnp.float32(0.0), jnp.float32(0.0),
                jnp.int32(args.decode_tokens),
            )
            jax.device_get(res.tokens[-1])
            return time.perf_counter() - t0

        decode_s = run_healthy(
            lambda: float(np.median([_decode_once() for _ in range(args.runs)])),
            "decode", max_tries=3, higher_is_better=False,
        )
        fields["decode_tokens_per_sec"] = round(
            args.decode_tokens / decode_s, 2
        )
        emit()

        # SCORED single-image config: speculative greedy decode (exact —
        # engine/generate.py:generate_text_spec). Preprocessing runs on
        # device by default and is uint8-bit-exact with the host PIL/C++
        # path (tests/test_device_preprocess.py), so BOTH p50 paths are
        # parity-legal (round-3 verdict #4 resolved).
        spec_fixed = jax.jit(
            partial(
                engine.generate_text_spec,
                config=config.text,
                eos_id=-1,
                suppress_ids=(config.tokenizer.answer_id,),
                buffer=config.text.max_context,
                spec_k=8,
                kv_bound=(
                    kv_bound if kv_bound < config.text.max_context else None
                ),
            ),
            donate_argnums=(1,),
        )

        def one_caption_spec():
            enc2 = model.encode_image(image)
            kv = model.load_encoded_image(enc2)
            _, _, next_tok, pos, kv = model._prefill_prompt(
                kv, prompt, enc2.pos, temperature=0.0, top_p=0.0
            )
            res = spec_fixed(
                model.params["text"], kv, next_tok, jnp.int32(pos),
                jnp.int32(args.decode_tokens),
            )
            jax.device_get(res.tokens[-1])

        log("warmup spec caption...")
        one_caption_spec()
        log("timing spec captions (scored p50)...")
        p50_spec_ms = run_healthy(
            lambda: 1000 * _median_loop(one_caption_spec, args.runs),
            "caption-spec", max_tries=3, higher_is_better=False,
        )

        p50 = min(p50_plain_ms, p50_spec_ms)
        fields.update({
            "p50_caption_latency_ms": round(p50, 2),
            "p50_caption_spec_ms": round(p50_spec_ms, 2),
            "single_image_images_per_sec": round(1000.0 / p50, 4),
            "live_hbm_gb_single": live_hbm_gb(),
        })

    # -------------------------------------------------------------- streams
    def run_pipelined(B, tag, speculative=0):
        from moondream_tpu.engine.pipeline import BatchPipeline

        pipe = BatchPipeline(
            model, batch_size=B, eos_id=-1, speculative=speculative
        )
        base = [
            Image.fromarray(
                rng.integers(0, 255, size=(1080, 1440, 3), dtype=np.uint8)
            )
            for _ in range(B)
        ]
        log(f"warmup/compile pipelined (B={B}{tag})...")
        pipe.caption(base, settings=settings)
        stream = [base[i % B] for i in range(B * max(4, args.runs // 2))]

        def one_stream():
            t0 = time.perf_counter()
            out = pipe.caption(stream, settings=settings)
            dt = time.perf_counter() - t0
            assert len(out) == len(stream)
            return len(stream) / dt

        # want=2 (was 3): round-over-round variance is characterized
        # (BASELINE.md r2-r4) and the headline ranking now comes from the
        # interleaved headline_ab child, so standalone stream cells are
        # corroboration, not the ranking source (round-4 verdict #1c)
        return run_healthy(one_stream, f"pipelined B={B}{tag}", want=2,
                           max_tries=4)

    if name == "headline_ab":
        # INTERLEAVED headline ranking (round-4 verdict #2/#3): serial
        # per-config subprocesses put each candidate in its own chip
        # window, and the time-shared chip drifts enough between healthy
        # windows (bf16-spec read 5.78 in one, 4.04 in another — 30%)
        # that serial medians cannot rank configs. Here the four headline
        # candidates share ONE window, interleaved A/B/C/D per round, and
        # every rep's probe brackets land in the artifact
        # (headline_ab_reps) so window drift is visible, not invisible.
        # The int8 w8a8 arms swap ONLY model.params['text'] (dispatch
        # reads params at call time; bf16 KV in both, so the two spec
        # arms share the pipeline's compiled graphs per params-pytree and
        # its KV pool). plain_int8w is the never-measured expected-real-
        # checkpoint candidate (round-4 verdict #3).
        from moondream_tpu.engine.pipeline import BatchPipeline
        from moondream_tpu.models.text import quantize_text_params_int8

        B = args.batch
        text_bf16 = model.params["text"]
        text_int8 = quantize_text_params_int8(text_bf16)
        jax.block_until_ready(text_int8["wte"])
        pipe_spec = BatchPipeline(model, batch_size=B, eos_id=-1,
                                  speculative=8)
        pipe_plain = BatchPipeline(model, batch_size=B, eos_id=-1)
        base = [
            Image.fromarray(
                rng.integers(0, 255, size=(1080, 1440, 3), dtype=np.uint8)
            )
            for _ in range(B)
        ]
        stream = [base[i % B] for i in range(B * 4)]
        arms = [
            ("spec_bf16", pipe_spec, text_bf16,
             "spec_pipelined_bf16_images_per_sec"),
            ("spec_int8w", pipe_spec, text_int8,
             "spec_pipelined_int8_b12_images_per_sec"),
            ("plain_int8w", pipe_plain, text_int8,
             "int8_b12_images_per_sec"),
            ("plain_bf16", pipe_plain, text_bf16,
             "bf16_images_per_sec"),
        ]

        def set_text(params):
            model.params = {**model.params, "text": params}

        for tag, pipe, params, _ in arms:
            if time_left() < 90:
                log(f"[headline_ab] budget spent before warming {tag}")
                break
            log(f"[headline_ab] warmup/compile {tag}...")
            set_text(params)
            pipe.caption(base, settings=settings)
            emit()  # keep the parent's fragment trail alive during warms

        reps = []
        healthy = {tag: [] for tag, _, _, _ in arms}
        everything = {tag: [] for tag, _, _, _ in arms}
        for rnd in range(4):
            if time_left() < 90:
                break
            for tag, pipe, params, key in arms:
                if time_left() < 60:
                    break
                set_text(params)
                pre = probe_tfs()
                h2d_pre = probe_h2d_mbs()
                t0 = time.perf_counter()
                out = pipe.caption(stream, settings=settings)
                dt = time.perf_counter() - t0
                assert len(out) == len(stream)
                ips = len(stream) / dt
                post = probe_tfs()
                h2d = probe_h2d_mbs()
                ok = (pre >= HEALTHY_TFS and post >= HEALTHY_TFS
                      and min(h2d_pre, h2d) >= HEALTHY_H2D_MBS)
                reps.append({
                    "arm": tag, "round": rnd,
                    "images_per_sec": round(ips, 4),
                    "pre_tfs": round(pre, 1), "post_tfs": round(post, 1),
                    "h2d_pre_mbs": round(h2d_pre, 1),
                    "h2d_mbs": round(h2d, 1),
                    "healthy": ok,
                })
                everything[tag].append(ips)
                if ok:
                    healthy[tag].append(ips)
                log(f"[headline_ab] round {rnd} {tag}: {ips:.4g} img/s "
                    f"(probe {pre:.0f}/{post:.0f} TF/s, h2d "
                    f"{h2d_pre:.0f}/{h2d:.0f} MB/s, "
                    f"{'healthy' if ok else 'DEGRADED'})")
            fields["headline_ab_reps"] = reps
            for tag, _, _, key in arms:
                vals = healthy[tag] or everything[tag]
                if vals:
                    fields[key] = round(
                        float(np.median(healthy[tag])) if healthy[tag]
                        else max(everything[tag]), 4
                    )
            fields["live_hbm_gb_headline_ab"] = live_hbm_gb()
            emit()
            if min((len(healthy[t]) for t in healthy), default=0) >= 2:
                break  # every arm has >= 2 healthy interleaved reps
        set_text(text_bf16)
    elif name == "pipelined_bf16":
        fields["bf16_images_per_sec"] = round(
            run_pipelined(args.batch, ""), 4
        )
        fields["live_hbm_gb_pipelined"] = live_hbm_gb()
    elif name == "spec_pipelined_bf16":
        # SPECULATIVE pipelined stream: the same producer/consumer overlap
        # as pipelined_bf16, but the decode stage is ONE fused lockstep
        # speculative loop (engine/batched.py:generate_text_spec_batched
        # — exact greedy, prompt-seeded drafts, k-token span verifies)
        fields["spec_pipelined_bf16_images_per_sec"] = round(
            run_pipelined(args.batch, " bf16 spec", speculative=8), 4
        )
        fields["live_hbm_gb_spec_bf16"] = live_hbm_gb()
    elif name == "int4kv8_pipelined_b12":
        # like-for-like vs pipelined_bf16: SAME batch (same ViT crop count)
        # so the delta isolates what int4 weights + int8 KV do to the
        # decode stage (round-3 verdict #2 — the old B=16-vs-B=12
        # comparison conflated batch size with quantization)
        fields["int4_kv8_b12_images_per_sec"] = round(
            run_pipelined(args.batch, " int4+kv8"), 4
        )
        fields["live_hbm_gb_int4_b12"] = live_hbm_gb()
    elif name in ("vit8_ab_b12", "vit8s_spec_ab_b12"):
        # INTERLEAVED like-for-like A/B of the static-int8 ViT (round-4
        # verdict #4 end-to-end closure): the SAME B=12 pipeline runs
        # with bf16 vision (arm A) and with statically calibrated int8
        # vision (arm B) inside one probe window, alternating per round,
        # so the encoder delta is window-invariant. Two variants:
        #   vit8_ab_b12      — int4+kv8 PLAIN pipeline (arm A doubles as
        #                      the int4_kv8_b12 cell). Measured: a wash —
        #                      plain decode, not the ViT, is the binding
        #                      stage at B=12.
        #   vit8s_spec_ab_b12 — bf16-text SPECULATIVE pipeline, where the
        #                      ViT *is* the stage floor (BASELINE round-4
        #                      decomposition: 798 of 1820 ms device
        #                      time) — the direct test of whether the
        #                      -11% encoder moves the headline config.
        # Vision params swap at call time (pipelines read model.params);
        # both variants' graphs warm before timing. Arm B stays OUT of
        # the headline candidate lists: vision PTQ is beyond-reference
        # (the reference's int4 checkpoints quantize text+region only)
        # and unvalidated on real checkpoints — reported as its own cell.
        from moondream_tpu.engine.pipeline import BatchPipeline

        B = args.batch
        spec = name == "vit8s_spec_ab_b12"
        v_bf16 = model.params["vision"]
        v_int8 = static_vit8_vision()
        jax.block_until_ready(v_int8["blocks_q"]["attn"]["qkv"]["wq"])
        pipe = BatchPipeline(model, batch_size=B, eos_id=-1,
                             speculative=8 if spec else 0)
        base = [
            Image.fromarray(
                rng.integers(0, 255, size=(1080, 1440, 3), dtype=np.uint8)
            )
            for _ in range(B)
        ]
        stream = [base[i % B] for i in range(B * 4)]
        if spec:
            arms = [
                ("spec_bf16vit", v_bf16,
                 "spec_bf16_b12_vit8ab_images_per_sec"),
                ("spec_vit8s", v_int8,
                 "spec_vit8s_b12_images_per_sec"),
            ]
        else:
            arms = [
                ("int4kv8_bf16vit", v_bf16, "int4_kv8_b12_images_per_sec"),
                ("int4kv8_vit8s", v_int8,
                 "int4_kv8_vit8_b12_images_per_sec"),
            ]

        def set_vision(p):
            model.params = {**model.params, "vision": p}

        for tag, p, _ in arms:
            if time_left() < 90:
                log(f"[vit8_ab] budget spent before warming {tag}")
                break
            log(f"[vit8_ab] warmup/compile {tag}...")
            set_vision(p)
            pipe.caption(base, settings=settings)
            emit()

        reps = []
        healthy = {tag: [] for tag, _, _ in arms}
        everything = {tag: [] for tag, _, _ in arms}
        for rnd in range(4):
            if time_left() < 90:
                break
            for tag, p, key in arms:
                if time_left() < 60:
                    break
                set_vision(p)
                pre = probe_tfs()
                h2d_pre = probe_h2d_mbs()
                t0 = time.perf_counter()
                out = pipe.caption(stream, settings=settings)
                dt = time.perf_counter() - t0
                assert len(out) == len(stream)
                ips = len(stream) / dt
                post = probe_tfs()
                h2d = probe_h2d_mbs()
                ok = (pre >= HEALTHY_TFS and post >= HEALTHY_TFS
                      and min(h2d_pre, h2d) >= HEALTHY_H2D_MBS)
                reps.append({
                    "arm": tag, "round": rnd,
                    "images_per_sec": round(ips, 4),
                    "pre_tfs": round(pre, 1), "post_tfs": round(post, 1),
                    "h2d_pre_mbs": round(h2d_pre, 1),
                    "h2d_mbs": round(h2d, 1),
                    "healthy": ok,
                })
                everything[tag].append(ips)
                if ok:
                    healthy[tag].append(ips)
                log(f"[vit8_ab] round {rnd} {tag}: {ips:.4g} img/s "
                    f"(probe {pre:.0f}/{post:.0f} TF/s, h2d "
                    f"{h2d_pre:.0f}/{h2d:.0f} MB/s, "
                    f"{'healthy' if ok else 'DEGRADED'})")
            # key per config: vit8_ab_b12 and vit8s_spec_ab_b12 both run
            # this block and must not overwrite each other's rep records
            fields[f"{name}_reps"] = reps
            for tag, _, key in arms:
                vals = healthy[tag] or everything[tag]
                if vals:
                    fields[key] = round(
                        float(np.median(healthy[tag])) if healthy[tag]
                        else max(everything[tag]), 4
                    )
            fields["live_hbm_gb_vit8_ab"] = live_hbm_gb()
            emit()
            # 3 healthy reps/arm (vs headline_ab's 2): the effect under
            # test (~+4-5% predicted from the -11% encoder stage) is at
            # the edge of the per-rep scatter, so resolution matters more
            # than budget here; the round cap (4) still bounds the cost.
            if min((len(healthy[t]) for t in healthy), default=0) >= 3:
                break
        set_vision(v_bf16)
    elif name == "int4_spec_pipelined_b12":
        # int4 weights with the BF16 KV cache: the spec verify iteration
        # is weights-stream-bound (~9ms/iter bf16, microbenched), int4
        # cuts the 2.8GB read to 0.7GB, and round-3's "int4 spec loses"
        # finding conflated it with the int8-KV span kernel's unpack
        # regression — this cell isolates the weights effect
        fields["spec_pipelined_int4_b12_images_per_sec"] = round(
            run_pipelined(args.batch, " int4 spec", speculative=8), 4
        )
        fields["live_hbm_gb_spec_int4only_b12"] = live_hbm_gb()
    elif name == "int4kv8_spec_pipelined_b12":
        fields["spec_pipelined_int4_kv8_b12_images_per_sec"] = round(
            run_pipelined(args.batch, " int4+kv8 spec", speculative=8), 4
        )
        fields["live_hbm_gb_spec_int4_b12"] = live_hbm_gb()
    elif name == "int8w_spec_pipelined_b12":
        # int8 w8a8 text weights under the speculative verify: halves the
        # weights-stream (2.8 -> 1.4 GB/iter) like int4 aspires to, but
        # through NATIVE MXU int8 dots that keep utilization at the
        # verify's M = B*k row panels where the int4 group-dot kernel
        # loses (BASELINE.md round-4 dissection). bf16 KV (int8 KV is a
        # measured span-kernel regression).
        fields["spec_pipelined_int8_b12_images_per_sec"] = round(
            run_pipelined(args.batch, " int8w spec", speculative=8), 4
        )
        fields["live_hbm_gb_spec_int8_b12"] = live_hbm_gb()
    elif name == "int8w_pipelined_b12":
        fields["int8_b12_images_per_sec"] = round(
            run_pipelined(args.batch, " int8w"), 4
        )
        fields["live_hbm_gb_int8_b12"] = live_hbm_gb()
    elif name == "int4kv8_pipelined":
        fields["int4_kv8_b16_images_per_sec"] = round(
            run_pipelined(args.int4_batch, " int4+kv8"), 4
        )
        fields["live_hbm_gb_int4"] = live_hbm_gb()
    elif name == "int4kv8_spec_pipelined":
        fields["spec_pipelined_int4_kv8_images_per_sec"] = round(
            run_pipelined(args.int4_batch, " int4+kv8 spec", speculative=8), 4
        )
        fields["live_hbm_gb_spec_int4"] = live_hbm_gb()
    elif name == "vit8":
        # int8 ViT attacks the encoder (the pipeline's dominant stage,
        # MXU-bound; int8 runs at 2x the bf16 MXU rate). Reported as its
        # own field, NOT the headline: vision PTQ is beyond-reference and
        # gated on real-checkpoint accuracy (eval/quant_drift.py).
        fields["int4_kv8_vit8_b16_images_per_sec"] = round(
            run_pipelined(args.int4_batch, " int4+kv8+vit8"), 4
        )
    elif name == "serving_decode":
        # steady-state SERVING decode at full occupancy: the cache read is
        # the dominant HBM stream (3.2GB/step bf16 at 16x1024 slots), which
        # is what int8 KV targets. int4 weights in both runs; this child
        # measures the kv8 delta in its own process (config.text.kv_int8
        # differs, so it runs the non-kv8 engine on a SEPARATE model).
        from moondream_tpu.models.serve import ContinuousBatchingEngine

        def serving_decode_tps(bench_model, tag):
            eng = ContinuousBatchingEngine(
                bench_model, n_slots=16, slot_len=1024, chunk=8,
                pipeline_depth=2, eos_id=-1,
            )
            imgs = [
                Image.fromarray(rng.integers(
                    0, 255, size=(1080, 1440, 3), dtype=np.uint8))
                for _ in range(16)
            ]
            eng.submit_many(imgs, max_tokens=1024)
            for _ in range(3):  # warm/compile the ragged chunk fn
                eng.step()

            def one_run():
                start = sum(len(s.tokens) for s in eng.slots)
                t0 = time.perf_counter()
                for _ in range(20):
                    eng.step()
                jax.device_get(eng.cur[0])
                dt = time.perf_counter() - t0
                tokens = sum(len(s.tokens) for s in eng.slots) - start
                return tokens / dt

            return run_healthy(one_run, f"serving{tag}", max_tries=3)

        import dataclasses

        # this child builds int4 WITHOUT kv8; the kv8 engine runs on a
        # second model sharing the packed weights
        fields["serving_decode_tok_s_int4"] = round(
            serving_decode_tps(model, " int4"), 1
        )
        emit()
        model._kv_pool.clear()
        cfg8 = dataclasses.replace(
            config, text=dataclasses.replace(config.text, kv_int8=True)
        )
        model8 = MoondreamModel(
            cfg8, params=model.params, tokenizer=ByteTokenizer()
        )
        fields["serving_decode_tok_s_int4_kv8"] = round(
            serving_decode_tps(model8, " int4+kv8"), 1
        )
        fields["live_hbm_gb_serving"] = live_hbm_gb()
    elif name == "serving_full":
        # FULL-FEATURED serving (round-3 verdict #9): everything the
        # engine ships, in one measured config — 16 slots, continuous
        # admission from a queue, prefix-SHARED image KV (4 distinct
        # images across 16 slots), SPECULATIVE chunks (k=8), MIXED
        # detect rows alongside captions, int4 weights + int8 KV.
        # Methodology mirrors tools/serving_load_test.py (aggregate
        # tok/s + per-request latency percentiles), run in-process so
        # the bench doesn't pay an HTTP server launch.
        from moondream_tpu.models.serve import ContinuousBatchingEngine

        eng = ContinuousBatchingEngine(
            model, n_slots=16, slot_len=1024, chunk=8, pipeline_depth=2,
            speculative=8, prefix_share=True, prefix_entries=4, eos_id=-1,
        )
        imgs = [
            Image.fromarray(rng.integers(
                0, 255, size=(1080, 1440, 3), dtype=np.uint8))
            for _ in range(4)
        ]
        encs = [model.encode_image(im) for im in imgs]

        N_TEXT, N_DETECT, MAX_TOK = 40, 8, 64

        def make_queue():
            # every 6th request is a detect row riding the same pool
            q = []
            n_det = 0
            for i in range(N_TEXT + N_DETECT):
                if i % 6 == 5 and n_det < N_DETECT:
                    q.append(("detect", encs[i % len(encs)]))
                    n_det += 1
                else:
                    q.append(("text", encs[i % len(encs)]))
            return q

        stats_reps = []

        def one_run():
            # serve_http's prepare/step split: ONE producer thread runs
            # the expensive admissions (prompt prefill on a pooled KV
            # buffer; encode is cached) while this thread admits prepared
            # requests into free slots and keeps step()ping — prepare()
            # is documented step()-safe (models/serve.py:prepare).
            # Latency is measured from prepare start (request arrival),
            # load-test semantics.
            import queue as _q
            import threading

            queue_items = make_queue()
            total = len(queue_items)
            pq: "_q.Queue" = _q.Queue(maxsize=4)

            def producer():
                try:
                    for kind, enc in queue_items:
                        t_arr = time.perf_counter()
                        if kind == "detect":
                            prep = eng.prepare_structured(
                                enc, "thing", "detect", True, 4
                            )
                        else:
                            prep = eng.prepare(enc)
                        pq.put((prep, t_arr))
                except Exception as e:
                    pq.put(e)

            thr = threading.Thread(target=producer, daemon=True)
            t_sub, lat = {}, {}
            t0 = time.perf_counter()
            # hard wall per rep: if the engine ever drops a request (rid
            # never returned by step()) the loop must not spin until the
            # parent SIGTERMs the child — bound it and report partials
            # (round-4 advisor)
            rep_wall = min(300.0, max(60.0, time_left() - 30.0))
            thr.start()
            ready = []
            while len(lat) < total:
                if time.perf_counter() - t0 > rep_wall:
                    log(f"[serving_full] rep wall ({rep_wall:.0f}s) hit "
                        f"with {len(lat)}/{total} done; reporting partial")
                    break
                # drain prepared requests; BLOCK when the pool would
                # otherwise spin idle (busy-waiting would starve the
                # producer on this 1-core host)
                pool_idle = (
                    not any(s.active for s in eng.slots)
                    and not eng._inflight
                )
                while True:
                    try:
                        item = pq.get(
                            block=pool_idle and not ready, timeout=60
                        )
                    except _q.Empty:
                        break
                    if isinstance(item, Exception):
                        raise item
                    ready.append(item)
                    pool_idle = False
                while ready and eng.free_slots():
                    prep, t_arr = ready.pop(0)
                    rid = eng.admit_prepared(prep, max_tokens=MAX_TOK)
                    t_sub[rid] = t_arr
                for rid in eng.step():
                    lat[rid] = time.perf_counter() - t_sub[rid]
            thr.join(timeout=10)
            dt = time.perf_counter() - t0
            tokens = sum(eng.token_counts.get(r, 0) for r in lat)
            if not lat:
                log("[serving_full] rep completed 0 requests")
                return 0.0
            ms = sorted(1000 * v for v in lat.values())
            tps = tokens / dt
            stats_reps.append({
                "serving_full_tok_s": round(tps, 1),
                "serving_full_req_p50_ms": round(ms[len(ms) // 2], 1),
                "serving_full_req_p99_ms": round(
                    ms[min(len(ms) - 1, int(len(ms) * 0.99))], 1
                ),
                "serving_full_accept_tok_per_iter": (
                    round(eng.spec_accept_rate, 3)
                    if eng.spec_accept_rate else None
                ),
            })
            return tps

        log("warmup/compile serving_full (mixed spec prefix-share pool)...")
        warm = make_queue()[:6] + [("detect", encs[0])]
        for kind, enc in warm:
            if kind == "detect":
                eng.submit_detect(enc, "thing", max_objects=4)
            else:
                eng.submit(enc, max_tokens=8)
        eng.drain()

        # first rep routinely pays residual compiles/backend warmup; a
        # 3-rep median absorbs it
        tps = run_healthy(one_run, "serving_full", want=3, max_tries=5)
        best = min(
            stats_reps, key=lambda s: abs(s["serving_full_tok_s"] - tps)
        )
        fields.update(best)
        fields["serving_full_tok_s"] = round(tps, 1)
        fields["live_hbm_gb_serving_full"] = live_hbm_gb()
        fields["serving_full_config"] = (
            "16 slots, int4+kv8, prefix-share (4 images), spec k=8, "
            f"{N_TEXT} caption + {N_DETECT} detect reqs, "
            f"max_tokens={MAX_TOK}, continuous admission"
        )

    print(json.dumps(fields))


def main():
    args = parse_args()
    if args.run_config is None and not args.decode_only:
        return orchestrate(args)
    return child_main(args)


if __name__ == "__main__":
    main()
