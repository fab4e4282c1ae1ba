"""Accuracy gates for quantized serving configurations.

The reference ships int4 text checkpoints as a supported mode
(/root/reference/moondream/torch/layers.py:38-77) but never quantizes
vision; this repo's int8 ViT and int8 KV cache are beyond-reference
serving configs and therefore need their own drift gates before being
promoted to a headline/production config. This module makes the
promotion criteria machine-checkable:

  * ``vision_projection_drift`` — error of the int8-ViT image embeddings
    (the 729 x dim tensor every downstream token attends to) vs the bf16
    encoder on the same crops.
  * ``caption_agreement`` — fraction of greedy caption tokens identical
    to the bf16 model's under a quantized config (text int4 / kv int8 /
    vit int8, composable).
  * ``check_gates`` — the promotion thresholds, one place, machine-read.

PROMOTION CRITERIA (gates): a quantized config may be promoted to the
bench headline / default serving config when, on a REAL checkpoint over
the gate corpus (synthetic + natural images):

  * vision int8:  relative L2 drift of the projected image embedding
                  <= 2% (rel_l2), max absolute element error <= 0.15
                  (bf16 embeds are O(1) after projection), AND greedy
                  caption-token agreement >= 95%.
  * kv int8 / text int4 / text int8 (w8a8): greedy caption-token
                  agreement >= 95% and no eval-suite benchmark regressing
                  > 1 point (run ``eval_all --int4 --kv-int8`` vs the
                  bf16 run).

Until real checkpoints are reachable (BASELINE.md records the blocker),
CI runs this harness at the tiny config to pin the MECHANISM (bounded
drift on controlled weights, the gate logic itself), and the bench
reports quantized configs as separate fields rather than the headline.

Run directly:
    python -m moondream_tpu.eval.quant_drift --config 05b --vit8
    python -m moondream_tpu.eval.quant_drift --model ckpt.st --vit8 --kv8
"""

import argparse
import json
import sys
from typing import Dict, List, Optional

import numpy as np

# one place for the numbers quoted in the docstring
GATES = {
    "vit8_rel_l2_max": 0.02,
    "vit8_abs_err_max": 0.15,
    "caption_agreement_min": 0.95,
}


def _images(n: int = 6, seed: int = 0) -> List["object"]:
    """Gate corpus: structured synthetics spanning the activation range —
    flat colors, gradients, high-frequency noise, checkerboard. Real
    checkpoints should extend this with natural images (pass your own
    list to the functions below)."""
    from PIL import Image

    rng = np.random.default_rng(seed)
    out = []
    h, w = 378, 504
    yy, xx = np.mgrid[0:h, 0:w]
    out.append(Image.new("RGB", (w, h), (127, 127, 127)))
    out.append(Image.fromarray(
        np.stack([(xx * 255 // w), (yy * 255 // h), ((xx + yy) % 256)],
                 axis=-1).astype(np.uint8)))
    out.append(Image.fromarray(
        rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)))
    out.append(Image.fromarray(
        (((xx // 14 + yy // 14) % 2) * 255).astype(np.uint8)[..., None]
        .repeat(3, -1)))
    for _ in range(max(0, n - 4)):
        out.append(Image.fromarray(
            rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)))
    return out[:n]


def vision_projection_drift(
    model, images: Optional[list] = None, static: bool = False
) -> Dict[str, float]:
    """int8-ViT drift of the projected image embeddings vs the model's
    own bf16 vision params, per image; returns max/mean absolute error,
    relative L2, and the bf16 embedding scale for context. The model must
    hold DENSE (bf16) vision params; the quantized twin is derived here.

    With `static`, the quantized twin uses statically calibrated
    activation scales (models.vision.collect_vision_act_stats +
    quantize_vision_params(act_stats=...)); calibration runs on a
    DISJOINT synthetic corpus (seed 1) so the gate is not self-calibrated
    on its measurement images."""
    from ..models.vision import quantize_vision_params

    if "blocks" not in model.params["vision"]:
        raise ValueError("model already holds quantized vision params; "
                         "run drift from the bf16 model")
    if static:
        import jax.numpy as jnp

        from ..models.vision import collect_vision_act_stats
        from ..ops.image_crops import overlap_crop_image

        cfg = model.config.vision
        cal = np.concatenate([
            overlap_crop_image(
                np.asarray(im.convert("RGB")),
                overlap_margin=cfg.overlap_margin, max_crops=cfg.max_crops,
            )["crops"]
            for im in _images(6, seed=1)
        ])
        stats = collect_vision_act_stats(
            jnp.asarray(cal), model.params["vision"], cfg
        )
        vq = quantize_vision_params(model.params["vision"], act_stats=stats)
    else:
        vq = quantize_vision_params(model.params["vision"])

    images = images if images is not None else _images()
    abs_errs, rel_l2s, scales = [], [], []
    dense = model.params["vision"]
    for im in images:
        emb_bf16 = np.asarray(
            model._run_vision_encoder(im), dtype=np.float32
        )
        # params are jit ARGUMENTS (the quantized tree retraces once and
        # both variants stay cached), so swapping is cheap
        model.params = {**model.params, "vision": vq}
        try:
            emb_q = np.asarray(
                model._run_vision_encoder(im), dtype=np.float32
            )
        finally:
            model.params = {**model.params, "vision": dense}
        diff = emb_q - emb_bf16
        abs_errs.append(float(np.abs(diff).max()))
        rel_l2s.append(
            float(np.linalg.norm(diff) / max(np.linalg.norm(emb_bf16), 1e-9))
        )
        scales.append(float(np.abs(emb_bf16).mean()))
    return {
        "max_abs_err": max(abs_errs),
        "mean_abs_err": float(np.mean(abs_errs)),
        "rel_l2": float(np.mean(rel_l2s)),
        "worst_rel_l2": max(rel_l2s),
        "bf16_mean_abs": float(np.mean(scales)),
        "n_images": len(images),
    }


def caption_agreement(
    model_ref, model_q, images: Optional[list] = None, max_tokens: int = 32
) -> Dict[str, float]:
    """Greedy caption-token agreement between a reference (bf16) model and
    a quantized twin: fraction of positions where the emitted token ids
    match, prefix-aligned (first divergence ends the credited prefix —
    downstream tokens condition on the divergent one)."""
    images = images if images is not None else _images()
    greedy = {"temperature": 0.0, "top_p": 0.0, "max_tokens": max_tokens}
    agree, total = 0, 0
    exact = 0
    for im in images:
        a = model_ref.caption(im, "normal", settings=greedy)["caption"]
        b = model_q.caption(im, "normal", settings=greedy)["caption"]
        ta = model_ref._encode_text(a) if a else []
        tb = model_q._encode_text(b) if b else []
        n = max(len(ta), len(tb), 1)
        k = 0
        while k < min(len(ta), len(tb)) and ta[k] == tb[k]:
            k += 1
        # identical sequences are full agreement even when empty (a tiny
        # random model can greedily emit EOS immediately)
        agree += n if ta == tb else k
        total += n
        exact += int(a == b)
    return {
        "token_agreement": agree / total,
        "exact_caption_rate": exact / len(images),
        "n_images": len(images),
    }


def check_gates(report: Dict[str, float]) -> Dict[str, bool]:
    """Evaluate the promotion gates against a drift report (missing
    metrics are skipped). Returns {gate_name: passed}."""
    out = {}
    if "rel_l2" in report:
        out["vit8_rel_l2"] = report["rel_l2"] <= GATES["vit8_rel_l2_max"]
    if "max_abs_err" in report:
        out["vit8_abs_err"] = (
            report["max_abs_err"] <= GATES["vit8_abs_err_max"]
        )
    if "token_agreement" in report:
        out["caption_agreement"] = (
            report["token_agreement"] >= GATES["caption_agreement_min"]
        )
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default=None,
                    help="checkpoint path (omit for random weights — "
                         "mechanism check only, gates are meaningless "
                         "without real weights)")
    ap.add_argument("--config", default="2b", choices=["2b", "05b"])
    ap.add_argument("--vit8", action="store_true")
    ap.add_argument("--vit8-static", action="store_true",
                    help="int8 ViT with statically calibrated activation "
                         "scales (collect_vision_act_stats)")
    ap.add_argument("--int4", action="store_true")
    ap.add_argument("--int8-text", action="store_true",
                    help="int8 w8a8 text blocks "
                         "(models.text.quantize_text_params_int8)")
    ap.add_argument("--kv8", action="store_true")
    ap.add_argument("--max-tokens", type=int, default=32)
    args = ap.parse_args()

    import dataclasses

    from ..config import MOONDREAM_05B, MOONDREAM_2B
    from ..models.moondream import MoondreamModel
    from ..tokenizer import ByteTokenizer, load_tokenizer
    from ..weights import load_params

    config = MOONDREAM_2B if args.config == "2b" else MOONDREAM_05B
    if args.model:
        params = load_params(args.model, config)
        tok = load_tokenizer()
    else:
        print("WARNING: random weights — mechanism check only",
              file=sys.stderr)
        params, tok = None, ByteTokenizer()
    model = MoondreamModel(config, params=params, tokenizer=tok, seed=0)

    report = {}
    if args.vit8 or args.vit8_static:
        report.update(
            vision_projection_drift(model, static=args.vit8_static)
        )

    if args.vit8 or args.vit8_static or args.int4 or args.int8_text \
            or args.kv8:
        qcfg = config
        if args.kv8:
            qcfg = dataclasses.replace(
                config, text=dataclasses.replace(config.text, kv_int8=True)
            )
        qparams = dict(model.params)
        if args.int4:
            from ..models.text import quantize_text_params

            qparams["text"] = quantize_text_params(qparams["text"])
        elif args.int8_text:
            from ..models.text import quantize_text_params_int8

            qparams["text"] = quantize_text_params_int8(qparams["text"])
        if args.vit8 or args.vit8_static:
            import jax.numpy as jnp

            from ..models.vision import (
                collect_vision_act_stats, quantize_vision_params,
            )
            from ..ops.image_crops import overlap_crop_image

            stats = None
            if args.vit8_static:
                vcfg = config.vision
                cal = np.concatenate([
                    overlap_crop_image(
                        np.asarray(im.convert("RGB")),
                        overlap_margin=vcfg.overlap_margin,
                        max_crops=vcfg.max_crops,
                    )["crops"]
                    for im in _images(6, seed=1)
                ])
                stats = collect_vision_act_stats(
                    jnp.asarray(cal), qparams["vision"], vcfg
                )
            qparams["vision"] = quantize_vision_params(
                qparams["vision"], act_stats=stats
            )
        model_q = MoondreamModel(qcfg, params=qparams, tokenizer=tok)
        report.update(
            caption_agreement(model, model_q, max_tokens=args.max_tokens)
        )

    report["gates"] = check_gates(report)
    report["gates_apply"] = bool(args.model)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
