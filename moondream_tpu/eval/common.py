"""Shared eval-CLI plumbing: model construction from a checkpoint path
(analog of reference eval_all.py:22-27) and a uniform argparse main."""

from __future__ import annotations

import argparse


def create_model(ckpt_path: str, config_json: str = None, tokenizer: str = None,
                 int4: bool = False, kv_int8: bool = False,
                 vit8: bool = False):
    """Load an eval model, optionally under a quantized serving config
    (int4 text / int8 KV / int8 ViT) so accuracy can gate quantization —
    see eval/quant_drift.py for the promotion criteria."""
    import dataclasses

    from ..config import MoondreamConfig
    from ..models.moondream import MoondreamModel
    from ..tokenizer import load_tokenizer
    from ..weights import load_params

    config = (
        MoondreamConfig.from_json(config_json) if config_json else MoondreamConfig()
    )
    if kv_int8:
        config = dataclasses.replace(
            config, text=dataclasses.replace(config.text, kv_int8=True)
        )
    params = load_params(ckpt_path, config, runtime_int4=int4)
    if vit8:
        from ..models.vision import quantize_vision_params

        params = {**params, "vision": quantize_vision_params(params["vision"])}
    return MoondreamModel(config, params=params, tokenizer=load_tokenizer(tokenizer))


def run_cli(eval_fn, format_fn):
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", type=str, required=True)
    parser.add_argument("--config", type=str, default=None)
    parser.add_argument("--tokenizer", type=str, default=None)
    parser.add_argument("--debug", action="store_true")
    args = parser.parse_args()

    model = create_model(args.model, args.config, args.tokenizer)
    result = eval_fn(model, debug=args.debug)
    format_fn(result)
    return result
