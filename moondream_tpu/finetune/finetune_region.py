"""Region-head finetuning on moondream/waste_detection.

Run: python -m moondream_tpu.finetune.finetune_region --model <ckpt>

Flow parity with the reference kit
(/root/reference/moondream/finetune/finetune_region.py): per class, boxes
become interleaved [x-coord, y-coord, (w,h)-size] embedding triplets appended
to "\n\nDetect: {class}\n\n"; the loss is CE on 1024-bin coordinate logits at
the positions preceding each coordinate slot plus CE on log2-scale size bins
(labels: round(p*1023) for coords, (log2(s)+10)/10*1023 for sizes).

TPU-native: optax.adamw over the region params only (vision/text frozen),
jitted loss/grad, grad accumulation via optax.MultiSteps.
"""

from __future__ import annotations

import argparse
import math

import jax
import jax.numpy as jnp
import numpy as np
import optax
from tqdm import tqdm

from ..models import region as region_ops
from ..models import text as text_ops
from ..models.moondream import MoondreamModel
from ..tokenizer import load_tokenizer
from ..weights import load_params
from .finetune_text import save_params
from .trainer import lr_schedule, region_loss

LR = 5e-5
EPOCHS = 2
GRAD_ACCUM_STEPS = 16


def build_class_example(model: MoondreamModel, img_emb, class_name, boxes):
    """One (class, boxes) training sequence. boxes: (K, 4) [xc, yc, w, h]
    normalized. Returns (prefix embeddings, coord/size values, labels,
    c_idx, s_idx)."""
    wte = model.params["text"]["wte"]
    tok = model.config.tokenizer
    bos_emb = wte[jnp.asarray([tok.bos_id])]
    eos_emb = wte[jnp.asarray([tok.eos_id])]
    instr_ids = model.tokenizer.encode(f"\n\nDetect: {class_name}\n\n")
    instr_emb = wte[jnp.asarray(instr_ids)]

    cs_embs = []
    cs_labels = []
    c_idx, s_idx = [], []
    for bb in boxes:
        xc, yc, w, h = (float(v) for v in bb)
        k = len(cs_embs)
        cs_embs.append(
            region_ops.encode_coordinate(
                jnp.asarray([xc], model.dtype), model.params["region"]
            )
        )
        cs_embs.append(
            region_ops.encode_coordinate(
                jnp.asarray([yc], model.dtype), model.params["region"]
            )
        )
        cs_embs.append(
            region_ops.encode_size(
                jnp.asarray([w, h], model.dtype), model.params["region"]
            )
        )
        c_idx += [k, k + 1]
        s_idx += [k + 2]
        coord_bins = [
            int(min(max(round(xc * 1023), 0), 1023)),
            int(min(max(round(yc * 1023), 0), 1023)),
        ]
        size_bins = [
            int(min(max(round((math.log2(max(s, 1 / 1024)) + 10.0) / 10.0 * 1023.0), 0), 1023))
            for s in (w, h)
        ]
        cs_labels += coord_bins + size_bins

    cs_emb = jnp.stack(cs_embs)
    inputs_embeds = jnp.concatenate(
        [bos_emb, img_emb, instr_emb, cs_emb, eos_emb], axis=0
    )[None]
    prefix = inputs_embeds.shape[1] - cs_emb.shape[0]
    return {
        "inputs_embeds": inputs_embeds,
        "labels": jnp.asarray(cs_labels, jnp.int32),
        "c_idx": jnp.asarray(c_idx, jnp.int32) + prefix,
        "s_idx": jnp.asarray(s_idx, jnp.int32) + prefix,
    }


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", type=str, default=None,
                        help="checkpoint; omit for random weights (only "
                             "sensible with --synthetic smoke runs)")
    parser.add_argument("--config", type=str, default=None)
    parser.add_argument("--tokenizer", type=str, default=None)
    parser.add_argument("--epochs", type=int, default=EPOCHS)
    parser.add_argument("--lr", type=float, default=LR)
    parser.add_argument("--grad-accum", type=int, default=GRAD_ACCUM_STEPS)
    parser.add_argument("--save", type=str, default="moondream_region_finetune.safetensors")
    parser.add_argument("--wandb", action="store_true")
    parser.add_argument("--synthetic", type=int, default=0,
                        help="train on N synthetic box samples instead of "
                             "the HF dataset (offline smoke run)")
    args = parser.parse_args()

    from . import resolve_config

    config = resolve_config(args.config)
    params = load_params(args.model, config) if args.model else None
    model = MoondreamModel(config, params=params, tokenizer=load_tokenizer(args.tokenizer))

    if args.wandb:
        import wandb

        wandb.init(project="moondream-tpu-ft-region",
                   config={"EPOCHS": args.epochs, "LR": args.lr})

    if args.synthetic:
        import numpy as _np
        from PIL import Image as _Image

        _rng = _np.random.default_rng(0)
        dataset = [
            {
                "image": _Image.fromarray(
                    _rng.integers(0, 255, (378, 378, 3), _np.uint8)
                ),
                # normalized [xc, yc, w, h], the build_class_example format
                "boxes": [[0.4 + 0.01 * k, 0.5, 0.3, 0.4]],
                "labels": ["widget"],
            }
            for k in range(args.synthetic)
        ]
    else:
        from datasets import load_dataset

        dataset = load_dataset(
            "moondream/waste_detection", split="train"
        ).shuffle(seed=111)
    total_steps = args.epochs * len(dataset) // args.grad_accum
    sched = lr_schedule(args.lr)

    base_opt = optax.adamw(
        lambda step: sched(step, max(total_steps, 1)), b1=0.9, b2=0.95, eps=1e-6
    )
    optimizer = optax.MultiSteps(base_opt, every_k_schedule=args.grad_accum)
    region_params = model.params["region"]
    opt_state = optimizer.init(region_params)
    text_params = model.params["text"]
    cfg = config.text

    @jax.jit
    def train_step(region_params, text_params, opt_state, batch):
        # text_params rides as an argument: closing over it would bake
        # ~1GB of frozen weights into the compiled program as constants
        def loss_fn(rp):
            hidden = text_ops.produce_hidden(batch["inputs_embeds"], text_params, cfg)
            return region_loss(
                rp, hidden, batch["labels"], batch["c_idx"], batch["s_idx"]
            )

        loss, grads = jax.value_and_grad(loss_fn)(region_params)
        updates, opt_state = optimizer.update(grads, opt_state, region_params)
        return optax.apply_updates(region_params, updates), opt_state, loss

    pbar = tqdm(total=total_steps)
    i = 0
    for epoch in range(args.epochs):
        for sample in dataset:
            i += 1
            img_emb = model._run_vision_encoder(sample["image"])

            boxes_by_class = {}
            for box, cls in zip(sample["boxes"], sample["labels"]):
                boxes_by_class.setdefault(cls, []).append(box)

            for class_name, boxes in boxes_by_class.items():
                batch = build_class_example(model, img_emb, class_name, boxes)
                region_params, opt_state, loss = train_step(
                    region_params, text_params, opt_state, batch
                )
                model.params["region"] = region_params

            if i % args.grad_accum == 0:
                pbar.set_postfix({"step": i // args.grad_accum, "loss": float(loss)})
                pbar.update(1)
                if args.wandb:
                    import wandb

                    wandb.log({"loss/train": float(loss)})

    save_params(args.save, model)
    print(f"saved to {args.save}")


if __name__ == "__main__":
    main()
