"""Text-decoder finetuning on DOCCI captions.

Run: python -m moondream_tpu.finetune.finetune_text --model <ckpt> [--config <json>]

Flow parity with the reference kit
(/root/reference/moondream/finetune/finetune_text.py): frozen vision encoder,
[BOS, image, question, answer] embedding sequences, shifted CE on the answer
span, grad accumulation 128, 10% warmup + cosine LR, wandb-optional logging,
safetensors save.

TPU-native differences: optax.adamw + optax.MultiSteps for accumulation
(replacing bitsandbytes AdamW8bit), jitted donated train step over
length-bucketed padded sequences, orbax mid-run checkpoints (--save-every),
and optional dp x tp mesh sharding (--mesh dp=2,tp=4).
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
from tqdm import tqdm

from ..models.moondream import MoondreamModel
from ..tokenizer import load_tokenizer
from ..weights import load_params
from .trainer import lr_schedule, text_loss

ANSWER_EOS = "<|endoftext|>"
LR = 3e-6
EPOCHS = 3
GRAD_ACCUM_STEPS = 128
SEQ_BUCKET = 128  # pad [BOS, img, Q, A] sequences to multiples of this


def _ceil_to(n, m):
    return ((n + m - 1) // m) * m


def build_example(model: MoondreamModel, image, question: str, answer: str):
    """Host-side assembly of one training example: embeddings + labels."""
    img_emb = model._run_vision_encoder(image)  # (729, D) — frozen path
    wte = model.params["text"]["wte"]
    bos = model.config.tokenizer.bos_id

    q_ids = model.tokenizer.encode(question)
    a_ids = model.tokenizer.encode(answer)

    bos_emb = wte[jnp.asarray([bos])]
    q_emb = wte[jnp.asarray(q_ids)]
    a_emb = wte[jnp.asarray(a_ids)]
    embeds = jnp.concatenate([bos_emb, img_emb, q_emb, a_emb], axis=0)

    seq = embeds.shape[0]
    pad = _ceil_to(seq, SEQ_BUCKET)
    embeds = jnp.pad(embeds, ((0, pad - seq), (0, 0)))

    # labels[t] is the target emitted *at* position t (shift handled in loss)
    labels = np.zeros((pad,), np.int32)
    mask = np.zeros((pad,), np.float32)
    a_start = 1 + img_emb.shape[0] + len(q_ids)
    labels[a_start : a_start + len(a_ids)] = a_ids
    mask[a_start : a_start + len(a_ids)] = 1.0

    return {
        "inputs_embeds": embeds[None],
        "labels": jnp.asarray(labels)[None],
        "label_mask": jnp.asarray(mask)[None],
    }


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", type=str, default=None,
                        help="checkpoint; omit for random weights (only "
                             "sensible with --synthetic smoke runs)")
    parser.add_argument("--config", type=str, default=None)
    parser.add_argument("--tokenizer", type=str, default=None)
    parser.add_argument("--dataset", type=str, default="google/docci")
    parser.add_argument("--epochs", type=int, default=EPOCHS)
    parser.add_argument("--lr", type=float, default=LR)
    parser.add_argument("--grad-accum", type=int, default=GRAD_ACCUM_STEPS)
    parser.add_argument("--save", type=str, default="moondream_finetune.safetensors")
    parser.add_argument("--save-every", type=int, default=0,
                        help="orbax checkpoint every N optimizer steps")
    parser.add_argument("--ckpt-dir", type=str, default="checkpoints")
    parser.add_argument("--wandb", action="store_true")
    parser.add_argument("--synthetic", type=int, default=0,
                        help="train on N synthetic image/caption pairs "
                             "instead of a HF dataset (offline smoke run)")
    parser.add_argument("--lora-rank", type=int, default=0,
                        help="train a LoRA variant adapter of this rank with "
                             "the base weights frozen (adapter-sized "
                             "optimizer state), saved as a torch .pt in the "
                             "variant naming that load_variant/settings "
                             "{'variant': path} consumes directly")
    args = parser.parse_args()

    from . import resolve_config

    config = resolve_config(args.config)
    params = load_params(args.model, config) if args.model else None
    model = MoondreamModel(config, params=params, tokenizer=load_tokenizer(args.tokenizer))

    if args.wandb:
        import wandb

        wandb.init(
            project="moondream-tpu-ft",
            config={"EPOCHS": args.epochs, "GRAD_ACCUM_STEPS": args.grad_accum,
                    "LR": args.lr},
        )

    if args.synthetic:
        import numpy as _np
        from PIL import Image as _Image

        _rng = _np.random.default_rng(0)
        dataset = [
            {
                "image": _Image.fromarray(
                    _rng.integers(0, 255, (378, 378, 3), _np.uint8)
                ),
                "description": f"synthetic sample number {k}",
            }
            for k in range(args.synthetic)
        ]
    else:
        from datasets import load_dataset

        dataset = load_dataset(args.dataset, trust_remote_code=True)["train"]
    total_steps = args.epochs * len(dataset) // args.grad_accum
    sched = lr_schedule(args.lr)

    base_opt = optax.adamw(
        lambda step: sched(step, max(total_steps, 1)),
        b1=0.9, b2=0.95, eps=1e-6,
    )
    optimizer = optax.MultiSteps(base_opt, every_k_schedule=args.grad_accum)

    text_params = model.params["text"]
    cfg = config.text

    if args.lora_rank:
        from .lora import init_lora_params, make_lora_train_step
        from .trainer import TrainState

        train_params = init_lora_params(cfg, args.lora_rank, jax.random.PRNGKey(0))
        opt_state = optimizer.init(train_params)
        # the shared adapter step takes the frozen base as an ARGUMENT —
        # closing over it would bake the full base pytree into the jit as
        # non-donatable constants
        lora_step = make_lora_train_step(optimizer, cfg)

        def train_step(lora_params, opt_state, batch):
            state, loss = lora_step(
                TrainState(lora_params, opt_state, jnp.int32(0)),
                text_params, batch,
            )
            return state.params, state.opt_state, loss

    else:
        train_params = text_params
        opt_state = optimizer.init(train_params)

        @jax.jit
        def train_step(text_params, opt_state, batch):
            loss, grads = jax.value_and_grad(
                lambda p: text_loss(
                    p, batch["inputs_embeds"], batch["labels"], batch["label_mask"], cfg
                )
            )(text_params)
            updates, opt_state = optimizer.update(grads, opt_state, text_params)
            return optax.apply_updates(text_params, updates), opt_state, loss

    pbar = tqdm(total=total_steps)
    i = 0
    for epoch in range(args.epochs):
        for sample in dataset:
            i += 1
            batch = build_example(
                model,
                sample["image"],
                "\n\nQuestion: Describe this image.\n\nAnswer:",
                f"{sample['description']}{ANSWER_EOS}",
            )
            train_params, opt_state, loss = train_step(train_params, opt_state, batch)
            if not args.lora_rank:
                text_params = train_params
                model.params["text"] = text_params

            if i % args.grad_accum == 0:
                step = i // args.grad_accum
                pbar.set_postfix({"step": step, "loss": float(loss)})
                pbar.update(1)
                if args.wandb:
                    import wandb

                    wandb.log({"loss/train": float(loss)})
                if args.save_every and step % args.save_every == 0:
                    from .trainer import TrainState, save_checkpoint

                    save_checkpoint(
                        os.path.abspath(os.path.join(args.ckpt_dir, f"step_{step}")),
                        TrainState(train_params, opt_state, jnp.int32(step)),
                    )

    if args.lora_rank:
        from .lora import save_variant

        save_variant(args.save, train_params)
    else:
        save_params(args.save, model)
    print(f"saved to {args.save}")


def save_params(path: str, model: MoondreamModel):
    """Serialize the full model as a new-scheme safetensors checkpoint
    (loadable by both this framework and the reference)."""
    from safetensors.numpy import save_file

    def contiguous(a):
        # safetensors serializes the raw buffer: transposed (non-contiguous)
        # views MUST be compacted first or the file silently holds the
        # untransposed bytes.
        return np.ascontiguousarray(a)

    flat = {}

    def add(prefix, tree):
        for k, v in tree.items():
            name = f"{prefix}.{k}" if prefix else k
            if isinstance(v, dict):
                add(name, v)
            elif v is not None:
                flat[name] = np.asarray(v.astype(jnp.float32))

    add("vision", model.params["vision"])
    add("text", model.params["text"])
    add("region", model.params["region"])
    flat.pop("text.freqs_cis", None)

    # Unstack scan-stacked block weights back into per-layer tensors and
    # restore torch (out, in) layout for interchange.
    out = {}
    for name, arr in flat.items():
        if ".blocks." in name:
            head, tail = name.split(".blocks.", 1)
            n_layers = arr.shape[0]
            for i in range(n_layers):
                v = arr[i]
                if tail.endswith(".w"):
                    out[f"{head}.blocks.{i}.{tail[:-2]}.weight"] = contiguous(v.T)
                elif tail.endswith(".b"):
                    out[f"{head}.blocks.{i}.{tail[:-2]}.bias"] = contiguous(v)
                else:
                    out[f"{head}.blocks.{i}.{tail}"] = contiguous(v)
        elif name.endswith(".w"):
            out[name[:-2] + ".weight"] = contiguous(arr.T)
        elif name.endswith(".b"):
            out[name[:-2] + ".bias"] = contiguous(arr)
        else:
            out[name] = contiguous(arr)
    save_file(out, path)


if __name__ == "__main__":
    main()
