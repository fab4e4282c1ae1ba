"""Representation engineering: control vectors for steering generation.

Capability parity with the reference's notebooks/RepEng.ipynb, built
TPU-first:

  * The reference collects `output_hidden_states` during incremental HF
    generation (one host round-trip per token) and steers by monkey-patching
    `transformer.h` with LayerWrapper modules. Here, hidden collection is a
    single batched full-sequence forward (`text.produce_hidden_layers`, a
    `lax.scan` emitting every layer's residual stream as ys) run AFTER
    generation — causality makes the states identical — and steering is a
    `steer` operand threaded through the jitted decode loops (an extra
    per-layer vector add inside the block scan; no module mutation).
  * PCA is a plain numpy SVD (no sklearn dependency).

Workflow (see notebooks/RepEng.ipynb in this repo):

    reps = HiddenStateCollector(model)
    pos_h = reps.collect(images, positive_prompt, samples_per_image=2)
    neg_h = reps.collect(images, negative_prompt, samples_per_image=2)
    cv = train_control_vectors(pos_h, neg_h)          # ControlVector
    model.query(img, "Describe this image.",
                settings={"steer": cv, "steer_scale": 4.2})
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .models import text as text_ops

CAPTURE_BUCKET = 128  # pad captured sequences to multiples of this


@dataclass
class ControlVector:
    """Per-layer steering directions, shape (n_layers, dim), unit-norm rows.

    `default_scale` matches the reference notebook's 4.2.
    """

    directions: np.ndarray
    default_scale: float = 4.2

    def scaled(self, scale: Optional[float] = None) -> jnp.ndarray:
        s = self.default_scale if scale is None else scale
        return jnp.asarray(self.directions, dtype=jnp.float32) * s

    def __neg__(self) -> "ControlVector":
        return ControlVector(-self.directions, self.default_scale)

    def save(self, path: str):
        np.savez(path, directions=self.directions,
                 default_scale=self.default_scale)

    @classmethod
    def load(cls, path: str) -> "ControlVector":
        z = np.load(path)
        return cls(z["directions"], float(z["default_scale"]))


class HiddenStateCollector:
    """Collects per-layer hidden states of *generated* tokens.

    For each (image, prompt) sample: generate a continuation with the normal
    engine, then run one cache-free full-sequence forward over
    [BOS, image, prompt, generated...] capturing all layers at once. The
    forward is jitted per padded-length bucket.
    """

    def __init__(self, model):
        self.model = model
        self._fns = {}

    def _capture_fn(self, padded_len: int):
        fn = self._fns.get(padded_len)
        if fn is None:
            cfg = self.model.config.text

            def run(text_params, embeds):
                layers = text_ops.produce_hidden_layers(embeds, text_params, cfg)
                return layers[:, 0]  # (L, T, D)

            fn = jax.jit(run)
            self._fns[padded_len] = fn
        return fn

    def collect(
        self,
        images: Sequence,
        prompt: str,
        samples_per_image: int = 2,
        max_tokens: int = 48,
        temperature: float = 0.5,
        settings: Optional[dict] = None,
    ) -> List[np.ndarray]:
        """Returns a list of (n_layers, dim) float32 arrays — one per
        generated token across all images/samples."""
        model = self.model
        tok_cfg = model.config.tokenizer
        templates = model.config.tokenizer.templates["query"]
        prompt_ids = (
            list(templates["prefix"])
            + model._encode_text(prompt)
            + list(templates["suffix"])
        )
        gen_settings = {
            "max_tokens": max_tokens,
            "temperature": temperature,
            **(settings or {}),
        }

        out: List[np.ndarray] = []
        wte = model.params["text"]["wte"]
        for image in images:
            enc = model.encode_image(image)
            img_emb = None
            for _ in range(samples_per_image):
                kv = model.load_encoded_image(enc)
                _, _, next_token, pos, kv = model._prefill_prompt(
                    kv, prompt_ids, enc.pos,
                    gen_settings["temperature"], 0.0,
                )
                gen_ids = model._generate_answer_tokens(
                    kv, next_token, pos, gen_settings
                )
                if not gen_ids:
                    continue

                if img_emb is None:
                    img_emb = model._run_vision_encoder(image)  # (729, D)
                bos_emb = wte[jnp.asarray([tok_cfg.bos_id])]
                text_emb = wte[jnp.asarray(prompt_ids + gen_ids)]
                seq = jnp.concatenate([bos_emb, img_emb, text_emb], axis=0)
                total = seq.shape[0]
                padded = int(math.ceil(total / CAPTURE_BUCKET) * CAPTURE_BUCKET)
                seq = jnp.pad(seq, ((0, padded - total), (0, 0)))[None]
                layers = self._capture_fn(padded)(
                    model.params["text"], seq.astype(model.dtype)
                )  # (L, T_pad, D)
                # hidden state at position p predicts token p+1: the states
                # *of* the generated tokens are at their own positions
                start = total - len(gen_ids)
                states = np.asarray(
                    layers[:, start:total, :], dtype=np.float32
                )  # (L, n_gen, D)
                out.extend(states.transpose(1, 0, 2))  # per-token (L, D)
        return out


def train_control_vectors(
    positive: List[np.ndarray], negative: List[np.ndarray]
) -> ControlVector:
    """Paired-difference PCA per layer (the reference notebook's recipe,
    cell 5): center each +/- pair at its midpoint, mean-center the
    population, take the top principal direction via SVD, and orient it so
    positive samples project higher."""
    n = min(len(positive), len(negative))
    if n == 0:
        raise ValueError("need at least one positive and one negative sample")
    pos = np.stack(positive[:n])  # (N, L, D)
    neg = np.stack(negative[:n])
    n_layers = pos.shape[1]

    directions = np.zeros((n_layers, pos.shape[2]), np.float32)
    for layer in range(n_layers):
        p, q = pos[:, layer], neg[:, layer]  # (N, D)
        center = (p + q) / 2
        train = np.concatenate([p - center, q - center], axis=0)
        train = train - train.mean(axis=0, keepdims=True)
        # top principal component
        _, _, vt = np.linalg.svd(train, full_matrices=False)
        d = vt[0]
        d = d / (np.linalg.norm(d) + 1e-8)
        # sign: positives should project larger
        if np.mean(p @ d) < np.mean(q @ d):
            d = -d
        directions[layer] = d
    return ControlVector(directions)
