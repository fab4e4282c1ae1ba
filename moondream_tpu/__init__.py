"""moondream_tpu — a TPU-native (JAX/XLA/Pallas) vision-language framework
with the capability surface of vikhyat/moondream: caption, query (VQA with
optional reasoning+grounding), detect, point, and gaze detection over images,
plus finetuning, evaluation, quantized checkpoints, and LoRA variants.
"""

import os as _os

# Restore standard JAX platform-selection semantics: some managed TPU
# environments register their backend via sitecustomize and resolve the
# default backend through a hook that ignores the JAX_PLATFORMS env var,
# so a subprocess exported JAX_PLATFORMS=cpu would still try (and, with
# the device unreachable, hang on) the TPU plugin. Applying the env var
# through jax.config before any backend instantiation makes every CLI and
# subprocess honor it; when the env var matches the environment's own
# default this is a no-op.
if _os.environ.get("JAX_PLATFORMS"):
    try:
        import jax as _jax

        _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
    except Exception:
        pass

from .config import (  # noqa: F401
    MOONDREAM_05B,
    MOONDREAM_2B,
    MoondreamConfig,
    RegionConfig,
    TextConfig,
    TokenizerConfig,
    VisionConfig,
    tiny_test_config,
)

__version__ = "0.1.0"


def __getattr__(name):
    # Lazy imports keep `import moondream_tpu` light (no jax trace-time cost)
    # for config-only consumers.
    if name == "MoondreamModel":
        from .models.moondream import MoondreamModel

        return MoondreamModel
    if name == "EncodedImage":
        from .models.moondream import EncodedImage

        return EncodedImage
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
