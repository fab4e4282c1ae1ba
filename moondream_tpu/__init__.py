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

        # Keep "cpu" available as a SECONDARY backend (the first entry
        # stays the default): offline steps like int8 activation-scale
        # calibration (models.vision.collect_vision_act_stats) run on the
        # host next to the checkpoint loader, and pinning jax_platforms
        # to the accelerator alone would make jax.devices("cpu") raise.
        _plats = _os.environ["JAX_PLATFORMS"]
        if "cpu" not in _plats.split(","):
            _plats += ",cpu"
        _jax.config.update("jax_platforms", _plats)
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
