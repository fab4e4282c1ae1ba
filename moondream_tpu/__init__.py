"""moondream_tpu — a TPU-native (JAX/XLA/Pallas) vision-language framework
with the capability surface of vikhyat/moondream: caption, query (VQA with
optional reasoning+grounding), detect, point, and gaze detection over images,
plus finetuning, evaluation, quantized checkpoints, and LoRA variants.
"""

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
