"""Model configuration dataclasses.

Field names and defaults mirror the reference configuration surface
(/root/reference/moondream/torch/config.py:5-95) so that checkpoints and JSON
config files written for the reference (moondream/config/config_md2.json,
config_md05.json) load unchanged. All dataclasses are frozen and hashable so
they can be passed to jitted functions as static arguments.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Dict, List, Optional


@dataclass(frozen=True)
class TextConfig:
    dim: int = 2048
    ff_dim: int = 8192
    n_layers: int = 24
    vocab_size: int = 51200
    max_context: int = 2048
    n_heads: int = 32
    n_kv_heads: int = 32
    prefix_attn: int = 730
    group_size: Optional[int] = None
    # Route attention through plain XLA ops instead of Pallas kernels.
    # Set (via dataclasses.replace) when running under GSPMD sharding:
    # XLA partitions sdpa across the mesh, while an opaque kernel call
    # would not partition. Static, so it keys distinct jit traces.
    xla_attn: bool = False
    # Store the KV cache as int8 codes with per-(token, cache-row) fp32
    # scales — halves decode's dominant HBM traffic at large batch. Opt-in
    # (slight numeric drift vs bf16 caches); static, keys jit traces.
    kv_int8: bool = False

    @property
    def head_dim(self) -> int:
        return self.dim // self.n_heads

    @property
    def qkv_dim(self) -> int:
        # Fused QKV output width; matches reference text.py:177.
        return int(self.dim * (1 + 2 * self.n_kv_heads / self.n_heads))

    @property
    def rope_dim(self) -> int:
        # Partial rotary: only the first rope_dim channels of each head rotate
        # (reference rope.py:26, text.py:217).
        return self.dim // (2 * self.n_heads)


@dataclass(frozen=True)
class VisionConfig:
    enc_dim: int = 1152
    enc_patch_size: int = 14
    enc_n_layers: int = 27
    enc_ff_dim: int = 4304
    enc_n_heads: int = 16
    proj_out_dim: int = 2048
    crop_size: int = 378
    in_channels: int = 3
    max_crops: int = 12
    overlap_margin: int = 4
    proj_inner_dim: int = 8192

    @property
    def grid_size(self) -> int:
        # Patches per crop edge: 378 // 14 = 27.
        return self.crop_size // self.enc_patch_size

    @property
    def num_patches(self) -> int:
        return self.grid_size * self.grid_size

    @property
    def patch_dim(self) -> int:
        return self.enc_patch_size * self.enc_patch_size * self.in_channels


@dataclass(frozen=True)
class RegionConfig:
    dim: int = 2048
    coord_feat_dim: int = 256
    coord_out_dim: int = 1024
    size_feat_dim: int = 512
    size_out_dim: int = 2048
    inner_dim: int = 8192
    group_size: Optional[int] = None


def _default_templates() -> Dict[str, Optional[Dict[str, List[int]]]]:
    # Prompt templates in token-id space for the "starmie-v1" tokenizer scheme
    # (reference config.py:54-65). Legacy GPT-2-scheme configs override these
    # via from_dict (moondream/config/config_md2.json in the reference).
    return {
        "caption": {
            "short": [1, 32708, 2, 12492, 3],
            "normal": [1, 32708, 2, 6382, 3],
            "long": [1, 32708, 2, 4059, 3],
        },
        "query": {"prefix": [1, 15381, 2], "suffix": [3]},
        "detect": {"prefix": [1, 7235, 476, 2], "suffix": [3]},
        "point": {"prefix": [1, 2581, 2], "suffix": [3]},
    }


def _freeze(obj):
    """Recursively convert dicts/lists to hashable tuples for static args."""
    if isinstance(obj, dict):
        return tuple(sorted((k, _freeze(v)) for k, v in obj.items()))
    if isinstance(obj, list):
        return tuple(_freeze(v) for v in obj)
    return obj


@dataclass(frozen=True)
class TokenizerConfig:
    bos_id: int = 0
    eos_id: int = 0
    answer_id: int = 3
    thinking_id: int = 4
    coord_id: int = 5
    size_id: int = 6
    start_ground_points_id: int = 7
    end_ground_id: int = 9
    templates: Dict[str, Optional[Dict[str, List[int]]]] = field(
        default_factory=_default_templates
    )

    def __hash__(self):
        return hash(
            (
                self.bos_id,
                self.eos_id,
                self.answer_id,
                self.thinking_id,
                self.coord_id,
                self.size_id,
                self.start_ground_points_id,
                self.end_ground_id,
                _freeze(self.templates),
            )
        )


@dataclass(frozen=True)
class MoondreamConfig:
    text: TextConfig = field(default_factory=TextConfig)
    vision: VisionConfig = field(default_factory=VisionConfig)
    region: RegionConfig = field(default_factory=RegionConfig)
    tokenizer: TokenizerConfig = field(default_factory=TokenizerConfig)

    @classmethod
    def from_dict(cls, config_dict: dict) -> "MoondreamConfig":
        return cls(
            text=TextConfig(**config_dict.get("text", {})),
            vision=VisionConfig(**config_dict.get("vision", {})),
            region=RegionConfig(**config_dict.get("region", {})),
            tokenizer=TokenizerConfig(**config_dict.get("tokenizer", {})),
        )

    @classmethod
    def from_json(cls, path: str) -> "MoondreamConfig":
        with open(path, "r") as f:
            return cls.from_dict(json.load(f))

    # Runtime execution switches, not model schema: excluded from to_dict
    # so exported configs stay loadable by the reference implementation
    # (reference config.py:68-95 has no such fields). from_dict still
    # accepts them when present.
    _RUNTIME_TEXT_FIELDS = ("xla_attn", "kv_int8")

    def to_dict(self) -> dict:
        text = dict(self.text.__dict__)
        for f in self._RUNTIME_TEXT_FIELDS:
            text.pop(f, None)
        return {
            "text": text,
            "vision": dict(self.vision.__dict__),
            "region": dict(self.region.__dict__),
            "tokenizer": dict(self.tokenizer.__dict__),
        }


# Published model sizes. MOONDREAM_2B matches the reference defaults;
# MOONDREAM_05B matches moondream/config/config_md05.json (minus the legacy
# GPT-2 tokenizer templates, which callers load via from_json).
MOONDREAM_2B = MoondreamConfig()
MOONDREAM_05B = MoondreamConfig(
    text=TextConfig(
        dim=1024,
        ff_dim=4096,
        n_layers=24,
        vocab_size=51200,
        max_context=2048,
        n_heads=16,
        n_kv_heads=16,
        prefix_attn=730,
    ),
    vision=VisionConfig(
        enc_dim=720,
        enc_patch_size=14,
        enc_n_layers=27,
        enc_ff_dim=2690,
        enc_n_heads=10,
        proj_out_dim=1024,
        crop_size=378,
        in_channels=3,
        max_crops=12,
        overlap_margin=4,
        proj_inner_dim=8192,
    ),
    region=RegionConfig(
        dim=1024,
        coord_feat_dim=256,
        coord_out_dim=1024,
        size_feat_dim=512,
        size_out_dim=2048,
        inner_dim=8192,
    ),
)


def tiny_test_config(vocab_size: int = 512) -> MoondreamConfig:
    """A miniature config for CPU unit tests (keeps all structural invariants:
    729-token image grid, 730 prefix, partial RoPE). Template word ids stay
    below 256 so the offline ByteTokenizer (bytes at 256+) coexists with them
    in a 512-token vocab."""
    tiny_templates = {
        "caption": {
            "short": [1, 10, 2, 11, 3],
            "normal": [1, 10, 2, 12, 3],
            "long": [1, 10, 2, 13, 3],
        },
        "query": {"prefix": [1, 14, 2], "suffix": [3]},
        "detect": {"prefix": [1, 15, 16, 2], "suffix": [3]},
        "point": {"prefix": [1, 17, 2], "suffix": [3]},
    }
    return MoondreamConfig(
        tokenizer=TokenizerConfig(templates=tiny_templates),
        text=TextConfig(
            dim=64,
            ff_dim=128,
            n_layers=2,
            vocab_size=vocab_size,
            max_context=1024,
            n_heads=2,
            n_kv_heads=2,
            prefix_attn=730,
        ),
        vision=VisionConfig(
            enc_dim=32,
            enc_patch_size=14,
            enc_n_layers=2,
            enc_ff_dim=64,
            enc_n_heads=2,
            proj_out_dim=64,
            crop_size=378,
            in_channels=3,
            max_crops=12,
            overlap_margin=4,
            proj_inner_dim=64,
        ),
        region=RegionConfig(
            dim=64,
            coord_feat_dim=16,
            coord_out_dim=1024,
            size_feat_dim=32,
            size_out_dim=2048,
            inner_dim=64,
        ),
    )
