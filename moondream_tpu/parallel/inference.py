"""Tensor-parallel inference for the text decoder.

New TPU-native capability (the reference is strictly single-device,
SURVEY.md §2.5): the 2B decoder's weights, KV cache, and decode loop are
sharded across a `jax.sharding.Mesh` with Megatron-style splits
(mesh.text_param_shardings) and the KV cache's head axis on `tp`. The
whole fused generation loop is one jitted program; XLA GSPMD inserts the
all-reduces after the row-parallel proj/fc2 matmuls over ICI.

Attention runs through the XLA path (config.xla_attn=True): GSPMD
partitions sdpa across head shards, which an opaque Pallas call would not.

Usage:

    eng = ShardedTextEngine(model.params["text"], config.text, mesh)
    logits, hidden, kv = eng.prefill(embeds, pos=0, length=n, prefix_len=n)
    res = eng.generate(kv, first_token, pos, max_tokens=64)
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import TextConfig
from ..engine import generate as engine
from ..models.text import KVCache
from .mesh import text_param_shardings


def kv_cache_sharding(mesh: Mesh, config: Optional[TextConfig] = None) -> KVCache:
    """(L, B, Hkv, T, D): batch on dp, heads on tp. With config.kv_int8 the
    per-row scale arrays shard identically (their head axis matches)."""
    spec = NamedSharding(mesh, P(None, "dp", "tp", None, None))
    if config is not None and config.kv_int8:
        return KVCache(k=spec, v=spec, ks=spec, vs=spec)
    return KVCache(k=spec, v=spec)


class ShardedTextEngine:
    """Sharded prefill / fused-generate over a dp x tp mesh.

    Parameters are placed once at construction; every call is a single
    jitted SPMD program over the mesh.
    """

    def __init__(self, text_params: dict, config: TextConfig, mesh: Mesh):
        from ..config import MoondreamConfig

        self.mesh = mesh
        self.config = dataclasses.replace(config, xla_attn=True)
        shardings = text_param_shardings(
            mesh, MoondreamConfig(text=self.config)
        )
        self.params = jax.device_put(text_params, shardings)
        self._kv_sharding = kv_cache_sharding(mesh, self.config)
        self._jits = {}

    def create_cache(self, batch: int = 1, dtype=jnp.bfloat16) -> KVCache:
        key = ("cache", batch, str(dtype))
        fn = self._jits.get(key)
        if fn is None:
            cfg = self.config

            def make():
                return KVCache.create(cfg, batch=batch, dtype=dtype)

            fn = jax.jit(make, out_shardings=self._kv_sharding)
            self._jits[key] = fn
        return fn()

    def prefill(
        self,
        embeds: jax.Array,
        kv: Optional[KVCache] = None,
        pos: int = 0,
        length: Optional[int] = None,
        prefix_len: Optional[int] = None,
    ) -> Tuple[jax.Array, jax.Array, KVCache]:
        if kv is None:
            kv = self.create_cache(batch=embeds.shape[0], dtype=embeds.dtype)
        if length is None:
            length = embeds.shape[1]
        if prefix_len is None:
            prefix_len = self.config.prefix_attn

        fn = self._jits.get("prefill")
        if fn is None:
            from ..engine import batched as batched_engine

            fn = jax.jit(
                partial(batched_engine.prefill_batched, config=self.config),
                donate_argnums=(1,),
            )
            self._jits["prefill"] = fn
        with self.mesh:
            return fn(
                self.params, kv, embeds,
                jnp.int32(pos), jnp.int32(length), jnp.int32(prefix_len),
            )

    def generate(
        self,
        kv: KVCache,
        first_tokens: jax.Array,
        pos: int,
        max_tokens: int = 128,
        temperature: float = 0.0,
        top_p: float = 0.0,
        eos_id: int = 0,
        suppress_ids: Tuple[int, ...] = (),
        rng: Optional[jax.Array] = None,
        buffer: int = 1024,
    ):
        """Lockstep fused generation for the whole (dp-sharded) batch.
        first_tokens: (B,). Returns BatchedGenerateResult."""
        from ..engine import batched as batched_engine

        key = ("gen", eos_id, suppress_ids, buffer)
        fn = self._jits.get(key)
        if fn is None:
            fn = jax.jit(
                partial(
                    batched_engine.generate_text_batched,
                    config=self.config,
                    eos_id=eos_id,
                    suppress_ids=suppress_ids,
                    buffer=buffer,
                ),
                donate_argnums=(1,),
            )
            self._jits[key] = fn
        if rng is None:
            rng = jax.random.PRNGKey(0)
        first_tokens = jnp.atleast_1d(jnp.asarray(first_tokens, jnp.int32))
        with self.mesh:
            return fn(
                self.params, kv, first_tokens,
                jnp.int32(pos), rng,
                jnp.float32(temperature), jnp.float32(top_p),
                jnp.int32(max_tokens),
            )
