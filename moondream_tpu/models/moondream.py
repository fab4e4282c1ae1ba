"""MoondreamModel: the public inference API.

Capability parity with the reference orchestrator
(/root/reference/moondream/torch/moondream.py:81-973): `encode_image`,
`caption`, `query` (with reasoning + grounding and spatial refs), `detect`,
`point`, `detect_gaze`, LoRA variants, streaming, and both tokenizer/template
schemes.

TPU-native architecture (not a port):
  * Parameters are immutable pytrees; the KV cache is an explicit value
    threaded through jitted calls with buffer donation — no module state.
  * All hot paths are jitted once per static shape: the ViT runs over
    bucketed crop batches, prompt prefills pad to small length buckets, and
    whole generations run as single fused `lax.while_loop` device calls
    (stream=False) or a jitted step loop (stream=True).
  * `EncodedImage` stores the 730-position KV snapshot as arrays; "loading"
    it materializes a fresh working cache (reference mutates module buffers,
    moondream.py:620-623).
"""

from __future__ import annotations

import threading
from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, List, Literal, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import MoondreamConfig
from ..engine import generate as engine
from ..engine.sampling import sample_token
from ..ops.image_crops import overlap_crop_image, reconstruct_from_crops
from ..tokenizer import TokenizerBase, load_tokenizer
from ..utils.points import remove_outlier_points
from ..utils.streaming import TokenStreamer, stream_text
from . import region as region_ops
from . import text as text_ops
from . import vision as vision_ops
from .text import KVCache

DEFAULT_MAX_TOKENS = 768
DEFAULT_TEMPERATURE = 0.5
DEFAULT_TOP_P = 0.3
DEFAULT_MAX_OBJECTS = 50

# Crop-count buckets for the ViT batch (1 global + up to 12 local crops).
CROP_BUCKETS = (2, 5, 9, 13)
# Prompt prefills pad to multiples of this.
PROMPT_PAD = 8


@dataclass(frozen=True)
class EncodedImage:
    """KV snapshot after prefilling [BOS, image] (reference moondream.py:56-59).

    With config.text.kv_int8, `k`/`v` hold int8 codes and `ks`/`vs` the
    per-(token, cache-row) fp32 scales (see models.text.KVCache).

    `variant` records which LoRA adapter (by name) the prefill ran under
    (None = base weights): the adapter applies to the image prefill too,
    so a snapshot is only valid for requests using the SAME variant —
    encode_image asserts this at reuse instead of relying on a docstring
    contract."""

    pos: int
    k: jax.Array  # (L, 1, H_kv, pos, Dh)
    v: jax.Array
    ks: Optional[jax.Array] = None  # (L, 1, H_kv/pf, pos, 1)
    vs: Optional[jax.Array] = None
    variant: Optional[str] = None

    def as_cache(self) -> KVCache:
        return KVCache(k=self.k, v=self.v, ks=self.ks, vs=self.vs)


def _variant_label(settings) -> Optional[str]:
    """The variant identity a request asks for: an explicit
    "variant_label" (serving engines resolve adapters ahead of time and
    pass the loaded tree), else the "variant" name/path itself."""
    if not settings:
        return None
    label = settings.get("variant_label")
    if label is not None:
        return label
    v = settings.get("variant")
    return v if isinstance(v, str) else None


def _snap_enc(
    kv: KVCache, pos: int, b: Optional[int] = None,
    variant: Optional[str] = None,
) -> "EncodedImage":
    """Slice one image's KV snapshot out of a (possibly batched) cache."""
    from .text import slice_cache_span

    bs = slice(None) if b is None else slice(b, b + 1)
    snap = slice_cache_span(kv, pos, batch=bs)
    return EncodedImage(
        pos=pos, k=snap.k, v=snap.v, ks=snap.ks, vs=snap.vs, variant=variant
    )


def _concat_enc_kv(encs: List["EncodedImage"]) -> KVCache:
    """Stack per-image snapshots along the batch axis as a cache pytree."""
    cat = lambda xs: None if xs[0] is None else jnp.concatenate(xs, axis=1)
    return KVCache(
        k=cat([e.k for e in encs]),
        v=cat([e.v for e in encs]),
        ks=cat([e.ks for e in encs]),
        vs=cat([e.vs for e in encs]),
    )


def _ceil_to(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def _bucket(n: int, buckets=CROP_BUCKETS) -> int:
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


class MoondreamModel:
    def __init__(
        self,
        config: MoondreamConfig,
        params: Optional[dict] = None,
        tokenizer: Optional[TokenizerBase] = None,
        dtype=jnp.bfloat16,
        seed: int = 0,
    ):
        self.config = config
        self.dtype = dtype
        if params is None:
            key = jax.random.PRNGKey(seed)
            kv_, kt_, kr_ = jax.random.split(key, 3)
            params = {
                "vision": vision_ops.init_vision_params(config.vision, kv_, dtype),
                "text": text_ops.init_text_params(config.text, kt_, dtype),
                "region": region_ops.init_region_params(config.region, kr_, dtype),
            }
        self.params = params
        self.tokenizer = tokenizer if tokenizer is not None else load_tokenizer()
        self._rng_counter = seed
        self._jits: Dict[Any, Any] = {}
        # Recycled KV-cache buffers keyed by batch size. A fresh 2B cache is
        # a 400MB zero-fill (~33ms); donating a finished generation's buffer
        # back into the next load makes cache restore cost only the snapshot
        # write. Stale tail slots are never attended before being
        # overwritten (same invariant as prompt padding). The pool has its
        # own lock: servers recycle from pool-stepper threads while other
        # threads take buffers, and the bounded-append check must be atomic.
        self._kv_pool: Dict[int, List[KVCache]] = {}
        self._kv_pool_lock = threading.Lock()
        # Device-preprocess shape router (adaptive mode): a fresh
        # (image shape, tiling) pays a one-off crop-graph compile that
        # would stall a varied-resolution stream, so unseen shapes take
        # the bit-identical host path while a background thread warms the
        # device graph; once warm, the shape routes on-device for good.
        self._devpre_ready: set = set()
        self._devpre_warming: set = set()
        self._devpre_lock = threading.Lock()

    # ------------------------------------------------------------------ rng
    def _next_rng(self) -> jax.Array:
        self._rng_counter += 1
        return jax.random.PRNGKey(self._rng_counter)

    # ------------------------------------------------------------- jit cache
    def _jit(self, key, build):
        fn = self._jits.get(key)
        if fn is None:
            fn = build()
            self._jits[key] = fn
        return fn

    def _vis_enc_fn(self):
        cfg = self.config.vision
        dtype = self.dtype

        def run(vision_params, crops_u8):
            x = crops_u8.astype(dtype) / 255.0
            x = (x - 0.5) / 0.5
            return vision_ops.vision_encoder(x, vision_params, cfg)

        return self._jit("vis_enc", lambda: jax.jit(run))

    def _stitch_proj_fn(self, tiling: Tuple[int, int]):
        cfg = self.config.vision
        g = cfg.grid_size

        def build():
            def run(vision_params, global_feats, local_feats):
                local = local_feats.reshape(-1, g, g, cfg.enc_dim)
                recon = reconstruct_from_crops(
                    local, tiling, overlap_margin=cfg.overlap_margin, patch_size=1
                )
                return vision_ops.vision_projection(
                    global_feats, recon, vision_params, cfg
                )

            return jax.jit(run)

        return self._jit(("stitch", tiling), build)

    def _prefill_fn(self, kv_bound: Optional[int] = None):
        cfg = self.config.text

        def build():
            return jax.jit(
                partial(engine.prefill, config=cfg, kv_bound=kv_bound),
                donate_argnums=(1,),
            )

        return self._jit(("prefill", kv_bound), build)

    def _kv_bound(self, end_pos: int) -> int:
        """Static KV-span bound for a prefill ending at end_pos: rounded up
        to 256 to bound jit-cache variants; None (full cache) past 3/4 of
        the context."""
        max_ctx = self.config.text.max_context
        bound = _ceil_to(max(end_pos, 1), 256)
        return bound if bound <= (3 * max_ctx) // 4 else None

    def _decode_bound(self, end_pos: int) -> Optional[int]:
        """Static KV-read bound for a decode session known to end by
        end_pos: rounded up to 256 (bounding jit variants); None (full
        cache) when within 256 of the context end. Typical captions
        (~860 end) read a 1024-slot span instead of all 2048."""
        max_ctx = self.config.text.max_context
        bound = _ceil_to(min(end_pos, max_ctx), 256)
        return None if bound >= max_ctx else bound

    def _decode_fn(self, kv_bound: Optional[int] = None):
        cfg = self.config.text

        def build():
            return jax.jit(
                partial(engine.decode_step, config=cfg, kv_bound=kv_bound),
                donate_argnums=(1,),
            )

        return self._jit(("decode", kv_bound), build)

    def _generate_fn(
        self,
        eos_id: int,
        suppress: Tuple[int, ...],
        buffer: int,
        kv_bound: Optional[int] = None,
    ):
        cfg = self.config.text

        def build():
            return jax.jit(
                partial(
                    engine.generate_text,
                    config=cfg,
                    eos_id=eos_id,
                    suppress_ids=suppress,
                    buffer=buffer,
                    kv_bound=kv_bound,
                ),
                donate_argnums=(1,),
            )

        return self._jit(("gen", eos_id, suppress, buffer, kv_bound), build)

    # prompt tails are bucketed to this fixed width (left-padded with -1)
    # so seeded speculative decoding compiles once, not per prompt length
    SPEC_SEED_LEN = 64

    def _spec_fn(
        self,
        eos_id: int,
        suppress: Tuple[int, ...],
        buffer: int,
        spec_k: int,
        kv_bound: Optional[int] = None,
        seeded: bool = False,
    ):
        cfg = self.config.text

        def build():
            return jax.jit(
                partial(
                    engine.generate_text_spec,
                    config=cfg,
                    eos_id=eos_id,
                    suppress_ids=suppress,
                    buffer=buffer,
                    spec_k=spec_k,
                    kv_bound=kv_bound,
                ),
                donate_argnums=(1,),
            )

        return self._jit(
            ("spec", eos_id, suppress, buffer, spec_k, kv_bound, seeded), build
        )

    def _spec_sampled_fn(
        self,
        eos_id: int,
        suppress: Tuple[int, ...],
        buffer: int,
        spec_k: int,
        kv_bound: Optional[int] = None,
        seeded: bool = False,
    ):
        cfg = self.config.text

        def build():
            return jax.jit(
                partial(
                    engine.generate_text_spec_sampled,
                    config=cfg,
                    eos_id=eos_id,
                    suppress_ids=suppress,
                    buffer=buffer,
                    spec_k=spec_k,
                    kv_bound=kv_bound,
                ),
                donate_argnums=(1,),
            )

        return self._jit(
            ("spec_s", eos_id, suppress, buffer, spec_k, kv_bound, seeded),
            build,
        )

    def _spec_seed(self, prompt_tokens) -> Optional[jax.Array]:
        """Fixed-width draft seed from a prompt's token tail (None when
        there is no prompt to seed from)."""
        if not prompt_tokens:
            return None
        tail = list(prompt_tokens)[-self.SPEC_SEED_LEN :]
        arr = np.full((self.SPEC_SEED_LEN,), -1, np.int32)
        arr[-len(tail) :] = tail
        return jnp.asarray(arr)

    def _reasoning_fn(
        self, suppress: Tuple[int, ...], buffer: int,
        kv_bound: Optional[int] = None,
    ):
        cfg = self.config.text
        tok = self.config.tokenizer

        def build():
            return jax.jit(
                partial(
                    engine.generate_reasoning,
                    config=cfg,
                    answer_id=tok.answer_id,
                    coord_id=tok.coord_id,
                    suppress_ids=suppress,
                    buffer=buffer,
                    kv_bound=kv_bound,
                ),
                donate_argnums=(2,),
            )

        return self._jit(("reason", suppress, buffer, kv_bound), build)

    def _points_fn(
        self, include_size: bool, max_objects: int,
        kv_bound: Optional[int] = None,
    ):
        cfg = self.config.text

        def build():
            return jax.jit(
                partial(
                    engine.generate_points,
                    config=cfg,
                    eos_id=self.config.tokenizer.eos_id,
                    include_size=include_size,
                    max_objects=max_objects,
                    kv_bound=kv_bound,
                ),
                donate_argnums=(2,),
            )

        return self._jit(("points", include_size, max_objects, kv_bound), build)

    def _load_kv_fn(self):
        def build():
            def run(buf: KVCache, snap: KVCache):
                return jax.tree.map(
                    lambda b, s: jax.lax.dynamic_update_slice(
                        b, s, (0,) * b.ndim
                    ),
                    buf, snap,
                )

            return jax.jit(run, donate_argnums=(0,))

        return self._jit("load_kv", build)

    def _take_kv_buffer(self, batch: int = 1, slots: Optional[int] = None) -> KVCache:
        key = (batch, slots or self.config.text.max_context)
        with self._kv_pool_lock:
            pool = self._kv_pool.get(key)
            if pool:
                return pool.pop()
        return KVCache.create(
            self.config.text, batch=batch, dtype=self.dtype, slots=slots
        )

    def _recycle_kv(self, kv: Optional[KVCache], batch: int = 1) -> None:
        """Return a finished generation's cache buffer to the pool. The
        caller must drop its own references (the buffer will be donated).
        Thread-safe: servers recycle from threads that don't hold the
        model-level serialization lock."""
        if kv is None:
            return
        key = (batch, int(kv.k.shape[3]))
        with self._kv_pool_lock:
            pool = self._kv_pool.setdefault(key, [])
            if len(pool) < 2:
                pool.append(kv)

    def _sample_fn(self):
        return self._jit("sample", lambda: jax.jit(sample_token))

    def _prefill_batched_fn(self, kv_bound: Optional[int] = None):
        from ..engine import batched

        cfg = self.config.text

        def build():
            return jax.jit(
                partial(batched.prefill_batched, config=cfg, kv_bound=kv_bound),
                donate_argnums=(1,),
            )

        return self._jit(("prefill_b", kv_bound), build)

    def _generate_batched_fn(
        self, eos_id: int, suppress: Tuple[int, ...], buffer: int,
        kv_bound: Optional[int] = None,
    ):
        from ..engine import batched

        cfg = self.config.text

        def build():
            return jax.jit(
                partial(
                    batched.generate_text_batched,
                    config=cfg,
                    eos_id=eos_id,
                    suppress_ids=suppress,
                    buffer=buffer,
                    kv_bound=kv_bound,
                ),
                donate_argnums=(1,),
            )

        return self._jit(("gen_b", eos_id, suppress, buffer, kv_bound), build)

    def _generate_spec_batched_fn(
        self, eos_id: int, suppress: Tuple[int, ...], buffer: int,
        kv_bound: Optional[int] = None, spec_k: int = 8,
    ):
        from ..engine import batched

        cfg = self.config.text

        def build():
            return jax.jit(
                partial(
                    batched.generate_text_spec_batched,
                    config=cfg,
                    eos_id=eos_id,
                    suppress_ids=suppress,
                    buffer=buffer,
                    kv_bound=kv_bound,
                    spec_k=spec_k,
                ),
                donate_argnums=(1,),
            )

        return self._jit(
            ("gen_spec_b", eos_id, suppress, buffer, kv_bound, spec_k), build
        )

    def _sample_batched_fn(self):
        from ..engine import batched

        return self._jit(
            "sample_b", lambda: jax.jit(batched.sample_tokens_batched)
        )

    def _load_kv_batched_fn(self, batch: int, slots: Optional[int] = None):
        def build():
            def run(buf: KVCache, snap: KVCache):
                return jax.tree.map(
                    lambda b, s: jax.lax.dynamic_update_slice(
                        b, s, (0,) * b.ndim
                    ),
                    buf, snap,
                )

            return jax.jit(run, donate_argnums=(0,))

        load = self._jit(("load_kv_b", batch, slots), build)
        return lambda snap: load(self._take_kv_buffer(batch, slots), snap)

    # ------------------------------------------------------------- tokenize
    def _encode_text(self, text: str) -> List[int]:
        return self.tokenizer.encode(text)

    def _decode_tokens(self, ids) -> str:
        return self.tokenizer.decode([int(i) for i in ids])

    # --------------------------------------------------------------- vision
    def _device_preprocess_fn(self, shape, tiling):
        """Jitted whole-image -> padded crop stack on device (the opt-in
        two-matmul Lanczos path, ops.device_preprocess)."""
        from ..ops.device_preprocess import device_overlap_crops

        cfg = self.config.vision
        n = tiling[0] * tiling[1] + 1
        b = _bucket(n)

        def build():
            def run(image_u8):
                crops = device_overlap_crops(
                    image_u8, tiling, cfg.crop_size, cfg.enc_patch_size,
                    cfg.overlap_margin,
                )
                if b > n:
                    crops = jnp.concatenate(
                        [crops, jnp.zeros((b - n, *crops.shape[1:]),
                                          crops.dtype)], axis=0
                    )
                return crops

            return jax.jit(run)

        return self._jit(("dev_pre", shape, tiling), build)

    def _device_preprocess_batched_fn(self, count, shape, tiling):
        """Jitted (count, H, W, 3) uint8 -> image-major crop stack on
        device (vmapped fixed-point Lanczos, ops.device_preprocess)."""
        from ..ops.device_preprocess import device_overlap_crops_batched

        cfg = self.config.vision

        def build():
            return jax.jit(
                lambda imgs: device_overlap_crops_batched(
                    imgs, tiling, cfg.crop_size, cfg.enc_patch_size,
                    cfg.overlap_margin,
                )
            )

        return self._jit(("dev_pre_b", count, shape, tiling), build)

    def _devpre_route(self, shape, tiling) -> bool:
        """Decide host vs device preprocessing for one (image shape,
        tiling). 'eager' always routes on-device (fixed-shape benches /
        tests; a new shape compiles inline). 'adaptive' (the default)
        routes on-device only once the shape's crop graph is compiled:
        the first image of a new shape takes the bit-identical host path
        while a daemon thread warms the device graphs, so a
        varied-resolution production stream never stalls on a compile
        (per-shape cost would otherwise be 100s of ms even with the
        persistent compilation cache). The warm covers the single-image
        and count-1 batched graphs; other batch counts compile inline on
        first use (one-off, persisted in the compilation cache)."""
        from ..ops import device_preprocess as devpre

        if devpre.mode() == "eager":
            return True
        key = (tuple(shape), tuple(tiling))
        with self._devpre_lock:
            if key in self._devpre_ready:
                return True
            if key in self._devpre_warming:
                return False
            self._devpre_warming.add(key)

        def warm():
            try:
                dummy = jnp.zeros(shape, jnp.uint8)  # device fill, no H2D
                jax.block_until_ready(
                    self._device_preprocess_fn(tuple(shape), tiling)(dummy)
                )
                jax.block_until_ready(
                    self._device_preprocess_batched_fn(
                        1, tuple(shape), tiling
                    )(dummy[None])
                )
                with self._devpre_lock:
                    self._devpre_ready.add(key)
            finally:
                with self._devpre_lock:
                    self._devpre_warming.discard(key)

        threading.Thread(target=warm, daemon=True).start()
        return False

    def _prep_crop_groups(self, images):
        """Per image: (crops | raw image, tiling). With device
        preprocessing on (the default), the raw uint8 array is returned
        (ndim 3) and cropping happens on device in _crops_device —
        bit-identical to host crops, ~0 host resample cost, and a smaller
        H2D transfer. Host fallback returns the (n, base, base, 3) crop
        stack (ndim 4); shapes whose device graph is still compiling
        route host too (_devpre_route)."""
        from ..ops import device_preprocess as devpre

        cfg = self.config.vision
        use_dev = devpre.enabled()
        out = []
        for im in images:
            np_image = np.asarray(im.convert("RGB"))
            tiling = None
            if use_dev and devpre.exact_path_supported(
                *np_image.shape[:2], cfg.crop_size
            ):
                tiling = devpre.preprocess_tiling(
                    np_image.shape[0], np_image.shape[1], cfg.crop_size,
                    cfg.enc_patch_size, cfg.overlap_margin, cfg.max_crops,
                )
            if tiling is not None and self._devpre_route(
                np_image.shape, tiling
            ):
                out.append((np_image, tiling))
            else:
                co = overlap_crop_image(
                    np_image, overlap_margin=cfg.overlap_margin,
                    max_crops=cfg.max_crops,
                )
                out.append((co["crops"], tuple(co["tiling"])))
        return out

    def _build_crop_segments(self, items):
        """Producer half of the crop-segment contract: split a tiling
        group's per-image items (raw ndim-3 images for device cropping
        and/or ndim-4 host crop stacks) into segments, starting the async
        H2D for each. Consecutive same-shape raw images share a segment
        so they later share one batched device-crop call. NO device
        compute is dispatched here — a producer-thread compute dispatch
        lands at a nondeterministic FIFO position and stalls the
        consumer's in-flight work (engine/pipeline.py). Segments:
        ("raw", count, image_shape, device_u8) | ("crops", device_u8)."""
        segs = []
        run = []  # consecutive raw images of identical shape

        def flush():
            if run:
                batch = np.stack(run)
                segs.append((
                    "raw", batch.shape[0], run[0].shape, jnp.asarray(batch)
                ))
                run.clear()

        for it in items:
            if it.ndim == 3:  # raw image -> device crops
                if run and run[0].shape != it.shape:
                    flush()
                run.append(it)
            else:  # host crop stack
                flush()
                segs.append(("crops", jnp.asarray(it)))
        flush()
        return segs

    def _materialize_crop_segments(self, segs, tiling) -> jax.Array:
        """Consumer half: dispatch each raw segment's device crop graph
        (in THIS thread's dispatch order, adjacent to the ViT) and
        concatenate into one image-major crop array."""
        parts = []
        for seg in segs:
            if seg[0] == "raw":
                _, cnt, shape, dev = seg
                parts.append(
                    self._device_preprocess_batched_fn(cnt, shape, tiling)(
                        dev
                    )
                )
            else:
                parts.append(seg[1])
        return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)

    def _crops_device(self, items, tiling) -> jax.Array:
        """Concatenate a tiling group's per-image crops (host stacks
        and/or raw images for device cropping) into one image-major
        device array (single-thread path: build + materialize here)."""
        return self._materialize_crop_segments(
            self._build_crop_segments(items), tiling
        )

    def _run_vision_encoder(self, image) -> jax.Array:
        """PIL image -> (729, text_dim) projected image embedding
        (reference moondream.py:206-228).

        The Lanczos resize + tile extraction runs ON DEVICE by default
        (ops.device_preprocess): it reproduces Pillow's fixed-point
        resampler exactly on the MXU, so it is uint8-bit-exact with the
        host PIL/C++ path (tests/test_device_preprocess.py) — parity at
        host-resize cost ~0. Set MOONDREAM_DEVICE_PREPROCESS=0 to force
        the host path (e.g. images too large for the exact-f32 tap
        guarantee, or debugging)."""
        cfg = self.config.vision
        np_image = np.asarray(image.convert("RGB"))

        from ..ops import device_preprocess as devpre

        tiling = None
        if devpre.enabled() and devpre.exact_path_supported(
            *np_image.shape[:2], cfg.crop_size
        ):
            tiling = devpre.preprocess_tiling(
                np_image.shape[0], np_image.shape[1], cfg.crop_size,
                cfg.enc_patch_size, cfg.overlap_margin, cfg.max_crops,
            )
        if tiling is not None and self._devpre_route(np_image.shape, tiling):
            n = tiling[0] * tiling[1] + 1
            crops_dev = self._device_preprocess_fn(np_image.shape, tiling)(
                jnp.asarray(np_image)
            )
            feats = self._vis_enc_fn()(self.params["vision"], crops_dev)
        else:
            crops_out = overlap_crop_image(
                np_image, overlap_margin=cfg.overlap_margin,
                max_crops=cfg.max_crops,
            )
            crops = crops_out["crops"]
            tiling = tuple(crops_out["tiling"])

            n = crops.shape[0]
            b = _bucket(n)
            if b > n:
                crops = np.concatenate(
                    [crops, np.zeros((b - n, *crops.shape[1:]), crops.dtype)],
                    axis=0,
                )
            feats = self._vis_enc_fn()(self.params["vision"], jnp.asarray(crops))

        global_feats = feats[0]
        local_feats = feats[1:n]
        return self._stitch_proj_fn(tiling)(
            self.params["vision"], global_feats, local_feats
        )

    def encode_image(
        self, image, settings: Optional[Dict[str, Any]] = None
    ) -> EncodedImage:
        """Encode an image and prefill [BOS, image] through the text model
        (reference moondream.py:230-268)."""
        want = _variant_label(settings)
        if isinstance(image, EncodedImage):
            if image.variant != want:
                raise ValueError(
                    f"EncodedImage was encoded under variant "
                    f"{image.variant!r} but this request uses {want!r}; "
                    "the adapter applies to the image prefill, so re-encode "
                    "the image under the request's variant"
                )
            return image

        lora = self._variant(settings)
        img_emb = self._run_vision_encoder(image)
        bos = self.config.tokenizer.bos_id
        bos_emb = self.params["text"]["wte"][jnp.asarray([[bos]])]
        embeds = jnp.concatenate([bos_emb, img_emb[None]], axis=1).astype(self.dtype)
        seq = embeds.shape[1]

        kv = self._take_kv_buffer(1)
        _, _, kv = self._prefill_fn(self._kv_bound(seq))(
            self.params["text"], kv, embeds,
            jnp.int32(0), jnp.int32(seq), jnp.int32(seq), lora=lora,
        )
        enc = _snap_enc(kv, seq, variant=want)
        self._recycle_kv(kv)
        return enc

    def compile(
        self, settings: Optional[Dict[str, Any]] = None
    ) -> "MoondreamModel":
        """Pre-compile the hot paths (API parity with reference
        moondream.py:194-204, which wraps torch.compile). Under JAX every
        path jit-compiles on first use; this runs one dummy request through
        encode / caption / query (incl. reasoning) / detect / point /
        detect_gaze.

        jit cache keys include the static KV-read bound derived from
        max_tokens / max_objects, so warming MUST use the same settings
        real requests will use — pass `settings` if yours differ from the
        defaults (warming with tiny limits would compile throwaway buckets
        and leave the real ones cold). Larger crop tilings still compile on
        first encounter (shapes are bucketed); the batched/pipelined
        engines compile on their first batch."""
        from PIL import Image as PILImage

        dummy = PILImage.new("RGB", (self.config.vision.crop_size,) * 2)
        s = dict(settings or {})
        # greedy warming traces the same graphs as sampled decoding (the
        # temperature/top_p switch is a traced lax.cond), but with random
        # logits greedy terminates deterministically
        s.setdefault("max_tokens", DEFAULT_MAX_TOKENS)
        s.setdefault("max_objects", DEFAULT_MAX_OBJECTS)
        s.setdefault("temperature", 0.0)
        s.setdefault("top_p", 0.0)
        enc = self.encode_image(dummy)
        self.caption(enc, "normal", settings=s)
        self.query(image=enc, question="?", settings=s)
        self.query(image=enc, question="?", reasoning=True, settings=s)
        self.detect(enc, "x", settings=s)
        self.point(enc, "x", settings=s)
        self.detect_gaze(enc, eye=(0.5, 0.5))
        return self

    def load_encoded_image(
        self, encoded: EncodedImage, slots: Optional[int] = None
    ) -> KVCache:
        """Materialize a working KV cache from a snapshot (functional analog
        of reference moondream.py:620-623). Reuses a pooled buffer when one
        is available so restore costs only the snapshot write.

        `slots`: bound the buffer's token capacity (default: full
        max_context). Serving engines pass their slot_len — a 2B bf16
        full-context buffer is ~0.4 GB, and a pool admitting many requests
        concurrently holds one buffer per in-flight PreparedRequest, so
        right-sizing them is what keeps admission from OOMing the chip."""
        return self._load_kv_fn()(
            self._take_kv_buffer(1, slots), encoded.as_cache()
        )

    # ------------------------------------------------------------- prefill
    def _variant(self, settings) -> Optional[dict]:
        if settings is None:
            return None
        # "variant_tree": an already-loaded stacked adapter pytree (the
        # serving engine holds its tenants' adapters in memory and must
        # apply them to the image prefill too — reference semantics put
        # the adapter in EVERY text forward, lora.py via text.py:31-58)
        if settings.get("variant_tree") is not None:
            return settings["variant_tree"]
        if settings.get("variant") is None:
            return None
        from ..lora import variant_state_dict

        return variant_state_dict(
            settings["variant"],
            n_layers=self.config.text.n_layers,
            dtype_str=str(jnp.dtype(self.dtype)),
        )

    def _prefill_prompt(
        self,
        kv: KVCache,
        prompt_tokens: List[int],
        pos: int,
        temperature: float,
        top_p: float,
        spatial_refs=None,
        prefix_len: Optional[int] = None,
        lora: Optional[dict] = None,
        steer: Optional[jax.Array] = None,
    ):
        """Embed + prefill a prompt, sample the first token
        (reference moondream.py:280-321). Returns
        (logits, hidden, next_token (device), new_pos, kv)."""
        tok_cfg = self.config.tokenizer
        ids = list(prompt_tokens)
        length = len(ids)
        pad = max(_ceil_to(length, PROMPT_PAD), PROMPT_PAD)
        ids_padded = ids + [0] * (pad - length)

        emb = self.params["text"]["wte"][jnp.asarray([ids_padded])].astype(self.dtype)

        if spatial_refs:
            encoded = region_ops.encode_spatial_refs(spatial_refs, self.params["region"])
            coord_pos = [i for i, t in enumerate(ids) if t == tok_cfg.coord_id]
            emb = emb.at[0, jnp.asarray(coord_pos)].set(
                encoded["coords"].astype(self.dtype)
            )
            if encoded["sizes"] is not None:
                size_pos = [i for i, t in enumerate(ids) if t == tok_cfg.size_id]
                emb = emb.at[0, jnp.asarray(size_pos)].set(
                    encoded["sizes"].astype(self.dtype)
                )

        if prefix_len is None:
            prefix_len = self.config.text.prefix_attn

        logits, hidden, kv = self._prefill_fn(self._kv_bound(pos + pad))(
            self.params["text"], kv, emb,
            jnp.int32(pos), jnp.int32(length), jnp.int32(prefix_len),
            lora=lora, steer=steer,
        )
        next_token = self._sample_fn()(
            logits, self._next_rng(), jnp.float32(temperature), jnp.float32(top_p)
        ).astype(jnp.int32)
        return logits, hidden, next_token, pos + length, kv

    def _steer_vectors(self, settings) -> Optional[jax.Array]:
        """Extract pre-scaled control vectors from settings
        (``settings={"steer": ControlVector | (L, D) array,
        "steer_scale": float}``). See moondream_tpu.repeng."""
        if settings is None or settings.get("steer") is None:
            return None
        steer = settings["steer"]
        scale = settings.get("steer_scale", None)
        if hasattr(steer, "scaled"):  # ControlVector
            return steer.scaled(scale)
        arr = jnp.asarray(steer)
        return arr * (1.0 if scale is None else scale)

    # ------------------------------------------------------------ generation
    def _settings(self, settings) -> Tuple[int, float, float]:
        s = settings or {}
        return (
            s.get("max_tokens", DEFAULT_MAX_TOKENS),
            s.get("temperature", DEFAULT_TEMPERATURE),
            s.get("top_p", DEFAULT_TOP_P),
        )

    def _generate_answer_tokens(
        self, kv, next_token, pos, settings, eos_id=None, lora=None,
        steer=None, prompt_tokens=None,
    ) -> List[int]:
        """Fused-loop generation; returns the generated token ids."""
        max_tokens, temperature, top_p = self._settings(settings)
        eos = eos_id if eos_id is not None else self.config.tokenizer.eos_id
        suppress = (self.config.tokenizer.answer_id,)
        buffer = self.config.text.max_context

        # speculative decode (settings={"speculative": k} or True -> k=8):
        # n-gram drafts verified in one k-token forward. Greedy
        # (temperature 0): verification accepts a draft only when it
        # equals the argmax continuation — outputs match the plain loop
        # (engine.generate_text_spec). Sampled (temperature > 0):
        # rejection against the target nucleus distribution — the output
        # DISTRIBUTION is exactly the plain sampled loop's, though not
        # bit-identical per rng (engine.generate_text_spec_sampled). The
        # prompt's token tail seeds the draft history (prompt-lookup).
        spec = (settings or {}).get("speculative")
        if spec:
            spec_k = 8 if spec is True else max(2, int(spec))
            bound = self._decode_bound(pos + max_tokens + spec_k + 1)
            seed = self._spec_seed(prompt_tokens)
            kw = {"seed": seed} if seed is not None else {}
            if temperature == 0:
                fn = self._spec_fn(
                    eos, suppress, buffer, spec_k, bound,
                    seeded=seed is not None,
                )
                result = fn(
                    self.params["text"], kv, next_token, jnp.int32(pos),
                    jnp.int32(max_tokens), lora=lora, steer=steer, **kw,
                )
            else:
                fn = self._spec_sampled_fn(
                    eos, suppress, buffer, spec_k, bound,
                    seeded=seed is not None,
                )
                result = fn(
                    self.params["text"], kv, next_token, jnp.int32(pos),
                    self._next_rng(), jnp.float32(temperature),
                    jnp.float32(top_p), jnp.int32(max_tokens),
                    lora=lora, steer=steer, **kw,
                )
        else:
            bound = self._decode_bound(pos + max_tokens + 1)
            result = self._generate_fn(eos, suppress, buffer, bound)(
                self.params["text"], kv, next_token, jnp.int32(pos),
                self._next_rng(), jnp.float32(temperature), jnp.float32(top_p),
                jnp.int32(max_tokens), lora=lora, steer=steer,
            )
        count = int(result.count)
        tokens = [int(t) for t in np.asarray(result.tokens[:count])]
        self._recycle_kv(result.kv)
        return tokens

    def _stream_answer(
        self, kv, next_token, pos, settings, eos_id=None, lora=None,
        steer=None, prompt_tokens=None,
    ):
        """Incremental streaming generator (jitted step per token),
        reference moondream.py:471-539."""
        max_tokens, temperature, top_p = self._settings(settings)
        eos = eos_id if eos_id is not None else self.config.tokenizer.eos_id
        answer_id = self.config.tokenizer.answer_id
        sample = self._sample_fn()
        wte = self.params["text"]["wte"]
        streamer = TokenStreamer(self._decode_tokens)
        max_ctx = self.config.text.max_context

        spec = (settings or {}).get("speculative")
        if spec:
            yield from self._stream_answer_spec(
                kv, next_token, pos, max_tokens, eos,
                8 if spec is True else max(2, int(spec)),
                (answer_id,), lora, steer, streamer, prompt_tokens,
                temperature, top_p,
            )
            return

        decode = self._decode_fn(self._decode_bound(pos + max_tokens + 1))
        tok = int(next_token)
        generated = 0
        try:
            while tok != eos and generated < max_tokens and pos < max_ctx:
                chunk = streamer.feed(tok)
                if chunk:
                    yield chunk
                emb = wte[jnp.asarray([[tok]])].astype(self.dtype)
                logits, _, kv = decode(
                    self.params["text"], kv, emb, jnp.int32(pos), lora=lora, steer=steer
                )
                logits = logits.at[answer_id].set(engine.NEG_INF)
                tok = int(
                    sample(logits, self._next_rng(), jnp.float32(temperature), jnp.float32(top_p))
                )
                pos += 1
                generated += 1
            tail = streamer.finish()
            if tail:
                yield tail
        finally:
            self._recycle_kv(kv)

    def _verify_fn(
        self, spec_k: int, suppress: Tuple[int, ...],
        kv_bound: Optional[int] = None, sampled: bool = False,
    ):
        cfg = self.config.text

        def build():
            return jax.jit(
                partial(
                    engine.verify_step_sampled if sampled
                    else engine.verify_step,
                    config=cfg, suppress_ids=suppress, kv_bound=kv_bound,
                ),
                donate_argnums=(1,),
            )

        return self._jit(("verify", spec_k, suppress, kv_bound, sampled), build)

    def _stream_answer_spec(
        self, kv, next_token, pos, max_tokens, eos, spec_k, suppress,
        lora, steer, streamer, prompt_tokens=None,
        temperature=0.0, top_p=0.0,
    ):
        """Speculative streaming: the host drafts spec_k-1 tokens by bigram
        lookup over [prompt tail; generated ids] and one jitted verify
        forward advances 1..spec_k tokens per device round trip. Greedy
        (temperature 0): acceptance runs host-side against the argmax
        continuations — token-for-token identical to the plain greedy
        stream. Sampled: the rejection test and residual/bonus draws run
        on device (engine.verify_step_sampled) — distribution-identical
        to the plain sampled stream."""
        sampled = temperature > 0
        verify = self._verify_fn(
            spec_k, suppress,
            self._decode_bound(pos + max_tokens + spec_k + 1),
            sampled=sampled,
        )
        limit_pos = self.config.text.max_context - spec_k + 1

        tok = int(next_token)
        # seed drafting with the prompt tail (prompt-lookup); only the
        # bigram index sees these — emission starts from `tok`
        hist: List[int] = list(prompt_tokens or [])[-self.SPEC_SEED_LEN :]
        follow: Dict[Tuple[int, int], int] = {}  # bigram -> successor start
        for t in range(2, len(hist)):
            follow[(hist[t - 2], hist[t - 1])] = t
        generated = 0
        try:
            while tok != eos and generated < max_tokens and pos < limit_pos:
                chunk = streamer.feed(tok)
                if chunk:
                    yield chunk
                hist.append(tok)
                if len(hist) >= 3:
                    follow[(hist[-3], hist[-2])] = len(hist) - 1
                start = follow.get((hist[-2], hist[-1])) if len(hist) >= 2 else None
                if start is not None:
                    draft = hist[start : start + spec_k - 1]
                    draft += [tok] * (spec_k - 1 - len(draft))
                else:
                    draft = [tok] * (spec_k - 1)

                if sampled:
                    em_arr, m_arr, kv = verify(
                        self.params["text"], kv,
                        jnp.asarray([tok] + draft, jnp.int32),
                        jnp.int32(pos), self._next_rng(),
                        jnp.float32(temperature), jnp.float32(top_p),
                        lora=lora, steer=steer,
                    )
                    em, m = np.asarray(em_arr), int(m_arr)
                    g = [int(t) for t in em]  # emitted[:m] are the tokens
                    # EOS cut mirrors the plain sampled loop: the first
                    # emitted EOS is carried (never fed), loop exits
                    for j in range(m - 1):
                        if g[j] == eos:
                            m = j + 1
                            break
                    m = min(m, max_tokens - generated)
                    for t in g[: m - 1]:
                        chunk = streamer.feed(t)
                        if chunk:
                            yield chunk
                        hist.append(t)
                        if len(hist) >= 3:
                            follow[(hist[-3], hist[-2])] = len(hist) - 1
                    tok = g[m - 1]
                    pos += m
                    generated += m
                    continue

                g_arr, kv = verify(
                    self.params["text"], kv,
                    jnp.asarray([tok] + draft, jnp.int32), jnp.int32(pos),
                    lora=lora, steer=steer,
                )
                g = [int(t) for t in np.asarray(g_arr)]

                # accept while the draft matches the greedy chain; stop
                # extending at EOS so it is carried (and never emitted),
                # exactly like the fused loop's cut
                m = 1
                while m < spec_k and draft[m - 1] == g[m - 1] and g[m - 1] != eos:
                    m += 1
                m = min(m, max_tokens - generated)
                for t in g[: m - 1]:
                    chunk = streamer.feed(t)
                    if chunk:
                        yield chunk
                    hist.append(t)
                    if len(hist) >= 3:
                        follow[(hist[-3], hist[-2])] = len(hist) - 1
                tok = g[m - 1]
                pos += m
                generated += m
            tail = streamer.finish()
            if tail:
                yield tail
        finally:
            self._recycle_kv(kv)

    # ---------------------------------------------------------------- query
    def query(
        self,
        image=None,
        question: str = None,
        reasoning: bool = False,
        spatial_refs=None,
        stream: bool = False,
        settings: Optional[Dict[str, Any]] = None,
    ):
        """VQA with optional chain-of-thought reasoning + grounding
        (reference moondream.py:541-618)."""
        templates = self.config.tokenizer.templates["query"]
        if templates is None:
            raise NotImplementedError("Model does not support querying.")
        if question is None:
            raise ValueError("question must be provided.")
        if spatial_refs and image is None:
            raise ValueError("spatial_refs can only be used with an image.")

        tok_cfg = self.config.tokenizer
        lora = self._variant(settings)

        if image is not None:
            enc = self.encode_image(image, settings)
            kv = self.load_encoded_image(enc)
            pos = enc.pos
            prompt = list(templates["prefix"])
            prefix_len = self.config.text.prefix_attn
        else:
            kv = self._take_kv_buffer(1)
            pos = 0
            prompt = [tok_cfg.bos_id] + list(templates["prefix"])
            prefix_len = 0  # pure causal (reference moondream.py:566-574)

        spatial_toks: List[int] = []
        if spatial_refs:
            for ref in spatial_refs:
                if len(ref) == 2:
                    spatial_toks += [tok_cfg.coord_id, tok_cfg.coord_id]
                else:
                    spatial_toks += [tok_cfg.coord_id, tok_cfg.coord_id, tok_cfg.size_id]

        prompt = prompt + spatial_toks + self._encode_text(question)

        reasoning_dict = {}
        if reasoning:
            max_tokens, temperature, top_p = self._settings(settings)
            r_prompt = prompt + list(templates["suffix"]) + [tok_cfg.thinking_id]
            _, hidden, next_token, pos, kv = self._prefill_prompt(
                kv, r_prompt, pos, temperature, top_p, spatial_refs,
                prefix_len=prefix_len, lora=lora,
            )
            suppress = (tok_cfg.eos_id, tok_cfg.size_id)
            buffer = self.config.text.max_context
            res = self._reasoning_fn(
                suppress, buffer, self._decode_bound(pos + max_tokens + 1)
            )(
                self.params["text"], self.params["region"], kv,
                next_token, hidden, jnp.int32(pos), self._next_rng(),
                jnp.float32(temperature), jnp.float32(top_p),
                jnp.int32(max_tokens), lora=lora,
            )
            kv, pos = res.kv, int(res.pos)
            reasoning_dict = {
                "reasoning": self._assemble_reasoning(
                    np.asarray(res.tokens[: int(res.count)]),
                    np.asarray(res.is_coord[: int(res.count)]),
                    np.asarray(res.coord_vals[: int(res.count)]),
                )
            }
            answer_prompt = list(templates["suffix"])
        else:
            answer_prompt = prompt + list(templates["suffix"])

        max_tokens, temperature, top_p = self._settings(settings)
        steer = self._steer_vectors(settings)
        _, _, next_token, pos, kv = self._prefill_prompt(
            kv, answer_prompt, pos, temperature, top_p,
            spatial_refs if not reasoning else None,
            prefix_len=prefix_len, lora=lora, steer=steer,
        )

        if stream:
            return {
                **reasoning_dict,
                "answer": self._stream_answer(
                    kv, next_token, pos, settings, lora=lora, steer=steer,
                    prompt_tokens=answer_prompt,
                ),
            }
        tokens = self._generate_answer_tokens(
            kv, next_token, pos, settings, lora=lora, steer=steer,
            prompt_tokens=answer_prompt,
        )
        return {**reasoning_dict, "answer": "".join(stream_text(tokens, self._decode_tokens))}

    def _assemble_reasoning(self, tokens, is_coord, coord_vals) -> dict:
        """Host-side chunking of the reasoning stream into text + grounding
        spans (reference moondream.py:360-432)."""
        tok_cfg = self.config.tokenizer
        text_chunks: List[List[int]] = [[]]
        ground_chunks: List[List[float]] = [[]]
        for t, c, v in zip(tokens, is_coord, coord_vals):
            t = int(t)
            if t in (tok_cfg.start_ground_points_id, tok_cfg.end_ground_id):
                text_chunks.append([])
                ground_chunks.append([])
            text_chunks[-1].append(t)
            if c:
                ground_chunks[-1].append(float(v))

        decoded = [self._decode_tokens(chunk) for chunk in text_chunks]
        text = "".join(decoded)

        grounding = []
        start_idx = 0
        for chunk_text, gchunk in zip(decoded, ground_chunks):
            if len(gchunk) > 1:
                pts = [
                    (gchunk[i], gchunk[i + 1])
                    for i in range(0, len(gchunk) - (len(gchunk) % 2), 2)
                ]
                grounding.append(
                    {
                        "start_idx": start_idx,
                        "end_idx": start_idx + len(chunk_text),
                        "points": pts,
                    }
                )
            start_idx += len(chunk_text)
        return {"text": text, "grounding": grounding}

    # -------------------------------------------------------------- caption
    def caption(
        self,
        image,
        length: Literal["normal", "short", "long"] = "normal",
        stream: bool = False,
        settings: Optional[Dict[str, Any]] = None,
    ):
        """Reference moondream.py:625-651."""
        templates = self.config.tokenizer.templates["caption"]
        if templates is None:
            raise NotImplementedError("Model does not support captioning.")
        if length not in templates:
            raise ValueError(f"Model does not support caption length '{length}'.")

        lora = self._variant(settings)
        enc = self.encode_image(image, settings)
        kv = self.load_encoded_image(enc)

        _, temperature, top_p = self._settings(settings)
        steer = self._steer_vectors(settings)
        _, _, next_token, pos, kv = self._prefill_prompt(
            kv, list(templates[length]), enc.pos, temperature, top_p,
            lora=lora, steer=steer,
        )

        if stream:
            return {"caption": self._stream_answer(
                kv, next_token, pos, settings, lora=lora, steer=steer,
                prompt_tokens=list(templates[length]),
            )}
        tokens = self._generate_answer_tokens(
            kv, next_token, pos, settings, lora=lora, steer=steer,
            prompt_tokens=list(templates[length]),
        )
        return {"caption": "".join(stream_text(tokens, self._decode_tokens))}

    # ------------------------------------------------------- detect / point
    def _structured_decode(
        self, image, object: str, template_key: str, include_size: bool, settings
    ):
        templates = self.config.tokenizer.templates[template_key]
        if templates is None:
            raise NotImplementedError(
                f"Model does not support {template_key}."
            )
        lora = self._variant(settings)
        enc = self.encode_image(image, settings)
        kv = self.load_encoded_image(enc)

        prompt = (
            list(templates["prefix"])
            + self._encode_text(" " + object)
            + list(templates["suffix"])
        )
        _, hidden, next_token, pos, kv = self._prefill_prompt(
            kv, prompt, enc.pos, temperature=0.0, top_p=0.0, lora=lora
        )

        max_objects = (
            settings.get("max_objects", DEFAULT_MAX_OBJECTS)
            if settings
            else DEFAULT_MAX_OBJECTS
        )
        steps_per_object = 3 if include_size else 2
        bound = self._decode_bound(pos + steps_per_object * max_objects + 2)
        res = self._points_fn(include_size, max_objects, bound)(
            self.params["text"], self.params["region"], kv,
            hidden, next_token, jnp.int32(pos), lora=lora,
        )
        boxes = np.asarray(res.boxes[: int(res.count)], dtype=np.float64)
        self._recycle_kv(res.kv)
        return boxes

    def detect(self, image, object: str, settings=None):
        """Reference moondream.py:735-781."""
        boxes = self._structured_decode(image, object, "detect", True, settings)
        return {
            "objects": [
                {
                    "x_min": float(b[0]),
                    "y_min": float(b[1]),
                    "x_max": float(b[2]),
                    "y_max": float(b[3]),
                }
                for b in boxes
            ]
        }

    def point(self, image, object: str, settings=None):
        """Reference moondream.py:783-829."""
        pts = self._structured_decode(image, object, "point", False, settings)
        return {"points": [{"x": float(p[0]), "y": float(p[1])} for p in pts]}

    # -------------------------------------------------------------- batching
    def _stitch_proj_batched_fn(self, tiling: Tuple[int, int]):
        cfg = self.config.vision
        g = cfg.grid_size

        def build():
            def run(vision_params, global_feats, local_feats):
                local = local_feats.reshape(-1, g, g, cfg.enc_dim)
                recon = reconstruct_from_crops(
                    local, tiling, overlap_margin=cfg.overlap_margin, patch_size=1
                )
                return vision_ops.vision_projection(
                    global_feats, recon, vision_params, cfg
                )

            return jax.jit(jax.vmap(run, in_axes=(None, 0, 0)))

        return self._jit(("stitch_b", tiling), build)

    def encode_images(self, images, settings=None) -> List[EncodedImage]:
        """Batched image encode: host crops for every image, ONE ViT call
        per (crop-count, tiling) group over the concatenated crop stack,
        one vmapped stitch+projection per group, and ONE batched
        [BOS, image] prefill for all images. New TPU-native capability —
        the reference has no multi-image path (its batch_answer loops,
        hf_moondream.py:99-103)."""
        from collections import defaultdict

        cfg = self.config.vision
        lora = self._variant(settings)

        prepped = self._prep_crop_groups(images)

        groups = defaultdict(list)
        for i, (crops, tiling) in enumerate(prepped):
            n = (crops.shape[0] if crops.ndim == 4
                 else tiling[0] * tiling[1] + 1)
            groups[(n, tiling)].append(i)

        img_embs: List[Optional[jax.Array]] = [None] * len(images)
        for (n, tiling), idxs in groups.items():
            batch_crops = self._crops_device(
                [prepped[i][0] for i in idxs], tiling
            )
            feats = self._vis_enc_fn()(
                self.params["vision"], batch_crops
            )
            feats = feats.reshape(len(idxs), n, *feats.shape[1:])
            embs = self._stitch_proj_batched_fn(tiling)(
                self.params["vision"], feats[:, 0], feats[:, 1:n]
            )
            for j, i in enumerate(idxs):
                img_embs[i] = embs[j]

        bos = self.config.tokenizer.bos_id
        wte = self.params["text"]["wte"]
        bos_emb = wte[jnp.asarray([bos])]
        embeds = jnp.stack(
            [jnp.concatenate([bos_emb, e], axis=0) for e in img_embs]
        ).astype(self.dtype)
        bsz, seq, _ = embeds.shape

        kv = self._take_kv_buffer(bsz, self._kv_bound(seq))
        _, _, kv = self._prefill_batched_fn(self._kv_bound(seq))(
            self.params["text"], kv, embeds,
            jnp.int32(0), jnp.int32(seq), jnp.int32(seq), lora=lora,
        )
        want = _variant_label(settings)
        encs = [_snap_enc(kv, seq, b, variant=want) for b in range(bsz)]
        self._recycle_kv(kv, bsz)
        return encs

    def caption_batch(
        self,
        images,
        length: Literal["normal", "short", "long"] = "normal",
        settings: Optional[Dict[str, Any]] = None,
    ) -> List[str]:
        """Lockstep batched captioning: identical prompts, shared position
        counter, per-row EOS; one fused device loop for the whole batch."""
        return self._symmetric_batch_generate(
            images, list(self.config.tokenizer.templates["caption"][length]),
            settings,
        )

    def query_batch(
        self, images, question: str, settings: Optional[Dict[str, Any]] = None
    ) -> List[str]:
        """Batched VQA with ONE question across all images (symmetric
        prompts decode in exact lockstep)."""
        templates = self.config.tokenizer.templates["query"]
        prompt = (
            list(templates["prefix"])
            + self._encode_text(question)
            + list(templates["suffix"])
        )
        return self._symmetric_batch_generate(images, prompt, settings)

    def _batched_prompt_prefill(self, images, ids, settings, session_end):
        """Shared scaffold for the symmetric batched paths (caption/query/
        detect/point): resolve images to EncodedImages (one batched encode
        for the fresh ones), right-size and load the batched cache to the
        session bound (`session_end(pos, length, pad)` is the last position
        the session can write; a 2048-slot batch-8 2B cache is 3.2GB and
        typical sessions fit in half), broadcast the shared prompt, and run
        ONE batched prefill. Returns (logits, hidden, kv, pos, length,
        bsz, bound, lora)."""
        lora = self._variant(settings)
        encs = [
            im if isinstance(im, EncodedImage) else None for im in images
        ]
        to_encode = [im for im, e in zip(images, encs) if e is None]
        if to_encode:
            fresh = iter(self.encode_images(to_encode, settings))
            encs = [e if e is not None else next(fresh) for e in encs]

        bsz = len(encs)
        pos = encs[0].pos
        length = len(ids)
        pad = max(_ceil_to(length, PROMPT_PAD), PROMPT_PAD)
        bound = self._decode_bound(session_end(pos, length, pad))
        kv = self._load_kv_batched_fn(bsz, bound)(_concat_enc_kv(encs))
        ids_padded = list(ids) + [0] * (pad - length)
        emb = jnp.broadcast_to(
            self.params["text"]["wte"][jnp.asarray(ids_padded)][None],
            (bsz, pad, self.config.text.dim),
        ).astype(self.dtype)

        logits, hidden, kv = self._prefill_batched_fn(self._kv_bound(pos + pad))(
            self.params["text"], kv, emb,
            jnp.int32(pos), jnp.int32(length),
            jnp.int32(self.config.text.prefix_attn), lora=lora,
        )
        return logits, hidden, kv, pos, length, bsz, bound, lora

    def _symmetric_batch_generate(self, images, prompt_tokens, settings) -> List[str]:
        max_tokens, temperature, top_p = self._settings(settings)
        logits, _, kv, pos, length, bsz, bound, lora = self._batched_prompt_prefill(
            images, prompt_tokens, settings,
            lambda pos, length, pad: pos + pad + max_tokens + 1,
        )
        first = self._sample_batched_fn()(
            logits, self._next_rng(), jnp.float32(temperature), jnp.float32(top_p)
        ).astype(jnp.int32)

        suppress = (self.config.tokenizer.answer_id,)
        buffer = self.config.text.max_context
        res = self._generate_batched_fn(
            self.config.tokenizer.eos_id, suppress, buffer, bound
        )(
            self.params["text"], kv, first, jnp.int32(pos + length),
            self._next_rng(), jnp.float32(temperature), jnp.float32(top_p),
            jnp.int32(max_tokens), lora=lora,
        )
        tokens = np.asarray(res.tokens)
        counts = np.asarray(res.counts)
        self._recycle_kv(res.kv, bsz)
        return [
            "".join(stream_text(tokens[b, : counts[b]], self._decode_tokens))
            for b in range(bsz)
        ]

    def _points_batched_fn(
        self, include_size: bool, max_objects: int,
        kv_bound: Optional[int] = None,
    ):
        cfg = self.config.text

        def build():
            from ..engine import batched as batched_engine

            return jax.jit(
                partial(
                    batched_engine.generate_points_batched,
                    config=cfg,
                    eos_id=self.config.tokenizer.eos_id,
                    include_size=include_size,
                    max_objects=max_objects,
                    kv_bound=kv_bound,
                ),
                donate_argnums=(2,),
            )

        return self._jit(
            ("points_b", include_size, max_objects, kv_bound), build
        )

    def _structured_decode_batch(
        self, images, object: str, template_key: str, include_size: bool,
        settings,
    ):
        """Batched detect/point: same object across B images — the video
        recipes' shape (one detect per frame). Symmetric prompts decode in
        exact lockstep; per-row object counts and EOS."""
        templates = self.config.tokenizer.templates[template_key]
        if templates is None:
            raise NotImplementedError(f"Model does not support {template_key}.")
        ids = (
            list(templates["prefix"])
            + self._encode_text(" " + object)
            + list(templates["suffix"])
        )
        max_objects = (
            settings.get("max_objects", DEFAULT_MAX_OBJECTS)
            if settings
            else DEFAULT_MAX_OBJECTS
        )
        steps_per_object = 3 if include_size else 2
        # same bound arithmetic as the single path (_structured_decode):
        # pos + length is the post-prefill position — keeping the bucket
        # identical keeps reduction spans, and therefore near-tie argmax
        # decisions, bit-identical to single-path detect/point
        logits, hidden, kv, pos, length, bsz, bound, lora = (
            self._batched_prompt_prefill(
                images, ids, settings,
                lambda pos, length, pad: (
                    pos + length + steps_per_object * max_objects + 2
                ),
            )
        )
        first = jnp.argmax(logits, -1).astype(jnp.int32)

        res = self._points_batched_fn(include_size, max_objects, bound)(
            self.params["text"], self.params["region"], kv,
            hidden, first, jnp.int32(pos + length), lora=lora,
        )
        boxes = np.asarray(res.boxes, dtype=np.float64)
        counts = np.asarray(res.counts)
        self._recycle_kv(res.kv, bsz)
        return [boxes[b, : counts[b]] for b in range(bsz)]

    def detect_batch(self, images, object: str, settings=None):
        """Batched `detect`: one fused lockstep decode of the same object
        across B images/frames (no reference analog — batch_answer loops,
        hf_moondream.py:99-103)."""
        per_image = self._structured_decode_batch(
            images, object, "detect", True, settings
        )
        return [
            {
                "objects": [
                    {
                        "x_min": float(b[0]), "y_min": float(b[1]),
                        "x_max": float(b[2]), "y_max": float(b[3]),
                    }
                    for b in boxes
                ]
            }
            for boxes in per_image
        ]

    def point_batch(self, images, object: str, settings=None):
        """Batched `point` (see detect_batch)."""
        per_image = self._structured_decode_batch(
            images, object, "point", False, settings
        )
        return [
            {"points": [{"x": float(p[0]), "y": float(p[1])} for p in pts]}
            for pts in per_image
        ]

    # ----------------------------------------------------------------- gaze
    def _gaze_prefill(self, kv, pos0: int, source: Tuple[float, float],
                      lora: Optional[dict] = None):
        """Prefill the embedding-space gaze prompt ("\\n\\nPoint:" + coord
        embeds + " gaze\\n\\n", reference moondream.py:831-859) onto `kv` at
        `pos0`. Returns (hidden, next_token(argmax), new_pos, kv)."""
        wte = self.params["text"]["wte"]
        before = wte[jnp.asarray([self._encode_text("\n\nPoint:")])]
        after = wte[jnp.asarray([self._encode_text(" gaze\n\n")])]
        x_emb = region_ops.encode_coordinate(
            jnp.asarray([[[source[0]]]], dtype=self.dtype), self.params["region"]
        )
        y_emb = region_ops.encode_coordinate(
            jnp.asarray([[[source[1]]]], dtype=self.dtype), self.params["region"]
        )
        embeds = jnp.concatenate(
            [before, x_emb, y_emb, after], axis=1
        ).astype(self.dtype)
        length = embeds.shape[1]
        pad = max(_ceil_to(length, PROMPT_PAD), PROMPT_PAD)
        if pad > length:
            embeds = jnp.pad(embeds, ((0, 0), (0, pad - length), (0, 0)))

        logits, hidden, kv = self._prefill_fn(self._kv_bound(pos0 + pad))(
            self.params["text"], kv, embeds,
            jnp.int32(pos0), jnp.int32(length),
            jnp.int32(self.config.text.prefix_attn), lora=lora,
        )
        next_token = jnp.argmax(logits, -1).astype(jnp.int32)
        return hidden, next_token, pos0 + length, kv

    def _detect_gaze(
        self, encoded: EncodedImage, source: Tuple[float, float], force_detect=False
    ):
        """Reference moondream.py:884-973 accuracy path core."""
        kv = self.load_encoded_image(encoded)
        hidden, next_token, pos, kv = self._gaze_prefill(
            kv, encoded.pos, source
        )
        if force_detect:
            next_token = jnp.int32(0)
        if int(next_token) == self.config.tokenizer.eos_id:
            self._recycle_kv(kv)
            return None

        res = self._points_fn(False, 1, self._decode_bound(pos + 4))(
            self.params["text"], self.params["region"], kv,
            hidden, next_token, jnp.int32(pos),
        )
        count = int(res.count)
        b = np.asarray(res.boxes[0])
        self._recycle_kv(res.kv)
        if count == 0:
            return None
        return {"x": float(b[0]), "y": float(b[1])}

    def _detect_gaze_batch(
        self,
        encs: List[EncodedImage],
        sources: List[Tuple[float, float]],
        force_detect: bool = False,
    ) -> List[Optional[Dict[str, float]]]:
        """Lockstep-batched gaze decode: all (image, eye-source) rows share
        ONE batched prompt prefill and ONE batched coordinate decode step.

        Replaces len(sources) sequential `_detect_gaze` calls (each paying a
        KV restore, prefill, and per-step host syncs) — the reference's
        accuracy mode runs 20 such generations in a Python loop
        (moondream.py:906-973). Row math is identical to the single path
        (lockstep batching shares positions and masks), so outputs match
        `_detect_gaze` per row."""
        from ..engine import batched as batched_engine

        B = len(encs)
        wte = self.params["text"]["wte"]
        region = self.params["region"]
        before = wte[jnp.asarray([self._encode_text("\n\nPoint:")])]
        after = wte[jnp.asarray([self._encode_text(" gaze\n\n")])]
        xs = jnp.asarray([[[s[0]]] for s in sources], dtype=self.dtype)
        ys = jnp.asarray([[[s[1]]] for s in sources], dtype=self.dtype)
        x_emb = region_ops.encode_coordinate(xs, region)  # (B, 1, D)
        y_emb = region_ops.encode_coordinate(ys, region)
        embeds = jnp.concatenate(
            [
                jnp.broadcast_to(before, (B, *before.shape[1:])),
                x_emb,
                y_emb,
                jnp.broadcast_to(after, (B, *after.shape[1:])),
            ],
            axis=1,
        ).astype(self.dtype)
        length = embeds.shape[1]
        pad = max(_ceil_to(length, PROMPT_PAD), PROMPT_PAD)
        if pad > length:
            embeds = jnp.pad(embeds, ((0, 0), (0, pad - length), (0, 0)))

        pos = encs[0].pos
        bound = self._kv_bound(pos + pad + 4)
        kv = self._load_kv_batched_fn(B, bound)(_concat_enc_kv(encs))
        logits, hidden, kv = self._prefill_batched_fn(bound)(
            self.params["text"], kv, embeds,
            jnp.int32(pos), jnp.int32(length),
            jnp.int32(self.config.text.prefix_attn),
        )
        pos += length
        next_tok = jnp.argmax(logits, -1).astype(jnp.int32)

        # x from the prefill hidden; y from one lockstep decode step on
        # enc(x) — same two ops _generate_points runs for max_objects=1
        x_logits = region_ops.decode_coordinate(hidden, region)
        x = jnp.argmax(x_logits, -1).astype(jnp.float32) / x_logits.shape[-1]
        emb = region_ops.encode_coordinate(
            x[:, None, None].astype(self.dtype), region
        )
        step = self._jit(
            ("decode_b", bound),
            lambda: jax.jit(
                partial(
                    batched_engine.decode_step_batched,
                    config=self.config.text, kv_bound=bound,
                ),
                donate_argnums=(1,),
            ),
        )
        _, hidden_y, kv = step(self.params["text"], kv, emb, jnp.int32(pos))
        y_logits = region_ops.decode_coordinate(hidden_y, region)
        y = jnp.argmax(y_logits, -1).astype(jnp.float32) / y_logits.shape[-1]

        toks, xv, yv = jax.device_get((next_tok, x, y))
        self._recycle_kv(kv, B)
        eos = self.config.tokenizer.eos_id
        # force_detect replaces the sampled token with id 0 BEFORE the eos
        # check, exactly like _detect_gaze / the reference moondream.py:
        # 873-877 (so with eos_id=0 configs it still yields None)
        return [
            {"x": float(xv[b]), "y": float(yv[b])}
            if int(0 if force_detect else toks[b]) != eos
            else None
            for b in range(B)
        ]

    def detect_gaze(
        self,
        image,
        eye: Optional[Tuple[float, float]] = None,
        face: Optional[Dict[str, float]] = None,
        unstable_settings: Dict[str, Any] = {},
    ):
        """Reference moondream.py:884-973."""
        import random as pyrandom

        force_detect = unstable_settings.get("force_detect", False)
        prioritize_accuracy = unstable_settings.get("prioritize_accuracy", False)

        if not prioritize_accuracy:
            if eye is None:
                raise ValueError("eye must be provided when prioritize_accuracy=False")
            enc = self.encode_image(image)
            return {"gaze": self._detect_gaze(enc, eye, force_detect=force_detect)}

        if face is None:
            raise ValueError("face must be provided when prioritize_accuracy=True")
        if isinstance(image, EncodedImage) and "flip_enc_img" not in unstable_settings:
            raise ValueError(
                "image must be a PIL Image when prioritize_accuracy=True, "
                "or flip_enc_img must be provided"
            )

        enc = self.encode_image(image)
        if "flip_enc_img" in unstable_settings:
            enc_flipped = unstable_settings["flip_enc_img"]
        else:
            from PIL import Image as PILImage

            enc_flipped = self.encode_image(
                image.transpose(method=PILImage.Transpose.FLIP_LEFT_RIGHT)
            )

        # Sample all 2N eye sources up front (same RNG order as the
        # reference's two loops, moondream.py:918-957), then run ONE
        # lockstep batch over both encoded images instead of 2N sequential
        # generations.
        N = 10
        sources = [
            (
                pyrandom.uniform(face["x_min"], face["x_max"]),
                pyrandom.uniform(face["y_min"], face["y_max"]),
            )
            for _ in range(N)
        ] + [
            (
                1 - pyrandom.uniform(face["x_min"], face["x_max"]),
                pyrandom.uniform(face["y_min"], face["y_max"]),
            )
            for _ in range(N)
        ]
        rows = self._detect_gaze_batch(
            [enc] * N + [enc_flipped] * N, sources, force_detect=force_detect
        )
        detections = [
            (g["x"], g["y"]) for g in rows[:N] if g is not None
        ] + [
            (1 - g["x"], g["y"]) for g in rows[N:] if g is not None
        ]

        if len(detections) < N:
            return {"gaze": None}

        detections = remove_outlier_points(detections)
        mean_x = sum(d[0] for d in detections) / len(detections)
        mean_y = sum(d[1] for d in detections) / len(detections)
        return {"gaze": {"x": mean_x, "y": mean_y}}
