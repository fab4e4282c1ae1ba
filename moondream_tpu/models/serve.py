"""ContinuousBatchingEngine: host-side scheduler over the slot pool.

New TPU-native serving capability (the reference handles exactly one
request at a time; SURVEY.md §2.5): requests with different images,
prompts, and lengths are admitted whenever a slot frees up, prefilled
independently, and advanced together by fused ragged decode chunks
(engine/serving.py). One host sync per chunk, not per token.

    eng = ContinuousBatchingEngine(model, n_slots=8)
    r1 = eng.submit(image1)                          # caption
    r2 = eng.submit(image2, question="What is it?")  # VQA
    results = eng.drain()                            # {req_id: text}

`slot_len` bounds prompt + generated tokens per request; an encoded image
alone occupies ~740 KV positions, so slot_len must cover image + question
+ expected output. Submissions whose prompt already fills the slot raise
ValueError; token budgets are clamped to the room left in the slot.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..engine import serving
from ..models.text import KVCache
from ..utils.streaming import stream_text

DEFAULT_MAX_TOKENS = 512
# Finished-request history kept in results/token_counts for direct engine
# users (drain() et al). Long-lived consumers that never pop (the HTTP
# frontend pops per request) stay bounded: oldest entries evicted past this.
RESULTS_CAP = 10_000


@dataclass
class _Slot:
    req_id: int = -1
    tokens: List[int] = field(default_factory=list)
    active: bool = False
    on_text: Optional[Any] = None  # callback(req_id, chunk) per text chunk
    streamer: Optional[Any] = None  # TokenStreamer when on_text is set
    structured: Optional[str] = None  # None (text) / "detect" / "point"


@dataclass
class PreparedRequest:
    """An encoded + prefilled request not yet occupying a pool slot.

    Produced by `prepare()`; holds a single-row KV snapshot (a pooled
    max-context buffer) until `admit_prepared()` moves it into a slot or
    `release()` returns it. Lets servers run the expensive part of
    admission (host crops + ViT + prefill, ~0.5 s) WITHOUT blocking the
    pool's decode chunks — only the final slot write needs the pool."""

    kv1: Any
    next_token: Any
    pos: int
    prompt: List[int]
    temperature: float
    top_p: float
    released: bool = False
    # the EncodedImage the request was prefilled from; prefix-shared pools
    # key their shared-prefix registry on its identity (an encode-cache hit
    # hands every same-image request the SAME object)
    enc: Any = None
    # multi-variant serving: index into the engine's stacked adapters
    # (0 = base model — the all-zeros adapter)
    vid: int = 0
    # structured (detect/point) requests carry their state-machine seed
    structured: Optional[str] = None  # "detect" / "point"
    hidden: Any = None  # prefill's last hidden (feeds the first x decode)
    include_size: bool = False
    n_objects: int = 0


class ContinuousBatchingEngine:
    def __init__(
        self,
        model,
        n_slots: int = 8,
        slot_len: int = 1024,
        chunk: int = 8,
        temperature: float = 0.0,
        top_p: float = 0.0,
        pipeline_depth: int = 1,
        speculative: int = 0,
        spec_adaptive: float = 0.0,
        max_objects: int = 50,
        variants: Optional[Dict[str, Any]] = None,
        eos_id: Optional[int] = None,
        prefix_share: bool = False,
        prefix_entries: Optional[int] = None,
    ):
        """`pipeline_depth` > 1 overlaps each chunk's host round trip
        (token fetch + callbacks) with the NEXT chunk's device compute:
        step() dispatches chunk i+1 before fetching chunk i's tokens, so
        the device never idles on the host. Costs one chunk of latency on
        step() results/streaming and up to depth-1 wasted no-op chunks at
        a request's tail; throughput-oriented callers (HTTP server,
        bench) use 2.

        `speculative=k`: each chunk iteration drafts k-1 tokens per slot
        from its own device-resident history, verifies them in one ragged
        span forward, and advances each slot by 1..k tokens. Greedy pools
        (temperature 0): token-identical to the plain chunks
        (engine/serving.py:serve_chunk_spec). Sampled pools: rejection
        against each row's target nucleus distribution — the emitted
        streams are distribution-identical to the plain sampled chunks
        (serve_chunk_spec_sampled). Budgets are
        clamped k tokens earlier so verify spans always fit the slot.
        `spec_adaptive`: when > 0, speculation auto-disables for the rest
        of the engine's life once the measured accept rate (tokens per
        slot-iteration, `spec_accept_rate`) stays below this threshold
        after a warm-up of 8 chunks — a spec iteration costs ~20% more
        than a plain step, so below ~1.2 accepted tokens/iteration the
        plain chunks win. Requests may also pass an EncodedImage to
        submit()/submit_many() to reuse a cached encode.

        `variants`: multi-variant (multi-tenant LoRA) serving — a dict
        mapping variant name -> stacked adapter pytree (the
        `lora.variant_state_dict` layout). Requests pick an adapter via
        `submit(..., variant=name)`; every decode chunk stays ONE fused
        program, each row applying its own adapter's low-rank residual
        (engine/serving._lora_delta). Adapters of different ranks are
        zero-padded to the widest; vid 0 is the base model. Composes
        with runtime-int4 base weights, per-request sampling, AND
        speculative chunks (the ragged span verify applies each row's
        adapter over its whole k-token span)."""
        self.model = model
        self.config = model.config.text
        # eos_id override: benchmark harnesses pass -1 to force
        # fixed-length generation (timing independent of random logits)
        self.eos_id = (
            model.config.tokenizer.eos_id if eos_id is None else eos_id
        )
        self.n_slots = n_slots
        self.slot_len = min(slot_len, self.config.max_context)
        self.chunk = chunk
        self.temperature = temperature
        self.top_p = top_p
        self.pipeline_depth = max(1, int(pipeline_depth))
        self.spec_k = max(0, int(speculative))
        self.spec_adaptive = float(spec_adaptive)
        self._spec_tokens = 0  # emitted tokens through spec chunks
        self._spec_slot_iters = 0  # active-slot x iteration opportunities
        self._spec_chunks = 0
        self._inflight: List[Any] = []

        # prefix-shared image KV: slots hold only the SUFFIX (prompt +
        # generated tokens past the [BOS, image] prefix); distinct images
        # each hold ONE shared read-only prefix entry, so N same-image
        # requests store the ~730-token image KV once and admission skips
        # the 730-slot copy (VERDICT r2 #4; reference n/a — batch-1).
        self.prefix_share = bool(prefix_share)
        self.prefix_len = 0
        if self.prefix_share:
            self.prefix_len = int(self.config.prefix_attn)  # BOS + image
            if self.slot_len <= self.prefix_len:
                raise ValueError(
                    f"slot_len {self.slot_len} must exceed the image "
                    f"prefix ({self.prefix_len}) under prefix_share"
                )
            pad = lambda n: -(-n // 128) * 128
            self._suffix_slots = pad(self.slot_len - self.prefix_len)
            self._prefix_slots = pad(self.prefix_len)
            P = int(prefix_entries) if prefix_entries else n_slots
            self.kv = KVCache.create(
                self.config, batch=n_slots, dtype=model.dtype,
                slots=self._suffix_slots,
            )
            self.kv_pref = KVCache.create(
                self.config, batch=P, dtype=model.dtype,
                slots=self._prefix_slots,
            )
            self.pids = jnp.zeros((n_slots,), jnp.int32)
            self._pref_refs = [0] * P
            self._pref_pid_of: Dict[int, int] = {}  # id(enc) -> pid
            self._pref_enc = [None] * P  # strong refs while refcount > 0
        else:
            self._suffix_slots = self.slot_len
            self.kv = KVCache.create(
                self.config, batch=n_slots, dtype=model.dtype,
                slots=self.slot_len,
            )
            self.kv_pref = None
            self.pids = None
        S = n_slots
        self.cur = jnp.zeros((S,), jnp.int32)
        self.pos = jnp.zeros((S,), jnp.int32)
        self.active = jnp.zeros((S,), jnp.bool_)
        self.budget = jnp.zeros((S,), jnp.int32)
        # per-slot sampling settings (requests may override the pool
        # defaults per submit); greedy rows stay exact in a mixed pool
        self.temp_row = jnp.full((S,), temperature, jnp.float32)
        self.topp_row = jnp.full((S,), top_p, jnp.float32)
        self._sampling_used = temperature > 0  # sticky: routes spec chunks
        # sticky: once any request overrides the pool defaults, chunks take
        # per-row (S,) settings; until then scalars keep the all-greedy
        # fast path (no vocab sort) inside sample_tokens_batched
        self._row_overrides = False
        self.rng = jax.random.PRNGKey(0)

        if self.spec_k:
            self.hist = jnp.zeros((S, self.slot_len), jnp.int32)
            self.hist_cnt = jnp.zeros((S,), jnp.int32)

        # multi-variant LoRA serving: variant-stacked adapter factors
        # (leaves (L, V+1, r, d), index 0 = zero base) + per-slot vids
        self._variants: Dict[str, Any] = dict(variants or {})
        self._loras = None
        self._vid_of: Dict[Optional[str], int] = {None: 0}
        if self._variants:
            from ..lora import stack_variant_pytrees

            names = list(self._variants)
            self._loras = stack_variant_pytrees(
                [self._variants[n] for n in names]
            )
            self._vid_of.update({n: i + 1 for i, n in enumerate(names)})
        self.vid = jnp.zeros((S,), jnp.int32)

        # structured-row (detect/point) state for the mixed pool; tiny,
        # allocated up front so submit_detect/submit_point can mix freely
        self.max_objects = int(max_objects)
        self.mode = jnp.zeros((S,), jnp.int32)  # MODE_TEXT rows
        self.hidS = jnp.zeros((S, self.config.dim), model.dtype)
        self.pending = jnp.zeros((S,), jnp.int32)
        self.xbuf = jnp.zeros((S,), jnp.float32)
        self.ybuf = jnp.zeros((S,), jnp.float32)
        self.sboxes = jnp.zeros((S, self.max_objects, 4), jnp.float32)
        self.nobj = jnp.zeros((S,), jnp.int32)
        self.is_box = jnp.zeros((S,), jnp.bool_)

        self.slots = [_Slot() for _ in range(S)]
        self._slot_pid: List[Optional[int]] = [None] * S
        self.results: Dict[int, str] = {}
        self.token_counts: Dict[int, int] = {}  # per finished request
        self._next_req = 0
        self._jits: Dict[Any, Any] = {}

    # ------------------------------------------------------------- internal
    def _chunk_fn(self):
        key = ("chunk", self.chunk)
        fn = self._jits.get(key)
        if fn is None:
            fn = jax.jit(
                partial(
                    serving.serve_chunk,
                    config=self.config,
                    eos_id=self.eos_id,
                    suppress_ids=(self.model.config.tokenizer.answer_id,),
                    chunk=self.chunk,
                    kv_bound=self._suffix_slots,
                    prefix_len=self.prefix_len,
                ),
                donate_argnums=(1,),
            )
            self._jits[key] = fn
        return fn

    def _spec_chunk_fn(self):
        sampled = self._sampling_used
        key = ("spec_chunk", self.chunk, self.spec_k, sampled)
        fn = self._jits.get(key)
        if fn is None:
            fn = jax.jit(
                partial(
                    serving.serve_chunk_spec_sampled if sampled
                    else serving.serve_chunk_spec,
                    config=self.config,
                    eos_id=self.eos_id,
                    suppress_ids=(self.model.config.tokenizer.answer_id,),
                    n_iter=self.chunk,
                    spec_k=self.spec_k,
                    kv_bound=self._suffix_slots,
                    prefix_len=self.prefix_len,
                ),
                donate_argnums=(1, 6),
            )
            self._jits[key] = fn
        return fn

    def _mixed_chunk_fn(self):
        key = ("mixed_chunk", self.chunk, self.max_objects)
        fn = self._jits.get(key)
        if fn is None:
            fn = jax.jit(
                partial(
                    serving.serve_chunk_mixed,
                    config=self.config,
                    eos_id=self.eos_id,
                    suppress_ids=(self.model.config.tokenizer.answer_id,),
                    chunk=self.chunk,
                    max_objects=self.max_objects,
                    kv_bound=self._suffix_slots,
                    prefix_len=self.prefix_len,
                ),
                donate_argnums=(2,),
            )
            self._jits[key] = fn
        return fn

    def _mixed_spec_chunk_fn(self):
        key = ("mixed_spec_chunk", self.chunk, self.spec_k, self.max_objects)
        fn = self._jits.get(key)
        if fn is None:
            fn = jax.jit(
                partial(
                    serving.serve_chunk_mixed_spec,
                    config=self.config,
                    eos_id=self.eos_id,
                    suppress_ids=(self.model.config.tokenizer.answer_id,),
                    n_iter=self.chunk,
                    spec_k=self.spec_k,
                    max_objects=self.max_objects,
                    kv_bound=self._suffix_slots,
                    prefix_len=self.prefix_len,
                ),
                donate_argnums=(2, 7),
            )
            self._jits[key] = fn
        return fn

    def _write_slot_fn(self, span: int):
        key = ("write", span)
        fn = self._jits.get(key)
        if fn is None:
            fn = jax.jit(serving.write_slot, donate_argnums=(0,))
            self._jits[key] = fn
        return fn

    def free_slots(self) -> List[int]:
        return [i for i, s in enumerate(self.slots) if not s.active]

    # ------------------------------------------------- prefix-shared image KV
    def _acquire_prefix(self, enc) -> int:
        """Return the shared prefix entry holding `enc`'s [BOS, image] KV,
        writing it into a free entry on first sight. Keyed by object
        identity: an encode-cache hit hands every same-image request the
        SAME EncodedImage, so N concurrent requests share one entry (and
        one 730-token write). Raises when every entry is held by an
        active slot."""
        if enc.pos != self.prefix_len:
            raise ValueError(
                f"EncodedImage prefill spans {enc.pos} positions but the "
                f"pool's shared prefix is {self.prefix_len} "
                "(config.text.prefix_attn)"
            )
        key = id(enc)
        pid = self._pref_pid_of.get(key)
        if pid is not None:
            self._pref_refs[pid] += 1
            return pid
        free = [i for i, r in enumerate(self._pref_refs) if r == 0]
        if not free:
            raise RuntimeError(
                f"prefix pool exhausted: all {len(self._pref_refs)} "
                "entries held by active slots; raise prefix_entries "
                "(default n_slots) or drain first"
            )
        pid = free[0]
        old = self._pref_enc[pid]
        if old is not None:
            self._pref_pid_of.pop(id(old), None)
        self.kv_pref = self._write_slot_fn("pref")(
            self.kv_pref, enc.as_cache(), jnp.int32(pid)
        )
        self._pref_pid_of[key] = pid
        self._pref_enc[pid] = enc
        self._pref_refs[pid] = 1
        return pid

    def _release_prefix(self, slot: int) -> None:
        """Drop `slot`'s hold on its shared prefix entry (slot retired or
        cancelled). Entries stay mapped at refcount 0 so an overlapping
        same-image burst can re-hit them; eviction happens lazily in
        _acquire_prefix."""
        pid = self._slot_pid[slot]
        if pid is None:
            return
        self._slot_pid[slot] = None
        self._pref_refs[pid] = max(0, self._pref_refs[pid] - 1)

    # --------------------------------------------------------------- public
    def submit(
        self,
        image,
        question: Optional[str] = None,
        caption_length: str = "normal",
        max_tokens: int = DEFAULT_MAX_TOKENS,
        on_text=None,
        temperature: Optional[float] = None,
        top_p: Optional[float] = None,
        variant: Optional[str] = None,
    ) -> int:
        """Admit one request (caption by default; VQA when `question` is
        given). Blocks stepping the pool only for this request's prefill.
        Raises RuntimeError when no slot is free — call step() first.
        `image` may be an EncodedImage to reuse a cached encode.

        `temperature`/`top_p`: per-request sampling settings (default:
        the pool's); greedy and sampled requests mix in one pool.
        `on_text(req_id, chunk)`: optional per-request streaming callback,
        invoked from step() with word-boundary-safe text chunks as the
        request decodes (same flushing rules as the single-stream API).
        `variant`: name of a LoRA adapter registered at construction —
        this request decodes through that adapter while sharing the pool
        with base and other-variant requests."""
        if not self.free_slots():
            raise RuntimeError("no free slot; step() or drain() first")
        prep = self.prepare(
            image, question=question, caption_length=caption_length,
            temperature=temperature, top_p=top_p, variant=variant,
        )
        return self.admit_prepared(prep, max_tokens=max_tokens, on_text=on_text)

    def prepare(
        self,
        image,
        question: Optional[str] = None,
        caption_length: str = "normal",
        temperature: Optional[float] = None,
        top_p: Optional[float] = None,
        variant: Optional[str] = None,
    ) -> PreparedRequest:
        """Encode + prefill a request WITHOUT touching the pool state, so a
        server thread can run it while another thread keeps step()ping the
        pool (the expensive admission work no longer stalls decoding).
        Concurrent prepare() calls must be serialized among themselves and
        with other model-level use (they share the model's jit + KV pool);
        step() needs no such serialization against prepare(). The returned
        PreparedRequest holds a pooled KV buffer — pass it to
        admit_prepared() or release() it."""
        model = self.model
        tok_cfg = model.config.tokenizer
        temp = self.temperature if temperature is None else temperature
        topp = self.top_p if top_p is None else top_p
        lora, vid = self._resolve_variant(variant)

        # the adapter applies to the [BOS, image] prefill too (reference
        # puts LoRA in every text forward). A pre-encoded EncodedImage
        # carries the variant it was encoded under; encode_image raises if
        # it doesn't match this request's variant.
        enc = model.encode_image(
            image, settings={"variant_tree": lora, "variant_label": variant}
            if lora is not None else None
        )
        kv1 = model.load_encoded_image(enc, slots=self.slot_len)
        if question is None:
            prompt = list(tok_cfg.templates["caption"][caption_length])
        else:
            t = tok_cfg.templates["query"]
            prompt = (
                list(t["prefix"])
                + model._encode_text(question)
                + list(t["suffix"])
            )
        _, _, next_token, pos, kv1 = model._prefill_prompt(
            kv1, prompt, enc.pos, temp, topp, lora=lora
        )
        return PreparedRequest(
            kv1, next_token, pos, prompt, temp, topp, vid=vid, enc=enc
        )

    def _resolve_variant(self, variant: Optional[str]):
        """Map a variant name to (prefill adapter pytree, pool vid)."""
        if variant is None:
            return None, 0
        if variant not in self._variants:
            raise KeyError(
                f"unknown variant {variant!r}; registered: "
                f"{sorted(self._variants)}"
            )
        return self._variants[variant], self._vid_of[variant]

    def admit_prepared(
        self,
        prep: PreparedRequest,
        max_tokens: int = DEFAULT_MAX_TOKENS,
        on_text=None,
    ) -> int:
        """Move a PreparedRequest into a free slot (brief — one slot write).
        Raises RuntimeError when no slot is free; the prep stays valid, so
        the caller can retry after step() frees a slot."""
        free = self.free_slots()
        if not free:
            raise RuntimeError("no free slot; step() or drain() first")
        if prep.released:
            raise ValueError("PreparedRequest was already admitted/released")
        prep.released = True  # _admit consumes (or recycles) the KV buffer
        slot = free[0]
        if prep.structured is not None:
            steps = (3 if prep.include_size else 2) * prep.n_objects + 2
            req_id = self._admit(
                prep.kv1, prep.next_token, prep.pos, slot, steps, None,
                prep.prompt, 0.0, 0.0, vid=prep.vid, enc=prep.enc,
            )
            # flip the slot to a structured row: the mixed chunk's state
            # machine starts at XN with the prefill's hidden + first token
            self.slots[slot].structured = prep.structured
            self.mode = self.mode.at[slot].set(serving.MODE_XN)
            self.hidS = self.hidS.at[slot].set(
                jnp.reshape(prep.hidden, (-1,))[-self.config.dim:]
            )
            self.pending = self.pending.at[slot].set(prep.next_token[()])
            self.nobj = self.nobj.at[slot].set(0)
            self.is_box = self.is_box.at[slot].set(bool(prep.include_size))
            return req_id
        return self._admit(
            prep.kv1, prep.next_token, prep.pos, slot, max_tokens,
            on_text, prep.prompt, prep.temperature, prep.top_p,
            vid=prep.vid, enc=prep.enc,
        )

    def release_prepared(self, prep: PreparedRequest) -> None:
        """Return an unadmitted PreparedRequest's KV buffer to the model's
        pool (e.g. the client gave up waiting for a slot)."""
        if not prep.released:
            prep.released = True
            self.model._recycle_kv(prep.kv1)

    def _admit(
        self, kv1, next_token, pos, slot, max_tokens, on_text=None,
        prompt_tokens=None, temperature=None, top_p=None, vid=0, enc=None,
    ) -> int:
        """Snapshot a prefilled request into `slot`. Rejects prompts that
        don't leave room to generate (the slot holds prompt + generated
        tokens: pos + tokens must fit slot_len); clamps the budget so ragged
        decode never writes past the slot edge."""
        model = self.model
        # spec verify spans write spec_k rows at a time; budgets are
        # clamped so pos + budget + spec_k never passes the slot edge
        # (margin is 0 when speculation is off)
        margin = self.spec_k
        if pos + 1 + margin > self.slot_len:
            model._recycle_kv(kv1)
            raise ValueError(
                f"prompt occupies {pos} KV positions but slot_len is "
                f"{self.slot_len}; no room to generate"
                + (f" (speculative margin {margin})" if margin else "")
                + ". Size slot_len >= prompt length (image is ~730 tokens)"
                " + expected output."
            )
        budget = min(max_tokens, self.slot_len - pos - margin)
        if self.prefix_share:
            if enc is None:
                raise ValueError(
                    "prefix_share pools need the request's EncodedImage at "
                    "admission (PreparedRequest.enc / submit passes it)"
                )
            from .text import slice_cache_span_from

            pid = self._acquire_prefix(enc)
            try:
                # only the prompt SUFFIX is copied per slot; the ~730-token
                # image prefix is the shared entry written above (once per
                # distinct image)
                suf = max(pos - self.prefix_len, 1)
                span = min(-(-suf // 128) * 128, self._suffix_slots)
                snap = slice_cache_span_from(kv1, self.prefix_len, span)
                self.kv = self._write_slot_fn(("suf", span))(
                    self.kv, snap, jnp.int32(slot)
                )
            except Exception:
                self._pref_refs[pid] = max(0, self._pref_refs[pid] - 1)
                model._recycle_kv(kv1)
                raise
            self._slot_pid[slot] = pid
            self.pids = self.pids.at[slot].set(pid)
        else:
            span = model._kv_bound(pos) or self.config.max_context
            span = min(span, self.slot_len)
            from .text import slice_cache_span

            snap = slice_cache_span(kv1, span)
            self.kv = self._write_slot_fn(span)(
                self.kv, snap, jnp.int32(slot)
            )
        model._recycle_kv(kv1)

        req_id = self._next_req
        self._next_req += 1
        streamer = None
        if on_text is not None:
            from ..utils.streaming import TokenStreamer

            streamer = TokenStreamer(self.model._decode_tokens)
        self.slots[slot] = _Slot(
            req_id=req_id, tokens=[], active=True,
            on_text=on_text, streamer=streamer,
        )
        temp = self.temperature if temperature is None else temperature
        topp = self.top_p if top_p is None else top_p
        # text row by default; _submit_structured flips mode after _admit.
        # Without this reset a text request re-using a slot left by a
        # structured one would inherit its device-side mode.
        self.mode = self.mode.at[slot].set(0)
        self.vid = self.vid.at[slot].set(vid)
        self.temp_row = self.temp_row.at[slot].set(temp)
        self.topp_row = self.topp_row.at[slot].set(topp)
        if temp > 0:
            self._sampling_used = True
        if temp != self.temperature or topp != self.top_p:
            self._row_overrides = True
        self.cur = self.cur.at[slot].set(next_token[()])
        self.pos = self.pos.at[slot].set(pos)
        self.active = self.active.at[slot].set(True)
        self.budget = self.budget.at[slot].set(budget)
        if self.spec_k:
            # seed the slot's draft history with the prompt's token tail
            # (prompt-lookup: answers copying entities from the question
            # draft from the prompt's n-grams); drafts never change output
            seed = list(prompt_tokens or [])[-(self.slot_len // 2):]
            row = np.zeros((self.slot_len,), np.int32)
            row[: len(seed)] = seed
            self.hist = self.hist.at[slot].set(jnp.asarray(row))
            self.hist_cnt = self.hist_cnt.at[slot].set(len(seed))
        return req_id

    def submit_many(
        self,
        images,
        question: Optional[str] = None,
        caption_length: str = "normal",
        max_tokens: int = DEFAULT_MAX_TOKENS,
        on_text=None,
        temperature: Optional[float] = None,
        top_p: Optional[float] = None,
        variant: Optional[str] = None,
    ) -> List[int]:
        """Admit a burst of requests with ONE batched image encode
        (`encode_images`) instead of per-request ViT calls. All requests
        share the same prompt kind (and `variant` adapter, if given).
        Requires enough free slots."""
        free = self.free_slots()
        if len(free) < len(images):
            raise RuntimeError(
                f"{len(images)} requests but only {len(free)} free slots"
            )
        model = self.model
        tok_cfg = model.config.tokenizer
        lora, vid = self._resolve_variant(variant)
        encs = model.encode_images(
            list(images),
            settings={"variant_tree": lora, "variant_label": variant}
            if lora is not None else None,
        )
        if question is None:
            prompt = list(tok_cfg.templates["caption"][caption_length])
        else:
            t = tok_cfg.templates["query"]
            prompt = (
                list(t["prefix"])
                + model._encode_text(question)
                + list(t["suffix"])
            )

        temp = self.temperature if temperature is None else temperature
        topp = self.top_p if top_p is None else top_p
        req_ids = []
        for enc, slot in zip(encs, free):
            kv1 = model.load_encoded_image(enc, slots=self.slot_len)
            _, _, next_token, pos, kv1 = model._prefill_prompt(
                kv1, prompt, enc.pos, temp, topp, lora=lora
            )
            req_ids.append(
                self._admit(
                    kv1, next_token, pos, slot, max_tokens, on_text, prompt,
                    temp, topp, vid=vid, enc=enc,
                )
            )
        return req_ids

    def submit_detect(self, image, object: str, max_objects=None,
                      variant: Optional[str] = None) -> int:
        """Admit a detect (bounding boxes) request into the SAME pool as
        text requests: the mixed chunk advances its coordinate state
        machine ragged alongside caption/VQA rows. Result (drain/step) is
        {"objects": [{x_min, y_min, x_max, y_max}, ...]} like
        model.detect."""
        return self._submit_structured(image, object, "detect", True,
                                       max_objects, variant=variant)

    def submit_point(self, image, object: str, max_objects=None,
                     variant: Optional[str] = None) -> int:
        """Admit a point request (mixed pool); result is
        {"points": [{x, y}, ...]} like model.point."""
        return self._submit_structured(image, object, "point", False,
                                       max_objects, variant=variant)

    def submit_gaze(self, image, eye, force_detect: bool = False,
                    variant: Optional[str] = None) -> int:
        """Admit a gaze-detection request into the pool (the reference's
        worst-latency path, moondream.py:884-973): the embedding-space
        prompt prefills once, then the 2-step point decode rides the
        mixed chunks. Result is {"gaze": {"x", "y"} | None} like
        model.detect_gaze."""
        if not self.free_slots():
            raise RuntimeError("no free slot; step() or drain() first")
        prep = self.prepare_gaze(image, eye, force_detect, variant=variant)
        return self.admit_prepared(prep)

    def prepare_gaze(self, image, eye, force_detect: bool = False,
                     variant: Optional[str] = None) -> PreparedRequest:
        model = self.model
        lora, vid = self._resolve_variant(variant)
        enc = model.encode_image(
            image, settings={"variant_tree": lora, "variant_label": variant}
            if lora is not None else None
        )
        kv1 = model.load_encoded_image(enc, slots=self.slot_len)
        hidden, next_token, pos, kv1 = model._gaze_prefill(
            kv1, enc.pos, tuple(eye), lora=lora
        )
        if force_detect:
            next_token = jnp.int32(0)
        return PreparedRequest(
            kv1, next_token, pos, [], 0.0, 0.0,
            structured="gaze", hidden=hidden,
            include_size=False, n_objects=1, vid=vid, enc=enc,
        )

    def _submit_structured(self, image, object, template_key, include_size,
                           max_objects, variant=None) -> int:
        if not self.free_slots():
            raise RuntimeError("no free slot; step() or drain() first")
        prep = self.prepare_structured(
            image, object, template_key, include_size, max_objects,
            variant=variant,
        )
        return self.admit_prepared(prep)

    def prepare_structured(self, image, object: str, template_key: str,
                           include_size: bool,
                           max_objects=None,
                           variant: Optional[str] = None) -> PreparedRequest:
        """Encode + prefill a detect/point request without touching the
        pool (the structured analog of prepare(); same serialization
        contract). Composes with speculative serving: greedy pools run
        struct rows inside the span-verify chunks (serve_chunk_mixed_spec)."""
        n_obj = self.max_objects if max_objects is None else int(max_objects)
        if n_obj > self.max_objects:
            raise ValueError(
                f"max_objects={n_obj} exceeds the pool's max_objects="
                f"{self.max_objects} (set at engine construction)"
            )
        model = self.model
        templates = model.config.tokenizer.templates[template_key]
        if templates is None:
            raise NotImplementedError(
                f"Model does not support {template_key}."
            )
        lora, vid = self._resolve_variant(variant)
        enc = model.encode_image(
            image, settings={"variant_tree": lora, "variant_label": variant}
            if lora is not None else None
        )
        kv1 = model.load_encoded_image(enc, slots=self.slot_len)
        prompt = (
            list(templates["prefix"])
            + model._encode_text(" " + object)
            + list(templates["suffix"])
        )
        _, hidden, next_token, pos, kv1 = model._prefill_prompt(
            kv1, prompt, enc.pos, temperature=0.0, top_p=0.0, lora=lora
        )
        return PreparedRequest(
            kv1, next_token, pos, prompt, 0.0, 0.0,
            structured=template_key, hidden=hidden,
            include_size=include_size, n_objects=n_obj, vid=vid, enc=enc,
        )

    def step(self) -> List[int]:
        """Advance all active slots by one chunk. Returns req_ids finished
        in this step (with pipeline_depth > 1, results lag one chunk)."""
        have_active = any(s.active for s in self.slots)
        if have_active:
            self._dispatch_chunk()
        if self._inflight and (
            len(self._inflight) >= self.pipeline_depth or not have_active
        ):
            return self._process_oldest()
        return []

    def _dispatch_chunk(self):
        """Enqueue one fused ragged-decode chunk on the current device
        state (async dispatch — no host sync) and start the token fetch."""
        if self._row_overrides:
            t_arg, p_arg = self.temp_row, self.topp_row
        else:
            t_arg = jnp.float32(self.temperature)
            p_arg = jnp.float32(self.top_p)
        use_mixed = any(s.active and s.structured for s in self.slots)
        lora_kw = (
            {"loras": self._loras, "vids": self.vid}
            if self._loras is not None else {}
        )
        if self.prefix_share:
            lora_kw = {**lora_kw, "pref": self.kv_pref, "pids": self.pids}
        # speculative x structured composition: greedy pools mix spec text
        # rows and structured rows in ONE span-verify chunk; a sampled pool
        # with structured rows falls back to the plain mixed chunk (spec
        # rejection-sampling and the coordinate state machine aren't
        # composed — text rows just lose drafting for those chunks)
        use_mixed_spec = use_mixed and self.spec_k and not self._sampling_used
        was_spec = bool(self.spec_k) and (not use_mixed or use_mixed_spec)
        if use_mixed_spec:
            res = self._mixed_spec_chunk_fn()(
                self.model.params["text"], self.model.params["region"],
                self.kv, self.cur, self.pos, self.active, self.budget,
                self.hist, self.hist_cnt, self.mode, self.hidS,
                self.pending, self.xbuf, self.ybuf, self.sboxes, self.nobj,
                self.is_box, **lora_kw,
            )
            self.hist, self.hist_cnt = res.hist, res.hist_cnt
            self.mode, self.hidS, self.pending = res.mode, res.hid, res.pending
            self.xbuf, self.ybuf = res.xbuf, res.ybuf
            self.sboxes, self.nobj = res.boxes, res.nobj
        elif use_mixed:
            res = self._mixed_chunk_fn()(
                self.model.params["text"], self.model.params["region"],
                self.kv, self.cur, self.pos, self.active, self.budget,
                self.rng, t_arg, p_arg, self.mode, self.hidS, self.pending,
                self.xbuf, self.ybuf, self.sboxes, self.nobj, self.is_box,
                **lora_kw,
            )
            self.rng = res.rng
            self.mode, self.hidS, self.pending = res.mode, res.hid, res.pending
            self.xbuf, self.ybuf = res.xbuf, res.ybuf
            self.sboxes, self.nobj = res.boxes, res.nobj
        elif self.spec_k and self._sampling_used:
            res = self._spec_chunk_fn()(
                self.model.params["text"], self.kv, self.cur, self.pos,
                self.active, self.budget, self.hist, self.hist_cnt,
                self.rng, t_arg, p_arg, **lora_kw,
            )
            self.hist, self.hist_cnt, self.rng = res.hist, res.hist_cnt, res.rng
        elif self.spec_k:
            res = self._spec_chunk_fn()(
                self.model.params["text"], self.kv, self.cur, self.pos,
                self.active, self.budget, self.hist, self.hist_cnt,
                **lora_kw,
            )
            self.hist, self.hist_cnt = res.hist, res.hist_cnt
        else:
            res = self._chunk_fn()(
                self.model.params["text"], self.kv, self.cur, self.pos,
                self.active, self.budget, self.rng, t_arg, p_arg,
                **lora_kw,
            )
            self.rng = res.rng
        self.kv = res.kv
        self.cur, self.pos = res.cur, res.pos
        self.active, self.budget = res.active, res.budget
        try:  # start the D2H copy now so the later device_get doesn't wait
            fetch = [res.tokens, res.emitted, res.active]
            if use_mixed:
                fetch += [res.boxes, res.nobj]
            for x in fetch:
                x.copy_to_host_async()
        except Exception:
            pass
        # record who owned each row at dispatch time: a cancel + resubmit
        # while this chunk is in flight reassigns the slot to a new req_id,
        # whose tokens must not be credited with the old rows
        owners = {
            i: s.req_id for i, s in enumerate(self.slots) if s.active
        }
        self._inflight.append((res, owners, was_spec))

    @property
    def spec_accept_rate(self) -> Optional[float]:
        """Mean accepted tokens per active-slot iteration through the
        speculative chunks (~1.0 = no draft ever accepted; spec_k = every
        draft accepted; can dip below 1.0 because opportunities count full
        chunks even when a request finishes mid-chunk). None before any
        spec chunk completes."""
        if not self._spec_slot_iters:
            return None
        return self._spec_tokens / self._spec_slot_iters

    def _process_oldest(self) -> List[int]:
        res, owners, was_spec = self._inflight.pop(0)
        # ONE host transfer for the whole chunk (separate np.asarray calls
        # would each pay the tunnel's round-trip jitter)
        is_mixed = hasattr(res, "nobj")
        if is_mixed:
            toks, emitted_mask, still_active, boxes_h, nobj_h = (
                jax.device_get(
                    (res.tokens, res.emitted, res.active, res.boxes, res.nobj)
                )
            )
        else:
            toks, emitted_mask, still_active = jax.device_get(
                (res.tokens, res.emitted, res.active)
            )

        if was_spec and owners:
            self._spec_tokens += int(emitted_mask.sum())
            # upper-bounds the opportunities: rows counted active for the
            # full chunk even if they finish mid-chunk
            self._spec_slot_iters += len(owners) * self.chunk
            self._spec_chunks += 1
            if (
                self.spec_adaptive
                and self.spec_k
                and self._spec_chunks >= 8
                and self.spec_accept_rate < self.spec_adaptive
            ):
                self.spec_k = 0  # plain chunks from here on

        finished = []
        for i, slot in enumerate(self.slots):
            if not slot.active or owners.get(i) != slot.req_id:
                continue
            emitted = [int(t) for t, e in zip(toks[i], emitted_mask[i]) if e]
            slot.tokens.extend(emitted)
            if slot.on_text is not None:
                for t in emitted:
                    chunk = slot.streamer.feed(t)
                    if chunk:
                        slot.on_text(slot.req_id, chunk)
            if not still_active[i]:
                slot.active = False
                self._release_prefix(i)
                if slot.on_text is not None:
                    tail = slot.streamer.finish()
                    if tail:
                        slot.on_text(slot.req_id, tail)
                if slot.structured is not None and is_mixed:
                    self.results[slot.req_id] = self._format_structured(
                        slot.structured, boxes_h[i][: int(nobj_h[i])]
                    )
                    self.token_counts[slot.req_id] = 0
                else:
                    self.results[slot.req_id] = "".join(
                        stream_text(slot.tokens, self.model._decode_tokens)
                    )
                    self.token_counts[slot.req_id] = len(slot.tokens)
                finished.append(slot.req_id)
        self._trim_history()
        return finished

    @staticmethod
    def _format_structured(kind: str, rows) -> dict:
        if kind == "detect":
            return {
                "objects": [
                    {
                        "x_min": float(b[0]), "y_min": float(b[1]),
                        "x_max": float(b[2]), "y_max": float(b[3]),
                    }
                    for b in rows
                ]
            }
        if kind == "gaze":
            if len(rows) == 0:
                return {"gaze": None}
            return {"gaze": {"x": float(rows[0][0]), "y": float(rows[0][1])}}
        return {
            "points": [{"x": float(b[0]), "y": float(b[1])} for b in rows]
        }

    def _trim_history(self) -> None:
        while len(self.results) > RESULTS_CAP:
            self.results.pop(next(iter(self.results)))
        while len(self.token_counts) > RESULTS_CAP:
            self.token_counts.pop(next(iter(self.token_counts)))

    def cancel(self, req_id: int) -> bool:
        """Cancel an in-flight request: frees its slot immediately and
        records the text decoded so far as its result. Returns False when
        the request is not active (already finished or unknown)."""
        for i, slot in enumerate(self.slots):
            if slot.active and slot.req_id == req_id:
                slot.active = False
                self._release_prefix(i)
                self.active = self.active.at[i].set(False)
                if slot.on_text is not None:
                    tail = slot.streamer.finish()
                    if tail:
                        slot.on_text(slot.req_id, tail)
                if slot.structured is not None:
                    # objects found before the cancel
                    self.results[req_id] = self._format_structured(
                        slot.structured,
                        np.asarray(self.sboxes[i])[
                            : int(jax.device_get(self.nobj[i]))
                        ],
                    )
                    self.token_counts[req_id] = 0
                    self._trim_history()
                    return True
                self.results[req_id] = "".join(
                    stream_text(slot.tokens, self.model._decode_tokens)
                )
                self.token_counts[req_id] = len(slot.tokens)
                self._trim_history()
                return True
        return False

    def drain(self) -> Dict[int, str]:
        """Step until every admitted request completes; returns all
        results accumulated so far."""
        while any(s.active for s in self.slots) or self._inflight:
            self.step()
        return dict(self.results)
