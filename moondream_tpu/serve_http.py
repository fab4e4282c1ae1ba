"""Dependency-free HTTP serving front-end over ContinuousBatchingEngine.

`python -m moondream_tpu.serve_http --model model.safetensors --port 8080`

Endpoints (JSON in, JSON out; images as base64 in the request body):

  POST /v1/caption   {"image_b64": ..., "length": "normal", "max_tokens": N}
  POST /v1/query     {"image_b64": ..., "question": ..., "max_tokens": N}
    both accept "temperature"/"top_p" (per-request sampling) and
    "stream": true (server-sent events: data: {"chunk": ...} ... [DONE])
  POST /v1/detect    {"image_b64": ..., "object": ...}
  POST /v1/point     {"image_b64": ..., "object": ...}
  POST /v1/gaze      {"image_b64": ..., "eye": {"x": ..., "y": ...}}
  POST /v1/chat/completions   OpenAI-compatible chat endpoint (content
    parts of type text + image_url with data: URIs; "stream": true sends
    OpenAI-style chat.completion.chunk SSE events)
  GET  /healthz      liveness + slot occupancy
  GET  /metrics      request counters, latency percentiles, token rates

Text requests stream through the continuous-batching engine: a background
loop steps the slot pool whenever any request is active, so concurrent
requests decode in ONE fused ragged step per chunk instead of queueing
(the reference has no server at all — its demos are gradio UIs;
/root/reference/recipes/*/app.py). detect/point run on the lockstep
batched path when multiple arrive inside a small batching window.

Built on stdlib http.server (ThreadingHTTPServer) — deliberately zero
web-framework dependencies so it runs anywhere the library does.
"""

from __future__ import annotations

import argparse
import base64
import hashlib
import io
import json
import threading
import time
from collections import OrderedDict
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Dict, Optional


class _Metrics:
    """Cheap cumulative serving metrics: per-endpoint request/error
    counts, a bounded reservoir of recent latencies for percentiles, and
    generated-token totals for aggregate throughput."""

    RESERVOIR = 512

    def __init__(self):
        self._lock = threading.Lock()
        self.started = time.monotonic()
        self.requests: Dict[str, int] = {}
        self.errors: Dict[str, int] = {}
        self.latencies: Dict[str, list] = {}
        self.tokens_out = 0

    def observe(self, endpoint: str, seconds: float, ok: bool,
                tokens: int = 0):
        with self._lock:
            self.requests[endpoint] = self.requests.get(endpoint, 0) + 1
            if not ok:
                self.errors[endpoint] = self.errors.get(endpoint, 0) + 1
            buf = self.latencies.setdefault(endpoint, [])
            buf.append(seconds)
            if len(buf) > self.RESERVOIR:
                del buf[: len(buf) - self.RESERVOIR]
            self.tokens_out += tokens

    def snapshot(self) -> Dict[str, Any]:
        with self._lock:
            up = time.monotonic() - self.started
            out: Dict[str, Any] = {
                "uptime_s": round(up, 1),
                "requests": dict(self.requests),
                "errors": dict(self.errors),
                "generated_tokens": self.tokens_out,
                "tokens_per_sec_lifetime": round(self.tokens_out / up, 2)
                if up > 0 else 0.0,
                "latency_ms": {},
            }
            for ep, buf in self.latencies.items():
                if not buf:
                    continue
                s = sorted(buf)
                out["latency_ms"][ep] = {
                    "p50": round(1000 * s[len(s) // 2], 1),
                    "p95": round(1000 * s[min(len(s) - 1,
                                              int(len(s) * 0.95))], 1),
                    "max": round(1000 * s[-1], 1),
                    "n": len(s),
                }
            return out


class _StructuredBatcher:
    """Coalesces concurrent detect/point requests for the SAME object
    string into one lockstep batched decode (`detect_batch`/`point_batch`
    — one fused device program for the whole group instead of N serial
    single-image passes). Requests wait `window_s` for peers to arrive;
    the first waiter whose item is still pending becomes the group leader
    and executes the batch. Different objects (or kinds) never mix —
    the batched path requires a shared prompt. With trained checkpoints
    the batched path reproduces the single path exactly (peaked-decoder
    parity, tests/test_batched.py:86); only random weights see argmax
    tie flips from batched reduction order."""

    def __init__(self, run_batch, window_s: float = 0.02,
                 max_batch: int = 8):
        self._run = run_batch  # fn(kind, [images], obj) -> [results]
        self.window_s = window_s
        self.max_batch = max_batch
        self._lock = threading.Lock()
        self._pending: list = []
        self.coalesced = 0  # requests served via a >1-image batch

    def request(self, kind: str, image, obj: str,
                timeout_s: float = 600.0) -> Any:
        item = {
            "kind": kind, "obj": obj, "image": image,
            "ev": threading.Event(), "result": None, "error": None,
        }
        with self._lock:
            self._pending.append(item)
        if self.window_s > 0:
            time.sleep(self.window_s)
        batch = []
        with self._lock:
            if any(i is item for i in self._pending):
                # still unserved: lead a group of everything compatible
                batch = [
                    i for i in self._pending
                    if i["kind"] == kind and i["obj"] == obj
                ][: self.max_batch]
                taken = set(map(id, batch))
                self._pending = [
                    i for i in self._pending if id(i) not in taken
                ]
        if batch:
            try:
                results = self._run(kind, [i["image"] for i in batch], obj)
                for i, r in zip(batch, results):
                    i["result"] = r
            except Exception as e:
                for i in batch:
                    i["error"] = e
            if len(batch) > 1:
                with self._lock:
                    self.coalesced += len(batch)
            for i in batch:
                i["ev"].set()
        if not item["ev"].wait(timeout=timeout_s):
            raise TimeoutError("structured request timed out")
        if item["error"] is not None:
            raise item["error"]
        return item["result"]


def _parse_bool(v) -> bool:
    """JSON bool or its common string forms ("true"/"false"); clients that
    serialize booleans as strings must not silently enable streaming."""
    if isinstance(v, str):
        return v.strip().lower() in ("1", "true", "yes", "on")
    return bool(v)


def _parse_chat(payload: Dict[str, Any]):
    """OpenAI chat-completions request -> (PIL image | None, content key
    | None, question text). The last user message's content parts are
    used: text parts concatenate into the question; the first image_url
    part (data: URI) becomes the image. Remote http(s) image URLs are
    rejected (the server does not fetch)."""
    from PIL import Image

    msgs = payload.get("messages")
    if not isinstance(msgs, list) or not msgs:
        raise ValueError("missing 'messages'")

    def parts_of(m):
        content = m.get("content")
        if isinstance(content, str):
            return [{"type": "text", "text": content}]
        return [p for p in (content or []) if isinstance(p, dict)]

    users = [m for m in msgs if isinstance(m, dict) and m.get("role") == "user"]
    if not users:
        raise ValueError("no user message")

    # question: the LAST user message's text. image: the most recent
    # image_url in ANY user message — a multi-turn follow-up ("what
    # color is it?") must keep answering about the image sent earlier,
    # not silently fall to the no-image path.
    texts = [
        p.get("text", "") for p in parts_of(users[-1])
        if p.get("type") == "text"
    ]
    question = " ".join(t for t in texts if t).strip()
    if not question:
        raise ValueError("no text content in user message")

    image, key = None, None
    for m in reversed(users):
        for part in reversed(parts_of(m)):
            if part.get("type") == "image_url":
                url = (part.get("image_url") or {}).get("url", "")
                if not url.startswith("data:"):
                    raise ValueError(
                        "only data: image URLs are supported (no egress)"
                    )
                b64 = url.split(",", 1)[1] if "," in url else ""
                image, key = _image_from_bytes(base64.b64decode(b64))
                break
        if image is not None:
            break
    return image, key, question


def _image_from_bytes(raw: bytes):
    """bytes -> (PIL image, content key); the key addresses the server's
    optional EncodedImage cache. Undecodable bytes are a client error."""
    from PIL import Image

    key = hashlib.sha256(raw).hexdigest()
    try:
        return Image.open(io.BytesIO(raw)).convert("RGB"), key
    except Exception as e:
        raise ValueError(f"could not decode image: {e}") from e


def _decode_image(payload: Dict[str, Any]):
    if "image_b64" not in payload:
        raise ValueError("missing 'image_b64'")
    return _image_from_bytes(base64.b64decode(payload["image_b64"]))


class ServingFrontend:
    """Bridges synchronous HTTP handlers to the continuous-batching engine.

    Text requests (caption/query) are admitted into the engine from any
    handler thread; one background stepper thread advances the pool while
    anything is active. Handlers wait on a per-request event. Structured
    requests (detect/point) are serialized through a lock onto the
    batched/single model paths (they own the model's jit cache briefly but
    do not block the text pool's stepper)."""

    def __init__(self, model, n_slots: int = 8, slot_len: int = 1024,
                 chunk: int = 8, temperature: float = 0.0, top_p: float = 0.0,
                 speculative: int = 0, spec_adaptive: float = 0.0,
                 struct_window_s: float = 0.02, encode_cache: int = 0,
                 encode_window_s: float = 0.0, mesh=None,
                 struct_pool: bool = False, variants=None,
                 prefix_share: bool = False):
        from .models.serve import ContinuousBatchingEngine

        if prefix_share and mesh is not None:
            raise ValueError(
                "prefix_share is single-chip for now (the sharded serving "
                "engine does not shard the prefix pool yet)"
            )
        engine_kw = dict(
            n_slots=n_slots, slot_len=slot_len, chunk=chunk,
            temperature=temperature, top_p=top_p, speculative=speculative,
            spec_adaptive=spec_adaptive,
            # overlap each chunk's host round trip with the next chunk's
            # device compute; costs one chunk of streaming latency
            pipeline_depth=2,
            # multi-tenant LoRA: {name: stacked adapter pytree}; requests
            # pick one with {"variant": name} and decode through it in
            # the same fused pool chunks as base rows
            variants=variants,
        )
        if mesh is not None:
            # multi-chip serving: decode chunks run SPMD over the mesh
            # (slots on dp, KV heads on tp, Megatron text params)
            from .parallel.serving import make_sharded_serving_engine

            self.engine = make_sharded_serving_engine(
                model, mesh, shard_vision=True, **engine_kw
            )
            model = self.engine.model  # the sharded-params twin
        else:
            self.engine = ContinuousBatchingEngine(
                model, prefix_share=prefix_share, **engine_kw
            )
        self.model = model
        # detect/point through the continuous pool (mixed chunks) instead
        # of the single-path + same-object coalescer: heterogeneous
        # objects and text requests advance together in one fused step
        # composes with speculative serving: greedy pools run structured
        # rows inside the span-verify chunks (serve_chunk_mixed_spec)
        self.struct_pool = bool(struct_pool)
        self._lock = threading.Lock()  # pool state: step / admit / results
        # model-level work (encode+prefill of admissions, detect/point):
        # serialized among themselves but NOT against the pool stepper —
        # a request being encoded no longer stalls everyone else's decode
        self._model_lock = threading.Lock()
        self._done: Dict[int, threading.Event] = {}
        self.metrics = _Metrics()
        # concurrent same-object detect/point share one batched decode;
        # struct_window_s=0 disables coalescing (pure single-image paths)
        self._batcher = _StructuredBatcher(
            self._run_structured, window_s=struct_window_s
        )
        # content-addressed EncodedImage LRU: repeat images (video frames,
        # retried requests) skip host crops + ViT + image prefill entirely.
        # Each entry pins a [BOS, image]-prefill KV snapshot in device
        # memory (~150 MB at 2B bf16), so the default is OFF; size it to
        # the working set when enabling (--encode-cache N).
        self.encode_cache = int(encode_cache)
        self._enc_cache: "OrderedDict[str, Any]" = OrderedDict()
        self._cache_lock = threading.Lock()
        self.encode_cache_hits = 0
        # batched admissions (opt-in): concurrent text/structured arrivals
        # within the window share ONE encode_images ViT pass. Off by
        # default because the batched ViT is allclose-but-not-bit-identical
        # to the single path (reduction order), so near-tie greedy tokens
        # can differ from a lone request's (tests/test_batched.py:29-46)
        self.encode_window_s = float(encode_window_s)
        self._enc_batcher = _StructuredBatcher(
            self._run_encode, window_s=self.encode_window_s
        ) if self.encode_window_s > 0 else None
        self._wake = threading.Event()
        # admission backpressure: each request between prepare() and
        # admit_prepared() pins a full single-row KV buffer on device
        # (~400MB at 2B), so at most 2 may be in that window; further
        # arrivals block here holding NO device memory
        self._admission_sem = threading.BoundedSemaphore(2)
        self._slot_freed = threading.Event()  # stepper signals admitters
        self._stop = False
        self._stepper = threading.Thread(target=self._step_loop, daemon=True)
        self._stepper.start()

    def _cache_get(self, key: Optional[str]):
        if not self.encode_cache or key is None:
            return None
        with self._cache_lock:
            enc = self._enc_cache.get(key)
            if enc is not None:
                self._enc_cache.move_to_end(key)
                self.encode_cache_hits += 1
            return enc

    def _cache_put(self, key: Optional[str], enc) -> None:
        if not self.encode_cache or key is None:
            return
        with self._cache_lock:
            self._enc_cache[key] = enc
            while len(self._enc_cache) > self.encode_cache:
                self._enc_cache.popitem(last=False)

    def _run_encode(self, kind, images, obj):
        with self._model_lock:
            return self.engine.model.encode_images(list(images))

    def _resolve_image(self, image, key: Optional[str],
                       variant: Optional[str] = None):
        """Get an EncodedImage for `image`: content cache first, then the
        (optional) shared-window batched encode, else a single encode.
        When neither cache nor batching is configured and no key is known,
        the raw image passes through (the downstream path encodes it).

        `variant`: an adapter applies to the image prefill too, so the
        encode cache keys by (variant, content) — a base-weights snapshot
        must never serve a variant row (or vice versa). Variant encodes
        skip the shared-window batcher (one settings per batched encode)."""
        from .models.moondream import EncodedImage

        if isinstance(image, EncodedImage):
            return image
        if variant is not None and key is not None:
            key = f"{variant}\x00{key}"
        enc = self._cache_get(key)
        if enc is not None:
            return enc
        if self._enc_batcher is not None and variant is None:
            enc = self._enc_batcher.request("encode", image, "")
        elif self.encode_cache and key is not None:
            with self._model_lock:
                if variant is None:
                    enc = self.engine.model.encode_image(image)
                else:
                    lora, _ = self.engine._resolve_variant(variant)
                    enc = self.engine.model.encode_image(
                        image,
                        settings={"variant_tree": lora,
                                  "variant_label": variant},
                    )
        else:
            return image
        self._cache_put(key, enc)
        return enc

    # ----------------------------------------------------------- text pool
    def _step_loop(self):
        while not self._stop:
            self._wake.wait(timeout=0.2)
            with self._lock:
                active = (any(s.active for s in self.engine.slots)
                          or bool(self.engine._inflight))
                finished = self.engine.step() if active else []
                if not (any(s.active for s in self.engine.slots)
                        or self.engine._inflight):
                    self._wake.clear()
            if finished:
                self._slot_freed.set()
            for rid in finished:
                ev = self._done.pop(rid, None)
                if ev:
                    ev.set()

    def text_request(self, image, question: Optional[str], length: str,
                     max_tokens: int, timeout_s: float = 300.0,
                     temperature: Optional[float] = None,
                     top_p: Optional[float] = None,
                     image_key: Optional[str] = None,
                     variant: Optional[str] = None) -> str:
        endpoint = "caption" if question is None else "query"
        t0 = time.monotonic()
        try:
            out, n_tokens = self._text_request(
                image, question, length, max_tokens, timeout_s,
                temperature, top_p, image_key, variant,
            )
        except Exception:
            self.metrics.observe(endpoint, time.monotonic() - t0, ok=False)
            raise
        self.metrics.observe(
            endpoint, time.monotonic() - t0, ok=True, tokens=n_tokens
        )
        return out

    def _wait_and_admit(self, prep, deadline, ev, max_tokens, on_text):
        """Spin (stepper-signaled) for a free slot, then admit. Raises
        TimeoutError past the deadline, releasing the prepared buffer."""
        while True:
            with self._lock:
                if self.engine.free_slots():
                    rid = self.engine.admit_prepared(
                        prep, max_tokens=max_tokens, on_text=on_text
                    )
                    self._done[rid] = ev
                    self._wake.set()
                    return rid
                self._slot_freed.clear()
            if time.monotonic() > deadline:
                self.engine.release_prepared(prep)
                raise TimeoutError("no free slot before timeout")
            # woken by the stepper when a request finishes (50ms
            # fallback covers cancel-freed slots)
            self._slot_freed.wait(timeout=0.05)

    def _prepare_and_admit(self, image, question, length, max_tokens,
                           deadline, ev, temperature, top_p, on_text=None,
                           image_key=None, structured=None, obj=None,
                           variant=None):
        """Shared admission: encode+prefill outside the pool lock (the
        stepper keeps advancing everyone else's decode), then spin briefly
        for a free slot. Returns the req_id; raises TimeoutError past the
        deadline (releasing the prepared KV buffer). With `structured`
        ("detect"/"point") the request becomes a pooled coordinate-decode
        row for `obj` instead of a text row."""
        if not self._admission_sem.acquire(
            timeout=max(0.0, deadline - time.monotonic())
        ):
            raise TimeoutError("admission queue full before timeout")
        try:
            image = self._resolve_image(image, image_key, variant=variant)
            with self._model_lock:
                if structured == "gaze":
                    # obj carries the (x, y) eye source for gaze rows
                    prep = self.engine.prepare_gaze(image, obj,
                                                    variant=variant)
                elif structured is not None:
                    prep = self.engine.prepare_structured(
                        image, obj, structured, structured == "detect",
                        variant=variant,
                    )
                else:
                    prep = self.engine.prepare(
                        image, question=question, caption_length=length,
                        temperature=temperature, top_p=top_p,
                        variant=variant,
                    )
            return self._wait_and_admit(prep, deadline, ev, max_tokens,
                                        on_text)
        finally:
            self._admission_sem.release()

    def _pop_result(self, rid):
        """Fetch + forget a finished request (the engine's results dict
        must not grow for the lifetime of a long-running server)."""
        with self._lock:
            out = self.engine.results.pop(rid, "")
            return out, self.engine.token_counts.pop(rid, 0)

    def _abandon(self, rid):
        with self._lock:
            self.engine.cancel(rid)
            self.engine.results.pop(rid, None)
            self.engine.token_counts.pop(rid, None)
        self._done.pop(rid, None)

    def _text_request(self, image, question, length, max_tokens, timeout_s,
                      temperature, top_p, image_key=None, variant=None):
        ev = threading.Event()
        deadline = time.monotonic() + timeout_s
        rid = self._prepare_and_admit(
            image, question, length, max_tokens, deadline, ev,
            temperature, top_p, image_key=image_key, variant=variant,
        )
        if not ev.wait(timeout=max(0.0, deadline - time.monotonic())):
            self._abandon(rid)
            raise TimeoutError("generation timed out (partial discarded)")
        return self._pop_result(rid)

    def text_request_stream(self, image, question: Optional[str],
                            length: str, max_tokens: int,
                            timeout_s: float = 300.0,
                            temperature: Optional[float] = None,
                            top_p: Optional[float] = None,
                            image_key: Optional[str] = None,
                            endpoint: Optional[str] = None,
                            variant: Optional[str] = None):
        """Generator of word-boundary-safe text chunks for one request
        (the engine's per-request on_text callback bridged through a
        queue). Concatenated chunks equal the non-streaming result.
        Closing the generator early (client disconnect) cancels the
        request and frees its slot."""
        import queue as _queue

        if endpoint is None:
            endpoint = ("caption" if question is None else "query") + "_stream"
        t0 = time.monotonic()
        deadline = t0 + timeout_s
        ev = threading.Event()
        q: _queue.Queue = _queue.Queue()
        try:
            rid = self._prepare_and_admit(
                image, question, length, max_tokens, deadline, ev,
                temperature, top_p,
                on_text=lambda _rid, chunk: q.put(chunk),
                image_key=image_key, variant=variant,
            )
        except Exception:
            self.metrics.observe(endpoint, time.monotonic() - t0, ok=False)
            raise
        try:
            # chunks are enqueued inside step() BEFORE the stepper sets
            # ev, so "ev set and queue empty" can't drop a tail chunk
            while not (ev.is_set() and q.empty()):
                try:
                    yield q.get(timeout=0.05)
                except _queue.Empty:
                    if time.monotonic() > deadline:
                        self._abandon(rid)
                        self.metrics.observe(
                            endpoint, time.monotonic() - t0, ok=False
                        )
                        raise TimeoutError(
                            "generation timed out (partial discarded)"
                        )
            _, n_tokens = self._pop_result(rid)
            self.metrics.observe(
                endpoint, time.monotonic() - t0, ok=True, tokens=n_tokens
            )
        except GeneratorExit:
            # consumer went away mid-stream: free the slot immediately
            self._abandon(rid)
            self.metrics.observe(endpoint, time.monotonic() - t0, ok=False)
            raise

    def chat_request(self, image, question, max_tokens, temperature, top_p,
                     image_key=None):
        """OpenAI-compatible completion: returns (text, completion_tokens).
        Image requests ride the continuous-batching pool; text-only
        requests run the model's no-image query path."""
        t0 = time.monotonic()
        try:
            if image is not None:
                out, n = self._text_request(
                    image, question, "normal", max_tokens, 300.0,
                    temperature, top_p, image_key,
                )
            else:
                settings = {
                    "max_tokens": max_tokens,
                    "temperature": 0.0 if temperature is None else temperature,
                    "top_p": 0.0 if top_p is None else top_p,
                }
                with self._model_lock:
                    out = self.model.query(
                        image=None, question=question, settings=settings
                    )["answer"]
                # no pool bookkeeping on this path: re-encoding the
                # answer gives the completion token count for usage
                n = len(self.model._encode_text(out)) if out else 0
        except Exception:
            self.metrics.observe("chat", time.monotonic() - t0, ok=False)
            raise
        self.metrics.observe(
            "chat", time.monotonic() - t0, ok=True, tokens=n
        )
        return out, n

    def query_direct(self, image, question, max_tokens, temperature, top_p,
                     reasoning=False, spatial_refs=None, image_key=None):
        """Reasoning / spatial-ref queries run the model's own fused
        loops under the model lock (single-stream): these paths
        interleave coordinate decoding with text generation and don't
        fit the ragged text pool. Returns the library's full dict
        ({"answer", optional "reasoning" with grounding})."""
        t0 = time.monotonic()
        ep = "query_reasoning" if reasoning else "query_spatial"
        try:
            if image is not None:
                image = self._resolve_image(image, image_key)
            settings = {
                "max_tokens": max_tokens,
                "temperature": 0.0 if temperature is None else temperature,
                "top_p": 0.0 if top_p is None else top_p,
            }
            with self._model_lock:
                out = self.model.query(
                    image=image, question=question, reasoning=reasoning,
                    spatial_refs=spatial_refs, settings=settings,
                )
        except Exception:
            self.metrics.observe(ep, time.monotonic() - t0, ok=False)
            raise
        self.metrics.observe(ep, time.monotonic() - t0, ok=True)
        return out

    # ----------------------------------------------------- structured path
    def _run_structured(self, kind: str, images, obj: str):
        with self._model_lock:
            if len(images) == 1:
                fn = (
                    self.model.detect if kind == "detect" else self.model.point
                )
                return [fn(images[0], obj)]
            fn = (
                self.model.detect_batch if kind == "detect"
                else self.model.point_batch
            )
            return fn(images, obj)

    def gaze_request(self, image, eye, image_key: Optional[str] = None,
                     variant: Optional[str] = None):
        t0 = time.monotonic()
        try:
            if self.struct_pool:
                out = self._structured_via_pool(
                    "gaze", image, eye, image_key, variant=variant
                )
            elif variant is not None:
                # refuse rather than silently serving base weights
                raise ValueError(
                    "gaze with a variant requires --struct-pool "
                    "(pooled structured decode)"
                )
            else:
                image = self._resolve_image(image, image_key)
                with self._model_lock:
                    out = self.model.detect_gaze(image, eye=eye)
        except Exception:
            self.metrics.observe("gaze", time.monotonic() - t0, ok=False)
            raise
        self.metrics.observe("gaze", time.monotonic() - t0, ok=True)
        return out

    def _structured_via_pool(self, kind, image, obj, image_key,
                             timeout_s: float = 300.0, variant=None):
        ev = threading.Event()
        deadline = time.monotonic() + timeout_s
        rid = self._prepare_and_admit(
            image, None, None, 0, deadline, ev, None, None,
            image_key=image_key, structured=kind, obj=obj, variant=variant,
        )
        if not ev.wait(timeout=max(0.0, deadline - time.monotonic())):
            self._abandon(rid)
            raise TimeoutError("structured request timed out")
        out, _ = self._pop_result(rid)
        return out

    def structured_request(self, kind: str, image, obj: str,
                           image_key: Optional[str] = None,
                           variant: Optional[str] = None) -> Any:
        t0 = time.monotonic()
        try:
            if self.struct_pool:
                out = self._structured_via_pool(
                    kind, image, obj, image_key, variant=variant
                )
            elif variant is not None:
                raise ValueError(
                    "detect/point with a variant requires --struct-pool "
                    "(pooled structured decode)"
                )
            else:
                image = self._resolve_image(image, image_key)
                out = self._batcher.request(kind, image, obj)
        except Exception:
            self.metrics.observe(kind, time.monotonic() - t0, ok=False)
            raise
        self.metrics.observe(kind, time.monotonic() - t0, ok=True)
        return out

    def occupancy(self) -> Dict[str, Any]:
        with self._lock:
            free = len(self.engine.free_slots())
        out: Dict[str, Any] = {"slots": self.engine.n_slots, "free": free}
        if self.engine._variants:
            out["variants"] = sorted(self.engine._variants)
        if self.engine.spec_k or self.engine.spec_accept_rate is not None:
            out["speculative"] = self.engine.spec_k
            rate = self.engine.spec_accept_rate
            out["spec_accept_rate"] = (
                round(rate, 3) if rate is not None else None
            )
        return out

    def warmup(self) -> None:
        """Compile the serving path before traffic: run one dummy request
        through encode -> prefill -> admission -> chunk loop (incl. the
        speculative chunk when enabled). Without this the FIRST request
        pays every jit compile — minutes at 2B on TPU."""
        import numpy as _np
        from PIL import Image as _Image

        img = _Image.fromarray(
            _np.zeros((64, 64, 3), dtype=_np.uint8)
        )
        out = self.text_request(
            img, None, "normal", max_tokens=self.engine.chunk + 1,
            timeout_s=3600.0,  # first-compile budget (minutes at 2B on TPU)
        )
        assert isinstance(out, str)
        # drop the dummy encode from the cache so it never serves a hit
        with self._cache_lock:
            self._enc_cache.clear()

    def shutdown(self):
        self._stop = True
        self._wake.set()
        self._stepper.join(timeout=5)


class _Handler(BaseHTTPRequestHandler):
    frontend: ServingFrontend = None  # set by make_server

    def log_message(self, fmt, *args):  # quiet
        pass

    def _json(self, code: int, payload: Dict[str, Any]):
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _chat_completions(self, payload):
        image, key, question = _parse_chat(payload)
        max_tokens = int(payload.get("max_tokens")
                         or payload.get("max_completion_tokens") or 512)
        temp = payload.get("temperature")
        top_p = payload.get("top_p")
        temp = None if temp is None else float(temp)
        top_p = None if top_p is None else float(top_p)
        model_name = payload.get("model", "moondream")
        rid = f"chatcmpl-{int(time.time() * 1000)}"
        created = int(time.time())

        if _parse_bool(payload.get("stream")):
            if image is None:
                raise ValueError("streaming requires an image message")
            gen = self.frontend.text_request_stream(
                image, question, "normal", max_tokens,
                temperature=temp, top_p=top_p, image_key=key,
                endpoint="chat_stream",
            )
            it = iter(gen)
            try:
                first = next(it)
            except StopIteration:
                first = None
            self.send_response(200)
            self.send_header("Content-Type", "text/event-stream")
            self.send_header("Cache-Control", "no-cache")
            self.end_headers()

            def event(delta, finish=None):
                return ("data: " + json.dumps({
                    "id": rid, "object": "chat.completion.chunk",
                    "created": created, "model": model_name,
                    "choices": [{
                        "index": 0, "delta": delta,
                        "finish_reason": finish,
                    }],
                }) + "\n\n").encode()

            try:
                self.wfile.write(event({"role": "assistant"}))
                if first is not None:
                    self.wfile.write(event({"content": first}))
                for chunk in it:
                    self.wfile.write(event({"content": chunk}))
                    self.wfile.flush()
                self.wfile.write(event({}, finish="stop"))
                self.wfile.write(b"data: [DONE]\n\n")
                self.wfile.flush()
            except (BrokenPipeError, ConnectionResetError):
                gen.close()
            except Exception as e:
                try:
                    self.wfile.write(
                        f"data: {json.dumps({'error': str(e)})}\n\n".encode()
                    )
                    self.wfile.flush()
                except OSError:
                    pass
            return

        out, n_tokens = self.frontend.chat_request(
            image, question, max_tokens, temp, top_p, image_key=key
        )
        self._json(200, {
            "id": rid, "object": "chat.completion", "created": created,
            "model": model_name,
            "choices": [{
                "index": 0,
                "message": {"role": "assistant", "content": out},
                "finish_reason": "stop",
            }],
            "usage": {
                "prompt_tokens": 0, "completion_tokens": n_tokens,
                "total_tokens": n_tokens,
            },
        })

    def _stream_sse(self, image, question, length, max_tokens, temp,
                    top_p, image_key=None, variant=None):
        """`"stream": true` responses: text/event-stream of
        `data: {"chunk": ...}` events, terminated by `data: [DONE]`.
        The first chunk is pulled BEFORE headers go out so admission
        errors (bad prompt, no slot) still return proper status codes."""
        gen = self.frontend.text_request_stream(
            image, question, length, max_tokens,
            temperature=temp, top_p=top_p, image_key=image_key,
            variant=variant,
        )
        it = iter(gen)
        try:
            first = next(it)
        except StopIteration:
            first = None
        self.send_response(200)
        self.send_header("Content-Type", "text/event-stream")
        self.send_header("Cache-Control", "no-cache")
        self.end_headers()
        try:
            if first is not None:
                self.wfile.write(
                    f"data: {json.dumps({'chunk': first})}\n\n".encode()
                )
                self.wfile.flush()
            for chunk in it:
                self.wfile.write(
                    f"data: {json.dumps({'chunk': chunk})}\n\n".encode()
                )
                self.wfile.flush()
            self.wfile.write(b"data: [DONE]\n\n")
            self.wfile.flush()
        except (BrokenPipeError, ConnectionResetError):
            gen.close()  # GeneratorExit inside -> cancel + free the slot
        except Exception as e:
            # headers are already out: a second HTTP response would
            # corrupt the stream, so surface the error as an SSE event
            # (no [DONE]) and end the body
            try:
                self.wfile.write(
                    f"data: {json.dumps({'error': str(e)})}\n\n".encode()
                )
                self.wfile.flush()
            except OSError:
                pass

    def do_GET(self):
        if self.path == "/healthz":
            self._json(200, {"ok": True, **self.frontend.occupancy()})
        elif self.path == "/metrics":
            self._json(
                200,
                {**self.frontend.metrics.snapshot(),
                 **self.frontend.occupancy(),
                 "structured_coalesced": self.frontend._batcher.coalesced,
                 "encode_cache_hits": self.frontend.encode_cache_hits,
                 "encode_cache_entries": len(self.frontend._enc_cache)},
            )
        else:
            self._json(404, {"error": "not found"})

    def do_POST(self):
        try:
            n = int(self.headers.get("Content-Length", 0))
            payload = json.loads(self.rfile.read(n) or b"{}")
            if self.path == "/v1/chat/completions":
                self._chat_completions(payload)
                return
            image, image_key = _decode_image(payload)
            max_tokens = int(payload.get("max_tokens", 512))
            temp = payload.get("temperature")
            top_p = payload.get("top_p")
            temp = None if temp is None else float(temp)
            top_p = None if top_p is None else float(top_p)
            stream = _parse_bool(payload.get("stream"))
            variant = payload.get("variant")
            if self.path == "/v1/caption":
                if stream:
                    self._stream_sse(
                        image, None, payload.get("length", "normal"),
                        max_tokens, temp, top_p, image_key, variant=variant,
                    )
                    return
                out = self.frontend.text_request(
                    image, None, payload.get("length", "normal"), max_tokens,
                    temperature=temp, top_p=top_p, image_key=image_key,
                    variant=variant,
                )
                self._json(200, {"caption": out})
            elif self.path == "/v1/query":
                reasoning = _parse_bool(payload.get("reasoning"))
                spatial_refs = payload.get("spatial_refs")
                if (reasoning or spatial_refs) and stream:
                    raise ValueError(
                        "streaming is not supported with reasoning or "
                        "spatial_refs (the response carries a structured "
                        "reasoning/grounding dict, not a chunk stream)"
                    )
                if reasoning or spatial_refs:
                    if spatial_refs is not None:
                        spatial_refs = [
                            [float(v) for v in ref] for ref in spatial_refs
                        ]
                        if not all(len(r) in (2, 4) for r in spatial_refs):
                            raise ValueError(
                                "spatial_refs entries must be [x, y] points"
                                " or [x1, y1, x2, y2] boxes"
                            )
                    out = self.frontend.query_direct(
                        image, payload["question"], max_tokens, temp, top_p,
                        reasoning=reasoning, spatial_refs=spatial_refs,
                        image_key=image_key,
                    )
                    # grounding values may be numpy scalars
                    self._json(
                        200, json.loads(json.dumps(out, default=float))
                    )
                    return
                if stream:
                    self._stream_sse(
                        image, payload["question"], "normal",
                        max_tokens, temp, top_p, image_key, variant=variant,
                    )
                    return
                out = self.frontend.text_request(
                    image, payload["question"], "normal", max_tokens,
                    temperature=temp, top_p=top_p, image_key=image_key,
                    variant=variant,
                )
                self._json(200, {"answer": out})
            elif self.path == "/v1/detect":
                self._json(
                    200,
                    self.frontend.structured_request(
                        "detect", image, payload["object"],
                        image_key=image_key, variant=variant,
                    ),
                )
            elif self.path == "/v1/gaze":
                eye = payload["eye"]
                out = self.frontend.gaze_request(
                    image, (float(eye["x"]), float(eye["y"])),
                    image_key=image_key, variant=variant,
                )
                self._json(200, out)
            elif self.path == "/v1/point":
                self._json(
                    200,
                    self.frontend.structured_request(
                        "point", image, payload["object"],
                        image_key=image_key, variant=variant,
                    ),
                )
            else:
                self._json(404, {"error": "not found"})
        except (ValueError, KeyError) as e:
            self._json(400, {"error": str(e)})
        except TimeoutError as e:
            self._json(503, {"error": str(e)})
        except Exception as e:  # surface, don't kill the worker thread
            self._json(500, {"error": f"{type(e).__name__}: {e}"})


def make_server(model, host: str = "127.0.0.1", port: int = 8080,
                n_slots: int = 8, slot_len: int = 1024, chunk: int = 8,
                temperature: float = 0.0, top_p: float = 0.0,
                speculative: int = 0, spec_adaptive: float = 0.0,
                struct_window_s: float = 0.02, encode_cache: int = 0,
                encode_window_s: float = 0.0, mesh=None,
                struct_pool: bool = False, variants=None,
                prefix_share: bool = False):
    """Build (server, frontend); call server.serve_forever() to run."""
    frontend = ServingFrontend(
        model, n_slots=n_slots, slot_len=slot_len, chunk=chunk,
        temperature=temperature, top_p=top_p, speculative=speculative,
        spec_adaptive=spec_adaptive, struct_window_s=struct_window_s,
        encode_cache=encode_cache, encode_window_s=encode_window_s,
        mesh=mesh, struct_pool=struct_pool, variants=variants,
        prefix_share=prefix_share,
    )
    handler = type("Handler", (_Handler,), {"frontend": frontend})
    server = ThreadingHTTPServer((host, port), handler)
    return server, frontend


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", default=None)
    parser.add_argument("--config", default=None,
                        help="None/'2b'/'05b'/'tiny' or a JSON path")
    parser.add_argument("--tokenizer", default=None)
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8080)
    parser.add_argument("--slots", type=int, default=8)
    parser.add_argument("--slot-len", type=int, default=1024)
    parser.add_argument("--chunk", type=int, default=8)
    parser.add_argument("--int4", action="store_true")
    parser.add_argument("--int8-text", action="store_true",
                        help="int8 w8a8 text weights (native MXU; best "
                             "with --spec where the verify runs B*k rows)")
    parser.add_argument("--spec", type=int, default=0, metavar="K",
                        help="speculative serving chunks with K-token "
                             "drafts (greedy pools: exact token match; "
                             "sampled pools: exact distribution via "
                             "rejection sampling)")
    parser.add_argument("--spec-adaptive", type=float, default=1.2,
                        metavar="RATE",
                        help="with --spec: auto-disable speculation when "
                             "the measured accept rate (tokens per "
                             "slot-iteration) stays below RATE after "
                             "warm-up; 0 disables the fallback")
    parser.add_argument("--temperature", type=float, default=0.0,
                        help="pool-wide sampling temperature (0 = greedy; "
                             "requests may override per-call)")
    parser.add_argument("--top-p", type=float, default=0.0)
    parser.add_argument("--no-warmup", action="store_true",
                        help="skip the startup warmup request (the first "
                             "real request then pays all jit compiles)")
    parser.add_argument("--tp", type=int, default=0, metavar="N",
                        help="shard the serving pool over N-way tensor "
                             "parallelism (remaining devices become dp for "
                             "the slot axis); forces xla_attn. 0 = single "
                             "device")
    parser.add_argument("--encode-cache", type=int, default=0, metavar="N",
                        help="LRU-cache the N most recent images' encodes "
                             "(content-addressed): repeat images skip "
                             "crops+ViT+prefill. Each entry pins an image "
                             "KV snapshot in device memory (~150MB at 2B "
                             "bf16); 0 disables")
    parser.add_argument("--encode-window", type=float, default=0.0,
                        metavar="S",
                        help="coalesce concurrent admissions' image encodes "
                             "into one batched ViT pass (arrival window in "
                             "seconds). Off by default: the batched ViT is "
                             "allclose-but-not-bit-identical to the single "
                             "path, so near-tie greedy tokens can differ")
    parser.add_argument("--prefix-share", action="store_true",
                        help="slots hold only the prompt/answer SUFFIX; "
                             "repeat images (encode-cache hits) share ONE "
                             "read-only ~730-token image-prefix KV entry — "
                             "admission skips the prefix copy and N "
                             "same-image requests store it once (pair "
                             "with --encode-cache; single-chip)")
    parser.add_argument("--struct-pool", action="store_true",
                        help="route detect/point through the continuous "
                             "batching pool (mixed text+structured "
                             "chunks): heterogeneous objects and text "
                             "advance in one fused step; incompatible "
                             "with --spec")
    parser.add_argument("--struct-window", type=float, default=0.02,
                        metavar="S",
                        help="coalescing window for concurrent same-object "
                             "detect/point requests (one batched decode "
                             "per group); 0 disables")
    parser.add_argument("--variant", action="append", default=[],
                        metavar="NAME=PATH_OR_ID",
                        help="register a LoRA adapter for multi-tenant "
                             "serving (repeatable). PATH_OR_ID is a local "
                             "adapter checkpoint or a Moondream variant "
                             "id. Requests select one with "
                             '{"variant": NAME}; rows with different '
                             "adapters (and base rows) decode in the same "
                             "fused pool chunks")
    args = parser.parse_args()

    from .finetune import resolve_config
    from .models.moondream import MoondreamModel
    from .tokenizer import load_tokenizer
    from .weights import load_params

    config = resolve_config(args.config)
    params = (
        load_params(args.model, config, runtime_int4=args.int4,
                    runtime_int8=args.int8_text)
        if args.model
        else None
    )
    if params is None:
        print("WARNING: no --model; serving random weights (smoke mode)")
    mesh = None
    if args.tp:
        import dataclasses

        import jax

        from .parallel.mesh import create_mesh

        n = len(jax.devices())
        if n % args.tp:
            raise SystemExit(f"--tp {args.tp} does not divide {n} devices")
        mesh = create_mesh({"dp": n // args.tp, "tp": args.tp})
        # GSPMD partitions the XLA attention path; Pallas is opaque
        config = dataclasses.replace(
            config, text=dataclasses.replace(config.text, xla_attn=True)
        )
    model = MoondreamModel(
        config, params=params, tokenizer=load_tokenizer(args.tokenizer)
    )
    variants = None
    if args.variant:
        import jax.numpy as jnp

        from .lora import variant_state_dict

        variants = {}
        for spec in args.variant:
            name, _, src = spec.partition("=")
            if not src:
                raise SystemExit(f"--variant {spec!r}: expected NAME=PATH")
            variants[name] = variant_state_dict(
                src, n_layers=config.text.n_layers,
                dtype_str=str(jnp.dtype(model.dtype)),
            )
        print(f"variants registered: {sorted(variants)}")
    server, frontend = make_server(
        model, args.host, args.port,
        n_slots=args.slots, slot_len=args.slot_len, chunk=args.chunk,
        temperature=args.temperature, top_p=args.top_p,
        speculative=args.spec, spec_adaptive=args.spec_adaptive,
        struct_window_s=args.struct_window, encode_cache=args.encode_cache,
        encode_window_s=args.encode_window, mesh=mesh,
        struct_pool=args.struct_pool, variants=variants,
        prefix_share=args.prefix_share,
    )
    if mesh is not None:
        # the frontend serves the sharded-params twin; dropping main's
        # refs frees the unsharded text params (GBs of device-0 HBM)
        del model, params
    if not args.no_warmup:
        print("warming up (compiling the serving path)...")
        t0 = time.monotonic()
        frontend.warmup()
        print(f"warmup done in {time.monotonic() - t0:.1f}s")
    print(f"serving on http://{args.host}:{args.port}")

    # graceful SIGTERM (container orchestration): stop accepting, let the
    # pool drain, then exit
    import signal

    def _term(signum, frame):
        raise KeyboardInterrupt

    signal.signal(signal.SIGTERM, _term)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        print("shutting down (draining in-flight requests)...")
    finally:
        server.shutdown()
        frontend.shutdown()


if __name__ == "__main__":
    main()
