"""Pipelined lockstep batch engine: overlap host work with device compute.

The TPU executes batches strictly in order, but the three cost centers of
batched captioning live on different resources:

  * host CPU      — PIL/C++ Lanczos crops (~40 ms/image)
  * host->device  — the crop stack transfer (44 MB/8-image batch; on a
                    tunneled chip this is the single largest cost)
  * TPU           — ViT + prefill + fused lockstep decode

`encode_images` + `caption_batch` run them serially. This engine runs a
producer thread that crops and *starts the async transfer* for batch i+1
while batch i's device graph executes, and dispatches batch i+1's full
device graph before collecting batch i's tokens — so the transfer and the
host crops hide entirely under decode, and the device queue never drains.

It also prefills [BOS, image] directly into the decode-sized KV buffer
(no per-image snapshot slice + batched reload like encode_images +
caption_batch pay), which is valid because a pipeline consumes each image
exactly once.

Throughput path only: results are bit-identical to `caption_batch`
(same kernels, same positions, same masks — tests/test_pipeline.py); use
the plain APIs for interactive/latency work. The reference has no
multi-image path at all (hf_moondream.py:99-103 loops).
"""

from __future__ import annotations

import queue
import threading
from collections import defaultdict
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.streaming import stream_text


class _Batch:
    """One producer->consumer work item: crops already in flight to HBM."""

    __slots__ = ("groups", "n_images")

    def __init__(self, groups, n_images):
        # groups: list of (tiling, n_crops, image_indices, crops_device)
        self.groups = groups
        self.n_images = n_images


class BatchPipeline:
    def __init__(
        self,
        model,
        batch_size: int = 8,
        prefetch: int = 2,
        eos_id: Optional[int] = None,
        speculative: int = 0,
    ):
        """`eos_id=None` uses the model's EOS; benchmark harnesses pass -1
        to force fixed-length generation (timing independent of logits).
        `prefetch` bounds how many crop batches may be in flight to HBM.

        `speculative=k` (greedy settings only): decode via ONE fused
        lockstep speculative loop per batch — per-row n-gram drafts
        verified k tokens at a time, prompt-seeded histories, exact greedy
        tokens (engine/batched.py:generate_text_spec_batched). Rows desync
        internally but the device graph stays a single dispatch, so the
        encode/decode overlap of the pipeline is untouched."""
        self.model = model
        self.batch_size = batch_size
        self.prefetch = prefetch
        self.spec_k = max(0, int(speculative))
        self.eos_id = (
            model.config.tokenizer.eos_id if eos_id is None else eos_id
        )

    # ---------------------------------------------------------------- public
    def caption(
        self,
        images,
        length: str = "normal",
        settings: Optional[Dict[str, Any]] = None,
    ) -> List[str]:
        prompt = list(self.model.config.tokenizer.templates["caption"][length])
        return self.run(images, prompt, settings)

    def query(
        self, images, question: str, settings: Optional[Dict[str, Any]] = None
    ) -> List[str]:
        t = self.model.config.tokenizer.templates["query"]
        prompt = (
            list(t["prefix"])
            + self.model._encode_text(question)
            + list(t["suffix"])
        )
        return self.run(images, prompt, settings)

    def run(
        self, images, prompt_tokens: List[int], settings=None
    ) -> List[str]:
        """Caption/VQA every image with ONE shared prompt; returns texts in
        input order. Tail batches are padded with the last image (padded
        rows decode but their outputs are dropped) so every batch reuses
        the same compiled graphs."""
        model = self.model
        images = list(images)
        if not images:
            return []
        B = self.batch_size
        max_tokens, temperature, top_p = model._settings(settings)
        lora = model._variant(settings)

        work: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()
        producer = threading.Thread(
            target=self._produce, args=(images, work, stop), daemon=True
        )
        producer.start()

        texts: List[str] = []
        pending = None  # (res, n_real) awaiting collection
        try:
            while True:
                item = work.get()
                if isinstance(item, Exception):
                    raise item
                if item is None:
                    break
                res = self._dispatch(
                    item, prompt_tokens, max_tokens, temperature, top_p, lora
                )
                if pending is not None:
                    texts.extend(self._collect(*pending))
                pending = (res, item.n_images)
            if pending is not None:
                texts.extend(self._collect(*pending))
        finally:
            stop.set()
            # unblock a producer waiting on a full queue
            while True:
                try:
                    work.get_nowait()
                except queue.Empty:
                    break
            producer.join(timeout=10)
        return texts[: len(images)]

    # -------------------------------------------------------------- producer
    def _produce(self, images, work, stop):
        B = self.batch_size
        model = self.model
        try:
            for start in range(0, len(images), B):
                chunk = images[start : start + B]
                n_real = len(chunk)
                while len(chunk) < B:  # pad tail to the compiled batch size
                    chunk = chunk + [chunk[-1]]
                # device preprocessing by default: the producer ships RAW
                # image bytes (async H2D only — jnp.asarray never enters
                # the device compute queue) and the consumer dispatches the
                # bit-exact fixed-point Lanczos crop graph itself, right
                # before the ViT. Dispatching the crop graph HERE instead
                # was a measured 30%+ regression: a producer-thread compute
                # dispatch lands at a nondeterministic position in the
                # device's FIFO and makes the CONSUMER's in-flight decode
                # wait on the next batch's ~1s tunnel transfer. Host
                # PIL/C++ crop stacks are the fallback
                # (MOONDREAM_DEVICE_PREPROCESS=0 / oversize images).
                prepped = model._prep_crop_groups(chunk)
                groups_idx = defaultdict(list)
                for i, (crops, tiling) in enumerate(prepped):
                    n = (crops.shape[0] if crops.ndim == 4
                         else tiling[0] * tiling[1] + 1)
                    groups_idx[(n, tiling)].append(i)
                groups = []
                for (n, tiling), idxs in groups_idx.items():
                    # async H2D only; the crop graphs are dispatched by
                    # the CONSUMER (model._materialize_crop_segments)
                    segs = model._build_crop_segments(
                        [prepped[i][0] for i in idxs]
                    )
                    groups.append((tiling, n, idxs, segs))
                if stop.is_set():
                    return
                work.put(_Batch(groups, n_real))
            work.put(None)
        except Exception as e:  # surface in the consumer
            work.put(e)

    # -------------------------------------------------------------- consumer
    def _dispatch(self, batch, prompt_tokens, max_tokens, temperature, top_p, lora):
        """Enqueue the full device graph for one batch; returns the async
        generation result (nothing fetched to host here)."""
        model = self.model
        cfg = model.config
        bsz = self.batch_size

        img_embs: List[Optional[jax.Array]] = [None] * bsz
        for tiling, n, idxs, segs in batch.groups:
            # materialize the group's crops IN THIS thread's dispatch
            # order: the crop graphs run adjacent to the ViT, never
            # between a previous batch's graphs (see _produce)
            crops_dev = model._materialize_crop_segments(segs, tiling)
            feats = model._vis_enc_fn()(model.params["vision"], crops_dev)
            feats = feats.reshape(len(idxs), n, *feats.shape[1:])
            embs = model._stitch_proj_batched_fn(tiling)(
                model.params["vision"], feats[:, 0], feats[:, 1:n]
            )
            for j, i in enumerate(idxs):
                img_embs[i] = embs[j]

        wte = model.params["text"]["wte"]
        bos_emb = wte[jnp.asarray([cfg.tokenizer.bos_id])]

        ids = list(prompt_tokens)
        length = len(ids)
        from ..models.moondream import PROMPT_PAD, _ceil_to

        pad = max(_ceil_to(length, PROMPT_PAD), PROMPT_PAD)
        ids_padded = ids + [0] * (pad - length)
        prompt_emb = wte[jnp.asarray(ids_padded)]

        # ONE fused [BOS, image, prompt] prefill straight into the
        # decode-sized buffer. The prompt is static, so nothing forces a
        # separate pass — and a second prefill is a second full read of
        # the 2.8GB weights (~50ms/batch, measured via tools/
        # stage_times.py). Logits come from the last REAL prompt position
        # (length masks the pad); the padded KV tail rows are never
        # attended before decode overwrites them (col <= qpos), matching
        # the old two-call behavior exactly.
        embeds = jnp.stack(
            [
                jnp.concatenate([bos_emb, e, prompt_emb], axis=0)
                for e in img_embs
            ]
        ).astype(model.dtype)
        seq = embeds.shape[1] - pad  # [BOS, image] span (the attn prefix)
        bound = model._decode_bound(seq + pad + max_tokens + 1)

        kv = model._take_kv_buffer(bsz, bound)
        logits, _, kv = model._prefill_batched_fn(model._kv_bound(seq + pad))(
            model.params["text"], kv, embeds,
            jnp.int32(0), jnp.int32(seq + length),
            jnp.int32(cfg.text.prefix_attn), lora=lora,
        )
        first = model._sample_batched_fn()(
            logits, model._next_rng(), jnp.float32(temperature),
            jnp.float32(top_p),
        ).astype(jnp.int32)

        if self.spec_k and temperature <= 0 and lora is None:
            # prompt-seeded draft histories (prompt-lookup), same rows
            seed = ids[-(cfg.text.max_context // 2):]
            hist = jnp.broadcast_to(
                jnp.asarray(seed, jnp.int32)[None, :], (bsz, len(seed))
            )
            res = model._generate_spec_batched_fn(
                self.eos_id, (cfg.tokenizer.answer_id,),
                cfg.text.max_context, bound, self.spec_k,
            )(
                model.params["text"], kv, first, jnp.int32(seq + length),
                jnp.int32(max_tokens),
                hist_init=hist,
                hist_cnt_init=jnp.full((bsz,), len(seed), jnp.int32),
            )
            return res

        res = model._generate_batched_fn(
            self.eos_id, (cfg.tokenizer.answer_id,),
            cfg.text.max_context, bound,
        )(
            model.params["text"], kv, first, jnp.int32(seq + length),
            model._next_rng(), jnp.float32(temperature), jnp.float32(top_p),
            jnp.int32(max_tokens), lora=lora,
        )
        return res

    def _collect(self, res, n_real) -> List[str]:
        tokens, counts = jax.device_get((res.tokens, res.counts))
        self.model._recycle_kv(res.kv, self.batch_size)
        return [
            "".join(
                stream_text(tokens[b, : counts[b]], self.model._decode_tokens)
            )
            for b in range(n_real)
        ]


class PooledPipeline:
    """Stream captions/VQA through the continuous-batching pool with a
    producer thread overlapping encode against decode chunks.

    BatchPipeline decodes in LOCKSTEP (one fused loop per batch of B); the
    pool decodes RAGGED per-slot chunks, which composes with speculative
    decoding (`speculative=k` drafts per-row and verifies k-token spans in
    one forward — engine/serving.py:serve_chunk_spec). This is the
    spec-pipelined serving configuration: the producer thread runs host
    crops + ONE batched ViT per wave + per-image prompt prefills
    (model-level work only; the model's KV-buffer pool is thread-safe),
    while the main thread admits PreparedRequests into free slots and
    keeps step()ping the pool — the same prepare/admit split the HTTP
    frontend uses (models/serve.py:prepare).

    Token-identical to submitting every image through the pool serially
    (greedy pools; tests/test_pipeline.py). The reference has no batched
    or speculative path at all (hf_moondream.py:99-103,
    moondream.py:481-528)."""

    def __init__(
        self,
        model,
        n_slots: int = 16,
        slot_len: int = 1024,
        chunk: int = 8,
        speculative: int = 0,
        wave: Optional[int] = None,
        prefetch: int = 1,
        eos_id: Optional[int] = None,
        prefix_share: bool = False,
    ):
        """`wave`: images per producer encode batch (default n_slots // 2).
        `prefetch`: encoded waves allowed to queue ahead of admission.
        HBM note: every prepared-but-unadmitted request holds a
        slot_len-bounded KV buffer (~0.2 GB at 2B bf16 / 1024 slots), so
        in-flight admissions cost up to wave * (prefetch + 1) buffers on
        top of the pool — prefetch=1 keeps that bounded."""
        from ..models.serve import ContinuousBatchingEngine

        self.engine = ContinuousBatchingEngine(
            model, n_slots=n_slots, slot_len=slot_len, chunk=chunk,
            pipeline_depth=2, speculative=speculative, eos_id=eos_id,
            prefix_share=prefix_share,
        )
        self.wave = max(1, wave if wave is not None else n_slots // 2)
        self.prefetch = prefetch

    def caption(
        self,
        images,
        length: str = "normal",
        settings: Optional[Dict[str, Any]] = None,
    ) -> List[str]:
        return self.run(images, question=None, length=length,
                        settings=settings)

    def query(
        self, images, question: str, settings: Optional[Dict[str, Any]] = None
    ) -> List[str]:
        return self.run(images, question=question, settings=settings)

    def run(
        self,
        images,
        question: Optional[str] = None,
        length: str = "normal",
        settings: Optional[Dict[str, Any]] = None,
    ) -> List[str]:
        eng = self.engine
        model = eng.model
        images = list(images)
        if not images:
            return []
        max_tokens, temperature, top_p = model._settings(settings)

        work: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def produce():
            try:
                for start in range(0, len(images), self.wave):
                    chunk_imgs = images[start : start + self.wave]
                    # one batched ViT + one batched [BOS, image] prefill
                    encs = model.encode_images(chunk_imgs)
                    preps = []
                    for j, enc in enumerate(encs):
                        preps.append((
                            start + j,
                            eng.prepare(
                                enc, question=question,
                                caption_length=length,
                                temperature=temperature, top_p=top_p,
                            ),
                        ))
                    if stop.is_set():
                        for _, p in preps:
                            eng.release_prepared(p)
                        return
                    work.put(preps)
                work.put(None)
            except Exception as e:
                work.put(e)

        producer = threading.Thread(target=produce, daemon=True)
        producer.start()

        texts: List[Optional[str]] = [None] * len(images)
        rid2idx: Dict[int, int] = {}
        ready: List[Any] = []  # (idx, prep) awaiting a free slot
        producer_done = False
        done = 0
        try:
            while done < len(images):
                # refill the ready list: poll while the pool has work, block
                # only when it would otherwise spin idle waiting on encodes
                if not producer_done:
                    pool_idle = (
                        not any(s.active for s in eng.slots)
                        and not eng._inflight
                    )
                    try:
                        item = work.get(block=pool_idle and not ready)
                        if item is None:
                            producer_done = True
                        elif isinstance(item, Exception):
                            raise item
                        else:
                            ready.extend(item)
                    except queue.Empty:
                        pass
                # admit into free slots
                while ready and eng.free_slots():
                    idx, prep = ready.pop(0)
                    rid2idx[eng.admit_prepared(prep, max_tokens=max_tokens)] = idx
                for rid in eng.step():
                    texts[rid2idx[rid]] = eng.results.pop(rid)
                    eng.token_counts.pop(rid, None)
                    done += 1
        finally:
            stop.set()
            while True:
                try:
                    item = work.get_nowait()
                    if isinstance(item, list):
                        for _, p in item:
                            eng.release_prepared(p)
                except queue.Empty:
                    break
            for _, p in ready:
                eng.release_prepared(p)
            producer.join(timeout=10)
        return texts  # type: ignore[return-value]
