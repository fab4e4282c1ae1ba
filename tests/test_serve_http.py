"""HTTP serving front-end (serve_http.py): stdlib server over the
continuous-batching engine. Concurrent text requests share the slot pool
(one fused ragged step advances all of them); structured endpoints return
the single-path results; errors surface as JSON with proper codes."""

import base64
import io
import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest
from PIL import Image

from moondream_tpu.config import tiny_test_config
from moondream_tpu.models.moondream import MoondreamModel
from moondream_tpu.serve_http import make_server
from moondream_tpu.tokenizer import ByteTokenizer


@pytest.fixture(scope="module")
def model():
    return MoondreamModel(tiny_test_config(), tokenizer=ByteTokenizer(), seed=0)


@pytest.fixture(scope="module")
def server(model):
    srv, frontend = make_server(model, "127.0.0.1", 0, n_slots=4, chunk=4)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{port}"
    srv.shutdown()
    frontend.shutdown()


def _image_b64(seed=0, size=(120, 160)):
    rng = np.random.default_rng(seed)
    im = Image.fromarray(
        rng.integers(0, 255, size=(size[0], size[1], 3), dtype=np.uint8)
    )
    buf = io.BytesIO()
    im.save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode()


def _post(base, path, payload):
    req = urllib.request.Request(
        base + path,
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=600) as r:
        return r.status, json.loads(r.read())


def test_healthz(server):
    with urllib.request.urlopen(server + "/healthz", timeout=60) as r:
        body = json.loads(r.read())
    assert body["ok"] is True and body["slots"] == 4


def test_caption_and_query(server):
    code, body = _post(
        server, "/v1/caption", {"image_b64": _image_b64(), "max_tokens": 8}
    )
    assert code == 200 and isinstance(body["caption"], str)

    code, body = _post(
        server, "/v1/query",
        {"image_b64": _image_b64(1), "question": "What?", "max_tokens": 8},
    )
    assert code == 200 and isinstance(body["answer"], str)


def test_concurrent_captions_share_pool(server, model):
    """N concurrent requests all complete, and each equals the sequential
    greedy caption for its image (the engine is greedy by default)."""
    imgs = [(i, _image_b64(seed=i)) for i in range(3)]
    results = {}

    def run(i, b64):
        _, body = _post(
            server, "/v1/caption", {"image_b64": b64, "max_tokens": 8}
        )
        results[i] = body["caption"]

    threads = [threading.Thread(target=run, args=a) for a in imgs]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    assert set(results) == {0, 1, 2}

    for i in range(3):
        rng = np.random.default_rng(i)
        im = Image.fromarray(
            rng.integers(0, 255, size=(120, 160, 3), dtype=np.uint8)
        )
        want = model.caption(
            im, "normal",
            settings={"temperature": 0.0, "top_p": 0.0, "max_tokens": 8},
        )["caption"]
        assert results[i] == want


def test_detect_and_point(server):
    code, body = _post(
        server, "/v1/detect", {"image_b64": _image_b64(), "object": "x"}
    )
    assert code == 200 and "objects" in body
    code, body = _post(
        server, "/v1/point", {"image_b64": _image_b64(), "object": "x"}
    )
    assert code == 200 and "points" in body


def test_error_codes(server):
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server, "/v1/caption", {})
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server, "/v1/nope", {"image_b64": _image_b64()})
    assert e.value.code == 404


def test_slot_timeout_releases_prepared(model):
    """When no slot frees before the deadline, the prepared request's KV
    buffer must go back to the model's pool (no leak) and the engine must
    keep serving later requests."""
    from moondream_tpu.serve_http import ServingFrontend

    frontend = ServingFrontend(model, n_slots=1, chunk=4)
    try:
        rng = np.random.default_rng(7)
        im = Image.fromarray(
            rng.integers(0, 255, size=(120, 160, 3), dtype=np.uint8)
        )
        # stop the stepper first so the occupied slot provably never
        # frees during the timed-out request (no race with fast decode)
        frontend._stop = True
        frontend._wake.set()
        frontend._stepper.join(timeout=30)
        with frontend._lock:
            frontend.engine.submit(im, max_tokens=900)
        pool_before = len(model._kv_pool)
        with pytest.raises(TimeoutError):
            frontend.text_request(im, None, "normal", 8, timeout_s=0.05)
        assert len(model._kv_pool) >= pool_before  # prep buffer returned
        # the pool itself still works: drain the occupant directly
        out = frontend.engine.drain()
        assert len(out) == 1
    finally:
        frontend.shutdown()


def test_metrics_endpoint(server):
    """/metrics exposes request counters, latency percentiles, and token
    totals after traffic has flowed."""
    _post(server, "/v1/caption", {"image_b64": _image_b64(9), "max_tokens": 6})
    with urllib.request.urlopen(server + "/metrics", timeout=60) as r:
        m = json.loads(r.read())
    assert m["requests"].get("caption", 0) >= 1
    assert m["generated_tokens"] >= 1
    assert "caption" in m["latency_ms"]
    assert m["latency_ms"]["caption"]["p50"] > 0
    assert m["slots"] == 4
    assert "structured_coalesced" in m


@pytest.mark.slow
def test_concurrent_detect_coalesce(server):
    """Concurrent same-object detect requests through the live server all
    complete with valid structure whether or not they landed in one
    coalescing window; a different-object request sharing the window must
    not be mixed into the group. (Deterministic grouping mechanics are
    covered by test_structured_batcher_groups below.)"""
    results = {}

    def run(i, obj):
        _, body = _post(
            server, "/v1/detect", {"image_b64": _image_b64(20 + i), "object": obj}
        )
        results[i] = body

    # warm the detect paths first so coalescing isn't defeated by compile
    run(99, "x")
    threads = [threading.Thread(target=run, args=(i, "x")) for i in range(3)]
    threads.append(threading.Thread(target=run, args=(3, "other")))
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    assert set(results) >= {0, 1, 2, 3}
    for i in range(4):
        assert "objects" in results[i]


def test_structured_batcher_groups():
    """_StructuredBatcher mechanics with a fake runner: same-(kind, object)
    requests inside the window share one batch; different objects never
    mix; errors propagate to every member of the failed group."""
    import time as _time

    from moondream_tpu.serve_http import _StructuredBatcher

    calls = []

    def run_batch(kind, images, obj):
        calls.append((kind, list(images), obj))
        if obj == "boom":
            raise RuntimeError("model failed")
        return [f"{kind}:{obj}:{im}" for im in images]

    b = _StructuredBatcher(run_batch, window_s=0.25, max_batch=8)
    results = {}

    def req(i, kind, obj):
        try:
            results[i] = b.request(kind, f"img{i}", obj)
        except RuntimeError as e:
            results[i] = e

    threads = [
        threading.Thread(target=req, args=(0, "detect", "x")),
        threading.Thread(target=req, args=(1, "detect", "x")),
        threading.Thread(target=req, args=(2, "detect", "y")),
        threading.Thread(target=req, args=(3, "point", "x")),
    ]
    for t in threads:
        t.start()
        _time.sleep(0.02)  # all start well inside the 0.25s window
    for t in threads:
        t.join(timeout=30)

    assert results[0] == "detect:x:img0"
    assert results[1] == "detect:x:img1"
    assert results[2] == "detect:y:img2"
    assert results[3] == "point:x:img3"
    # the two detect:x requests shared one batch; y and point:x did not
    sizes = {(k, o): len(ims) for k, ims, o in calls}
    assert sizes[("detect", "x")] == 2
    assert sizes[("detect", "y")] == 1
    assert sizes[("point", "x")] == 1
    assert b.coalesced == 2

    # error propagation: both members of a failed group see the error
    threads = [
        threading.Thread(target=req, args=(10, "detect", "boom")),
        threading.Thread(target=req, args=(11, "detect", "boom")),
    ]
    for t in threads:
        t.start()
        _time.sleep(0.02)
    for t in threads:
        t.join(timeout=30)
    assert isinstance(results[10], RuntimeError)
    assert isinstance(results[11], RuntimeError)


def _read_sse(base, path, payload):
    req = urllib.request.Request(
        base + path, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    with urllib.request.urlopen(req, timeout=600) as r:
        assert r.headers.get("Content-Type") == "text/event-stream"
        raw = r.read().decode()
    events = [
        line[len("data: "):]
        for line in raw.split("\n")
        if line.startswith("data: ")
    ]
    assert events and events[-1] == "[DONE]"
    return [json.loads(e)["chunk"] for e in events[:-1]]


def test_streaming_caption_matches_nonstream(server):
    """SSE streaming: concatenated chunks equal the non-streaming result
    for the same image (greedy pool -> deterministic), and the slot is
    freed afterwards."""
    b64 = _image_b64(31)
    _, plain = _post(
        server, "/v1/caption", {"image_b64": b64, "max_tokens": 10}
    )
    chunks = _read_sse(
        server, "/v1/caption",
        {"image_b64": b64, "max_tokens": 10, "stream": True},
    )
    assert "".join(chunks) == plain["caption"]

    chunks = _read_sse(
        server, "/v1/query",
        {"image_b64": b64, "question": "What?", "max_tokens": 8,
         "stream": True},
    )
    _, plainq = _post(
        server, "/v1/query",
        {"image_b64": b64, "question": "What?", "max_tokens": 8},
    )
    assert "".join(chunks) == plainq["answer"]

    with urllib.request.urlopen(server + "/healthz", timeout=60) as r:
        h = json.loads(r.read())
    assert h["free"] == h["slots"]  # nothing leaked a slot


def test_encode_cache(model):
    """With encode_cache on, a repeated image serves from the cached
    EncodedImage (hit counter advances, result identical); the LRU evicts
    beyond capacity."""
    import urllib.request as _url

    srv, frontend = make_server(
        model, "127.0.0.1", 0, n_slots=2, chunk=4, encode_cache=2
    )
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{port}"
    try:
        b64 = _image_b64(50)
        _, first = _post(base, "/v1/caption", {"image_b64": b64, "max_tokens": 8})
        assert frontend.encode_cache_hits == 0
        _, again = _post(base, "/v1/caption", {"image_b64": b64, "max_tokens": 8})
        assert again == first  # cached encode -> identical output
        assert frontend.encode_cache_hits == 1
        # structured path shares the cache
        _post(base, "/v1/detect", {"image_b64": b64, "object": "x"})
        assert frontend.encode_cache_hits == 2
        # LRU capacity 2: two new images evict the oldest
        _post(base, "/v1/caption", {"image_b64": _image_b64(51), "max_tokens": 4})
        _post(base, "/v1/caption", {"image_b64": _image_b64(52), "max_tokens": 4})
        assert len(frontend._enc_cache) == 2
        with _url.urlopen(base + "/metrics", timeout=60) as r:
            m = json.loads(r.read())
        assert m["encode_cache_hits"] == 2
        assert m["encode_cache_entries"] == 2
    finally:
        srv.shutdown()
        frontend.shutdown()


@pytest.mark.slow
def test_encode_window_batches_admissions(model):
    """Opt-in --encode-window: concurrent admissions share one batched
    ViT pass (encode_images). All requests complete and the encode
    batcher records the coalesced group."""
    srv, frontend = make_server(
        model, "127.0.0.1", 0, n_slots=4, chunk=4, encode_window_s=0.5
    )
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{port}"
    try:
        results = {}

        def run(i):
            _, body = _post(
                base, "/v1/caption",
                {"image_b64": _image_b64(60 + i), "max_tokens": 6},
            )
            results[i] = body["caption"]

        threads = [threading.Thread(target=run, args=(i,)) for i in range(3)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=600)
        assert set(results) == {0, 1, 2}
        assert all(isinstance(v, str) for v in results.values())
        assert frontend._enc_batcher.coalesced >= 2
    finally:
        srv.shutdown()
        frontend.shutdown()


def test_gaze_endpoint(server):
    code, body = _post(
        server, "/v1/gaze",
        {"image_b64": _image_b64(70), "eye": {"x": 0.4, "y": 0.3}},
    )
    assert code == 200 and "gaze" in body
    g = body["gaze"]
    assert g is None or (0.0 <= g["x"] <= 1.0 and 0.0 <= g["y"] <= 1.0)
    # missing eye -> 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server, "/v1/gaze", {"image_b64": _image_b64(70)})
    assert e.value.code == 400


@pytest.mark.slow
def test_mixed_load_soak(model):
    """Sustained mixed load through one frontend: plain + sampled +
    streamed captions, queries, coalesced detects, and a mid-flight
    cancel (timeout) all interleaved across threads. Afterwards the pool
    must be fully free, the engine's results dict drained (no per-request
    growth), and the KV pool bounded — the invariants that rot first in
    threaded serving code."""
    from moondream_tpu.serve_http import ServingFrontend

    frontend = ServingFrontend(model, n_slots=4, chunk=4, encode_cache=2)
    rng = np.random.default_rng(123)

    def img(seed):
        r = np.random.default_rng(seed)
        return Image.fromarray(
            r.integers(0, 255, size=(100 + (seed % 3) * 30, 140, 3),
                       dtype=np.uint8)
        )

    errors = []
    done = []

    def worker(i):
        try:
            kind = i % 5
            if kind == 0:
                out = frontend.text_request(img(i), None, "normal", 8)
                assert isinstance(out, str)
            elif kind == 1:
                out = frontend.text_request(
                    img(i), "what?", "normal", 8, temperature=0.7, top_p=0.9
                )
                assert isinstance(out, str)
            elif kind == 2:
                chunks = list(
                    frontend.text_request_stream(img(i), None, "normal", 8)
                )
                assert all(isinstance(c, str) for c in chunks)
            elif kind == 3:
                out = frontend.structured_request("detect", img(i), "thing")
                assert "objects" in out
            else:
                # deliberately impossible deadline -> timeout path
                try:
                    frontend.text_request(
                        img(i), None, "normal", 200, timeout_s=0.001
                    )
                except TimeoutError:
                    pass
            done.append(i)
        except Exception as e:  # pragma: no cover - diagnostic
            errors.append((i, repr(e)))

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(15)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    try:
        assert not errors, errors
        assert len(done) == 15
        # drain anything still in flight, then check the invariants
        deadline = __import__("time").monotonic() + 120
        while (any(s.active for s in frontend.engine.slots)
               or frontend.engine._inflight):
            assert __import__("time").monotonic() < deadline, "pool stuck"
            __import__("time").sleep(0.1)
        assert len(frontend.engine.free_slots()) == 4
        # frontend pops results per request; timeouts clean up after
        # themselves — nothing may accumulate
        assert len(frontend.engine.results) == 0, frontend.engine.results
        assert len(frontend.engine.token_counts) == 0
        for key, pool in model._kv_pool.items():
            assert len(pool) <= 2, (key, len(pool))
        m = frontend.metrics.snapshot()
        assert sum(m["requests"].values()) >= 15
    finally:
        frontend.shutdown()


def test_warmup(model):
    """warmup() compiles the serving path end-to-end and leaves a clean
    pool (all slots free, encode cache empty)."""
    from moondream_tpu.serve_http import ServingFrontend

    frontend = ServingFrontend(model, n_slots=2, chunk=4, encode_cache=2)
    try:
        frontend.warmup()
        assert len(frontend.engine.free_slots()) == 2
        assert len(frontend._enc_cache) == 0
        assert frontend.metrics.snapshot()["requests"].get("caption", 0) >= 1
    finally:
        frontend.shutdown()


def test_chat_completions(server, model):
    """OpenAI-compatible endpoint: image+text message answers through the
    pool (matching the native query path), text-only messages use the
    no-image query path, streaming emits chat.completion.chunk deltas
    that concatenate to the non-streaming content."""
    b64 = _image_b64(80)

    def chat(payload):
        return _post(server, "/v1/chat/completions", payload)

    msg = [{
        "role": "user",
        "content": [
            {"type": "text", "text": "What is this?"},
            {"type": "image_url",
             "image_url": {"url": f"data:image/png;base64,{b64}"}},
        ],
    }]
    code, body = chat({"messages": msg, "max_tokens": 8})
    assert code == 200
    assert body["object"] == "chat.completion"
    content = body["choices"][0]["message"]["content"]
    assert isinstance(content, str)
    assert body["usage"]["completion_tokens"] >= 0

    # parity with the native query endpoint (same pool, greedy)
    _, native = _post(
        server, "/v1/query",
        {"image_b64": b64, "question": "What is this?", "max_tokens": 8},
    )
    assert content == native["answer"]

    # text-only message -> no-image query path
    code, body = chat({
        "messages": [{"role": "user", "content": "Say something."}],
        "max_tokens": 6,
    })
    assert code == 200
    assert isinstance(body["choices"][0]["message"]["content"], str)

    # streaming: deltas concatenate to the non-streaming answer
    req = urllib.request.Request(
        server + "/v1/chat/completions",
        data=json.dumps(
            {"messages": msg, "max_tokens": 8, "stream": True}
        ).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    with urllib.request.urlopen(req, timeout=600) as r:
        assert r.headers.get("Content-Type") == "text/event-stream"
        raw = r.read().decode()
    events = [
        json.loads(line[6:]) for line in raw.split("\n")
        if line.startswith("data: ") and line != "data: [DONE]"
    ]
    assert events[0]["choices"][0]["delta"].get("role") == "assistant"
    assert events[-1]["choices"][0]["finish_reason"] == "stop"
    streamed = "".join(
        e["choices"][0]["delta"].get("content", "") for e in events
    )
    assert streamed == content

    # remote URLs are rejected (zero egress)
    with pytest.raises(urllib.error.HTTPError) as e:
        chat({"messages": [{
            "role": "user",
            "content": [
                {"type": "text", "text": "x"},
                {"type": "image_url",
                 "image_url": {"url": "https://example.com/x.png"}},
            ],
        }]})
    assert e.value.code == 400


def test_query_reasoning_and_spatial_refs(server, model):
    """/v1/query with reasoning returns the grounded reasoning dict
    matching the library path; spatial_refs thread through to the prompt;
    malformed refs get a 400."""
    b64 = _image_b64(90)
    code, body = _post(server, "/v1/query", {
        "image_b64": b64, "question": "Why?", "reasoning": True,
        "max_tokens": 8,
    })
    assert code == 200
    assert "reasoning" in body and "answer" in body
    assert isinstance(body["reasoning"].get("text"), str)

    rng = np.random.default_rng(90)
    im = Image.fromarray(rng.integers(0, 255, (120, 160, 3), np.uint8))
    want = model.query(
        im, "Why?", reasoning=True,
        settings={"temperature": 0.0, "top_p": 0.0, "max_tokens": 8},
    )
    assert body["answer"] == want["answer"]
    assert body["reasoning"]["text"] == want["reasoning"]["text"]

    code, body = _post(server, "/v1/query", {
        "image_b64": b64, "question": "What is here?",
        "spatial_refs": [[0.5, 0.5], [0.1, 0.1, 0.6, 0.6]],
        "max_tokens": 8,
    })
    assert code == 200 and isinstance(body["answer"], str)
    want = model.query(
        im, "What is here?", spatial_refs=[(0.5, 0.5), (0.1, 0.1, 0.6, 0.6)],
        settings={"temperature": 0.0, "top_p": 0.0, "max_tokens": 8},
    )
    assert body["answer"] == want["answer"]

    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server, "/v1/query", {
            "image_b64": b64, "question": "x", "spatial_refs": [[0.5]],
        })
    assert e.value.code == 400


def test_chat_multi_turn_keeps_image(server):
    """A follow-up user message without an image must still answer about
    the most recently sent image (not fall to the no-image path), and
    stream+reasoning / malformed data URIs are client errors."""
    b64 = _image_b64(80)
    history = [
        {"role": "user", "content": [
            {"type": "text", "text": "What is this?"},
            {"type": "image_url",
             "image_url": {"url": f"data:image/png;base64,{b64}"}},
        ]},
        {"role": "assistant", "content": "something"},
        {"role": "user", "content": "What color is it?"},
    ]
    code, body = _post(
        server, "/v1/chat/completions",
        {"messages": history, "max_tokens": 8},
    )
    assert code == 200
    followup = body["choices"][0]["message"]["content"]
    # same as asking the question directly against the image
    _, direct = _post(server, "/v1/query", {
        "image_b64": b64, "question": "What color is it?", "max_tokens": 8,
    })
    assert followup == direct["answer"]

    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server, "/v1/query", {
            "image_b64": b64, "question": "x", "reasoning": True,
            "stream": True,
        })
    assert e.value.code == 400

    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server, "/v1/chat/completions", {"messages": [{
            "role": "user",
            "content": [
                {"type": "text", "text": "x"},
                {"type": "image_url", "image_url": {"url": "data:image/png;base64"}},
            ],
        }]})
    assert e.value.code == 400


def test_struct_pool_server(model):
    """--struct-pool: detect/point ride the continuous pool (mixed
    chunks) concurrently with captions; all return proper structure."""
    srv, frontend = make_server(
        model, "127.0.0.1", 0, n_slots=4, chunk=4, struct_pool=True
    )
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{port}"
    try:
        results = {}

        def detect(i, obj):
            _, body = _post(base, "/v1/detect", {
                "image_b64": _image_b64(40 + i), "object": obj,
            })
            results[f"d{i}"] = body

        def caption(i):
            _, body = _post(base, "/v1/caption", {
                "image_b64": _image_b64(44 + i), "max_tokens": 8,
            })
            results[f"c{i}"] = body

        threads = [
            threading.Thread(target=detect, args=(0, "cat")),
            threading.Thread(target=detect, args=(1, "dog")),  # different obj
            threading.Thread(target=caption, args=(0,)),
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=600)
        assert "objects" in results["d0"] and "objects" in results["d1"]
        assert isinstance(results["c0"]["caption"], str)
        with urllib.request.urlopen(base + "/healthz", timeout=60) as r:
            h = json.loads(r.read())
        assert h["free"] == h["slots"]
    finally:
        srv.shutdown()
        frontend.shutdown()


@pytest.mark.slow
def test_variants_endpoint(model):
    """Multi-tenant LoRA over HTTP: a zero-B adapter's response is
    bitwise the base response (plumbing), a real adapter changes it,
    base requests are unaffected, and unknown names are 400s."""
    import jax.numpy as jnp

    cfg = tiny_test_config().text
    rng = np.random.default_rng(7)

    def adapter(b_scale, rank=4):
        def pair(fin, fout):
            return {
                "A": jnp.asarray(
                    rng.standard_normal(
                        (cfg.n_layers, rank, fin)
                    ).astype(np.float32) * 0.1,
                    model.dtype,
                ),
                "B": jnp.asarray(
                    rng.standard_normal(
                        (cfg.n_layers, fout, rank)
                    ).astype(np.float32) * b_scale,
                    model.dtype,
                ),
            }

        return {
            "attn": {
                "qkv": pair(cfg.dim, cfg.qkv_dim),
                "proj": pair(cfg.dim, cfg.dim),
            },
            "mlp": {
                "fc1": pair(cfg.dim, cfg.ff_dim),
                "fc2": pair(cfg.ff_dim, cfg.dim),
            },
        }

    srv, frontend = make_server(
        model, "127.0.0.1", 0, n_slots=3, chunk=4,
        variants={"zero": adapter(0.0), "tuned": adapter(0.5)},
    )
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base_url = f"http://127.0.0.1:{port}"
    try:
        img = _image_b64(seed=11)
        payload = {"image_b64": img, "question": "what?", "max_tokens": 8}
        _, base = _post(base_url, "/v1/query", payload)
        _, zero = _post(
            base_url, "/v1/query", {**payload, "variant": "zero"}
        )
        _, tuned = _post(
            base_url, "/v1/query", {**payload, "variant": "tuned"}
        )
        assert zero["answer"] == base["answer"]
        assert tuned["answer"] != base["answer"]

        with pytest.raises(urllib.error.HTTPError) as e:
            _post(base_url, "/v1/query", {**payload, "variant": "nope"})
        assert e.value.code == 400
        assert "unknown variant" in json.loads(e.value.read())["error"]

        with urllib.request.urlopen(base_url + "/healthz", timeout=60) as r:
            health = json.loads(r.read())
        assert health["variants"] == ["tuned", "zero"]
    finally:
        srv.shutdown()
        frontend.shutdown()


def test_prefix_share_with_encode_cache(model):
    """--prefix-share: an encode-cache hit hands the pool the SAME
    EncodedImage, so same-image requests share ONE prefix entry; outputs
    identical to a plain server."""
    srv0, fr0 = make_server(model, "127.0.0.1", 0, n_slots=2, chunk=4)
    srv1, fr1 = make_server(
        model, "127.0.0.1", 0, n_slots=2, chunk=4, encode_cache=2,
        prefix_share=True,
    )
    for s in (srv0, srv1):
        threading.Thread(target=s.serve_forever, daemon=True).start()
    b0 = f"http://127.0.0.1:{srv0.server_address[1]}"
    b1 = f"http://127.0.0.1:{srv1.server_address[1]}"
    try:
        b64 = _image_b64(60)
        _, p0 = _post(b0, "/v1/caption", {"image_b64": b64, "max_tokens": 8})
        _, p1 = _post(b1, "/v1/caption", {"image_b64": b64, "max_tokens": 8})
        assert p1["caption"] == p0["caption"]
        _, q0 = _post(
            b0, "/v1/query",
            {"image_b64": b64, "question": "What?", "max_tokens": 8},
        )
        _, q1 = _post(
            b1, "/v1/query",
            {"image_b64": b64, "question": "What?", "max_tokens": 8},
        )
        assert q1["answer"] == q0["answer"]
        # the second same-image request re-hit the mapped prefix entry:
        # exactly one entry was ever written
        eng = fr1.engine
        assert len(eng._pref_pid_of) == 1
        assert eng.kv.k.shape[3] < eng.kv_pref.k.shape[3]
    finally:
        srv0.shutdown(); fr0.shutdown()
        srv1.shutdown(); fr1.shutdown()
