"""A/B: continuous-batching aggregate decode with vs without speculation
(int4 weights + int8 KV, 16 slots, 2B). Random weights — degenerate
repetition makes spec acceptance an UPPER bound vs real checkpoints.
Diagnostic."""

import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    import dataclasses

    import jax
    import numpy as np
    from PIL import Image

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from moondream_tpu.config import MOONDREAM_2B
    from moondream_tpu.models.moondream import MoondreamModel
    from moondream_tpu.models.serve import ContinuousBatchingEngine
    from moondream_tpu.models.text import quantize_text_params
    from moondream_tpu.tokenizer import ByteTokenizer

    cfg = dataclasses.replace(
        MOONDREAM_2B,
        text=dataclasses.replace(MOONDREAM_2B.text, kv_int8=True),
    )
    model = MoondreamModel(cfg, tokenizer=ByteTokenizer(), seed=0)
    model.params = {
        **model.params, "text": quantize_text_params(model.params["text"])
    }

    rng = np.random.default_rng(0)
    imgs = [
        Image.fromarray(rng.integers(0, 255, (1080, 1440, 3), dtype=np.uint8))
        for _ in range(16)
    ]

    def run(speculative):
        eng = ContinuousBatchingEngine(
            model, n_slots=16, slot_len=1024, chunk=8, pipeline_depth=2,
            speculative=speculative,
        )
        eng.submit_many(imgs, max_tokens=900)
        for _ in range(3):  # warm/compile
            eng.step()
        start = sum(len(s.tokens) for s in eng.slots)
        t0 = time.perf_counter()
        for _ in range(20):
            eng.step()
        jax.block_until_ready(eng.cur)
        dt = time.perf_counter() - t0
        tokens = sum(len(s.tokens) for s in eng.slots) - start
        tag = f"spec k={speculative}" if speculative else "plain"
        print(f"{tag}: {tokens} tokens in {dt:.2f}s -> "
              f"{tokens/dt:.0f} tok/s aggregate", flush=True)
        model._kv_pool.clear()
        return tokens / dt

    plain = run(0)
    spec = run(8)
    print(f"speedup: {spec/plain:.2f}x (upper bound: random weights repeat)")


if __name__ == "__main__":
    main()
