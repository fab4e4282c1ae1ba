"""On-chip parity check: speculative greedy decode (span verify through
the stacked-cache Pallas kernels) vs the plain fused greedy loop, on the
0.5B config with random weights. CPU tests can't reach the TPU kernel
dispatch, so this drives it on the real chip. Diagnostic."""

import sys

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import numpy as np
    from PIL import Image

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from moondream_tpu.config import MOONDREAM_05B
    from moondream_tpu.models.moondream import MoondreamModel
    from moondream_tpu.tokenizer import ByteTokenizer

    model = MoondreamModel(MOONDREAM_05B, tokenizer=ByteTokenizer(), seed=0)
    rng = np.random.default_rng(0)
    fails = 0
    for seed in range(3):
        img = Image.fromarray(
            rng.integers(0, 255, size=(480, 640, 3), dtype=np.uint8)
        )
        enc = model.encode_image(img)
        plain = {"temperature": 0.0, "top_p": 0.0, "max_tokens": 48}
        for q in ("What is this?", "Describe the scene."):
            a0 = model.query(image=enc, question=q, settings=plain)["answer"]
            a1 = model.query(
                image=enc, question=q, settings={**plain, "speculative": 8}
            )["answer"]
            ok = a0 == a1
            fails += not ok
            print(f"seed={seed} q={q!r}: {'OK' if ok else 'MISMATCH'}"
                  + ("" if ok else f"\n  plain={a0!r}\n  spec ={a1!r}"),
                  flush=True)
        # streaming spec path too
        a2 = "".join(
            model.query(
                image=enc, question="What is this?", stream=True,
                settings={**plain, "speculative": 8},
            )["answer"]
        )
        a0 = model.query(
            image=enc, question="What is this?", settings=plain
        )["answer"]
        ok = a0 == a2
        fails += not ok
        print(f"seed={seed} streaming: {'OK' if ok else 'MISMATCH'}", flush=True)
    print(f"{'PASS' if fails == 0 else 'FAIL'} ({fails} mismatches)")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
