"""Decode at SCALE: cache dtype x chunk size at dim 1024 (226M params).

At the flagship size (dim 256, kv 64, 268 MB of caches) bf16 caches measured
negative three times — the convert/cast overhead outweighed the halved reads
(BASELINE.md: "stop retrying below ~1 GB caches"). This measures the decode
matrix in the >= 1 GB regime the rule points at: dim 1024 / dec depth 8 /
heads 8 / dim_head 128 (the exp_scale.py train config), seq 512, batch 256 ->
16 cache buffers of 67 MB = 1.07 GB fp32, ~1.3 ms/step of prefix reads at
speed-of-light — reads should dominate the step here, so bf16 caches and
larger chunks (fewer merges of bigger buffers) get their legitimate retry.

Run on TPU: timeout 5400 python scripts/exp_scale_decode.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

DIM, DEPTH_DEC, HEADS, DIM_HEAD = 1024, 8, 8, 128
BATCH, SEQ = 256, 512


def measure(label, cache_dtype, chunk, repeats=3):
    import jax
    import jax.numpy as jnp

    from bench import build_flagship
    from scoreperformer_tpu.models.wrappers import mixedlm_unmask

    model, variables, data = build_flagship(
        BATCH, SEQ, dim=DIM, emb_dim=256, depth=DEPTH_DEC, heads=HEADS,
        dim_head=DIM_HEAD,
    )
    dtype = {"fp32": jnp.float32, "bf16": jnp.bfloat16, "int8": jnp.int8}[cache_dtype]

    # params go in as a jit ARGUMENT: closing over them embeds 226M fp32
    # constants in the serialized module, which the remote-compile helper
    # rejects with HTTP 413 (fine at the 11.6M flagship, not here)
    @jax.jit
    def unmask(variables, rng, tokens, masked, style, context):
        return mixedlm_unmask(
            model, variables, tokens, masked, rng=rng,
            style_embeddings=style, context=context,
            greedy=False, temperature=1.0,
            cache_dtype=dtype, chunk_size=chunk,
        )

    def run(seed):
        out = unmask(variables, jax.random.PRNGKey(seed), data["tokens"],
                     data["masked"], data["style"], data["context"])
        return jax.block_until_ready(out)

    t0 = time.perf_counter()
    out = run(0)
    print(f"  compile {time.perf_counter() - t0:.0f}s", flush=True)
    # sanity: the decode actually filled the masked positions. ALSO load-
    # bearing for the timing: on the tunneled axon platform,
    # block_until_ready on this program's output returned immediately
    # (1 us/step "walls") until the first np.array() host fetch; fetching
    # run(0)'s result once makes the per-rep block_until_ready calls below
    # behave. Keep this fetch before any timed rep.
    import numpy as np
    changed = int(np.sum(np.array(out) != np.array(data["tokens"])))
    assert changed > 0, "decode was a no-op"
    times = []
    for i in range(repeats):
        t0 = time.perf_counter()
        run(i + 1)
        times.append(time.perf_counter() - t0)
    best = min(times)
    toks = BATCH * (SEQ - 1) / best
    print(f"RESULT {label}: {best:.3f} s  {toks:,.0f} tok/s  "
          f"({best / (SEQ - 1) * 1e6:,.0f} us/step)", flush=True)


def main():
    import jax

    from scoreperformer_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    print(f"scale decode: dim {DIM}, dec depth {DEPTH_DEC}, heads {HEADS}, "
          f"dim_head {DIM_HEAD}, batch {BATCH}, seq {SEQ} "
          f"(cache bytes fp32 = {SEQ * BATCH * DIM_HEAD * 4 * 2 * DEPTH_DEC / 1e9:.2f} GB)",
          flush=True)
    import sys as _sys
    matrix = (
        ("fp32", 16), ("bf16", 16), ("bf16", 32), ("fp32", 32), ("fp32", 16),
        ("bf16", 16),
    )
    if "--int8" in _sys.argv:
        # int8 A/B vs the measured bf16 winner (alternated for drift control)
        matrix = (
            ("bf16", 16), ("int8", 16), ("int8", 32), ("bf16", 16),
            ("int8", 16),
        )
    for cache_dtype, chunk in matrix:
        print(f"cache={cache_dtype} C={chunk}", flush=True)
        measure(f"decode cache={cache_dtype} C={chunk}", cache_dtype, chunk)


if __name__ == "__main__":
    main()
