"""int8 KV caches at FLAGSHIP size (dim 256, 268 MB of caches) — A/B record.

The scale-regime matrix (exp_scale_decode.py --int8) measured int8 +27% over
fp32 at >= 1 GB of caches. The standing rule says small caches are
convert/cast-bound (three bf16 negatives); this measures where int8 sits at
the flagship size so the precision ladder is recorded at both regimes.

Run on TPU: timeout 3000 python scripts/exp_int8_flagship.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

BATCH, SEQ = 512, 256


def measure(label, cache_dtype, repeats=3):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import build_flagship
    from scoreperformer_tpu.models.wrappers import mixedlm_unmask

    model, variables, data = build_flagship(BATCH, SEQ)
    dtype = {"fp32": jnp.float32, "int8": jnp.int8}[cache_dtype]

    @jax.jit
    def unmask(variables, rng, tokens, masked, style, context):
        return mixedlm_unmask(
            model, variables, tokens, masked, rng=rng,
            style_embeddings=style, context=context,
            greedy=False, temperature=1.0,
            cache_dtype=dtype, chunk_size=16,
        )

    def run(seed):
        out = unmask(variables, jax.random.PRNGKey(seed), data["tokens"],
                     data["masked"], data["style"], data["context"])
        return jax.block_until_ready(out)

    t0 = time.perf_counter()
    out = run(0)
    print(f"  compile {time.perf_counter() - t0:.0f}s", flush=True)
    changed = int(np.sum(np.array(out) != np.array(data["tokens"])))
    assert changed > 0, "decode was a no-op"
    times = []
    for i in range(repeats):
        t0 = time.perf_counter()
        run(i + 1)
        times.append(time.perf_counter() - t0)
    best = min(times)
    print(f"RESULT {label}: {best:.3f} s  {BATCH * (SEQ - 1) / best:,.0f} tok/s",
          flush=True)


def main():
    import jax

    from scoreperformer_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    for cache_dtype in ("fp32", "int8", "fp32", "int8"):
        print(f"cache={cache_dtype} C=16", flush=True)
        measure(f"flagship decode cache={cache_dtype} C=16", cache_dtype)


if __name__ == "__main__":
    main()
