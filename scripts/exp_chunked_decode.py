"""TPU A/B: classic scan decode vs chunked-carry decode (VERDICT r2 #3).

Measures flagship MixedLM unmask throughput (batch 512, seq 256) for the
classic single-scan path and the chunked two-level scan at several chunk
sizes, plus a bf16-KV retry in the chunked regime (the round-2 bf16-KV
negative result was measured in the copy-dominated regime; chunking changes
the bottleneck to attend reads, which bf16 halves).

Run: timeout 3000 python scripts/exp_chunked_decode.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from scoreperformer_tpu.utils.cache import enable_compile_cache
enable_compile_cache()

from bench import build_flagship  # noqa: E402
from scoreperformer_tpu.models.wrappers import mixedlm_unmask  # noqa: E402

BATCH, SEQ, REPEATS = 512, 256, 3


def measure(tag, chunk_size=None, cache_dtype=jnp.float32):
    model, variables, data = build_flagship(BATCH, SEQ)

    @jax.jit
    def unmask(rng, tokens, masked, style, context):
        return mixedlm_unmask(
            model, variables, tokens, masked, rng=rng,
            style_embeddings=style, context=context,
            greedy=False, temperature=1.0,
            chunk_size=chunk_size, cache_dtype=cache_dtype,
        )

    def run(seed):
        out = unmask(jax.random.PRNGKey(seed), data["tokens"], data["masked"],
                     data["style"], data["context"])
        jax.block_until_ready(out)
        return out

    t0 = time.perf_counter()
    run(0)
    compile_s = time.perf_counter() - t0
    times = []
    for i in range(REPEATS):
        t0 = time.perf_counter()
        run(i + 1)
        times.append(time.perf_counter() - t0)
    best = min(times)
    toks = BATCH * (SEQ - 1) / best
    print(f"{tag}: {toks:,.0f} tok/s  best {best*1e3:.1f} ms  "
          f"({best/(SEQ-1)*1e6:.0f} us/step)  compile {compile_s:.0f}s",
          flush=True)
    return toks


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    base = measure("classic fp32")
    for C in (16, 32, 64):
        t = measure(f"chunked C={C} fp32", chunk_size=C)
        print(f"  -> vs classic: {t / base:.2f}x", flush=True)
    t = measure("chunked C=32 bf16-kv", chunk_size=32, cache_dtype=jnp.bfloat16)
    print(f"  -> vs classic: {t / base:.2f}x", flush=True)
