"""TPU A/B: top-k threshold computation method in the decode sampling path.

The round-3 decode profile (scripts/profile_chunked_decode.py) showed the 5
per-stream `top_k` filters account for ~16% of the chunked decode step: on
TPU `jax.lax.top_k` lowers to a full variadic sort that carries an s32 iota
payload for indices the filter discards. Variants:
  lax    — legacy lax.top_k (control)
  sort   — values-only jnp.sort (EXACT, half the sort traffic)
  approx — lax.approx_max_k (TPU-native, ~0.95 recall, NOT exact)

Run: timeout 3000 python scripts/exp_topk_method.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

from scoreperformer_tpu.utils.cache import enable_compile_cache
enable_compile_cache()

from bench import build_flagship  # noqa: E402
from scoreperformer_tpu.models.wrappers import mixedlm_unmask  # noqa: E402
from scoreperformer_tpu.ops import sampling  # noqa: E402

BATCH, SEQ, REPEATS = 512, 256, 3


def measure(method):
    sampling.TOPK_METHOD = method
    model, variables, data = build_flagship(BATCH, SEQ)

    @jax.jit
    def unmask(rng, tokens, masked, style, context):
        return mixedlm_unmask(
            model, variables, tokens, masked, rng=rng,
            style_embeddings=style, context=context,
            greedy=False, temperature=1.0,
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
    print(f"topk[{method}]: {toks:,.0f} tok/s  best {best*1e3:.1f} ms  "
          f"({best/(SEQ-1)*1e6:.0f} us/step)  compile {compile_s:.0f}s",
          flush=True)
    return toks


if __name__ == "__main__":
    for method in ("lax", "sort", "approx", "sort", "lax"):
        measure(method)
