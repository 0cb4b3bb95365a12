"""TPU sampling follow-ups after the top-k method A/B (round 3).

approx_max_k at recall_target=0.95 measured +14% decode throughput over
lax.top_k but is inexact. Questions: is recall_target=1.0 exact, and if so
does it keep any of the speed? (Also re-confirms the fp32 C=16 control
after the write_kv-merge revert.)

Run: timeout 3000 python scripts/exp_post_merge.py
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

BATCH, SEQ, REPEATS = 512, 256, 5


def measure(tag, **kw):
    model, variables, data = build_flagship(BATCH, SEQ)

    @jax.jit
    def unmask(rng, tokens, masked, style, context):
        return mixedlm_unmask(model, variables, tokens, masked, rng=rng,
                              style_embeddings=style, context=context,
                              greedy=False, temperature=1.0, **kw)

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
    print(f"{tag}: {BATCH*(SEQ-1)/best:,.0f} tok/s  best {best*1e3:.1f} ms  "
          f"({best/(SEQ-1)*1e6:.0f} us/step)  compile {compile_s:.0f}s",
          flush=True)


def approx_recall1_exactness():
    import numpy as np
    r = np.random.RandomState(0)
    ok = True
    for V, k in ((260, 26), (132, 14), (128, 13)):
        lg = jnp.asarray(r.randn(512, V).astype(np.float32))
        exact = jax.lax.top_k(lg, k)[0][:, -1]
        ap = jax.lax.approx_max_k(lg, k, recall_target=1.0,
                                  aggregate_to_topk=True)[0][:, -1]
        same = bool(jnp.array_equal(exact, ap))
        print(f"approx(recall=1.0) exact for V={V} k={k}: {same}", flush=True)
        ok &= same
    return ok


if __name__ == "__main__":
    measure("fp32 C=16 (control, dus merge)")
    approx_recall1_exactness()
    measure("topk approx r=1.0", filter_kwargs={"method": "approx", "recall": 1.0})
    measure("topk approx r=0.95", filter_kwargs={"method": "approx"})
