"""A/B: restrict decode filter+sample to the masked streams (sample_dims).

The compiled unmask step runs one top-k + one categorical per stream (12 at
the flagship — HLO-verified, scripts/exp_sort_stream.py) while the fill
select keeps only the 4 masked perf streams' samples. sample_dims skips the
8 discarded filters (incl. the widest, Bar at 260) with bit-parity
(tests/test_models.py::TestWrappers::test_mixedlm_unmask_sample_dims_bit_parity).

Amortized methodology (BASELINE.md round 4): K back-to-back dispatches, one
scalar fetch, fetch RTT subtracted.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

from scoreperformer_tpu.utils.cache import enable_compile_cache
enable_compile_cache()

import numpy as np

from bench import build_flagship
from scoreperformer_tpu.models.wrappers import mixedlm_unmask

MASKED_DIMS = (3, 5, 10, 11)


def measure(model, variables, data, sample_dims, greedy, repeats=3, K=3):
    import jax.numpy as jnp

    @jax.jit
    def unmask(rng, tokens, masked, style, context):
        return mixedlm_unmask(
            model, variables, tokens, masked, rng=rng,
            style_embeddings=style, context=context,
            greedy=greedy, temperature=1.0, sample_dims=sample_dims,
        )

    def dispatch(seed):
        return unmask(jax.random.PRNGKey(seed), data["tokens"], data["masked"],
                      data["style"], data["context"])

    def fetch(out):
        return float(np.asarray(out[0, -1, 0]))

    out0 = dispatch(0)
    fetch(out0)
    done = dispatch(1)
    fetch(done)
    t0 = time.perf_counter()
    for _ in range(3):
        fetch(done)
    rtt = (time.perf_counter() - t0) / 3
    times = []
    for i in range(repeats):
        t0 = time.perf_counter()
        outs = [dispatch(10 + i * K + j) for j in range(K)]
        fetch(outs[-1])
        times.append((time.perf_counter() - t0 - rtt) / K)
    return min(times), out0


def main():
    batch, seq = 512, 256
    model, variables, data = build_flagship(batch, seq)
    tokens_decoded = batch * (seq - 1)

    for greedy in (True, False):
        w_full, out_full = measure(model, variables, data, None, greedy)
        w_slim, out_slim = measure(model, variables, data, MASKED_DIMS, greedy)
        agree = float((np.asarray(out_full) == np.asarray(out_slim)).mean())
        print(
            f"greedy={greedy}: full {w_full*1e6:.0f} us/run "
            f"({tokens_decoded/w_full/1e3:.0f}k tok/s)  "
            f"sample_dims {w_slim*1e6:.0f} us ({tokens_decoded/w_slim/1e3:.0f}k tok/s)  "
            f"speedup {w_full/w_slim:.3f}x  seed-0 agreement {agree:.6f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
