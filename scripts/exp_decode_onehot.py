"""A/B: decode-step fused-table embedding lookup formulation (VERDICT r4 #1a).

The post-sample_dims decode trace (BASELINE.md round 4) names a
`convolution_bitcast_fusion` at 23 us/step (4.7%) attributed to the
embedding lookup: at decode seq_len == 1 the code takes the `jnp.take`
path, which XLA lowers to a one-hot convolution on TPU at small row
counts. Candidates measured here at decode shapes (b512/seq256, sampled
+ greedy, sample_dims wired as in bench):

  take    — current program (gather from the fused table)
  onehot  — explicit one-hot @ table contraction (ONEHOT_LOOKUP_MIN_SEQ=1)

Amortized methodology (BASELINE.md round 4): K back-to-back dispatches,
one scalar fetch, fetch RTT subtracted.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

from scoreperformer_tpu.utils.cache import enable_compile_cache
enable_compile_cache()

import numpy as np

from bench import build_flagship
from scoreperformer_tpu.models import embeddings as emb_mod
from scoreperformer_tpu.models.wrappers import mixedlm_unmask

MASKED_DIMS = (3, 5, 10, 11)


def measure(model, variables, data, greedy, repeats=3, K=3):
    sample_dims = None if greedy else MASKED_DIMS

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

    variants = (
        ("take", 2, None),
        ("onehot", 1, None),
        ("onehot_hi", 2, jax.lax.Precision.HIGHEST),
    )
    for greedy in (True, False):
        results = {}
        outs = {}
        for name, min_seq, prec in variants:
            emb_mod.ONEHOT_LOOKUP_MIN_SEQ = min_seq
            emb_mod.ONEHOT_DECODE_PRECISION = prec
            w, out = measure(model, variables, data, greedy)
            results[name] = w
            outs[name] = np.asarray(out)
            print(
                f"greedy={greedy} {name}: {w*1e6:.0f} us/run "
                f"({tokens_decoded/w/1e3:.0f}k tok/s)",
                flush=True,
            )
        for name in ("onehot", "onehot_hi"):
            agree = float((outs["take"] == outs[name]).mean())
            print(
                f"greedy={greedy}: {name}/take speedup "
                f"{results['take']/results[name]:.3f}x  agreement {agree:.6f}",
                flush=True,
            )
    emb_mod.ONEHOT_LOOKUP_MIN_SEQ = 2
    emb_mod.ONEHOT_DECODE_PRECISION = jax.lax.Precision.HIGHEST


if __name__ == "__main__":
    main()
