"""Interleaved A/B: decode embedding lookup take vs one-hot (sampled path).

Round-5 follow-up to exp_decode_onehot.py: the first two runs showed
+3.3%/+7.8% for the explicit one-hot contraction on the sampled path but
±5% run-to-run drift on this tunnel. Interleave A/B dispatch blocks to
cancel clock drift; report per-pair ratios.
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


def build_fn(model, variables, data, min_seq, prec):
    emb_mod.ONEHOT_LOOKUP_MIN_SEQ = min_seq
    emb_mod.ONEHOT_DECODE_PRECISION = prec

    @jax.jit
    def unmask(rng, tokens, masked, style, context):
        return mixedlm_unmask(
            model, variables, tokens, masked, rng=rng,
            style_embeddings=style, context=context,
            greedy=False, temperature=1.0, sample_dims=MASKED_DIMS,
        )

    def dispatch(seed):
        return unmask(jax.random.PRNGKey(seed), data["tokens"], data["masked"],
                      data["style"], data["context"])

    return dispatch


def main():
    batch, seq = 512, 256
    model, variables, data = build_flagship(batch, seq)
    tokens_decoded = batch * (seq - 1)

    take = build_fn(model, variables, data, 2, None)
    onehot = build_fn(model, variables, data, 1, None)

    def fetch(out):
        return float(np.asarray(out[0, -1, 0]))

    # warm both programs
    fetch(take(0)); fetch(onehot(0))
    done = take(1); fetch(done)
    t0 = time.perf_counter()
    for _ in range(3):
        fetch(done)
    rtt = (time.perf_counter() - t0) / 3

    K = 4
    pairs = []
    for i in range(6):
        t0 = time.perf_counter()
        outs = [take(100 + i * K + j) for j in range(K)]
        fetch(outs[-1])
        wa = (time.perf_counter() - t0 - rtt) / K
        t0 = time.perf_counter()
        outs = [onehot(100 + i * K + j) for j in range(K)]
        fetch(outs[-1])
        wb = (time.perf_counter() - t0 - rtt) / K
        pairs.append((wa, wb))
        print(
            f"pair {i}: take {wa*1e6:.0f} us ({tokens_decoded/wa/1e3:.0f}k) "
            f"onehot {wb*1e6:.0f} us ({tokens_decoded/wb/1e3:.0f}k) "
            f"ratio {wa/wb:.3f}",
            flush=True,
        )
    ratios = sorted(wa / wb for wa, wb in pairs)
    med = ratios[len(ratios) // 2]
    best_take = min(wa for wa, _ in pairs)
    best_oh = min(wb for _, wb in pairs)
    print(
        f"median speedup {med:.3f}x; best take {tokens_decoded/best_take/1e3:.0f}k "
        f"best onehot {tokens_decoded/best_oh/1e3:.0f}k tok/s",
        flush=True,
    )
    emb_mod.ONEHOT_LOOKUP_MIN_SEQ = 2
    emb_mod.ONEHOT_DECODE_PRECISION = None


if __name__ == "__main__":
    main()
