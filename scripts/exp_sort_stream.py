"""Identify the decode-step stream whose top-k lowers to a sort (the last
>=4% profile item, BASELINE.md round 4) and A/B alternatives for it.

Round-4 profile: one residual `sort` ~21us/step. All five sampled streams use
approx_max_k(recall=1.0); if one lowers to a sort anyway, its (k, n) must hit
a degenerate PartialReduce case. This script dumps the optimized HLO of the
jitted unmask program and lists every sort/partial-reduce op with shapes.
"""
import sys

sys.path.insert(0, "/root/repo")

import jax

from scoreperformer_tpu.utils.cache import enable_compile_cache
enable_compile_cache()

from bench import build_flagship
from scoreperformer_tpu.models.wrappers import mixedlm_unmask


def main():
    batch, seq = 512, 256
    model, variables, data = build_flagship(batch, seq)

    def unmask(rng, tokens, masked, style, context):
        return mixedlm_unmask(
            model, variables, tokens, masked, rng=rng,
            style_embeddings=style, context=context,
            greedy=False, temperature=1.0,
        )

    lowered = jax.jit(unmask).lower(
        jax.random.PRNGKey(0),
        data["tokens"], data["masked"], data["style"], data["context"],
    )
    compiled = lowered.compile()
    txt = compiled.as_text()
    print("=== ops of interest (sort / PartialReduce / approx) ===", flush=True)
    for line in txt.splitlines():
        s = line.strip()
        if s.startswith("%") or "= " not in s:
            pass
        low = s.lower()
        if ("sort(" in low or "partialreduce" in low or "approx" in low
                or "top-k" in low or "topk" in low):
            print(s[:240], flush=True)


if __name__ == "__main__":
    main()
