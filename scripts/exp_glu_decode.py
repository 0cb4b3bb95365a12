"""Check GLU_TWO_DOT on the DECODE path (flagship mixedlm_unmask, batch 512).

The two-dot projection won +6.5% on the train step; the decode scan runs the
same FF per step with n=1-per-chunk shapes, where two half-width matmuls
could plausibly cost more dispatch than one. Measure before keeping the flag
global.

Run on TPU: timeout 3000 python scripts/exp_glu_decode.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")


def measure(label, batch=512, seq=256, repeats=3):
    import jax

    from bench import build_flagship
    from scoreperformer_tpu.models.wrappers import mixedlm_unmask

    model, variables, data = build_flagship(batch, seq)

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

    t0 = time.perf_counter()
    run(0)
    print(f"  compile {time.perf_counter() - t0:.0f}s", flush=True)
    times = []
    for i in range(repeats):
        t0 = time.perf_counter()
        run(i + 1)
        times.append(time.perf_counter() - t0)
    best = min(times)
    toks = batch * (seq - 1) / best
    print(f"RESULT {label}: {best:.3f} s  {toks:,.0f} tok/s", flush=True)


def main():
    import jax

    from scoreperformer_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    from scoreperformer_tpu.models import layers as L

    for flag in (True, False, True):
        L.GLU_TWO_DOT = flag
        print(f"GLU_TWO_DOT={flag}", flush=True)
        measure(f"decode glu_two_dot={flag}")


if __name__ == "__main__":
    main()
