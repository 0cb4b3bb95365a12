"""A/B the unrolled-outer-chunk-loop decode (flagship mixedlm_unmask, b512).

The round-3 decode profile attributes ~104 us/step of the 531 us step to the
8 per-chunk dynamic_update_slice prefix merges — defensive copies of the
33.5 MB carried buffers forced by the outer lax.scan. `unrolled_chunks=True`
replaces the outer scan with a Python loop in the same jit (NO prefix
slicing — that is what sank the static_prefix variant), so the merges become
straight-line dus that XLA can apply in place.

Run on TPU: timeout 3000 python scripts/exp_unrolled_chunks.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")


def measure(label, unrolled, batch=512, seq=256, repeats=4):
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
            unrolled_chunks=unrolled,
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

    for flag in (False, True, False, True):
        print(f"unrolled_chunks={flag}", flush=True)
        measure(f"decode unrolled_chunks={flag}", flag)


if __name__ == "__main__":
    main()
