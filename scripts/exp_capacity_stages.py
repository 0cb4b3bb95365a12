"""A/B the staged-capacity chunked decode (flagship mixedlm_unmask, b512).

The chunked decode's per-step prefix attend reads the FULL cache capacity
masked (268 MB/step fp32 at the flagship config — the largest structural
term in the step budget), and each per-chunk merge defensively copies the
full-capacity carried prefix. `capacity_stages=G` splits the outer scan
into G sequential scans whose prefix buffers only span the rows written so
far: average read/copy factor (G+1)/2G (G=2 -> 0.75, G=4 -> 0.625) while
keeping the dynamic scan's cross-chunk pipelining within each stage —
unlike static_prefix (per-chunk slices, unrolled, measured -10%) and
unrolled_chunks (measured -26%).

Run on TPU: timeout 3000 python scripts/exp_capacity_stages.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")


def measure(label, stages, batch=512, seq=256, repeats=4):
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
            capacity_stages=stages,
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

    for stages in (1, 2, 4, 1, 2, 4):
        print(f"capacity_stages={stages}", flush=True)
        measure(f"decode capacity_stages={stages}", stages)


if __name__ == "__main__":
    main()
