"""Re-fit the decode fixed-work floor AFTER the sample_dims landing, and
re-A/B cache dtypes at the flagship.

The 372 us intercept (exp_decode_ceiling.py, BASELINE.md round 4) included
the 12-stream sampling; sample_dims removed 8 discarded filters and the
measured step dropped 528 -> 493 us. Two questions:
1. What is the NEW intercept? (bench.py's fixed_work_floor_us constant)
2. fp32 reads at cap 256 take ~349 us at achievable BW. If the new fixed
   work sits below that, the reads become the binding term and bf16/int8
   prefixes — previously "no change at flagship" because reads were fully
   hidden under fixed work — may now pay. Re-A/B them.

Run (tmux): python scripts/exp_decode_ceiling2.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

BATCH = 512
SEQS = (128, 256, 384, 512, 768)
KV = 64
LAYERS = 4
HBM_GBPS = 819.0
ACHIEVABLE_GBPS = 770.0
SAMPLE_DIMS = (3, 5, 10, 11)


def measure(seq, cache_dtype="fp32", repeats=3):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import build_flagship
    from scoreperformer_tpu.models.wrappers import mixedlm_unmask

    dt = {"fp32": jnp.float32, "bf16": jnp.bfloat16, "int8": jnp.int8}[cache_dtype]
    model, variables, data = build_flagship(BATCH, seq)

    @jax.jit
    def unmask(variables, rng, tokens, masked, style, context):
        return mixedlm_unmask(
            model, variables, tokens, masked, rng=rng,
            style_embeddings=style, context=context,
            greedy=False, temperature=1.0, sample_dims=SAMPLE_DIMS,
            cache_dtype=dt,
        )

    def dispatch(s):
        return unmask(variables, jax.random.PRNGKey(s), data["tokens"],
                      data["masked"], data["style"], data["context"])

    def fetch(out):
        return float(np.asarray(out[0, -1, 0]))

    t0 = time.perf_counter()
    fetch(dispatch(0))
    print(f"  seq {seq} {cache_dtype}: compile {time.perf_counter() - t0:.0f}s",
          flush=True)
    done = dispatch(1)
    fetch(done)
    t0 = time.perf_counter()
    for _ in range(3):
        fetch(done)
    rtt = (time.perf_counter() - t0) / 3
    K = 3
    times = []
    for i in range(repeats):
        t0 = time.perf_counter()
        outs = [dispatch(10 + i * K + j) for j in range(K)]
        fetch(outs[-1])
        times.append((time.perf_counter() - t0 - rtt) / K)
    best = min(times)
    per_step = best / (seq - 1)
    print(f"  seq {seq} {cache_dtype}: {per_step * 1e6:.0f} us/step, "
          f"{BATCH * (seq - 1) / best:,.0f} tok/s", flush=True)
    return per_step


def main():
    import jax
    import numpy as np

    from scoreperformer_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    steps = {}
    for seq in SEQS:
        steps[seq] = measure(seq)

    caps = np.asarray(SEQS, float)
    y = np.asarray([steps[s] for s in SEQS])
    slope, intercept = np.polyfit(caps, y, 1)
    bytes_per_cap = 2 * LAYERS * BATCH * KV * 4
    implied_gbps = bytes_per_cap / slope / 1e9
    print(f"\nfit: step(cap) = {intercept * 1e6:.0f} us + "
          f"{slope * 1e9:.1f} ns/cap-row (implied {implied_gbps:.0f} GB/s "
          f"on incremental reads; achievable ~{ACHIEVABLE_GBPS:.0f})",
          flush=True)
    reads_256 = bytes_per_cap * 256 / ACHIEVABLE_GBPS / 1e9
    print(f"cap-256 fp32 reads at achievable BW: {reads_256 * 1e6:.0f} us vs "
          f"new fixed {intercept * 1e6:.0f} us -> "
          f"{'READS BINDING' if reads_256 > intercept else 'fixed work still binding'}",
          flush=True)

    # cache-dtype A/B at the flagship, sample_dims on
    print("\ncache-dtype A/B at cap 256 (sample_dims on):", flush=True)
    for cd in ("bf16", "int8"):
        s = measure(256, cache_dtype=cd)
        print(f"  {cd}: {s / steps[256]:.3f}x of fp32 step "
              f"({(steps[256] / s - 1) * 100:+.1f}% tok/s)", flush=True)


if __name__ == "__main__":
    main()
