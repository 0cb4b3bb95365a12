"""Decode speed-of-light ceiling: decompose the step into traffic + fixed work.

BENCH r3/r4 report kv_traffic_vs_hbm_peak ~= 0.51-0.52: the per-step prefix
KV reads (8 x cap x b x 64 x 4B) move at ~52% of v5e HBM peak if one assumes
the WHOLE step is cache reads. This experiment tests that assumption by
sweeping the cache capacity (seq length) at fixed batch: per-step time is
modeled as

    step(cap) = intercept + slope * cap

- `slope` prices ONLY the capacity-proportional work (the prefix attend
  reads + dots). Comparing the implied GB/s of the incremental reads against
  the 819 GB/s peak says whether the attend itself is at speed-of-light.
- `intercept` is the capacity-independent mandatory work: embedding + QKV +
  FF + head matmuls, AdaLN, 5-stream top-k sampling, fresh-KV bookkeeping,
  scan/dispatch overhead. None of it is cache traffic, so it bounds
  kv_traffic_vs_hbm_peak away from 1.0 no matter how fast the reads are.

Ceiling estimate: traffic_time(cap=256) / (traffic_time + intercept), i.e.
the best achievable kv_traffic_vs_hbm_peak on this chip for THIS model
(12 embedding streams, 5 sampled with exact top-k) if the reads hit peak.

Run on TPU:  timeout 4000 python scripts/exp_decode_ceiling.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

BATCH = 512
SEQS = (128, 256, 384, 512, 768)
KV = 64  # one kv head, dim_head 64
LAYERS = 4
HBM_GBPS = 819.0


def measure(seq, repeats=3):
    import jax

    from bench import build_flagship
    from scoreperformer_tpu.models.wrappers import mixedlm_unmask

    model, variables, data = build_flagship(BATCH, seq)

    @jax.jit
    def unmask(variables, rng, tokens, masked, style, context):
        return mixedlm_unmask(
            model, variables, tokens, masked, rng=rng,
            style_embeddings=style, context=context,
            greedy=False, temperature=1.0,
        )

    import numpy as np

    def dispatch(s):
        return unmask(variables, jax.random.PRNGKey(s), data["tokens"],
                      data["masked"], data["style"], data["context"])

    def fetch(out):
        # tunnel gotcha (exp_scale_decode.py): block_until_ready is
        # unreliable through the remote transport — force completion with a
        # scalar host fetch
        return float(np.asarray(out[0, -1, 0]))

    t0 = time.perf_counter()
    fetch(dispatch(0))
    print(f"  seq {seq}: compile {time.perf_counter() - t0:.0f}s", flush=True)

    # fetch round-trip on an already-computed buffer: subtracted from walls
    done = dispatch(1)
    fetch(done)
    t0 = time.perf_counter()
    for _ in range(3):
        fetch(done)
    rtt = (time.perf_counter() - t0) / 3

    # K back-to-back dispatches amortize queueing; ONE final fetch syncs
    K = 3
    times = []
    for i in range(repeats):
        t0 = time.perf_counter()
        outs = [dispatch(10 + i * K + j) for j in range(K)]
        fetch(outs[-1])
        times.append((time.perf_counter() - t0 - rtt) / K)
    best = min(times)
    per_step = best / (seq - 1)
    tps = BATCH * (seq - 1) / best
    print(f"  seq {seq}: rtt {rtt * 1e3:.0f} ms, {best:.3f} s/run, "
          f"{per_step * 1e6:.0f} us/step, {tps:,.0f} tok/s", flush=True)
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

    # bytes per step per unit capacity: 8 buffers x batch x kv x 4B
    bytes_per_cap = 2 * LAYERS * BATCH * KV * 4
    implied_gbps = bytes_per_cap / slope / 1e9
    print(f"\nfit: step(cap) = {intercept * 1e6:.0f} us + "
          f"{slope * 1e9:.1f} ns/cap-row", flush=True)
    print(f"capacity-proportional reads: {bytes_per_cap / 1e6:.2f} MB per cap "
          f"row -> implied {implied_gbps:.0f} GB/s vs {HBM_GBPS:.0f} peak "
          f"({implied_gbps / HBM_GBPS * 100:.0f}% of HBM SoL on the "
          f"incremental traffic)", flush=True)

    cap = 256.0
    traffic_sol = bytes_per_cap * cap / HBM_GBPS / 1e9  # s, at peak BW
    traffic_meas = slope * cap
    ceiling = traffic_sol / (traffic_sol + intercept)
    achieved = traffic_sol / steps[256]
    print(f"\nat cap=256: measured step {steps[256] * 1e6:.0f} us = "
          f"{traffic_meas * 1e6:.0f} us capacity-scaled + "
          f"{intercept * 1e6:.0f} us fixed", flush=True)
    print(f"pure-traffic time at peak BW: {traffic_sol * 1e6:.0f} us", flush=True)
    print(f"kv_traffic_vs_hbm_peak achieved: {achieved:.3f}; ceiling with "
          f"reads at peak and fixed work unchanged: {ceiling:.3f}", flush=True)


if __name__ == "__main__":
    main()
