"""Batch x cache-dtype decode sweep on the CHUNKED-CARRY path.

Round-2's "batch 512 is the knee" (bench.py) was measured on the CLASSIC
scan, whose per-step defensive copies of the carried caches scale with
batch — larger batches regressed (1024 -> 237k, 2048 -> 218k tok/s).
The chunked-carry decode removed those copies (prefix is a loop-invariant
operand), so the batch scaling story needs re-measuring:

- per-step cache traffic is 2 x L x cap x b x kv x 4B, i.e. bytes per
  DECODED TOKEN = 8 x cap x 64 x dtype_B — independent of batch;
- per-step FIXED work (~372 us at b512, exp_decode_ceiling.py fit) is
  mostly per-op dispatch overhead and tiny matmuls, which grow slower
  than linearly with batch.

So throughput should rise with batch until the reads stop hiding under
the fixed work and the step goes bandwidth-bound; the fp32 asymptote at
the probed ~770 GB/s effective read BW is ~1.47M tok/s (524 KB/token),
bf16 ~2.9M, int8 ~5.9M (then fixed work binds again).

Run on TPU:  timeout 5400 python scripts/exp_batch_sweep.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

SEQ = 256
CONFIGS = [
    # (batch, cache_dtype)
    (512, "fp32"),
    (1024, "fp32"),
    (2048, "fp32"),
    (1024, "bf16"),
    (2048, "bf16"),
    (4096, "bf16"),
    (2048, "int8"),
    (4096, "int8"),
]


def measure(batch, dtype_name, repeats=3):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import build_flagship
    from scoreperformer_tpu.models.wrappers import mixedlm_unmask

    cache_dtype = {
        "fp32": jnp.float32, "bf16": jnp.bfloat16, "int8": jnp.int8,
    }[dtype_name]

    model, variables, data = build_flagship(batch, SEQ)

    @jax.jit
    def unmask(variables, rng, tokens, masked, style, context):
        return mixedlm_unmask(
            model, variables, tokens, masked, rng=rng,
            style_embeddings=style, context=context,
            greedy=False, temperature=1.0, cache_dtype=cache_dtype,
        )

    def dispatch(s):
        return unmask(variables, jax.random.PRNGKey(s), data["tokens"],
                      data["masked"], data["style"], data["context"])

    def fetch(out):
        return float(np.asarray(out[0, -1, 0]))

    t0 = time.perf_counter()
    fetch(dispatch(0))
    print(f"  b{batch} {dtype_name}: compile {time.perf_counter() - t0:.0f}s",
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
    per_step = best / (SEQ - 1)
    tps = batch * (SEQ - 1) / best
    print(f"  b{batch} {dtype_name}: {per_step * 1e6:.0f} us/step, "
          f"{tps:,.0f} tok/s", flush=True)
    return tps


def main():
    import jax

    from scoreperformer_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    results = {}
    for batch, dtype_name in CONFIGS:
        try:
            results[(batch, dtype_name)] = measure(batch, dtype_name)
        except Exception as e:  # OOM / compile failure: record and move on
            print(f"  b{batch} {dtype_name}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
            results[(batch, dtype_name)] = None

    print("\nsummary (tok/s):", flush=True)
    for (batch, dtype_name), tps in results.items():
        val = f"{tps:,.0f}" if tps else "failed"
        print(f"  b{batch:<5} {dtype_name:<5} {val}", flush=True)


if __name__ == "__main__":
    main()
