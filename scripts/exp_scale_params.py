"""Param precision x cache precision at the scale decode regime.

The scale decode matrix (exp_scale_decode.py) varied only CACHE dtype; but a
sequential decode step also re-reads the decoder weights every step — at
dim 1024 / depth 8 that is hundreds of MB/step of fp32 weight traffic, the
same order as the prefix reads the int8 caches just cut. This measures
bf16-cast params (halved weight reads; MXU computes bf16 natively) against
fp32 params at the scale regime, with the best-known cache setting.

The flagship-regime result (round 2) was +1.4% — overhead-bound there. The
regime question is whether weight reads sit on the critical path at scale.

Run on TPU: timeout 5400 python scripts/exp_scale_params.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

DIM, DEPTH_DEC, HEADS, DIM_HEAD = 1024, 8, 8, 128
BATCH, SEQ = 256, 512


def measure(label, params_dtype, cache_dtype, repeats=3):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import build_flagship
    from scoreperformer_tpu.models.wrappers import mixedlm_unmask

    model, variables, data = build_flagship(
        BATCH, SEQ, dim=DIM, emb_dim=256, depth=DEPTH_DEC, heads=HEADS,
        dim_head=DIM_HEAD,
    )
    cdtype = {"fp32": jnp.float32, "bf16": jnp.bfloat16, "int8": jnp.int8}[cache_dtype]
    if params_dtype == "bf16":
        variables = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if isinstance(x, jnp.ndarray) and x.dtype == jnp.float32
            else x,
            variables,
        )

    @jax.jit
    def unmask(variables, rng, tokens, masked, style, context):
        return mixedlm_unmask(
            model, variables, tokens, masked, rng=rng,
            style_embeddings=style, context=context,
            greedy=False, temperature=1.0,
            cache_dtype=cdtype, chunk_size=16,
        )

    def run(seed):
        out = unmask(variables, jax.random.PRNGKey(seed), data["tokens"],
                     data["masked"], data["style"], data["context"])
        return jax.block_until_ready(out)

    t0 = time.perf_counter()
    out = run(0)
    print(f"  compile {time.perf_counter() - t0:.0f}s", flush=True)
    changed = int(np.sum(np.array(out) != np.array(data["tokens"])))
    assert changed > 0, "decode was a no-op"
    times = []
    for i in range(repeats):
        t0 = time.perf_counter()
        run(i + 1)
        times.append(time.perf_counter() - t0)
    best = min(times)
    toks = BATCH * (SEQ - 1) / best
    print(f"RESULT {label}: {best:.3f} s  {toks:,.0f} tok/s  "
          f"({best / (SEQ - 1) * 1e6:,.0f} us/step)", flush=True)


def main():
    import jax

    from scoreperformer_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    print(f"scale params x cache: dim {DIM}, dec depth {DEPTH_DEC}, "
          f"batch {BATCH}, seq {SEQ}", flush=True)
    for params_dtype, cache_dtype in (
        ("fp32", "int8"), ("bf16", "int8"), ("fp32", "int8"), ("bf16", "int8"),
        ("bf16", "bf16"), ("fp32", "fp32"),
    ):
        print(f"params={params_dtype} cache={cache_dtype} C=16", flush=True)
        measure(
            f"decode params={params_dtype} cache={cache_dtype} C=16",
            params_dtype, cache_dtype,
        )


if __name__ == "__main__":
    main()
