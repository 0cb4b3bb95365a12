"""int8 KV-cache greedy AGREEMENT at the deployed scale regime (VERDICT r3 #8).

int8 prefix caches are the serving recommendation at dim >= 1024 (measured
+27% over fp32 at >= 1 GB of caches, BASELINE.md round 3), but greedy
agreement vs fp32 was only validated at tiny test dims. This measures
token-level agreement fp32-vs-int8 (and bf16 for the ladder) at the
dim-1024 scale-decode config where int8 would actually be deployed.

Run on TPU:  timeout 4000 python scripts/exp_int8_scale_agreement.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

# the exp_scale_decode.py regime: dim 1024, dim_head 128, decoder depth 8,
# 1.07 GB of fp32 caches at batch 256 x seq 512
BATCH, SEQ = 256, 512
DIM, DEPTH_DEC, HEADS, DIM_HEAD = 1024, 8, 8, 128


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from scoreperformer_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    from bench import build_flagship
    from scoreperformer_tpu.models.wrappers import mixedlm_unmask

    t0 = time.time()
    model, variables, data = build_flagship(
        BATCH, SEQ, dim=DIM, emb_dim=256, depth=DEPTH_DEC, heads=HEADS,
        dim_head=DIM_HEAD,
    )
    print(f"build+init: {time.time() - t0:.0f}s", flush=True)

    def run(cache_dtype):
        @jax.jit
        def unmask(variables, tokens, masked, style, context):
            return mixedlm_unmask(
                model, variables, tokens, masked, rng=jax.random.PRNGKey(0),
                style_embeddings=style, context=context,
                greedy=True, cache_dtype=cache_dtype, chunk_size=16,
            )

        t0 = time.time()
        out = jax.block_until_ready(unmask(
            variables, data["tokens"], data["masked"],
            data["style"], data["context"],
        ))
        print(f"  {jnp.dtype(cache_dtype).name}: {time.time() - t0:.0f}s "
              f"(incl. compile)", flush=True)
        return np.asarray(out)

    out_fp32 = run(jnp.float32)
    out_int8 = run(jnp.int8)
    out_bf16 = run(jnp.bfloat16)

    filled = np.asarray(data["tokens"]) == 1
    n = int(filled.sum())
    for label, out in (("int8", out_int8), ("bf16", out_bf16)):
        agree = float((out[filled] == out_fp32[filled]).mean())
        diffs = int((out[filled] != out_fp32[filled]).sum())
        print(
            f"RESULT greedy agreement {label} vs fp32 @ dim {DIM} "
            f"(b{BATCH} x s{SEQ}, {n:,} filled slots): "
            f"{agree * 100:.3f}% ({diffs:,} diffs)",
            flush=True,
        )
    # untouched positions must be bit-identical regardless of cache dtype
    np.testing.assert_array_equal(out_int8[~filled], out_fp32[~filled])
    print("untouched tokens bit-identical across cache dtypes", flush=True)


if __name__ == "__main__":
    main()
