"""Scale validation: do the big-config levers (bf16 / remat / flash) pay off
where they should?

The flagship (dim 256, seq 256) measured bf16/flash/remat as neutral-to-negative
(BASELINE.md rounds 1-3) because it is overhead-bound at that size. This
experiment builds the same architecture SCALED (dim 1024, decoder depth 8,
seq 1024 -> the decoder attends over ~2k positions with the concatenated score
context) and measures a full train step under the lever matrix, recording
OOMs as results. Run on the real TPU:

    timeout 4000 python scripts/exp_scale.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def build_scaled(batch, seq, dim=1024, heads=8, dim_head=128, depth_dec=8,
                 use_flash=False):
    import jax.numpy as jnp

    import bench
    from scoreperformer_tpu.models import MODELS

    num_tokens = bench.FLAGSHIP_NUM_TOKENS
    score_tokens = {
        k: v for k, v in num_tokens.items()
        if k not in ("RelOnsetDev", "RelPerfDuration")
    }
    token_values = {k: np.linspace(0, 1, v).tolist() for k, v in num_tokens.items()}
    emb = {
        "_target_": "simple", "emb_dims": 256, "mode": "cat", "emb_norm": True,
        "discrete": False, "continuous": True, "continuous_dense": True,
        "discrete_ids": [0, 1, 2, 3], "token_values": token_values,
    }
    attn = {"dim_head": dim_head, "one_kv_head": True,
            "alibi_pos_bias": True, "alibi_learned": True, "use_flash": use_flash}
    ff = {"mult": 4, "glu": True, "swish": True}
    cfg = {
        "num_tokens": num_tokens, "num_score_tokens": score_tokens,
        "dim": dim, "tie_token_emb": True, "mode": "mixlm",
        "score_encoder": {"token_embeddings": dict(emb), "emb_norm": True,
                          "use_abs_pos_emb": False, "max_seq_len": seq + 2,
                          "transformer": {"_target_": "encoder", "depth": 2,
                                          "heads": heads, "attention": attn,
                                          "feed_forward": ff}},
        "perf_encoder": {"token_embeddings": dict(emb), "emb_norm": True,
                         "use_abs_pos_emb": False, "max_seq_len": seq + 2,
                         "latent_dim": [32, 20, 8, 4],
                         "aggregate_mode": ["mean", "bar_mean", "beat_mean", "onset_mean"],
                         "hierarchical": True, "max_segments": seq + 4,
                         "transformer": {"_target_": "encoder", "depth": 4,
                                         "heads": heads, "attention": attn,
                                         "feed_forward": ff}},
        "perf_decoder": {"token_embeddings": {**emb, "_target_": "multi-seq",
                                              "multiseq_mode": "post-cat"},
                         "emb_norm": True, "use_abs_pos_emb": False,
                         "max_seq_len": seq + 2,
                         "context_emb_mode": "cat", "style_emb_mode": "adanorm",
                         "transformer": {"_target_": "decoder", "depth": depth_dec,
                                         "heads": heads, "attention": attn,
                                         "feed_forward": ff},
                         "lm_head": {"_target_": "lm-tied"}},
    }
    model, _ = MODELS.get("ScorePerformer")(**cfg)

    rng = np.random.RandomState(0)

    def rand(nt):
        return jnp.array(
            np.stack([rng.randint(4, v, (batch, seq)) for v in nt.values()], -1)
        )

    perf = rand(num_tokens)
    tokens = perf.at[:, 1:, (3, 5, 10, 11)].set(1)
    scores = rand(score_tokens)
    bars = jnp.cumsum(jnp.asarray(rng.rand(batch, seq) < 0.1, np.int32), axis=1)
    segments = jnp.stack([bars, bars * 2, bars * 3], axis=-1)
    labels = perf.at[:, 0].set(-100)
    batch_inputs = dict(
        tokens=tokens, masked_tokens=perf, scores=scores, segments=segments,
        labels=labels,
    )
    return model, batch_inputs


def measure_variant(name, batch, seq, bf16, remat, use_flash, steps=8):
    import jax
    import jax.numpy as jnp
    import optax

    jax.config.update("jax_compilation_cache_dir", "/tmp/sp_jax_cache")
    model, batch_inputs = build_scaled(batch, seq, use_flash=use_flash)

    rng = jax.random.PRNGKey(0)

    def cast(tree, dt):
        return jax.tree.map(
            lambda x: x.astype(dt) if x.dtype == jnp.float32 else x, tree)

    try:
        t0 = time.time()
        init = jax.jit(model.init)
        variables = init(
            {"params": rng, "dropout": rng, "latent_dropout": rng, "mmd": rng},
            **batch_inputs, deterministic=True,
        )
        params = variables["params"]
        nparams = sum(x.size for x in jax.tree.leaves(params))
        tx = optax.chain(optax.clip_by_global_norm(2.0), optax.adamw(2e-4))
        opt_state = tx.init(params)

        def forward(p, b, rngs):
            out = model.apply({"params": p}, **b, deterministic=False, rngs=rngs)
            return out.loss.astype(jnp.float32)

        fwd = jax.checkpoint(forward) if remat else forward

        @jax.jit
        def train_step(params, opt_state, b, rng):
            rngs = {"dropout": jax.random.fold_in(rng, 0),
                    "latent_dropout": jax.random.fold_in(rng, 1),
                    "mmd": jax.random.fold_in(rng, 2)}

            def loss_fn(p):
                p_c = cast(p, jnp.bfloat16) if bf16 else p
                return fwd(p_c, b, rngs)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            grads = cast(grads, jnp.float32)
            updates, new_opt = tx.update(grads, opt_state, params)
            new_params = jax.tree.map(lambda p, u: p + u, params, updates)
            return new_params, new_opt, loss

        params, opt_state, loss = train_step(params, opt_state, batch_inputs, rng)
        loss.block_until_ready()
        compile_s = time.time() - t0
        # steady state
        t0 = time.time()
        for i in range(steps):
            params, opt_state, loss = train_step(
                params, opt_state, batch_inputs, jax.random.fold_in(rng, i))
        loss.block_until_ready()
        dt = (time.time() - t0) / steps
        toks = batch * seq / dt
        print(f"RESULT {name}: {dt*1e3:.1f} ms/step  {toks:,.0f} tok/s  "
              f"loss={float(loss):.3f}  params={nparams/1e6:.1f}M  "
              f"(compile {compile_s:.0f}s)", flush=True)
        return dt
    except Exception as e:  # noqa: BLE001 — record OOM as a result
        msg = str(e).split("\n")[0][:200]
        print(f"RESULT {name}: FAILED — {type(e).__name__}: {msg}", flush=True)
        return None


def main():
    BATCH, SEQ = 8, 1024
    print(f"scale config: dim 1024, dec depth 8, heads 8, dim_head 128, "
          f"batch {BATCH}, seq {SEQ} (decoder attends over ~{2*SEQ} with "
          f"cat score context)", flush=True)
    for name, bf16, remat, flash in [
        ("fp32", False, False, False),
        ("bf16", True, False, False),
        ("bf16+remat", True, True, False),
        ("bf16+remat+flash", True, True, True),
        ("fp32+remat+flash", False, True, True),
    ]:
        measure_variant(name, BATCH, SEQ, bf16, remat, flash)


if __name__ == "__main__":
    main()
