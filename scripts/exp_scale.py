"""Scale validation: do the big-config levers (bf16 / remat / flash) pay off
where they should?

The flagship (dim 256, seq 256) measured bf16/flash/remat as neutral-to-negative
(BASELINE.md rounds 1-3) because it is overhead-bound at that size. This
experiment builds the same architecture SCALED (dim 1024, decoder depth 8,
seq 1024 -> the decoder attends over ~2k positions with the concatenated score
context) and measures a full train step under the lever matrix, recording
OOMs as results. Run on the real TPU:

    timeout 5400 python scripts/exp_scale.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

DIM, DEPTH_DEC, HEADS, DIM_HEAD = 1024, 8, 8, 128


def measure_variant(name, batch, seq, bf16, remat, use_flash, steps=8):
    import jax
    import jax.numpy as jnp
    import optax

    from scoreperformer_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    from bench import build_flagship

    try:
        t0 = time.time()
        model, variables, _, train_batch = build_flagship(
            batch, seq, return_train_inputs=True,
            dim=DIM, emb_dim=256, depth=DEPTH_DEC, heads=HEADS,
            dim_head=DIM_HEAD, use_flash=use_flash,
        )
        params = variables["params"]
        nparams = sum(x.size for x in jax.tree.leaves(params))
        tx = optax.chain(optax.clip_by_global_norm(2.0), optax.adamw(2e-4))
        opt_state = tx.init(params)

        def cast(tree, dt):
            return jax.tree.map(
                lambda x: x.astype(dt) if x.dtype == jnp.float32 else x, tree)

        def forward(p, b, rngs):
            out = model.apply({"params": p}, **b, deterministic=False, rngs=rngs)
            return out.loss.astype(jnp.float32)

        fwd = jax.checkpoint(forward) if remat else forward

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

        step = jax.jit(train_step, donate_argnums=(0, 1))
        params, opt_state, loss = step(params, opt_state, train_batch,
                                       jax.random.PRNGKey(0))
        jax.block_until_ready(loss)
        compile_s = time.time() - t0
        t0 = time.time()
        for i in range(steps):
            params, opt_state, loss = step(params, opt_state, train_batch,
                                           jax.random.PRNGKey(1 + i))
        jax.block_until_ready(loss)
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
    print(f"scale config: dim {DIM}, dec depth {DEPTH_DEC}, heads {HEADS}, "
          f"dim_head {DIM_HEAD}, batch {BATCH}, seq {SEQ} (decoder attends "
          f"over ~{2*SEQ} with cat score context)", flush=True)
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
