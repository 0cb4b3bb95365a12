"""A/B the one-hot CE contraction in lm_losses on the flagship train step.

The round-3 train-step profile showed the loss gather + its scatter-add
backward in the long tail after the embedding one-hot fix (+17.5%) and the
MMD inverse-CDF fix (+5.6%, control 241.4k tok/s / 135.8 ms). This measures
ONEHOT_CE off vs on in one session.

Run on TPU: timeout 3000 python scripts/exp_onehot_ce.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")


def measure(label, steps=10):
    import jax
    import optax

    from bench import build_flagship

    BATCH, SEQ = 128, 256
    model, variables, _, train_batch = build_flagship(
        BATCH, SEQ, return_train_inputs=True
    )
    params = variables["params"]
    tx = optax.chain(optax.clip_by_global_norm(2.0), optax.adamw(2e-4))
    opt_state = tx.init(params)

    def train_step(params, opt_state, batch, rng):
        def loss_fn(p):
            out = model.apply(
                {"params": p}, **batch, deterministic=False,
                rngs={"dropout": jax.random.fold_in(rng, 0),
                      "latent_dropout": jax.random.fold_in(rng, 1),
                      "mmd": jax.random.fold_in(rng, 2)},
            )
            return out.loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        return params, opt_state, loss

    step = jax.jit(train_step, donate_argnums=(0, 1))
    t0 = time.perf_counter()
    params, opt_state, loss = step(params, opt_state, train_batch,
                                   jax.random.PRNGKey(0))
    jax.block_until_ready(loss)
    print(f"  compile {time.perf_counter() - t0:.0f}s", flush=True)
    t0 = time.perf_counter()
    for i in range(steps):
        params, opt_state, loss = step(params, opt_state, train_batch,
                                       jax.random.PRNGKey(1 + i))
    jax.block_until_ready(loss)
    wall = (time.perf_counter() - t0) / steps
    print(f"RESULT {label}: {wall*1e3:.1f} ms/step  "
          f"{BATCH * SEQ / wall:,.0f} tok/s  loss={float(loss):.4f}",
          flush=True)


def main():
    import jax

    from scoreperformer_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    from scoreperformer_tpu.models import scoreperformer as sp

    for flag in (False, True, False):  # off, on, off-again (load control)
        sp.ONEHOT_CE = flag
        print(f"ONEHOT_CE={flag}", flush=True)
        measure(f"onehot_ce={flag}")


if __name__ == "__main__":
    main()
