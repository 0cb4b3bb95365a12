"""A/B the flat (raveled single-vector) optimizer on the flagship train step.

The post-GLU profile shows a ~5 ms unattributed long tail of 4,621 tiny ops —
the per-leaf clip/adamw elementwise updates over the hundreds of param leaves.
OptimizerConfig.flat_updates wraps the whole chain in optax.flatten so the
update runs on one raveled vector (a handful of vector-sized kernels).
CPU-equivalence-tested incl. clip, weight decay, accumulation, finite guard
(tests/test_training.py::test_flat_updates_equivalence).

Run on TPU: timeout 3000 python scripts/exp_flat_opt.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")


def measure(label, flat, steps=10):
    import jax

    from bench import build_flagship
    from scoreperformer_tpu.training.optimizers import (
        OptimizerConfig, build_optimizer,
    )

    BATCH, SEQ = 128, 256
    model, variables, _, train_batch = build_flagship(
        BATCH, SEQ, return_train_inputs=True
    )
    params = variables["params"]
    tx = build_optimizer(
        OptimizerConfig(lr=2e-4, optimizer="adamw", grad_clip=2.0,
                        flat_updates=flat)
    )
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

    for flat in (False, True, False, True):
        print(f"flat_updates={flat}", flush=True)
        measure(f"flat_updates={flat}", flat)


if __name__ == "__main__":
    main()
