"""A/B the ALiBi d(bias) MXU contraction on the flagship train step.

The post-GLU profile shows the backward of the ALiBi bias add
(attention.py `dots + bias[None]`) as the largest non-matmul item: a
5.9 ms VPU reduce_sum of the (b, h, n, j) grad over batch (~230 GB/s).
ALIBI_DBIAS_DOT computes the same sum as a dot_general against a ones
vector so it runs on the MXU. Forward and d(dots) bit-match; d(bias)
reassociates the sum (tests/test_models.py::test_alibi_dbias_dot_matches_reduce).

Run on TPU: timeout 3000 python scripts/exp_alibi_dbias.py
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
    from scoreperformer_tpu.models import attention as A

    for flag in (False, True, False, True):
        A.ALIBI_DBIAS_DOT = flag
        print(f"ALIBI_DBIAS_DOT={flag}", flush=True)
        measure(f"alibi_dbias_dot={flag}")


if __name__ == "__main__":
    main()
