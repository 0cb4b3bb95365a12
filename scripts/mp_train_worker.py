"""Multi-process distributed training worker (SURVEY §2.8 backend row).

Launched N times by tests/test_multiprocess.py (and usable manually):

    python scripts/mp_train_worker.py <process_id> <num_processes> <port>

Each process initializes the REAL multi-host plumbing the trainer uses —
`parallel.mesh.maybe_distributed_initialize` (jax.distributed over the
coordinator) and `host_local_to_global_batch` (per-process local shards
assembled into global arrays) — builds the global (data, model) mesh, and
runs two sharded train steps of the tiny ScorePerformer. Every process must
print the same finite loss: the XLA collectives (over Gloo on CPU, ICI on
TPU pods) make training single-program multi-controller.
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=2").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main():
    process_id, num_processes, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

    from scoreperformer_tpu.parallel import (
        batch_sharding,
        host_local_to_global_batch,
        make_mesh,
        maybe_distributed_initialize,
        shard_opt_state,
    )
    from scoreperformer_tpu.training.trainer import TrainerConfig

    config = TrainerConfig(
        output_dir="/tmp/mp_worker_unused",
        multihost=True,
        coordinator_address=f"localhost:{port}",
        num_processes=num_processes,
        process_id=process_id,
    )
    assert maybe_distributed_initialize(config), "distributed init did not run"

    import jax.numpy as jnp  # noqa: F401
    import numpy as np
    import optax

    import __graft_entry__ as ge
    from jax.sharding import NamedSharding, PartitionSpec as P

    n_local = len(jax.local_devices())
    n_global = len(jax.devices())
    print(f"proc {process_id}: local={n_local} global={n_global}", flush=True)
    assert n_global == n_local * num_processes

    mesh = make_mesh(n_global, 1)
    batch_size = 2 * n_global
    model, _, batch = ge._tiny_model_and_batch(
        dim=32, batch=batch_size, seq=8, classifiers=False,
        mmd_levels=2, max_segments=24,
    )

    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
            "latent_dropout": jax.random.PRNGKey(2), "mmd": jax.random.PRNGKey(3)}
    variables = jax.jit(lambda r, b: model.init(r, **b, deterministic=True))(
        rngs, batch
    )
    params = jax.device_get(variables["params"])  # identical host copy everywhere

    replicated = NamedSharding(mesh, P())
    params = jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(replicated, np.asarray(x)),
        params,
    )
    tx = optax.chain(optax.clip_by_global_norm(2.0), optax.adamw(2e-4))
    opt_state = shard_opt_state(tx.init(params), mesh)  # ZeRO over the data axis

    # every process holds ONLY its local batch rows; the trainer's multihost
    # path assembles them into global sharded arrays
    rows = slice(process_id * 2 * n_local, (process_id + 1) * 2 * n_local)
    local_batch = {k: np.asarray(v)[rows] for k, v in batch.items()}
    global_batch = host_local_to_global_batch(local_batch, batch_sharding(mesh))

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

    step = jax.jit(train_step, donate_argnums=(0, 1),
                   out_shardings=(None, None, replicated))
    losses = []
    for s in range(2):
        params, opt_state, loss = step(params, opt_state, global_batch,
                                       jax.random.PRNGKey(7 + s))
        losses.append(float(jax.device_get(loss)))
    assert all(np.isfinite(l) for l in losses), losses
    print(f"proc {process_id}: losses={losses[0]:.6f},{losses[1]:.6f}", flush=True)
    print(f"proc {process_id}: MP OK", flush=True)


if __name__ == "__main__":
    main()
