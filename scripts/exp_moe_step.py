"""MoE value measurement: train step time + expert drop rate vs dense (TPU).

VERDICT r4 #4 measurement half: the MoE mechanism is correctness-proven
(tests/test_moe.py) and now learning-proven (TestMoELearning); this script
supplies the missing PERFORMANCE evidence at a real size — single-chip train
step time of a MoE decoder vs two dense baselines, plus the measured expert
drop rate under real (randomly-routed synthetic) load:

  - dense-active: same ACTIVE FF width per token (mult 4) — what MoE costs
    over the iso-FLOPs-per-token dense model (routing + dispatch overhead).
  - dense-iso-params: ff mult scaled to match the MoE decoder's TOTAL param
    count — what a quality-matched dense model would cost per step.
  - moe: num_experts 4, top_k 2, capacity 1.5, stride 2 (moe.yaml shape).

Single chip has no expert axis, so this measures the routed-compute overhead
floor (EP sharding distributes experts but adds all-to-alls; the dryrun
`experts OK` stage proves that path's numerics on 8 virtual devices).

Run on the TPU:  timeout 3000 python scripts/exp_moe_step.py
Results recorded in BASELINE.md round 5.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from scoreperformer_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

import optax

from bench import build_flagship

BATCH, SEQ = 64, 256
MOE_FF = {"num_experts": 4, "expert_top_k": 2, "capacity_factor": 1.5,
          "moe_stride": 2, "router_aux_weight": 0.01}


def measure(tag, dec_ff_extra, repeats=3):
    model, variables, _, train_batch = build_flagship(
        BATCH, SEQ, return_train_inputs=True, dec_ff_extra=dec_ff_extra,
    )
    params = variables["params"]
    tx = optax.chain(optax.clip_by_global_norm(2.0), optax.adamw(2e-4))
    opt_state = tx.init(params)

    def train_step(params, opt_state, batch, rng):
        def loss_fn(p):
            out, mut = model.apply(
                {"params": p}, **batch, deterministic=False,
                rngs={"dropout": jax.random.fold_in(rng, 0),
                      "latent_dropout": jax.random.fold_in(rng, 1),
                      "mmd": jax.random.fold_in(rng, 2)},
                mutable=["losses", "metrics"],
            )
            loss = out.loss
            sown = jax.tree.leaves(mut.get("losses", {}))
            if sown:
                loss = loss + sum(sown)
            drops = jax.tree.leaves(mut.get("metrics", {}))
            drop = sum(drops) / len(drops) if drops else jnp.zeros(())
            return loss, drop

        (loss, drop), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        return params, opt_state, loss, drop

    n_params = int(sum(x.size for x in jax.tree.leaves(params)))
    step = jax.jit(train_step, donate_argnums=(0, 1))
    t0 = time.perf_counter()
    params, opt_state, loss, drop = step(
        params, opt_state, train_batch, jax.random.PRNGKey(0)
    )
    compile_s = time.perf_counter() - t0

    def fetch(x):
        return float(np.asarray(x))

    fetch(loss)
    t0 = time.perf_counter()
    for _ in range(3):
        fetch(loss)
    rtt = (time.perf_counter() - t0) / 3

    K = 4
    times, drop_v = [], 0.0
    for i in range(repeats):
        t0 = time.perf_counter()
        for j in range(K):
            params, opt_state, loss, drop = step(
                params, opt_state, train_batch, jax.random.PRNGKey(1 + i * K + j)
            )
        drop_v = fetch(drop)
        times.append((time.perf_counter() - t0 - rtt) / K)
    best = min(times)
    print(
        f"RESULT {tag}: {best*1e3:.1f} ms/step  {BATCH*SEQ/best/1e3:.1f}k tok/s  "
        f"params={n_params/1e6:.1f}M  drop_rate={drop_v:.4f}  "
        f"loss={fetch(loss):.4f}  (compile {compile_s:.0f}s, rtt {rtt*1e3:.1f} ms)",
        flush=True,
    )
    return best, n_params


def main():
    print(f"MoE step A/B at batch {BATCH} seq {SEQ} (flagship dims)", flush=True)
    t_active, p_active = measure("dense_active_mult4", None)
    t_moe, p_moe = measure("moe_e4_k2_s2", MOE_FF)
    # iso-params dense: scale ff mult so decoder params ~match the MoE tree.
    # MoE decoder adds (E-1) expert copies on every strided layer; with
    # E=4/stride 2 on a depth-4 decoder that is 2 layers x 3 extra experts
    # of mult-4 GLU FFs. mult 10 on all 4 layers adds a comparable mass.
    t_iso, p_iso = measure("dense_iso_params_mult10", {"mult": 10})
    print(
        f"SUMMARY moe_vs_dense_active {t_moe/t_active:.3f}x  "
        f"moe_vs_dense_iso_params {t_moe/t_iso:.3f}x  "
        f"params active/moe/iso = {p_active/1e6:.1f}/{p_moe/1e6:.1f}/{p_iso/1e6:.1f}M",
        flush=True,
    )


if __name__ == "__main__":
    main()
