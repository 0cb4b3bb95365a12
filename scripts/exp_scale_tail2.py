"""Scale-train tail round 2: optimizer-sweep levers on top of the softmax
levers (VERDICT r4 #2, continuing scripts/exp_scale_tail.py).

With softmax_bf16 + fused_mask_select the dim-1024 step is 165.0 ms
(MFU ~0.394, target 0.40). The remaining named tail item is the adamw sweep
(~4.5% of the pre-lever step). Measured here, all with the levers ON:

  lev_b8          — confirm the 165 ms base
  lev_b8_noopt    — forward+backward only (upper bound on what ANY
                    optimizer fusion could recover)
  lev_b8_mu_bf16  — adamw with bf16 first-moment state (halves the m-state
                    HBM traffic; optax mu_dtype, an accepted production
                    knob — numerics change is in the optimizer state only)
  lev_b16 / lev_b32_remat — batch knee with levers (b32 retries the
                    HTTP 500 with the smaller bf16-softmax program)

Run: nohup timeout 5400 python scripts/exp_scale_tail2.py > /tmp/scale_tail2.log 2>&1 &
Results in BASELINE.md round 5.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from scoreperformer_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

import optax  # noqa: E402

from bench import build_flagship  # noqa: E402

DIMS = dict(dim=1024, emb_dim=256, depth=8, heads=8, dim_head=128)
SEQ = 1024
LEVERS = {"fused_mask_select": True, "softmax_bf16": True}


def measure(name, batch=8, remat=False, opt="adamw", repeats=3, K=4):
    try:
        t0 = time.time()
        model, variables, _, train_batch = build_flagship(
            batch, SEQ, return_train_inputs=True, attn_extra=LEVERS, **DIMS
        )
        params = variables["params"]
        nparams = sum(x.size for x in jax.tree.leaves(params))
        if opt == "mu_bf16":
            tx = optax.chain(optax.clip_by_global_norm(2.0),
                             optax.adamw(2e-4, mu_dtype=jnp.bfloat16))
        else:
            tx = optax.chain(optax.clip_by_global_norm(2.0), optax.adamw(2e-4))
        opt_state = tx.init(params)

        def forward(p, b, rngs):
            out = model.apply({"params": p}, **b, deterministic=False, rngs=rngs)
            return out.loss.astype(jnp.float32)

        fwd = jax.checkpoint(forward) if remat else forward

        def train_step(params, opt_state, b, rng):
            rngs = {"dropout": jax.random.fold_in(rng, 0),
                    "latent_dropout": jax.random.fold_in(rng, 1),
                    "mmd": jax.random.fold_in(rng, 2)}
            loss, grads = jax.value_and_grad(lambda p: fwd(p, b, rngs))(params)
            if opt == "none":
                # grads-only bound: fold grads into params with a plain SGD
                # step so params stay donated/updated but no adam state sweep
                new_params = jax.tree.map(lambda p, g: p - 1e-9 * g, params, grads)
                return new_params, opt_state, loss
            updates, new_opt = tx.update(grads, opt_state, params)
            new_params = jax.tree.map(lambda p, u: p + u, params, updates)
            return new_params, new_opt, loss

        step = jax.jit(train_step, donate_argnums=(0, 1))
        params, opt_state, loss = step(params, opt_state, train_batch,
                                       jax.random.PRNGKey(0))
        lv = float(np.asarray(loss))
        compile_s = time.time() - t0

        t0 = time.perf_counter()
        for _ in range(3):
            float(np.asarray(loss))
        rtt = (time.perf_counter() - t0) / 3

        times = []
        for i in range(repeats):
            t0 = time.perf_counter()
            for j in range(K):
                params, opt_state, loss = step(params, opt_state, train_batch,
                                               jax.random.PRNGKey(100 + i * K + j))
            float(np.asarray(loss))
            times.append((time.perf_counter() - t0 - rtt) / K)
        dt = min(times)
        print(f"RESULT {name}: {dt*1e3:.1f} ms/step  {batch*SEQ/dt/1e3:.1f}k tok/s  "
              f"loss={lv:.4f}  params={nparams/1e6:.1f}M  "
              f"(compile {compile_s:.0f}s, rtt {rtt*1e3:.1f} ms)", flush=True)
        return dt
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")[0][:200]
        print(f"RESULT {name}: FAILED — {type(e).__name__}: {msg}", flush=True)
        return None


def main():
    print(f"scale tail round 2: {DIMS}, seq {SEQ}, levers {LEVERS}", flush=True)
    base = measure("lev_b8")
    noopt = measure("lev_b8_noopt", opt="none")
    mubf = measure("lev_b8_mu_bf16", opt="mu_bf16")
    if base and noopt:
        print(f"ADAMW SWEEP BOUND: {(base-noopt)*1e3:.1f} ms "
              f"({(base-noopt)/base*100:.1f}% of step)", flush=True)
    if base and mubf:
        print(f"SPEEDUP mu_bf16: {base/mubf:.3f}x", flush=True)
    b16 = measure("lev_b16", batch=16)
    b32 = measure("lev_b32_remat", batch=32, remat=True)
    if base and b16:
        print(f"SCALING b16: {2*base/b16:.3f}x ideal-normalized", flush=True)
    if base and b32:
        print(f"SCALING b32(remat): {4*base/b32:.3f}x ideal-normalized", flush=True)


if __name__ == "__main__":
    main()
