"""A/B the scale-train non-dot tail levers (VERDICT r4 #2).

The late-round-4 attribution (`scripts/profile_scale_train.py`, BASELINE.md)
puts 35% of the dim-1024 train step outside `dot_general`: the fp32
mask+softmax chain (~10%), one standalone (b,h,t,t) mask select per layer
(~5%), and the adamw sweep (4.5%, bandwidth-inherent). Two model-side levers
attack the first two (models/attention.py):

  fused_mask  — AND all boolean masks, ONE where() per layer (bit-identical)
  sm_bf16     — mask+softmax elementwise chain in bf16 (numerics knob)

Measured here on the scale_1024 train step (dim 1024 / dec depth 8 / 226M /
b8 / seq1024) with the round-4 amortized methodology: K chained donated
steps, one scalar fetch, fetch RTT subtracted. Also retries the b16/b32
batch points (round-3 recorded `b32 HTTP 500` in the remote-compile helper)
with remat on to shrink the compile-memory footprint.

Run: nohup timeout 5400 python scripts/exp_scale_tail.py > /tmp/scale_tail.log 2>&1 &
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


def measure(name, attn_extra, batch=8, remat=False, repeats=3, K=4, steps_warm=1):
    try:
        t0 = time.time()
        model, variables, _, train_batch = build_flagship(
            batch, SEQ, return_train_inputs=True, attn_extra=attn_extra, **DIMS
        )
        params = variables["params"]
        nparams = sum(x.size for x in jax.tree.leaves(params))
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
            updates, new_opt = tx.update(grads, opt_state, params)
            new_params = jax.tree.map(lambda p, u: p + u, params, updates)
            return new_params, new_opt, loss

        step = jax.jit(train_step, donate_argnums=(0, 1))
        for i in range(steps_warm):
            params, opt_state, loss = step(params, opt_state, train_batch,
                                           jax.random.PRNGKey(i))
        lv = float(np.asarray(loss))
        compile_s = time.time() - t0

        # fetch RTT: repeated scalar fetch of an already-ready value
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
        toks = batch * SEQ / dt
        print(f"RESULT {name}: {dt*1e3:.1f} ms/step  {toks/1e3:.1f}k tok/s  "
              f"loss={lv:.4f}  params={nparams/1e6:.1f}M  "
              f"(compile {compile_s:.0f}s, rtt {rtt*1e3:.1f} ms)", flush=True)
        return dt
    except Exception as e:  # noqa: BLE001 — record failures as results
        msg = str(e).split("\n")[0][:200]
        print(f"RESULT {name}: FAILED — {type(e).__name__}: {msg}", flush=True)
        return None


def main():
    print(f"scale tail A/B: {DIMS}, seq {SEQ}", flush=True)
    base = measure("base_b8", None)
    fused = measure("fused_mask_b8", {"fused_mask_select": True})
    sm = measure("sm_bf16_b8", {"softmax_bf16": True})
    both = measure("fused+sm_bf16_b8", {"fused_mask_select": True,
                                        "softmax_bf16": True})
    for name, dt in (("fused_mask", fused), ("sm_bf16", sm), ("both", both)):
        if base and dt:
            print(f"SPEEDUP {name}: {base/dt:.3f}x", flush=True)

    # batch knee retry (round-3 b32 HTTP 500): b16 plain, then b32 with remat
    b16 = measure("base_b16", None, batch=16)
    b32 = measure("base_b32_remat", None, batch=32, remat=True)
    if base and b16:
        print(f"SCALING b16: {2*base/b16:.3f}x ideal-normalized", flush=True)
    if base and b32:
        print(f"SCALING b32(remat): {4*base/b32:.3f}x ideal-normalized", flush=True)


if __name__ == "__main__":
    main()
