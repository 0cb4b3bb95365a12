"""Profile the flagship train step on TPU, attributed by source line.

bench.py::measure_tpu_train reported 195k tok/s / 167 ms at batch 128; the
round-2 profile found "a long tail of ~0.8 ms fusions" with the MMD one-hot
segment aggregation the largest single item (~7%). This re-profiles in the
current code and aggregates device op time by originating source line so
the next optimization target is data-driven.

Run: timeout 3000 python scripts/profile_train_step.py
Summarize: python scripts/profile_train_step.py --summarize
"""
import glob
import gzip
import json
import os
import re
import sys
import time

sys.path.insert(0, "/root/repo")

TRACE_DIR = "/tmp/sp_train_trace"


def capture():
    import jax
    import optax

    from scoreperformer_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

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
    print(f"compile {time.perf_counter() - t0:.0f}s", flush=True)
    t0 = time.perf_counter()
    params, opt_state, loss = step(params, opt_state, train_batch,
                                   jax.random.PRNGKey(1))
    jax.block_until_ready(loss)
    wall = time.perf_counter() - t0
    print(f"steady wall {wall*1e3:.1f} ms  "
          f"{BATCH * SEQ / wall:,.0f} tok/s", flush=True)

    jax.profiler.start_trace(TRACE_DIR)
    params, opt_state, loss = step(params, opt_state, train_batch,
                                   jax.random.PRNGKey(2))
    jax.block_until_ready(loss)
    jax.profiler.stop_trace()
    print("trace written to", TRACE_DIR, flush=True)


def summarize(top=30):
    pats = sorted(
        glob.glob(os.path.join(TRACE_DIR, "**", "*.trace.json.gz"),
                  recursive=True),
        key=os.path.getmtime,
    )
    if not pats:
        print("no trace found under", TRACE_DIR)
        return
    with gzip.open(pats[-1], "rt") as f:
        trace = json.load(f)
    tot = {}
    grand = 0.0
    for e in trace.get("traceEvents", []):
        if e.get("ph") != "X" or "dur" not in e:
            continue
        a = e.get("args", {})
        if "hlo_category" not in a:
            continue
        if e["name"].startswith("while"):
            continue
        src = a.get("source", "?") or "?"
        m = re.search(r"([\w./-]+\.py:\d+)", src)
        key = m.group(1).split("site-packages/")[-1] if m else src
        op = (a.get("tf_op", "") or "").split("/")[-1]
        d = tot.setdefault((key, op), [0.0, 0])
        d[0] += e["dur"]
        d[1] += 1
        grand += e["dur"]
    print(f"{'total_ms':>9} {'pct':>5} {'count':>7}  source  op")
    for (k, op), (d, c) in sorted(tot.items(), key=lambda kv: -kv[1][0])[:top]:
        print(f"{d/1e3:9.2f} {100*d/grand:5.1f} {c:7d}  {k}  {op[:40]}")
    print(f"grand total device-op ms: {grand/1e3:.1f}")


if __name__ == "__main__":
    if "--summarize" in sys.argv:
        summarize()
    else:
        capture()
