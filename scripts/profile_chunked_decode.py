"""Profile the chunked-carry decode step on TPU: where do the 754 us go?

After the round-3 chunked-carry restructure (C=16, 679k tok/s flagship),
the carried-cache defensive-copy tax is gone; this trace attributes the
remaining per-step time (attend reads over the frozen prefix, fresh-buffer
updates, MLP/head matmuls, sampling) so BASELINE.md's speed-of-light story
rests on a measured breakdown, not the round-2 profile.

Run: timeout 3000 python scripts/profile_chunked_decode.py
Then summarize with: python scripts/profile_chunked_decode.py --summarize
(reads the latest trace under /tmp/sp_decode_trace).
"""
import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

TRACE_DIR = "/tmp/sp_decode_trace"


def capture():
    import jax

    from scoreperformer_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    from bench import build_flagship
    from scoreperformer_tpu.models.wrappers import mixedlm_unmask

    BATCH, SEQ = 512, 256
    model, variables, data = build_flagship(BATCH, SEQ)

    @jax.jit
    def unmask(rng, tokens, masked, style, context):
        return mixedlm_unmask(
            model, variables, tokens, masked, rng=rng,
            style_embeddings=style, context=context,
            greedy=False, temperature=1.0,
            sample_dims=(3, 5, 10, 11),  # bench headline config (round 4)
        )

    def run(seed):
        out = unmask(jax.random.PRNGKey(seed), data["tokens"], data["masked"],
                     data["style"], data["context"])
        jax.block_until_ready(out)

    t0 = time.perf_counter()
    run(0)
    print(f"compile {time.perf_counter() - t0:.0f}s", flush=True)
    t0 = time.perf_counter()
    run(1)
    wall = time.perf_counter() - t0
    print(f"steady wall {wall*1e3:.1f} ms  "
          f"{BATCH * (SEQ - 1) / wall:,.0f} tok/s", flush=True)

    jax.profiler.start_trace(TRACE_DIR)
    run(2)
    jax.profiler.stop_trace()
    print("trace written to", TRACE_DIR, flush=True)


def summarize():
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
    events = trace.get("traceEvents", [])
    # keep device-lane complete events; aggregate duration by op name
    totals = {}
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        name = e.get("name", "")
        # XLA op events carry args.long_name / run ids; skip host-side lanes
        pid_name = e.get("pid")
        totals.setdefault(name, [0.0, 0])
        totals[name][0] += e["dur"]
        totals[name][1] += 1
    ranked = sorted(totals.items(), key=lambda kv: -kv[1][0])[:40]
    print(f"{'total_ms':>9} {'count':>6}  name")
    for name, (dur, cnt) in ranked:
        print(f"{dur/1e3:9.2f} {cnt:6d}  {name[:110]}")


if __name__ == "__main__":
    if "--summarize" in sys.argv:
        summarize()
    else:
        capture()
