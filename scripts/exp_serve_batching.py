"""Measured A/B: coalesced batched serving vs sequential renders (real TPU).

Builds a flagship-architecture checkpoint over the SPMupleWindow tokenizer,
starts a RenderServer (the real serving surface: host tokenize, length/batch
bucketing, one fused encode+decode program, detokenize), warms the (1, T) and
(B, T) buckets, and measures:
  - sequential: B render() calls on distinct synthetic scores
  - coalesced:  ONE render_batch of the same B requests

Run (TPU): timeout 3000 python scripts/exp_serve_batching.py [B]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from scoreperformer_tpu.utils.cache import enable_compile_cache
enable_compile_cache()
try:
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

import numpy as np

from bench import build_flagship
from scoreperformer_tpu.configs import to_dict
from scoreperformer_tpu.data.synthetic import synthetic_score
from scoreperformer_tpu.inference import RenderServer
from scoreperformer_tpu.inference.render import prepare_render_inputs
from scoreperformer_tpu.tokenizers import SPMupleWindow, TokenizerConfig
from scoreperformer_tpu.training.checkpoint import save_checkpoint


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    BUCKET = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    print(f"backend={jax.default_backend()} B={B} bucket={BUCKET}", flush=True)

    tokenizer = SPMupleWindow(
        TokenizerConfig(additional_params={"max_bar_embedding": 256})
    )
    # distinct lengths exercise per-row valid_len inside one bucket
    base_bars = 14 if BUCKET >= 256 else 3
    scores = [
        synthetic_score(np.random.RandomState(i), n_bars=base_bars + (i % 4) * 2)
        for i in range(B)
    ]
    lens = [len(prepare_render_inputs(tokenizer, s)["deadpan_ids"]) for s in scores]
    print(f"score token lengths: {lens}", flush=True)
    assert max(lens) <= BUCKET

    num_tokens = dict(tokenizer.performance_sizes)
    token_values = {
        k: np.asarray(v).tolist()
        for k, v in tokenizer.token_values(normalize=True).items()
    }
    model, variables, _, model_cfg = build_flagship(
        1, BUCKET, num_tokens=num_tokens, token_values=token_values,
        max_segments=BUCKET + 8, return_config=True,
    )
    ckpt = save_checkpoint(
        "/tmp/serve_bench/ckpt", jax.device_get(variables["params"]),
        model_config=to_dict(model_cfg),
    )
    tokenizer.save(os.path.join(ckpt, "tokenizer.json"))
    server = RenderServer(ckpt, bucket=BUCKET, max_len=BUCKET)

    t0 = time.perf_counter()
    print("warmup (compiles the (1,T) and (B,T) sampling programs)...", flush=True)
    server.warmup([BUCKET], greedy_variants=(False,), batch_sizes=(1, B))
    print(f"warmup done in {time.perf_counter() - t0:.1f} s", flush=True)

    reqs = [dict(score_midi=s, seed=i) for i, s in enumerate(scores)]
    for rep in range(3):
        t0 = time.perf_counter()
        for r in reqs:
            server.render(**r)
        seq_t = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = server.render_batch(reqs)
        bat_t = time.perf_counter() - t0
        print(
            f"rep{rep}: sequential {seq_t * 1e3:.0f} ms ({seq_t / B * 1e3:.0f}/req), "
            f"coalesced {bat_t * 1e3:.0f} ms ({bat_t / B * 1e3:.0f}/req), "
            f"speedup {seq_t / bat_t:.2f}x  "
            f"(render_ms seq-last={out[0]['timings']['render_ms']})",
            flush=True,
        )
    print("batches served:", server.stats["batches"], flush=True)


if __name__ == "__main__":
    main()
