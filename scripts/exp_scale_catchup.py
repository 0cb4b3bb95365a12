"""Streaming cache catch-up cost at both serving regimes (TPU).

The dim-1024 streaming SLO run showed windows 0..~16 comfortably inside the
0.2 s budget and every later window at 3-10 s: once ~240 generated notes fill
`max_context_len`, each window-shift resets the decoder and the next
decode_block re-consumes the whole retained context through per-token
`_consume` dispatches. This measures that catch-up directly:

  - per-token consume (CHUNKS=(1,), the default measured best at the
    flagship in round 3: jax async dispatch pipelines the tiny programs)
  - 64-row scanned consume (CHUNKS=(64, 8, 1) — one compiled scan per 64
    rows; round 3 measured this SLOWER at the flagship, 2.1 s vs 0.42 s
    for a 246-token prefill, so it is NOT the default)

at the flagship (dim 256) and scale_1024 (dim 1024) architectures, over a
200-row catch-up. The winner per regime decides the streaming catch-up
policy. Run on the TPU:  timeout 3000 python scripts/exp_scale_catchup.py
Results recorded in BASELINE.md round 5.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

from scoreperformer_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

import jax
import numpy as np

from exp_streaming_slo import MAX_SEQ, flagship_cfg, scale_cfg

N_CATCHUP = 200
REPEATS = 4


def build(cfg_fn):
    from scoreperformer_tpu.data import (
        LocalScorePerformanceDataset,
        MixedLMScorePerformanceCollator,
        scoreperformer_model_inputs,
    )
    from scoreperformer_tpu.data.synthetic import build_synthetic_dataset
    from scoreperformer_tpu.models import MODELS
    from scoreperformer_tpu.training import inject_data_config
    import jax.numpy as jnp
    import os

    root = "/tmp/sp_slo_data"
    if not os.path.exists(os.path.join(root, "metadata.json")):
        build_synthetic_dataset(root, n_scores=1, n_perfs_per_score=1,
                                n_bars=48, seed=7, with_directions=False)
    dataset = LocalScorePerformanceDataset(
        root=root, max_seq_len=MAX_SEQ, bar_sliding_window=8,
        fit_to_zero_bar=True, add_sos_eos=True, preload=True,
        auxiliary_data_keys=["bars"],
    )
    collator = MixedLMScorePerformanceCollator(
        mask_ignore_token_ids=[0, 1, 2, 3],
        mask_ignore_token_dims=[0, 1, 2, 4, 6, 7, 8, 9],
    )
    cfg = inject_data_config(cfg_fn(), dataset)
    model, _ = MODELS.get("ScorePerformer")(**cfg)

    sample = dataset[0]
    batch = collator([sample])
    inputs = {k: jnp.asarray(v) for k, v in scoreperformer_model_inputs(batch).items()}
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
            "latent_dropout": jax.random.PRNGKey(2), "mmd": jax.random.PRNGKey(3)}
    variables = jax.jit(
        lambda r, kw: model.init(r, **kw, deterministic=True)
    )(rngs, inputs)
    jax.block_until_ready(variables)
    # real token rows from the dataset as the catch-up content
    perf = np.asarray(sample.perf)
    rows = np.concatenate([perf] * (N_CATCHUP // perf.shape[0] + 2))[: N_CATCHUP + 8]
    # the decoder cats context embeddings and adanorm-conditions on style
    # (context_emb_mode="cat", style_emb_mode="adanorm") — synthesize rows
    # at model dim; content is irrelevant to the timing
    rs = np.random.RandomState(0)
    style_dim = int(sum(cfg["perf_encoder"]["latent_dim"]))  # MMD embedding_dim
    style = rs.randn(rows.shape[0], style_dim).astype(np.float32) * 0.02
    ctx = rs.randn(rows.shape[0], cfg["dim"]).astype(np.float32) * 0.02
    return model, variables, rows, style, ctx


def time_catchup(model, variables, rows, style, ctx, chunks, label):
    from scoreperformer_tpu.inference.generator import StreamingDecoder

    n_streams = rows.shape[1]
    masked = rows.copy()
    walls = []
    # ONE decoder reused across reps, as the serving path does: a fresh
    # decoder per rep re-pays the per-instance jit wrapper's executable
    # load (~0.5-2 s from the persistent cache), which the real generator
    # pays once per process, not once per window shift
    dec = StreamingDecoder(model, variables, MAX_SEQ, n_streams)
    dec.CHUNKS = chunks  # instance attr shadows the class default
    for r in range(REPEATS):
        dec.reset()
        dec.caches = dec._init_cache()
        dec.consumed = 0
        # warm the programs (first call compiles; compile excluded from rep>0)
        t0 = time.perf_counter()
        dec._consume_to(rows, masked, style, ctx, N_CATCHUP)
        jax.block_until_ready(dec.caches)
        walls.append(time.perf_counter() - t0)
        print(f"  {label} rep{r}: {walls[-1] * 1e3:8.1f} ms "
              f"({walls[-1] / N_CATCHUP * 1e3:6.2f} ms/row)", flush=True)
    best = min(walls[1:]) if len(walls) > 1 else walls[0]
    print(f"RESULT {label}: best-warm {best * 1e3:.1f} ms "
          f"({best / N_CATCHUP * 1e3:.2f} ms/row)", flush=True)
    return best


def main():
    print(f"catch-up of {N_CATCHUP} rows, max_context {MAX_SEQ}", flush=True)
    for name, cfg_fn in (("flagship", flagship_cfg), ("scale_1024", scale_cfg)):
        print(f"== {name} ==", flush=True)
        model, variables, rows, style, ctx = build(cfg_fn)
        time_catchup(model, variables, rows, style, ctx, (1,), f"{name}_pertoken")
        time_catchup(model, variables, rows, style, ctx, (64, 8, 1), f"{name}_chunk64")
        time_catchup(model, variables, rows, style, ctx, (128, 64, 8, 1),
                     f"{name}_chunk128")


if __name__ == "__main__":
    main()
