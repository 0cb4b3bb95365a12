"""Streaming SLO: wall-clock per real-time generation window on the TPU.

The reference's interactive design constant is a 0.2 s generation window
with a 0.1 s overflow (reference inference/generators.py:109-110): every
window, the generator must produce the notes whose onsets fall inside the
next 0.2 s of performance time. The SLO is wall < window — the generator
keeps up with real time.

This drives ScorePerformerGenerator.generate_performance_notes over a long
synthetic piece, measuring steady-state wall-clock per 0.2 s window
(median / p95 / max after warmup). Two regimes:

  default:  the FLAGSHIP architecture (dim 256, decoder depth 4, the
            bench.py config) — BASELINE.md round 4: median 38.8 ms.
  --scale:  the scale_1024 serving regime (dim 1024, decoder depth 8,
            dim_head 128, 226M params) — VERDICT r4 #5. Note the streaming
            cache is batch-1 so the int8/bf16 KV levers are irrelevant
            here (they pay at the batch-512 offline decode); the binding
            term at this size is streaming the 226M fp32 params per block.

Run on the TPU:  timeout 3000 python scripts/exp_streaming_slo.py [--scale]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

WINDOW = 0.2
N_WINDOWS = 60
WARMUP = 5
MAX_SEQ = 256


def flagship_cfg(dim=256, emb_dim=128, enc_depth=2, mmd_depth=4, dec_depth=4,
                 heads=4, dim_head=64, latent=(32, 20, 8, 4)):
    emb = {
        "_target_": "simple", "emb_dims": emb_dim, "mode": "cat", "emb_norm": True,
        "discrete": False, "continuous": True, "continuous_dense": True,
        "discrete_ids": [0, 1, 2, 3],
    }
    attn = {"dim_head": dim_head, "one_kv_head": True,
            "alibi_pos_bias": True, "alibi_learned": True}
    ff = {"mult": 4, "glu": True, "swish": True}
    return {
        "dim": dim, "tie_token_emb": True, "mode": "mixlm",
        "score_encoder": {"token_embeddings": dict(emb), "emb_norm": True,
                          "use_abs_pos_emb": False, "max_seq_len": MAX_SEQ + 2,
                          "transformer": {"_target_": "encoder", "depth": enc_depth,
                                          "heads": heads,
                                          "attention": attn, "feed_forward": ff}},
        "perf_encoder": {"token_embeddings": dict(emb), "emb_norm": True,
                         "use_abs_pos_emb": False, "max_seq_len": MAX_SEQ + 2,
                         "latent_dim": list(latent),
                         "aggregate_mode": ["mean", "bar_mean", "beat_mean", "onset_mean"],
                         "max_segments": 260, "hierarchical": True,
                         "transformer": {"_target_": "encoder", "depth": mmd_depth,
                                         "heads": heads,
                                         "attention": attn, "feed_forward": ff}},
        "perf_decoder": {"token_embeddings": {**emb, "_target_": "multi-seq",
                                              "multiseq_mode": "post-cat"},
                         "emb_norm": True, "use_abs_pos_emb": False,
                         "max_seq_len": MAX_SEQ + 2,
                         "context_emb_mode": "cat", "style_emb_mode": "adanorm",
                         "transformer": {"_target_": "decoder", "depth": dec_depth,
                                         "heads": heads,
                                         "attention": attn, "feed_forward": ff},
                         "lm_head": {"_target_": "lm-tied"}},
    }


def scale_cfg():
    """The scale_1024 recipe's architecture (recipes/scoreperformer/
    scale_1024.yaml): dim 1024, enc 4 / mmd 6 / dec 8, heads 8,
    dim_head 128, emb 256, latents (64, 40, 16, 8) — ~226M params."""
    return flagship_cfg(dim=1024, emb_dim=256, enc_depth=4, mmd_depth=6,
                        dec_depth=8, heads=8, dim_head=128,
                        latent=(64, 40, 16, 8))


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", action="store_true",
                    help="dim-1024 serving regime (scale_1024.yaml arch)")
    args = ap.parse_args()

    import jax

    from scoreperformer_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    import numpy as np

    from scoreperformer_tpu.data import (
        LocalScorePerformanceDataset,
        MixedLMScorePerformanceCollator,
        scoreperformer_model_inputs,
    )
    from scoreperformer_tpu.data.synthetic import build_synthetic_dataset
    from scoreperformer_tpu.inference import (
        ScorePerformerGenerator,
        SPMuple2Messenger,
    )
    from scoreperformer_tpu.models import MODELS
    from scoreperformer_tpu.training import inject_data_config

    print(f"backend: {jax.default_backend()}", flush=True)

    root = "/tmp/sp_slo_data"
    import os

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
    cfg = inject_data_config(scale_cfg() if args.scale else flagship_cfg(), dataset)
    model, _ = MODELS.get("ScorePerformer")(**cfg)
    print(f"regime: {'scale_1024' if args.scale else 'flagship'}", flush=True)

    import jax.numpy as jnp

    sample = dataset[0]
    batch = collator([sample])
    inputs = {k: jnp.asarray(v) for k, v in scoreperformer_model_inputs(batch).items()}
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
            "latent_dropout": jax.random.PRNGKey(2), "mmd": jax.random.PRNGKey(3)}
    t0 = time.time()
    variables = jax.jit(
        lambda r, kw: model.init(r, **kw, deterministic=True)
    )(rngs, inputs)
    jax.block_until_ready(variables)
    print(f"init: {time.time() - t0:.1f}s", flush=True)

    messenger = SPMuple2Messenger(dataset.tokenizer)
    gen = ScorePerformerGenerator(model, variables, dataset, collator, messenger)
    gen.reset()
    t0 = time.time()
    gen.prepare_performance_notes(0, overlay_bars=0.0)
    print(f"prepare (encoders): {time.time() - t0:.1f}s", flush=True)
    t0 = time.time()
    gen.warmup(max_context_len=MAX_SEQ, greedy=False, temperature=1.0)
    print(f"warmup (decode programs): {time.time() - t0:.1f}s", flush=True)

    clock = 0.0
    walls, notes_per_window = [], []
    rng = jax.random.PRNGKey(3)
    prev_stats = dict(gen._decoder.stats) if gen._decoder is not None else {}
    for w in range(N_WINDOWS):
        rng, wrng = jax.random.split(rng)
        t0 = time.perf_counter()
        out, messages = gen.generate_performance_notes(
            start_time=clock, time_window=WINDOW, greedy=False,
            temperature=1.0, rng=wrng, max_context_len=MAX_SEQ,
        )
        wall = time.perf_counter() - t0
        clock += WINDOW
        n = 0 if out is None else len(out)
        if out is None and w > WARMUP + 5:
            break  # piece exhausted
        walls.append(wall)
        notes_per_window.append(n)
        if w < 8 or wall > WINDOW:
            st = dict(gen._decoder.stats)
            d = {k: st[k] - prev_stats.get(k, 0) for k in st}
            prev_stats = st
            print(
                f"window {w:3d}: wall {wall * 1e3:7.1f} ms, {n} notes  "
                f"[consume {d['consumed_tokens']} tok/{d['consume_calls']} "
                f"calls {d.get('consume_wall_s', 0.0) * 1e3:.0f} ms, block "
                f"{d['block_calls']} ({d.get('block_wall_s', 0.0) * 1e3:.0f} "
                f"ms), refusals {d['block_refusals']}, resets {d['resets']}]",
                flush=True,
            )
        else:
            prev_stats = dict(gen._decoder.stats)

    steady = np.asarray(walls[WARMUP:])
    n_steady = np.asarray(notes_per_window[WARMUP:])
    print(f"\nwindows measured: {len(steady)} (after {WARMUP} warmup)", flush=True)
    print(f"notes/window: mean {n_steady.mean():.1f}, max {n_steady.max()}", flush=True)
    print(
        f"wall per {WINDOW}s window: median {np.median(steady) * 1e3:.1f} ms, "
        f"p95 {np.percentile(steady, 95) * 1e3:.1f} ms, "
        f"max {steady.max() * 1e3:.1f} ms",
        flush=True,
    )
    rtf = WINDOW / np.median(steady)
    print(f"real-time factor (median): {rtf:.1f}x", flush=True)
    viol = int((steady > WINDOW).sum())
    print(f"SLO violations (wall > window): {viol}/{len(steady)}", flush=True)


if __name__ == "__main__":
    main()
