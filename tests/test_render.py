import numpy as np
import pytest

import jax

from scoreperformer_tpu.data import LocalScorePerformanceDataset, MixedLMScorePerformanceCollator
from scoreperformer_tpu.data.synthetic import build_synthetic_dataset, synthetic_score
from scoreperformer_tpu.inference.render import load_model_from_checkpoint, render_performance
from scoreperformer_tpu.midi import tick_to_time_map
from scoreperformer_tpu.models import MODELS
from scoreperformer_tpu.training import inject_data_config
from scoreperformer_tpu.training.checkpoint import save_checkpoint
from scoreperformer_tpu.configs import to_dict

pytestmark = pytest.mark.slow


def tiny_cfg():
    emb = {"_target_": "simple", "emb_dims": 16, "mode": "cat", "emb_norm": True,
           "discrete": False, "continuous": True, "continuous_dense": True,
           "discrete_ids": [0, 1, 2, 3]}
    attn = {"dim_head": 8, "one_kv_head": True, "alibi_pos_bias": True, "alibi_learned": True}
    ff = {"mult": 2, "glu": True, "swish": True}
    enc = {"_target_": "encoder", "depth": 1, "heads": 2, "attention": attn, "feed_forward": ff}
    return {
        "dim": 32, "tie_token_emb": True, "mode": "mixlm",
        "score_encoder": {"token_embeddings": dict(emb), "use_abs_pos_emb": False,
                          "max_seq_len": 512, "transformer": dict(enc)},
        "perf_encoder": {"token_embeddings": dict(emb), "use_abs_pos_emb": False,
                         "max_seq_len": 512, "latent_dim": [8, 6, 4, 2],
                         "aggregate_mode": ["mean", "bar_mean", "beat_mean", "onset_mean"],
                         "max_segments": 128, "hierarchical": True, "transformer": dict(enc)},
        "perf_decoder": {"token_embeddings": {**emb, "_target_": "multi-seq", "multiseq_mode": "post-cat"},
                         "use_abs_pos_emb": False, "max_seq_len": 512,
                         "context_emb_mode": "cat", "style_emb_mode": "adanorm",
                         "transformer": {"_target_": "decoder", "depth": 1, "heads": 2,
                                         "attention": attn, "feed_forward": ff},
                         "lm_head": {"_target_": "lm-tied"}},
    }


def test_render_from_checkpoint(tmp_path):
    root = str(tmp_path / "data")
    build_synthetic_dataset(root, n_scores=1, n_perfs_per_score=1, n_bars=6, seed=13,
                            with_directions=False)
    dataset = LocalScorePerformanceDataset(root=root, max_seq_len=80, bar_sliding_window=4)
    cfg_dict = inject_data_config(tiny_cfg(), dataset)
    model, model_cfg = MODELS.get("ScorePerformer")(**cfg_dict)

    # init and save checkpoint with embedded config
    sample = dataset[0]
    collator = MixedLMScorePerformanceCollator(
        mask_ignore_token_ids=[0, 1, 2, 3],
        mask_ignore_token_dims=[0, 1, 2, 4, 6, 7, 8, 9],
    )
    from scoreperformer_tpu.data import scoreperformer_model_inputs
    import jax.numpy as jnp

    inputs = {k: jnp.asarray(v) for k, v in scoreperformer_model_inputs(collator([sample])).items()}
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
            "latent_dropout": jax.random.PRNGKey(2), "mmd": jax.random.PRNGKey(3)}
    variables = model.init(rngs, **inputs, deterministic=True)

    ckpt_path = save_checkpoint(
        str(tmp_path / "ckpt"), jax.device_get(variables["params"]),
        model_config=to_dict(model_cfg),
    )
    dataset.tokenizer.save(str(tmp_path / "ckpt" / "tokenizer.json"))

    # reload and render a fresh score end-to-end
    model2, variables2, _ = load_model_from_checkpoint(ckpt_path)
    score = synthetic_score(np.random.RandomState(3), n_bars=6)
    src_notes = score.copy()
    out_path = str(tmp_path / "performance.mid")
    perf = render_performance(
        model2, variables2, dataset.tokenizer, score,
        rng=jax.random.PRNGKey(1), greedy=True, output_path=out_path,
    )

    assert perf is not None and perf.num_notes > 0
    import os

    assert os.path.exists(out_path)
    # rendered pitches match the score's (timing/velocity are generated)
    out_pitches = sorted(perf.all_notes().pitch.tolist())
    # score preprocessing may drop nothing here; pitch multiset should survive
    src_seq = dataset.tokenizer.score_midi_to_tokens(src_notes)
    src_pitches = sorted(
        (src_seq.ids[:, 2] - dataset.tokenizer.zero_token + 21).tolist()
    )
    assert out_pitches == src_pitches
    # times are finite and ordered sanely
    ttt = tick_to_time_map(perf.tempos, perf.max_tick, perf.ticks_per_beat)
    assert np.isfinite(ttt).all()
