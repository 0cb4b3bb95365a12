"""End-to-end learning proof: overfit one piece, measure real improvement.

`test_training` proves the loss decreases; this test proves the whole
train → evaluate → render loop actually LEARNS the expressive targets:
after overfitting a single synthetic performance, the MixedLM accuracy on
the performance streams must rise far above its untrained level, and the
trained model must render the score end-to-end.
"""
import numpy as np
import pytest

import jax

from scoreperformer_tpu.data import (
    LocalScorePerformanceDataset,
    MixedLMScorePerformanceCollator,
)
from scoreperformer_tpu.data.synthetic import build_synthetic_dataset
from scoreperformer_tpu.models import MODELS
from scoreperformer_tpu.training import (
    OptimizerConfig,
    ScorePerformerEvaluator,
    Trainer,
    TrainerConfig,
    inject_data_config,
)

pytestmark = pytest.mark.slow

MAX_SEQ = 48


def tiny_cfg():
    emb = {
        "_target_": "simple", "emb_dims": 16, "mode": "cat", "emb_norm": True,
        "discrete": False, "continuous": True, "continuous_dense": True,
        "discrete_ids": [0, 1, 2, 3],
    }
    attn = {"dim_head": 8, "one_kv_head": True, "alibi_pos_bias": True, "alibi_learned": True}
    ff = {"mult": 2, "glu": True, "swish": True}
    enc = {"_target_": "encoder", "depth": 1, "heads": 2, "attention": attn, "feed_forward": ff}
    return {
        "dim": 48, "tie_token_emb": True, "mode": "mixlm",
        "score_encoder": {"token_embeddings": dict(emb), "emb_norm": True,
                          "use_abs_pos_emb": False, "max_seq_len": MAX_SEQ + 2,
                          "transformer": dict(enc)},
        "perf_encoder": {"token_embeddings": dict(emb), "emb_norm": True,
                         "use_abs_pos_emb": False, "max_seq_len": MAX_SEQ + 2,
                         "latent_dim": [16, 8], "aggregate_mode": ["mean", "bar_mean"],
                         "latent_dropout": [0.0, 0.0], "hierarchical": True,
                         "max_segments": 32, "transformer": dict(enc)},
        "perf_decoder": {"token_embeddings": {**emb, "_target_": "multi-seq",
                                              "multiseq_mode": "post-cat"},
                         "emb_norm": True, "use_abs_pos_emb": False,
                         "max_seq_len": MAX_SEQ + 2,
                         "context_emb_mode": "cat", "style_emb_mode": "adanorm",
                         "transformer": {"_target_": "decoder", "depth": 2, "heads": 2,
                                         "attention": attn, "feed_forward": ff},
                         "lm_head": {"_target_": "lm-tied"}},
    }


def _build_overfit_trainer(tmp_path, epochs, eval_steps=999, cfg_transform=None):
    root = str(tmp_path / "ds")
    build_synthetic_dataset(root, n_scores=1, n_perfs_per_score=1, n_bars=6, seed=5,
                            with_directions=False)
    dataset = LocalScorePerformanceDataset(
        root=root, max_seq_len=MAX_SEQ, bar_sliding_window=8,
        fit_to_zero_bar=True, add_sos_eos=True, preload=True,
        sample=False, deadpan_performance=0.0,
        auxiliary_data_keys=["bars"],
    )
    collator = MixedLMScorePerformanceCollator(
        fixed_seq_len=MAX_SEQ + 2,
        mask_ignore_token_ids=[0, 1, 2, 3],
        mask_ignore_token_dims=[0, 1, 2, 4, 6, 7, 8, 9],
    )
    base_cfg = tiny_cfg()
    if cfg_transform is not None:
        cfg_transform(base_cfg)
    cfg = inject_data_config(base_cfg, dataset)
    model, model_config = MODELS.get("ScorePerformer")(**cfg)
    evaluator = ScorePerformerEvaluator(
        tokenizer=dataset.tokenizer, mode="mixlm",
        ignore_keys=["Bar", "Position", "Pitch", "Duration", "TimeSig",
                     "PositionShift", "NotesInOnset", "PositionInOnset"],
        weighted_distance=True,
    )
    config = TrainerConfig(
        output_dir=str(tmp_path / "run"),
        epochs=epochs, batch_size=2, eval_batch_size=2,
        log_strategy="no", eval_strategy="epoch", eval_steps=eval_steps,
        save_strategy="no", disable_progress=True, seed=11,
        optimization=OptimizerConfig(lr=6e-3, optimizer="adamw", grad_clip=2.0),
    )
    trainer = Trainer(
        model=model, config=config, train_dataset=dataset, eval_dataset=dataset,
        collator=collator, evaluator=evaluator, model_config=model_config,
    )
    return trainer, dataset, model


def test_overfit_one_piece_learns_performance_streams(tmp_path):
    trainer, dataset, model = _build_overfit_trainer(tmp_path, epochs=1000)

    # untrained reference accuracy (near chance)
    trainer._prepare()
    before = trainer.evaluate()
    state = trainer.train()
    evals = [l for l in state.log_history if "eval/accuracy" in l]
    assert evals, state.log_history[-3:]
    after = evals[-1]["eval/accuracy"]

    # Measured trajectories on this seed (CPU): with the original
    # gather-lookup programs 0.0 untrained -> 0.35 @600 epochs -> 0.69 @1250
    # -> ~0.95 @2500. The one-hot lookup/CE/GLU rewires are elementwise
    # bit-identical but change backward accumulation ORDER, so the mid-curve
    # trajectory shifts (measured 0.16-0.24 @600, 0.28 @1000, 0.41 @1200,
    # 0.94 @2000 on the current program; the old program still passes its old
    # bar when the flags are disabled). 1000 epochs + a 0.15 bar clears every
    # measured program variant with margin while staying ~2 min warm.
    assert after > 0.15, (before.get("eval/accuracy"), after)
    assert after > 4 * max(before.get("eval/accuracy", 0.0), 0.03), (
        before.get("eval/accuracy"), after,
    )

    # the trained weights must drive the full render pipeline
    from scoreperformer_tpu.inference.render import render_performance

    score_midi = dataset.tokenizer.score_tokens_to_midi(dataset.scores[0].copy())
    perf_midi = render_performance(
        model, {"params": trainer.params}, dataset.tokenizer, score_midi,
        rng=jax.random.PRNGKey(0), greedy=True,
    )
    notes = perf_midi.all_notes()
    assert len(notes) > 0
    true_notes = dataset.tokenizer.performance_tokens_to_midi(
        dataset.performances[0].copy()
    ).all_notes()
    # rendered velocities live in the learned range, not at the vocab edges
    assert np.abs(
        float(notes.velocity.mean()) - float(true_notes.velocity.mean())
    ) < 25.0


def test_overfit_converges_to_high_accuracy(tmp_path):
    """Convergence guard (VERDICT r3 #9): the single-piece overfit must not
    merely clear the low trajectory bar but actually CONVERGE — measured
    ~0.94 @2000 / ~0.95 @2500 epochs across every program variant (gather-
    lookup, one-hot CE, GLU two-dot). A backward-accumulation change that
    degrades late convergence (not just the mid-curve) fails this test."""
    trainer, _, _ = _build_overfit_trainer(tmp_path, epochs=2500)
    state = trainer.train()
    evals = [l for l in state.log_history if "eval/accuracy" in l]
    assert evals, state.log_history[-3:]
    final = evals[-1]["eval/accuracy"]
    assert final > 0.85, f"converged accuracy {final:.3f} (expected ~0.95)"
