"""Standalone Performer LM: training + AR generation end-to-end."""
import numpy as np
import pytest

import jax

from scoreperformer_tpu.data import (
    LMPerformanceCollator,
    PerformanceDataset,
    performer_model_inputs,
)
from scoreperformer_tpu.data.synthetic import build_synthetic_dataset
from scoreperformer_tpu.models import MODELS
from scoreperformer_tpu.training import OptimizerConfig, Trainer, TrainerConfig, inject_data_config

pytestmark = pytest.mark.slow


def performer_cfg():
    return {
        "_name_": "Performer",
        "mode": "clm",
        "transformer": {
            "dim": 32,
            "max_seq_len": 50,
            "token_embeddings": {
                "_target_": "simple", "emb_dims": 16, "mode": "cat", "emb_norm": True,
                "discrete": False, "continuous": True, "continuous_dense": True,
                "discrete_ids": [0, 1, 2, 3],
            },
            "emb_norm": True,
            "use_abs_pos_emb": False,
            "transformer": {
                "_target_": "decoder", "depth": 1, "heads": 2,
                "attention": {"dim_head": 8, "one_kv_head": True,
                              "alibi_pos_bias": True, "alibi_learned": True},
                "feed_forward": {"mult": 2, "glu": True, "swish": True},
            },
            "lm_head": {"_target_": "lm-tied"},
        },
    }


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("perflm"))
    build_synthetic_dataset(root, n_scores=2, n_perfs_per_score=2, n_bars=8, seed=17,
                            with_directions=False)
    dataset = PerformanceDataset(
        root=root, max_seq_len=48, bar_sliding_window=8,
        fit_to_zero_bar=True, add_sos_eos=True, sample=True,
    )
    collator = LMPerformanceCollator(fixed_seq_len=50)
    cfg = inject_data_config(
        {k: v for k, v in performer_cfg().items() if not k.startswith("_")}, dataset
    )
    model, model_config = MODELS.get("Performer")(**cfg)
    return dataset, collator, model, model_config


class TestPerformerTraining:
    def test_train_and_generate(self, setup, tmp_path):
        dataset, collator, model, model_config = setup
        config = TrainerConfig(
            output_dir=str(tmp_path / "run"), epochs=4, batch_size=4,
            eval_batch_size=4, log_strategy="epoch", eval_strategy="no",
            save_strategy="no", disable_progress=True,
            optimization=OptimizerConfig(lr=3e-3, optimizer="adamw", grad_clip=2.0),
        )
        trainer = Trainer(
            model=model, config=config, train_dataset=dataset,
            collator=collator, model_config=model_config,
            input_fn=performer_model_inputs,
        )
        state = trainer.train()
        logs = [l for l in state.log_history if "train/loss" in l]
        assert len(logs) >= 2
        assert logs[-1]["train/loss"] < logs[0]["train/loss"]

        # AR generation through the shared wrapper machinery
        from scoreperformer_tpu.models.wrappers import ar_generate

        start = np.asarray(dataset[0].perf[:4])[None]
        gen, num = ar_generate(
            model, {"params": trainer.params}, jax.numpy.asarray(start), seq_len=16,
            rng=jax.random.PRNGKey(0), greedy=True,
            stream_names=list(dataset.tokenizer.types_idx.keys()),
        )
        gen = np.asarray(gen)
        assert gen.shape[1] == 13
        # constraints hold
        n = int(num[0])
        prev = np.concatenate([start[0, -1:, 0], gen[0, : n - 1, 0]])
        live = gen[0, :n, 0] != 3
        assert ((gen[0, :n, 0] >= prev) | ~live).all()
