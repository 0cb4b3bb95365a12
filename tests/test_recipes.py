"""Every recipe YAML builds real ExperimentComponents.

Exercises the full recipe tree (mirroring reference recipes/scoreperformer/**,
incl. the paper's 5 ablations) through the `base:`-inheritance, `_disable_`
pruning and `${...}` interpolation machinery, against a synthetic dataset.
"""
import os
from pathlib import Path

import pytest

from scoreperformer_tpu.configs import load_experiment_config
from scoreperformer_tpu.training.components import ExperimentComponents

RECIPES_ROOT = Path(__file__).resolve().parent.parent / "recipes"
ALL_RECIPES = sorted(
    str(p.relative_to(RECIPES_ROOT)) for p in RECIPES_ROOT.rglob("*.yaml")
)
BUILDABLE = [r for r in ALL_RECIPES if r != "default.yaml"]  # default is a pure base


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    from scoreperformer_tpu.data.synthetic import build_synthetic_dataset

    root = str(tmp_path_factory.mktemp("recipes_data"))
    build_synthetic_dataset(root, n_scores=2, n_perfs_per_score=2, n_bars=8,
                            seed=11, splits=True)
    return root


def test_recipe_tree_matches_reference():
    """The reference's scoreperformer recipe family is fully ported."""
    expected = {
        "scoreperformer/base.yaml",
        "scoreperformer/minimal.yaml",
        "scoreperformer/no_classifiers.yaml",
        "scoreperformer/custom_hierarchy.yaml",
        "scoreperformer/ablation/no_saln.yaml",
        "scoreperformer/ablation/no_score_enc.yaml",
        "scoreperformer/ablation/no_masked_seq.yaml",
        "scoreperformer/ablation/no_cont_tokens.yaml",
        "scoreperformer/ablation/no_io_tie.yaml",
    }
    assert expected.issubset(set(ALL_RECIPES)), sorted(expected - set(ALL_RECIPES))


@pytest.mark.parametrize("name", BUILDABLE)
def test_build_components_for_recipe(name, synth_root):
    cfg = load_experiment_config(RECIPES_ROOT, name)

    ds = cfg["data"]["dataset"]
    ds["root"] = synth_root
    for key in ("performance_directions", "score_directions_dict"):
        if ds.get(key):
            fname = "direction_classes.json" if key == "performance_directions" \
                else "score_directions.json"
            ds[key] = os.path.join(synth_root, fname)
    # synthetic pieces are short: shrink windows so sampling stays valid
    ds["max_seq_len"] = min(int(ds.get("max_seq_len", 256)), 48)
    ds["bar_sliding_window"] = min(int(ds.get("bar_sliding_window", 16)), 8)

    comps = ExperimentComponents(config=cfg)
    train_ds, _ = comps.build_datasets()
    assert len(train_ds) > 0
    sample = train_ds[0]
    assert sample is not None

    collator = comps.build_collator()
    model = comps.build_model()
    assert model is not None and comps.model_config is not None
    comps.build_evaluator()

    # a batch actually collates under this config
    batch = collator([train_ds[i] for i in range(min(2, len(train_ds)))])
    assert batch is not None


ARCH_VARIANTS = [
    "scoreperformer/moe.yaml",
    "scoreperformer/no_classifiers.yaml",
    "scoreperformer/ablation/no_saln.yaml",
    "scoreperformer/ablation/no_score_enc.yaml",
    "scoreperformer/ablation/no_masked_seq.yaml",
    "scoreperformer/ablation/no_cont_tokens.yaml",
    "scoreperformer/ablation/no_io_tie.yaml",
]


def _shrink_model(model_cfg):
    model_cfg["dim"] = 32
    for key in ("score_encoder", "perf_encoder", "perf_decoder"):
        node = model_cfg.get(key)
        if not node:
            continue
        node.setdefault("token_embeddings", {})["emb_dims"] = 16
        node["max_seq_len"] = 50
        node["transformer"].update(depth=1, heads=2)
        node["transformer"].setdefault("attention", {})["dim_head"] = 8
    if model_cfg.get("perf_encoder"):
        model_cfg["perf_encoder"]["latent_dim"] = [8, 6, 4, 2]
        model_cfg["perf_encoder"]["max_segments"] = 64


@pytest.mark.slow
@pytest.mark.parametrize("name", ARCH_VARIANTS)
def test_ablation_architectures_run_forward(name, synth_root):
    """Each ablated architecture inits and runs a training forward pass."""
    import jax

    from scoreperformer_tpu.data.collators import scoreperformer_model_inputs

    cfg = load_experiment_config(RECIPES_ROOT, name)
    ds = cfg["data"]["dataset"]
    ds["root"] = synth_root
    for key in ("performance_directions", "score_directions_dict"):
        if ds.get(key):
            fname = "direction_classes.json" if key == "performance_directions" \
                else "score_directions.json"
            ds[key] = os.path.join(synth_root, fname)
    ds["max_seq_len"] = 48
    ds["bar_sliding_window"] = 8
    _shrink_model(cfg["model"])

    comps = ExperimentComponents(config=cfg)
    train_ds, _ = comps.build_datasets()
    collator = comps.build_collator()
    model = comps.build_model()

    batch = scoreperformer_model_inputs(collator([train_ds[i] for i in range(2)]))
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
            "latent_dropout": jax.random.PRNGKey(2), "mmd": jax.random.PRNGKey(3)}
    variables = model.init(rngs, **batch, deterministic=True)
    out = model.apply(variables, **batch, deterministic=True,
                      rngs={"mmd": jax.random.PRNGKey(4)})
    assert float(out.loss) == float(out.loss)  # finite, not NaN


def test_ablation_configs_take_effect(synth_root):
    """`_disable_` and override semantics on the real ablation YAMLs."""
    def load(name):
        cfg = load_experiment_config(RECIPES_ROOT, name)
        return cfg["model"]

    assert "classifiers" not in load("scoreperformer/no_classifiers.yaml")
    assert "score_encoder" not in load("scoreperformer/ablation/no_score_enc.yaml")

    m = load("scoreperformer/ablation/no_masked_seq.yaml")
    te = m["perf_decoder"]["token_embeddings"]
    assert te["_target_"] == "simple" and "multiseq_mode" not in te

    m = load("scoreperformer/ablation/no_cont_tokens.yaml")
    te = m["perf_decoder"]["token_embeddings"]
    assert te["discrete"] and not te["continuous"] and not te["continuous_dense"]

    assert (
        load("scoreperformer/ablation/no_io_tie.yaml")["perf_decoder"]["lm_head"]["_target_"]
        == "lm"
    )
    assert (
        load("scoreperformer/ablation/no_saln.yaml")["perf_decoder"]["style_emb_mode"]
        == "cat"
    )
