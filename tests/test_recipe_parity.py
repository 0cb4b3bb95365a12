"""Value-level parity of shipped recipes against the reference YAMLs.

`tests/test_recipes.py` checks that recipes build; this suite checks that the
resolved leaf VALUES match the reference experiment configs
(/root/reference/recipes), so silent drifts in training-distribution knobs
(e.g. `sample_bars`) cannot slip through. Divergences must be listed in the
documented allowlists below.
"""
import os
from pathlib import Path

import pytest

from scoreperformer_tpu.configs.config import merge_configs
from scoreperformer_tpu.configs.yaml_loader import (
    interpolate,
    load_experiment_config,
    load_yaml,
    prune_disabled,
)

REFERENCE_RECIPES = Path("/root/reference/recipes")
REPO_RECIPES = Path(__file__).resolve().parent.parent / "recipes"

RECIPES = [
    "scoreperformer/base.yaml",
    "scoreperformer/minimal.yaml",
    "scoreperformer/no_classifiers.yaml",
    "scoreperformer/custom_hierarchy.yaml",
    "scoreperformer/ablation/no_cont_tokens.yaml",
    "scoreperformer/ablation/no_io_tie.yaml",
    "scoreperformer/ablation/no_masked_seq.yaml",
    "scoreperformer/ablation/no_saln.yaml",
    "scoreperformer/ablation/no_score_enc.yaml",
]

# leaf paths allowed to differ (documented divergences)
VALUE_ALLOWLIST = {
    "model._version_",  # repo versions independently
}
# reference-only leaves the repo intentionally does not carry
REFERENCE_ONLY_ALLOWLIST = {
    "data.dataset.num_workers",  # torch DataLoader knobs
    "model.score_encoder.token_embeddings.tie_keys",  # null placeholders
    "model.perf_encoder.token_embeddings.tie_keys",
    "model.perf_decoder.token_embeddings.tie_keys",
    "model.perf_decoder.style_emb_dim",  # repo: derived via interpolation too
    "model.perf_decoder.regression_head.regression_keys",  # _disable_d node
}
# repo-only leaves (static-shape additions and TPU-native knobs)
REPO_ONLY_ALLOWLIST = {
    "model.score_encoder.max_seq_len",  # fixed shapes: one compiled program
    "model.perf_encoder.max_seq_len",
    "model.perf_decoder.max_seq_len",
    "model.perf_encoder.max_segments",
    "model.score_encoder.transformer.attention.max_seq_len",
    "model.perf_encoder.transformer.attention.max_seq_len",
    "model.perf_decoder.transformer.attention.max_seq_len",
}


def resolve_reference_config(name: str) -> dict:
    """Resolve a reference recipe with the reference's own semantics:
    ``base:`` paths are relative to the recipes ROOT (components.py:30-46),
    then `_disable_` pruning and `${...}` interpolation."""
    config = load_yaml(REFERENCE_RECIPES / name)
    chain = [config]
    while chain[-1].get("base"):
        chain.append(load_yaml(REFERENCE_RECIPES / chain[-1].pop("base")))
    merged: dict = {}
    for cfg in reversed(chain):
        merged = merge_configs(merged, cfg)
    merged = prune_disabled(merged)
    try:
        return interpolate(merged)
    except KeyError:
        # reference interpolations may use resolvers we don't model (dates,
        # output dirs); interpolate subtree-by-subtree and keep what resolves
        out = {}
        for key, sub in merged.items():
            try:
                out[key] = interpolate(sub, merged)
            except KeyError:
                out[key] = sub
        return out


def flatten(tree, prefix=""):
    out = {}
    for key, value in (tree or {}).items():
        path = f"{prefix}.{key}" if prefix else str(key)
        if isinstance(value, dict):
            out.update(flatten(value, path))
        else:
            out[path] = value
    return out


def normalize(value):
    if isinstance(value, str) and value == "???":
        return "???"
    if isinstance(value, float) and float(value).is_integer():
        return value  # keep floats comparable to ints via ==
    return value


@pytest.mark.skipif(not REFERENCE_RECIPES.exists(), reason="reference tree absent")
@pytest.mark.parametrize("name", RECIPES)
def test_recipe_leaf_values_match_reference(name):
    ref = resolve_reference_config(name)
    repo = load_experiment_config(REPO_RECIPES, name)

    for section in ("data", "model", "evaluator"):
        ref_leaves = flatten(ref.get(section), section)
        repo_leaves = flatten(repo.get(section), section)

        for path, ref_value in ref_leaves.items():
            if path in VALUE_ALLOWLIST or path in REFERENCE_ONLY_ALLOWLIST:
                continue
            assert path in repo_leaves, f"{name}: missing reference leaf {path}"
            assert normalize(repo_leaves[path]) == normalize(ref_value), (
                f"{name}: {path} = {repo_leaves[path]!r}, reference {ref_value!r}"
            )

        extra = set(repo_leaves) - set(ref_leaves) - REPO_ONLY_ALLOWLIST
        assert not extra, f"{name}: undocumented repo-only leaves {sorted(extra)}"


@pytest.mark.skipif(not REFERENCE_RECIPES.exists(), reason="reference tree absent")
@pytest.mark.parametrize("name", RECIPES)
def test_trainer_shared_keys_match_reference(name):
    """Trainer sections are architecture-specific (torch host loop vs the TPU
    trainer); keys present in BOTH must still agree."""
    ref = flatten(resolve_reference_config(name).get("trainer"), "trainer")
    repo = flatten(load_experiment_config(REPO_RECIPES, name).get("trainer"), "trainer")
    for path in set(ref) & set(repo):
        if path in VALUE_ALLOWLIST or path.endswith("output_dir"):
            continue
        assert normalize(repo[path]) == normalize(ref[path]), (
            f"{name}: {path} = {repo[path]!r}, reference {ref[path]!r}"
        )
