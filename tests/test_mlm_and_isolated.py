import numpy as np
import pytest

import jax
import jax.numpy as jnp

from scoreperformer_tpu.models import MODELS
from scoreperformer_tpu.models.mmd import MMDTupleTransformer, MMDTupleTransformerConfig
from scoreperformer_tpu.models.factory import build_tuple_transformer_config

pytestmark = pytest.mark.slow


NUM_TOKENS = {"Bar": 16, "Position": 20, "Pitch": 24, "Velocity": 12, "Duration": 14,
              "Tempo": 10, "TimeSig": 8, "RelOnsetDev": 15, "RelPerfDuration": 13}


def tiny_transformer_cfg(**kw):
    cfg = {
        "dim": 32,
        "token_embeddings": {"_target_": "simple", "emb_dims": 16, "mode": "cat",
                             "discrete": True, "continuous": False},
        "use_abs_pos_emb": False,
        "max_seq_len": 64,
        "transformer": {"_target_": "encoder", "depth": 1, "heads": 2,
                        "attention": {"dim_head": 8}},
    }
    cfg.update(kw)
    return cfg


class TestMLMUnmask:
    @pytest.fixture(scope="class")
    def model(self):
        cfg = {
            "num_tokens": NUM_TOKENS,
            "mode": "mlm",
            "transformer": {**tiny_transformer_cfg(), "lm_head": {"_target_": "lm"}},
        }
        model, _ = MODELS.get("Performer")(**cfg)
        x = jnp.array(np.random.RandomState(0).randint(4, 8, (2, 12, len(NUM_TOKENS))))
        variables = model.init({"params": jax.random.PRNGKey(0)}, x, deterministic=True)
        return model, variables, x

    def test_single_run_fills_masks(self, model):
        from scoreperformer_tpu.models.wrappers import mlm_unmask

        m, variables, x = model
        tokens = x.at[:, 3:6, 2].set(1)
        out = mlm_unmask(m, variables, tokens, jax.random.PRNGKey(0), single_run=True)
        out = np.asarray(out)
        assert not (out == 1).any()
        # non-masked entries untouched
        keep = np.asarray(tokens) != 1
        np.testing.assert_array_equal(out[keep], np.asarray(tokens)[keep])

    def test_iterative_fills_masks_no_specials(self, model):
        from scoreperformer_tpu.models.wrappers import mlm_unmask

        m, variables, x = model
        tokens = x.at[:, 4:7, :3].set(1)
        out = mlm_unmask(
            m, variables, tokens, jax.random.PRNGKey(1), single_run=False, greedy=True
        )
        out = np.asarray(out)
        assert not (out == 1).any()
        # iterative mode forbids all special ids on sampled positions
        filled = (np.asarray(tokens) == 1)
        assert (out[filled] >= 4).all()


class TestIsolatedBarMean:
    def test_block_diagonal_isolation(self):
        """isolated_bar_mean: latents of bar i must not change when notes of
        OTHER bars change (block-diagonal attention + masked Bar tokens)."""
        cfg = build_tuple_transformer_config(
            {**tiny_transformer_cfg()}, mmd=True
        )
        cfg = cfg.replace(
            latent_dim=8, aggregate_mode="isolated_bar_mean", max_segments=20,
            lm_head=None,
        )
        model = MMDTupleTransformer(num_tokens=NUM_TOKENS, config=cfg)

        rng = np.random.RandomState(0)
        x = jnp.array(rng.randint(4, 8, (1, 12, len(NUM_TOKENS))))
        bars = jnp.array(np.repeat([4, 5, 6], 4)[None])
        x = x.at[:, :, 0].set(bars[0])

        variables = model.init(
            {"params": jax.random.PRNGKey(0), "mmd": jax.random.PRNGKey(1)},
            x, bars=bars, deterministic=True, compute_loss=False,
        )

        out1 = model.apply(variables, x, bars=bars, deterministic=True, compute_loss=False)

        # perturb the LAST bar's pitches only
        x2 = x.at[:, 8:, 2].set(9)
        out2 = model.apply(variables, x2, bars=bars, deterministic=True, compute_loss=False)

        l1 = np.asarray(out1.latents)
        l2 = np.asarray(out2.latents)
        # bars 4 and 5 (segments) unchanged; bar 6 changed
        np.testing.assert_allclose(l1[0, 4], l2[0, 4], atol=1e-6)
        np.testing.assert_allclose(l1[0, 5], l2[0, 5], atol=1e-6)
        assert np.abs(l1[0, 6] - l2[0, 6]).max() > 1e-6


class TestMMDLatentEmbeddingMaps:
    """The inference helpers mapping latents <-> per-note embeddings
    (mmd.py:422-462, reference mmd_transformer.py:388-502) must be mutual
    inverses on the populated segments."""

    @pytest.fixture(scope="class")
    def module(self):
        cfg = build_tuple_transformer_config(
            tiny_transformer_cfg(
                latent_dim=[6, 4], aggregate_mode=["mean", "bar_mean"],
                hierarchical=True, max_segments=12,
            ),
            mmd=True,
        )
        module = MMDTupleTransformer(num_tokens=NUM_TOKENS, config=cfg)
        rng = np.random.RandomState(0)
        b, t = 2, 10
        x = jnp.asarray(np.stack(
            [rng.randint(4, v, (b, t)) for v in NUM_TOKENS.values()], -1))
        bars = jnp.asarray(np.sort(rng.randint(4, 12, (b, t)), 1))
        variables = module.init(
            jax.random.PRNGKey(0), x, bars=bars,
            deterministic=True, compute_loss=False,
        )
        return module, variables, x, bars

    def test_roundtrip_latents_embeddings_latents(self, module):
        module, variables, x, bars = module
        out = module.apply(
            variables, x, bars=bars, deterministic=True, compute_loss=False
        )
        b, t = x.shape[:2]
        emb = module.apply(
            variables, out.latents, t, bars=bars,
            method="latents_to_embeddings",
        )
        np.testing.assert_allclose(
            np.asarray(emb), np.asarray(out.full_embeddings), atol=1e-6
        )
        back = module.apply(
            variables, emb, bars=bars, method="embeddings_to_latents"
        )
        # mean level: one pooled latent reproduced exactly
        np.testing.assert_allclose(
            np.asarray(back[0]), np.asarray(out.latents[0]), atol=1e-5
        )
        # bar level: populated segments round-trip; empty segments are zero
        lat = np.asarray(out.latents[1])
        got = np.asarray(back[1])
        seen = np.zeros(lat.shape[:2], bool)
        bars_np = np.asarray(bars)
        for bi in range(b):
            seen[bi, np.unique(bars_np[bi])] = True
        np.testing.assert_allclose(got[seen], lat[seen], atol=1e-5)
        assert (lat[~seen] == 0).all()
