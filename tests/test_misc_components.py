"""Coverage for small components: composer splitting, GRU classifier,
regression head, plotting helpers."""
import numpy as np

import jax
import jax.numpy as jnp


def test_split_composer_metadata_preserves_and_separates():
    """(reference datasets/utils.py:61-109): splits keep every performance,
    never divide one score's performances across splits, and are disjoint."""
    from scoreperformer_tpu.data.datasets import split_composer_metadata

    rng = np.random.RandomState(0)
    reference = {}
    for c in range(4):
        scores = {}
        for s in range(rng.randint(2, 9)):
            scores[f"c{c}_s{s}"] = [f"c{c}_s{s}_p{p}" for p in range(rng.randint(1, 5))]
        reference[f"composer_{c}"] = scores

    splits = split_composer_metadata(reference, {"train": 0.8, "eval": 0.2}, seed=7)
    assert set(splits) == {"train", "eval"}

    all_scores = {s for comp in reference.values() for s in comp}
    got_train, got_eval = set(splits["train"]), set(splits["eval"])
    assert got_train | got_eval == all_scores
    assert not (got_train & got_eval)
    # performances travel with their score, unchanged
    for split in splits.values():
        for score, perfs in split.items():
            comp = next(c for c in reference.values() if score in c)
            assert comp[score] == perfs


def test_gru_classifier_forward_and_loss():
    from scoreperformer_tpu.models.classifiers import GRUCellStack

    m = GRUCellStack(hidden_dim=16, num_classes=5)
    x = jnp.asarray(np.random.RandomState(0).randn(3, 7, 8).astype(np.float32))
    labels = jnp.asarray([0, 2, 4])
    v = m.init(jax.random.PRNGKey(0), x, labels)
    out = m.apply(v, x, labels)
    assert out.logits.shape == (3, 5)
    assert np.isfinite(float(out.loss))


def test_regression_head_outputs_scalars():
    from scoreperformer_tpu.models.embeddings import TupleTokenRegressionHead

    head = TupleTokenRegressionHead(regression_keys=("Velocity", "Tempo"))
    x = jnp.asarray(np.random.RandomState(1).randn(2, 6, 32).astype(np.float32))
    v = head.init(jax.random.PRNGKey(0), x)
    out = head.apply(v, x)
    assert set(out) == {"Velocity", "Tempo"}
    assert out["Velocity"].shape == (2, 6, 1)
    out_sub = head.apply(v, x, keys=["Tempo"])
    assert set(out_sub) == {"Tempo"}


def test_plots_render_without_display(tmp_path):
    import matplotlib

    matplotlib.use("Agg")

    from scoreperformer_tpu.data.synthetic import synthetic_score
    from scoreperformer_tpu.utils.plots import midi_to_pianoroll, plot_pianoroll

    score = synthetic_score(np.random.RandomState(0), n_bars=2)
    roll = midi_to_pianoroll(score)
    assert roll.ndim == 2 and roll.max() > 0

    fig, ax = plot_pianoroll(score)
    fig.savefig(tmp_path / "roll.png")
    assert (tmp_path / "roll.png").stat().st_size > 0


def test_plot_performance_parameter(tmp_path):
    import matplotlib

    matplotlib.use("Agg")

    from scoreperformer_tpu.data.synthetic import synthetic_score
    from scoreperformer_tpu.tokenizers import SPMupleWindow, TokenizerConfig
    from scoreperformer_tpu.utils.plots import plot_performance_parameter

    tok = SPMupleWindow(TokenizerConfig(additional_params={"max_bar_embedding": 64}))
    score = synthetic_score(np.random.RandomState(2), n_bars=3)
    seq = tok.score_tokens_as_performance(tok.score_midi_to_tokens(score)).ids
    fig = plot_performance_parameter(tok, seq, seq, token_type="Velocity")
    fig.savefig(tmp_path / "param.png")
    assert (tmp_path / "param.png").stat().st_size > 0


def test_async_checkpoint_roundtrip(tmp_path):
    """Async saves commit on a background thread; wait_for_async_saves (and
    load_checkpoint, which calls it) must see the full payload. Repeated async
    saves into the same rewritten directory must not race their own cleanup."""
    from scoreperformer_tpu.training import (
        load_checkpoint,
        save_checkpoint,
        wait_for_async_saves,
    )

    params = {"w": np.arange(12.0).reshape(3, 4), "b": {"x": np.ones(5)}}
    opt_state = {"mu": np.full((3, 4), 0.25)}
    path = str(tmp_path / "ck_async")

    save_checkpoint(path, params, opt_state=opt_state,
                    trainer_state={"global_step": 7}, use_async=True)
    # overwrite the same directory immediately — exercises the wait-then-rmtree
    params2 = jax.tree.map(lambda x: x * 2.0, params)
    save_checkpoint(path, params2, opt_state=opt_state,
                    trainer_state={"global_step": 8}, use_async=True)
    wait_for_async_saves()

    loaded = load_checkpoint(path)
    assert loaded["trainer_state"]["global_step"] == 8
    for a, b in zip(jax.tree.leaves(params2), jax.tree.leaves(loaded["params"])):
        assert np.allclose(a, b)
    for a, b in zip(jax.tree.leaves(opt_state), jax.tree.leaves(loaded["opt_state"])):
        assert np.allclose(a, b)
