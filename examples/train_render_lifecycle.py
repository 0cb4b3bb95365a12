"""End-to-end lifecycle on a synthetic dataset: prepare -> train -> render.

The script-sized counterpart of the reference's Colab demo: it builds a tiny
synthetic score/performance corpus, trains the smoke ScorePerformer recipe
for a few epochs, and renders a fresh score with the trained checkpoint.

Run (CPU is fine):
    python examples/train_render_lifecycle.py [--epochs 6] [--out /tmp/sp_example]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--epochs", type=int, default=6)
    parser.add_argument("--out", default="/tmp/sp_example")
    args = parser.parse_args()

    import jax

    if jax.default_backend() not in ("tpu",):
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from scoreperformer_tpu.data.synthetic import build_synthetic_dataset, synthetic_score
    from scoreperformer_tpu.inference.render import (
        load_model_from_checkpoint, render_performance,
    )
    from scoreperformer_tpu.midi import write_midi
    from scoreperformer_tpu.tokenizers import load_tokenizer
    from scoreperformer_tpu.training import ExperimentComponents

    data_root = os.path.join(args.out, "data")
    run_dir = os.path.join(args.out, "run")

    # 1) synthetic corpus (scores + expressive performances + directions)
    if not os.path.exists(os.path.join(data_root, "metadata.json")):
        build_synthetic_dataset(data_root, n_scores=4, n_perfs_per_score=2,
                                n_bars=12, seed=1, splits=True)
    print(f"dataset at {data_root}")

    # 2) train the smoke recipe against it
    comps = ExperimentComponents.from_yaml("recipes", "smoke.yaml")
    comps.config["data"]["dataset"]["root"] = data_root
    comps.config["data"]["dataset"]["performance_directions"] = os.path.join(
        data_root, "direction_classes.json")
    comps.config["data"]["dataset"]["score_directions_dict"] = os.path.join(
        data_root, "score_directions.json")
    comps.init_components()
    comps.trainer.config.epochs = args.epochs
    comps.trainer.config.output_dir = run_dir
    state = comps.trainer.train()
    losses = [l for l in state.log_history if "train/loss" in l]
    print(f"trained {args.epochs} epochs: loss {losses[0]['train/loss']:.3f} -> "
          f"{losses[-1]['train/loss']:.3f}")

    # 3) render a brand-new score with the trained checkpoint
    ckpt = os.path.join(run_dir, "checkpoint_last")
    model, variables, _ = load_model_from_checkpoint(ckpt)
    tokenizer = load_tokenizer(os.path.join(ckpt, "tokenizer.json"))

    score = synthetic_score(np.random.RandomState(99), n_bars=8)
    score_path = os.path.join(args.out, "new_score.mid")
    perf_path = os.path.join(args.out, "rendered_performance.mid")
    write_midi(score, score_path)
    perf = render_performance(model, variables, tokenizer, score,
                              rng=jax.random.PRNGKey(3), output_path=perf_path)
    print(f"rendered {perf.num_notes} notes: {score_path} -> {perf_path}")


if __name__ == "__main__":
    main()
