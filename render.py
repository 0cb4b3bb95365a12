"""Render an expressive performance from a score MIDI using a trained checkpoint.

Usage:
  python render.py --checkpoint results/.../checkpoint_best \\
      --score score.mid --out performance.mid [--temperature 0.9] [--greedy]
"""
import argparse


def main():
    parser = argparse.ArgumentParser(description="ScorePerformer-TPU renderer")
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--score", required=True, help="input score .mid")
    parser.add_argument("--out", required=True, help="output performance .mid")
    parser.add_argument("--tokenizer", default=None, help="tokenizer config.json (defaults to the dataset one next to the checkpoint)")
    parser.add_argument("--temperature", type=float, default=1.0)
    parser.add_argument("--greedy", action="store_true")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    import jax

    from scoreperformer_tpu.inference.render import load_model_from_checkpoint, render_performance
    from scoreperformer_tpu.midi import read_midi
    from scoreperformer_tpu.tokenizers import load_tokenizer

    model, variables, _ = load_model_from_checkpoint(args.checkpoint)
    tokenizer_path = args.tokenizer
    if tokenizer_path is None:
        import os

        candidate = os.path.join(args.checkpoint, "tokenizer.json")
        if not os.path.exists(candidate):
            raise SystemExit("--tokenizer is required (no tokenizer.json beside the checkpoint)")
        tokenizer_path = candidate
    tokenizer = load_tokenizer(tokenizer_path)

    score = read_midi(args.score)
    render_performance(
        model,
        variables,
        tokenizer,
        score,
        rng=jax.random.PRNGKey(args.seed),
        temperature=args.temperature,
        greedy=args.greedy,
        output_path=args.out,
    )
    print(f"rendered {args.score} -> {args.out}")


if __name__ == "__main__":
    main()
