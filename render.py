"""Render expressive performances from score MIDIs using a trained checkpoint.

Usage:
  # one score
  python render.py --checkpoint results/.../checkpoint_best \\
      --score score.mid --out performance.mid [--temperature 0.9] [--greedy]

  # many scores (files and/or directories of .mid) -> one coalesced batched
  # render on device; --out is a directory
  python render.py --checkpoint ... --score a.mid b.mid scores_dir/ --out perfs/
"""
import argparse
import os


def _collect_scores(args_scores):
    paths = []
    for p in args_scores:
        if os.path.isdir(p):
            paths.extend(
                sorted(
                    os.path.join(p, f) for f in os.listdir(p)
                    if f.lower().endswith((".mid", ".midi"))
                )
            )
        else:
            paths.append(p)
    if not paths:
        raise SystemExit("no scores found")
    return paths


def main():
    parser = argparse.ArgumentParser(description="ScorePerformer-TPU renderer")
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--score", required=True, nargs="+",
                        help="input score .mid file(s) and/or directories")
    parser.add_argument("--out", required=True,
                        help="output .mid (single score) or directory (several)")
    parser.add_argument("--tokenizer", default=None, help="tokenizer config.json (defaults to the dataset one next to the checkpoint)")
    parser.add_argument("--temperature", type=float, default=1.0)
    parser.add_argument("--greedy", action="store_true")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--bucket", type=int, default=128,
                        help="length bucket for the batched path")
    args = parser.parse_args()

    tokenizer_path = args.tokenizer
    if tokenizer_path is None:
        candidate = os.path.join(args.checkpoint, "tokenizer.json")
        if not os.path.exists(candidate):
            raise SystemExit("--tokenizer is required (no tokenizer.json beside the checkpoint)")
        tokenizer_path = candidate

    scores = _collect_scores(args.score)

    from scoreperformer_tpu.midi import read_midi

    if len(scores) == 1 and not os.path.isdir(args.out):
        import jax

        from scoreperformer_tpu.inference.render import (
            load_model_from_checkpoint, render_performance,
        )
        from scoreperformer_tpu.tokenizers import load_tokenizer

        model, variables, _ = load_model_from_checkpoint(args.checkpoint)
        tokenizer = load_tokenizer(tokenizer_path)
        render_performance(
            model,
            variables,
            tokenizer,
            read_midi(scores[0]),
            rng=jax.random.PRNGKey(args.seed),
            temperature=args.temperature,
            greedy=args.greedy,
            output_path=args.out,
        )
        print(f"rendered {scores[0]} -> {args.out}")
        return

    # several scores: ONE coalesced batched render (length+batch buckets)
    os.makedirs(args.out, exist_ok=True)
    from scoreperformer_tpu.inference import RenderServer

    server = RenderServer(args.checkpoint, tokenizer_path=tokenizer_path,
                          bucket=args.bucket)
    requests = []
    outs = []
    for i, p in enumerate(scores):
        stem = os.path.splitext(os.path.basename(p))[0]
        out_path = os.path.join(args.out, f"{stem}.perf.mid")
        outs.append(out_path)
        requests.append(dict(
            score_midi=read_midi(p), temperature=args.temperature,
            greedy=args.greedy, seed=args.seed + i, output_path=out_path,
        ))
    results = server.render_batch(requests)
    for p, out_path, r in zip(scores, outs, results):
        print(f"rendered {p} -> {out_path} ({r['notes']} notes, "
              f"batch {r['batched']}, {r['wall_ms']} ms)")


if __name__ == "__main__":
    main()
