"""Flash-attention A/B at the SCALE regime (dim 1024 / seq 1024 / depth 8).

Round-2 measured the Pallas flash kernel LOSING to XLA's fused attention at
the flagship shapes (dim 256 / seq 256) and `use_flash` defaults to False.
That verdict was never re-tested at the scale_1024 config, where the
attention score matrix is 16x bigger (seq 1024) and the flash kernel's
O(block) memory behavior has more traffic to save. This A/Bs the full
train step (fwd+bwd+adamw) with use_flash False/True at the bench scale
config, plus seq 2048 where the quadratic term is 4x larger again.

Run on TPU:  timeout 4000 python scripts/exp_scale_flash.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")


def measure(use_flash, batch=8, seq=1024, repeats=3):
    import jax

    from bench import measure_tpu_train

    label = f"b{batch} seq{seq} flash={use_flash}"
    t0 = time.perf_counter()
    tps, step_s, loss, n_params = measure_tpu_train(
        batch, seq, repeats=repeats, dim=1024, emb_dim=256, depth=8,
        heads=8, dim_head=128, use_flash=use_flash,
    )
    print(f"  {label}: step {step_s * 1e3:.1f} ms, {tps:,.0f} tok/s, "
          f"loss {loss:.4f} (total incl compile {time.perf_counter() - t0:.0f}s)",
          flush=True)
    return step_s


def main():
    import jax

    from scoreperformer_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    for seq in (1024, 2048):
        base = measure(False, seq=seq)
        flash = measure(True, seq=seq)
        print(f"seq {seq}: flash/base = {flash / base:.3f} "
              f"({'flash WINS' if flash < base else 'XLA wins'})", flush=True)


if __name__ == "__main__":
    main()
