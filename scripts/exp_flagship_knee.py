"""Flagship train-batch knee with the amortized methodology (VERDICT r4 #7).

bench.py pins the flagship train step at b128/seq256 (MFU 0.134, explained
as small-dim overhead); "compute-saturated" at the flagship was asserted
from the dim-1024 b8/b16 sweep, never measured at dim 256. This sweeps
b128 -> b512 with the round-4 amortized methodology (K chained donated
steps minus one fetch RTT) and reports per-sample scaling vs the b128
anchor. Knee = the last batch whose ideal-normalized scaling stays >= 0.95.

Run on the TPU:  timeout 5000 python scripts/exp_flagship_knee.py
Results recorded in BASELINE.md round 5; if the knee moves past 128,
bench.py's flagship train entry should move with it.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

from scoreperformer_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

from bench import measure_tpu_train

SEQ = 256
BATCHES = (128, 192, 256, 384, 512)


def main():
    print(f"flagship train-batch sweep, seq {SEQ}", flush=True)
    anchor = None
    for b in BATCHES:
        t0 = time.perf_counter()
        try:
            tps, step_s, loss, n_params = measure_tpu_train(b, SEQ)
        except Exception as e:  # remote-compile helper can 500 on big programs
            print(f"RESULT b{b}: FAILED — {type(e).__name__}: {e}", flush=True)
            continue
        if anchor is None:
            anchor = (b, step_s)
        b0, s0 = anchor
        ideal = s0 * b / b0
        print(
            f"RESULT b{b}: {step_s*1e3:.1f} ms/step  {tps/1e3:.1f}k tok/s  "
            f"scaling {ideal/step_s:.3f}x ideal-normalized  "
            f"loss={loss:.4f}  (total {time.perf_counter()-t0:.0f}s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
