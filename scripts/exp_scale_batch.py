"""Scale levers, part 2: what MAX BATCH does each lever unlock at dim 1024,
and what is the best end-to-end tok/s per lever once batch is free?

Part 1 (exp_scale.py) showed at batch 8 / seq 1024 / 226M params plain fp32
wins a fixed-batch race (TPU matmuls already run bf16 on the MXU at default
precision, so casting params only adds a per-step cast; remat recomputes).
bf16/remat are MEMORY levers: this sweep doubles batch per variant until OOM
and reports the best throughput each lever family reaches.

    timeout 5400 python scripts/exp_scale_batch.py
"""
import sys

sys.path.insert(0, "/root/repo")

from exp_scale import measure_variant  # noqa: E402


def main():
    SEQ = 1024
    results = {}
    for name, bf16, remat, flash in [
        ("fp32", False, False, False),
        ("bf16", True, False, False),
        ("bf16+remat", True, True, False),
    ]:
        best = None
        for batch in (16, 32, 64, 128):
            dt = measure_variant(f"{name}@b{batch}", batch, SEQ, bf16, remat,
                                 flash)
            if dt is None:
                break
            best = (batch, SEQ * batch / dt)
        results[name] = best
    print("BEST per lever:", results, flush=True)


if __name__ == "__main__":
    main()
