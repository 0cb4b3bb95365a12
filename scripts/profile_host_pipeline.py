"""Profile the host-side input pipeline at flagship shapes.

The jitted train step runs at ~96 ms on the v5e chip (batch 128, seq 256).
Training is end-to-end bound by max(device step, host batch production /
overlap). This measures the host side on its own: per-sample dataset.get,
collation, and full-batch production, against the device-step budget.

Run (CPU, no jax needed): python scripts/profile_host_pipeline.py
"""
import cProfile
import io
import os
import pstats
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

ROOT = "/tmp/sp_hostprof_data"
BATCH, SEQ = 128, 256


def main():
    from scoreperformer_tpu.data.synthetic import build_synthetic_dataset
    from scoreperformer_tpu.training.components import ExperimentComponents

    if not os.path.exists(os.path.join(ROOT, "metadata.json")):
        t0 = time.perf_counter()
        build_synthetic_dataset(ROOT, n_scores=4, n_perfs_per_score=2,
                                n_bars=96, splits=True)
        print(f"dataset built in {time.perf_counter() - t0:.1f}s", flush=True)

    comps = ExperimentComponents.from_yaml("/root/repo/recipes",
                                           "scoreperformer/base.yaml")
    # point the flagship recipe at the synthetic data
    dcfg = comps.config["data"]["dataset"]
    dcfg["root"] = ROOT
    dcfg["performance_directions"] = os.path.join(ROOT, "direction_classes.json")
    dcfg["score_directions_dict"] = os.path.join(ROOT, "score_directions.json")
    dcfg["max_seq_len"] = SEQ
    comps.build_datasets()
    comps.build_collator()
    dataset, collator = comps.train_dataset, comps.collator
    print(f"dataset len={len(dataset)}", flush=True)

    rng = np.random.RandomState(0)
    idx = rng.randint(0, len(dataset), size=BATCH)

    # warm caches (lazy token loads)
    samples = [dataset.get(int(i), rng=np.random.RandomState(i)) for i in idx]
    _ = collator(samples)

    # per-sample get
    t0 = time.perf_counter()
    reps = 3
    for r in range(reps):
        samples = [dataset.get(int(i), rng=np.random.RandomState(r * 1000 + i))
                   for i in idx]
    get_ms = (time.perf_counter() - t0) / reps * 1000
    t0 = time.perf_counter()
    for _ in range(reps):
        batch = collator(samples)
    col_ms = (time.perf_counter() - t0) / reps * 1000

    print(f"dataset.get x{BATCH}: {get_ms:.1f} ms/batch "
          f"({get_ms / BATCH * 1000:.0f} us/sample)", flush=True)
    print(f"collator(batch):     {col_ms:.1f} ms/batch", flush=True)
    print(f"total host:          {get_ms + col_ms:.1f} ms/batch "
          f"vs ~96 ms device step", flush=True)

    # attribute the get cost
    pr = cProfile.Profile()
    pr.enable()
    for i in idx:
        dataset.get(int(i), rng=np.random.RandomState(int(i)))
    pr.disable()
    s = io.StringIO()
    pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(25)
    print(s.getvalue(), flush=True)


if __name__ == "__main__":
    main()
