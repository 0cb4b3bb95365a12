"""Break down the post-window-shift SLO window cost on the TPU.

The round-5 SLO traces (exp_streaming_slo.py) showed every at-cap window
paying ~200-330 ms with the device math accounting for only ~40 ms. This
isolates the phases of one steady-state window at the context cap:

  A. reset + catch-up consume of RETAINED rows (synced)      [padded chunks]
  B. one decode_block(16) after the synced consume           [fn + device_get]
  C. the production order: consume (async) + block, one sync
  D. K back-to-back block calls, amortized (pure block cost)
  E. device_get of a tiny resident array (fetch RTT floor)

Run on the TPU:  timeout 3000 python scripts/exp_slo_breakdown.py [--scale]
Results: BASELINE.md round 5 (streaming SLO section).
"""
import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

from scoreperformer_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

import jax
import numpy as np

from exp_streaming_slo import MAX_SEQ, flagship_cfg, scale_cfg
from exp_scale_catchup import build

RETAINED = 180  # build() materializes N_CATCHUP+8 = 208 rows
BLOCK_N = 16
REPS = 6


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", action="store_true")
    args = ap.parse_args()

    from scoreperformer_tpu.inference.generator import StreamingDecoder

    cfg_fn = scale_cfg if args.scale else flagship_cfg
    model, variables, rows, style, ctx = build(cfg_fn)
    n_streams = rows.shape[1]
    masked = rows.copy()
    # the sampled streams at the SLO config: all dims NOT mask-ignored by
    # the collator ([0,1,2,4,6,7,8,9]) -> {3, 5, 10, 11}
    from scoreperformer_tpu.models.wrappers import _stream_order
    from scoreperformer_tpu.tokenizers import MASK

    keys = list(_stream_order(model))
    mask_cols = tuple((s, keys[s]) for s in (3, 5, 10, 11))

    masked_blk = rows.copy()
    masked_blk[:, [c for c, _ in mask_cols]] = MASK

    dec = StreamingDecoder(model, variables, MAX_SEQ, n_streams)
    rng = jax.random.PRNGKey(0)

    def one_window(sync_consume):
        dec.reset()
        dec.caches = dec._init_cache()
        t0 = time.perf_counter()
        dec._consume_to(rows, masked, style, ctx, RETAINED, need_logits=False)
        if sync_consume:
            jax.block_until_ready(dec.caches)
        t1 = time.perf_counter()
        out = dec.decode_block(
            rows, masked_blk, style, ctx, RETAINED, BLOCK_N, RETAINED,
            rng, False, 1.0, None, mask_cols,
        )
        assert out is not None
        t2 = time.perf_counter()
        return t1 - t0, t2 - t1

    # warm every program
    one_window(True)

    for label, sync in (("A+B synced", True), ("C production", False)):
        cs, bs = [], []
        for _ in range(REPS):
            c, b = one_window(sync)
            cs.append(c * 1e3)
            bs.append(b * 1e3)
        print(f"{label}: consume {np.median(cs):7.1f} ms  block {np.median(bs):7.1f} ms"
              f"  (consume reps {['%.0f' % x for x in cs]}, block {['%.0f' % x for x in bs]})",
              flush=True)

    # D: amortized back-to-back blocks (no reset, walk the cache forward)
    dec.reset()
    dec.caches = dec._init_cache()
    dec._consume_to(rows, masked, style, ctx, 64, need_logits=False)
    jax.block_until_ready(dec.caches)
    K = 8
    t0 = time.perf_counter()
    pos = 64
    for _ in range(K):
        out = dec.decode_block(rows, masked_blk, style, ctx, pos, BLOCK_N,
                               pos, rng, False, 1.0, None, mask_cols)
        assert out is not None
        pos += BLOCK_N
    wall = (time.perf_counter() - t0) / K
    print(f"D amortized block (K={K}, incl per-block device_get): {wall * 1e3:7.1f} ms",
          flush=True)

    # E: fetch RTT floor — device_get of a tiny ready array
    tiny = jax.block_until_ready(jax.numpy.zeros((4,)))
    for _ in range(2):
        t0 = time.perf_counter()
        jax.device_get(tiny)
        rtt = time.perf_counter() - t0
    print(f"E fetch RTT floor: {rtt * 1e3:7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
