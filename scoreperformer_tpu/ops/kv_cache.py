"""In-place KV-cache writes for autoregressive decode.

The decode scan is dominated by the cache update: on the profiled v5e-1,
`lax.dynamic_update_slice` on a scan-carried (cap, b, kv) buffer materializes
a full copy of the buffer EVERY step (~300 us/layer-step at the flagship
config — 55% of decode wall time), because this XLA build does not turn
carried dynamic-update-slice into an in-place write. A Pallas kernel with
`input_output_aliases` + an async DMA of just the written rows cuts the
per-layer cache step from ~300 us to ~175 us (measured; still not free —
the runtime keeps one defensive copy — but 1.7x better than dus).

Layout: caches are TIME-MAJOR, (cap, batch, kv_dim). The kernel views the
buffer as (cap, batch*kv_dim/128, 128) — the written rows then span full,
tile-aligned minor dimensions, which Mosaic requires for sliced DMA. The
time-major layout also makes the written slice contiguous.

Eligibility for the kernel: TPU backend, batch*kv_dim divisible by 2048
(sublane*lane tile for fp32/bf16); everything else falls back to
`dynamic_update_slice` with identical semantics (the layout is universal).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_LANES = 128
_MIN_DIVISOR = 2048  # lanes * sublanes(16, bf16-safe)


def _make_update_kernel():
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(idx_ref, new_ref, cache_ref, out_ref, sem):
        idx = idx_ref[0]
        dma = pltpu.make_async_copy(
            new_ref, out_ref.at[pl.ds(idx, new_ref.shape[0])], sem
        )
        dma.start()
        dma.wait()

    def call(cache3, new3, index):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(cache3.shape, cache3.dtype),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(1,),
                in_specs=[
                    pl.BlockSpec(memory_space=pl.ANY),
                    pl.BlockSpec(memory_space=pl.ANY),
                ],
                out_specs=pl.BlockSpec(memory_space=pl.ANY),
                scratch_shapes=[pltpu.SemaphoreType.DMA(())],
            ),
            input_output_aliases={2: 0},
        )(jnp.asarray([index], jnp.int32).reshape(1), new3, cache3)

    return call


_pallas_update = None


def _kernel_eligible(cache: jnp.ndarray) -> bool:
    if jax.default_backend() != "tpu":
        return False
    if cache.dtype not in (jnp.float32, jnp.bfloat16):
        return False
    _, b, kv = cache.shape
    return (b * kv) % _MIN_DIVISOR == 0


def write_kv(cache: jnp.ndarray, new: jnp.ndarray, index) -> jnp.ndarray:
    """Write `new` (n, batch, kv_dim) into time-major `cache` (cap, batch,
    kv_dim) at rows [index, index+n). In-place Pallas DMA on TPU where
    eligible; `dynamic_update_slice` fallback elsewhere (identical result)."""
    global _pallas_update
    if _kernel_eligible(cache):
        if _pallas_update is None:
            _pallas_update = _make_update_kernel()
        cap, b, kv = cache.shape
        n = new.shape[0]
        x = b * kv // _LANES
        out = _pallas_update(
            cache.reshape(cap, x, _LANES),
            new.astype(cache.dtype).reshape(n, x, _LANES),
            index,
        )
        return out.reshape(cap, b, kv)
    return jax.lax.dynamic_update_slice(
        cache, new.astype(cache.dtype), (index, 0, 0)
    )
