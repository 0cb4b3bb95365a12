"""Pallas TPU flash attention with in-kernel ALiBi bias.

The training hot path (SURVEY §2 "native equivalents"): fuses QK^T, ALiBi bias
generation, causal + padding masking, online softmax, and PV into one VMEM-
resident kernel. Unlike the XLA path (and the reference attend.py:58-126),
the (heads, t, t) ALiBi bias tensor is never materialized in HBM — slopes ride
in SMEM and the bias is generated from block indices inside the kernel.

Supports multi-query attention (single KV head) by broadcasting the KV block
across query heads at zero memory cost.

Forward grid: (batch * heads, num_q_blocks); K/V are streamed block-by-block
with an online-softmax accumulator (the standard flash algorithm), and causal
query blocks skip key blocks past the diagonal.

Backward: two fully-blocked kernels (the standard flash recipe, recomputing P
from the saved logsumexp):
  - dKV kernel, grid (b*h, kv_block, q_block): dK/dV accumulate over the
    innermost q dimension;
  - dQ kernel, grid (b*h, q_block, kv_block): dQ and the learned-ALiBi slope
    grads accumulate over the innermost kv dimension.
Each step touches only (block, d) tiles, so VMEM use is independent of the
sequence length (the earlier whole-row variant OOMed scoped VMEM at t=2048).

MXU precision is configurable: "default" (bf16 multiply passes, XLA's default
on TPU — measured faster than the fused XLA attention at the flagship's
t=258) or "highest" (6-pass fp32, used by the numerical parity tests;
validated ≤5e-5 max rel. error vs the fp32 reference on real TPU).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30

_PRECISIONS = {
    "default": jax.lax.Precision.DEFAULT,
    "high": jax.lax.Precision.HIGH,
    "highest": jax.lax.Precision.HIGHEST,
}


def _flash_kernel(
    slope_ref,  # (b*h,) SMEM: per-(b,h) ALiBi slopes (full array, program-indexed)
    q_ref,  # (1, block_q, d) VMEM
    k_ref,  # (1, t_k, d) VMEM (full keys for this b[,h])
    v_ref,  # (1, t_k, d) VMEM
    mask_ref,  # (1, 1, t_k) VMEM bool: key validity
    o_ref,  # (1, block_q, d) VMEM
    lse_ref=None,  # (1, block_q) VMEM: logsumexp rows (VJP residual)
    *,
    block_q: int,
    block_k: int,
    t_k: int,
    causal: bool,
    scale: float,
    precision,
):
    q_block = pl.program_id(1)
    q_start = q_block * block_q

    q = q_ref[0].astype(jnp.float32) * scale
    slope = slope_ref[pl.program_id(0)]

    d = q.shape[-1]
    m_i = jnp.full((block_q, 1), NEG_INF, jnp.float32)
    l_i = jnp.zeros((block_q, 1), jnp.float32)
    acc = jnp.zeros((block_q, d), jnp.float32)

    num_k_blocks = t_k // block_k
    q_pos = q_start + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)

    def body(kb, carry):
        m_i, l_i, acc = carry
        k_start = kb * block_k

        k = k_ref[0, pl.ds(k_start, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(k_start, block_k), :].astype(jnp.float32)

        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32, precision=precision)  # (bq, bk)

        k_pos = k_start + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        # ALiBi: -slope * |i - j| (embeddings.py:295-299, symmetric variant)
        s = s - slope * jnp.abs(k_pos - q_pos).astype(jnp.float32)

        kmask = mask_ref[0, 0, pl.ds(k_start, block_k)][None, :]
        valid = kmask
        if causal:
            valid = valid & (k_pos <= q_pos)
        s = jnp.where(valid, s, NEG_INF)

        m_new = jnp.maximum(m_i, s.max(axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_i - m_new)
        l_new = alpha * l_i + p.sum(axis=-1, keepdims=True)
        acc_new = alpha * acc + jnp.dot(p, v, preferred_element_type=jnp.float32, precision=precision)
        return m_new, l_new, acc_new

    if causal:
        last_block = jnp.minimum(num_k_blocks, pl.cdiv(q_start + block_q, block_k))
    else:
        last_block = num_k_blocks

    m_i, l_i, acc = jax.lax.fori_loop(0, last_block, body, (m_i, l_i, acc))

    o_ref[0] = (acc / jnp.maximum(l_i, 1e-30)).astype(o_ref.dtype)
    if lse_ref is not None:
        lse_ref[0, 0] = (m_i + jnp.log(jnp.maximum(l_i, 1e-30)))[:, 0]


def _recompute_p(q, k, slope, q_start, k_start, lse, mask_row, causal, scale, precision):
    """Shared bwd helper: recompute the (block_q, block_k) softmax block and
    the ALiBi distance tile from the saved logsumexp."""
    block_q, block_k = q.shape[0], k.shape[0]
    q_pos = q_start + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
    k_pos = k_start + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
    dist = jnp.abs(k_pos - q_pos).astype(jnp.float32)

    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32, precision=precision) * scale
    s = s - slope * dist
    valid = mask_row
    if causal:
        valid = valid & (k_pos <= q_pos)
    s = jnp.where(valid, s, NEG_INF)
    p = jnp.exp(s - lse)  # rows with lse=0 on padded tails give p=0
    return p, dist


def _flash_bwd_dkv_kernel(
    slope_ref,  # (b*h,) SMEM
    q_ref,  # (1, block_q, d)
    k_ref,  # (1, block_k, d)
    v_ref,  # (1, block_k, d)
    mask_ref,  # (1, 1, block_k)
    lse_ref,  # (1, 1, block_q)
    do_ref,  # (1, block_q, d)
    delta_ref,  # (1, 1, block_q)
    dk_ref,  # (1, block_k, d) — accumulated over the q grid dim (innermost)
    dv_ref,  # (1, block_k, d)
    *,
    block_q: int,
    block_k: int,
    causal: bool,
    scale: float,
    precision,
):
    qb = pl.program_id(2)
    kb = pl.program_id(1)
    bh = pl.program_id(0)

    @pl.when(qb == 0)
    def _init():
        dk_ref[0] = jnp.zeros_like(dk_ref[0])
        dv_ref[0] = jnp.zeros_like(dv_ref[0])

    # causal: q blocks strictly above the diagonal contribute nothing
    q_start = qb * block_q
    k_start = kb * block_k

    def _work():
        slope = slope_ref[bh]
        q = q_ref[0].astype(jnp.float32)
        do = do_ref[0].astype(jnp.float32)
        lse = lse_ref[0, 0][:, None]
        delta = delta_ref[0, 0][:, None]
        k = k_ref[0].astype(jnp.float32)
        v = v_ref[0].astype(jnp.float32)
        mask_row = mask_ref[0, 0][None, :]

        p, _ = _recompute_p(q, k, slope, q_start, k_start, lse, mask_row,
                            causal, scale, precision)
        dv = jnp.dot(p.T, do, preferred_element_type=jnp.float32, precision=precision)
        dp = jnp.dot(do, v.T, preferred_element_type=jnp.float32, precision=precision)
        ds = p * (dp - delta)
        dk = jnp.dot(ds.T, q, preferred_element_type=jnp.float32, precision=precision) * scale

        dk_ref[0] += dk.astype(dk_ref.dtype)
        dv_ref[0] += dv.astype(dv_ref.dtype)

    if causal:
        pl.when(q_start + block_q > k_start)(_work)
    else:
        _work()


def _flash_bwd_dq_kernel(
    slope_ref,  # (b*h,) SMEM
    q_ref,  # (1, block_q, d)
    k_ref,  # (1, block_k, d)
    v_ref,  # (1, block_k, d)
    mask_ref,  # (1, 1, block_k)
    lse_ref,  # (1, 1, block_q)
    do_ref,  # (1, block_q, d)
    delta_ref,  # (1, 1, block_q)
    dq_ref,  # (1, block_q, d) — accumulated over the kv grid dim (innermost)
    dslope_ref,  # (1, 1, 128) — accumulated over both inner dims
    *,
    block_q: int,
    block_k: int,
    causal: bool,
    scale: float,
    precision,
):
    qb = pl.program_id(1)
    kb = pl.program_id(2)
    bh = pl.program_id(0)

    @pl.when(kb == 0)
    def _init_dq():
        dq_ref[0] = jnp.zeros_like(dq_ref[0])

    @pl.when((qb == 0) & (kb == 0))
    def _init_dslope():
        dslope_ref[0, 0, :] = jnp.zeros((128,), jnp.float32)

    q_start = qb * block_q
    k_start = kb * block_k

    def _work():
        slope = slope_ref[bh]
        q = q_ref[0].astype(jnp.float32)
        do = do_ref[0].astype(jnp.float32)
        lse = lse_ref[0, 0][:, None]
        delta = delta_ref[0, 0][:, None]
        k = k_ref[0].astype(jnp.float32)
        v = v_ref[0].astype(jnp.float32)
        mask_row = mask_ref[0, 0][None, :]

        p, dist = _recompute_p(q, k, slope, q_start, k_start, lse, mask_row,
                               causal, scale, precision)
        dp = jnp.dot(do, v.T, preferred_element_type=jnp.float32, precision=precision)
        ds = p * (dp - delta)
        dq = jnp.dot(ds, k, preferred_element_type=jnp.float32, precision=precision) * scale

        dq_ref[0] += dq.astype(dq_ref.dtype)
        dslope_ref[0, 0, :] += jnp.full((128,), jnp.sum(ds * (-dist)), jnp.float32)

    if causal:
        pl.when(q_start + block_q > k_start)(_work)
    else:
        _work()


def _pad_to(x, axis, mult):
    rem = x.shape[axis] % mult
    if rem == 0:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, mult - rem)
    return jnp.pad(x, pad)


def _flash_forward(q, k, v, slopes, maskf, causal, scale, block_q, block_k,
                   interpret, precision_name, return_lse=False):
    precision = _PRECISIONS[precision_name]
    b, h, t_q, d = q.shape
    hk = k.shape[1]
    t_k = k.shape[2]

    block_q = max(8, min(block_q, t_q))
    block_k = max(128, min(block_k, t_k))

    q_p = _pad_to(q, 2, block_q)
    k_p = _pad_to(k, 2, block_k)
    v_p = _pad_to(v, 2, block_k)
    t_qp, t_kp = q_p.shape[2], k_p.shape[2]
    mask_p = _pad_to(maskf, 1, block_k) > 0

    q_f = q_p.reshape(b * h, t_qp, d)
    if hk == 1:
        k_f = k_p.reshape(b, t_kp, d)
        v_f = v_p.reshape(b, t_kp, d)
        kv_index = lambda bh, qb: (bh // h, 0, 0)
    else:
        k_f = k_p.reshape(b * h, t_kp, d)
        v_f = v_p.reshape(b * h, t_kp, d)
        kv_index = lambda bh, qb: (bh, 0, 0)

    slopes_f = jnp.tile(slopes.reshape(-1).astype(jnp.float32), b)  # (b*h,)
    num_q_blocks = t_qp // block_q

    kernel = functools.partial(
        _flash_kernel,
        block_q=block_q,
        block_k=block_k,
        t_k=t_kp,
        causal=causal,
        scale=scale,
        precision=precision,
    )

    out_shapes = [jax.ShapeDtypeStruct((b * h, t_qp, d), q.dtype)]
    out_specs = [
        pl.BlockSpec((1, block_q, d), lambda bh, qb: (bh, qb, 0), memory_space=pltpu.VMEM)
    ]
    if return_lse:
        out_shapes.append(jax.ShapeDtypeStruct((b * h, 1, t_qp), jnp.float32))
        out_specs.append(
            pl.BlockSpec((1, 1, block_q), lambda bh, qb: (bh, 0, qb), memory_space=pltpu.VMEM)
        )

    def wrapped_kernel(*refs):
        if return_lse:
            kernel(*refs[:5], refs[5], refs[6])
        else:
            kernel(*refs[:5], refs[5], None)

    result = pl.pallas_call(
        wrapped_kernel,
        grid=(b * h, num_q_blocks),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # full slopes array
            pl.BlockSpec((1, block_q, d), lambda bh, qb: (bh, qb, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_kp, d), kv_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_kp, d), kv_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, t_kp), lambda bh, qb: (bh // h, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs if return_lse else out_specs[0],
        out_shape=out_shapes if return_lse else out_shapes[0],
        interpret=interpret,
    )(slopes_f, q_f, k_f, v_f, mask_p[:, None, :])

    if return_lse:
        out, lse = result
        return (
            out.reshape(b, h, t_qp, d)[:, :, :t_q],
            lse.reshape(b, h, t_qp)[:, :, :t_q],
        )
    return result.reshape(b, h, t_qp, d)[:, :, :t_q]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10))
def _flash_attention(q, k, v, slopes, maskf, causal, scale, block_q, block_k,
                     interpret, precision_name):
    return _flash_forward(q, k, v, slopes, maskf, causal, scale, block_q, block_k,
                          interpret, precision_name)


def _flash_attention_fwd(q, k, v, slopes, maskf, causal, scale, block_q, block_k,
                         interpret, precision_name):
    out, lse = _flash_forward(
        q, k, v, slopes, maskf, causal, scale, block_q, block_k, interpret,
        precision_name, return_lse=True
    )
    return out, (q, k, v, slopes, maskf, out, lse)


def _flash_attention_bwd(causal, scale, block_q, block_k, interpret,
                         precision_name, residuals, g):
    precision = _PRECISIONS[precision_name]
    q, k, v, slopes, maskf, out, lse = residuals
    b, h, t_q, d = q.shape
    hk = k.shape[1]
    t_k = k.shape[2]

    bq = max(8, min(block_q, t_q))
    bk = max(128, min(block_k, t_k))
    q_p = _pad_to(q, 2, bq)
    do_p = _pad_to(g, 2, bq)
    out_p = _pad_to(out, 2, bq)
    lse_p = _pad_to(lse, 2, bq)
    k_p = _pad_to(k, 2, bk)
    v_p = _pad_to(v, 2, bk)
    t_qp, t_kp = q_p.shape[2], k_p.shape[2]
    mask_p = _pad_to(maskf, 1, bk) > 0
    # padded lse rows are 0 -> p = exp(NEG_INF - 0) = 0, harmless

    delta = (do_p * out_p).sum(-1)  # (b, h, t_qp)

    q_f = q_p.reshape(b * h, t_qp, d)
    do_f = do_p.reshape(b * h, t_qp, d)
    lse_f = lse_p.reshape(b * h, 1, t_qp)
    delta_f = delta.reshape(b * h, 1, t_qp)

    if hk == 1:
        k_f = k_p.reshape(b, t_kp, d)
        v_f = v_p.reshape(b, t_kp, d)
    else:
        k_f = k_p.reshape(b * h, t_kp, d)
        v_f = v_p.reshape(b * h, t_kp, d)

    slopes_f = jnp.tile(slopes.reshape(-1).astype(jnp.float32), b)
    num_q_blocks = t_qp // bq
    num_k_blocks = t_kp // bk
    mask3 = mask_p[:, None, :]

    common = dict(block_q=bq, block_k=bk, causal=causal, scale=scale, precision=precision)

    # ---- kernel 1: dK/dV, grid (b*h, kv, q) — q innermost accumulates ----
    kv_idx = (lambda bh, kb, qb: (bh // h, kb, 0)) if hk == 1 else (lambda bh, kb, qb: (bh, kb, 0))
    dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, **common),
        grid=(b * h, num_k_blocks, num_q_blocks),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, bq, d), lambda bh, kb, qb: (bh, qb, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d), kv_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d), kv_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bk), lambda bh, kb, qb: (bh // h, 0, kb), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bq), lambda bh, kb, qb: (bh, 0, qb), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, d), lambda bh, kb, qb: (bh, qb, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bq), lambda bh, kb, qb: (bh, 0, qb), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, bk, d), lambda bh, kb, qb: (bh, kb, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d), lambda bh, kb, qb: (bh, kb, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * h, t_kp, d), jnp.float32),
            jax.ShapeDtypeStruct((b * h, t_kp, d), jnp.float32),
        ],
        interpret=interpret,
    )(slopes_f, q_f, k_f, v_f, mask3, lse_f, do_f, delta_f)

    # ---- kernel 2: dQ + dslopes, grid (b*h, q, kv) — kv innermost accumulates ----
    kv_idx2 = (lambda bh, qb, kb: (bh // h, kb, 0)) if hk == 1 else (lambda bh, qb, kb: (bh, kb, 0))
    dq, dslope_l = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, **common),
        grid=(b * h, num_q_blocks, num_k_blocks),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, bq, d), lambda bh, qb, kb: (bh, qb, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d), kv_idx2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d), kv_idx2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bk), lambda bh, qb, kb: (bh // h, 0, kb), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bq), lambda bh, qb, kb: (bh, 0, qb), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, d), lambda bh, qb, kb: (bh, qb, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bq), lambda bh, qb, kb: (bh, 0, qb), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, bq, d), lambda bh, qb, kb: (bh, qb, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 128), lambda bh, qb, kb: (bh, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * h, t_qp, d), jnp.float32),
            jax.ShapeDtypeStruct((b * h, 1, 128), jnp.float32),
        ],
        interpret=interpret,
    )(slopes_f, q_f, k_f, v_f, mask3, lse_f, do_f, delta_f)

    dq = dq.reshape(b, h, t_qp, d)[:, :, :t_q]
    dk = dk.reshape(b, h, t_kp, d)[:, :, :t_k]
    dv = dv.reshape(b, h, t_kp, d)[:, :, :t_k]
    if hk == 1:  # MQA: sum over query heads
        dk = dk.sum(axis=1, keepdims=True)
        dv = dv.sum(axis=1, keepdims=True)

    dslopes = dslope_l[:, 0, 0].reshape(b, h).sum(axis=0).astype(slopes.dtype)
    dmask = jnp.zeros_like(maskf)

    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype), dslopes, dmask


_flash_attention.defvjp(_flash_attention_fwd, _flash_attention_bwd)


def flash_attention_alibi(
    q: jnp.ndarray,  # (b, h, t_q, d)
    k: jnp.ndarray,  # (b, hk, t_k, d); hk == h or 1 (MQA)
    v: jnp.ndarray,
    slopes: jnp.ndarray,  # (h,) ALiBi slopes (use zeros for plain attention)
    mask: Optional[jnp.ndarray] = None,  # (b, t_k) key validity
    causal: bool = True,
    scale: Optional[float] = None,
    # 256x256 measured best on v5e-1 across t=258..2048 (see BASELINE.md):
    # matches or beats the fused XLA attention at every size
    block_q: int = 256,
    block_k: int = 256,
    interpret: bool = False,
    precision: str = "default",
) -> jnp.ndarray:
    """Differentiable flash attention (custom VJP with blocked Pallas backward
    kernels that recompute P from the saved logsumexp — the standard flash
    recipe). `precision` selects the MXU pass count: "default" for speed
    (matches XLA's default), "highest" for fp32-exact parity testing."""
    b, h, t_q, d = q.shape
    scale = scale if scale is not None else d**-0.5
    if mask is None:
        mask = jnp.ones((b, k.shape[2]), dtype=bool)
    maskf = mask.astype(jnp.float32)
    return _flash_attention(q, k, v, slopes, maskf, causal, scale, block_q, block_k,
                            interpret, precision)
