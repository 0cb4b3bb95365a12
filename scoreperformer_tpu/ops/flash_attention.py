"""Pallas TPU flash attention with in-kernel ALiBi bias.

The training hot path (SURVEY §2 "native equivalents"): fuses QK^T, ALiBi bias
generation, causal + padding masking, online softmax, and PV into one VMEM-
resident kernel. Unlike the XLA path (and the reference attend.py:58-126),
the (heads, t, t) ALiBi bias tensor is never materialized in HBM — slopes ride
in SMEM and the bias is generated from block indices inside the kernel.

Supports multi-query attention (single KV head) by broadcasting the KV block
across query heads at zero memory cost.

Grid: (batch * heads, num_q_blocks); K/V are streamed block-by-block with an
online-softmax accumulator (the standard flash algorithm), and causal query
blocks skip key blocks past the diagonal.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _flash_kernel(
    slope_ref,  # (b*h,) SMEM: per-(b,h) ALiBi slopes (full array, program-indexed)
    q_ref,  # (1, block_q, d) VMEM
    k_ref,  # (1, t_k, d) VMEM (full keys for this b[,h])
    v_ref,  # (1, t_k, d) VMEM
    mask_ref,  # (1, 1, t_k) VMEM bool: key validity
    o_ref,  # (1, block_q, d) VMEM
    *,
    block_q: int,
    block_k: int,
    t_k: int,
    causal: bool,
    scale: float,
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

        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)  # (bq, bk)

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
        acc_new = alpha * acc + jnp.dot(p, v, preferred_element_type=jnp.float32)
        return m_new, l_new, acc_new

    if causal:
        last_block = jnp.minimum(num_k_blocks, pl.cdiv(q_start + block_q, block_k))
    else:
        last_block = num_k_blocks

    m_i, l_i, acc = jax.lax.fori_loop(0, last_block, body, (m_i, l_i, acc))

    o_ref[0] = (acc / jnp.maximum(l_i, 1e-30)).astype(o_ref.dtype)


def flash_attention_alibi(
    q: jnp.ndarray,  # (b, h, t_q, d)
    k: jnp.ndarray,  # (b, hk, t_k, d); hk == h or 1 (MQA)
    v: jnp.ndarray,
    slopes: jnp.ndarray,  # (h,) ALiBi slopes (use zeros for plain attention)
    mask: Optional[jnp.ndarray] = None,  # (b, t_k) key validity
    causal: bool = True,
    scale: Optional[float] = None,
    block_q: int = 128,
    block_k: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    b, h, t_q, d = q.shape
    hk = k.shape[1]
    t_k = k.shape[2]
    scale = scale if scale is not None else d**-0.5

    block_q = max(8, min(block_q, t_q))
    block_k = max(128, min(block_k, t_k))

    def pad_to(x, axis, mult):
        rem = x.shape[axis] % mult
        if rem == 0:
            return x
        pad = [(0, 0)] * x.ndim
        pad[axis] = (0, mult - rem)
        return jnp.pad(x, pad)

    q_p = pad_to(q, 2, block_q)
    k_p = pad_to(k, 2, block_k)
    v_p = pad_to(v, 2, block_k)
    t_qp, t_kp = q_p.shape[2], k_p.shape[2]

    if mask is None:
        mask = jnp.ones((b, t_k), dtype=bool)
    mask_p = pad_to(mask, 1, block_k)

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
    )

    out = pl.pallas_call(
        kernel,
        grid=(b * h, num_q_blocks),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # full slopes array
            pl.BlockSpec((1, block_q, d), lambda bh, qb: (bh, qb, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_kp, d), kv_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_kp, d), kv_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, t_kp), lambda bh, qb: (bh // h, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, d), lambda bh, qb: (bh, qb, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b * h, t_qp, d), q.dtype),
        interpret=interpret,
    )(slopes_f, q_f, k_f, v_f, mask_p[:, None, :])

    return out.reshape(b, h, t_qp, d)[:, :, :t_q]
