"""Multi-head attention with ALiBi, MQA, and a static-shape KV cache.

Counterpart of scoreperformer/modules/transformer/{attention.py, attend.py},
re-designed for XLA: instead of growing the KV cache by concatenation per step
(reference attention.py:155-156), the cache is a fixed-size buffer written at
`cache_index` with `lax.dynamic_update_slice`, so autoregressive decode
compiles once and runs inside `lax.scan`/`while_loop` without reshapes.
Softmax runs in fp32 (reference attend.py:50) for bf16-safe training.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.kv_cache import write_kv
from .layers import ALiBiPositionalBias

MASK_VALUE = -1e9

# Backward of the ALiBi bias add (`dots + bias[None]`): the grad wrt the
# batch-shared (h, n, j) bias is a sum of the (b, h, n, j) grad over batch.
# XLA emits it as a VPU reduce_sum that the round-3 profile attributes
# 5.9 ms of the 90.8 ms flagship train step (~230 GB/s — the largest
# non-matmul item). With this flag the same sum runs as an MXU dot_general
# against a ones vector (the trade that paid for the one-hot embedding/CE
# rewires) — but MEASURED NEGATIVE end-to-end: 95.5/97.4 ms vs 94.7/94.7
# control (scripts/exp_alibi_dbias.py). The profile's reduce is evidently
# overlapped with neighboring matmuls, and the custom_vjp boundary costs
# XLA the fusion of the pass-through d(dots). Default off; kept with its
# parity test as the measured record.
ALIBI_DBIAS_DOT = False


@jax.custom_vjp
def _bias_add(dots: jnp.ndarray, bias: jnp.ndarray) -> jnp.ndarray:
    return dots + bias[None]


def _bias_add_fwd(dots, bias):
    return dots + bias[None], None


def _bias_add_bwd(_, g):
    ones = jnp.ones((g.shape[0],), g.dtype)
    dbias = jax.lax.dot_general(ones, g, (((0,), (0,)), ((), ())))
    return g, dbias


_bias_add.defvjp(_bias_add_fwd, _bias_add_bwd)


def add_alibi_bias(dots: jnp.ndarray, bias: jnp.ndarray) -> jnp.ndarray:
    """dots (b, h, n, j) + bias (h, n, j), with the d(bias) rewire above."""
    bias = bias.astype(dots.dtype)
    if ALIBI_DBIAS_DOT:
        return _bias_add(dots, bias)
    return dots + bias[None]


def init_kv_cache(
    batch: int, max_len: int, kv_dim: int, dtype=jnp.float32
) -> Dict[str, jnp.ndarray]:
    """Fixed-size cache buffer for one attention layer.

    TIME-MAJOR layout (max_len, batch, kv_dim): single-position decode writes
    are then contiguous rows, served by the in-place Pallas DMA on TPU
    (ops/kv_cache.py) instead of a full-buffer-copying dynamic_update_slice.
    """
    if jnp.dtype(dtype) == jnp.int8:
        # Quantized prefix cache: int8 rows + one fp32 scale per (position,
        # batch) row. Reads drop 4x vs fp32; the scales fold algebraically
        # into the attend (dots *= k_s on the key side, probs *= v_s before
        # the value dot), so dequantization never materializes an fp32 copy
        # of the buffers. Only the chunked decode path consumes this layout
        # (fresh carried buffers stay fp32; quantization happens once per
        # chunk at the merge).
        return {
            "k": jnp.zeros((max_len, batch, kv_dim), jnp.int8),
            "k_s": jnp.zeros((max_len, batch), jnp.float32),
            "v": jnp.zeros((max_len, batch, kv_dim), jnp.int8),
            "v_s": jnp.zeros((max_len, batch), jnp.float32),
        }
    return {
        "k": jnp.zeros((max_len, batch, kv_dim), dtype),
        "v": jnp.zeros((max_len, batch, kv_dim), dtype),
    }


def quantize_kv_rows(x: jnp.ndarray, eps: float = 1e-8):
    """Symmetric per-row int8 quantization of (..., kv_dim) rows.

    Returns (q, scale) with q = round(x / scale) in [-127, 127] and
    scale = max|row| / 127 — dequantization is q * scale[..., None].
    """
    amax = jnp.max(jnp.abs(x), axis=-1)
    scale = jnp.maximum(amax, eps) / 127.0
    q = jnp.clip(jnp.round(x / scale[..., None]), -127, 127).astype(jnp.int8)
    return q, scale


class Attention(nn.Module):
    dim: int
    dim_head: int = 64
    heads: int = 8
    causal: bool = False
    dropout: float = 0.0
    one_kv_head: bool = False
    max_attend: Optional[int] = None
    alibi_pos_bias: bool = False
    alibi_num_heads: Optional[int] = None
    alibi_symmetric: bool = True
    alibi_learned: bool = False
    # Pallas flash kernel on the eligible full-self-attention path. Default
    # OFF: measured on v5e-1 the fused XLA attention is faster end-to-end at
    # this model family's sizes (flagship step 172 vs 259 ms/step); enable for
    # long-context memory-bound regimes — the kernel never materializes the
    # (h, t, t) bias/score tensors in HBM and is OOM-free at any length.
    use_flash: bool = False
    # Scale-train tail levers (VERDICT r4 #2), both A/B-measured on the
    # dim-1024 train step (scripts/exp_scale_tail.py):
    # - fused_mask_select: AND all boolean masks into one array and apply a
    #   single where() to the (b,h,n,j) scores instead of one select per
    #   mask. Bit-identical (where(a, where(b, x, neg), neg) ==
    #   where(a & b, x, neg) with one shared neg).
    # - softmax_bf16: run the mask+softmax elementwise chain in bf16
    #   (halves the HBM traffic of the largest non-dot tensor). NOT
    #   bit-stable vs fp32 — off by default; a scale-recipe knob.
    fused_mask_select: bool = False
    softmax_bf16: bool = False

    def setup(self):
        q_dim = self.dim_head * self.heads
        kv_dim = self.dim_head if self.one_kv_head else q_dim
        self.to_q = nn.Dense(q_dim, use_bias=False, name="to_q")
        self.to_k = nn.Dense(kv_dim, use_bias=False, name="to_k")
        self.to_v = nn.Dense(kv_dim, use_bias=False, name="to_v")
        self.to_out = nn.Dense(self.dim, use_bias=False, name="to_out")
        self.attn_dropout = nn.Dropout(self.dropout) if self.dropout > 0.0 else None

        if self.alibi_pos_bias:
            self.rel_pos = ALiBiPositionalBias(
                heads=self.alibi_num_heads or self.heads,
                total_heads=self.heads,
                symmetric=self.alibi_symmetric or self.causal,
                learned=self.alibi_learned,
            )
        else:
            self.rel_pos = None

    @property
    def kv_dim(self) -> int:
        return self.dim_head if self.one_kv_head else self.dim_head * self.heads

    def _chunked_cache_attend(self, x, mask, attn_mask, cache, cache_index):
        """Decode attention over a FROZEN prefix cache plus a small carried
        fresh-chunk buffer.

        The scan decode pays a defensive copy of every carried cache buffer
        per step (measured: ~55% of step time at the flagship config,
        BASELINE.md round 2). Here only the (chunk, b, kv) fresh buffers are
        scan-carried; the big (cap, b, kv) prefix is a loop-invariant operand
        that XLA does not copy, and the chunk is merged into the prefix once
        per chunk outside the inner scan (wrappers.mixedlm_unmask chunked
        mode). Attention = softmax over [prefix dots | fresh dots] with key
        positions masked to written slots; the caches themselves are never
        concatenated.

        `cache` holds {"k","v"}: frozen prefix (cap, b, kv); {"fk","fv"}:
        carried fresh chunk (C, b, kv); "base": global position of fresh
        slot 0. Returns (out, {"fk","fv"} updated). No ring wrap: requires
        cap >= total decode length (asserted upstream).
        """
        b, n = x.shape[:2]
        h, d = self.heads, self.dim_head
        scale = d**-0.5
        idx = cache_index if cache_index is not None else 0
        base = cache["base"]

        q = self.to_q(x).reshape(b, n, h, d).transpose(0, 2, 1, 3)
        k = self.to_k(x)
        v = self.to_v(x)

        fk = write_kv(cache["fk"], k.swapaxes(0, 1), idx - base)
        fv = write_kv(cache["fv"], v.swapaxes(0, 1), idx - base)
        pk, pv = cache["k"], cache["v"]
        cap, chunk = pk.shape[0], fk.shape[0]

        pos_q = idx + jnp.arange(n)
        key_pos = jnp.concatenate([jnp.arange(cap), base + jnp.arange(chunk)])
        # prefix slots at/past the chunk base are stale; fresh slots past the
        # current step fall to the causal mask below
        key_valid = jnp.concatenate(
            [jnp.arange(cap) < base, jnp.ones(chunk, dtype=bool)]
        )

        # int8-quantized prefix: k_s/v_s are per-(position, batch) row scales
        # (init_kv_cache). Dequantization folds into the attend — the key
        # scale multiplies the prefix dots columns, the value scale folds
        # into the probs before the value dot — so only int8 bytes ever
        # stream from HBM for the big prefix buffers.
        k_s = cache.get("k_s") if isinstance(cache, dict) else None
        v_s = cache.get("v_s") if isinstance(cache, dict) else None

        if self.one_kv_head:
            dots_p = jnp.einsum("bhid,jbd->bhij", q, pk.astype(q.dtype))
            dots_f = jnp.einsum("bhid,jbd->bhij", q, fk)
        else:
            dots_p = jnp.einsum("bhid,jbhd->bhij", q, pk.reshape(cap, b, h, d).astype(q.dtype))
            dots_f = jnp.einsum("bhid,jbhd->bhij", q, fk.reshape(chunk, b, h, d))
        if k_s is not None:
            dots_p = dots_p * k_s.T[:, None, None, :]
        dots = jnp.concatenate([dots_p, dots_f], axis=-1) * scale

        neg = jnp.asarray(MASK_VALUE, dots.dtype)
        if self.rel_pos is not None:
            bias = self.rel_pos(n, cap + chunk, pos_i=pos_q, pos_j=key_pos)
            dots = dots + bias[None].astype(dots.dtype)
        if mask is not None:
            dots = jnp.where(mask[:, None, None, :], dots, neg)
        if attn_mask is not None:
            if attn_mask.ndim == 2:
                attn_mask = attn_mask[None, None]
            elif attn_mask.ndim == 3:
                attn_mask = attn_mask[:, None]
            dots = jnp.where(attn_mask, dots, neg)
        if self.max_attend is not None:
            dist = pos_q[:, None] - key_pos[None, :]
            window_ok = (-self.max_attend < dist) & (dist <= self.max_attend)
            dots = jnp.where(window_ok[None, None], dots, neg)
        if self.causal:
            causal_ok = key_pos[None, :] <= pos_q[:, None]
            dots = jnp.where(causal_ok[None, None], dots, neg)
        dots = jnp.where(key_valid[None, None, None, :], dots, neg)

        attn = jax.nn.softmax(dots.astype(jnp.float32), axis=-1).astype(dots.dtype)

        attn_p = attn[..., :cap]
        if v_s is not None:
            attn_p = attn_p * v_s.T[:, None, None, :]
        if self.one_kv_head:
            out = jnp.einsum("bhij,jbd->bhid", attn_p, pv.astype(attn.dtype)) + jnp.einsum(
                "bhij,jbd->bhid", attn[..., cap:], fv
            )
        else:
            out = jnp.einsum(
                "bhij,jbhd->bhid", attn_p, pv.reshape(cap, b, h, d).astype(attn.dtype)
            ) + jnp.einsum("bhij,jbhd->bhid", attn[..., cap:], fv.reshape(chunk, b, h, d))
        out = out.transpose(0, 2, 1, 3).reshape(b, n, h * d)
        return self.to_out(out), {"fk": fk, "fv": fv}

    def __call__(
        self,
        x: jnp.ndarray,
        context: Optional[jnp.ndarray] = None,
        mask: Optional[jnp.ndarray] = None,
        context_mask: Optional[jnp.ndarray] = None,
        attn_mask: Optional[jnp.ndarray] = None,
        cache: Optional[Dict[str, jnp.ndarray]] = None,
        cache_index: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, Optional[Dict[str, jnp.ndarray]]]:
        """Returns (out, updated_cache).

        Without a cache: standard full attention over `x` (or cross-attention
        over `context`). With a cache: keys/values of `x` are written at
        positions [cache_index, cache_index + n) and queries attend over the
        whole buffer masked to the written prefix.
        """
        if cache is not None and "fk" in cache:
            assert context is None, "chunked cache is not compatible with cross-attention"
            return self._chunked_cache_attend(x, mask, attn_mask, cache, cache_index)

        b, n = x.shape[:2]
        h, d = self.heads, self.dim_head
        scale = d**-0.5

        kv_input = context if context is not None else x
        q = self.to_q(x)
        k = self.to_k(kv_input)
        v = self.to_v(kv_input)

        q = q.reshape(b, n, h, d).transpose(0, 2, 1, 3)  # b h n d

        # --- Pallas flash path (full self-attention, no cache/window/bias-mask,
        # symmetric ALiBi, inference-time i.e. no attention dropout) ---
        if (
            self.use_flash
            and cache is None
            and context is None
            and attn_mask is None
            and self.max_attend is None
            and (deterministic or self.dropout == 0.0)  # kernel has no attn-dropout
            and (self.rel_pos is None or self.alibi_symmetric or self.causal)
            and jax.default_backend() == "tpu"
        ):
            from ..ops.flash_attention import flash_attention_alibi

            if self.rel_pos is not None:
                slopes = self.rel_pos.get_slopes().reshape(-1)
                pad = h - slopes.shape[0]
                if pad > 0:
                    slopes = jnp.concatenate([slopes, jnp.zeros(pad)])
            else:
                slopes = jnp.zeros(h)
            kv_heads = 1 if self.one_kv_head else h
            k_h = k.reshape(b, n, kv_heads, d).transpose(0, 2, 1, 3)
            v_h = v.reshape(b, n, kv_heads, d).transpose(0, 2, 1, 3)
            out = flash_attention_alibi(
                q, k_h, v_h, slopes, mask=mask, causal=self.causal, scale=scale
            )
            out = out.transpose(0, 2, 1, 3).reshape(b, n, h * d)
            out = self.to_out(out)
            if mask is not None:
                out = out * mask[..., None]
            return out, None

        has_cache = cache is not None
        if has_cache:
            assert context is None, "cache is not compatible with cross-attention"
            idx = cache_index if cache_index is not None else 0
            cap = cache["k"].shape[0]  # time-major (cap, b, kv_dim)
            # Ring buffer: writes at `cache_index % capacity`. While the
            # absolute position stays below capacity this is the plain linear
            # cache; past capacity, single-token decode steps wrap and the
            # cache holds exactly the last `capacity` positions — the
            # TPU-native equivalent of the reference's sliding context window
            # (wrappers.py:236-237) with no re-prefill. Multi-token writes
            # must not wrap (prefill length <= capacity is asserted upstream).
            slot = idx % cap
            k_t = write_kv(cache["k"], k.swapaxes(0, 1), slot)  # (cap, b, kv)
            v_t = write_kv(cache["v"], v.swapaxes(0, 1), slot)
            new_cache = {"k": k_t, "v": v_t}
            j = cap
            pos_q = idx + jnp.arange(n)
            # absolute position held by each slot: the latest write at or
            # before the last query position that maps to that slot
            p_last = idx + n - 1
            key_pos = p_last - ((p_last - jnp.arange(j)) % cap)
            key_valid = key_pos >= 0  # slots never written are "negative"
            if self.one_kv_head:
                dots = jnp.einsum("bhid,jbd->bhij", q, k_t) * scale
            else:
                dots = jnp.einsum("bhid,jbhd->bhij", q, k_t.reshape(j, b, h, d)) * scale
        else:
            new_cache = None
            j = k.shape[1]
            pos_q = (j - n) + jnp.arange(n) if context is None else jnp.arange(n)
            key_pos = None
            key_valid = None
            if self.one_kv_head:
                k_h = k[:, None]  # b 1 j d
                v_h = v[:, None]
            else:
                k_h = k.reshape(b, j, h, d).transpose(0, 2, 1, 3)
                v_h = v.reshape(b, j, h, d).transpose(0, 2, 1, 3)
            dots = jnp.einsum("bhid,bhjd->bhij", q, k_h) * scale

        # --- additive bias: ALiBi ---
        if self.rel_pos is not None:
            bias = self.rel_pos(n, j, pos_i=pos_q, pos_j=key_pos)  # (h, n, j)
            dots = add_alibi_bias(dots, bias)

        # --- masks (composed as in attention.py:160-186) ---
        if self.softmax_bf16:
            dots = dots.astype(jnp.bfloat16)
        neg = jnp.asarray(MASK_VALUE, dots.dtype)
        input_mask = context_mask if (context is not None and context_mask is not None) else mask
        if context is None and mask is not None:
            input_mask = mask
        if has_cache and input_mask is not None and input_mask.shape[1] != j:
            # the caller provides a mask over the cache buffer length
            input_mask = input_mask

        oks = []  # boolean masks, each broadcastable to dots (b, h, n, j)
        if input_mask is not None:
            oks.append(input_mask[:, None, None, :])

        if attn_mask is not None:
            if attn_mask.ndim == 2:
                attn_mask = attn_mask[None, None]
            elif attn_mask.ndim == 3:
                attn_mask = attn_mask[:, None]
            oks.append(attn_mask)

        kpos = key_pos if key_pos is not None else jnp.arange(j)
        if self.max_attend is not None:
            dist = pos_q[:, None] - kpos[None, :]
            window_ok = (-self.max_attend < dist) & (dist <= self.max_attend)
            oks.append(window_ok[None, None])

        if self.causal:
            causal_ok = kpos[None, :] <= pos_q[:, None]
            oks.append(causal_ok[None, None])

        if key_valid is not None:
            oks.append(key_valid[None, None, None, :])

        if self.fused_mask_select and len(oks) > 1:
            ok = oks[0]
            for m in oks[1:]:
                ok = ok & m
            dots = jnp.where(ok, dots, neg)
        else:
            for m in oks:
                dots = jnp.where(m, dots, neg)

        # --- softmax in fp32 (attend.py:50); bf16 when softmax_bf16 ---
        sm_dtype = jnp.bfloat16 if self.softmax_bf16 else jnp.float32
        attn = jax.nn.softmax(dots.astype(sm_dtype), axis=-1).astype(dots.dtype)
        if self.attn_dropout is not None:
            attn = self.attn_dropout(attn, deterministic=deterministic)

        if has_cache:
            if self.one_kv_head:
                out = jnp.einsum("bhij,jbd->bhid", attn, v_t)
            else:
                out = jnp.einsum("bhij,jbhd->bhid", attn, v_t.reshape(j, b, h, d))
        else:
            out = jnp.einsum("bhij,bhjd->bhid", attn, v_h)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, h * d)
        out = self.to_out(out)

        if mask is not None and not has_cache:
            out = out * mask[..., None]

        return out, new_cache
