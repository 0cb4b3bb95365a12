"""Core transformer layers in Flax.

Counterparts of scoreperformer/modules/{layers.py, transformer/feedforward.py,
transformer/embeddings.py (positional parts)}, designed TPU-first: static
shapes, bf16-friendly, no data-dependent Python control flow.
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


# Compute the GLU input projection as two half-width matmuls over slices of
# the SAME (dim, 2*inner) kernel instead of one matmul followed by
# jnp.split: the split's backward concatenates two activation-sized grad
# tensors (b, t, 2*inner) per layer, while the weight-slice form assembles
# only a (dim, 2*inner) kernel grad. Identical math and identical param
# tree (one proj_in Dense), so checkpoints/converter are unaffected.
GLU_TWO_DOT = True


class _GLUProjIn(nn.Module):
    """Drop-in for nn.Dense(2*inner) + split; same param names/init."""

    features: int  # 2 * inner_dim

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        kernel = self.param(
            "kernel", nn.linear.default_kernel_init, (x.shape[-1], self.features)
        )
        bias = self.param("bias", nn.initializers.zeros_init(), (self.features,))
        half = self.features // 2
        h = x @ kernel[:, :half] + bias[:half]
        gate = x @ kernel[:, half:] + bias[half:]
        return h, gate


class AdaptiveLayerNorm(nn.Module):
    """SALN-style conditioning: LN without affine + Linear(cond → 2*dim)
    producing per-position gamma/beta (reference modules/layers.py:31-47).
    Bias initialized so gamma=1, beta=0 at start."""

    dim: int
    condition_dim: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray, condition: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        normed = nn.LayerNorm(epsilon=self.eps, use_bias=False, use_scale=False)(x)
        if condition is None:
            return normed
        if condition.ndim == 2:
            condition = condition[:, None]
        gamma_beta = nn.Dense(
            2 * self.dim,
            bias_init=lambda key, shape, dtype: jnp.concatenate(
                [jnp.ones(self.dim, dtype), jnp.zeros(self.dim, dtype)]
            ),
            name="to_gamma_beta",
        )(condition)
        gamma, beta = jnp.split(gamma_beta, 2, axis=-1)
        return gamma * normed + beta


class FeedForward(nn.Module):
    """GELU/SiLU MLP with optional GLU gate (modules/transformer/feedforward.py)."""

    dim: int
    mult: int = 4
    glu: bool = False
    swish: bool = False
    post_act_ln: bool = False
    dropout: float = 0.0
    no_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        inner_dim = int(self.dim * self.mult)
        act = jax.nn.silu if self.swish else jax.nn.gelu

        if self.glu:
            if GLU_TWO_DOT:
                h, gate = _GLUProjIn(inner_dim * 2, name="proj_in")(x)
            else:
                proj = nn.Dense(inner_dim * 2, name="proj_in")(x)
                h, gate = jnp.split(proj, 2, axis=-1)
            h = h * act(gate)
        else:
            h = act(nn.Dense(inner_dim, use_bias=not self.no_bias, name="proj_in")(x))

        if self.post_act_ln:
            h = nn.LayerNorm(epsilon=1e-5, name="post_act_norm")(h)
        if self.dropout > 0.0:
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return nn.Dense(self.dim, use_bias=not self.no_bias, name="proj_out")(h)


class AbsolutePositionalEmbedding(nn.Module):
    """(modules/transformer/embeddings.py:225-245)"""

    dim: int
    max_seq_len: int

    @nn.compact
    def __call__(self, seq_len: int, pos: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        emb = self.param(
            "emb",
            nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal"),
            (self.max_seq_len, self.dim),
        )
        if pos is None:
            pos = jnp.arange(seq_len)
        return emb[pos] * (self.dim ** -0.5)


def fixed_positional_embedding(dim: int, pos: jnp.ndarray) -> jnp.ndarray:
    """Sinusoidal embedding (embeddings.py:248-265)."""
    inv_freq = 1.0 / (10000 ** (jnp.arange(0, dim, 2) / dim))
    sinusoid = pos[..., None] * inv_freq
    return jnp.concatenate([jnp.sin(sinusoid), jnp.cos(sinusoid)], axis=-1)


def alibi_slopes(heads: int) -> jnp.ndarray:
    """ALiBi head slopes (embeddings.py:282-293)."""

    def slopes_power_of_2(n):
        start = 2 ** (-(2 ** -(math.log2(n) - 3)))
        return [start * start**i for i in range(n)]

    if math.log2(heads).is_integer():
        slopes = slopes_power_of_2(heads)
    else:
        closest = 2 ** math.floor(math.log2(heads))
        slopes = (
            slopes_power_of_2(closest)
            + slopes_power_of_2(2 * closest)[0::2][: heads - closest]
        )
    return jnp.array(slopes)


class ALiBiPositionalBias(nn.Module):
    """ALiBi relative position bias, optionally asymmetric and/or learned
    (embeddings.py:268-325). Produces an (heads, i, j) additive bias."""

    heads: int
    total_heads: int
    symmetric: bool = True
    learned: bool = False

    def setup(self):
        slopes = alibi_slopes(self.heads)[:, None, None]
        if not self.symmetric:
            slopes = jnp.stack([slopes, jnp.roll(slopes, -1, axis=0)])
        if self.learned:
            self.learned_logslopes = self.param(
                "learned_logslopes", lambda key: jnp.log(slopes)
            )
        else:
            self.slopes = slopes

    def get_slopes(self) -> jnp.ndarray:
        if self.learned:
            return jnp.exp(self.learned_logslopes)
        return self.slopes

    def __call__(
        self,
        i: int,
        j: int,
        k: int = 0,
        pos_i: Optional[jnp.ndarray] = None,
        pos_j: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """Bias for i query positions (starting at offset k, or explicit
        `pos_i`) against j key positions (default contiguous, or explicit
        `pos_j` — e.g. the per-slot absolute positions of a ring KV cache)."""
        if pos_i is None:
            pos_i = k + jnp.arange(i)
        if pos_j is None:
            pos_j = jnp.arange(j)
        diff = (pos_j[None, None, :] - pos_i[None, :, None]).astype(jnp.float32)
        bias = -jnp.abs(diff)

        slopes = self.get_slopes()
        pad = self.total_heads - (slopes.shape[1] if not self.symmetric else slopes.shape[0])
        if self.symmetric:
            if pad > 0:
                slopes = jnp.concatenate([slopes, jnp.zeros((pad, 1, 1))], axis=0)
            return slopes * bias
        else:
            if pad > 0:
                zeros = jnp.zeros((2, pad, 1, 1))
                slopes = jnp.concatenate([slopes, zeros], axis=1)
            # position-aware split (tril/triu only hold when pos_i/pos_j are
            # both contiguous from 0); the diagonal is 0 either way
            lower = jnp.where(diff <= 0, bias, 0.0)
            upper = jnp.where(diff > 0, bias, 0.0)
            return slopes[0] * lower + slopes[1] * upper
