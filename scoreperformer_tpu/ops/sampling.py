"""Logit filtering and sampling (counterpart of scoreperformer/modules/sampling.py).

All functions are jittable with static shapes: filters return full-size logits
with -inf outside the kept set, so they compose inside `lax.scan`/`while_loop`
decode loops.
"""
from __future__ import annotations

import math
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp

NEG_INF = -jnp.inf


def top_p(logits: jnp.ndarray, thres: float = 0.9) -> jnp.ndarray:
    """Nucleus filtering (sampling.py:15-23), scatter-free: a token is kept iff
    the cumulative probability of strictly-higher-ranked tokens is <= thres."""
    probs = jax.nn.softmax(logits, axis=-1)
    sorted_probs = jnp.sort(probs, axis=-1)[..., ::-1]
    cum = jnp.cumsum(sorted_probs, axis=-1) - sorted_probs  # exclusive cumsum
    ranks = jnp.argsort(jnp.argsort(-logits, axis=-1), axis=-1)
    token_cum = jnp.take_along_axis(cum, ranks, axis=-1)
    return jnp.where(token_cum > thres, NEG_INF, logits)


# How the k-th-largest threshold is computed inside `top_k` (measured in the
# flagship decode step, BASELINE.md round 3; the 5 per-stream filters were
# ~16% of decode step time with "lax"):
#   "approx" — jax.lax.approx_max_k, TPU's partial-reduction top-k
#              (arXiv:2206.14286). Default, with recall_target=1.0: the
#              reduction then keeps every candidate, so the result is EXACT
#              (verified bit-equal to lax.top_k on the decode stream shapes,
#              scripts/exp_post_merge.py) while keeping the kernel's speed —
#              **+15% decode throughput** (781k vs 678k tok/s). recall<1.0
#              is available but measured NO faster (780k at 0.95), so there
#              is no reason to trade exactness for it.
#   "lax"    — jax.lax.top_k. EXACT; lowers to a variadic sort carrying an
#              s32 iota index payload the filter discards. Fallback/control.
#   "sort"   — values-only jnp.sort. EXACT but measured ~6% SLOWER than
#              "lax" despite dropping the index payload — XLA's top_k sort
#              pattern gets backend treatment a generic sort does not. Kept
#              for comparison.
TOPK_METHOD = "approx"


def top_k(
    logits: jnp.ndarray,
    thres: float = 0.9,
    k: Optional[int] = None,
    method: Optional[str] = None,
    recall: float = 1.0,
) -> jnp.ndarray:
    """Top-k filtering (sampling.py:28-33). `k` must be static under jit.
    Only the k-th value is needed (the filter keeps everything >= it) — the
    threshold computation method is selectable, see TOPK_METHOD. The default
    (approx_max_k at recall_target=1.0) is exact."""
    if k is None:
        k = math.ceil((1 - thres) * logits.shape[-1])
    k = max(1, min(int(k), logits.shape[-1]))
    method = method or TOPK_METHOD
    if method == "sort":
        kth = jnp.sort(logits, axis=-1)[..., logits.shape[-1] - k][..., None]
    elif method == "approx":
        kth = jax.lax.approx_max_k(
            logits, k, recall_target=recall, aggregate_to_topk=True
        )[0][..., -1:]
    else:
        kth = jax.lax.top_k(logits, k)[0][..., -1:]
    return jnp.where(logits < kth, NEG_INF, logits)


def top_a(logits: jnp.ndarray, min_p_pow: float = 2.0, min_p_ratio: float = 0.02) -> jnp.ndarray:
    """(sampling.py:38-41)"""
    probs = jax.nn.softmax(logits, axis=-1)
    limit = jnp.power(jnp.max(probs, axis=-1, keepdims=True), min_p_pow) * min_p_ratio
    return jnp.where(probs < limit, NEG_INF, logits)


def apply_temperature(logits: jnp.ndarray, temperature) -> jnp.ndarray:
    """Divide by T, statically skipping the full-width divide at T=1.

    The skip only fires for a STATIC Python number; a traced temperature
    (e.g. jitted as a server argument) always divides — `!= 1.0` on a
    tracer is not a Python bool.

    A non-scalar ``temperature`` is PER-ROW: shape (b,) against logits whose
    leading dim is the batch (any rank) — the render server's coalesced
    batches carry one temperature per request."""
    if isinstance(temperature, (int, float)):
        return logits if temperature == 1.0 else logits / temperature
    if getattr(temperature, "ndim", 0) >= 1:
        temperature = temperature.reshape(
            temperature.shape[:1] + (1,) * (logits.ndim - 1)
        )
    return logits / temperature


def filter_logits_and_sample(
    rng: jax.Array,
    logits: jnp.ndarray,
    filter_logits_fn: Callable = top_k,
    filter_kwargs: Optional[Dict] = None,
    temperature: float = 1.0,
    sample: bool = True,
):
    """filter → softmax(T) → categorical (sampling.py:46-59)."""
    filtered = filter_logits_fn(logits, **(filter_kwargs or {}))
    filtered = apply_temperature(filtered, temperature)
    if not sample:
        return jax.nn.softmax(filtered, axis=-1)
    return jax.random.categorical(rng, filtered, axis=-1)
