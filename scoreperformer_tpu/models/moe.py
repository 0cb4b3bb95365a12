"""Mixture-of-Experts feed-forward with expert parallelism.

The reference has no MoE (SURVEY §2.8 lists expert parallelism as absent);
this is a framework capability beyond parity, built TPU-first:

- **Dense dispatch** (GShard/Switch style): routing produces static-shape
  dispatch/combine tensors and the expert computation is three batched
  einsums over a real `experts` array axis — everything lands on the MXU,
  no gather/scatter, no dynamic shapes.
- **Expert parallelism**: the leading expert axis of the stacked expert
  kernels and of the dispatched activations is shardable over an `expert`
  mesh axis (`parallel.mesh.expert_sharding`); XLA inserts the all-to-alls.
- **Static capacity**: each expert processes at most
  ``capacity = ceil(top_k * seq * capacity_factor / num_experts)`` tokens
  per row; overflow tokens are dropped from that expert (their combine
  weight is zero), keeping every shape static under jit.
- **Aux losses**: the Switch load-balance loss (and optional router z-loss)
  are sown into the ``losses`` collection; the Trainer picks them up when
  the model was built with MoE layers (see training/trainer.py).

Routing priority is slot-major (all first choices are placed before any
second choice), then sequence order — the GShard ordering.
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..parallel.mesh import shard_expert_acts


class MoEFeedForward(nn.Module):
    """Drop-in for models.layers.FeedForward with ``num_experts`` routed
    experts. Each expert is the same GLU/act MLP as the dense layer."""

    dim: int
    num_experts: int
    mult: int = 4
    top_k: int = 2
    capacity_factor: float = 1.25
    glu: bool = False
    swish: bool = False
    dropout: float = 0.0
    no_bias: bool = True
    router_aux_weight: float = 1e-2
    router_z_weight: float = 0.0

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        B, S, D = x.shape
        E = self.num_experts
        K = min(self.top_k, E)
        inner = int(self.dim * self.mult)
        capacity = max(1, int(math.ceil(K * S * self.capacity_factor / E)))

        # padding mask: collators pad to fixed shapes, and pad tokens must not
        # occupy expert capacity (they would displace real tokens' choices) or
        # skew the load-balance statistics
        valid = (
            jnp.ones((B, S), dtype=jnp.float32)
            if mask is None
            else mask.astype(jnp.float32)
        )
        n_valid = jnp.maximum(valid.sum(), 1.0)

        # ---- routing (fp32 for a stable softmax) ----
        router = self.param(
            "router", nn.initializers.normal(stddev=0.02), (D, E)
        )
        logits = x.astype(jnp.float32) @ router.astype(jnp.float32)  # (B,S,E)
        probs = jax.nn.softmax(logits, axis=-1)

        gate_vals, gate_idx = jax.lax.top_k(probs, K)  # (B,S,K)
        gates = gate_vals / jnp.maximum(
            gate_vals.sum(axis=-1, keepdims=True), 1e-9
        )

        # slot-major priority: flatten (K,S) so every token's first choice is
        # placed into expert capacity before any token's second choice;
        # masked (pad) tokens are zeroed out BEFORE the capacity cumsum so
        # they neither consume slots nor receive expert outputs
        onehot = jax.nn.one_hot(gate_idx, E, dtype=jnp.float32)  # (B,S,K,E)
        onehot = onehot * valid[:, :, None, None]
        oh_flat = onehot.transpose(0, 2, 1, 3).reshape(B, K * S, E)
        position = jnp.cumsum(oh_flat, axis=1) - oh_flat  # exclusive, per expert
        keep = (position < capacity) * oh_flat  # (B,KS,E)
        slot = jax.nn.one_hot(
            position.astype(jnp.int32), capacity, dtype=x.dtype
        ) * keep[..., None]  # (B,KS,E,C)
        slot = slot.reshape(B, K, S, E, capacity).transpose(0, 2, 1, 3, 4)

        dispatch = slot.sum(axis=2)  # (B,S,E,C) ∈ {0,1}
        combine = (slot * gates.astype(x.dtype)[..., None, None]).sum(axis=2)

        # ---- expert computation: batched einsums over the expert axis ----
        wi_features = inner * 2 if self.glu else inner
        wi = self.param(
            "wi", nn.initializers.lecun_normal(), (E, D, wi_features)
        )
        wo = self.param(
            "wo", nn.initializers.lecun_normal(), (E, inner, D)
        )
        use_bias = not self.no_bias
        if use_bias:
            bi = self.param("bi", nn.initializers.zeros_init(), (E, wi_features))
            bo = self.param("bo", nn.initializers.zeros_init(), (E, D))

        act = jax.nn.silu if self.swish else jax.nn.gelu

        expert_in = jnp.einsum("bsd,bsec->ebcd", x, dispatch)
        expert_in = shard_expert_acts(expert_in)  # (E,B,C,D) over `expert`
        h = jnp.einsum("ebcd,edf->ebcf", expert_in, wi)
        if use_bias:
            h = h + bi[:, None, None, :]
        if self.glu:
            h, gate = jnp.split(h, 2, axis=-1)
            h = h * act(gate)
        else:
            h = act(h)
        if self.dropout > 0.0:
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        y_e = jnp.einsum("ebcf,efd->ebcd", h, wo)
        if use_bias:
            y_e = y_e + bo[:, None, None, :]
        y_e = shard_expert_acts(y_e)
        y = jnp.einsum("ebcd,bsec->bsd", y_e, combine)

        # ---- aux losses (sown; Trainer adds them when present) ----
        # statistics over NON-PAD tokens only (onehot is already masked)
        importance = (probs * valid[..., None]).sum(axis=(0, 1)) / n_valid
        load = onehot[:, :, 0, :].sum(axis=(0, 1)) / n_valid  # top-1 fraction
        aux = E * jnp.sum(importance * load) * self.router_aux_weight
        if self.router_z_weight > 0.0:
            z = jax.nn.logsumexp(logits, axis=-1)
            aux = aux + self.router_z_weight * jnp.sum(z**2 * valid) / n_valid
        self.sow("losses", "moe_aux", aux)

        # observability: fraction of routed (token, choice) assignments that
        # overflowed expert capacity and were dropped (combine weight zeroed).
        # Sown into a separate collection so the Trainer can LOG it without
        # adding it to the loss (sown "losses" leaves are summed into the
        # objective, trainer.py).
        n_routed = jnp.maximum(oh_flat.sum(), 1.0)
        drop_rate = 1.0 - keep.sum() / n_routed
        self.sow("metrics", "moe_drop", drop_rate)

        # keep the residual stream dtype: dispatch/combine are fp32
        return y.astype(x.dtype)
