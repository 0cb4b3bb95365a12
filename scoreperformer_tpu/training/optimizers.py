"""Optimizer construction on optax.

Counterpart of scoreperformer/experiments/optimizers.py: name-based optimizer
and scheduler lookup, gradient clipping with a non-finite guard (the reference
AMP scaler skips steps on inf/nan — optax.apply_if_finite reproduces that),
gradient accumulation via MultiSteps, and the reference's per-epoch
exponential annealing expressed as a staircase schedule over steps.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Optional

import optax

from ..configs import ModuleConfig


@dataclass
class OptimizerConfig(ModuleConfig):
    lr: float = 1e-3
    optimizer: str = "adam"
    optimizer_params: Dict = field(default_factory=dict)
    lr_scheduler: Optional[str] = None
    lr_scheduler_params: Dict = field(default_factory=dict)
    grad_clip: Optional[float] = None
    grad_accum_steps: int = 1
    mixed_precision: bool = False
    # run the whole update (clip, moments, finite guard, accumulation) on one
    # raveled parameter vector instead of per-leaf (optax.flatten). Measured
    # NEGATIVE at flagship scale — the per-step ravel/unravel copies cost more
    # than the tiny-op tail they remove (101 vs 95 ms/step, BASELINE.md
    # round 3) — kept for experimentation only
    flat_updates: bool = False


_OPTIMIZERS = {
    "sgd": optax.sgd,
    "adam": optax.adam,
    "adamw": optax.adamw,
    "lamb": optax.lamb,
    "lion": optax.lion,
    "adafactor": optax.adafactor,
}


def build_lr_schedule(config: OptimizerConfig, steps_per_epoch: int = 1):
    """LR schedule callable(step) -> lr. `exponential` anneals by gamma once
    per epoch (reference Optimizer.anneal_on_epoch_end)."""
    if config.lr_scheduler == "exponential":
        gamma = float(config.lr_scheduler_params.get("gamma", 1.0))
        return optax.exponential_decay(
            init_value=config.lr,
            transition_steps=max(1, steps_per_epoch),
            decay_rate=gamma,
            staircase=True,
        )
    if config.lr_scheduler in (None, "", "none", "constant"):
        return optax.constant_schedule(config.lr)
    if config.lr_scheduler == "cosine":
        return optax.cosine_decay_schedule(
            init_value=config.lr,
            decay_steps=int(config.lr_scheduler_params.get("decay_steps", 100_000)),
            alpha=float(config.lr_scheduler_params.get("alpha", 0.0)),
        )
    raise ValueError(f"unknown lr scheduler {config.lr_scheduler}")


def build_optimizer(
    config: OptimizerConfig, steps_per_epoch: int = 1
) -> optax.GradientTransformation:
    name = config.optimizer.lower()
    if name not in _OPTIMIZERS:
        raise ValueError(f"unknown optimizer {name}; available: {sorted(_OPTIMIZERS)}")
    opt_fn = _OPTIMIZERS[name]

    params = dict(config.optimizer_params or {})
    if "betas" in params:  # torch->optax param name mapping
        params["b1"], params["b2"] = params.pop("betas")

    schedule = build_lr_schedule(config, steps_per_epoch)

    chain = []
    if config.grad_clip is not None:
        chain.append(optax.clip_by_global_norm(config.grad_clip))
    chain.append(opt_fn(learning_rate=schedule, **params))

    tx = optax.chain(*chain)
    # skip update when grads are non-finite (reference optimizers.py:161-162)
    tx = optax.apply_if_finite(tx, max_consecutive_errors=10_000_000)

    if config.grad_accum_steps and config.grad_accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=config.grad_accum_steps)

    if config.flat_updates:
        # flatten OUTSIDE accumulation/guard so the accumulator buffers and
        # isfinite checks are single vector ops too
        tx = optax.flatten(tx)

    return tx
