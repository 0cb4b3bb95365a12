"""Optimizer construction on optax.

Counterpart of scoreperformer/experiments/optimizers.py: name-based optimizer
and scheduler lookup, gradient clipping with a non-finite guard (the reference
AMP scaler skips steps on inf/nan — optax.apply_if_finite reproduces that),
gradient accumulation via MultiSteps, and the reference's per-epoch
exponential annealing expressed as a staircase schedule over steps.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
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


class PlateauScaleState(NamedTuple):
    """Multiplicative LR scale carried in the optimizer state.

    TPU-shaped plateau annealing: torch's ReduceLROnPlateau mutates the
    optimizer's lr between steps, which under jit would either retrace the
    step or force the lr to be re-closed over. Here the decayed factor lives
    as a scalar LEAF of the optimizer state (same shape/dtype every step, so
    one compiled program) and the *decision* logic runs on host once per
    epoch (`PlateauController`), writing the new factor into the leaf.
    """

    scale: jnp.ndarray


def plateau_scale() -> optax.GradientTransformation:
    """Scale updates by the host-controlled plateau factor.

    Appended after the optimizer in the chain, so updates are
    `-lr * direction * scale` — identical to torch scaling the lr itself
    (for adamw the weight-decay term is inside the lr product in both)."""

    def init(params):
        del params
        return PlateauScaleState(scale=jnp.ones((), jnp.float32))

    def update(updates, state, params=None):
        del params
        updates = jax.tree.map(lambda g: g * state.scale, updates)
        return updates, state

    return optax.GradientTransformation(init, update)


def _is_plateau_state(node) -> bool:
    return isinstance(node, PlateauScaleState)


def set_plateau_scale(opt_state, scale: float):
    """Functionally replace the PlateauScaleState leaf, preserving the old
    leaf's device placement/sharding (the state is a donated jit argument)."""

    def repl(node):
        if _is_plateau_state(node):
            old = node.scale
            new = jnp.asarray(scale, dtype=old.dtype)
            if hasattr(old, "sharding"):
                new = jax.device_put(new, old.sharding)
            return PlateauScaleState(scale=new)
        return node

    return jax.tree_util.tree_map(repl, opt_state, is_leaf=_is_plateau_state)


def get_plateau_scale(opt_state) -> Optional[float]:
    found = []
    jax.tree_util.tree_map(
        lambda n: found.append(n.scale) if _is_plateau_state(n) else None,
        opt_state,
        is_leaf=_is_plateau_state,
    )
    return float(found[0]) if found else None


class PlateauController:
    """Host-side ReduceLROnPlateau decision logic (reference optimizers.py:54-56
    routes 'plateau' to torch.optim.lr_scheduler.ReduceLROnPlateau; the trainer
    steps it with the epoch's mean train loss, reference trainer.py:269-270).

    Semantics match torch (mode='min', threshold_mode='rel'): an epoch is
    "bad" unless metric < best * (1 - threshold); after `patience` bad epochs
    the scale is multiplied by `factor` (floored at min_lr/lr) and a cooldown
    starts. `step(metric)` returns the current scale.
    """

    def __init__(
        self,
        factor: float = 0.1,
        patience: int = 10,
        threshold: float = 1e-4,
        cooldown: int = 0,
        min_scale: float = 0.0,
        base_lr: float = 1.0,
        eps: float = 1e-8,
    ):
        self.factor = float(factor)
        self.patience = int(patience)
        self.threshold = float(threshold)
        self.cooldown = int(cooldown)
        self.min_scale = float(min_scale)
        # torch skips a reduction when the absolute lr change is <= eps
        self.base_lr = float(base_lr)
        self.eps = float(eps)
        self.best: Optional[float] = None
        self.num_bad_epochs = 0
        self.cooldown_counter = 0
        self.scale = 1.0

    @classmethod
    def from_config(cls, config: "OptimizerConfig") -> Optional["PlateauController"]:
        if config.lr_scheduler != "plateau":
            return None
        p = dict(config.lr_scheduler_params or {})
        min_lr = float(p.get("min_lr", 0.0))
        return cls(
            factor=float(p.get("factor", 0.1)),
            patience=int(p.get("patience", 10)),
            threshold=float(p.get("threshold", 1e-4)),
            cooldown=int(p.get("cooldown", 0)),
            min_scale=min_lr / config.lr if config.lr > 0 else 0.0,
            base_lr=config.lr,
            eps=float(p.get("eps", 1e-8)),
        )

    def step(self, metric: float) -> float:
        metric = float(metric)
        if self.best is None or metric < self.best * (1.0 - self.threshold):
            self.best = metric
            self.num_bad_epochs = 0
        else:
            self.num_bad_epochs += 1
        if self.cooldown_counter > 0:
            self.cooldown_counter -= 1
            self.num_bad_epochs = 0
        if self.num_bad_epochs > self.patience:
            new_scale = max(self.scale * self.factor, self.min_scale)
            if (self.scale - new_scale) * self.base_lr > self.eps:
                self.scale = new_scale
            self.cooldown_counter = self.cooldown
            self.num_bad_epochs = 0
        return self.scale

    def state_dict(self) -> Dict:
        return {
            "best": self.best,
            "num_bad_epochs": self.num_bad_epochs,
            "cooldown_counter": self.cooldown_counter,
            "scale": self.scale,
        }

    def load_state_dict(self, state: Dict) -> None:
        self.best = state.get("best")
        self.num_bad_epochs = int(state.get("num_bad_epochs", 0))
        self.cooldown_counter = int(state.get("cooldown_counter", 0))
        self.scale = float(state.get("scale", 1.0))


def build_lr_schedule(config: OptimizerConfig, steps_per_epoch: int = 1):
    """LR schedule callable(step) -> lr. `exponential` anneals by gamma once
    per epoch (reference Optimizer.anneal_on_epoch_end). `plateau` keeps a
    constant base lr — the decay is the host-driven PlateauScaleState."""
    if config.lr_scheduler == "plateau":
        return optax.constant_schedule(config.lr)
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
    if config.lr_scheduler == "plateau":
        chain.append(plateau_scale())

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
