"""Embedding classifiers (counterpart of scoreperformer/models/classifiers/model.py).

The multi-head classifier consumes style embeddings and predicts musical
direction classes per group; masked-weighted cross-entropy replaces the
reference's boolean gather (`embeddings[clf_mask]`, model.py:323-332) to keep
shapes static under jit.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from flax import struct

from ..configs import ModuleConfig


@dataclass
class LinearEmbeddingClassifierConfig(ModuleConfig):
    _target_: str = "linear"
    hidden_dims: Optional[Sequence[int]] = field(default_factory=lambda: (32,))
    dropout: float = 0.0


@dataclass
class MultiHeadEmbeddingClassifierConfig(ModuleConfig):
    _target_: str = "multi-head"
    num_classes: Optional[Dict[str, int]] = None
    classifier: LinearEmbeddingClassifierConfig = field(
        default_factory=LinearEmbeddingClassifierConfig
    )
    class_samples: Optional[Dict[str, List[int]]] = None
    weighted_classes: bool = False
    loss_weight: float = 1.0
    detach_inputs: Union[bool, float] = False


@struct.dataclass
class EmbeddingClassifierOutput:
    logits: Optional[jnp.ndarray] = None
    loss: Optional[jnp.ndarray] = None


@struct.dataclass
class MultiHeadEmbeddingClassifierOutput:
    logits: Optional[Dict[str, jnp.ndarray]] = None
    loss: Optional[jnp.ndarray] = None
    losses: Optional[Dict[str, jnp.ndarray]] = None


def effective_class_weights(num_samples, beta: float = 0.999, mult: float = 1e4):
    """Effective-number class weighting (classifiers/model.py:194-200)."""
    num_samples = np.maximum(np.asarray(num_samples, dtype=np.float64), 1e-6)
    effective_num = 1.0 - np.power(beta, num_samples * mult)
    weights = (1.0 - beta) / effective_num
    weights = weights / weights.sum() * len(num_samples)
    return weights


def weighted_cross_entropy(logits, labels, class_weights=None, sample_weights=None):
    """CE with optional per-class weights, matching torch's F.cross_entropy
    weight normalization (mean over sum of applied weights)."""
    num_classes = logits.shape[-1]
    labels_clipped = jnp.clip(labels, 0, num_classes - 1)
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(log_probs, labels_clipped[..., None], axis=-1)[..., 0]
    if class_weights is not None:
        w = jnp.asarray(class_weights)[labels_clipped]
    else:
        w = jnp.ones_like(nll)
    if sample_weights is not None:
        w = w * sample_weights
    denom = jnp.maximum(w.sum(), 1e-9)
    return (nll * w).sum() / denom


class LinearEmbeddingClassifier(nn.Module):
    """MLP classifier (classifiers/model.py:42-91)."""

    num_classes: int
    hidden_dims: tuple = (32,)
    dropout: float = 0.0
    class_weights: Optional[tuple] = None

    @nn.compact
    def __call__(self, embeddings, labels=None, sample_weights=None, deterministic=True):
        x = embeddings
        dims = list(self.hidden_dims or [])
        for i, d in enumerate(dims):
            if self.dropout > 0:
                x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
            x = nn.relu(nn.Dense(d, name=f"layer_{i}")(x))
        if self.dropout > 0:
            x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        logits = nn.Dense(self.num_classes, name="out")(x)

        loss = None
        if labels is not None:
            cw = jnp.asarray(self.class_weights) if self.class_weights is not None else None
            loss = weighted_cross_entropy(logits, labels, cw, sample_weights)
        return EmbeddingClassifierOutput(logits=logits, loss=loss)


class GRUCellStack(nn.Module):
    """Minimal GRU sequence classifier (classifiers/model.py:101-142) as a
    `lax.scan` over an nn.GRUCell — the TPU-idiomatic recurrent form."""

    hidden_dim: int
    num_classes: int

    @nn.compact
    def __call__(self, embeddings, labels=None, class_weights=None):
        cell = nn.GRUCell(features=self.hidden_dim)
        scan = nn.RNN(cell, name="gru")
        out = scan(embeddings)  # (b, t, h)
        logits = nn.Dense(self.num_classes, name="out")(out[:, -1])
        loss = None
        if labels is not None:
            loss = weighted_cross_entropy(logits, labels, class_weights)
        return EmbeddingClassifierOutput(logits=logits, loss=loss)


class MultiHeadEmbeddingClassifier(nn.Module):
    """One linear head per direction group with effective-number weighting
    (classifiers/model.py:165-226)."""

    input_dim: int
    num_classes: Dict[str, int]
    config: MultiHeadEmbeddingClassifierConfig

    def setup(self):
        cfg = self.config
        heads = {}
        for key, num in self.num_classes.items():
            class_weights = None
            if cfg.weighted_classes and cfg.class_samples and key in cfg.class_samples:
                class_weights = tuple(effective_class_weights(cfg.class_samples[key]).tolist())
            heads[key] = LinearEmbeddingClassifier(
                num_classes=num,
                hidden_dims=tuple(cfg.classifier.hidden_dims or ()),
                dropout=cfg.classifier.dropout,
                class_weights=class_weights,
                name=f"head_{key}",
            )
        self.heads = heads
        self.detach = float(cfg.detach_inputs)

    def __call__(self, embeddings, labels=None, sample_weights=None, deterministic=True):
        x = self.detach * jax.lax.stop_gradient(embeddings) + (1 - self.detach) * embeddings

        logits = {}
        losses: Dict[str, jnp.ndarray] = {}
        loss = 0.0
        for i, (key, head) in enumerate(self.heads.items()):
            out = head(
                x,
                labels=labels[..., i] if labels is not None else None,
                sample_weights=sample_weights,
                deterministic=deterministic,
            )
            logits[key] = out.logits
            if out.loss is not None:
                loss += out.loss
                losses["clf/" + key] = out.loss

        loss = self.config.loss_weight * loss / max(1, len(self.heads))
        losses["clf"] = loss
        has_labels = labels is not None
        return MultiHeadEmbeddingClassifierOutput(
            logits=logits,
            loss=loss if has_labels else None,
            losses=losses if has_labels else None,
        )
