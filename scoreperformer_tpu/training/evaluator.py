"""Online evaluation metrics.

Counterpart of scoreperformer/models/scoreperformer/evaluator.py:37-106:
per-stream argmax accuracy plus (weighted) expected value-space distances —
computed jit-side with masked means instead of boolean gathers.
"""
from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..configs import Registry

EVALUATORS = Registry("evaluators")


def _masked_mean(values, mask):
    mask = mask.astype(values.dtype)
    return (values * mask).sum() / jnp.maximum(mask.sum(), 1.0)


@EVALUATORS.register("EmbeddingClassifierEvaluator")
class EmbeddingClassifierEvaluator:
    """(classifiers/evaluator.py:6-19)"""

    def __init__(self, tokenizer=None, mode=None, **kwargs):
        pass

    def __call__(self, labels, logits):
        if isinstance(logits, dict):
            metrics = {}
            correct, total = 0.0, 0.0
            for i, (key, lg) in enumerate(logits.items()):
                preds = jnp.argmax(lg, axis=-1)
                acc = (preds == labels[..., i]).mean()
                metrics[f"accuracy/{key}"] = acc
                correct = correct + (preds == labels[..., i]).sum()
                total = total + labels[..., i].size
            metrics["accuracy"] = correct / jnp.maximum(total, 1)
            return metrics
        preds = jnp.argmax(logits, axis=-1)
        return {"accuracy": (preds == labels).astype(jnp.float32).mean()}


@EVALUATORS.register("ScorePerformerEvaluator")
class ScorePerformerEvaluator:
    def __init__(
        self,
        tokenizer=None,
        mode: Optional[str] = "mixlm",
        label_pad_token_id: int = -100,
        weighted_distance: bool = False,
        ignore_keys: Optional[List[str]] = None,
    ):
        self.tokenizer = tokenizer
        self.mode = mode
        self.label_pad_token_id = label_pad_token_id
        self.weighted_distance = weighted_distance
        self.ignore_keys = ignore_keys or []

        self.token_values = None
        if tokenizer is not None:
            self.token_values = {
                key: jnp.asarray(values)
                for key, values in tokenizer.token_values(normalize=False).items()
            }

    def __call__(
        self, labels: jnp.ndarray, logits: Dict[str, jnp.ndarray]
    ) -> Dict[str, jnp.ndarray]:
        """`labels` is the unshifted (b, t, S) label tensor; `logits` the
        decoder per-stream logits (already shifted for clm/mixlm modes)."""
        if self.mode in ("clm", "mixlm"):
            labels = labels[:, 1:]

        keys = list(logits.keys())
        preds = {key: jnp.argmax(logits[key], axis=-1) for key in keys}

        metrics: Dict[str, jnp.ndarray] = {}

        all_correct, all_mask = [], []
        pred_correct, pred_mask = [], []
        for i, key in enumerate(keys):
            lab = labels[..., i]
            valid = lab != self.label_pad_token_id
            correct = (preds[key] == lab).astype(jnp.float32)
            all_correct.append(correct * valid)
            all_mask.append(valid)
            if key not in self.ignore_keys:
                pred_correct.append(correct * valid)
                pred_mask.append(valid)
                metrics[f"accuracy/{key}"] = _masked_mean(correct, valid)

        total = sum(m.sum() for m in all_mask)
        metrics["accuracy"] = sum(c.sum() for c in all_correct) / jnp.maximum(total, 1.0)
        if self.ignore_keys:
            ptotal = sum(m.sum() for m in pred_mask)
            metrics["accuracy/pred"] = sum(c.sum() for c in pred_correct) / jnp.maximum(
                ptotal, 1.0
            )

        if self.token_values is not None:
            for i, key in enumerate(keys):
                if key in self.ignore_keys:
                    continue
                values = self.token_values[key]
                lab = labels[..., i]
                valid = lab != self.label_pad_token_id
                targets = values[jnp.clip(lab, 0, len(values) - 1)]
                if self.weighted_distance:
                    probs = jax.nn.softmax(logits[key], axis=-1)
                    expected_dist = (
                        jnp.abs(targets[..., None] - values[None, None, :]) * probs
                    ).sum(-1)
                    metrics[f"distance/{key}"] = _masked_mean(expected_dist, valid)
                else:
                    pred_vals = values[preds[key]]
                    metrics[f"distance/{key}"] = _masked_mean(
                        jnp.abs(pred_vals - targets), valid
                    )

        return metrics
