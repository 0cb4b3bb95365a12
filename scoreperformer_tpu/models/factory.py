"""Model config factory: experiment-config dicts → config dataclasses → modules.

Counterpart of the reference's Constructor/registry plumbing
(experiments/components.py:103-113 + modules/constructor.py), mapping the same
recipe YAML schema (recipes/scoreperformer/base.yaml) onto this framework's
dataclasses.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

from ..configs import Registry
from .classifiers import LinearEmbeddingClassifierConfig, MultiHeadEmbeddingClassifierConfig
from .embeddings import TupleTokenEmbeddingsConfig, TupleTokenHeadConfig, TupleTokenRegressionHeadConfig
from .mmd import MMDTupleTransformerConfig
from .scoreperformer import (
    PerformerConfig,
    PerformerModel,
    ScorePerformerConfig,
    ScorePerformerModel,
)
from .transformer import AttentionConfig, FeedForwardConfig, TransformerConfig
from .tuple_transformer import TupleTransformerConfig

MODELS = Registry("models")


def build_transformer_config(data: Optional[Dict[str, Any]]) -> TransformerConfig:
    data = dict(data or {})
    target = data.get("_target_", "default")
    cfg = TransformerConfig.from_dict(data)
    cfg._target_ = target
    if target == "encoder":
        cfg.causal = False
    elif target == "decoder":
        cfg.causal = True
    if "attention" in data:
        cfg.attention = AttentionConfig.from_dict(data["attention"])
    if "feed_forward" in data:
        cfg.feed_forward = FeedForwardConfig.from_dict(data["feed_forward"])
    return cfg


def build_tuple_transformer_config(
    data: Optional[Dict[str, Any]], mmd: bool = False
) -> TupleTransformerConfig:
    data = dict(data or {})
    cls = MMDTupleTransformerConfig if mmd else TupleTransformerConfig
    cfg = cls.from_dict(data)
    if "transformer" in data:
        cfg.transformer = build_transformer_config(data["transformer"])
    if "token_embeddings" in data:
        emb = dict(data["token_embeddings"])
        emb_cfg = TupleTokenEmbeddingsConfig.from_dict(emb)
        emb_cfg._target_ = emb.get("_target_", "simple")
        cfg.token_embeddings = emb_cfg
    if data.get("lm_head") is not None:
        head = dict(data["lm_head"])
        head_cfg = TupleTokenHeadConfig.from_dict(head)
        head_cfg._target_ = head.get("_target_", "lm")
        cfg.lm_head = head_cfg
    else:
        cfg.lm_head = None
    if data.get("regression_head") is not None:
        cfg.regression_head = TupleTokenRegressionHeadConfig.from_dict(data["regression_head"])
    else:
        cfg.regression_head = None
    return cfg


def build_classifiers_config(
    data: Optional[Dict[str, Any]]
) -> Optional[MultiHeadEmbeddingClassifierConfig]:
    if data is None:
        return None
    data = dict(data)
    cfg = MultiHeadEmbeddingClassifierConfig.from_dict(data)
    if "classifier" in data:
        cfg.classifier = LinearEmbeddingClassifierConfig.from_dict(data["classifier"])
    return cfg


def build_scoreperformer_config(data: Dict[str, Any]) -> ScorePerformerConfig:
    """Full model config from a recipe `model:` dict (post data-injection)."""
    data = dict(data)
    cfg = ScorePerformerConfig.from_dict(data)
    cfg.perf_decoder = build_tuple_transformer_config(data.get("perf_decoder"))
    cfg.score_encoder = (
        build_tuple_transformer_config(data["score_encoder"])
        if data.get("score_encoder") is not None
        else None
    )
    cfg.perf_encoder = (
        build_tuple_transformer_config(data["perf_encoder"], mmd=True)
        if data.get("perf_encoder") is not None
        else None
    )
    cfg.classifiers = build_classifiers_config(data.get("classifiers"))
    return cfg


@MODELS.register("ScorePerformer")
def build_scoreperformer(**data) -> Tuple[ScorePerformerModel, ScorePerformerConfig]:
    cfg = build_scoreperformer_config(data)
    return ScorePerformerModel(config=cfg), cfg


@MODELS.register("Performer")
def build_performer(**data) -> Tuple[PerformerModel, PerformerConfig]:
    cfg = PerformerConfig.from_dict(data)
    cfg.transformer = build_tuple_transformer_config(data.get("transformer"))
    num_tokens = data["num_tokens"]
    return PerformerModel(num_tokens=num_tokens, config=cfg), cfg
