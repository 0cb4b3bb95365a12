"""TupleTransformer: transformer over tuple-token sequences.

Counterpart of scoreperformer/models/scoreperformer/transformer.py:46-222 with
static-cache decode support: `caches`/`cache_index` thread fixed-size KV
buffers through the stack so AR/MixedLM decoding compiles into a single XLA
program.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Union

import jax.numpy as jnp
from flax import linen as nn
from flax import struct

from ..configs import ModuleConfig
from .embeddings import (
    StreamEmbedding,
    TupleTokenEmbeddings,
    TupleTokenEmbeddingsConfig,
    TupleTokenHeadConfig,
    TupleTokenLMHead,
    TupleTokenRegressionHead,
    TupleTokenRegressionHeadConfig,
    TupleTokenTiedLMHead,
    TupleTokenTiedSplitLMHead,
)
from .layers import AbsolutePositionalEmbedding
from .transformer import TransformerConfig, TransformerStack


class EmbeddingModes:
    SUM = "mean"
    CONCAT = "cat"
    ATTENTION = "attention"
    ADANORM = "adanorm"


@struct.dataclass
class TupleTransformerOutput:
    hidden_state: jnp.ndarray
    logits: Optional[Dict[str, jnp.ndarray]] = None
    reg_values: Optional[Dict[str, jnp.ndarray]] = None
    caches: Optional[Any] = None
    hiddens: Optional[List[jnp.ndarray]] = None


@dataclass
class TupleTransformerConfig(ModuleConfig):
    dim: int = 512
    max_seq_len: int = 1024
    transformer: TransformerConfig = field(default_factory=TransformerConfig)
    token_embeddings: TupleTokenEmbeddingsConfig = field(
        default_factory=TupleTokenEmbeddingsConfig
    )
    use_abs_pos_emb: bool = True
    emb_norm: bool = False
    emb_dropout: float = 0.0
    context_emb_dim: Optional[int] = None
    context_emb_mode: str = EmbeddingModes.ATTENTION
    style_emb_dim: Optional[Union[int, List[int]]] = None
    style_emb_mode: str = EmbeddingModes.CONCAT
    lm_head: Optional[TupleTokenHeadConfig] = None
    regression_head: Optional[TupleTokenRegressionHeadConfig] = None

    def resolved_style_dim(self) -> int:
        if self.style_emb_dim is None:
            return 0
        if isinstance(self.style_emb_dim, (list, tuple)):
            return int(sum(self.style_emb_dim))
        return int(self.style_emb_dim)


def build_stream_embeddings(
    scope: nn.Module,
    num_tokens: Dict[str, int],
    cfg: TupleTokenEmbeddingsConfig,
    emb_dims_default: int,
    prefix: str = "shared_emb",
) -> Dict[str, StreamEmbedding]:
    """Standalone per-stream embedding construction, used by ScorePerformer to
    create tables shared across submodels (tie_token_emb, model.py:213-218)."""
    import numpy as np

    emb_dims = cfg.emb_dims if cfg.emb_dims is not None else emb_dims_default
    continuous = cfg.continuous
    keys = list(num_tokens)
    continuous_keys = (
        keys if continuous is True else ([] if continuous is False else list(continuous))
    )
    token_values = cfg.token_values or {}
    out = {}
    for key in keys:
        dim = emb_dims if isinstance(emb_dims, int) else emb_dims[key]
        if key in continuous_keys:
            out[key] = StreamEmbedding(
                num_embeddings=num_tokens[key],
                embedding_dim=dim,
                discrete=cfg.discrete,
                continuous=True,
                dense=cfg.continuous_dense,
                token_values=np.asarray(token_values[key])
                if key in token_values and token_values[key] is not None
                else None,
                discrete_ids=tuple(cfg.discrete_ids) if cfg.discrete_ids else None,
                name=f"{prefix}_{key}",
            )
        else:
            out[key] = StreamEmbedding(
                num_embeddings=num_tokens[key],
                embedding_dim=dim,
                discrete=True,
                continuous=False,
                name=f"{prefix}_{key}",
            )
    return out


class TupleTransformerModule(nn.Module):
    num_tokens: Dict[str, int]
    config: TupleTransformerConfig
    shared_streams: Optional[Dict[str, StreamEmbedding]] = None

    def setup(self):
        cfg = self.config
        dim = cfg.dim

        self.context_dim = cfg.context_emb_dim or 0
        self.style_dim = cfg.resolved_style_dim()

        self.token_emb = TupleTokenEmbeddings(
            num_tokens=self.num_tokens,
            config=cfg.token_embeddings,
            project_emb_dim=dim,
            shared_streams=self.shared_streams,
            name="token_emb",
        )

        tcfg = cfg.transformer
        # context via concatenation disables cross-attention (transformer.py:109-111)
        cross_attend = tcfg.cross_attend and cfg.context_emb_mode == EmbeddingModes.ATTENTION
        self.transformer = TransformerStack(
            config=tcfg.replace(
                dim=dim,
                cross_attend=cross_attend,
                use_adanorm=cfg.style_emb_mode == EmbeddingModes.ADANORM,
                style_emb_dim=self.style_dim,
            ),
            name="transformer",
        )

        self.pos_emb = (
            AbsolutePositionalEmbedding(dim, cfg.max_seq_len, name="pos_emb")
            if cfg.use_abs_pos_emb
            else None
        )
        self.emb_norm_layer = nn.LayerNorm(epsilon=1e-5, name="emb_norm") if cfg.emb_norm else None
        self.emb_dropout = nn.Dropout(cfg.emb_dropout) if cfg.emb_dropout > 0 else None

        total_emb_dim = (
            dim
            + int(cfg.context_emb_mode == EmbeddingModes.CONCAT) * self.context_dim
            + int(cfg.style_emb_mode == EmbeddingModes.CONCAT) * self.style_dim
        )
        self.project_emb = (
            nn.Dense(dim, name="project_emb") if total_emb_dim != dim else None
        )

        self.lm_head = None
        if cfg.lm_head is not None:
            target = cfg.lm_head._target_
            if target == "lm":
                self.lm_head = TupleTokenLMHead(
                    num_tokens=self.num_tokens,
                    filter_keys=tuple(cfg.lm_head.filter_keys) if cfg.lm_head.filter_keys else None,
                    name="lm_head",
                )
            elif target == "lm-tied":
                self.lm_head = TupleTokenTiedLMHead(
                    embeddings=self.token_emb,
                    reuse_projection=cfg.lm_head.reuse_projection,
                    name="lm_head",
                )
            elif target == "lm-tied-split":
                self.lm_head = TupleTokenTiedSplitLMHead(
                    embeddings=self.token_emb,
                    filter_keys=tuple(cfg.lm_head.filter_keys) if cfg.lm_head.filter_keys else None,
                    name="lm_head",
                )
            else:
                raise ValueError(f"unknown lm head target {target}")

        self.regression_head = None
        if cfg.regression_head is not None:
            self.regression_head = TupleTokenRegressionHead(
                regression_keys=tuple(cfg.regression_head.regression_keys),
                name="regression_head",
            )

    @property
    def dim(self) -> int:
        return self.config.dim

    def init_cache(self, batch: int, max_len: int, dtype=jnp.float32):
        return self.transformer.init_cache(batch, max_len, dtype)

    def __call__(
        self,
        x: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        x_extra: Optional[List[jnp.ndarray]] = None,
        style_embeddings: Optional[jnp.ndarray] = None,
        context: Optional[jnp.ndarray] = None,
        context_mask: Optional[jnp.ndarray] = None,
        attn_mask: Optional[jnp.ndarray] = None,
        caches: Optional[List[Any]] = None,
        cache_index: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        return_embeddings: bool = False,
        return_hiddens: bool = False,
        logits_keys: Optional[List[str]] = None,
    ) -> TupleTransformerOutput:
        cfg = self.config
        if x_extra is not None and not isinstance(x_extra, (list, tuple)):
            x_extra = [x_extra]

        h = self.token_emb(x, x_extra=x_extra)
        n = h.shape[1]

        if self.pos_emb is not None:
            pos = None
            if cache_index is not None:
                pos = cache_index + jnp.arange(n)
            h = h + self.pos_emb(n, pos=pos)
        if self.emb_norm_layer is not None:
            h = self.emb_norm_layer(h)

        if context is not None and cfg.context_emb_mode == EmbeddingModes.CONCAT:
            h = jnp.concatenate([h, context[:, : h.shape[1]]], axis=-1)
            context = None

        if style_embeddings is not None:
            style_embeddings = style_embeddings[:, : h.shape[1]]
            if cfg.style_emb_mode == EmbeddingModes.CONCAT:
                h = jnp.concatenate([h, style_embeddings], axis=-1)
                style_embeddings = None

        if self.emb_dropout is not None:
            h = self.emb_dropout(h, deterministic=deterministic)
        if self.project_emb is not None:
            h = self.project_emb(h)

        out, new_caches, hiddens = self.transformer(
            h,
            mask=mask,
            context=context,
            context_mask=context_mask,
            attn_mask=attn_mask,
            style_embeddings=style_embeddings,
            caches=caches,
            cache_index=cache_index,
            deterministic=deterministic,
            return_hiddens=return_hiddens,
        )

        logits = None
        if not return_embeddings and self.lm_head is not None:
            logits = self.lm_head(out, keys=logits_keys)

        reg_values = None
        if not return_embeddings and self.regression_head is not None:
            reg_values = self.regression_head(out, keys=logits_keys)

        return TupleTransformerOutput(
            hidden_state=out,
            logits=logits,
            reg_values=reg_values,
            caches=new_caches,
            hiddens=hiddens if return_hiddens else None,
        )

    def apply_lm_head(self, hidden, keys=None, batched=False):
        assert self.lm_head is not None
        if batched:
            assert isinstance(self.lm_head, TupleTokenTiedLMHead), (
                "batched logits are only available on the tied LM head"
            )
            return self.lm_head(hidden, batched=True)
        return self.lm_head(hidden, keys=keys)
