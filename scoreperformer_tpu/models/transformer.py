"""Transformer stack: pre/post-norm residual blocks with layer pattern
('a','c','f') × depth, AdaLayerNorm style conditioning, and static KV caches.

Counterpart of scoreperformer/modules/transformer/transformer.py:31-257.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..configs import ModuleConfig
from ..parallel.mesh import shard_seq_activations
from .attention import Attention, init_kv_cache
from .layers import AdaptiveLayerNorm, FeedForward
from .moe import MoEFeedForward


@dataclass
class AttentionConfig(ModuleConfig):
    dim_head: int = 64
    dropout: float = 0.0
    one_kv_head: bool = False
    max_attend_past: Optional[int] = None
    alibi_pos_bias: bool = False
    alibi_num_heads: Optional[int] = None
    alibi_symmetric: bool = True
    alibi_learned: bool = False
    use_flash: bool = False  # see models/attention.py — XLA wins at these sizes
    # scale-train tail levers — see models/attention.py (exp_scale_tail.py)
    fused_mask_select: bool = False
    softmax_bf16: bool = False


@dataclass
class FeedForwardConfig(ModuleConfig):
    mult: int = 4
    glu: bool = False
    swish: bool = False
    post_act_ln: bool = False
    dropout: float = 0.0
    no_bias: bool = True
    # Mixture-of-Experts (models/moe.py — beyond reference parity, see
    # SURVEY §2.8): num_experts > 1 replaces every `moe_stride`-th
    # feed-forward with a routed MoE layer (stride 2 = GShard every-other).
    num_experts: int = 0
    expert_top_k: int = 2
    capacity_factor: float = 1.25
    moe_stride: int = 1
    router_aux_weight: float = 1e-2
    router_z_weight: float = 0.0


@dataclass
class TransformerConfig(ModuleConfig):
    _target_: str = "default"
    dim: int = 512
    depth: int = 4
    heads: int = 8
    attention: AttentionConfig = field(default_factory=AttentionConfig)
    feed_forward: FeedForwardConfig = field(default_factory=FeedForwardConfig)
    causal: bool = False
    cross_attend: bool = False
    only_cross: bool = False
    pre_norm: bool = True
    use_adanorm: bool = False
    style_emb_dim: Optional[int] = None
    # pipeline-parallel depth units (parallel/pipeline.py) are depth-1 stacks
    # without the trailing norm; every normal config keeps the default True
    final_norm: bool = True

    def layer_types(self) -> Tuple[str, ...]:
        if self.cross_attend and not self.only_cross:
            block = ("a", "c", "f")
        elif self.cross_attend and self.only_cross:
            block = ("c", "f")
        else:
            block = ("a", "f")
        return block * self.depth


class TransformerStack(nn.Module):
    config: TransformerConfig

    def setup(self):
        cfg = self.config
        self.layer_types = cfg.layer_types()

        layers = []
        ff_ord = 0
        for ind, layer_type in enumerate(self.layer_types):
            if layer_type == "a":
                layer = Attention(
                    dim=cfg.dim,
                    heads=cfg.heads,
                    causal=cfg.causal,
                    dim_head=cfg.attention.dim_head,
                    dropout=cfg.attention.dropout,
                    one_kv_head=cfg.attention.one_kv_head,
                    max_attend=cfg.attention.max_attend_past,
                    alibi_pos_bias=cfg.attention.alibi_pos_bias,
                    alibi_num_heads=cfg.attention.alibi_num_heads,
                    alibi_symmetric=cfg.attention.alibi_symmetric,
                    alibi_learned=cfg.attention.alibi_learned,
                    use_flash=cfg.attention.use_flash,
                    fused_mask_select=cfg.attention.fused_mask_select,
                    softmax_bf16=cfg.attention.softmax_bf16,
                    name=f"layer_{ind}_attn",
                )
            elif layer_type == "c":
                layer = Attention(
                    dim=cfg.dim,
                    heads=cfg.heads,
                    causal=False,
                    dim_head=cfg.attention.dim_head,
                    dropout=cfg.attention.dropout,
                    one_kv_head=cfg.attention.one_kv_head,
                    alibi_pos_bias=cfg.attention.alibi_pos_bias,
                    alibi_num_heads=cfg.attention.alibi_num_heads,
                    alibi_symmetric=cfg.attention.alibi_symmetric,
                    alibi_learned=cfg.attention.alibi_learned,
                    fused_mask_select=cfg.attention.fused_mask_select,
                    softmax_bf16=cfg.attention.softmax_bf16,
                    name=f"layer_{ind}_cross",
                )
            else:
                ff = cfg.feed_forward
                stride = max(1, int(ff.moe_stride))
                if ff.num_experts > 1 and ff_ord % stride == stride - 1:
                    if ff.post_act_ln:
                        raise ValueError(
                            "post_act_ln is not supported by MoE feed-forward "
                            "layers (num_experts > 1); disable one of them"
                        )
                    layer = MoEFeedForward(
                        dim=cfg.dim,
                        num_experts=ff.num_experts,
                        mult=ff.mult,
                        top_k=ff.expert_top_k,
                        capacity_factor=ff.capacity_factor,
                        glu=ff.glu,
                        swish=ff.swish,
                        dropout=ff.dropout,
                        no_bias=ff.no_bias,
                        router_aux_weight=ff.router_aux_weight,
                        router_z_weight=ff.router_z_weight,
                        name=f"layer_{ind}_ff",
                    )
                else:
                    layer = FeedForward(
                        dim=cfg.dim,
                        mult=ff.mult,
                        glu=ff.glu,
                        swish=ff.swish,
                        post_act_ln=ff.post_act_ln,
                        dropout=ff.dropout,
                        no_bias=ff.no_bias,
                        name=f"layer_{ind}_ff",
                    )
                ff_ord += 1
            layers.append(layer)
        self.layers = layers

        def make_norm(name):
            if cfg.use_adanorm:
                assert cfg.style_emb_dim is not None, "style_emb_dim required for adanorm"
                return AdaptiveLayerNorm(cfg.dim, cfg.style_emb_dim, name=name)
            return nn.LayerNorm(epsilon=1e-5, name=name)

        self.norms = [make_norm(f"layer_{ind}_norm") for ind in range(len(self.layer_types))]
        self.final_norm = (
            make_norm("final_norm") if (cfg.pre_norm and cfg.final_norm) else None
        )

    def _apply_norm(self, norm, x, style_embeddings):
        if self.config.use_adanorm:
            return norm(x, condition=style_embeddings)
        return norm(x)

    def init_cache(self, batch: int, max_len: int, dtype=jnp.float32) -> List[Any]:
        """Per-self-attention-layer static KV caches."""
        cfg = self.config
        kv_dim = cfg.attention.dim_head * (1 if cfg.attention.one_kv_head else cfg.heads)
        return [
            init_kv_cache(batch, max_len, kv_dim, dtype) if lt == "a" else None
            for lt in self.layer_types
        ]

    def __call__(
        self,
        x: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        context: Optional[jnp.ndarray] = None,
        context_mask: Optional[jnp.ndarray] = None,
        attn_mask: Optional[jnp.ndarray] = None,
        style_embeddings: Optional[jnp.ndarray] = None,
        caches: Optional[List[Any]] = None,
        cache_index: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        return_hiddens: bool = False,
    ):
        cfg = self.config
        assert not (cfg.cross_attend ^ (context is not None)), (
            "context must be passed iff cross_attend is set"
        )
        assert not cfg.use_adanorm or style_embeddings is not None

        has_cache = caches is not None
        new_caches: List[Any] = []
        hiddens = []

        # with a cache, `mask` covers the cache buffer (keys); queries are x
        attn_in_mask = None if has_cache else mask

        for ind, (layer_type, layer, norm) in enumerate(
            zip(self.layer_types, self.layers, self.norms)
        ):
            if layer_type == "a" and return_hiddens:
                hiddens.append(x)

            residual = x
            if cfg.pre_norm:
                x = self._apply_norm(norm, x, style_embeddings)

            if layer_type == "a":
                cache = caches[ind] if has_cache else None
                out, new_cache = layer(
                    x,
                    mask=mask if has_cache else attn_in_mask,
                    attn_mask=attn_mask,
                    cache=cache,
                    cache_index=cache_index,
                    deterministic=deterministic,
                )
                new_caches.append(new_cache)
            elif layer_type == "c":
                out, _ = layer(
                    x,
                    context=context,
                    mask=attn_in_mask,
                    context_mask=context_mask,
                    deterministic=deterministic,
                )
                new_caches.append(None)
            else:
                if isinstance(layer, MoEFeedForward):
                    # with a cache, `mask` covers cache keys, not the fresh
                    # queries — routing then sees every fresh token as valid
                    ff_mask = (
                        mask
                        if (
                            not has_cache
                            and mask is not None
                            and mask.shape[:2] == x.shape[:2]
                        )
                        else None
                    )
                    out = layer(x, mask=ff_mask, deterministic=deterministic)
                else:
                    out = layer(x, deterministic=deterministic)
                new_caches.append(None)

            # sequence-parallel residual stream: no-op unless the trainer
            # installed an activation sharding (parallel.mesh docstring)
            x = shard_seq_activations(out + residual)

            if not cfg.pre_norm:
                x = self._apply_norm(norm, x, style_embeddings)

        if self.final_norm is not None:
            x = self._apply_norm(self.final_norm, x, style_embeddings)

        if return_hiddens:
            hiddens.append(x)

        return x, (new_caches if has_cache else None), hiddens
