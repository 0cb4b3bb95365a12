"""Tuple-token embeddings and LM heads.

Counterpart of scoreperformer/models/scoreperformer/embeddings.py and the
discrete+continuous embeddings of modules/transformer/embeddings.py:91-222.

TPU-first design note: the reference's eval-time "cached value weight"
optimization (embeddings.py:146-155) is unnecessary here — we always
materialize each stream's full table (token_weight + MLP(token_values)) and
gather from it; XLA fuses the tiny MLP-over-table computation, and the gather
is one `take` per stream. The materialized tables are also exactly what the
tied LM heads need (weight.T logits).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..configs import ModuleConfig

# Multi-token lookups (training / prefill, seq_len > 1) compute the fused
# embedding lookup as one-hot @ table instead of a gather: the BACKWARD of a
# gather is a scatter-add, which the round-3 train-step profile put at 10 ms
# of a 130 ms device step (the single largest non-matmul item), while the
# one-hot contraction and its transpose both run on the MXU (the same trade
# the MMD segment aggregation already won with). Single-token decode steps
# (seq_len == 1) keep the gather: it is the bit-parity-tested decode
# program, and the one-hot alternative is REFUTED as a decode win — the
# first back-to-back A/B runs showed +3.3%/+7.8% sampled, but the
# interleaved A/B (scripts/exp_decode_onehot2.py, BASELINE.md round 5)
# measured median 0.999x: the apparent gain was tunnel clock drift. It is
# also not bit-exact (routes the fp32 table through the MXU's bf16 inputs,
# token agreement 0.98) and HIGHEST precision is slower still. The knob
# below stays only so the experiment is re-runnable — don't re-try.
ONEHOT_LOOKUP_MIN_SEQ = 2
ONEHOT_DECODE_PRECISION = None

# default per-stream embedding dims (reference embeddings.py:14-25)
DEFAULT_EMB_DIMS = {
    "Bar": 128,
    "Position": 128,
    "Pitch": 128,
    "Velocity": 64,
    "Duration": 64,
    "Tempo": 64,
    "TimeSig": 16,
    "Program": 64,
    "OnsetDev": 64,
    "PerfDuration": 64,
}


@dataclass
class TupleTokenEmbeddingsConfig(ModuleConfig):
    _target_: str = "simple"
    emb_dims: Union[Dict[str, int], int, None] = None
    mode: str = "cat"
    emb_norm: bool = False
    discrete: bool = True
    continuous: Union[bool, List[str]] = False
    continuous_dense: bool = False
    token_values: Optional[Dict[str, list]] = None
    discrete_ids: Optional[List[int]] = None
    tie_keys: Optional[Dict[str, str]] = None
    # multi-seq options (reference embeddings.py:175-197)
    multiseq_mode: str = "pre-sum"
    num_sequences: int = 2


class StreamEmbedding(nn.Module):
    """One token stream's embedding table: optional discrete rows + optional
    continuous value encoder over fixed token values
    (DiscreteContinuousEmbedding / DiscreteDenseContinuousEmbedding)."""

    num_embeddings: int
    embedding_dim: int
    discrete: bool = True
    continuous: bool = False
    dense: bool = False
    dense_depth: int = 2
    token_values: Optional[np.ndarray] = None
    discrete_ids: Optional[tuple] = None
    padding_idx: Optional[int] = 0

    def setup(self):
        has_discrete = self.discrete or (self.discrete_ids is not None)
        if has_discrete:
            self.index_weight = self.param(
                "index_weight",
                nn.initializers.normal(stddev=1e-2),
                (self.num_embeddings, self.embedding_dim),
            )
        if self.continuous:
            values = (
                np.asarray(self.token_values, dtype=np.float32)
                if self.token_values is not None
                else np.linspace(0.0, 1.0, self.num_embeddings, dtype=np.float32)
            )
            if self.padding_idx is not None:
                values = values.copy()
                values[self.padding_idx] = 0.0
            self.values = jnp.asarray(values.reshape(-1, 1))
            if self.dense:
                dims = [self.embedding_dim] * self.dense_depth
                self.value_layers = [
                    nn.Dense(d, kernel_init=nn.initializers.normal(1e-2), name=f"value_{i}")
                    for i, d in enumerate(dims)
                ]
            else:
                self.value_dense = nn.Dense(
                    self.embedding_dim,
                    use_bias=False,
                    kernel_init=nn.initializers.normal(1e-2),
                    name="value",
                )

    @property
    def has_discrete(self) -> bool:
        return self.discrete or (self.discrete_ids is not None)

    def _value_table(self) -> jnp.ndarray:
        if self.dense:
            h = self.values
            for i, layer in enumerate(self.value_layers):
                h = layer(h)
                if i < len(self.value_layers) - 1:
                    h = jax.nn.mish(h)
            table = h
        else:
            table = self.value_dense(self.values)
        if self.discrete_ids is not None:
            mask = jnp.ones((self.num_embeddings, 1)).at[jnp.array(self.discrete_ids)].set(0.0)
            table = table * mask
        return table

    def table(self) -> jnp.ndarray:
        """Materialized full embedding table (== reference `weight` property)."""
        parts = []
        if self.has_discrete:
            w = self.index_weight
            if not self.discrete:  # only discrete_ids rows are active
                mask = jnp.zeros((self.num_embeddings, 1)).at[jnp.array(self.discrete_ids)].set(1.0)
                w = w * mask
            if self.padding_idx is not None:
                w = w * jnp.ones((self.num_embeddings, 1)).at[self.padding_idx].set(0.0)
            parts.append(w)
        if self.continuous:
            parts.append(self._value_table())
        return sum(parts)

    def __call__(self, tokens: jnp.ndarray) -> jnp.ndarray:
        return jnp.take(self.table(), tokens, axis=0)


class TupleTokenEmbeddings(nn.Module):
    """Per-stream embeddings fused by concat+project or sum
    (reference embeddings.py:46-165). Also supports the multi-seq fusion modes
    for MixedLM (seq, masked_seq) input pairs (embeddings.py:175-267)."""

    num_tokens: Dict[str, int]
    config: TupleTokenEmbeddingsConfig
    project_emb_dim: int = 512
    # externally-created StreamEmbedding modules shared across submodels
    # (ScorePerformer tie_token_emb, reference model.py:213-218)
    shared_streams: Optional[Dict[str, "StreamEmbedding"]] = None

    def setup(self):
        cfg = self.config
        keys = list(self.num_tokens.keys())

        emb_dims = cfg.emb_dims if cfg.emb_dims is not None else self.project_emb_dim
        if cfg.mode == "sum" and not isinstance(emb_dims, int):
            values = list(emb_dims.values())
            assert all(v == values[0] for v in values)

        continuous = cfg.continuous
        if isinstance(continuous, bool):
            continuous_keys = keys if continuous else []
        else:
            continuous_keys = list(continuous)
        self.continuous_keys = continuous_keys
        self.continuous = len(continuous_keys) > 0

        token_values = cfg.token_values or {}
        tie_keys = cfg.tie_keys or {}

        embs = {}
        dims = {}
        total = 0
        for key in keys:
            dim = emb_dims if isinstance(emb_dims, int) else emb_dims[key]
            if key in tie_keys:
                dims[key] = dims[tie_keys[key]]
                total += dims[key] if cfg.mode == "cat" else 0
                continue
            if self.shared_streams is not None and key in self.shared_streams:
                embs[key] = self.shared_streams[key]
                dims[key] = self.shared_streams[key].embedding_dim
                total += dims[key] if cfg.mode == "cat" else dims[key] - total
                continue
            if key in continuous_keys:
                embs[key] = StreamEmbedding(
                    num_embeddings=self.num_tokens[key],
                    embedding_dim=dim,
                    discrete=cfg.discrete,
                    continuous=True,
                    dense=cfg.continuous_dense,
                    token_values=np.asarray(token_values[key])
                    if key in token_values and token_values[key] is not None
                    else None,
                    discrete_ids=tuple(cfg.discrete_ids) if cfg.discrete_ids else None,
                    name=f"emb_{key}",
                )
            else:
                embs[key] = StreamEmbedding(
                    num_embeddings=self.num_tokens[key],
                    embedding_dim=dim,
                    discrete=True,
                    continuous=False,
                    name=f"emb_{key}",
                )
            dims[key] = dim
            total += dim if cfg.mode == "cat" else dim - total

        self.embs = embs
        self.tie_keys_map = tie_keys
        self.emb_dims_map = dims
        self.total_emb_dim = total

        self.norm = nn.LayerNorm(epsilon=1e-5, name="norm") if cfg.emb_norm else None
        # projection as explicit params so tied LM heads can reuse the kernel
        # transposed (reference embeddings.py:337-346)
        self.has_project = self.total_emb_dim != self.project_emb_dim
        if self.has_project:
            self.project_kernel = self.param(
                "project_kernel",
                nn.initializers.lecun_normal(),
                (self.total_emb_dim, self.project_emb_dim),
            )
            self.project_bias = self.param(
                "project_bias", nn.initializers.zeros, (self.project_emb_dim,)
            )
        if cfg._target_ == "multi-seq" and cfg.multiseq_mode == "post-cat":
            self.project_multiemb = nn.Dense(self.project_emb_dim, name="project_multiemb")

    @property
    def multiseq_mode(self) -> Optional[str]:
        return self.config.multiseq_mode if self.config._target_ == "multi-seq" else None

    def stream_emb(self, key: str):
        return self.embs[self.tie_keys_map.get(key, key)]

    def tables(self) -> Dict[str, jnp.ndarray]:
        """Materialized per-stream tables (for tied LM heads)."""
        return {key: self.stream_emb(key).table() for key in self.num_tokens}

    def project_fwd(self, h: jnp.ndarray) -> jnp.ndarray:
        return h @ self.project_kernel + self.project_bias

    def project_transpose(self, x: jnp.ndarray) -> jnp.ndarray:
        """x @ W.T — the tied-head direction (embeddings.py:345)."""
        return x @ self.project_kernel.T

    @property
    def _uniform_dim(self) -> Optional[int]:
        dims = list(self.emb_dims_map.values())
        return dims[0] if all(d == dims[0] for d in dims) else None

    def _forward_single(self, x: jnp.ndarray) -> jnp.ndarray:
        if self._uniform_dim is not None:
            # fused path: ONE gather from the concatenated per-stream tables
            # instead of S separate gathers + concat. Inside a decode scan the
            # table concat is loop-invariant (function of params only) and XLA
            # hoists it; the per-step op count drops S-fold. Values are
            # bit-identical to the per-stream path in "cat" mode.
            tables = [self.stream_emb(key).table() for key in self.num_tokens]
            sizes = np.array([t.shape[0] for t in tables])
            offsets = jnp.asarray(np.concatenate([[0], np.cumsum(sizes)[:-1]]))
            fused = jnp.concatenate(tables, axis=0)
            ids = x + offsets
            seq_len = x.shape[-2] if x.ndim >= 3 else 1
            if seq_len >= ONEHOT_LOOKUP_MIN_SEQ:
                # one-hot matmul lookup — see ONEHOT_LOOKUP_MIN_SEQ
                oh = jax.nn.one_hot(ids, fused.shape[0], dtype=fused.dtype)
                h = oh @ fused  # (..., S, d)
            elif ONEHOT_DECODE_PRECISION is not None:
                # decode steps: exact one-hot contraction — see
                # ONEHOT_DECODE_PRECISION above
                oh = jax.nn.one_hot(ids, fused.shape[0], dtype=fused.dtype)
                h = jnp.matmul(oh, fused, precision=ONEHOT_DECODE_PRECISION)
            else:
                h = jnp.take(fused, ids, axis=0)  # (..., S, d)
            if self.config.mode == "cat":
                h = h.reshape(*x.shape[:-1], -1)
            else:
                h = h.sum(axis=-2)
        else:
            parts = [self.stream_emb(key)(x[..., i]) for i, key in enumerate(self.num_tokens)]
            if self.config.mode == "cat":
                h = jnp.concatenate(parts, axis=-1)
            else:
                h = sum(parts)
        if self.norm is not None:
            h = self.norm(h)
        if self.config.mode == "cat" and self.has_project:
            h = self.project_fwd(h)
        return h

    def __call__(self, x, x_extra: Optional[List[jnp.ndarray]] = None) -> jnp.ndarray:
        """`x`: (b, t, S) token ids; `x_extra`: extra parallel sequences for
        multi-seq fusion (e.g. the masked performance)."""
        if x_extra is None or len(x_extra) == 0 or self.multiseq_mode is None:
            return self._forward_single(x)

        seqs = [x] + list(x_extra)
        mode = self.config.multiseq_mode
        if mode == "pre-sum":
            parts = []
            for i, key in enumerate(self.num_tokens):
                emb = self.stream_emb(key)
                parts.append(sum(emb(s[..., i]) for s in seqs))
            if self.config.mode == "cat":
                h = jnp.concatenate(parts, axis=-1)
            else:
                h = sum(parts)
            if self.norm is not None:
                h = self.norm(h)
            if self.config.mode == "cat" and self.has_project:
                h = self.project_fwd(h)
            return h
        elif mode in ("post-sum", "post-cat"):
            projected = [self._forward_single(s) for s in seqs]
            if mode == "post-cat":
                return self.project_multiemb(jnp.concatenate(projected, axis=-1))
            return sum(projected)
        raise ValueError(f"unknown multiseq_mode {mode}")


# ---- heads ----


@dataclass
class TupleTokenHeadConfig(ModuleConfig):
    _target_: str = "lm"
    filter_keys: Optional[List[str]] = None
    reuse_projection: bool = True


class TupleTokenLMHead(nn.Module):
    """Independent per-stream linear heads (embeddings.py:286-311)."""

    num_tokens: Dict[str, int]
    filter_keys: Optional[tuple] = None

    @nn.compact
    def __call__(self, x, keys: Optional[List[str]] = None) -> Dict[str, jnp.ndarray]:
        logits = {}
        for key, num in self.num_tokens.items():
            if self.filter_keys and key not in self.filter_keys:
                continue
            if keys is not None and key not in keys:
                continue
            logits[key] = nn.Dense(num, name=f"head_{key}")(x)
        return logits


class TupleTokenTiedLMHead(nn.Module):
    """Tied head: reuse the embedding projection transposed, then logits
    against each stream's embedding table (embeddings.py:321-353)."""

    embeddings: TupleTokenEmbeddings
    reuse_projection: bool = True

    @nn.compact
    def __call__(
        self, x, keys: Optional[List[str]] = None, batched: bool = False
    ):
        """Per-stream logits dict, or — with `batched=True` and uniform
        stream dims — ONE (..., S, Vmax) tensor from a single batched matmul
        against zero-padded stacked tables (cols >= V_s are exactly the
        unpadded logits' complement: zero rows give 0 logits, maskable by the
        caller). S small matmuls collapse into one MXU-friendly einsum; the
        table stack is loop-invariant under jit and hoisted out of scans."""
        embeddings = self.embeddings
        total = embeddings.total_emb_dim

        if self.reuse_projection:
            assert embeddings.has_project, "tied head requires an embedding projection"
            h = embeddings.project_transpose(x)
        else:
            h = nn.Dense(total, use_bias=False, name="project")(x)
        h = nn.LayerNorm(epsilon=1e-5, name="norm")(h)

        tables = embeddings.tables()
        if batched:
            dim = embeddings._uniform_dim
            assert dim is not None, "batched head requires uniform stream dims"
            assert keys is None, "batched head emits all streams"
            vmax = max(t.shape[0] for t in tables.values())
            stacked = jnp.stack(
                [jnp.pad(t, ((0, vmax - t.shape[0]), (0, 0))) for t in tables.values()]
            )  # (S, Vmax, d)
            hs = h.reshape(*h.shape[:-1], len(tables), dim)
            return jnp.einsum("...sd,svd->...sv", hs, stacked)

        logits = {}
        offset = 0
        for key in embeddings.num_tokens:
            dim = embeddings.emb_dims_map[key]
            if keys is None or key in keys:
                logits[key] = h[..., offset : offset + dim] @ tables[key].T
            offset += dim
        return logits


class TupleTokenTiedSplitLMHead(nn.Module):
    """Per-stream Dense+LN into embedding space, logits vs tables
    (embeddings.py:363-390)."""

    embeddings: TupleTokenEmbeddings
    filter_keys: Optional[tuple] = None

    @nn.compact
    def __call__(self, x, keys: Optional[List[str]] = None) -> Dict[str, jnp.ndarray]:
        embeddings = self.embeddings
        tables = embeddings.tables()
        logits = {}
        for key in embeddings.num_tokens:
            if self.filter_keys and key not in self.filter_keys:
                continue
            if keys is not None and key not in keys:
                continue
            dim = embeddings.emb_dims_map[key]
            h = nn.Dense(dim, name=f"to_emb_{key}")(x)
            h = nn.LayerNorm(epsilon=1e-5, name=f"norm_{key}")(h)
            logits[key] = h @ tables[key].T
        return logits


@dataclass
class TupleTokenRegressionHeadConfig(ModuleConfig):
    regression_keys: List[str] = field(default_factory=list)


class TupleTokenRegressionHead(nn.Module):
    """Scalar value heads (embeddings.py:399-420)."""

    regression_keys: tuple

    @nn.compact
    def __call__(self, x, keys: Optional[List[str]] = None) -> Dict[str, jnp.ndarray]:
        return {
            key: nn.Dense(1, name=f"reg_{key}")(x)
            for key in self.regression_keys
            if keys is None or key in keys
        }


class TupleTokenEmbeddingHead(nn.Module):
    """MLP head over (optionally detached) hidden states
    (embeddings.py:432-462)."""

    emb_dim: int
    hidden_dim: Optional[int] = None
    depth: int = 2
    detach_inputs: float = 1.0

    @nn.compact
    def __call__(self, x) -> jnp.ndarray:
        x = self.detach_inputs * jax.lax.stop_gradient(x) + (1 - self.detach_inputs) * x
        hidden = self.hidden_dim or self.emb_dim
        dims = [hidden] * (self.depth - 1) + [self.emb_dim]
        for i, d in enumerate(dims):
            x = nn.Dense(d, name=f"layer_{i}")(x)
            if i < self.depth - 1:
                x = jax.nn.mish(x)
        return x
