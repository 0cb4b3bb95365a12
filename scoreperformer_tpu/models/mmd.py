"""Hierarchical MMD-VAE style encoder.

Counterpart of scoreperformer/models/scoreperformer/mmd_transformer.py:
a TupleTransformer whose outputs are aggregated at global/bar/beat/onset
levels into small latents, regularized by an MMD loss against N(0, I).

TPU-first notes:
- segment aggregation uses a one-hot matmul (b,t,S) contraction — MXU-friendly
  and equivalent to the reference's dense alignment matmul
  (mmd_transformer.py:328-347), but with a STATIC `max_segments` bound instead
  of the dynamic `segments.max() + 1`.
- the MMD loss handles masking by weighting instead of boolean gather
  (mmd_transformer.py:505-534 gathers latents[mask], a dynamic shape), and
  subsamples with a fixed-size categorical draw when the latent count exceeds
  `max_num_latents`.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Union

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax import struct

from .embeddings import StreamEmbedding
from .tuple_transformer import (
    TupleTransformerConfig,
    TupleTransformerModule,
    TupleTransformerOutput,
)


class AggregateModes:
    SAME = "same"
    MEAN = "mean"
    BEAT_MEAN = "beat_mean"
    BAR_MEAN = "bar_mean"
    ONSET_MEAN = "onset_mean"
    ISOLATED_BAR_MEAN = "isolated_bar_mean"


SEGMENT_MODES = (
    AggregateModes.ISOLATED_BAR_MEAN,
    AggregateModes.BAR_MEAN,
    AggregateModes.BEAT_MEAN,
    AggregateModes.ONSET_MEAN,
)


@struct.dataclass
class MMDTupleTransformerOutput:
    hidden_state: jnp.ndarray
    latents: Optional[Any] = None
    embeddings: Optional[jnp.ndarray] = None
    full_embeddings: Optional[jnp.ndarray] = None
    dropout_mask: Optional[jnp.ndarray] = None
    loss: Optional[jnp.ndarray] = None
    losses: Optional[Dict[str, jnp.ndarray]] = None


@dataclass
class MMDTupleTransformerConfig(TupleTransformerConfig):
    latent_dim: Union[int, List[int]] = 64
    aggregate_mode: Union[str, List[str]] = AggregateModes.MEAN
    hierarchical: bool = False
    hierarchical_with_context: bool = True
    latent_dropout: Union[float, List[float]] = 0.0
    inclusive_latent_dropout: bool = True
    deadpan_zero_latent: bool = False
    loss_weight: float = 1.0
    max_segments: int = 260  # static bound for segments.max()+1
    mmd_num_samples: int = 256
    mmd_max_num_latents: int = 4096

    def normalized_modes(self):
        """Returns parallel lists (modes, latent_dims, dropouts) and a flag for
        the single-head case."""
        latent_dim, mode, dropout = self.latent_dim, self.aggregate_mode, self.latent_dropout
        single = isinstance(latent_dim, int) and isinstance(mode, str)
        if isinstance(latent_dim, int) and not isinstance(mode, str):
            latent_dim = [latent_dim] * len(mode)
        if isinstance(mode, str) and not isinstance(latent_dim, int):
            mode = [mode] * len(latent_dim)
        if single:
            return True, [mode], [latent_dim], [dropout if isinstance(dropout, float) else dropout[0]]
        if isinstance(dropout, float):
            dropout = [dropout] * len(latent_dim)
        return False, list(mode), list(latent_dim), list(dropout)

    @property
    def embedding_dim(self) -> int:
        if isinstance(self.latent_dim, int):
            if isinstance(self.aggregate_mode, str):
                return self.latent_dim
            return self.latent_dim * len(self.aggregate_mode)
        return int(sum(self.latent_dim))


def gaussian_kernel(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """(mmd_transformer.py:518-523)"""
    num = jnp.mean((x[:, None, :] - y[None, :, :]) ** 2, axis=-1) / x.shape[-1]
    return jnp.exp(-num)


def mmd_loss(
    rng: jax.Array,
    latents: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    num_samples: int = 256,
    max_num_latents: int = 4096,
) -> jnp.ndarray:
    """MMD(latents, N(0,I)) with mask-aware weighting (mmd_transformer.py:505-534).

    When the (static) number of candidate latents exceeds `max_num_latents`,
    a fixed-size categorical subsample (with replacement, masked) is drawn;
    otherwise the kernel means are computed exactly with mask weights.
    """
    d = latents.shape[-1]
    flat = latents.reshape(-1, d)
    if mask is None:
        w = jnp.ones(flat.shape[0])
    else:
        w = mask.reshape(-1).astype(flat.dtype)

    rng_z, rng_sub = jax.random.split(rng)
    z = jax.random.normal(rng_z, (num_samples, d), dtype=flat.dtype)

    if flat.shape[0] > max_num_latents:
        # uniform-over-valid with replacement. NOT jax.random.categorical:
        # the logits here are only 0/-inf, and categorical materializes a
        # (samples, N) gumbel tensor — 9.6 ms/step at the flagship config
        # (round-3 train profile). Inverse-CDF over the valid-count cumsum
        # draws the identical distribution with one cumsum + searchsorted.
        cdf = jnp.cumsum((w > 0).astype(flat.dtype))
        u = jax.random.uniform(rng_sub, (max_num_latents,), dtype=flat.dtype)
        idx = jnp.searchsorted(cdf, u * cdf[-1], side="right")
        idx = jnp.minimum(idx, flat.shape[0] - 1)
        y = flat[idx]
        wy = jnp.ones(max_num_latents, dtype=flat.dtype)
    else:
        y = flat
        wy = w

    wy_sum = jnp.maximum(wy.sum(), 1.0)
    x_kernel = gaussian_kernel(z, z).mean()
    yy = gaussian_kernel(y, y)
    y_kernel = (wy[:, None] * wy[None, :] * yy).sum() / (wy_sum * wy_sum)
    xy = gaussian_kernel(z, y)
    xy_kernel = (xy * wy[None, :]).sum() / (num_samples * wy_sum)
    return x_kernel + y_kernel - 2 * xy_kernel


class MMDVAE(nn.Module):
    latent_dim: int

    @nn.compact
    def __call__(self, x):
        return nn.Dense(self.latent_dim, name="linear")(x)


class MMDTupleTransformer(nn.Module):
    num_tokens: Dict[str, int]
    config: MMDTupleTransformerConfig
    shared_streams: Optional[Dict[str, StreamEmbedding]] = None

    # special token ids (mmd_transformer.py:165-169)
    pad_token_id: int = 0
    mask_token_id: int = 1
    eos_token_id: int = 3

    def setup(self):
        self.transformer = TupleTransformerModule(
            num_tokens=self.num_tokens,
            config=self.config,
            shared_streams=self.shared_streams,
            name="transformer",
        )
        single, modes, latent_dims, dropouts = self.config.normalized_modes()
        self.single = single
        self.modes = modes
        self.latent_dims = latent_dims
        self.dropouts = dropouts

        heads = []
        input_dim = self.config.dim
        for mode, latent_dim in zip(modes, latent_dims):
            heads.append(MMDVAE(latent_dim, name=f"vae_{mode}"))
            if self.config.hierarchical:
                if self.config.hierarchical_with_context:
                    input_dim += latent_dim
                else:
                    input_dim = latent_dim
        self.vae_heads = heads

    @property
    def embedding_dim(self) -> int:
        return self.config.embedding_dim

    def _segments(self, mode, bars, beats, onsets):
        if mode in (AggregateModes.BAR_MEAN, AggregateModes.ISOLATED_BAR_MEAN):
            assert bars is not None
            return bars
        if mode == AggregateModes.BEAT_MEAN:
            assert beats is not None
            return beats
        if mode == AggregateModes.ONSET_MEAN:
            assert onsets is not None
            return onsets
        return None

    def _aggregate(self, out, segments):
        """One-hot matmul segment mean (mmd_transformer.py:328-347), with a
        static segment capacity."""
        S = self.config.max_segments
        one_hot = jax.nn.one_hot(jnp.clip(segments, 0, S - 1), S, dtype=out.dtype)  # b t S
        counts = jnp.maximum(one_hot.sum(axis=1), 1.0)[..., None]  # b S 1
        agg = jnp.einsum("btd,bts->bsd", out, one_hot) / counts
        return agg

    def _distribute(self, latents, segments):
        """Broadcast per-segment latents back to notes (mmd_transformer.py:356-364)."""
        S = self.config.max_segments
        return jnp.take_along_axis(
            latents, jnp.clip(segments, 0, S - 1)[..., None].astype(jnp.int32), axis=1
        )

    def _forward_latents(
        self,
        out,
        mask3,
        mode: str,
        head,
        latent_dropout: float,
        segments=None,
        latents=None,
        deterministic: bool = True,
    ):
        """(mmd_transformer.py:304-386)"""
        b, t = out.shape[:2]
        segment_mode = mode in SEGMENT_MODES

        latents_mask = None
        if latents is None:
            if mode == AggregateModes.MEAN:
                pooled = out.sum(axis=1, keepdims=True) / mask3.sum(axis=1, keepdims=True)
                latents_mask = jnp.ones((b, 1), dtype=bool)
                agg = pooled
            elif segment_mode:
                agg = self._aggregate(out, segments)
                latents_mask = jnp.any(agg != 0.0, axis=-1)
            else:
                agg = out
                latents_mask = mask3[..., 0]
            latents = head(agg) * latents_mask[..., None]
        else:
            if mode == AggregateModes.MEAN:
                latents_mask = jnp.ones((b, latents.shape[1]), dtype=bool)
            else:
                latents_mask = jnp.any(latents != 0.0, axis=-1)

        embeddings = latents

        if mode != AggregateModes.MEAN and not deterministic and latent_dropout > 0.0:
            rng = self.make_rng("latent_dropout")
            drop = jax.random.uniform(rng, latents_mask.shape) < latent_dropout
            drop_mask = (drop & latents_mask)[..., None]
        else:
            drop_mask = jnp.zeros_like(latents_mask[..., None], dtype=bool)

        if mode == AggregateModes.MEAN:
            embeddings = jnp.broadcast_to(embeddings, (b, t, embeddings.shape[-1]))
            drop_mask = jnp.broadcast_to(drop_mask, (b, t, 1))
        elif segment_mode:
            embeddings = self._distribute(embeddings, segments)
            drop_mask = self._distribute(drop_mask, segments)

        embeddings = embeddings * mask3

        return latents, latents_mask, embeddings, drop_mask

    def __call__(
        self,
        x,
        mask=None,
        x_extra=None,
        latents=None,
        bars=None,
        beats=None,
        onsets=None,
        deadpan_mask=None,
        deterministic: bool = True,
        compute_loss: bool = True,
        mask_bars: bool = False,
    ) -> MMDTupleTransformerOutput:
        cfg = self.config
        main_mode = self.modes[0]

        x_input = x
        if main_mode == AggregateModes.ISOLATED_BAR_MEAN or mask_bars:
            bar_col = x[..., 0]
            x_input = x.at[..., 0].set(
                jnp.where(bar_col > self.eos_token_id, self.mask_token_id, bar_col)
            )

        attn_mask = None
        if main_mode == AggregateModes.ISOLATED_BAR_MEAN:
            # block-diagonal per-bar attention (mmd_transformer.py:193-202):
            # positions attend iff same (non-pad) bar id
            valid = bars > self.pad_token_id
            attn_mask = (bars[:, :, None] == bars[:, None, :]) & valid[:, :, None] & valid[:, None, :]
            attn_mask = attn_mask[:, None]  # b 1 i j

        t_out = self.transformer(
            x_input,
            mask=mask,
            x_extra=x_extra,
            attn_mask=attn_mask,
            deterministic=deterministic,
            return_embeddings=True,
        )
        out = t_out.hidden_state

        if mask is None:
            mask3 = jnp.ones_like(out[..., :1], dtype=bool)
        else:
            mask3 = mask[..., None]
            out = out * mask3

        assert not cfg.deadpan_zero_latent or deadpan_mask is not None

        losses: Dict[str, jnp.ndarray] = {}
        all_latents, all_embeddings, drop_masks = [], [], []
        hidden = out
        prior_drop_mask = None

        ext_latents = latents
        for i, (mode, head, dropout) in enumerate(zip(self.modes, self.vae_heads, self.dropouts)):
            segments = self._segments(mode, bars, beats, onsets)
            latents_i, latents_mask_i, embeddings_i, drop_mask_i = self._forward_latents(
                hidden,
                mask3,
                mode,
                head,
                latent_dropout=dropout,
                segments=segments,
                latents=None
                if ext_latents is None
                else (ext_latents if self.single else ext_latents[i]),
                deterministic=deterministic,
            )

            if not deterministic and cfg.inclusive_latent_dropout and not self.single:
                if prior_drop_mask is None:
                    prior_drop_mask = drop_mask_i
                else:
                    # lower levels drop whenever any parent level dropped
                    parent = self._propagate_drop(prior_drop_mask, drop_mask_i)
                    prior_drop_mask = drop_mask_i = parent

            all_latents.append(latents_i)
            all_embeddings.append(embeddings_i)
            drop_masks.append(jnp.broadcast_to(drop_mask_i, embeddings_i.shape))

            if cfg.hierarchical and not self.single:
                if cfg.hierarchical_with_context:
                    hidden = jnp.concatenate([hidden, embeddings_i], axis=-1)
                else:
                    hidden = embeddings_i

            if compute_loss:
                rng = self.make_rng("mmd")
                losses[f"MMD/{mode}"] = cfg.loss_weight * mmd_loss(
                    rng,
                    latents_i,
                    mask=latents_mask_i,
                    num_samples=cfg.mmd_num_samples,
                    max_num_latents=cfg.mmd_max_num_latents,
                )
                if cfg.deadpan_zero_latent:
                    dp_w = (deadpan_mask[:, None] & latents_mask_i).astype(latents_i.dtype)
                    denom = jnp.maximum(dp_w.sum() * latents_i.shape[-1], 1.0)
                    losses[f"MMD/{mode}/deadpan"] = (
                        (latents_i**2) * dp_w[..., None]
                    ).sum() / denom

        embeddings = (
            all_embeddings[0] if self.single else jnp.concatenate(all_embeddings, axis=-1)
        )
        drop_mask = drop_masks[0] if self.single else jnp.concatenate(drop_masks, axis=-1)
        latents_out = all_latents[0] if self.single else all_latents

        embeddings = embeddings * mask3

        if not deterministic:
            full_embeddings = embeddings
            if deadpan_mask is not None:
                drop_mask = drop_mask & mask3 & (~deadpan_mask[:, None, None])
            else:
                drop_mask = drop_mask & mask3
            embeddings = embeddings * (~drop_mask)
        else:
            full_embeddings = embeddings
            drop_mask = None

        loss = None
        if compute_loss:
            loss = sum(losses.values())
            losses["MMD"] = loss

        return MMDTupleTransformerOutput(
            hidden_state=t_out.hidden_state,
            latents=latents_out,
            embeddings=embeddings,
            full_embeddings=full_embeddings,
            dropout_mask=drop_mask,
            loss=loss,
            losses=losses if compute_loss else None,
        )

    @staticmethod
    def _propagate_drop(prior, current):
        """OR of parent drop (already distributed to t positions) and current."""
        return prior | current

    # ---- inference helpers (mmd_transformer.py:388-502) ----

    def embeddings_to_latents(self, embeddings, mask=None, bars=None, beats=None, onsets=None):
        if self.single:
            segments = self._segments(self.modes[0], bars, beats, onsets)
            return self._emb_to_latents(embeddings, self.modes[0], mask, segments)
        parts = []
        offset = 0
        for mode, dim in zip(self.modes, self.latent_dims):
            segments = self._segments(mode, bars, beats, onsets)
            parts.append(
                self._emb_to_latents(embeddings[..., offset : offset + dim], mode, mask, segments)
            )
            offset += dim
        return parts

    def _emb_to_latents(self, embeddings, mode, mask=None, segments=None):
        if mode == AggregateModes.MEAN:
            if mask is None:
                latents = embeddings.mean(axis=1)
            else:
                latents = embeddings.sum(axis=1) / mask[..., None].sum(axis=1)
            return latents[:, None]
        if mode in SEGMENT_MODES:
            return self._aggregate(embeddings, segments)
        return embeddings

    def latents_to_embeddings(self, latents, seq_len, bars=None, beats=None, onsets=None):
        if self.single:
            segments = self._segments(self.modes[0], bars, beats, onsets)
            return self._latents_to_emb(latents, seq_len, self.modes[0], segments)
        parts = []
        for i, mode in enumerate(self.modes):
            segments = self._segments(mode, bars, beats, onsets)
            parts.append(self._latents_to_emb(latents[i], seq_len, mode, segments))
        return jnp.concatenate(parts, axis=-1)

    def _latents_to_emb(self, latents, seq_len, mode, segments=None):
        if mode == AggregateModes.MEAN:
            return jnp.broadcast_to(latents, (latents.shape[0], seq_len, latents.shape[-1]))
        if mode in SEGMENT_MODES:
            return self._distribute(latents, segments)
        return latents
