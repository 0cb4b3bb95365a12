"""ScorePerformer composite model and the plain Performer LM.

Counterpart of scoreperformer/models/scoreperformer/model.py and the LM-mode
loss logic of wrappers.py:44-84 — here the whole forward (encoders → decoder →
losses) is one pure function, jitted as a unit by the trainer.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from flax import struct

from ..configs import ModuleConfig
from .classifiers import (
    MultiHeadEmbeddingClassifier,
    MultiHeadEmbeddingClassifierConfig,
    MultiHeadEmbeddingClassifierOutput,
    weighted_cross_entropy,
)
from .embeddings import TupleTokenHeadConfig
from .mmd import MMDTupleTransformer, MMDTupleTransformerConfig, MMDTupleTransformerOutput
from .tuple_transformer import (
    EmbeddingModes,
    TupleTransformerConfig,
    TupleTransformerModule,
    TupleTransformerOutput,
    build_stream_embeddings,
)

IGNORE_INDEX = -100

# Compute the CE numerator as a one-hot contraction instead of
# take_along_axis when there is more than one label: the gather's backward is
# a scatter-add, while the contraction and its transpose both run on the MXU
# (same trade as embeddings.ONEHOT_LOOKUP_MIN_SEQ). Bit-identical: every
# non-label one-hot entry is exactly 0.0 and x + 0.0 == x; training logits
# are finite so there is no -inf * 0 hazard.
ONEHOT_CE = True


class LMModes:
    MLM = "mlm"
    CLM = "clm"
    MixedLM = "mixlm"


@struct.dataclass
class ScorePerformerOutput:
    perf_decoder: TupleTransformerOutput
    score_encoder: Optional[TupleTransformerOutput] = None
    perf_encoder: Optional[MMDTupleTransformerOutput] = None
    classifiers: Optional[MultiHeadEmbeddingClassifierOutput] = None
    loss: Optional[jnp.ndarray] = None
    losses: Optional[Dict[str, jnp.ndarray]] = None


@dataclass
class ScorePerformerConfig(ModuleConfig):
    num_tokens: Optional[Dict[str, int]] = None
    dim: int = 256
    perf_decoder: TupleTransformerConfig = field(default_factory=TupleTransformerConfig)
    score_encoder: Optional[TupleTransformerConfig] = None
    perf_encoder: Optional[MMDTupleTransformerConfig] = None
    classifiers: Optional[MultiHeadEmbeddingClassifierConfig] = None
    tie_token_emb: bool = False
    mode: Optional[str] = None
    num_score_tokens: Optional[Dict[str, int]] = None


def lm_losses(
    logits: Dict[str, jnp.ndarray],
    labels: jnp.ndarray,
    ignore_index: int = IGNORE_INDEX,
):
    """Per-stream CE averaged over streams that carry labels
    (wrappers.py:55-64). Streams without any valid label contribute neither to
    the numerator nor the denominator."""
    losses = {}
    total = 0.0
    denom = 0.0
    for i, (key, lg) in enumerate(logits.items()):
        lab = labels[..., i]
        valid = lab != ignore_index
        nvalid = valid.sum()
        lab_c = jnp.clip(lab, 0, lg.shape[-1] - 1)
        logp = jax.nn.log_softmax(lg.astype(jnp.float32), axis=-1)
        if ONEHOT_CE and lab_c.size > 1:
            # one-hot CE contraction — see ONEHOT_CE above
            oh = jax.nn.one_hot(lab_c, lg.shape[-1], dtype=logp.dtype)
            nll = -(logp * oh).sum(axis=-1)
        else:
            nll = -jnp.take_along_axis(logp, lab_c[..., None], axis=-1)[..., 0]
        stream_loss = (nll * valid).sum() / jnp.maximum(nvalid, 1)
        has = (nvalid > 0).astype(stream_loss.dtype)
        losses[key] = stream_loss
        total = total + stream_loss * has
        denom = denom + has
    loss = total / jnp.maximum(denom, 1.0)
    return loss, losses


def regression_losses(
    reg_values: Dict[str, jnp.ndarray],
    logits_keys: List[str],
    labels: jnp.ndarray,
    token_values: Dict[str, np.ndarray],
    num_special: int = 4,
):
    """L1 regression vs token values for non-special labels (wrappers.py:66-78)."""
    reg_losses = {}
    for i, key in enumerate(logits_keys):
        if key not in reg_values:
            continue
        lab = labels[..., i]
        valid = lab > (num_special - 1)
        values = jnp.asarray(token_values[key])
        targets = values[jnp.clip(lab, 0, len(values) - 1)]
        preds = reg_values[key][..., 0]
        l1 = jnp.abs(preds - targets)
        reg_losses[f"{key}/l1"] = (l1 * valid).sum() / jnp.maximum(valid.sum(), 1)
    if not reg_losses:
        return 0.0, reg_losses
    return sum(reg_losses.values()) / len(reg_losses), reg_losses


def shift_for_lm(mode: str, perf, labels, masked_perf, context, style, mask, context_is_cat: bool):
    """CLM/MixedLM shift-by-one (wrappers.py:290-307, 409-431): input drops the
    last position; labels/masked-seq/context/style drop the first."""
    if mode not in (LMModes.CLM, LMModes.MixedLM):
        return perf, labels, masked_perf, context, style, mask
    seq = perf[:, :-1]
    labels = labels[:, 1:] if labels is not None else None
    masked = masked_perf[:, 1:] if masked_perf is not None else None
    if context is not None and context_is_cat:
        context = context[:, 1:]
    if style is not None:
        style = style[:, 1:]
    if mask is not None and mask.shape[1] == seq.shape[1] + 1:
        mask = mask[:, :-1]
    return seq, labels, masked, context, style, mask


class ScorePerformerModel(nn.Module):
    """(reference model.py:159-341)"""

    config: ScorePerformerConfig

    def setup(self):
        cfg = self.config
        num_tokens = cfg.num_tokens
        num_score_tokens = cfg.num_score_tokens or num_tokens

        shared = None
        if cfg.tie_token_emb:
            shared = build_stream_embeddings(
                self,
                num_tokens,
                cfg.perf_decoder.token_embeddings,
                emb_dims_default=cfg.dim,
                prefix="shared_emb",
            )
        self.shared_streams = shared

        self.score_encoder = None
        if cfg.score_encoder is not None:
            enc_cfg = cfg.score_encoder.replace(dim=cfg.dim, lm_head=None)
            self.score_encoder = TupleTransformerModule(
                num_tokens=num_score_tokens,
                config=enc_cfg,
                shared_streams=shared,
                name="score_encoder",
            )

        self.perf_encoder = None
        if cfg.perf_encoder is not None:
            penc_cfg = cfg.perf_encoder.replace(dim=cfg.dim, lm_head=None)
            self.perf_encoder = MMDTupleTransformer(
                num_tokens=num_tokens,
                config=penc_cfg,
                shared_streams=shared,
                name="perf_encoder",
            )

        self.classifiers = None
        if cfg.classifiers is not None and cfg.classifiers.num_classes:
            assert self.perf_encoder is not None
            self.classifiers = MultiHeadEmbeddingClassifier(
                input_dim=self.perf_encoder.embedding_dim,
                num_classes=cfg.classifiers.num_classes,
                config=cfg.classifiers,
                name="classifiers",
            )

        dec_cfg = cfg.perf_decoder.replace(
            dim=cfg.dim,
            context_emb_dim=None if cfg.score_encoder is None else cfg.dim,
            style_emb_dim=None
            if cfg.perf_encoder is None
            else cfg.perf_encoder.embedding_dim,
        )
        dec_cfg.transformer = dec_cfg.transformer.replace(
            cross_attend=cfg.score_encoder is not None
        )
        if dec_cfg.lm_head is None:
            dec_cfg.lm_head = TupleTokenHeadConfig(_target_="lm")
        self.perf_decoder = TupleTransformerModule(
            num_tokens=num_tokens,
            config=dec_cfg,
            shared_streams=shared,
            name="perf_decoder",
        )

        self._context_is_cat = dec_cfg.context_emb_mode == EmbeddingModes.CONCAT

    # ---- encoders (model.py:244-278) ----

    def forward_encoders(
        self,
        perf=None,
        perf_mask=None,
        score=None,
        score_mask=None,
        bars=None,
        beats=None,
        onsets=None,
        deadpan_mask=None,
        deterministic: bool = True,
        compute_loss: bool = True,
    ):
        score_emb = perf_emb = None
        score_enc_out = perf_enc_out = None

        if self.score_encoder is not None:
            score_enc_out = self.score_encoder(
                score, mask=score_mask, deterministic=deterministic, return_embeddings=True
            )
            score_emb = score_enc_out.hidden_state

        if self.perf_encoder is not None:
            perf_enc_out = self.perf_encoder(
                perf,
                mask=perf_mask,
                bars=bars,
                beats=beats,
                onsets=onsets,
                deadpan_mask=deadpan_mask,
                deterministic=deterministic,
                compute_loss=compute_loss,
            )
            perf_emb = perf_enc_out.embeddings

        return score_emb, perf_emb, score_enc_out, perf_enc_out

    def __call__(
        self,
        perf,
        perf_mask=None,
        score=None,
        score_mask=None,
        noisy_perf=None,
        noisy_perf_mask=None,
        masked_perf=None,
        labels=None,
        bars=None,
        beats=None,
        onsets=None,
        directions=None,
        deadpan_mask=None,
        deterministic: bool = True,
        compute_loss: bool = True,
    ) -> ScorePerformerOutput:
        cfg = self.config

        enc_perf = noisy_perf if noisy_perf is not None else perf
        enc_perf_mask = noisy_perf_mask if noisy_perf_mask is not None else perf_mask

        score_emb, perf_emb, score_enc_out, perf_enc_out = self.forward_encoders(
            perf=enc_perf,
            perf_mask=enc_perf_mask,
            score=score,
            score_mask=score_mask,
            bars=bars,
            beats=beats,
            onsets=onsets,
            deadpan_mask=deadpan_mask,
            deterministic=deterministic,
            compute_loss=compute_loss,
        )

        # LM-mode shifting
        seq, shifted_labels, shifted_masked, context, style, dec_mask = shift_for_lm(
            cfg.mode, perf, labels, masked_perf, score_emb, perf_emb, perf_mask,
            self._context_is_cat,
        )

        dec_out = self.perf_decoder(
            seq,
            mask=dec_mask,
            x_extra=[shifted_masked] if shifted_masked is not None else None,
            style_embeddings=style,
            context=context,
            context_mask=score_mask if not self._context_is_cat else None,
            deterministic=deterministic,
        )

        loss = None
        losses: Dict[str, jnp.ndarray] = {}
        if compute_loss and shifted_labels is not None and dec_out.logits is not None:
            loss, stream_losses = lm_losses(dec_out.logits, shifted_labels)
            losses.update({f"loss/{k}": v for k, v in stream_losses.items()})
            if dec_out.reg_values is not None:
                token_values = cfg.perf_decoder.token_embeddings.token_values or {}
                reg_loss, reg = regression_losses(
                    dec_out.reg_values, list(dec_out.logits.keys()), shifted_labels, token_values
                )
                loss = loss + reg_loss
                losses.update(reg)
            losses["loss/lm"] = loss

        if perf_enc_out is not None and perf_enc_out.loss is not None:
            loss = perf_enc_out.loss if loss is None else loss + perf_enc_out.loss
            losses.update(perf_enc_out.losses)

        clf_out = None
        if self.classifiers is not None and directions is not None:
            clf_mask = perf_mask
            if deadpan_mask is not None and clf_mask is not None:
                clf_mask = clf_mask & (~deadpan_mask[:, None])
            clf_out = self.classifiers(
                embeddings=perf_enc_out.full_embeddings,
                labels=directions,
                sample_weights=clf_mask.astype(jnp.float32) if clf_mask is not None else None,
                deterministic=deterministic,
            )
            if clf_out.loss is not None:
                loss = clf_out.loss if loss is None else loss + clf_out.loss
                losses.update(clf_out.losses)

        return ScorePerformerOutput(
            perf_decoder=dec_out,
            score_encoder=score_enc_out,
            perf_encoder=perf_enc_out,
            classifiers=clf_out,
            loss=loss,
            losses=losses,
        )

    # ---- decode-path methods (exposed for the generator) ----

    def decode_step(
        self,
        seq_tokens,
        masked_tokens=None,
        style_embeddings=None,
        context=None,
        caches=None,
        cache_index=None,
        mask=None,
    ):
        """One (or a few) decoder positions with static KV caches. Inputs are
        the *already shifted* decoder tokens."""
        out = self.perf_decoder(
            seq_tokens,
            mask=mask,
            x_extra=[masked_tokens] if masked_tokens is not None else None,
            style_embeddings=style_embeddings,
            context=context,
            caches=caches,
            cache_index=cache_index,
            deterministic=True,
        )
        return out

    @property
    def perf_decoder_dim(self) -> int:
        return self.config.dim
    def init_decoder_cache(self, batch: int, max_len: int, dtype=jnp.float32):
        return self.perf_decoder.init_cache(batch, max_len, dtype)

    def encode_embeddings(
        self,
        perf,
        perf_mask=None,
        score=None,
        score_mask=None,
        bars=None,
        beats=None,
        onsets=None,
    ):
        """Encoder pass only (inference path, generators.py:320-426)."""
        score_emb, perf_emb, _, perf_enc_out = self.forward_encoders(
            perf=perf,
            perf_mask=perf_mask,
            score=score,
            score_mask=score_mask,
            bars=bars,
            beats=beats,
            onsets=onsets,
            deadpan_mask=jnp.zeros(perf.shape[0], dtype=bool),
            deterministic=True,
            compute_loss=False,
        )
        return score_emb, perf_emb, perf_enc_out


@dataclass
class PerformerConfig(ModuleConfig):
    transformer: TupleTransformerConfig = field(default_factory=TupleTransformerConfig)
    mode: Optional[str] = None


class PerformerModel(nn.Module):
    """Standalone performance LM (model.py:50-122)."""

    num_tokens: Dict[str, int]
    config: PerformerConfig

    def setup(self):
        cfg = self.config.transformer
        if cfg.lm_head is None:
            cfg = cfg.replace(lm_head=TupleTokenHeadConfig(_target_="lm"))
        self.transformer = TupleTransformerModule(
            num_tokens=self.num_tokens,
            config=cfg,
            name="transformer",
        )

    def __call__(
        self, perf, mask=None, labels=None, masked_perf=None, deterministic=True,
        compute_loss=True,
    ) -> ScorePerformerOutput:
        mode = self.config.mode
        seq, labels, masked, _, _, mask = shift_for_lm(
            mode, perf, labels, masked_perf, None, None, mask, False
        )
        out = self.transformer(
            seq,
            mask=mask,
            x_extra=[masked] if masked is not None else None,
            deterministic=deterministic,
        )
        loss = None
        losses = {}
        if compute_loss and labels is not None and out.logits is not None:
            loss, stream_losses = lm_losses(out.logits, labels)
            losses = {f"loss/{k}": v for k, v in stream_losses.items()}
        return ScorePerformerOutput(perf_decoder=out, loss=loss, losses=losses)

    # decode-path methods mirroring ScorePerformerModel so the same wrappers
    # (ar_generate / mixedlm_unmask / mlm_unmask) drive a plain Performer
    @property
    def perf_decoder(self):
        return self.transformer

    def decode_step(
        self, seq_tokens, masked_tokens=None, style_embeddings=None, context=None,
        caches=None, cache_index=None, mask=None,
    ):
        return self.transformer(
            seq_tokens,
            mask=mask,
            x_extra=[masked_tokens] if masked_tokens is not None else None,
            caches=caches,
            cache_index=cache_index,
            deterministic=True,
        )

    @property
    def perf_decoder_dim(self) -> int:
        return self.config.transformer.dim
    def init_decoder_cache(self, batch: int, max_len: int, dtype=jnp.float32):
        return self.transformer.init_cache(batch, max_len, dtype)
