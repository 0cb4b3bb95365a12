"""End-to-end performance rendering: score MIDI → expressive performance MIDI.

The counterpart of the reference's Colab demo flow: tokenize the score, build
a masked deadpan performance, condition on encoder style embeddings, unmask
the performance streams with the compiled MixedLM decoder, and detokenize.
"""
from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..midi import MidiScore
from ..models import ScorePerformerModel
from ..models.factory import build_scoreperformer_config
from ..models.wrappers import mixedlm_unmask
from ..ops.sampling import top_k
from ..tokenizers import MASK, TokSequence
from ..training.checkpoint import load_checkpoint


def load_model_from_checkpoint(path: str):
    """Rebuild the model from a checkpoint's embedded config
    (counterpart of models/base.py:42-52 from_pretrained).

    Accepts either this framework's orbax checkpoint directory or a reference
    single-file torch checkpoint (`.pt`) — the latter is converted on the fly
    (training/torch_convert.py), so `render.py`/`serve.py` run reference
    weights directly."""
    if os.path.isfile(path):
        from ..training.torch_convert import import_reference_checkpoint

        return import_reference_checkpoint(path)
    ckpt = load_checkpoint(path)
    assert "model_config" in ckpt, f"checkpoint at {path} carries no model config"
    cfg = build_scoreperformer_config(ckpt["model_config"])
    model = ScorePerformerModel(config=cfg)
    variables = {"params": ckpt["params"]}
    return model, variables, cfg


PERF_STREAMS = ("Velocity", "Tempo", "RelOnsetDev", "RelPerfDuration")


def prepare_render_inputs(tokenizer, score_midi: MidiScore) -> Dict[str, np.ndarray]:
    """Host-side render preamble: score tokens, deadpan performance, segment
    maps, and the two masked decoder input streams (dataset counterpart:
    score_performance.py:186-191). Shared by `render_performance` and the
    serving layer."""
    score_seq = tokenizer.score_midi_to_tokens(score_midi)
    deadpan = tokenizer.score_tokens_as_performance(score_seq)

    ticks_data = tokenizer.compute_ticks(score_seq.ids, compute_beat_ticks=True)
    z = tokenizer.zero_token
    bars = score_seq.ids[:, 0] - z
    beats = np.searchsorted(ticks_data["beat"], ticks_data["note_on"], side="right") - 1
    unique_onsets, onset_counts = np.unique(ticks_data["note_on"], return_counts=True)
    onsets = np.arange(len(unique_onsets)).repeat(onset_counts)
    bars, beats, onsets = (s - s[0] + z for s in (bars, beats, onsets))

    mask_dims = [tokenizer.types_idx[k] for k in PERF_STREAMS if k in tokenizer.types_idx]
    tokens = np.asarray(deadpan.ids).copy()
    masked_all = tokens.copy()
    masked_all[:, mask_dims] = MASK
    tokens_in = tokens.copy()
    tokens_in[1:, mask_dims] = MASK  # first note anchors the rendition

    return {
        "score_ids": np.asarray(score_seq.ids),
        "deadpan_ids": np.asarray(deadpan.ids),
        "tokens_in": tokens_in,
        "masked_all": masked_all,
        "bars": np.asarray(bars),
        "beats": np.asarray(beats),
        "onsets": np.asarray(onsets),
        # static: the decode only fills these streams (mixedlm_unmask
        # sample_dims skips the other streams' discarded filters)
        "mask_dims": tuple(int(d) for d in mask_dims),
    }


def render_performance(
    model,
    variables,
    tokenizer,
    score_midi: MidiScore,
    rng: Optional[jax.Array] = None,
    temperature: float = 1.0,
    greedy: bool = False,
    filter_kwargs: Optional[Dict] = None,
    style_embeddings: Optional[np.ndarray] = None,
    output_path: Optional[str] = None,
) -> MidiScore:
    """Render a score into an expressive performance.

    Style defaults to the encoders' deadpan-performance embedding (rendering
    "from the score alone"); pass `style_embeddings` to steer.
    """
    rng = rng if rng is not None else jax.random.PRNGKey(0)

    inputs = prepare_render_inputs(tokenizer, score_midi)
    T = len(inputs["deadpan_ids"])

    # batch dims are added in numpy before transfer: a device-side `[None]`
    # is an eager broadcast op outside jit (a compile round trip per call on
    # remote-compile TPU platforms)
    perf = jnp.asarray(inputs["deadpan_ids"][None])
    score = jnp.asarray(inputs["score_ids"][None])
    mask = jnp.asarray(np.ones((1, T), bool))

    # ONE compiled program: encoder pass + decode scan (anything eager is a
    # remote-compile round trip per op on tunneled TPU platforms; the server
    # uses the same fused structure — inference/server.py)
    sample_dims = inputs["mask_dims"]

    @jax.jit
    def _render(perf, score, mask, bars, beats, onsets, tokens_in, masked_all,
                override_style, rng):
        score_emb, style_emb, _ = model.apply(
            variables, perf, mask, score, mask, bars, beats, onsets,
            method="encode_embeddings", rngs={"mmd": jax.random.PRNGKey(0)},
        )
        if override_style is not None:
            style_emb = override_style
        return mixedlm_unmask(
            model, variables, tokens_in, masked_all, rng=rng,
            style_embeddings=style_emb, context=score_emb,
            temperature=temperature, filter_fn=top_k,
            filter_kwargs=filter_kwargs, greedy=greedy,
            sample_dims=sample_dims,
        )

    override = (
        jnp.asarray(np.asarray(style_embeddings)[None])
        if style_embeddings is not None else None
    )
    out = _render(
        perf, score, mask,
        jnp.asarray(np.asarray(inputs["bars"])[None]),
        jnp.asarray(np.asarray(inputs["beats"])[None]),
        jnp.asarray(np.asarray(inputs["onsets"])[None]),
        jnp.asarray(inputs["tokens_in"][None]),
        jnp.asarray(inputs["masked_all"][None]),
        override, rng,
    )
    out_tokens = np.asarray(out[0])

    perf_midi = tokenizer.performance_tokens_to_midi(
        TokSequence(ids=out_tokens), output_path=output_path
    )
    return perf_midi
