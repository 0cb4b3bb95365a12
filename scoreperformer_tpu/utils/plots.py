"""Visualization helpers (counterpart of scoreperformer/utils/plots.py).

Pianoroll rendering is self-contained (no librosa/pretty_midi): the roll is
rasterized from the SoA note arrays directly.
"""
from __future__ import annotations

from typing import Optional

import numpy as np

from ..midi import MidiScore, tick_to_time_map


def plot_performance_parameter(tokenizer, total_seq, perf_seq, token_type: str = "Tempo"):
    """Generated-vs-target curves for one performance stream (plots.py:10-54)."""
    import matplotlib.pyplot as plt

    type_idx = tokenizer.types_idx[token_type]
    preds_tok = np.asarray(total_seq)[:, type_idx] - tokenizer.zero_token
    targets_tok = np.asarray(perf_seq)[: len(total_seq), type_idx] - tokenizer.zero_token

    values_map = tokenizer.token_type_values(token_type, special_tokens=False)
    preds = values_map[np.clip(preds_tok, 0, len(values_map) - 1)]
    targets = values_map[np.clip(targets_tok, 0, len(values_map) - 1)]

    fig, (ax0, ax1) = plt.subplots(2, 1, figsize=(16, 12))
    fig.suptitle(f"Performance Notes, {token_type}", fontsize=20)
    ax0.plot(preds)
    ax0.plot(targets)
    ax1.plot(preds - targets)
    ax0.legend(["Generated", "Target"], fontsize=18)
    ax1.legend(["Difference"], fontsize=18)
    ax0.get_xaxis().set_visible(False)
    ax1.set_xlabel("note id", fontsize=16)
    for ax in (ax0, ax1):
        ax.tick_params(labelsize=14)
        ax.set_ylabel(token_type.lower(), fontsize=16)
    fig.tight_layout()
    return fig


def midi_to_pianoroll(
    midi: MidiScore,
    fs: int = 100,
    min_pitch: int = 21,
    max_pitch: int = 109,
    max_velocity: float = 127.0,
) -> np.ndarray:
    """Rasterize a MidiScore into a (pitches, time-steps) velocity roll."""
    ttt = tick_to_time_map(midi.tempos, midi.max_tick, midi.ticks_per_beat)
    notes = midi.all_notes()
    n_pitches = max_pitch - min_pitch + 1
    end_time = float(ttt[-1]) if len(ttt) else 0.0
    n_steps = max(1, int(np.ceil(end_time * fs)) + 1)
    roll = np.zeros((n_pitches, n_steps), dtype=np.float32)

    starts = np.clip(np.asarray(notes.start, np.int64), 0, len(ttt) - 1)
    ends = np.clip(np.asarray(notes.end, np.int64), 0, len(ttt) - 1)
    s_steps = (ttt[starts] * fs).astype(int)
    e_steps = np.maximum((ttt[ends] * fs).astype(int), s_steps + 1)
    for pitch, vel, s, e in zip(notes.pitch, notes.velocity, s_steps, e_steps):
        if min_pitch <= pitch <= max_pitch:
            roll[pitch - min_pitch, s:e] = np.maximum(
                roll[pitch - min_pitch, s:e], min(vel, max_velocity)
            )
    return roll


def plot_pianoroll(
    midi: MidiScore,
    fs: int = 100,
    min_pitch: int = 21,
    max_pitch: int = 109,
    max_velocity: float = 127.0,
    figsize=(14, 6),
    fig=None,
    ax=None,
):
    """(plots.py:62-114)"""
    import matplotlib.pyplot as plt
    from matplotlib.colors import ListedColormap

    colors = plt.get_cmap("Reds", 256)(np.linspace(0, 1, 256))
    colors[:1, :] = np.array([1, 1, 1, 1])
    cmap = ListedColormap(colors)

    if fig is None or ax is None:
        fig, ax = plt.subplots(1, 1, figsize=figsize)

    roll = midi_to_pianoroll(midi, fs, min_pitch, max_pitch, max_velocity)
    extent = (0, roll.shape[1] / fs, min_pitch, max_pitch + 1)
    im = ax.imshow(
        roll, aspect="auto", origin="lower", cmap=cmap, extent=extent,
        vmin=0, vmax=max_velocity, interpolation="nearest",
    )
    cbar = fig.colorbar(im, ax=ax, fraction=0.15, pad=0.02, aspect=15)
    cbar.set_ticks(np.arange(0, max_velocity, 12))

    ax.set_xlabel("time (s)", fontsize=16)
    ax.set_ylabel("pitch", fontsize=16)
    ax.tick_params(labelsize=14)

    has_notes = min_pitch + np.where(np.any(roll != 0.0, axis=1))[0]
    if len(has_notes) > 0:
        ymin = max(min_pitch, has_notes[0] - has_notes[0] % 12) - 2.5
        ymax = min(max_pitch, has_notes[-1] + 12 - has_notes[-1] % 12) + 1.5
        ax.set_ylim(ymin, ymax)
    ax.grid(alpha=0.5)
    return fig, ax
