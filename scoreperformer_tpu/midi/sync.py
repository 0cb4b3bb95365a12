"""Performance↔score grid synchronization.

Counterpart of scoreperformer/data/midi/sync.py:16-151: resample a performance
MIDI so that its bars/beats land on the score grid, re-deriving per-interval
tempi from the onset pairs. Operates on SoA containers; the note resampling is
fully vectorized.
"""
from __future__ import annotations

from typing import Optional

import numpy as np

from ..utils import find_closest
from .beats import get_bar_beat_ticks, get_inter_beat_interval, get_performance_beats
from .containers import Marker, MidiScore, NoteArray, TempoMap, Track
from .ops import filter_late_events
from .timing import notes_to_absolute_timing, notes_to_symbolic_timing, score_tick_to_time_map


def sync_performance_midi(
    score_midi: MidiScore,
    perf_midi: MidiScore,
    onset_pairs: np.ndarray,
    is_absolute_timing: bool = False,
    max_time: Optional[float] = None,
    ticks_per_beat: int = 480,
    bar_sync: bool = True,
    inplace: bool = True,
) -> Optional[MidiScore]:
    """Synchronize ``perf_midi`` with ``score_midi`` bars/beats through onset
    pairs. Returns a new :class:`MidiScore` at ``ticks_per_beat`` resolution,
    or ``None`` when the onset intervals are non-monotonic."""
    perf_midi = perf_midi if inplace else perf_midi.copy()

    filter_late_events(perf_midi)
    max_tick = score_midi.max_tick

    if not is_absolute_timing:
        tick_to_time = score_tick_to_time_map(perf_midi)
        max_time = tick_to_time[-1]
    else:
        assert max_time is not None, "`max_time` required for absolute-timing MIDI"
        tick_to_time = None

    score_bars, score_beats = get_bar_beat_ticks(score_midi)
    score_onsets = score_bars if bar_sync else score_beats
    score_onsets, perf_onsets = get_performance_beats(
        score_onsets,
        onset_pairs,
        max_tick=max_tick - 1,
        max_time=max_time,
        monotonic_times=True,
        ticks_per_beat=ticks_per_beat,
    )
    perf_shift = perf_onsets[0]
    perf_onsets = perf_onsets - perf_shift
    max_time = max_time - perf_shift

    perf_score_tick_ratio = ticks_per_beat / score_midi.ticks_per_beat

    time_sigs = score_midi.time_sigs
    time_sig_ticks = time_sigs.time.astype(np.float64)
    quarter_note_factors = 4.0 * time_sigs.numerator / time_sigs.denominator
    inter_onset_intervals = np.array(
        [
            get_inter_beat_interval(
                int(time_sigs.numerator[i]),
                int(time_sigs.denominator[i]),
                ticks_per_beat=score_midi.ticks_per_beat,
            )
            for i in range(len(time_sigs))
        ],
        dtype=np.float64,
    )
    inter_beat_intervals = inter_onset_intervals

    ticks_per_bar = (score_midi.ticks_per_beat * quarter_note_factors).astype(np.int64)
    beats_per_bar = ticks_per_bar / inter_beat_intervals
    ioi_in_quarters = quarter_note_factors / beats_per_bar

    if bar_sync:
        inter_onset_intervals = inter_onset_intervals * beats_per_bar
        ioi_in_quarters = ioi_in_quarters * beats_per_bar

    # tempi from onset intervals
    intervals = np.diff(perf_onsets)
    if np.any(intervals <= 0.0):
        return None

    time_sig_indices = (np.searchsorted(time_sig_ticks, score_onsets, side="right") - 1)[:-1]
    inter_onset_ratios = np.diff(score_onsets) / inter_onset_intervals[time_sig_indices]
    tempos = 60.0 / intervals * ioi_in_quarters[time_sig_indices] * inter_onset_ratios

    # absolute note timing of all tracks
    abs_tracks = []
    for track in perf_midi.tracks:
        if is_absolute_timing:
            abs_notes = NoteArray(
                track.notes.pitch,
                track.notes.velocity,
                np.asarray(track.notes.start, np.float64),
                np.asarray(track.notes.end, np.float64),
            )
        else:
            abs_notes = notes_to_absolute_timing(track.notes, tick_to_time, -perf_shift)
        abs_tracks.append((track, abs_notes))

    # new time grid: each inter-onset interval divided uniformly into its tick count
    scaled_iois = inter_onset_intervals[time_sig_indices] * perf_score_tick_ratio * inter_onset_ratios
    resample_timing = []
    for i in range(len(perf_onsets) - 1):
        resample_timing.append(
            np.linspace(perf_onsets[i], perf_onsets[i + 1], int(scaled_iois[i]) + 1)[:-1]
        )
    resample_timing.append([max_time])
    resample_timing = np.round(np.concatenate(resample_timing), 6)

    midi = MidiScore(ticks_per_beat=ticks_per_beat)

    # absolute → symbolic on the new grid
    for track, abs_notes in abs_tracks:
        sym_notes = notes_to_symbolic_timing(abs_notes, resample_timing)
        midi.tracks.append(
            Track(notes=sym_notes, program=track.program, is_drum=track.is_drum, name=track.name)
        )

    # markers: re-grid marker times (only meaningful with symbolic input)
    markers = []
    if tick_to_time is not None:
        for marker in perf_midi.markers:
            new_time = int(
                find_closest(resample_timing, float(tick_to_time[marker.time]) - perf_shift)
            )
            text = marker.text
            if text.startswith("NoteI"):
                pitch, start, end = map(int, text.split("_")[1:])
                start, end = (
                    int(find_closest(resample_timing, float(tick_to_time[x]) - perf_shift))
                    for x in (start, end)
                )
                text = f"NoteI_{pitch}_{start}_{end}"
            markers.append(Marker(new_time, text))

    # tempo changes tied to the resampled grid
    onset_ticks = find_closest(resample_timing, perf_onsets)
    keep = onset_ticks[:-1] < resample_timing.shape[0]
    midi.tempos = TempoMap(onset_ticks[:-1][keep], tempos[keep])

    markers.insert(0, Marker(0, f"Shift_{perf_shift:.6f}"))

    midi.time_sigs = score_midi.time_sigs.copy()
    midi.markers = markers
    midi.max_tick = resample_timing.shape[0]

    return midi
