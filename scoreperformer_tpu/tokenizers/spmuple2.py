"""SPMuple2: score-performance encoding with smooth local-window tempos.

Counterpart of scoreperformer/data/tokenizers/spmuple/spmuple2.py: onset pairs
(score tick, performance time) drive an iterative weighted local-tempo
estimate over an 8-second window; onset deviations and performed durations are
expressed in seconds relative to tempo-predicted times. The encode loop is
inherently sequential (each onset's tempo depends on the accumulated, possibly
outlier-shifted history) and runs on host numpy; a jittable `lax.scan` decode
lives in `scoreperformer_tpu.ops.tempo_scan` for the inference path.
"""
from __future__ import annotations

from typing import Optional, Union

import numpy as np

from ..midi import MidiScore, NoteArray, TempoMap, TimeSigMap, Track
from ..midi.ops import cut_overlapping_notes
from ..midi.sync import sync_performance_midi
from ..midi.timing import tick_to_time_map
from ..utils import find_closest
from .classes import TIME_DIVISION, TokSequence
from .spmuple import SPMuple
from .vocab import DEFAULT_TEMPO


class SPMuple2(SPMuple):
    """(reference spmuple2.py:23-611)"""

    TOKENIZATION_VERSION = 2

    def _tweak_config(self) -> None:
        ap = self.config.additional_params
        ap["rel_onset_dev"] = True
        ap.setdefault("nb_onset_devs", 161)
        ap["rel_perf_duration"] = True
        ap.setdefault("nb_perf_durations", 81)

        super()._tweak_config()

        ap.setdefault("onset_tempos", False)
        ap.setdefault("tempo_window", 8.0)
        ap.setdefault("tempo_min_onset_dist", 0.5)
        ap.setdefault("tempo_min_onsets", 8)
        ap.setdefault("use_quantized_tempos", True)
        ap.setdefault("decode_recompute_tempos", False)
        ap.setdefault("limit_rel_onset_devs", True)

    def _mask_perf_tempo(self) -> bool:
        return True  # tempos are recomputed from the onset pairs (spmuple2.py:150-151)

    def preprocess_midi(self, midi: MidiScore, is_score: bool = True) -> MidiScore:
        """(spmuple2.py:59-92): performance MIDIs keep raw note times AND raw
        tempo changes (needed for the tick→time map)."""
        from ..midi.preprocess import fill_unperformed_notes
        from ..midi.ops import remove_duplicated_notes

        fill_unperformed_notes(midi)

        kept = []
        for track in midi.tracks:
            notes = self._quantize_notes(track.notes, midi.ticks_per_beat, is_score=is_score)
            notes = notes.sort("time")
            if self.config.additional_params.get("remove_duplicates", False):
                notes = remove_duplicated_notes(notes)
            if len(notes) == 0:
                continue
            track.notes = notes
            kept.append(track)
        midi.tracks = kept

        if midi.tracks:
            midi.recompute_max_tick()
            keep = midi.tempos.time < midi.max_tick
            midi.tempos = TempoMap(midi.tempos.time[keep], midi.tempos.tempo[keep])

        if len(midi.time_sigs) == 0:
            midi.time_sigs = TimeSigMap.default()

        if is_score:
            if self.config.use_tempos:
                self._quantize_tempos(midi)
            if self.config.use_time_signatures:
                self._quantize_time_signatures(midi)
        return midi

    # ---- tempo machinery (spmuple2.py:548-611) ----

    def filter_onsets_in_window(
        self, onset_pair: np.ndarray, onset_pairs: np.ndarray, index: int
    ) -> np.ndarray:
        ap = self.config.additional_params
        onset_time = onset_pair[1]

        candidates = onset_pairs[:index][
            onset_pairs[:index, 1] <= onset_time - ap["tempo_min_onset_dist"]
        ]
        if len(candidates) == 0:
            candidates = onset_pairs[:index]

        pairs = candidates[candidates[:, 1] >= onset_time - ap["tempo_window"]]

        if len(pairs) < ap["tempo_min_onsets"]:
            pairs = candidates[max(0, len(candidates) - ap["tempo_min_onsets"]):]
            pairs = pairs[pairs[:, 1] >= onset_time - 4 * ap["tempo_window"]]

        if len(pairs) == 0:
            pairs = candidates

        return pairs

    def compute_local_tempo(self, distances: np.ndarray, tempo_scale: float) -> float:
        local_tempos = distances[:, 0] / distances[:, 1] * tempo_scale
        weights = 1 - distances[:, 1] / (distances[:, 1].max() + 0.01)
        weights = weights / weights.sum()

        tempo = max(self.vocab.tempos[0], float((weights * local_tempos).sum()))

        if self.config.use_tempos and self.config.additional_params["use_quantized_tempos"]:
            tempo = float(self.vocab.tempos[find_closest(self.vocab.tempos, tempo)])
        return tempo

    def compute_onset_tempo(
        self, onset_pair: np.ndarray, prev_onset_pair: np.ndarray, tempo_scale: float
    ) -> float:
        if onset_pair[1] <= prev_onset_pair[1]:
            tempo = float(self.vocab.tempos[-1])
        else:
            tempo = float(
                (onset_pair[0] - prev_onset_pair[0]) / (onset_pair[1] - prev_onset_pair[1])
            ) * tempo_scale
        if self.config.use_tempos and self.config.additional_params["use_quantized_tempos"]:
            tempo = float(self.vocab.tempos[find_closest(self.vocab.tempos, tempo)])
        return tempo

    # ---- performance encode (spmuple2.py:94-327) ----

    def _performance_midi_to_tokens(
        self,
        midi: MidiScore,
        score_tokens: TokSequence,
        alignment: Optional[np.ndarray] = None,
    ) -> TokSequence:
        ap = self.config.additional_params
        time_division = midi.ticks_per_beat
        ticks_per_sample = time_division / self.max_beat_res
        tempo_scale = 60.0 / time_division

        tokens, perf_positions, perf_durations = self._performance_base_rows(midi)
        score_ids = np.asarray(score_tokens.ids)

        if alignment is not None:
            tokens = tokens[alignment]
            perf_positions = perf_positions[alignment]
            perf_durations = perf_durations[alignment]

        # copy score streams (spmuple2.py:165-173)
        token_types = ["Bar", "Position", "Duration", "TimeSig"]
        if ap["use_position_shifts"]:
            token_types.append("PositionShift")
        if ap["use_onset_indices"]:
            token_types.extend(["NotesInOnset", "PositionInOnset"])
        for token_type in token_types:
            idx = self.types_idx[token_type]
            tokens[:, idx] = score_ids[:, idx]

        tokens = tokens.astype(np.int64)

        ticks_data = self.compute_ticks(score_ids, time_division, compute_beat_ticks=False)
        score_ticks = ticks_data["note_on"]
        duration_ticks = self.decode_token_type(score_ids, "Duration") * ticks_per_sample

        # performance note times via the performance's own tempo map
        ttt_map = tick_to_time_map(midi.tempos, midi.max_tick, midi.ticks_per_beat)
        perf_times = ttt_map[(perf_positions * ticks_per_sample).astype(int)]
        perf_offset_times = ttt_map[
            ((perf_positions + perf_durations) * ticks_per_sample).astype(int)
        ]

        is_performed = tokens[:, self.types_idx["Velocity"]] != self.zero_token
        score_onsets = np.unique(score_ticks[is_performed])

        # onset pairs: average performed time per unique performed onset
        onset_pairs = [(0.0, 0.0)]
        for onset_tick in score_onsets:
            onset_mask = score_ticks == onset_tick
            onset_time = perf_times[onset_mask][is_performed[onset_mask]].mean()
            onset_pairs.append((float(onset_tick), float(onset_time)))
        onset_pairs = np.array(onset_pairs)

        # initial tempo from the opening window (spmuple2.py:209-215)
        start_pairs = onset_pairs[onset_pairs[:, 1] <= 4 * ap["tempo_window"]]
        if len(start_pairs) < ap["tempo_min_onsets"]:
            start_pairs = onset_pairs[: ap["tempo_min_onsets"]]
        initial_tempo = self.compute_local_tempo(
            start_pairs[start_pairs[:, 1] > 0.0] - start_pairs[0], tempo_scale
        )

        if onset_pairs[1, 0] == 0:
            onset_pairs[0] = [-1, -1 / initial_tempo * tempo_scale]

        if ap["onset_tempos"]:
            initial_tempo = self.compute_onset_tempo(
                onset_pairs[1], onset_pairs[0], tempo_scale
            )

        # iterative weighted local tempos (spmuple2.py:225-270)
        num_tokens = len(tokens)
        tempos = [initial_tempo]
        note_tempos = np.ones(num_tokens)
        note_next_tempos = np.ones(num_tokens)
        note_onsets = np.zeros((num_tokens, 2))
        note_prev_onsets = np.zeros((num_tokens, 2))

        for i in range(len(onset_pairs) - 1):
            onset_tick, onset_time = onset_pairs[i + 1]
            prev_onset_tick, prev_onset_time = onset_pairs[i]

            onset_mask = score_ticks == onset_tick
            onset_time_shift = (onset_tick - prev_onset_tick) / tempos[-1] * tempo_scale
            note_perf_times = perf_times[onset_mask][is_performed[onset_mask]]
            note_onset_devs = note_perf_times - (prev_onset_time + onset_time_shift)
            note_rel_onset_devs = note_onset_devs / onset_time_shift
            start_idx = np.where(onset_mask)[0][0]

            # outlier clamp: shift this and all later times (spmuple2.py:242-251)
            if ap["limit_rel_onset_devs"] and np.any(
                np.abs(note_rel_onset_devs) > self.rel_onset_deviations[-1]
            ):
                onset_shift = 1 - self.rel_onset_deviations[-1] / np.abs(note_rel_onset_devs).max()
                onset_shift *= -note_onset_devs[np.abs(note_onset_devs).argmax()]

                onset_time += onset_shift
                onset_pairs[i + 1 :, 1] += onset_shift
                perf_times[start_idx:] += onset_shift
                perf_offset_times[start_idx:] += onset_shift

            if ap["onset_tempos"]:
                tempo = self.compute_onset_tempo(onset_pairs[i + 1], onset_pairs[i], tempo_scale)
            else:
                if onset_time < 2 * ap["tempo_min_onset_dist"]:
                    tempo = initial_tempo
                else:
                    pairs_in_window = self.filter_onsets_in_window(
                        onset_pairs[i + 1], onset_pairs, index=i + 1
                    )
                    tempo = self.compute_local_tempo(
                        onset_pairs[i + 1] - pairs_in_window, tempo_scale
                    )

            tempos.append(tempo)

            note_tempos[onset_mask] = tempos[i]
            note_next_tempos[onset_mask] = tempos[i + 1]
            note_prev_onsets[onset_mask] = onset_pairs[i]
            note_onsets[onset_mask] = onset_pairs[i + 1]

        # forward-fill zero tempos (spmuple2.py:281-284)
        for _tempos in (note_tempos, note_next_tempos):
            zero = _tempos == 0.0
            if zero.any():
                idx = np.where(~zero, np.arange(num_tokens), 0)
                np.maximum.accumulate(idx, out=idx)
                _tempos[:] = _tempos[idx]

        if self.config.use_tempos:
            tokens[:, self.types_idx["Tempo"]] = (
                find_closest(self.vocab.tempos, note_tempos) + self.zero_token
            )

        # relative onset deviations in seconds (spmuple2.py:291-299)
        note_time_shifts = (note_onsets[:, 0] - note_prev_onsets[:, 0]) / note_tempos * tempo_scale
        note_onset_devs = perf_times - (note_prev_onsets[:, 1] + note_time_shifts)
        note_onset_devs[~is_performed] = 0

        note_rel_onset_devs = np.zeros_like(note_onset_devs)
        note_rel_onset_devs[is_performed] = (
            note_onset_devs[is_performed] / note_time_shifts[is_performed]
        )
        rel_onset_dev_tokens = (
            find_closest(self.rel_onset_deviations, note_rel_onset_devs) + self.zero_token
        )

        # relative performed durations (spmuple2.py:301-308)
        perf_time_durations = perf_offset_times - perf_times
        score_time_durations = duration_ticks / note_tempos * tempo_scale

        note_rel_perf_durations = perf_time_durations / score_time_durations
        note_rel_perf_durations[~is_performed] = 1
        rel_perf_duration_tokens = (
            find_closest(self.rel_performed_durations, note_rel_perf_durations) + self.zero_token
        )

        tokens = np.concatenate(
            [tokens, rel_onset_dev_tokens[:, None], rel_perf_duration_tokens[:, None]], axis=1
        )

        return TokSequence(ids=tokens, meta={"initial_tempo": initial_tempo})

    # ---- decode (spmuple2.py:329-489) ----

    def performance_tokens_to_midi(
        self,
        tokens: Union[TokSequence, np.ndarray],
        time_division: int = TIME_DIVISION,
        output_path=None,
        initial_tempo: Optional[float] = None,
    ) -> MidiScore:
        ap = self.config.additional_params
        assert time_division % self.max_beat_res == 0
        ticks_per_sample = time_division // self.max_beat_res
        tempo_scale = 60.0 / time_division

        if isinstance(tokens, TokSequence):
            initial_tempo = tokens.meta.get("initial_tempo", initial_tempo)
            tokens = tokens.ids
        tokens = np.asarray(tokens)

        midi = MidiScore(ticks_per_beat=time_division)

        ticks_data = self.compute_ticks(tokens, time_division, compute_beat_ticks=False)
        score_ticks = ticks_data["note_on"]
        score_positions = score_ticks / ticks_per_sample

        duration_ticks = self.decode_token_type(tokens, "Duration") * ticks_per_sample

        time_sigs, time_sig_ticks = ticks_data["time_sig"]
        midi.time_sigs = TimeSigMap(
            time_sig_ticks.astype(np.int64), time_sigs[:, 0], time_sigs[:, 1]
        )

        is_performed = tokens[:, self.types_idx["Velocity"]] != self.zero_token
        score_onsets = np.unique(score_ticks[is_performed])

        token_tempos = self.decode_token_type(tokens, "Tempo")

        recompute = ap["decode_recompute_tempos"] and not ap["onset_tempos"]
        if not recompute:
            tempo = token_tempos[score_ticks == score_onsets[0]].mean()
        else:
            tempo = initial_tempo or DEFAULT_TEMPO

        note_rel_onset_devs = self.decode_token_type(tokens, "RelOnsetDev")
        note_rel_perf_durations = self.decode_token_type(tokens, "RelPerfDuration")

        # onset-by-onset time reconstruction
        if score_positions[0] > 0:
            onset_pairs = np.zeros((len(score_onsets) + 1, 2))
        else:
            onset_pairs = np.zeros((len(score_onsets) + 1, 2))
            onset_pairs[0] = (-1, -1 / tempo * tempo_scale)
        prev_onset_tick, prev_onset_time = onset_pairs[0]

        num_tokens = len(score_positions)
        perf_times = np.zeros(num_tokens)
        perf_offset_times = np.zeros(num_tokens)

        for i, onset_tick in enumerate(score_onsets):
            onset_mask = score_ticks == onset_tick

            if not recompute:
                tempo = token_tempos[onset_mask].mean()

            score_shift = onset_tick - prev_onset_tick
            time_shift = score_shift / tempo * tempo_scale
            onset_time = prev_onset_time + time_shift

            onset_devs = note_rel_onset_devs[onset_mask] * time_shift
            onset_perf_times = onset_time + onset_devs

            onset_time = onset_perf_times[is_performed[onset_mask]].mean()

            onset_pairs[i + 1] = (onset_tick, onset_time)

            onset_score_time_durations = duration_ticks[onset_mask] / tempo * tempo_scale
            onset_perf_time_durations = (
                note_rel_perf_durations[onset_mask] * onset_score_time_durations
            )

            perf_times[onset_mask] = onset_perf_times
            perf_offset_times[onset_mask] = onset_perf_times + onset_perf_time_durations

            if recompute:
                if onset_time < 2 * ap["tempo_min_onset_dist"]:
                    tempo = initial_tempo
                else:
                    pairs_in_window = self.filter_onsets_in_window(
                        onset_pairs[i + 1], onset_pairs[: i + 1], index=i + 1
                    )
                    tempo = self.compute_local_tempo(
                        onset_pairs[i + 1] - pairs_in_window, tempo_scale
                    )

            prev_onset_tick, prev_onset_time = onset_tick, onset_time

        pitches = self.decode_token_type(tokens, "Pitch")
        velocities = self.decode_token_type(tokens, "Velocity")

        max_tick = int((score_ticks + duration_ticks)[is_performed].max())
        max_time = float(perf_offset_times.max())

        perf_ids = np.where(is_performed)[0]
        midi.tracks.append(
            Track(
                notes=NoteArray(
                    pitch=pitches[perf_ids].astype(np.int32),
                    velocity=velocities[perf_ids].astype(np.int32),
                    start=perf_times[perf_ids],
                    end=perf_offset_times[perf_ids],
                ),
                program=0,
            )
        )
        midi.max_tick = max_tick

        midi = sync_performance_midi(
            score_midi=midi,
            perf_midi=midi,
            onset_pairs=onset_pairs,
            is_absolute_timing=True,
            max_time=max_time,
            bar_sync=False,
            inplace=True,
        )

        if ap["cut_overlapping_notes"]:
            for track in midi.tracks:
                track.notes = cut_overlapping_notes(track.notes)
            midi.recompute_max_tick()
            keep = midi.tempos.time < midi.max_tick
            midi.tempos = TempoMap(midi.tempos.time[keep], midi.tempos.tempo[keep])

        if output_path:
            from ..midi import write_midi

            write_midi(midi, output_path)
        return midi
