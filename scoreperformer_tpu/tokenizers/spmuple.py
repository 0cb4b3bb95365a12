"""SPMuple: score-performance tuple encoding (v1, bar/beat local tempos).

Counterpart of scoreperformer/data/tokenizers/spmuple/{base,spmuple}.py on SoA
containers: score streams (PositionShift, NotesInOnset, PositionInOnset) and
performance streams ((Rel)OnsetDev, (Rel)PerfDuration), with beat/bar tempo
majority election.
"""
from __future__ import annotations

from typing import Optional, Tuple, Union

import numpy as np

from ..midi import MidiScore, NoteArray, TempoMap, TimeSigMap, Track
from ..midi.ops import cut_overlapping_notes
from ..utils import find_closest
from .classes import MASK, NUM_SPECIAL, TIME_DIVISION, TokSequence
from .octuple_m import OctupleM
from .vocab import DEFAULT_TEMPO, nearest_bin_left


class SPMuple(OctupleM):
    """ScorePerformanceMusic-tuple encoding (reference spmuple.py:24-813)."""

    TOKENIZATION_VERSION = 1

    def _tweak_config(self) -> None:
        super()._tweak_config()
        ap = self.config.additional_params
        ap.setdefault("token_bins", {})
        ap["cut_overlapping_notes"] = True
        ap.setdefault("use_position_shifts", False)
        ap.setdefault("onset_position_shifts", True)
        ap.setdefault("use_onset_indices", False)
        ap.setdefault("max_notes_in_onset", 12)
        ap.setdefault("rel_onset_dev", False)
        ap.setdefault("nb_onset_devs", 129)
        ap.setdefault("rel_perf_duration", False)
        ap.setdefault("nb_perf_durations", 65)
        ap.setdefault("bar_tempos", False)

    def _finalize_vocab(self) -> None:
        self.vocab.add_performance_streams()

    # ---- properties ----

    @property
    def position_shifts(self) -> Optional[np.ndarray]:
        return self.vocab.position_shifts

    @property
    def rel_onset_deviations(self) -> Optional[np.ndarray]:
        return self.vocab.rel_onset_deviations

    @property
    def rel_performed_durations(self) -> Optional[np.ndarray]:
        return self.vocab.rel_performed_durations

    @property
    def score_sizes(self):
        from .classes import SCORE_KEYS

        return {k: v for k, v in self.sizes.items() if k in SCORE_KEYS}

    # ---- preprocessing ----

    def preprocess_midi(self, midi: MidiScore, is_score: bool = True) -> MidiScore:
        """(reference spmuple.py:58-91): performance MIDIs skip note-time
        quantization and time-signature quantization."""
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

        if self.config.use_tempos:
            self._quantize_tempos(midi)
        if is_score and self.config.use_time_signatures:
            self._quantize_time_signatures(midi)
        return midi

    def preprocess_score_midi(self, midi: MidiScore) -> MidiScore:
        return self.preprocess_midi(midi, is_score=True)

    def preprocess_performance_midi(self, midi: MidiScore) -> MidiScore:
        return self.preprocess_midi(midi, is_score=False)

    # ---- score encode ----

    def score_midi_to_tokens(self, midi: MidiScore, preprocess: bool = True) -> TokSequence:
        """OctupleM score tokens + PositionShift/NotesInOnset/PositionInOnset
        streams (spmuple.py:93-146)."""
        if preprocess:
            self.preprocess_score_midi(midi)
        seq = self._midi_to_tokens(midi)
        ap = self.config.additional_params
        if not (ap["use_position_shifts"] or ap["use_onset_indices"]):
            return seq

        ids = seq.ids
        time_division = midi.ticks_per_beat
        ticks_per_sample = time_division / self.max_beat_res
        ticks_data = self.compute_ticks(ids, time_division, compute_beat_ticks=True)
        score_positions = ticks_data["note_on"] / ticks_per_sample

        extra = []
        if ap["use_position_shifts"]:
            pos_shifts = self.compute_position_shifts(score_positions)
            extra.append(find_closest(self.position_shifts, pos_shifts) + self.zero_token)

        _, notes_in_onset, pos_in_onset = self.compute_onset_values(score_positions)
        if ap["use_onset_indices"]:
            extra.append(notes_in_onset - 1 + self.zero_token)
            extra.append(pos_in_onset + self.zero_token)

        ids = np.concatenate([ids] + [e[:, None] for e in extra], axis=1)
        return TokSequence(ids=ids.astype(np.int64), meta=seq.meta)

    def compute_position_shifts(
        self, score_positions: np.ndarray, onset_shift: Optional[bool] = None
    ) -> np.ndarray:
        """(spmuple.py:721-736)"""
        if onset_shift is None:
            onset_shift = self.config.additional_params["onset_position_shifts"]
        if onset_shift:
            unique_pos, counts = np.unique(score_positions, return_counts=True)
            pos_ids = np.arange(len(unique_pos)).repeat(counts)
            pos_shifts = unique_pos[pos_ids] - unique_pos[pos_ids - 1]
            pos_shifts[pos_shifts < 0] = score_positions[pos_shifts < 0]
        else:
            pos_shifts = np.concatenate([score_positions[:1], np.diff(score_positions)])
        return pos_shifts

    def compute_onset_values(self, score_positions: np.ndarray):
        """(spmuple.py:738-754)"""
        max_in_onset = self.config.additional_params["max_notes_in_onset"]
        unique_pos, counts = np.unique(score_positions, return_counts=True)
        pos_ids = np.arange(len(unique_pos)).repeat(counts)

        notes_in_onset = np.minimum(counts[pos_ids], max_in_onset)

        pos_in_onset = np.repeat(np.cumsum(-counts) + counts, counts)
        pos_in_onset = pos_in_onset + np.arange(len(pos_in_onset))
        pos_in_onset = np.minimum(pos_in_onset, max_in_onset - 1)

        return pos_ids, notes_in_onset, pos_in_onset

    # ---- performance encode ----

    def performance_midi_to_tokens(
        self,
        midi: MidiScore,
        score_tokens: TokSequence,
        alignment: Optional[np.ndarray] = None,
        preprocess: bool = True,
    ) -> TokSequence:
        """(reference base.py:71-107)"""
        if preprocess:
            self.preprocess_performance_midi(midi)
        return self._performance_midi_to_tokens(midi, score_tokens, alignment)

    def _performance_base_rows(self, midi: MidiScore) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Build pre-performance token rows for all tracks.

        Returns (ids, perf_positions, perf_durations): ids are the token rows
        sorted by (time, track-desc, pitch); positions/durations stay in the
        pre-sort track-concatenation order (faithful to the reference, which
        snapshots them before sorting — spmuple.py:190-196).
        """
        tps = midi.ticks_per_beat / self.max_beat_res

        notes, track_ids = midi.all_notes(with_track_ids=True)
        descs = np.array(
            [(-1 if t.is_drum else t.program) for t in midi.tracks], dtype=np.int64
        )[track_ids] if len(midi.tracks) else np.empty(0, np.int64)

        perf_positions = notes.start / tps
        perf_durations = (notes.end - notes.start) / tps

        order = np.lexsort((notes.pitch, descs, notes.start))
        sorted_notes = notes[order]
        sorted_descs = descs[order]

        num = len(sorted_notes)
        z = self.zero_token
        # base rows span the score streams only; the two performance streams
        # are appended at the end of the encode
        base_types = [
            t
            for t in self.token_types
            if t not in ("OnsetDev", "RelOnsetDev", "PerfDuration", "RelPerfDuration")
        ]
        columns = {}
        for t in base_types:
            columns[t] = np.full(num, MASK, dtype=np.int64)
        columns["Pitch"] = sorted_notes.pitch - self.config.pitch_range[0] + z
        columns["Velocity"] = np.searchsorted(self.vocab.velocities, sorted_notes.velocity) + z

        if self.config.use_tempos and not self._mask_perf_tempo():
            tempo_times = midi.tempos.time
            tempo_values = midi.tempos.tempo
            if len(tempo_times) == 0:
                tempo_times, tempo_values = np.array([0]), np.array([DEFAULT_TEMPO])
            seg = np.searchsorted(tempo_times, sorted_notes.start, side="right") - 1
            note_tempos = np.where(
                seg >= 0, tempo_values[np.maximum(seg, 0)], DEFAULT_TEMPO
            )
            columns["Tempo"] = nearest_bin_left(self.vocab.tempos, note_tempos) + z

        if self.config.use_programs:
            prog_lut = {p: i for i, p in enumerate(self.config.programs)}
            columns["Program"] = (
                np.array([prog_lut.get(int(p), 0) for p in sorted_descs], dtype=np.int64) + z
            )

        ids = np.stack([columns[t] for t in base_types], axis=1)
        return ids, perf_positions, perf_durations

    def _mask_perf_tempo(self) -> bool:
        """v1 keeps performance-MIDI tempo tokens; v2 masks them
        (spmuple2.py:150-151)."""
        return False

    def _performance_midi_to_tokens(
        self,
        midi: MidiScore,
        score_tokens: TokSequence,
        alignment: Optional[np.ndarray] = None,
    ) -> TokSequence:
        """(spmuple.py:148-294)"""
        ap = self.config.additional_params
        time_division = midi.ticks_per_beat
        ticks_per_sample = time_division / self.max_beat_res

        tokens, perf_positions, perf_durations = self._performance_base_rows(midi)
        score_ids = np.asarray(score_tokens.ids)

        ticks_data = self.compute_ticks(score_ids, time_division, compute_beat_ticks=True)
        note_on_ticks = ticks_data["note_on"]
        beat_ticks = ticks_data["bar"] if ap["bar_tempos"] else ticks_data["beat"]

        note_beats = beat_ticks[
            np.minimum(np.searchsorted(beat_ticks, note_on_ticks), beat_ticks.shape[0] - 1)
        ]

        if alignment is not None:
            note_beats = note_beats[np.argsort(alignment)]

        # majority election of one tempo per beat (spmuple.py:223-235)
        note_beat_tempo = np.stack(
            [note_beats, tokens[:, self.types_idx["Tempo"]].astype(float)], axis=1
        )
        un_beat_tempos, counts = np.unique(note_beat_tempo, return_counts=True, axis=0)
        beat_tempo_data = np.concatenate([un_beat_tempos, counts[:, None]], axis=1)

        beat_tempos = []
        while len(beat_tempo_data) > 0:
            group = beat_tempo_data[beat_tempo_data[:, 0] == beat_tempo_data[0, 0]]
            beat_tempos.append(group[group[:, 2].argmax(), :2])
            beat_tempo_data = beat_tempo_data[len(group):]
        beat_tempos = np.stack(beat_tempos).astype(int)

        if alignment is not None:
            tokens = tokens[alignment]
            perf_positions = perf_positions[alignment]
            perf_durations = perf_durations[alignment]

        tokens[:, self.types_idx["Tempo"]] = beat_tempos[
            np.searchsorted(beat_tempos[:, 0], note_beats)
        ][:, 1]

        # copy score streams (spmuple.py:246-254)
        token_types = ["Bar", "Position", "Duration", "TimeSig"]
        if ap["use_position_shifts"]:
            token_types.append("PositionShift")
        if ap["use_onset_indices"]:
            token_types.extend(["NotesInOnset", "PositionInOnset"])
        for token_type in token_types:
            idx = self.types_idx[token_type]
            tokens[:, idx] = score_ids[:, idx]

        score_positions = note_on_ticks / ticks_per_sample
        score_durations = self.decode_token_type(score_ids, "Duration")

        onset_devs = perf_positions - score_positions

        if ap["rel_onset_dev"]:
            if ap["use_position_shifts"] and ap["onset_position_shifts"]:
                pos_shifts = self.position_shifts[
                    tokens[:, self.types_idx["PositionShift"]] - self.zero_token
                ].astype(np.float64)
            else:
                pos_shifts = self.compute_position_shifts(score_positions, onset_shift=True)
            pos_shifts[pos_shifts == 0] = 1
            rel_onset_devs = onset_devs / pos_shifts
            onset_dev_tokens = find_closest(self.rel_onset_deviations, rel_onset_devs)
        else:
            max_onset_dev = self.max_beat_res * 2
            onset_devs = np.minimum(np.maximum(onset_devs, -max_onset_dev), max_onset_dev)
            onset_dev_tokens = onset_devs + max_onset_dev

        if ap["rel_perf_duration"]:
            rel_perf_durations = perf_durations / score_durations
            perf_duration_tokens = find_closest(self.rel_performed_durations, rel_perf_durations)
        else:
            perf_duration_tokens = (
                find_closest(
                    self.vocab.duration_values[1:] * self.max_beat_res, perf_durations
                )
                + 1
            )

        tokens = np.concatenate(
            [
                tokens,
                onset_dev_tokens[:, None] + self.zero_token,
                perf_duration_tokens[:, None] + self.zero_token,
            ],
            axis=1,
        ).astype(np.int64)

        return TokSequence(ids=tokens)

    # ---- decode ----

    def decode_token_type(self, tokens: np.ndarray, token_type: str) -> np.ndarray:
        """(spmuple.py:756-775)"""
        idx = tokens[:, self.types_idx[token_type]] - self.zero_token
        if token_type == "PositionShift":
            return self.position_shifts[idx]
        if token_type == "OnsetDev":
            return idx - self.max_beat_res * 2
        if token_type == "RelOnsetDev":
            return self.rel_onset_deviations[idx]
        if token_type == "PerfDuration":
            return self.vocab.duration_values[idx] * self.max_beat_res
        if token_type == "RelPerfDuration":
            return self.rel_performed_durations[idx]
        return super().decode_token_type(tokens, token_type)

    def score_tokens_to_midi(
        self, tokens: Union[TokSequence, np.ndarray], time_division: int = TIME_DIVISION, **kw
    ) -> MidiScore:
        return self.tokens_to_midi(tokens, time_division=time_division, **kw)

    def performance_tokens_to_midi(
        self,
        tokens: Union[TokSequence, np.ndarray],
        time_division: int = TIME_DIVISION,
        output_path=None,
    ) -> MidiScore:
        """(spmuple.py:386-511)"""
        ap = self.config.additional_params
        assert time_division % self.max_beat_res == 0
        if isinstance(tokens, TokSequence):
            tokens = tokens.ids
        tokens = np.asarray(tokens)
        ticks_per_sample = time_division // self.max_beat_res

        midi = MidiScore(ticks_per_beat=time_division)
        ticks_data = self.compute_ticks(tokens, time_division, compute_beat_ticks=True)

        pitches = self.decode_token_type(tokens, "Pitch")
        velocities = self.decode_token_type(tokens, "Velocity")
        durations = self.decode_token_type(tokens, "Duration") * ticks_per_sample
        note_on_ticks = ticks_data["note_on"]

        if ap["use_position_shifts"]:
            pos_shifts = self.decode_token_type(tokens, "PositionShift").astype(np.float64)
        else:
            pos_shifts = self.compute_position_shifts(note_on_ticks / ticks_per_sample)

        if ap["rel_onset_dev"]:
            rel_onset_devs = self.decode_token_type(tokens, "RelOnsetDev")
            pos_shifts[pos_shifts == 0] = 1
            onset_devs = (rel_onset_devs * pos_shifts * ticks_per_sample).astype(int)
        else:
            onset_devs = self.decode_token_type(tokens, "OnsetDev") * ticks_per_sample

        note_on_ticks = np.maximum(0, note_on_ticks + onset_devs).astype(int)

        if ap["rel_perf_duration"]:
            rel_perf_durations = self.decode_token_type(tokens, "RelPerfDuration")
            perf_durations = (rel_perf_durations * durations).astype(int)
        else:
            perf_durations = (
                self.decode_token_type(tokens, "PerfDuration") * ticks_per_sample
            ).astype(int)

        note_off_ticks = (note_on_ticks + perf_durations).astype(int)

        time_sigs, time_sig_ticks = ticks_data["time_sig"]
        midi.time_sigs = TimeSigMap(
            time_sig_ticks.astype(np.int64), time_sigs[:, 0], time_sigs[:, 1]
        )

        tempo_indices = np.concatenate(
            [[0], np.where(np.diff(tokens[:, self.types_idx["Tempo"]]))[0] + 1]
        )
        tempos = self.decode_token_type(tokens[tempo_indices], "Tempo")
        if len(tempos) > 0:
            beat_ticks = ticks_data["bar"] if ap["bar_tempos"] else ticks_data["beat"]
            tempo_ticks = note_on_ticks[tempo_indices]
            tempo_ticks = beat_ticks[
                np.minimum(np.searchsorted(beat_ticks, tempo_ticks), beat_ticks.shape[0] - 1)
            ]
            tempo_ticks[0] = 0
        else:
            tempo_ticks = np.array([0])
        midi.tempos = TempoMap(tempo_ticks.astype(np.int64), np.round(tempos, 3))

        if self.config.use_programs:
            programs = self.decode_token_type(tokens, "Program")
            programs = np.array(self.config.programs)[programs]
        else:
            programs = np.zeros(len(tokens), dtype=np.int64)

        for program in np.unique(programs):
            ids = np.where(programs == program)[0]
            midi.tracks.append(
                Track(
                    notes=NoteArray(
                        pitch=pitches[ids].astype(np.int32),
                        velocity=velocities[ids].astype(np.int32),
                        start=note_on_ticks[ids].astype(np.int64),
                        end=note_off_ticks[ids].astype(np.int64),
                    ),
                    program=0 if program == -1 else int(program),
                    is_drum=bool(program == -1),
                )
            )

        midi.max_tick = int(note_off_ticks.max()) + 1

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

    def score_tokens_as_performance(
        self, score_tokens: Union[TokSequence, np.ndarray]
    ) -> TokSequence:
        """Deadpan performance tokens from score tokens (spmuple.py:513-540)."""
        ap = self.config.additional_params
        if isinstance(score_tokens, TokSequence):
            tokens = score_tokens.ids
        else:
            tokens = np.asarray(score_tokens)

        if ap["rel_onset_dev"]:
            zero_onset_token = (
                int(np.where(self.rel_onset_deviations == 0.0)[0][0]) + self.zero_token
            )
        else:
            zero_onset_token = self.max_beat_res * 2 + self.zero_token
        onset_dev_tokens = np.full_like(tokens[:, 0], fill_value=zero_onset_token)

        if ap["rel_perf_duration"]:
            unit = int(np.where(self.rel_performed_durations == 1.0)[0][0]) + self.zero_token
            perf_duration_tokens = np.full_like(tokens[:, 0], fill_value=unit)
        else:
            perf_duration_tokens = tokens[:, self.types_idx["Duration"]]

        out = np.concatenate(
            [tokens, onset_dev_tokens[:, None], perf_duration_tokens[:, None]], axis=1
        ).astype(np.int64)
        return TokSequence(ids=out)

    # ---- value tables ----

    def token_type_values(
        self, token_type: str, normalize: bool = False, special_tokens: bool = True
    ) -> np.ndarray:
        """(spmuple.py:777-813)"""
        values = super().token_type_values(token_type, normalize, special_tokens=False)
        v = self.vocab
        if token_type == "PositionShift":
            values = self.position_shifts / self.max_beat_res
            if normalize:
                values = np.log2(values + 1)
        elif token_type in ("NotesInOnset", "PositionInOnset"):
            values = np.arange(1, self.config.additional_params["max_notes_in_onset"] + 1)
            if normalize:
                values = values / self.config.additional_params["max_notes_in_onset"]
        elif token_type == "OnsetDev":
            values = np.arange(-2 * self.max_beat_res, 2 * self.max_beat_res + 1) / self.max_beat_res
            if normalize:
                values = values / values[-1]
        elif token_type == "RelOnsetDev":
            values = self.rel_onset_deviations
            if normalize:
                values = np.sign(values) * np.log(np.abs(values) + 1)
        elif token_type == "RelPerfDuration":
            values = self.rel_performed_durations
            if normalize:
                values = np.log(np.abs(values) + 1)
        if special_tokens:
            values = np.concatenate([np.zeros(self.zero_token), values])
        return values
