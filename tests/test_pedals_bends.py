"""Sustain-pedal and pitch-bend fidelity: parse, derive, quantize, filter,
write — the preprocess→write passthrough the reference gets from miditoolkit
(reference data/tokenizers/midi_tokenizer.py:44-52, data/midi/utils.py:99-124).
"""
import numpy as np
import pytest

from scoreperformer_tpu.midi import MidiScore, NoteArray, Track, read_midi
from scoreperformer_tpu.midi.native import native_available, read_midi_native
from scoreperformer_tpu.midi.ops import (
    derive_sustain_pedals,
    filter_late_events,
    quantize_pitch_bends,
    quantize_sustain_pedals,
)
from scoreperformer_tpu.midi.smf import read_midi_py, write_midi


def _piece_with_pedals_and_bends():
    midi = MidiScore(ticks_per_beat=480)
    notes = NoteArray(
        pitch=np.array([60, 64, 67], np.int32),
        velocity=np.array([80, 90, 100], np.int32),
        start=np.array([0, 480, 960], np.int64),
        end=np.array([400, 900, 1900], np.int64),
    )
    track = Track(notes=notes)
    track.control_changes = np.array(
        [
            [10, 64, 100],   # pedal down
            [500, 64, 20],   # pedal up
            [700, 64, 80],   # down again
            [1500, 64, 0],   # up
            [1600, 7, 100],  # unrelated CC (volume)
        ],
        np.int64,
    )
    track.pitch_bends = np.array([[100, 2000], [105, -4000], [800, 1000]], np.int64)
    track.pedals = derive_sustain_pedals(track.control_changes)
    midi.tracks.append(track)
    midi.recompute_max_tick()
    return midi


class TestDerive:
    def test_cc64_runs_become_intervals(self):
        midi = _piece_with_pedals_and_bends()
        np.testing.assert_array_equal(midi.tracks[0].pedals, [[10, 500], [700, 1500]])

    def test_repeated_downs_and_unterminated_press(self):
        cc = np.array(
            [[0, 64, 127], [50, 64, 90], [100, 64, 0], [200, 64, 80], [300, 7, 1]],
            np.int64,
        )
        # second down at 50 continues the same press; last press never released
        # -> closes at the final CC64 time
        np.testing.assert_array_equal(derive_sustain_pedals(cc), [[0, 100]])

    def test_no_cc64(self):
        cc = np.array([[0, 7, 100]], np.int64)
        assert derive_sustain_pedals(cc).shape == (0, 2)


class TestQuantize:
    def test_pedals_snap_and_keep_min_length(self):
        tps = 30  # 480 / 16
        pedals = np.array([[14, 47], [100, 110]], np.int64)
        out = quantize_sustain_pedals(pedals, tps)
        # 14 -> 0 (offset 14 <= 15), 47 -> 60 (offset 17 > 15)
        np.testing.assert_array_equal(out[0], [0, 60])
        # both ends of [100, 110] snap to 90/120? 100%30=10<=15 -> 90; 110%30=20>15 -> 120
        np.testing.assert_array_equal(out[1], [90, 120])
        # collapse keeps one sample
        out = quantize_sustain_pedals(np.array([[100, 104]], np.int64), tps)
        np.testing.assert_array_equal(out, [[90, 120]])

    def test_bends_snap_and_dedupe_by_magnitude(self):
        tps = 30
        bends = np.array([[100, 2000], [105, -4000], [800, 1000]], np.int64)
        out = quantize_pitch_bends(bends, tps)
        # 100 and 105 both snap to 90; keep the larger-|value| (-4000)
        np.testing.assert_array_equal(out, [[90, -4000], [810, 1000]])

    def test_bend_tie_later_wins(self):
        out = quantize_pitch_bends(np.array([[100, 500], [101, -500]], np.int64), 30)
        np.testing.assert_array_equal(out, [[90, -500]])


class TestFilterLate:
    def test_pedals_and_bends_dropped_past_max_tick(self):
        midi = _piece_with_pedals_and_bends()
        filter_late_events(midi, max_tick=600)
        track = midi.tracks[0]
        np.testing.assert_array_equal(track.pedals, [[10, 500]])
        np.testing.assert_array_equal(track.pitch_bends, [[100, 2000], [105, -4000]])
        assert (track.control_changes[:, 0] <= 600).all()


class TestRoundTrip:
    @pytest.mark.parametrize(
        "parser",
        [read_midi_py]
        + ([read_midi_native] if native_available() else []),
    )
    def test_write_read_preserves_pedals_and_bends(self, parser):
        midi = _piece_with_pedals_and_bends()
        data = write_midi(midi)
        back = parser(data)
        track = back.tracks[0]
        np.testing.assert_array_equal(track.pedals, midi.tracks[0].pedals)
        np.testing.assert_array_equal(track.pitch_bends, midi.tracks[0].pitch_bends)

    def test_programmatic_pedals_serialize_as_cc64(self):
        midi = MidiScore(ticks_per_beat=480)
        track = Track(
            notes=NoteArray(
                pitch=np.array([60], np.int32),
                velocity=np.array([80], np.int32),
                start=np.array([0], np.int64),
                end=np.array([2000], np.int64),
            )
        )
        track.pedals = np.array([[0, 960], [1000, 1800]], np.int64)
        midi.tracks.append(track)
        midi.recompute_max_tick()
        back = read_midi_py(write_midi(midi))
        np.testing.assert_array_equal(back.tracks[0].pedals, track.pedals)


class TestTokenizerPreprocess:
    def test_preprocess_quantizes_behind_flags(self):
        from scoreperformer_tpu.tokenizers import SPMuple2, TokenizerConfig

        midi = _piece_with_pedals_and_bends()
        config = TokenizerConfig(
            use_sustain_pedals=True,
            use_pitch_bends=True,
            additional_params={"max_bar_embedding": 256},
        )
        tok = SPMuple2(config=config)
        tps = int(480 / tok.max_beat_res)
        tok.preprocess_midi(midi.copy(), is_score=True)

        processed = midi.copy()
        tok.preprocess_midi(processed, is_score=True)
        track = processed.tracks[0]
        assert (track.pedals % tps == 0).all()
        assert (track.pitch_bends[:, 0] % tps == 0).all()

        # flags off: untouched
        config_off = TokenizerConfig(additional_params={"max_bar_embedding": 256})
        tok_off = SPMuple2(config=config_off)
        untouched = midi.copy()
        tok_off.preprocess_midi(untouched, is_score=True)
        np.testing.assert_array_equal(untouched.tracks[0].pedals, midi.tracks[0].pedals)

    def test_config_flags_round_trip_json(self):
        from scoreperformer_tpu.tokenizers import TokenizerConfig

        cfg = TokenizerConfig(use_sustain_pedals=True, use_pitch_bends=True)
        back = TokenizerConfig.from_dict(cfg.to_dict())
        assert back.use_sustain_pedals and back.use_pitch_bends
