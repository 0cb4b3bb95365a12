import numpy as np
import pytest

from scoreperformer_tpu.midi import (
    MidiScore,
    NoteArray,
    TempoMap,
    TimeSigMap,
    Track,
    get_bar_beat_ticks,
    get_performance_beats,
    read_midi,
    tick_to_time_map,
    write_midi,
    ops,
)


def make_score(note_tuples, tempos=None, time_sigs=None, tpb=480):
    score = MidiScore(ticks_per_beat=tpb)
    score.tracks.append(Track(notes=NoteArray.from_tuples(note_tuples)))
    if tempos is not None:
        score.tempos = TempoMap(*zip(*tempos)) if isinstance(tempos, list) else tempos
    if time_sigs is not None:
        score.time_sigs = time_sigs
    score.recompute_max_tick()
    return score


class TestSMF:
    def test_roundtrip(self, tmp_path):
        notes = [(60, 80, 0, 480), (64, 90, 480, 960), (67, 100, 480, 1440), (72, 70, 960, 1920)]
        score = make_score(notes, tempos=[(0, 120.0), (960, 90.0)])
        score.time_sigs = TimeSigMap([0], [3], [4])

        path = tmp_path / "test.mid"
        write_midi(score, path)
        loaded = read_midi(path)

        assert loaded.ticks_per_beat == 480
        assert len(loaded.tracks) == 1
        n = loaded.tracks[0].notes
        assert sorted(zip(n.pitch, n.velocity, n.start, n.end)) == sorted(
            (p, v, s, e) for p, v, s, e in notes
        )
        assert np.allclose(loaded.tempos.tempo, [120.0, 90.0], atol=0.01)
        assert loaded.tempos.time.tolist() == [0, 960]
        assert loaded.time_sigs.numerator.tolist() == [3]
        assert loaded.time_sigs.denominator.tolist() == [4]

    def test_roundtrip_markers_and_drums(self):
        from scoreperformer_tpu.midi import Marker

        score = make_score([(60, 80, 0, 480)])
        score.markers = [Marker(0, "NoteS_65_0_240"), Marker(480, "hello")]
        drum = Track(notes=NoteArray.from_tuples([(36, 100, 0, 120)]), is_drum=True, name="Drums")
        score.tracks.append(drum)

        data = write_midi(score)
        loaded = read_midi(data)
        assert [m.text for m in loaded.markers] == ["NoteS_65_0_240", "hello"]
        assert any(t.is_drum for t in loaded.tracks)
        assert any(not t.is_drum for t in loaded.tracks)

    def test_overlapping_same_pitch_notes_fifo(self):
        # two overlapping same-pitch notes must pair FIFO
        score = make_score([(60, 80, 0, 1000), (60, 80, 500, 1500)])
        loaded = read_midi(write_midi(score))
        n = loaded.tracks[0].notes.sort("time")
        # note offs at 1000 and 1500 close the earlier-started notes first
        assert n.start.tolist() == [0, 500]
        assert n.end.tolist() == [1000, 1500]

    def test_running_status_and_vel0_noteoff(self):
        # hand-crafted SMF with running status and note-on vel 0 as note-off
        import struct

        track = bytearray()
        track += b"\x00\x90\x3c\x50"  # t=0 note on C4 vel 80
        track += b"\x60\x3c\x00"  # t=96 running status: note on vel 0 = off
        track += b"\x00\x40\x40"  # t=96 note on E4 vel 64 (running status)
        track += b"\x60\x80\x40\x40"  # t=192 note off E4
        track += b"\x00\xff\x2f\x00"
        data = b"MThd" + struct.pack(">IHHH", 6, 0, 1, 96)
        data += b"MTrk" + struct.pack(">I", len(track)) + bytes(track)

        loaded = read_midi(data)
        n = loaded.tracks[0].notes.sort("time")
        assert n.pitch.tolist() == [60, 64]
        assert n.start.tolist() == [0, 96]
        assert n.end.tolist() == [96, 192]


class TestTiming:
    def test_tick_to_time_single_tempo(self):
        ttt = tick_to_time_map(TempoMap([0], [120.0]), max_tick=960, ticks_per_beat=480)
        assert len(ttt) == 961
        assert ttt[0] == 0.0
        assert abs(ttt[480] - 0.5) < 1e-9  # one beat at 120bpm = 0.5s
        assert abs(ttt[960] - 1.0) < 1e-9

    def test_tick_to_time_tempo_change(self):
        ttt = tick_to_time_map(TempoMap([0, 480], [120.0, 60.0]), max_tick=960, ticks_per_beat=480)
        assert abs(ttt[480] - 0.5) < 1e-9
        assert abs(ttt[960] - 1.5) < 1e-9  # second beat at 60bpm = 1.0s


class TestBeats:
    def test_bar_beat_ticks_44(self):
        score = make_score([(60, 80, 0, 480)], tpb=480)
        score.max_tick = 480 * 8  # two 4/4 bars
        bars, beats = get_bar_beat_ticks(score)
        assert bars.tolist() == [0, 1920]
        assert beats.tolist() == [0, 480, 960, 1440, 1920, 2400, 2880, 3360]

    def test_bar_beat_ticks_68_compound(self):
        score = make_score([(60, 80, 0, 480)], tpb=480)
        score.time_sigs = TimeSigMap([0], [6], [8])
        score.max_tick = 1440 * 2  # 6/8 bar = 1440 ticks, 2 beats per bar
        bars, beats = get_bar_beat_ticks(score)
        assert bars.tolist() == [0, 1440]
        assert beats.tolist() == [0, 720, 1440, 2160]

    def test_performance_beats_interpolation(self):
        score_beats = np.array([0, 480, 960])
        pairs = np.array([(0, 0.0), (960, 1.0)])
        sb, pb = get_performance_beats(score_beats, pairs)
        assert np.allclose(pb, [0.0, 0.5, 1.0])


class TestOps:
    def test_cut_overlapping_notes(self):
        notes = NoteArray.from_tuples([(60, 80, 0, 1000), (60, 80, 500, 1500), (64, 80, 0, 400)])
        cut = ops.cut_overlapping_notes(notes)
        by_pitch = cut.sort("pitch")
        sixty = by_pitch[by_pitch.pitch == 60]
        assert sixty.end.tolist() == [499, 1500]
        assert by_pitch[by_pitch.pitch == 64].end.tolist() == [400]

    def test_remove_duplicated_notes(self):
        notes = NoteArray.from_tuples(
            [(60, 80, 0, 480), (60, 90, 0, 500), (60, 80, 480, 960)]
        )
        out = ops.remove_duplicated_notes(notes)
        assert len(out) == 2
        assert sorted(out.start.tolist()) == [0, 480]
        # the kept duplicate is the one with the smaller end
        assert out[out.start == 0].end.tolist() == [480]

    def test_quantize_note_times_round_half_down(self):
        # tpb=480, max_beat_res=32 -> ticks_per_sample=15
        notes = NoteArray.from_tuples([(60, 80, 7, 22), (60, 80, 8, 100)])
        q = ops.quantize_note_times(notes, time_division=480)
        assert q.start.tolist() == [0, 15]  # 7 rounds down (<=7.5), 8 rounds up
        assert q.end.tolist() == [15, 105]  # 22->15, but equal start bumps +15; 100->105

    def test_quantize_tempos_dedup(self):
        times = np.array([0, 100, 200])
        tempos = np.array([120.0, 120.0, 90.0])
        t, b = ops.quantize_tempo_times(times, tempos, time_division=480)
        assert b.tolist() == [120.0, 90.0]
        assert t.tolist() == [0, 195]  # 200 % 15 = 5 <= 7.5 -> down to 195

    def test_quantize_key_signatures_dedup_and_snap(self):
        # dedup consecutive identical keys, then snap to the 15-tick grid
        # (480/32), round-half-down — reference quantization.py:120-141
        ks = [(0, "C"), (100, "C"), (200, "G"), (310, "F")]
        out = ops.quantize_key_signature_times(ks, time_division=480)
        assert out == [(0, "C"), (195, "G"), (315, "F")]

    def test_quantize_time_signatures_moves_to_barline(self):
        # 4/4 then change at tick 2000 (not on a bar line of 1920) -> moves to 3840
        t, n, d = ops.quantize_time_signature_times(
            np.array([0, 2000]), np.array([4, 3]), np.array([4, 4]), time_division=480
        )
        assert t.tolist() == [0, 3840]
        assert n.tolist() == [4, 3]


class TestSync:
    def test_sync_performance_midi_identity(self):
        # deadpan performance: onset pairs on an exact 120bpm grid
        tpb = 480
        notes = [(60, 80, 0, 480), (64, 80, 480, 960), (67, 80, 960, 1440), (72, 80, 1440, 1920)]
        score = make_score(notes, tpb=tpb)
        score.max_tick = 1920

        # absolute-timing performance at 120 bpm: ticks/960 seconds... use 0.5s per beat
        perf = MidiScore(ticks_per_beat=tpb)
        abs_notes = NoteArray(
            pitch=np.array([n[0] for n in notes]),
            velocity=np.array([n[1] for n in notes]),
            start=np.array([n[2] / 960 for n in notes]),
            end=np.array([n[3] / 960 for n in notes]),
        )
        perf.tracks.append(Track(notes=abs_notes))
        perf.max_tick = 1920

        onset_pairs = np.array([(0, 0.0), (480, 0.5), (960, 1.0), (1440, 1.5)])
        from scoreperformer_tpu.midi import sync_performance_midi

        synced = sync_performance_midi(
            score, perf, onset_pairs, is_absolute_timing=True, max_time=2.0, bar_sync=False
        )
        assert synced is not None
        n = synced.tracks[0].notes.sort("time")
        assert n.start.tolist() == [0, 480, 960, 1440]
        # tempo should be ~120 everywhere
        assert np.allclose(synced.tempos.tempo, 120.0, atol=0.5)
        assert synced.markers[0].text.startswith("Shift_")
