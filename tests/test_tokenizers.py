import json

import numpy as np
import pytest

from scoreperformer_tpu.midi import MidiScore, NoteArray, TempoMap, TimeSigMap, Track
from scoreperformer_tpu.tokenizers import (
    OctupleM,
    SPMupleWindow,
    TokenizerConfig,
    TokSequence,
    load_tokenizer,
)

REF_WINDOW_JSON = "/root/reference/data/tokenizers/spmuple_window.json"
REF_ONSET_JSON = "/root/reference/data/tokenizers/spmuple_onset.json"
REF_BAR_JSON = "/root/reference/data/tokenizers/spmuple_bar.json"
REF_BEAT_JSON = "/root/reference/data/tokenizers/spmuple_beat.json"


def make_midi(note_tuples, tempos=None, time_sigs=None, tpb=480, velocity=80):
    midi = MidiScore(ticks_per_beat=tpb)
    tuples = [
        (t[0], t[1] if len(t) > 3 else velocity, t[-2], t[-1]) if len(t) == 4 else (t[0], velocity, t[1], t[2])
        for t in note_tuples
    ]
    midi.tracks.append(Track(notes=NoteArray.from_tuples(tuples)))
    if tempos is not None:
        midi.tempos = TempoMap([t for t, _ in tempos], [b for _, b in tempos])
    if time_sigs is not None:
        midi.time_sigs = time_sigs
    midi.recompute_max_tick()
    return midi


def simple_score(tpb=480, n_bars=2, velocity=80):
    """n_bars of 4/4 quarter notes with a chord on every downbeat."""
    notes = []
    for bar in range(n_bars):
        for beat in range(4):
            start = (bar * 4 + beat) * tpb
            notes.append((60 + beat, velocity, start, start + tpb))
            if beat == 0:
                notes.append((48, velocity, start, start + tpb))
    return make_midi(notes, tempos=[(0, 120.0)], tpb=tpb)


class TestVocabGolden:
    def test_window_config_vocab_sizes(self):
        tok = load_tokenizer(REF_WINDOW_JSON)
        assert type(tok).__name__ == "SPMupleWindow"
        sizes = tok.sizes
        assert sizes["Bar"] == 260
        assert sizes["Position"] == 132
        assert sizes["Pitch"] == 92
        assert sizes["Velocity"] == 132
        assert sizes["Duration"] == 133
        assert sizes["Tempo"] == 125
        assert sizes["TimeSig"] == 26
        assert sizes["NotesInOnset"] == 16
        assert sizes["PositionInOnset"] == 16
        assert sizes["RelOnsetDev"] == 165
        assert sizes["RelPerfDuration"] == 85
        assert tok.zero_token == 4

    def test_onset_config_ships_explicit_bins(self):
        tok = load_tokenizer(REF_ONSET_JSON)
        golden = json.load(open(REF_ONSET_JSON))["config"]["additional_params"]["token_bins"]
        assert np.allclose(tok.rel_onset_deviations, golden["rel_onset_deviations"])
        assert np.allclose(tok.rel_performed_durations, golden["rel_performed_durations"])

    def test_computed_bins_match_shipped(self):
        # window config ships no bins; computed v2 bins must equal the ONSET
        # golden (same heuristic/params)
        tok = load_tokenizer(REF_WINDOW_JSON)
        golden = json.load(open(REF_ONSET_JSON))["config"]["additional_params"]["token_bins"]
        assert np.allclose(tok.rel_onset_deviations, golden["rel_onset_deviations"])
        assert np.allclose(tok.rel_performed_durations, golden["rel_performed_durations"])

    def test_token_values_shapes(self):
        tok = load_tokenizer(REF_WINDOW_JSON)
        values = tok.token_values(normalize=True)
        for key, sz in tok.sizes.items():
            if key == "Bar":
                continue  # Bar values use max_bar_embedding, sizes may differ
            assert len(values[key]) == sz, key
        # normalized tempo is log2 ratio: first real tempo -> 0
        assert values["Tempo"][tok.zero_token] == 0.0


class TestBarBeatGolden:
    """Golden coverage of the two remaining shipped reference configs
    (reference data/tokenizers/spmuple_bar.json, spmuple_beat.json)."""

    SIZES = {
        "Bar": 260,
        "Position": 132,
        "Pitch": 92,
        "Velocity": 132,
        "Duration": 133,
        "Tempo": 125,
        "TimeSig": 26,
        "PositionShift": 69,
        "NotesInOnset": 16,
        "PositionInOnset": 16,
        "RelOnsetDev": 165,
        "RelPerfDuration": 85,
    }

    @pytest.mark.parametrize(
        "path,cls_name,bar_tempos",
        [(REF_BAR_JSON, "SPMupleBar", True), (REF_BEAT_JSON, "SPMupleBeat", False)],
    )
    def test_vocab_and_bins(self, path, cls_name, bar_tempos):
        tok = load_tokenizer(path)
        assert type(tok).__name__ == cls_name
        assert tok.sizes == self.SIZES
        assert tok.zero_token == 4
        assert tok.config.additional_params["bar_tempos"] is bar_tempos
        golden = json.load(open(path))["config"]["additional_params"]["token_bins"]
        assert np.allclose(tok.rel_onset_deviations, golden["rel_onset_deviations"])
        assert np.allclose(tok.rel_performed_durations, golden["rel_performed_durations"])

    @pytest.mark.parametrize("path", [REF_BAR_JSON, REF_BEAT_JSON])
    def test_shipped_config_roundtrip(self, path):
        """Encode->decode a synthetic piece through the shipped config."""
        tok = load_tokenizer(path)
        score = simple_score(n_bars=4)
        score_seq = tok.score_midi_to_tokens(score)
        assert score_seq.ids.shape[1] == 10

        perf = MidiScore(ticks_per_beat=480)
        notes = score.tracks[0].notes
        perf.tracks.append(Track(notes=notes.copy()))
        perf.tempos = TempoMap([0], [100.0])
        perf.recompute_max_tick()

        perf_seq = tok.performance_midi_to_tokens(perf, score_seq)
        assert perf_seq.ids.shape == (score_seq.ids.shape[0], 12)
        devs = tok.decode_token_type(perf_seq.ids, "RelOnsetDev")
        assert np.all(np.abs(devs) < 1e-6)

        midi = tok.performance_tokens_to_midi(perf_seq)
        out = midi.tracks[0].notes.sort("time")
        assert out.start.tolist() == sorted(notes.start.tolist())


class TestOctupleM:
    def test_score_roundtrip(self):
        tok = OctupleM(TokenizerConfig(additional_params={"max_bar_embedding": 16}))
        midi = simple_score()
        seq = tok.midi_to_tokens(midi.copy())
        assert seq.ids.shape == (10, 7)

        decoded = tok.tokens_to_midi(seq)
        src = simple_score().tracks[0].notes.sort("time")
        out = decoded.tracks[0].notes.sort("time")
        assert out.pitch.tolist() == src.pitch.tolist()
        assert out.start.tolist() == src.start.tolist()
        assert out.end.tolist() == src.end.tolist()
        assert out.velocity.tolist() == src.velocity.tolist()
        assert np.allclose(decoded.tempos.tempo, 120.0)  # 120 is an exact geomspace bin

    def test_bar_position_streams(self):
        tok = OctupleM(TokenizerConfig(additional_params={"max_bar_embedding": 16}))
        midi = simple_score()
        seq = tok.midi_to_tokens(midi)
        bars = seq.ids[:, tok.types_idx["Bar"]] - tok.zero_token
        pos = seq.ids[:, tok.types_idx["Position"]] - tok.zero_token
        # 5 notes in bar 0 (incl chord), 5 in bar 1
        assert bars.tolist() == [0] * 5 + [1] * 5
        # positions: two notes at 0, then 16, 32, 48 (max_beat_res=16 samples/beat)
        assert pos.tolist() == [0, 0, 16, 32, 48] * 2

    def test_time_signature_change(self):
        # 1 bar of 4/4 then 3/4
        notes = [(60, 80, 0, 480), (62, 80, 1920, 2400), (64, 80, 1920 + 1440, 1920 + 1440 + 480)]
        midi = make_midi(notes, tempos=[(0, 120.0)])
        midi.time_sigs = TimeSigMap([0, 1920], [4, 3], [4, 4])
        tok = OctupleM(TokenizerConfig(additional_params={"max_bar_embedding": 16}))
        seq = tok.midi_to_tokens(midi)
        bars = seq.ids[:, tok.types_idx["Bar"]] - tok.zero_token
        assert bars.tolist() == [0, 1, 2]  # bar 2 starts 1440 ticks after bar 1

        ticks = tok.compute_ticks(seq.ids, 480, compute_beat_ticks=True)
        assert ticks["note_on"].tolist() == [0, 1920, 3360]
        assert ticks["bar"][:3].tolist() == [0, 1920, 3360]

    def test_grow_bar_vocab(self):
        tok = OctupleM(TokenizerConfig(additional_params={"max_bar_embedding": 4}))
        midi = simple_score(n_bars=8)
        seq = tok.midi_to_tokens(midi)
        assert tok.vocab.real_max_bar_embedding >= 8
        assert tok.sizes["Bar"] == 4 + 4  # model-facing size stays max_bar_embedding

    def test_velocity_zero_is_unperformed(self):
        midi = simple_score(velocity=0)
        tok = OctupleM(TokenizerConfig(additional_params={"max_bar_embedding": 16}))
        seq = tok.midi_to_tokens(midi)
        vel = seq.ids[:, tok.types_idx["Velocity"]]
        assert (vel == tok.zero_token).all()


class TestSPMupleWindow:
    @pytest.fixture(scope="class")
    def tok(self):
        return load_tokenizer(REF_WINDOW_JSON)

    def make_performance(self, score, jitter_ticks=0, tempo=120.0, tpb=480):
        """Performance MIDI with the same notes as the (preprocessed) score."""
        rng = np.random.RandomState(0)
        notes = score.tracks[0].notes
        starts = notes.start.copy()
        if jitter_ticks:
            starts = starts + rng.randint(-jitter_ticks, jitter_ticks + 1, len(starts))
            starts = np.maximum(starts, 0)
        perf = MidiScore(ticks_per_beat=tpb)
        perf.tracks.append(
            Track(
                notes=NoteArray(
                    pitch=notes.pitch.copy(),
                    velocity=notes.velocity.copy(),
                    start=starts,
                    end=starts + notes.duration,
                )
            )
        )
        perf.tempos = TempoMap([0], [tempo])
        perf.recompute_max_tick()
        return perf

    def test_score_tokens_have_extra_streams(self, tok):
        midi = simple_score(n_bars=4)
        seq = tok.score_midi_to_tokens(midi)
        assert seq.ids.shape[1] == 10  # 7 base + PositionShift + NotesInOnset + PositionInOnset
        nio = seq.ids[:, tok.types_idx["NotesInOnset"]] - tok.zero_token
        # chord onsets have 2 notes -> value 2 -> index 1
        assert nio.max() == 1
        pio = seq.ids[:, tok.types_idx["PositionInOnset"]] - tok.zero_token
        assert pio.max() == 1 and pio.min() == 0

    def test_deadpan_roundtrip(self, tok):
        score = simple_score(n_bars=4)
        seq = tok.score_midi_to_tokens(score)
        perf_seq = tok.score_tokens_as_performance(seq)
        assert perf_seq.ids.shape[1] == 12
        # deadpan: zero onset dev and unit duration bins
        dev_vals = tok.decode_token_type(perf_seq.ids, "RelOnsetDev")
        dur_vals = tok.decode_token_type(perf_seq.ids, "RelPerfDuration")
        assert np.all(dev_vals == 0.0)
        assert np.all(dur_vals == 1.0)

    def test_performance_encode_constant_tempo(self, tok):
        score = simple_score(n_bars=4)
        score_seq = tok.score_midi_to_tokens(score)
        perf = self.make_performance(score, jitter_ticks=0, tempo=120.0)
        perf_seq = tok.performance_midi_to_tokens(perf, score_seq)

        assert perf_seq.ids.shape == (score_seq.ids.shape[0], 12)
        # constant deadpan timing at 120bpm -> initial tempo ~ 120
        assert abs(perf_seq.meta["initial_tempo"] - 120.0) < 2.0
        tempos = tok.decode_token_type(perf_seq.ids, "Tempo")
        assert np.all(np.abs(tempos - 120.0) < 2.5)
        # deviations should all be ~0
        devs = tok.decode_token_type(perf_seq.ids, "RelOnsetDev")
        assert np.all(np.abs(devs) < 0.01)

    def test_performance_decode_roundtrip(self, tok):
        score = simple_score(n_bars=4)
        score_seq = tok.score_midi_to_tokens(score)
        perf = self.make_performance(score, jitter_ticks=20, tempo=110.0)
        perf_starts_sec = perf.tracks[0].notes.start / perf.ticks_per_beat / 110.0 * 60.0

        perf_seq = tok.performance_midi_to_tokens(perf, score_seq)
        decoded = tok.performance_tokens_to_midi(perf_seq)
        assert decoded is not None

        # decoded notes (after re-grid) should match the original performance
        # times up to quantization + grid error
        dec_notes = decoded.tracks[0].notes.sort("time")
        from scoreperformer_tpu.midi import tick_to_time_map

        ttt = tick_to_time_map(decoded.tempos, decoded.max_tick, decoded.ticks_per_beat)
        dec_times = ttt[np.minimum(dec_notes.start, len(ttt) - 1)]
        src_order = np.argsort(perf_starts_sec, kind="stable")
        src_times = np.sort(perf_starts_sec - perf_starts_sec.min())
        assert len(dec_times) == len(src_times)
        assert np.abs(np.diff(dec_times) - np.diff(np.sort(src_times))).max() < 0.06

    def test_unperformed_notes_zero_dev(self, tok):
        score = simple_score(n_bars=4)
        score_seq = tok.score_midi_to_tokens(score)
        perf = self.make_performance(score, tempo=120.0)
        # silence notes 3..5
        perf.tracks[0].notes.velocity[3:6] = 0
        perf_seq = tok.performance_midi_to_tokens(perf, score_seq)
        devs = tok.decode_token_type(perf_seq.ids, "RelOnsetDev")
        durs = tok.decode_token_type(perf_seq.ids, "RelPerfDuration")
        vel = perf_seq.ids[:, tok.types_idx["Velocity"]]
        unperformed = vel == tok.zero_token
        assert unperformed.sum() == 3
        assert np.all(devs[unperformed] == 0.0)
        assert np.all(durs[unperformed] == 1.0)


class TestSPMupleV1:
    def test_beat_preset_roundtrip(self):
        from scoreperformer_tpu.tokenizers import SPMupleBeat

        tok = SPMupleBeat(TokenizerConfig(additional_params={"max_bar_embedding": 16}))
        score = simple_score(n_bars=2)
        score_seq = tok.score_midi_to_tokens(score)
        assert "RelOnsetDev" in tok.token_types

        perf = MidiScore(ticks_per_beat=480)
        notes = score.tracks[0].notes
        perf.tracks.append(Track(notes=notes.copy()))
        perf.tempos = TempoMap([0], [100.0])
        perf.recompute_max_tick()

        perf_seq = tok.performance_midi_to_tokens(perf, score_seq)
        assert perf_seq.ids.shape[1] == len(tok.token_types)
        devs = tok.decode_token_type(perf_seq.ids, "RelOnsetDev")
        assert np.all(np.abs(devs) < 1e-6)

        midi = tok.performance_tokens_to_midi(perf_seq)
        out = midi.tracks[0].notes.sort("time")
        assert out.start.tolist() == sorted(notes.start.tolist())


class TestTempoScanOracle:
    """The restructured SPMuple2 encode core (vectorized onset grouping +
    carried-offset clamp scan) against an independent oracle that follows the
    REFERENCE algorithm's shape literally — per-onset boolean-mask passes and
    in-place mutation of all future time arrays (reference spmuple2.py:
    193-308). Random inputs; bit-level agreement required."""

    def _oracle(self, tok, score_ticks, perf_times, is_performed, tempo_scale):
        ap = tok.config.additional_params
        dev_limit = tok.rel_onset_deviations[-1]
        perf_times = perf_times.copy()
        score_onsets = np.unique(score_ticks[is_performed])

        onset_pairs = [(0.0, 0.0)]
        for onset_tick in score_onsets:
            m = score_ticks == onset_tick
            onset_pairs.append(
                (float(onset_tick), float(perf_times[m][is_performed[m]].mean()))
            )
        onset_pairs = np.array(onset_pairs)

        head = onset_pairs[onset_pairs[:, 1] <= 4 * ap["tempo_window"]]
        if len(head) < ap["tempo_min_onsets"]:
            head = onset_pairs[: ap["tempo_min_onsets"]]
        initial_tempo = tok.compute_local_tempo(
            head[head[:, 1] > 0.0] - head[0], tempo_scale
        )
        if onset_pairs[1, 0] == 0:
            onset_pairs[0] = [-1, -1 / initial_tempo * tempo_scale]

        n = len(score_ticks)
        tempos = [initial_tempo]
        note_tempos = np.zeros(n)
        note_onsets = np.zeros((n, 2))
        note_prev_onsets = np.zeros((n, 2))
        for i in range(len(onset_pairs) - 1):
            onset_tick, onset_time = onset_pairs[i + 1]
            prev_tick, prev_time = onset_pairs[i]
            m = score_ticks == onset_tick
            shift = (onset_tick - prev_tick) / tempos[-1] * tempo_scale
            devs = perf_times[m][is_performed[m]] - (prev_time + shift)
            rels = devs / shift
            start_idx = np.where(m)[0][0]
            if np.any(np.abs(rels) > dev_limit):
                s = 1 - dev_limit / np.abs(rels).max()
                s *= -devs[np.abs(devs).argmax()]
                onset_time += s
                onset_pairs[i + 1 :, 1] += s
                perf_times[start_idx:] += s
            if onset_time < 2 * ap["tempo_min_onset_dist"]:
                tempo = initial_tempo
            else:
                pairs = tok.filter_onsets_in_window(
                    onset_pairs[i + 1], onset_pairs, index=i + 1
                )
                tempo = tok.compute_local_tempo(onset_pairs[i + 1] - pairs, tempo_scale)
            tempos.append(tempo)
            note_tempos[m] = tempos[i]
            note_onsets[m] = onset_pairs[i + 1]
            note_prev_onsets[m] = onset_pairs[i]
        return initial_tempo, perf_times, note_tempos, note_onsets, note_prev_onsets

    def test_restructured_core_matches_reference_shaped_oracle(self):
        from scoreperformer_tpu.tokenizers import SPMupleWindow, TokenizerConfig

        tok = SPMupleWindow(TokenizerConfig())
        tempo_scale = 60.0 / 480

        for seed in range(5):
            rng = np.random.RandomState(seed)
            n_onsets = rng.randint(12, 40)
            ticks = np.cumsum(rng.randint(120, 960, n_onsets)).astype(float)
            sizes = rng.randint(1, 5, n_onsets)
            score_ticks = np.repeat(ticks, sizes)
            n = len(score_ticks)
            sec_per_tick = tempo_scale / 110.0
            perf_times = score_ticks * sec_per_tick + rng.normal(0, 0.01, n)
            # occasional gross outliers to exercise the clamp
            out_idx = rng.choice(n, max(1, n // 10), replace=False)
            perf_times[out_idx] += rng.choice([-1, 1], len(out_idx)) * rng.uniform(
                0.5, 2.0, len(out_idx)
            )
            is_performed = rng.rand(n) > 0.15
            # every onset needs >=1 performed note (grouping invariant)
            first_of = np.searchsorted(score_ticks, ticks)
            for f, sz in zip(first_of, sizes):
                if not is_performed[f : f + sz].any():
                    is_performed[f] = True

            (init_o, times_o, tempos_o, onsets_o, prev_o) = self._oracle(
                tok, score_ticks, perf_times, is_performed, tempo_scale
            )

            # production path: grouping + carry scan + lazy offsets
            onset_ticks, group_start, note_onset_id = tok._group_by_onset(
                score_ticks, is_performed
            )
            K = len(onset_ticks)
            perf_group = note_onset_id[is_performed]
            grouped = np.split(
                perf_times[is_performed],
                np.cumsum(np.bincount(perf_group, minlength=K))[:-1],
            )
            pairs = np.zeros((K + 1, 2))
            pairs[1:, 0] = onset_ticks
            pairs[1:, 1] = [g.mean() for g in grouped]
            init_p = tok._initial_tempo(pairs, tempo_scale)
            if pairs[1, 0] == 0:
                pairs[0] = (-1.0, -1 / init_p * tempo_scale)
            tempos, cum_off = tok._tempo_clamp_scan(pairs, grouped, init_p, tempo_scale)
            owing = np.searchsorted(group_start, np.arange(n), side="right") - 1
            note_off = np.where(owing >= 0, cum_off[np.maximum(owing, 0)], 0.0)
            times_p = perf_times + note_off
            hit = note_onset_id >= 0
            gid = note_onset_id[hit]
            tempos_p = np.zeros(n)
            tempos_p[hit] = tempos[gid]
            onsets_p = np.zeros((n, 2))
            onsets_p[hit] = pairs[gid + 1]
            prev_p = np.zeros((n, 2))
            prev_p[hit] = pairs[gid]

            # the oracle applies clamp shifts incrementally (t + s1) + s2 as
            # the reference does; production applies the accumulated offset
            # once: equal up to float reassociation (~1 ulp). Quantized
            # tempos — the actual token-level spec — must match exactly.
            assert init_p == init_o
            np.testing.assert_allclose(times_p, times_o, rtol=1e-9, atol=1e-12,
                                       err_msg=f"seed {seed}")
            np.testing.assert_array_equal(tempos_p, tempos_o, err_msg=f"seed {seed}")
            np.testing.assert_allclose(onsets_p, onsets_o, rtol=1e-9, atol=1e-12,
                                       err_msg=f"seed {seed}")
            np.testing.assert_allclose(prev_p, prev_o, rtol=1e-9, atol=1e-12,
                                       err_msg=f"seed {seed}")
