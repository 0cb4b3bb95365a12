import os

import numpy as np
import pytest

from scoreperformer_tpu.data import LocalScorePerformanceDataset
from scoreperformer_tpu.data.prepare import align_performance_to_score, prepare_dataset
from scoreperformer_tpu.data.synthetic import synthetic_performance, synthetic_score
from scoreperformer_tpu.midi import write_midi


class TestAlignment:
    def test_exact_match(self):
        score = np.array([[0, 60], [480, 62], [960, 64]])
        perf = np.array([[10, 60], [500, 62], [940, 64]])
        matches = align_performance_to_score(score, perf)
        assert matches.tolist() == [0, 1, 2]

    def test_missing_note(self):
        score = np.array([[0, 60], [480, 62], [960, 64]])
        perf = np.array([[10, 60], [950, 64]])  # the 62 was skipped
        matches = align_performance_to_score(score, perf)
        assert matches.tolist() == [0, -1, 1]

    def test_extra_perf_note_ignored(self):
        score = np.array([[0, 60], [480, 62]])
        perf = np.array([[0, 60], [200, 60], [480, 62]])
        matches = align_performance_to_score(score, perf)
        assert matches[0] == 0 and matches[1] == 2


class TestPrepareDataset:
    def test_end_to_end(self, tmp_path):
        raw = tmp_path / "raw"
        rng = np.random.RandomState(7)
        pairs = []
        for si in range(2):
            piece = raw / f"piece{si}"
            piece.mkdir(parents=True)
            score = synthetic_score(rng, n_bars=8, base_pitch=46 + 2 * si)
            write_midi(score, str(piece / "score.mid"))
            perfs = []
            for pi in range(2):
                perf = synthetic_performance(score, rng, tempo_base=100 + 10 * pi)
                # drop a couple of notes to exercise silent-note insertion
                if pi == 1:
                    notes = perf.tracks[0].notes
                    perf.tracks[0].notes = notes[np.arange(len(notes)) % 17 != 3]
                path = str(piece / f"perf{pi}.mid")
                write_midi(perf, path)
                perfs.append(path)
            pairs.append((f"piece{si}", str(piece / "score.mid"), perfs))

        out = str(tmp_path / "dataset")
        prepare_dataset(pairs, out, tokenization="SPMupleWindow")

        assert os.path.exists(os.path.join(out, "metadata.json"))
        assert os.path.exists(os.path.join(out, "config.json"))
        assert os.path.exists(os.path.join(out, "bars.json"))

        dataset = LocalScorePerformanceDataset(
            root=out, max_seq_len=64, bar_sliding_window=8,
            fit_to_zero_bar=True, add_sos_eos=True,
            auxiliary_data_keys=["bars", "initial_tempos"],
            zero_out_silent_durations=True, preload=True,
        )
        assert len(dataset) > 0
        sample = dataset[0]
        assert sample.perf.shape[0] == sample.score.shape[0]
        assert sample.perf.shape[1] == 12

        # the note-dropped performance must contain silent (velocity-0) notes
        tok = dataset.tokenizer
        dropped = [n for n in dataset.performance_names if n.endswith("perf_1")]
        assert dropped
        seq = dataset.performances[dataset.performance_names.index(dropped[0])]
        assert (seq[:, tok.types_idx["Velocity"]] == tok.zero_token).sum() > 0

        # decoded tempo should resemble the performance tempo, not the score's
        perf0 = dataset.performances[0]
        tempos = tok.decode_token_type(perf0, "Tempo")
        assert 80 < np.median(tempos) < 140

    def test_parallel_workers_identical_outputs(self, tmp_path):
        """workers>1 fans pieces over a process pool; every written artifact
        must be byte-identical to the serial run (pieces are independent and
        manifests assemble in input order)."""
        import json

        raw = tmp_path / "raw"
        rng = np.random.RandomState(11)
        pairs = []
        for si in range(3):
            piece = raw / f"piece{si}"
            piece.mkdir(parents=True)
            score = synthetic_score(rng, n_bars=4, base_pitch=48 + si)
            write_midi(score, str(piece / "score.mid"))
            perf = synthetic_performance(score, rng, tempo_base=90 + 5 * si)
            path = str(piece / "perf0.mid")
            write_midi(perf, path)
            pairs.append((f"piece{si}", str(piece / "score.mid"), [path]))

        serial = str(tmp_path / "serial")
        parallel = str(tmp_path / "parallel")
        prepare_dataset(pairs, serial, tokenization="SPMupleWindow",
                        splits={"train": 0.7, "eval": 0.3})
        prepare_dataset(pairs, parallel, tokenization="SPMupleWindow",
                        splits={"train": 0.7, "eval": 0.3}, workers=2)

        names = sorted(os.listdir(serial))
        assert names == sorted(os.listdir(parallel))
        for name in names:
            if not name.endswith(".json"):
                continue
            with open(os.path.join(serial, name)) as f:
                a = json.load(f)
            with open(os.path.join(parallel, name)) as f:
                b = json.load(f)
            assert a == b, name


class TestPathologicalLifecycle:
    def test_pathological_scores_through_prepare(self, tmp_path):
        """MIDI-file prepare over the pathological corpus: mid-bar tempo
        changes, time-sig sections, overlapping voices, dense pedal runs and
        an anacrusis all survive align -> tokenize -> dataset -> sample."""
        from scoreperformer_tpu.data.synthetic import (
            PATHOLOGY_KINDS,
            synthetic_pathological_score,
        )

        raw = tmp_path / "raw"
        rng = np.random.RandomState(23)
        pairs = []
        for kind in PATHOLOGY_KINDS:
            piece = raw / kind
            piece.mkdir(parents=True)
            score = synthetic_pathological_score(rng, kind, n_bars=6)
            write_midi(score, str(piece / "score.mid"))
            perf = synthetic_performance(score, rng, tempo_base=104.0)
            path = str(piece / "perf0.mid")
            write_midi(perf, path)
            pairs.append((kind, str(piece / "score.mid"), [path]))

        out = str(tmp_path / "dataset")
        prepare_dataset(pairs, out, tokenization="SPMupleWindow")

        dataset = LocalScorePerformanceDataset(
            root=out, max_seq_len=64, bar_sliding_window=4,
            fit_to_zero_bar=True, add_sos_eos=True,
            auxiliary_data_keys=["bars", "initial_tempos"],
            preload=True,
        )
        assert len(dataset.scores) == len(PATHOLOGY_KINDS)
        for i in range(min(len(dataset), 20)):
            sample = dataset[i]
            assert sample.perf.shape[0] == sample.score.shape[0]
            assert sample.perf.shape[1] == 12

    def test_synthetic_dataset_with_pathologies(self, tmp_path):
        """build_synthetic_dataset(pathologies=True) appends one piece per
        pathology kind and the dataset loads + samples over all of them."""
        from scoreperformer_tpu.data.synthetic import PATHOLOGY_KINDS, build_synthetic_dataset

        root = build_synthetic_dataset(
            str(tmp_path / "ds"), n_scores=1, n_perfs_per_score=1, n_bars=8,
            seed=3, pathologies=True,
        )
        dataset = LocalScorePerformanceDataset(
            root=root, max_seq_len=64, bar_sliding_window=4,
            fit_to_zero_bar=True, add_sos_eos=True, preload=True,
        )
        assert len(dataset.scores) == 1 + len(PATHOLOGY_KINDS)
        seen = set()
        for i in range(len(dataset)):
            sample = dataset[i]
            # _sample_ids holds each performance's start offset into the
            # flattened window table — invert it to the performance index
            seen.add(int(np.searchsorted(dataset._sample_ids, i, side="right")) - 1)
            assert sample.perf.shape[0] == sample.score.shape[0]
        assert len(seen) == len(dataset.scores) * 1  # every piece sampled
