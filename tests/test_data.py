import numpy as np
import pytest

from scoreperformer_tpu.data import (
    LocalScorePerformanceDataset,
    MixedLMScorePerformanceCollator,
    TupleTokenSequenceIndexer,
    compute_bar_sample_positions,
    scoreperformer_model_inputs,
)
from scoreperformer_tpu.data.synthetic import build_synthetic_dataset


@pytest.fixture(scope="module")
def dataset_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("spds")
    return build_synthetic_dataset(str(root), n_scores=2, n_perfs_per_score=2, n_bars=12, seed=1)


@pytest.fixture(scope="module")
def dataset(dataset_root):
    return LocalScorePerformanceDataset(
        root=dataset_root,
        performance_directions=f"{dataset_root}/direction_classes.json",
        score_directions_dict=f"{dataset_root}/score_directions.json",
        max_seq_len=64,
        max_bar=256,
        bar_sliding_window=8,
        sample_bars=0.5,
        sample_note_shift=0.5,
        force_max_seq_len=0.5,
        fit_to_zero_bar=True,
        add_sos_eos=True,
        sample=True,
        seed=5,
        augment_performance=0.8,
        pitch_shift_range=(-3, 3),
        velocity_shift_range=(-12, 12),
        tempo_shift_range=(0, 0),
        noisy_performance=True,
        deadpan_performance=0.25,
        zero_out_silent_durations=True,
        preload=True,
    )


class TestBarSampling:
    def test_compute_bar_sample_positions(self):
        length, positions, ids = compute_bar_sample_positions(np.array([32, 16]), 16)
        assert length == len(positions)
        assert ids.tolist()[0] == 0
        # forward windows cover 0..24 for first piece
        assert 0 in positions

    def test_indexer_with_empty_bars(self, dataset):
        tok = dataset.tokenizer
        z = tok.zero_token
        # sequence with bars 0, 0, 2 (bar 1 empty), 3
        seq = np.zeros((4, len(tok.token_types)), dtype=np.int64)
        seq[:, 0] = np.array([0, 0, 2, 3]) + z
        indexer = TupleTokenSequenceIndexer(tok)
        idx = indexer.compute_bar_indices(seq)
        assert idx[0] == 0
        assert idx[1] == 2  # empty bar points to next bar's start
        assert idx[2] == 2
        assert idx[3] == 3
        assert idx[4] == 4


class TestDataset:
    def test_samples_have_consistent_shapes(self, dataset):
        for i in range(len(dataset)):
            s = dataset[i]
            assert s.score.shape[0] == s.perf.shape[0] == s.noisy_perf.shape[0]
            assert s.score.shape[1] == 10  # score streams
            assert s.perf.shape[1] == 12  # + 2 performance streams
            assert s.segments.bar.shape[0] == s.score.shape[0]
            assert s.perf.shape[0] <= 64 + 2  # max_seq_len + SOS/EOS

    def test_fit_to_zero_bar(self, dataset):
        s = dataset[len(dataset) - 1]
        z = dataset.tokenizer.zero_token
        bars = s.score[:, 0]
        live = bars > 3  # skip SOS/EOS rows
        assert bars[live].min() == z

    def test_reproducible_resampling_via_meta(self, dataset):
        s1 = dataset[0]
        s2 = dataset.get(meta=s1.meta)
        np.testing.assert_array_equal(s1.score, s2.score)
        np.testing.assert_array_equal(s1.perf, s2.perf)
        assert s1.is_deadpan == s2.is_deadpan

    def test_deadpan_sampling(self, dataset):
        dataset.reseed(7)
        saw_deadpan = False
        for i in range(min(len(dataset) * 4, 40)):
            s = dataset[i % len(dataset)]
            if s.is_deadpan:
                saw_deadpan = True
                devs = dataset.tokenizer.decode_token_type(s.perf[s.perf[:, 0] > 3], "RelOnsetDev")
                assert np.all(devs == 0.0)
        assert saw_deadpan

    def test_direction_labels(self, dataset):
        s = dataset[0]
        assert set(s.directions.keys()) == {"dynamics", "articulations"}
        assert dataset.performance_direction_sizes == {"dynamics": 2, "articulations": 2}
        nums, weights = dataset.get_direction_class_weights()
        assert set(weights.keys()) == {"dynamics", "articulations"}
        assert len(weights["dynamics"]) == 2
        for group, table in nums.items():
            # class 0 ('none') leads and absorbs the remainder: each group's
            # fractions partition the (note, performance) population
            keys = list(table.keys())
            assert keys[0] == (0, "none")
            assert weights[group] == list(table.values())
            assert all(0.0 <= v <= 1.0 for v in table.values())
            assert abs(sum(table.values()) - 1.0) < 1e-12


class TestCollator:
    def test_mixedlm_collation(self, dataset):
        collator = MixedLMScorePerformanceCollator(
            fixed_seq_len=72,
            mask_ignore_token_ids=[0, 1, 2, 3],
            mask_ignore_token_dims=[0, 1, 2, 4, 6, 7, 8, 9],
        )
        batch = [dataset[i] for i in range(min(4, len(dataset)))]
        data = collator(batch)

        assert data.performances.tokens.shape == (len(batch), 72, 12)
        assert data.scores.tokens.shape[1] == 72
        assert data.masked_performances.tokens.shape == data.performances.tokens.shape

        # masked stream: all non-special positions of non-ignored dims == MASK
        perf = data.performances.tokens
        masked = data.masked_performances.tokens
        special = np.isin(perf, [0, 1, 2, 3]).any(axis=-1)
        maskable_dims = [3, 5, 10, 11]  # Velocity, Tempo, RelOnsetDev, RelPerfDuration
        for d in maskable_dims:
            assert (masked[~special][:, d] == 1).all()
        # ignored dims unchanged
        for d in [0, 1, 2, 4]:
            np.testing.assert_array_equal(masked[..., d], perf[..., d])

        # labels: non-special positions carry targets on maskable dims, else -100
        labels = data.labels.tokens
        for d in maskable_dims:
            assert (labels[~special][:, d] == perf[~special][:, d]).all()
        for d in [0, 1, 2, 4]:
            assert (labels[..., d] == -100).all()

        inputs = scoreperformer_model_inputs(data)
        assert set(inputs) >= {
            "perf", "perf_mask", "score", "score_mask", "labels", "masked_perf",
            "bars", "beats", "onsets", "directions", "deadpan_mask", "noisy_perf",
        }

    def test_fixed_len_stability(self, dataset):
        collator = MixedLMScorePerformanceCollator(fixed_seq_len=80)
        shapes = set()
        for i in range(3):
            data = collator([dataset[i]])
            shapes.add(data.performances.tokens.shape)
        assert len(shapes) == 1
