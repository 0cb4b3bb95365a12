"""Golden-fixture regression tests: the tokenizer's exact token output for a
fixed synthetic piece is frozen in tests/fixtures/golden_tokens.npz. Any
behavioral drift in MIDI preprocessing, vocab construction, or the SPMuple2
tempo recursion changes these ids and must be a deliberate decision."""
import numpy as np
import pytest

from scoreperformer_tpu.data.synthetic import synthetic_performance, synthetic_score
from scoreperformer_tpu.tokenizers import SPMupleWindow, TokenizerConfig

FIXTURE = "tests/fixtures/golden_tokens.npz"


@pytest.fixture(scope="module")
def golden():
    return np.load(FIXTURE)


def test_score_tokens_golden(golden):
    tok = SPMupleWindow(TokenizerConfig(additional_params={"max_bar_embedding": 64}))
    rng = np.random.RandomState(123)
    score = synthetic_score(rng, n_bars=8)
    seq = tok.score_midi_to_tokens(score)
    np.testing.assert_array_equal(seq.ids, golden["score_ids"])


def test_performance_tokens_golden(golden):
    tok = SPMupleWindow(TokenizerConfig(additional_params={"max_bar_embedding": 64}))
    rng = np.random.RandomState(123)
    score = synthetic_score(rng, n_bars=8)
    score_seq = tok.score_midi_to_tokens(score)
    perf = synthetic_performance(score, rng, tempo_base=96.0)
    perf_seq = tok.performance_midi_to_tokens(perf, score_seq)
    np.testing.assert_array_equal(perf_seq.ids, golden["perf_ids"])
    assert abs(perf_seq.meta["initial_tempo"] - golden["initial_tempo"][0]) < 1e-9
