"""Native (C++) SPMuple2 tempo scan: bit parity with the Python scan."""
import os

import numpy as np
import pytest

from scoreperformer_tpu.tokenizers import TokenizerConfig
from scoreperformer_tpu.tokenizers.native import native_available
from scoreperformer_tpu.tokenizers.presets import SPMupleWindow, SPMupleWindowRecompute

pytestmark = pytest.mark.skipif(
    not native_available(), reason="no C++ toolchain for the native scan"
)


def make_tok(**extra):
    return SPMupleWindow(
        config=TokenizerConfig(additional_params={"max_bar_embedding": 256, **extra})
    )


def synthetic_scan_inputs(rng, K, clustered=False):
    """Random onset-pair chains shaped like real encodes: mostly-increasing
    times, a few notes per onset, occasional outliers triggering the clamp."""
    ticks = np.cumsum(rng.randint(60, 480, K)).astype(float)
    dt = rng.uniform(0.05, 0.6, K)
    if clustered:
        dt[rng.rand(K) < 0.1] *= 8  # big gaps exercise window fallbacks
    times = np.cumsum(dt)
    grouped = []
    for k in range(K):
        n = rng.randint(1, 5)
        devs = rng.randn(n) * 0.02
        if rng.rand() < 0.08:
            devs[0] += rng.choice([-1, 1]) * rng.uniform(0.5, 2.0)  # outlier
        grouped.append(times[k] + devs)
    pairs = np.zeros((K + 1, 2))
    pairs[1:, 0] = ticks
    pairs[1:, 1] = [g.mean() for g in grouped]
    if rng.rand() < 0.5:
        pairs[0] = (-1.0, -1.0 / 120.0 * (60.0 / 384))
    return pairs, grouped


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("K", [5, 60, 300])
def test_scan_bit_parity_random(seed, K):
    tok = make_tok()
    rng = np.random.RandomState(seed)
    pairs, grouped = synthetic_scan_inputs(rng, K, clustered=seed % 2 == 0)
    tempo_scale = 60.0 / 384

    pairs_py = pairs.copy()
    os.environ["SP_NATIVE_SCAN"] = "0"
    try:
        t_py, off_py = tok._tempo_clamp_scan(pairs_py, grouped, 110.0, tempo_scale)
    finally:
        os.environ.pop("SP_NATIVE_SCAN", None)

    pairs_nat = pairs.copy()
    t_nat, off_nat = tok._tempo_clamp_scan(pairs_nat, grouped, 110.0, tempo_scale)

    np.testing.assert_array_equal(t_nat, t_py)
    np.testing.assert_array_equal(off_nat, off_py)
    np.testing.assert_array_equal(pairs_nat, pairs_py)


def test_scan_bit_parity_onset_tempos():
    tok = make_tok(onset_tempos=True)
    rng = np.random.RandomState(7)
    pairs, grouped = synthetic_scan_inputs(rng, 80)
    tempo_scale = 60.0 / 384

    pairs_py = pairs.copy()
    os.environ["SP_NATIVE_SCAN"] = "0"
    try:
        t_py, off_py = tok._tempo_clamp_scan(pairs_py, grouped, 110.0, tempo_scale)
    finally:
        os.environ.pop("SP_NATIVE_SCAN", None)
    pairs_nat = pairs.copy()
    t_nat, off_nat = tok._tempo_clamp_scan(pairs_nat, grouped, 110.0, tempo_scale)
    np.testing.assert_array_equal(t_nat, t_py)
    np.testing.assert_array_equal(off_nat, off_py)


def test_full_encode_parity_on_synthetic_piece():
    """End-to-end: performance encode with and without the native scan must
    emit identical tokens (the scan is the only replaced component)."""
    from scoreperformer_tpu.data.synthetic import synthetic_score

    rng = np.random.RandomState(3)
    midi = synthetic_score(rng, n_bars=24)
    tok_a, tok_b = make_tok(), make_tok()
    sc = tok_a.score_midi_to_tokens(midi.copy(), preprocess=True)

    os.environ["SP_NATIVE_SCAN"] = "0"
    try:
        ref = tok_a.performance_midi_to_tokens(midi.copy(), sc)
    finally:
        os.environ.pop("SP_NATIVE_SCAN", None)
    fast = tok_b.performance_midi_to_tokens(midi.copy(), sc)
    np.testing.assert_array_equal(fast.ids, ref.ids)
    assert fast.meta["initial_tempo"] == ref.meta["initial_tempo"]


def test_recompute_preset_uses_same_scan():
    """The decode-recompute preset shares the scan config; quick parity."""
    tok = SPMupleWindowRecompute(
        config=TokenizerConfig(additional_params={"max_bar_embedding": 256})
    )
    rng = np.random.RandomState(11)
    pairs, grouped = synthetic_scan_inputs(rng, 50)
    tempo_scale = 60.0 / 384
    pairs_py = pairs.copy()
    os.environ["SP_NATIVE_SCAN"] = "0"
    try:
        t_py, _ = tok._tempo_clamp_scan(pairs_py, grouped, 100.0, tempo_scale)
    finally:
        os.environ.pop("SP_NATIVE_SCAN", None)
    pairs_nat = pairs.copy()
    t_nat, _ = tok._tempo_clamp_scan(pairs_nat, grouped, 100.0, tempo_scale)
    np.testing.assert_array_equal(t_nat, t_py)
