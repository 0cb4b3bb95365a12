import numpy as np
import pytest

import jax.numpy as jnp

from scoreperformer_tpu.data.synthetic import build_synthetic_dataset, synthetic_performance, synthetic_score
from scoreperformer_tpu.inference import SPMuple2IntermediateData, SPMuple2Messenger
from scoreperformer_tpu.ops.tokenizer_ops import TokenizerOps
from scoreperformer_tpu.tokenizers import SPMupleWindow, TokenizerConfig


@pytest.fixture(scope="module")
def tok_and_seq():
    rng = np.random.RandomState(11)
    tok = SPMupleWindow(TokenizerConfig(additional_params={"max_bar_embedding": 64}))
    score = synthetic_score(rng, n_bars=8)
    score_seq = tok.score_midi_to_tokens(score)
    perf = synthetic_performance(score, rng, tempo_base=100.0)
    perf_seq = tok.performance_midi_to_tokens(perf, score_seq)
    return tok, perf_seq


class TestComputeTicksJax:
    def test_matches_host(self, tok_and_seq):
        tok, perf_seq = tok_and_seq
        ops = TokenizerOps(tok)
        host = tok.compute_ticks(perf_seq.ids, 480)["note_on"]
        dev = np.asarray(ops.note_on_ticks(jnp.asarray(perf_seq.ids), 480))
        np.testing.assert_allclose(dev, host, atol=1e-6)


class TestSPMuple2DecodeJax:
    def test_matches_messenger(self, tok_and_seq):
        tok, perf_seq = tok_and_seq
        ops = TokenizerOps(tok)

        # the messenger works in beat-resolution tick units (messengers.py:231)
        td = tok.max_beat_res
        perf_times, offset_times, performed = ops.spmuple2_decode_times(
            jnp.asarray(perf_seq.ids), td
        )
        perf_times = np.asarray(perf_times)
        offset_times = np.asarray(offset_times)
        performed = np.asarray(performed)

        # host recursion via the messenger, seeded with the same init tempo
        tempos = tok.decode_token_type(perf_seq.ids, "Tempo")
        ticks = tok.compute_ticks(perf_seq.ids, td)["note_on"]
        first_tempo = tempos[ticks == ticks[0]].mean()
        msgr = SPMuple2Messenger(tok)
        msgs = msgr.tokens_to_messages(
            perf_seq.ids,
            intermediates=SPMuple2IntermediateData(initial_tempo=first_tempo),
            sort=False,
        )
        n = len(perf_seq.ids)
        host_on, host_off = msgs[:n, 0], msgs[n:, 0]

        assert performed.any()
        np.testing.assert_allclose(perf_times[performed], host_on[performed], atol=1e-4)
        np.testing.assert_allclose(offset_times[performed], host_off[performed], atol=1e-4)

    def test_batched(self, tok_and_seq):
        tok, perf_seq = tok_and_seq
        ops = TokenizerOps(tok)
        batch = jnp.stack([jnp.asarray(perf_seq.ids)] * 3)
        t0, t1, m = ops.spmuple2_decode_times_batch(batch, 480)
        assert t0.shape == (3, len(perf_seq.ids))
        np.testing.assert_allclose(np.asarray(t0[0]), np.asarray(t0[2]))

    def test_deadpan_jax(self, tok_and_seq):
        tok, perf_seq = tok_and_seq
        ops = TokenizerOps(tok)
        score_ids = perf_seq.ids[:, :-2]
        dp = np.asarray(ops.score_tokens_as_performance(jnp.asarray(score_ids)))
        host = tok.score_tokens_as_performance(score_ids).ids
        np.testing.assert_array_equal(dp, host)
