import numpy as np
import pytest

import jax

from scoreperformer_tpu.data import (
    LocalScorePerformanceDataset,
    MixedLMScorePerformanceCollator,
)
from scoreperformer_tpu.data.synthetic import build_synthetic_dataset
from scoreperformer_tpu.inference import (
    ScorePerformerGenerator,
    SPMuple2Messenger,
)
from scoreperformer_tpu.models import MODELS
from scoreperformer_tpu.training import inject_data_config

pytestmark = pytest.mark.slow

MAX_SEQ = 48


def tiny_cfg():
    emb = {
        "_target_": "simple", "emb_dims": 16, "mode": "cat", "emb_norm": True,
        "discrete": False, "continuous": True, "continuous_dense": True,
        "discrete_ids": [0, 1, 2, 3],
    }
    attn = {"dim_head": 8, "one_kv_head": True, "alibi_pos_bias": True, "alibi_learned": True}
    ff = {"mult": 2, "glu": True, "swish": True}
    enc_t = {"_target_": "encoder", "depth": 1, "heads": 2, "attention": attn, "feed_forward": ff}
    return {
        "dim": 32, "tie_token_emb": True, "mode": "mixlm",
        "score_encoder": {"token_embeddings": dict(emb), "emb_norm": True,
                          "use_abs_pos_emb": False, "max_seq_len": MAX_SEQ + 2,
                          "transformer": dict(enc_t)},
        "perf_encoder": {"token_embeddings": dict(emb), "emb_norm": True,
                         "use_abs_pos_emb": False, "max_seq_len": MAX_SEQ + 2,
                         "latent_dim": [8, 6, 4, 2],
                         "aggregate_mode": ["mean", "bar_mean", "beat_mean", "onset_mean"],
                         "max_segments": 64, "hierarchical": True,
                         "transformer": dict(enc_t)},
        "perf_decoder": {"token_embeddings": {**emb, "_target_": "multi-seq", "multiseq_mode": "post-cat"},
                         "emb_norm": True, "use_abs_pos_emb": False, "max_seq_len": MAX_SEQ + 2,
                         "context_emb_mode": "cat", "style_emb_mode": "adanorm",
                         "transformer": {"_target_": "decoder", "depth": 1, "heads": 2,
                                         "attention": attn, "feed_forward": ff},
                         "lm_head": {"_target_": "lm-tied"}},
    }


@pytest.fixture(scope="module")
def generator(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("gends"))
    build_synthetic_dataset(root, n_scores=1, n_perfs_per_score=1, n_bars=6, seed=7,
                            with_directions=False)
    dataset = LocalScorePerformanceDataset(
        root=root, max_seq_len=MAX_SEQ, bar_sliding_window=8,
        fit_to_zero_bar=True, add_sos_eos=True, preload=True,
        auxiliary_data_keys=["bars"],
    )
    collator = MixedLMScorePerformanceCollator(
        mask_ignore_token_ids=[0, 1, 2, 3],
        mask_ignore_token_dims=[0, 1, 2, 4, 6, 7, 8, 9],
    )
    cfg = inject_data_config(tiny_cfg(), dataset)
    model, _ = MODELS.get("ScorePerformer")(**cfg)

    sample = dataset[0]
    batch = collator([sample])
    from scoreperformer_tpu.data import scoreperformer_model_inputs
    import jax.numpy as jnp

    inputs = {k: jnp.asarray(v) for k, v in scoreperformer_model_inputs(batch).items()}
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
            "latent_dropout": jax.random.PRNGKey(2), "mmd": jax.random.PRNGKey(3)}
    variables = model.init(rngs, **inputs, deterministic=True)

    messenger = SPMuple2Messenger(dataset.tokenizer)
    return ScorePerformerGenerator(model, variables, dataset, collator, messenger)


class TestMessenger:
    def test_messages_match_decode(self, generator):
        """Messenger timing over a full sequence must match decoded note times."""
        dataset = generator.dataset
        tok = dataset.tokenizer
        perf_seq = dataset.performances[0]

        messages = generator.messenger.tokens_to_messages(perf_seq, sort=True)
        # note-on + note-off per note
        assert messages.shape == (2 * len(perf_seq), 4)
        on_times = np.sort(messages[messages[:, 3] > 0][:, 0])

        midi = tok.performance_tokens_to_midi(perf_seq.copy())
        from scoreperformer_tpu.midi import tick_to_time_map

        ttt = tick_to_time_map(midi.tempos, midi.max_tick, midi.ticks_per_beat)
        notes = midi.all_notes().sort("time")
        dec_times = np.sort(ttt[np.minimum(notes.start, len(ttt) - 1)])
        dec_times = dec_times - dec_times.min() + on_times.min()
        assert len(dec_times) == len(on_times)
        assert np.abs(dec_times - on_times).max() < 0.05

    def test_streaming_intermediates_match_full(self, generator):
        """Chunked messenger calls with intermediates == one full call."""
        perf_seq = generator.dataset.performances[0]
        msgr = generator.messenger

        full = msgr.tokens_to_messages(perf_seq, note_attributes=False,
                                       note_off_events=False, sort=False)

        from scoreperformer_tpu.inference import SPMuple2IntermediateData

        inter = SPMuple2IntermediateData(initial_tempo=120.0)
        chunked = []
        for i in range(0, len(perf_seq), 7):
            chunk = perf_seq[i : i + 7]
            times, inter = msgr.tokens_to_messages(
                chunk, note_attributes=False, note_off_events=False,
                intermediates=inter, return_intermediates=True, sort=False,
            )
            chunked.extend(np.atleast_1d(times).tolist())
        # NB: compute_ticks per chunk re-bases ticks; compare diffs robustly
        assert len(chunked) == len(full)


class TestGenerator:
    def test_prepare_and_generate(self, generator):
        generator.reset()
        data = generator.prepare_performance_notes(0, overlay_bars=0.0)
        assert data.notes is not None
        assert data.context is not None and data.embeddings is not None
        assert data.context.shape[0] == data.notes.shape[0]
        # perf streams masked
        assert (data.notes[1:-1, -2:] == 1).all()

        n_predict = generator.predict_number_of_notes(0.0, time_window=1.0)
        assert n_predict >= 0

        gen, messages = generator.generate_performance_notes(
            start_time=0.0, time_window=1.5, greedy=True, max_context_len=40,
        )
        assert gen is not None and len(gen) > 0
        assert not (gen == 1).any()  # all masks resolved
        assert len(messages) > 0
        # note-ON messages within the window (note-offs may exceed it)
        msgs = np.asarray(messages)
        on_times = msgs[msgs[:, 3] > 0][:, 0]
        assert on_times.max() <= 1.5 + 1e-6

        # second window continues from the first
        prev_len = generator.perf_data.gen_seq.shape[0]
        gen2, messages2 = generator.generate_performance_notes(
            start_time=1.5, time_window=1.0, greedy=True, max_context_len=40,
        )
        if gen2 is not None:
            assert generator.perf_data.gen_seq.shape[0] > prev_len

    def test_generated_ids_stay_in_stream_vocab(self, generator):
        """Regression: StreamingDecoder.predict returns its logits dict
        through a jit boundary, which SORTS dict keys — positional mapping
        wrote e.g. Velocity logits (bigger vocab) into the RelPerfDuration
        column, producing ids past the value tables. Every generated id must
        lie inside its own stream's vocab, under sampling (which explores
        high ids) and across several windows."""
        import jax

        generator.reset()
        generator.prepare_performance_notes(0, overlay_bars=0.0)
        sizes = list(dict(generator.tokenizer.sizes).values()) \
            if isinstance(generator.tokenizer.sizes, dict) else list(generator.tokenizer.sizes)
        clock, rng = 0.0, jax.random.PRNGKey(11)
        for _ in range(4):
            rng, wrng = jax.random.split(rng)
            gen, _ = generator.generate_performance_notes(
                start_time=clock, time_window=0.7, greedy=False,
                temperature=2.0, rng=wrng, max_context_len=40,
            )
            clock += 0.7
            if gen is None:
                continue
            for s, size in enumerate(sizes):
                assert gen[:, s].max() < size, (
                    f"stream {s} produced id {gen[:, s].max()} >= vocab {size}"
                )

    def test_block_decode_never_refuses_near_capacity(self, generator):
        """Near the cache capacity the bucket is left-aligned over already-
        decoded rows instead of refused (refusal = per-note fallback, one
        ~25 ms tunnel round-trip per note on a remote chip — the cause of
        every post-window-shift SLO violation at the dim-1024 regime). With
        cap 40 and 16-buckets, groups decode within bucket-distance of the
        cap constantly: assert the block path held the whole run."""
        import jax

        generator.reset()
        generator.prepare_performance_notes(0, overlay_bars=0.0)
        clock = 0.0
        for _ in range(6):
            generator.generate_performance_notes(
                start_time=clock, time_window=0.5, greedy=True,
                rng=jax.random.PRNGKey(4), max_context_len=40,
                block_size=16,
            )
            clock += 0.5
            if generator.perf_data.reached_eos:
                break
        stats = generator._decoder.stats
        assert stats["block_calls"] > 0
        assert stats["block_refusals"] == 0, (
            f"{stats['block_refusals']} refusals — groups fell back to the "
            f"per-note path near the cache cap"
        )

    def test_block_decode_matches_per_note_greedy(self, generator):
        """The device-side block decoder (one compiled scan + one host sync
        per block) must produce EXACTLY the per-note path's greedy stream."""
        import jax

        def run(block_size):
            generator.reset()
            generator.prepare_performance_notes(0, overlay_bars=0.0)
            clock = 0.0
            for _ in range(6):
                generator.generate_performance_notes(
                    start_time=clock, time_window=0.5, greedy=True,
                    rng=jax.random.PRNGKey(4), max_context_len=40,
                    block_size=block_size,
                )
                clock += 0.5
                if generator.perf_data.reached_eos:
                    break
            return generator.perf_data.gen_seq.copy()

        per_note = run(block_size=1)
        block = run(block_size=16)
        assert per_note.shape == block.shape
        np.testing.assert_array_equal(per_note, block)

    def test_warmup_preserves_generation(self, generator):
        """warmup() pre-compiles every consume/block bucket program against
        zero-filled rows; it must leave the decoder logically fresh so the
        subsequent stream is bit-identical to an un-warmed run, and it must
        not refuse any bucket."""
        import jax

        def run(warm):
            generator.reset()
            generator.prepare_performance_notes(0, overlay_bars=0.0)
            if warm:
                # the module-scoped fixture may carry a decoder from earlier
                # tests — assert on DELTAS, not absolutes
                before = (
                    dict(generator._decoder.stats)
                    if generator._decoder is not None
                    else {"block_refusals": 0}
                )
                generator.warmup(max_context_len=40, greedy=True)
                after = generator._decoder.stats
                assert after["block_refusals"] == before.get("block_refusals", 0)
                # every block bucket that fits the capacity has a compiled fn
                fits = [b for b in generator._decoder.BLOCK_BUCKETS if b + 1 <= 40]
                keys = {k[0] for k in generator._decoder._block_fns}
                assert set(fits) <= keys
            clock = 0.0
            for _ in range(4):
                generator.generate_performance_notes(
                    start_time=clock, time_window=0.5, greedy=True,
                    rng=jax.random.PRNGKey(4), max_context_len=40,
                )
                clock += 0.5
                if generator.perf_data.reached_eos:
                    break
            return generator.perf_data.gen_seq.copy()

        cold = run(warm=False)
        warm = run(warm=True)
        np.testing.assert_array_equal(cold, warm)

    def test_block_decode_matches_per_note_sampled(self, generator):
        """SAMPLED parity between the paths: both derive per-note keys as
        fold_in(window_rng, absolute_note_index) then split over all logit
        streams indexed by column — partition-invariant, so the same seed
        must yield the same sampled trajectory whether notes are decoded in
        16-note blocks or chord-group-at-a-time."""
        import jax

        def run(block_size):
            generator.reset()
            generator.prepare_performance_notes(0, overlay_bars=0.0)
            clock = 0.0
            for _ in range(6):
                generator.generate_performance_notes(
                    start_time=clock, time_window=0.5, greedy=False,
                    temperature=1.5, rng=jax.random.PRNGKey(21),
                    max_context_len=40, block_size=block_size,
                )
                clock += 0.5
                if generator.perf_data.reached_eos:
                    break
            return generator.perf_data.gen_seq.copy()

        per_note = run(block_size=1)
        block = run(block_size=16)
        assert per_note.shape == block.shape
        np.testing.assert_array_equal(per_note, block)

    def test_temperature_change_reuses_block_fn(self, generator):
        """Regression: temperature was baked into the compiled block fn and
        its cache key — interactive temperature steering between windows
        recompiled the whole scan program (minutes on a tunneled chip). It
        is now a traced argument: a new temperature must NOT grow
        _block_fns, and must still change the sampled output."""
        import jax

        def run(temp):
            generator.reset()
            generator.prepare_performance_notes(0, overlay_bars=0.0)
            generator.generate_performance_notes(
                start_time=0.0, time_window=1.0, greedy=False,
                temperature=temp, rng=jax.random.PRNGKey(13),
                max_context_len=40, block_size=16,
            )
            return (generator.perf_data.gen_seq.copy(),
                    len(generator._decoder._block_fns))

        cool, n_fns_1 = run(0.2)
        hot, n_fns_2 = run(5.0)
        assert n_fns_2 == n_fns_1, (
            "a temperature change recompiled the block decode program"
        )
        n = min(len(cool), len(hot))
        assert not np.array_equal(cool[:n], hot[:n]), (
            "temperature had no effect on the sampled stream"
        )

    def test_window_never_outgrows_decoder_cache(self, generator, monkeypatch):
        """Regression: when no bar boundary fits max_context_len (one bar
        wider than the window), the shift-1 fallback let the window outgrow
        the KV cache; dynamic_update_slice clamps writes past capacity and
        silently corrupts attention. Drive a context window narrower than a
        synthetic bar (~11 notes) and assert every consume stays in bounds."""
        import jax

        from scoreperformer_tpu.inference.generator import StreamingDecoder

        orig = StreamingDecoder._consume_to
        positions = []

        def spy(self, tokens, masked_tokens, style, context, position, **kw):
            positions.append(position)
            assert position <= self.max_context_len, (
                f"consumed past KV capacity: position {position} > "
                f"{self.max_context_len}"
            )
            return orig(self, tokens, masked_tokens, style, context, position, **kw)

        monkeypatch.setattr(StreamingDecoder, "_consume_to", spy)
        generator.reset()
        generator._decoder = None  # drop the 40-token decoder
        generator.prepare_performance_notes(0, overlay_bars=0.0)
        clock, rng = 0.0, jax.random.PRNGKey(2)
        for _ in range(24):
            rng, wrng = jax.random.split(rng)
            gen, _ = generator.generate_performance_notes(
                start_time=clock, time_window=0.3, greedy=True, rng=wrng,
                max_context_len=10,
            )
            clock += 0.3
            if generator.perf_data.reached_eos:
                break
        assert positions, "the narrow-window drive never consumed a token"
        generator._decoder = None  # don't leak the 10-token decoder

    def test_many_consecutive_windows_with_overshoot(self, generator):
        """Regression: a window whose speculative decode overshoots the cut
        (including cut_idx == 0, returning no notes) left the decoder's
        consumed counter past the next window's first position — the next
        predict() then returned None logits and crashed. Drive many small
        windows to exhaustion; every window must either produce notes or
        cleanly return None, and the stream must stay in vocab."""
        import jax

        generator.reset()
        generator.prepare_performance_notes(0, overlay_bars=0.0)
        clock, rng = 0.0, jax.random.PRNGKey(9)
        produced = none_windows = 0
        for w in range(40):
            rng, wrng = jax.random.split(rng)
            # every third window is near-zero-length: its speculative decode
            # lands entirely beyond the cut (cut_idx == 0 -> None), leaving
            # discarded tokens in the decoder — the crash precondition
            window = 1e-4 if w % 3 == 2 else 0.2
            gen, messages = generator.generate_performance_notes(
                start_time=clock, time_window=window, greedy=True,
                rng=wrng, max_context_len=40,
            )
            clock += window
            if generator.perf_data.reached_eos:
                break
            if gen is None:
                none_windows += 1
            else:
                produced += len(gen)
                assert not (gen == 1).any()
        assert produced > 10  # the piece actually streamed
        assert none_windows > 0  # the overshoot-discard path was exercised

    def test_streaming_window_meets_realtime_slo(self, generator):
        """Streaming SLO (reference generators.py:109-110: 0.2 s window +
        0.1 s overflow): steady-state wall-clock per generated window must be
        below the window length, i.e. generation keeps up with real time.
        The TPU flagship measurement lives in scripts/exp_streaming_slo.py /
        BASELINE.md; this guards the code path at test size on CPU."""
        import time

        import jax

        generator.reset()
        generator.prepare_performance_notes(0, overlay_bars=0.0)
        window = 0.2
        clock, rng = 0.0, jax.random.PRNGKey(5)
        walls = []
        for w in range(14):
            rng, wrng = jax.random.split(rng)
            t0 = time.perf_counter()
            gen, _ = generator.generate_performance_notes(
                start_time=clock, time_window=window, greedy=True,
                rng=wrng, max_context_len=40,
            )
            wall = time.perf_counter() - t0
            clock += window
            if gen is None:
                break
            walls.append(wall)
        assert len(walls) >= 7, "piece exhausted before steady state"
        # drop 4 warmup windows: each block bucket jit-compiles on first use,
        # and a bucket first reached at window >= 2 would put a compile into
        # the measured set on a loaded CI host
        # assert on a ROBUST LOW QUANTILE (25th pct) of steady windows: this
        # guards the code path (a per-window recompile or host-chatter
        # regression slows EVERY window, so the lower quartile catches it),
        # while staying robust to transient scheduler stalls on a shared
        # single-core CI host — a single lucky window can no longer mask a
        # multi-x regression. The real SLO measurement is the TPU run in
        # scripts/exp_streaming_slo.py.
        steady = sorted(walls[4:])
        q25 = steady[max(0, (len(steady) - 1) // 4)]
        assert q25 < window, (
            f"25th-pct steady window wall {q25 * 1e3:.0f} ms exceeds the "
            f"{window * 1e3:.0f} ms real-time budget"
        )

    def test_block_fn_cache_keyed_by_filter_fn(self, generator):
        """Regression: StreamingDecoder._block_fns was keyed without
        filter_fn — a second call with a DIFFERENT custom filter silently
        reused the first filter's compiled block fn. Two sampled windows
        with distinct filter_fns must compile two block fns, and a top-1
        filter must pin the sampled streams to greedy rows."""
        import jax
        import jax.numpy as jnp

        def top_one(logits, **_):
            # keep only the argmax: sampling through this filter IS greedy
            best = logits.max(axis=-1, keepdims=True)
            return jnp.where(logits < best, -jnp.inf, logits)

        def run(filter_fn):
            generator.reset()
            generator.prepare_performance_notes(0, overlay_bars=0.0)
            generator.generate_performance_notes(
                start_time=0.0, time_window=1.0, greedy=False,
                temperature=2.0, rng=jax.random.PRNGKey(3),
                max_context_len=40, block_size=16, filter_fn=filter_fn,
            )
            return (generator.perf_data.gen_seq.copy(),
                    len(generator._decoder._block_fns))

        from scoreperformer_tpu.ops.sampling import top_k

        wide, n_fns_1 = run(top_k)
        pinned, n_fns_2 = run(top_one)
        assert n_fns_2 > n_fns_1, (
            "second filter_fn reused the first filter's compiled block fn"
        )

        generator.reset()
        generator.prepare_performance_notes(0, overlay_bars=0.0)
        generator.generate_performance_notes(
            start_time=0.0, time_window=1.0, greedy=True,
            rng=jax.random.PRNGKey(3), max_context_len=40, block_size=16,
        )
        greedy_rows = generator.perf_data.gen_seq.copy()
        n = min(len(pinned), len(greedy_rows))
        np.testing.assert_array_equal(pinned[:n], greedy_rows[:n])

    def test_logits_by_column_survives_key_sorting(self, generator):
        """logits_by_column must map by stream name even when the dict arrives
        with alphabetically sorted keys (the jit pytree order)."""
        import jax.numpy as jnp

        from scoreperformer_tpu.models.wrappers import logits_by_column

        num_tokens = generator.model.config.num_tokens
        scrambled = {k: jnp.zeros((1, v)) for k, v in sorted(num_tokens.items())}
        aligned = logits_by_column(generator.model, scrambled)
        assert [k for _, k, _ in aligned] == list(num_tokens)
        for (s, key, lg), (want_key, want_v) in zip(aligned, num_tokens.items()):
            assert key == want_key and lg.shape[-1] == want_v
