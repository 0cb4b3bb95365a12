import numpy as np
import pytest

import jax
import jax.numpy as jnp

from scoreperformer_tpu.models import (
    ScorePerformerModel,
    TupleTransformerModule,
    build_scoreperformer_config,
)
from scoreperformer_tpu.models.factory import build_tuple_transformer_config

pytestmark = pytest.mark.slow

NUM_TOKENS = {
    "Bar": 20,
    "Position": 36,
    "Pitch": 24,
    "Velocity": 16,
    "Duration": 20,
    "Tempo": 12,
    "TimeSig": 8,
    "RelOnsetDev": 21,
    "RelPerfDuration": 17,
}
SCORE_TOKENS = {k: v for k, v in NUM_TOKENS.items() if not k.startswith("Rel")}


def token_values():
    return {k: np.linspace(0, 1, v).tolist() for k, v in NUM_TOKENS.items()}


def emb_cfg(target="simple", **kw):
    cfg = {
        "_target_": target,
        "emb_dims": 16,
        "mode": "cat",
        "emb_norm": True,
        "discrete": False,
        "continuous": True,
        "continuous_dense": True,
        "discrete_ids": [0, 1, 2, 3],
        "token_values": token_values(),
    }
    cfg.update(kw)
    return cfg


ATTN = {"dim_head": 8, "one_kv_head": True, "alibi_pos_bias": True, "alibi_learned": True}
FF = {"mult": 2, "glu": True, "swish": True}


def model_config(dim=32):
    return {
        "num_tokens": NUM_TOKENS,
        "num_score_tokens": SCORE_TOKENS,
        "dim": dim,
        "tie_token_emb": True,
        "mode": "mixlm",
        "score_encoder": {
            "token_embeddings": emb_cfg(),
            "emb_norm": True,
            "use_abs_pos_emb": False,
            "max_seq_len": 64,
            "transformer": {
                "_target_": "encoder", "depth": 1, "heads": 2,
                "attention": ATTN, "feed_forward": FF,
            },
        },
        "perf_encoder": {
            "token_embeddings": emb_cfg(),
            "emb_norm": True,
            "use_abs_pos_emb": False,
            "max_seq_len": 64,
            "latent_dim": [8, 6, 4, 2],
            "aggregate_mode": ["mean", "bar_mean", "beat_mean", "onset_mean"],
            "latent_dropout": [0.0, 0.1, 0.2, 0.4],
            "hierarchical": True,
            "inclusive_latent_dropout": True,
            "deadpan_zero_latent": True,
            "max_segments": 24,
            "transformer": {
                "_target_": "encoder", "depth": 1, "heads": 2,
                "attention": ATTN, "feed_forward": FF,
            },
        },
        "perf_decoder": {
            "token_embeddings": emb_cfg("multi-seq", multiseq_mode="post-cat"),
            "emb_norm": True,
            "use_abs_pos_emb": False,
            "max_seq_len": 64,
            "context_emb_mode": "cat",
            "style_emb_mode": "adanorm",
            "transformer": {
                "_target_": "decoder", "depth": 2, "heads": 2,
                "attention": ATTN, "feed_forward": FF,
            },
            "lm_head": {"_target_": "lm-tied"},
        },
        "classifiers": {
            "num_classes": {"dynamics": 3, "tempo": 4},
            "classifier": {"hidden_dims": [], "dropout": 0.2},
            "weighted_classes": True,
            "detach_inputs": True,
            "class_samples": {"dynamics": [10, 5, 3], "tempo": [4, 4, 4, 4]},
        },
    }


def make_batch(b=2, t=16, seed=0):
    rng = np.random.RandomState(seed)

    def rand(nt):
        return jnp.array(np.stack([rng.randint(4, v, (b, t)) for v in nt.values()], -1))

    perf, score = rand(NUM_TOKENS), rand(SCORE_TOKENS)
    masked_perf = perf.at[..., -2:].set(1)
    labels = np.full((b, t, len(NUM_TOKENS)), -100)
    labels[..., 3] = np.array(perf[..., 3])
    labels[..., -2:] = np.array(perf[..., -2:])
    return dict(
        perf=perf,
        score=score,
        masked_perf=masked_perf,
        labels=jnp.array(labels),
        mask=jnp.ones((b, t), bool),
        bars=jnp.array(np.sort(rng.randint(4, 10, (b, t)), 1)),
        beats=jnp.array(np.sort(rng.randint(4, 20, (b, t)), 1)),
        onsets=jnp.array(np.sort(rng.randint(4, 24, (b, t)), 1)),
        deadpan=jnp.array([False, True][:b] if b <= 2 else [False] * b),
        directions=jnp.array(
            np.stack([rng.randint(0, 3, (b, t)), rng.randint(0, 4, (b, t))], -1)
        ),
    )


@pytest.fixture(scope="module")
def sp_model():
    cfg = build_scoreperformer_config(model_config())
    model = ScorePerformerModel(config=cfg)
    batch = make_batch()
    rngs = {
        "params": jax.random.PRNGKey(0),
        "dropout": jax.random.PRNGKey(1),
        "latent_dropout": jax.random.PRNGKey(2),
        "mmd": jax.random.PRNGKey(3),
    }
    variables = model.init(
        rngs,
        batch["perf"],
        perf_mask=batch["mask"],
        score=batch["score"],
        score_mask=batch["mask"],
        masked_perf=batch["masked_perf"],
        labels=batch["labels"],
        bars=batch["bars"],
        beats=batch["beats"],
        onsets=batch["onsets"],
        directions=batch["directions"],
        deadpan_mask=batch["deadpan"],
    )
    return model, variables, batch


class TestTupleTransformer:
    def test_forward_and_tied_head(self):
        nt = {"Bar": 20, "Position": 36, "Pitch": 24}
        cfg = build_tuple_transformer_config(
            {
                "dim": 32,
                "token_embeddings": {
                    "_target_": "simple",
                    "emb_dims": 16,
                    "mode": "cat",
                    "discrete": True,
                    "continuous": False,
                },
                "use_abs_pos_emb": True,
                "max_seq_len": 64,
                "transformer": {"_target_": "encoder", "depth": 1, "heads": 2,
                                "attention": {"dim_head": 8}},
                "lm_head": {"_target_": "lm-tied"},
            }
        )
        m = TupleTransformerModule(num_tokens=nt, config=cfg)
        x = jnp.array(np.random.RandomState(0).randint(4, 20, (2, 8, 3)))
        v = m.init(jax.random.PRNGKey(0), x)
        out = m.apply(v, x)
        assert out.hidden_state.shape == (2, 8, 32)
        assert out.logits["Bar"].shape == (2, 8, 20)
        assert out.logits["Position"].shape == (2, 8, 36)
        assert np.isfinite(np.array(out.logits["Pitch"])).all()

    def test_tied_head_batched_matches_dict(self, sp_model):
        """Batched (S, Vmax) tied-head logits slice back to the per-stream
        dict exactly (padded table rows are zero, cols beyond V_s unused)."""
        model, variables, _ = sp_model
        hidden = jnp.asarray(np.random.RandomState(3).randn(2, 5, 32).astype(np.float32))
        d = model.apply(variables, hidden,
                        method=lambda m, h: m.perf_decoder.apply_lm_head(h))
        b = model.apply(variables, hidden,
                        method=lambda m, h: m.perf_decoder.apply_lm_head(h, batched=True))
        assert b.shape == (2, 5, len(NUM_TOKENS), max(NUM_TOKENS.values()))
        for s, (key, V) in enumerate(NUM_TOKENS.items()):
            np.testing.assert_allclose(
                np.asarray(b[..., s, :V]), np.asarray(d[key]), atol=2e-5, err_msg=key
            )

    def test_padding_token_zero_embedding(self):
        from scoreperformer_tpu.models.embeddings import StreamEmbedding

        emb = StreamEmbedding(num_embeddings=10, embedding_dim=8)
        v = emb.init(jax.random.PRNGKey(0), jnp.zeros((2, 3), jnp.int32))
        table = emb.apply(v, method="table")
        assert np.allclose(np.array(table[0]), 0.0)
        assert not np.allclose(np.array(table[1]), 0.0)


class TestScorePerformer:
    def test_forward_losses(self, sp_model):
        model, variables, batch = sp_model
        out = model.apply(
            variables,
            batch["perf"],
            perf_mask=batch["mask"],
            score=batch["score"],
            score_mask=batch["mask"],
            masked_perf=batch["masked_perf"],
            labels=batch["labels"],
            bars=batch["bars"],
            beats=batch["beats"],
            onsets=batch["onsets"],
            directions=batch["directions"],
            deadpan_mask=batch["deadpan"],
            deterministic=False,
            rngs={
                "dropout": jax.random.PRNGKey(1),
                "latent_dropout": jax.random.PRNGKey(2),
                "mmd": jax.random.PRNGKey(3),
            },
        )
        assert np.isfinite(float(out.loss))
        for key in ("MMD", "clf", "loss/lm", "MMD/bar_mean", "loss/Velocity"):
            assert key in out.losses
        # decoder shift: logits have T-1 positions
        assert out.perf_decoder.logits["Velocity"].shape == (2, 15, 16)
        # style embeddings dim = sum latent dims
        assert out.perf_encoder.embeddings.shape[-1] == 20

    def test_lm_losses_onehot_path_bitmatches_gather(self):
        # ONEHOT_CE computes the CE numerator as a one-hot contraction; it
        # must be bit-identical to the take_along_axis gather, grads included.
        from scoreperformer_tpu.models import scoreperformer as sp

        rng = np.random.RandomState(0)
        logits = {
            k: jnp.asarray(rng.randn(3, 11, v).astype(np.float32) * 3)
            for k, v in {"a": 31, "b": 130, "c": 7}.items()
        }
        labels = rng.randint(0, 7, (3, 11, 3))
        labels[rng.rand(3, 11, 3) < 0.3] = -100
        labels = jnp.asarray(labels)

        def run(flag):
            old = sp.ONEHOT_CE
            sp.ONEHOT_CE = flag
            try:
                loss, streams = jax.jit(sp.lm_losses)(logits, labels)
                grads = jax.grad(lambda lg: sp.lm_losses(lg, labels)[0])(logits)
            finally:
                sp.ONEHOT_CE = old
            return loss, streams, grads

        l1, s1, g1 = run(True)
        l0, s0, g0 = run(False)
        assert float(l1) == float(l0)
        for k in s1:
            assert float(s1[k]) == float(s0[k])
        for k in g1:
            np.testing.assert_array_equal(np.asarray(g1[k]), np.asarray(g0[k]))

    def test_glu_two_dot_bitmatches_split(self):
        # GLU_TWO_DOT computes the GLU input projection as two half-kernel
        # matmuls; params, forward, and grads must bit-match the Dense+split
        # form (and the param tree must stay checkpoint-compatible).
        from scoreperformer_tpu.models import layers as L

        x = jnp.asarray(np.random.RandomState(0).randn(4, 9, 32).astype(np.float32))
        ff = L.FeedForward(dim=32, mult=4, glu=True, swish=True)

        def run(flag):
            old = L.GLU_TWO_DOT
            L.GLU_TWO_DOT = flag
            try:
                variables = ff.init(jax.random.PRNGKey(0), x)
                y = ff.apply(variables, x)
                g = jax.grad(lambda v: ff.apply(v, x).sum())(variables)
            finally:
                L.GLU_TWO_DOT = old
            return variables, y, g

        v1, y1, g1 = run(True)
        v0, y0, g0 = run(False)
        assert jax.tree.structure(v1) == jax.tree.structure(v0)
        for a, b in zip(jax.tree.leaves(v1), jax.tree.leaves(v0)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        np.testing.assert_array_equal(np.asarray(y1), np.asarray(y0))
        for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g0)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_alibi_dbias_dot_matches_reduce(self):
        # ALIBI_DBIAS_DOT computes d(bias) of the broadcast add as a
        # dot_general against a ones vector instead of a reduce_sum over
        # batch. Forward and d(dots) must bit-match; d(bias) sums the same
        # terms in a different (contraction) order, so it is compared to
        # float tolerance — the same reassociation class as the one-hot
        # lookup backward.
        from scoreperformer_tpu.models import attention as A

        rng = np.random.RandomState(0)
        dots = jnp.asarray(rng.randn(6, 4, 9, 9).astype(np.float32))
        bias = jnp.asarray(rng.randn(4, 9, 9).astype(np.float32))
        cot = jnp.asarray(rng.randn(6, 4, 9, 9).astype(np.float32))

        def run(flag):
            old = A.ALIBI_DBIAS_DOT
            A.ALIBI_DBIAS_DOT = flag
            try:
                y, vjp = jax.vjp(A.add_alibi_bias, dots, bias)
                dd, db = vjp(cot)
            finally:
                A.ALIBI_DBIAS_DOT = old
            return y, dd, db

        y1, dd1, db1 = run(True)
        y0, dd0, db0 = run(False)
        np.testing.assert_array_equal(np.asarray(y1), np.asarray(y0))
        np.testing.assert_array_equal(np.asarray(dd1), np.asarray(dd0))
        np.testing.assert_allclose(np.asarray(db1), np.asarray(db0), rtol=2e-6, atol=2e-6)

    def test_deadpan_embeddings_not_dropped(self, sp_model):
        model, variables, batch = sp_model
        out = model.apply(
            variables,
            batch["perf"],
            perf_mask=batch["mask"],
            score=batch["score"],
            score_mask=batch["mask"],
            masked_perf=batch["masked_perf"],
            bars=batch["bars"],
            beats=batch["beats"],
            onsets=batch["onsets"],
            deadpan_mask=batch["deadpan"],
            deterministic=False,
            compute_loss=False,
            rngs={
                "dropout": jax.random.PRNGKey(1),
                "latent_dropout": jax.random.PRNGKey(5),
                "mmd": jax.random.PRNGKey(3),
            },
        )
        # deadpan sample (index 1): dropout mask must be all False
        assert not bool(np.array(out.perf_encoder.dropout_mask[1]).any())

    def test_grad_flows(self, sp_model):
        model, variables, batch = sp_model

        def loss_fn(params):
            out = model.apply(
                {"params": params},
                batch["perf"],
                perf_mask=batch["mask"],
                score=batch["score"],
                score_mask=batch["mask"],
                masked_perf=batch["masked_perf"],
                labels=batch["labels"],
                bars=batch["bars"],
                beats=batch["beats"],
                onsets=batch["onsets"],
                directions=batch["directions"],
                deadpan_mask=batch["deadpan"],
                deterministic=True,
                rngs={"mmd": jax.random.PRNGKey(3)},
            )
            return out.loss

        grads = jax.grad(loss_fn)(variables["params"])
        flat = jax.tree.leaves(grads)
        assert all(np.isfinite(np.array(g)).all() for g in flat)
        # some gradient must be nonzero
        assert any(float(jnp.abs(g).max()) > 0 for g in flat)


class TestDecodeCacheParity:
    def test_incremental_matches_full(self, sp_model):
        """Feeding the decoder token-by-token with a static cache must match
        the full (uncached) forward exactly."""
        model, variables, batch = sp_model
        b, t = 2, 16

        # build encoder outputs once
        score_emb, perf_emb, _ = model.apply(
            variables,
            batch["perf"],
            batch["mask"],
            batch["score"],
            batch["mask"],
            batch["bars"],
            batch["beats"],
            batch["onsets"],
            method="encode_embeddings",
            rngs={"mmd": jax.random.PRNGKey(3)},
        )

        seq = batch["perf"][:, :-1]
        masked = batch["masked_perf"][:, 1:]
        style = perf_emb[:, 1:]
        ctx = score_emb[:, 1:]

        full = model.apply(
            variables, seq, masked_tokens=masked, style_embeddings=style,
            context=ctx, method="decode_step",
        )

        caches = model.apply(variables, b, t, method=lambda m, bb, tt: m.init_decoder_cache(bb, tt))
        hiddens = []
        for j in range(seq.shape[1]):
            out = model.apply(
                variables,
                seq[:, j : j + 1],
                masked_tokens=masked[:, j : j + 1],
                style_embeddings=style[:, j : j + 1],
                context=ctx[:, j : j + 1],
                caches=caches,
                cache_index=j,
                method="decode_step",
            )
            caches = out.caches
            hiddens.append(out.hidden_state[:, 0])
        inc = jnp.stack(hiddens, axis=1)

        np.testing.assert_allclose(np.array(full.hidden_state), np.array(inc), atol=1e-5)


class TestWrappers:
    def test_ar_generate_constraints(self, sp_model):
        from scoreperformer_tpu.models.wrappers import ar_generate

        model, variables, batch = sp_model
        start = batch["perf"][:, :4]
        T = 16
        style = jnp.zeros((2, T + 1, 20))
        ctx = jnp.zeros((2, T + 1, 32))
        gen, num = ar_generate(
            model, variables, start, seq_len=T, rng=jax.random.PRNGKey(0),
            style_embeddings=style, context=ctx, greedy=True,
            stream_names=list(NUM_TOKENS.keys()),
        )
        gen = np.array(gen)
        assert gen.shape == (2, T - 3, len(NUM_TOKENS))
        start_np = np.array(start)
        for bi in range(2):
            n = int(num[bi])
            # constraint applies to each generated token vs its predecessor
            prev_bars = np.concatenate([start_np[bi, -1:, 0], gen[bi, : n - 1, 0]])
            gen_bars = gen[bi, :n, 0]
            live = gen_bars != 3  # EOS exempt
            assert ((gen_bars >= prev_bars) | ~live).all(), (prev_bars, gen_bars)
            # TimeSig copies forward from the previous token
            prev_ts = np.concatenate([start_np[bi, -1:, 6], gen[bi, : n - 1, 6]])
            assert ((gen[bi, :n, 6] == prev_ts) | ~live).all()

    def test_ar_generate_chunked_matches_classic(self, sp_model):
        """When the sequence fits the window, ar_generate's chunked-carry
        scan must emit exactly the classic scan's tokens (divisible and
        padded chunk counts)."""
        from scoreperformer_tpu.models.wrappers import ar_generate

        model, variables, batch = sp_model
        start = batch["perf"][:, :4]
        T = 16
        kwargs = dict(
            rng=jax.random.PRNGKey(0),
            style_embeddings=jnp.zeros((2, T + 1, 20)),
            context=jnp.zeros((2, T + 1, 32)),
            greedy=True, stream_names=list(NUM_TOKENS.keys()),
        )
        classic, num_c = ar_generate(
            model, variables, start, seq_len=T, chunk_size=None, **kwargs
        )
        for chunk in (13, 5, 16):
            gen, num = ar_generate(
                model, variables, start, seq_len=T, chunk_size=chunk, **kwargs
            )
            np.testing.assert_array_equal(np.array(gen), np.array(classic),
                                          err_msg=f"chunk={chunk}")
            np.testing.assert_array_equal(np.array(num), np.array(num_c))

    def test_ar_generate_sliding_window(self, sp_model):
        """Ring-cache windowed generation (reference wrappers.py:236-237).

        Generating 4x the window with a cache bounded at `max_seq_len`:
        in-vocab ids, Bar monotone across window wraps, and bit-identical to
        the unbounded cache while the consumed context still fits the window.
        """
        from scoreperformer_tpu.models.wrappers import ar_generate

        model, variables, batch = sp_model
        start = batch["perf"][:, :4]
        W = 12
        T = 4 * W
        style = jnp.zeros((2, T + 1, 20))
        ctx = jnp.zeros((2, T + 1, 32))
        kwargs = dict(
            rng=jax.random.PRNGKey(0), style_embeddings=style, context=ctx,
            greedy=True, stream_names=list(NUM_TOKENS.keys()),
        )
        gen_w, num_w = ar_generate(
            model, variables, start, seq_len=T, max_seq_len=W, **kwargs
        )
        gen_f, _ = ar_generate(model, variables, start, seq_len=T, **kwargs)
        gen_w, gen_f = np.array(gen_w), np.array(gen_f)
        assert gen_w.shape == (2, T - 3, len(NUM_TOKENS))

        vocab = np.array(list(NUM_TOKENS.values()))
        start_np = np.array(start)
        for bi in range(2):
            n = int(num_w[bi])
            live = gen_w[bi, :n, 0] != 3
            assert (gen_w[bi, :n] < vocab[None, :]).all()
            prev_bars = np.concatenate([start_np[bi, -1:, 0], gen_w[bi, : n - 1, 0]])
            assert ((gen_w[bi, :n, 0] >= prev_bars) | ~live).all()
        # identical prefix while context fits: position L consumes index L-2,
        # so everything up to absolute position W+1 matches the full cache
        n_same = W + 2 - start.shape[1]
        np.testing.assert_array_equal(gen_w[:, :n_same], gen_f[:, :n_same])

    def test_mixedlm_unmask_batched_path_matches_streamwise(self, sp_model, monkeypatch):
        """The fused (batched head + batched sampling) fast path must emit
        exactly the per-stream path's tokens under greedy decoding."""
        import scoreperformer_tpu.models.wrappers as W
        from scoreperformer_tpu.models.wrappers import mixedlm_unmask

        model, variables, batch = sp_model
        tokens = batch["perf"].at[:, 1:, -2:].set(1)
        kwargs = dict(
            rng=jax.random.PRNGKey(0),
            style_embeddings=jnp.zeros((2, 16, 20)),
            context=jnp.zeros((2, 16, 32)),
            greedy=True,
        )
        monkeypatch.setattr(W, "BATCHED_SAMPLING", True)
        fast = np.array(mixedlm_unmask(model, variables, tokens,
                                       batch["masked_perf"], **kwargs))
        monkeypatch.setattr(W, "BATCHED_SAMPLING", False)
        slow = np.array(mixedlm_unmask(model, variables, tokens,
                                       batch["masked_perf"], **kwargs))
        np.testing.assert_array_equal(fast, slow)

    def test_mixedlm_unmask_chunked_matches_classic(self, sp_model):
        """The chunked-carry decode (small carried fresh-KV buffers + frozen
        prefix operand) must emit the classic scan's tokens, including with a
        chunk size that does not divide the step count (padded tail)."""
        from scoreperformer_tpu.models.wrappers import mixedlm_unmask

        model, variables, batch = sp_model
        tokens = batch["perf"].at[:, 1:, -2:].set(1)
        kwargs = dict(
            rng=jax.random.PRNGKey(0),
            style_embeddings=jnp.zeros((2, 16, 20)),
            context=jnp.zeros((2, 16, 32)),
            greedy=True,
        )
        classic = np.array(
            mixedlm_unmask(model, variables, tokens, batch["masked_perf"], **kwargs)
        )
        for chunk in (8, 5, 16):
            chunked = np.array(
                mixedlm_unmask(
                    model, variables, tokens, batch["masked_perf"],
                    chunk_size=chunk, **kwargs,
                )
            )
            np.testing.assert_array_equal(chunked, classic, err_msg=f"chunk={chunk}")

        # static-prefix variant (unrolled chunks, per-chunk static prefix
        # slices) must also match
        static = np.array(
            mixedlm_unmask(
                model, variables, tokens, batch["masked_perf"],
                chunk_size=8, static_prefix=True, **kwargs,
            )
        )
        np.testing.assert_array_equal(static, classic)

        # unrolled outer loop WITHOUT prefix slicing (in-place-merge variant),
        # incl. a chunk size that does not divide the step count
        for chunk in (8, 5):
            unrolled = np.array(
                mixedlm_unmask(
                    model, variables, tokens, batch["masked_perf"],
                    chunk_size=chunk, unrolled_chunks=True, **kwargs,
                )
            )
            np.testing.assert_array_equal(unrolled, classic, err_msg=f"chunk={chunk}")

        # staged-capacity variant: G sequential outer scans over growing
        # prefix buffers, incl. a stage count that does not divide the chunk
        # count and a non-dividing chunk size
        for chunk, stages in ((8, 2), (5, 3)):
            staged = np.array(
                mixedlm_unmask(
                    model, variables, tokens, batch["masked_perf"],
                    chunk_size=chunk, capacity_stages=stages, **kwargs,
                )
            )
            np.testing.assert_array_equal(
                staged, classic, err_msg=f"chunk={chunk} stages={stages}"
            )

    def test_mixedlm_unmask_sample_dims_bit_parity(self, sp_model):
        """Restricting the per-step filter+sample to the streams the caller
        masked (`sample_dims`) must be BIT-identical to the full path —
        greedy AND sampled (the per-stream rng split is index-preserved) —
        on both the chunked and classic scans."""
        from scoreperformer_tpu.models.wrappers import mixedlm_unmask

        model, variables, batch = sp_model
        S = batch["perf"].shape[-1]
        dims = (S - 2, S - 1)
        tokens = batch["perf"].at[:, 1:, -2:].set(1)
        base = dict(
            rng=jax.random.PRNGKey(3),
            style_embeddings=jnp.zeros((2, 16, 20)),
            context=jnp.zeros((2, 16, 32)),
        )
        for greedy in (True, False):
            for chunk in (16, None):
                full = np.array(
                    mixedlm_unmask(
                        model, variables, tokens, batch["masked_perf"],
                        greedy=greedy, chunk_size=chunk, **base,
                    )
                )
                slim = np.array(
                    mixedlm_unmask(
                        model, variables, tokens, batch["masked_perf"],
                        greedy=greedy, chunk_size=chunk, sample_dims=dims, **base,
                    )
                )
                np.testing.assert_array_equal(
                    slim, full, err_msg=f"greedy={greedy} chunk={chunk}"
                )
                assert (slim != np.array(tokens)).any()

    def test_mixedlm_unmask_int8_cache(self, sp_model):
        """int8-quantized prefix caches (per-row scales folded into the
        attend): trajectories are not guaranteed bit-stable vs fp32, but at
        these dims the greedy decode must agree almost everywhere and every
        filled position must be a real token (not MASK/PAD)."""
        from scoreperformer_tpu.models.wrappers import mixedlm_unmask

        model, variables, batch = sp_model
        tokens = batch["perf"].at[:, 1:, -2:].set(1)
        kwargs = dict(
            rng=jax.random.PRNGKey(0),
            style_embeddings=jnp.zeros((2, 16, 20)),
            context=jnp.zeros((2, 16, 32)),
            greedy=True,
        )
        classic = np.array(
            mixedlm_unmask(model, variables, tokens, batch["masked_perf"], **kwargs)
        )
        filled = np.array(tokens == 1)
        for extra in ({"chunk_size": 8}, {"chunk_size": 5},
                      {"chunk_size": 8, "capacity_stages": 2}):
            q = np.array(
                mixedlm_unmask(
                    model, variables, tokens, batch["masked_perf"],
                    cache_dtype=jnp.int8, **extra, **kwargs,
                )
            )
            assert np.all((q[filled] != 1) & (q[filled] != 0)), extra
            agree = (q[filled] == classic[filled]).mean()
            assert agree >= 0.95, (extra, agree)
        # untouched positions must be byte-identical
        np.testing.assert_array_equal(q[~filled], classic[~filled])

        # the classic scan cannot quantize (guard)
        with pytest.raises(AssertionError):
            mixedlm_unmask(
                model, variables, tokens, batch["masked_perf"],
                cache_dtype=jnp.int8, chunk_size=None, **kwargs,
            )

    def test_mixedlm_unmask_valid_len_semantics(self, sp_model):
        """Per-row valid_len (the render server's padded-bucket contract):
        positions >= valid_len stay untouched, and the decoded prefix of a
        padded row bit-matches decoding the truncated sequence — the extra
        padded steps run but are causally invisible to the real positions."""
        from scoreperformer_tpu.models.wrappers import mixedlm_unmask

        model, variables, batch = sp_model
        tokens = batch["perf"].at[:, 1:, -2:].set(1)
        v = 9
        out = np.array(
            mixedlm_unmask(
                model, variables, tokens, batch["masked_perf"],
                rng=jax.random.PRNGKey(0),
                style_embeddings=jnp.zeros((2, 16, 20)),
                context=jnp.zeros((2, 16, 32)),
                greedy=True,
                valid_len=jnp.array([16, v], dtype=jnp.int32),
            )
        )
        np.testing.assert_array_equal(out[1, v:], np.array(tokens)[1, v:])
        short = np.array(
            mixedlm_unmask(
                model, variables, tokens[:, :v], batch["masked_perf"][:, :v],
                rng=jax.random.PRNGKey(0),
                style_embeddings=jnp.zeros((2, v, 20)),
                context=jnp.zeros((2, v, 32)),
                greedy=True,
            )
        )
        np.testing.assert_array_equal(out[1, :v], short[1])

    def test_mixedlm_unmask_chunked_row_and_mixed_variants(self, sp_model):
        from scoreperformer_tpu.models.wrappers import mixedlm_unmask

        model, variables, batch = sp_model
        tokens = batch["perf"].at[:, 1:, -2:].set(1)
        kwargs = dict(
            rng=jax.random.PRNGKey(0),
            style_embeddings=jnp.zeros((2, 16, 20)),
            context=jnp.zeros((2, 16, 32)),
            greedy=True,
        )
        classic = np.array(
            mixedlm_unmask(model, variables, tokens, batch["masked_perf"], **kwargs)
        )

        # chunked token rows (small (C+1, b, S) carried row buffer), incl. a
        # padded tail chunk — regression guard for the padded-tail rewrite,
        # which must read back the CURRENT last token, not the pre-decode one
        for chunk in (8, 5):
            rows = np.array(
                mixedlm_unmask(
                    model, variables, tokens, batch["masked_perf"],
                    chunk_size=chunk, chunk_tokens=True, **kwargs,
                )
            )
            np.testing.assert_array_equal(rows, classic, err_msg=f"chunk={chunk}")

        # mixed-precision caches (bf16 prefix / fp32 fresh): near-total greedy
        # agreement — bf16 rounding may flip rare argmax ties
        mixed = np.array(
            mixedlm_unmask(
                model, variables, tokens, batch["masked_perf"],
                chunk_size=8, cache_dtype=jnp.bfloat16, fresh_dtype=jnp.float32,
                **kwargs,
            )
        )
        assert (mixed == classic).mean() > 0.97

    def test_mixedlm_unmask_fills_masks(self, sp_model):
        from scoreperformer_tpu.models.wrappers import mixedlm_unmask

        model, variables, batch = sp_model
        tokens = batch["perf"].at[:, 1:, -2:].set(1)  # mask perf streams
        out = mixedlm_unmask(
            model,
            variables,
            tokens,
            batch["masked_perf"],
            rng=jax.random.PRNGKey(0),
            style_embeddings=jnp.zeros((2, 16, 20)),
            context=jnp.zeros((2, 16, 32)),
            greedy=True,
        )
        out = np.array(out)
        assert not (out == 1).any()  # all masks filled
        # unmasked streams untouched
        np.testing.assert_array_equal(out[..., :7], np.array(batch["perf"][..., :7]))
