import numpy as np
import pytest

import jax
import jax.numpy as jnp

from scoreperformer_tpu.models.layers import alibi_slopes
from scoreperformer_tpu.ops.flash_attention import flash_attention_alibi
from scoreperformer_tpu.ops.sampling import filter_logits_and_sample, top_a, top_k, top_p


def ref_attention(q, k, v, slopes, mask, causal):
    b, h, tq, d = q.shape
    kh = jnp.broadcast_to(k, (b, h, k.shape[2], d))
    vh = jnp.broadcast_to(v, (b, h, v.shape[2], d))
    s = jnp.einsum("bhid,bhjd->bhij", q, kh) * (d**-0.5)
    i = jnp.arange(tq)[:, None]
    j = jnp.arange(k.shape[2])[None, :]
    s = s - slopes[None, :, None, None] * jnp.abs(j - i)[None, None]
    s = jnp.where(mask[:, None, None, :], s, -1e30)
    if causal:
        s = jnp.where((j <= i)[None, None], s, -1e30)
    return jnp.einsum("bhij,bhjd->bhid", jax.nn.softmax(s, -1), vh)


class TestFlashAttention:
    @pytest.mark.parametrize(
        "b,h,t,d,hk,causal",
        [
            (2, 4, 256, 64, 1, True),  # MQA causal (the flagship decoder shape)
            (2, 4, 200, 64, 4, False),  # full heads, ragged length, encoder
            (1, 2, 64, 32, 1, True),
        ],
    )
    def test_matches_reference(self, b, h, t, d, hk, causal):
        rng = np.random.RandomState(0)
        q = jnp.array(rng.randn(b, h, t, d), jnp.float32)
        k = jnp.array(rng.randn(b, hk, t, d), jnp.float32)
        v = jnp.array(rng.randn(b, hk, t, d), jnp.float32)
        slopes = alibi_slopes(h)
        mask = jnp.array(rng.rand(b, t) > 0.1).at[:, 0].set(True)

        expected = ref_attention(q, k, v, slopes, mask, causal)
        got = flash_attention_alibi(q, k, v, slopes, mask, causal=causal, interpret=True)
        np.testing.assert_allclose(np.array(expected), np.array(got), atol=1e-5)

    @pytest.mark.parametrize(
        "b,h,t,d,hk,causal",
        [
            (2, 2, 320, 32, 1, True),  # ragged: 3 q blocks x 3 kv blocks (padded)
            (1, 2, 256, 32, 2, False),
        ],
    )
    def test_gradients_match_reference(self, b, h, t, d, hk, causal):
        """Blocked backward kernels (dKV grid + dQ grid) vs autodiff of the
        reference math, incl. learned-ALiBi slope grads and MQA reduction."""
        rng = np.random.RandomState(2)
        q = jnp.array(rng.randn(b, h, t, d), jnp.float32)
        k = jnp.array(rng.randn(b, hk, t, d), jnp.float32)
        v = jnp.array(rng.randn(b, hk, t, d), jnp.float32)
        slopes = alibi_slopes(h)
        mask = jnp.array(rng.rand(b, t) > 0.1).at[:, 0].set(True)

        def ref_loss(q, k, v, slopes):
            out = ref_attention(q, k, v, slopes, mask, causal)
            return jnp.sum(out * jnp.cos(out))  # non-trivial cotangent

        def flash_loss(q, k, v, slopes):
            out = flash_attention_alibi(
                q, k, v, slopes, mask, causal=causal, interpret=True
            )
            return jnp.sum(out * jnp.cos(out))

        ref_grads = jax.grad(ref_loss, argnums=(0, 1, 2, 3))(q, k, v, slopes)
        got_grads = jax.grad(flash_loss, argnums=(0, 1, 2, 3))(q, k, v, slopes)
        for name, a, g in zip(("dq", "dk", "dv", "dslopes"), ref_grads, got_grads):
            np.testing.assert_allclose(
                np.array(a), np.array(g), atol=2e-4, rtol=2e-4, err_msg=name
            )

    def test_no_alibi(self):
        rng = np.random.RandomState(1)
        q = jnp.array(rng.randn(1, 2, 128, 32), jnp.float32)
        k = jnp.array(rng.randn(1, 1, 128, 32), jnp.float32)
        v = jnp.array(rng.randn(1, 1, 128, 32), jnp.float32)
        slopes = jnp.zeros(2)
        mask = jnp.ones((1, 128), bool)
        expected = ref_attention(q, k, v, slopes, mask, True)
        got = flash_attention_alibi(q, k, v, slopes, mask, causal=True, interpret=True)
        np.testing.assert_allclose(np.array(expected), np.array(got), atol=1e-5)


class TestSampling:
    def test_top_k_keeps_k_largest(self):
        logits = jnp.array([[1.0, 5.0, 3.0, 2.0, 4.0]])
        out = np.array(top_k(logits, k=2))
        assert np.isfinite(out[0, [1, 4]]).all()
        assert np.isinf(out[0, [0, 2, 3]]).all()

    def test_top_k_methods_agree(self):
        """All threshold methods bit-match at the defaults: "lax" and "sort"
        are exact by construction, and the default "approx" runs at
        recall_target=1.0, where the partial reduction keeps every candidate
        (TPU-verified in scripts/exp_post_merge.py; here the CPU lowering)."""
        r = np.random.RandomState(3)
        for V in (7, 128, 260):
            lg = jnp.asarray(r.randn(32, V).astype(np.float32))
            lg = jnp.concatenate([lg, lg[:, :3]], axis=-1)  # inject ties
            for k in (1, 2, max(1, V // 3)):
                a = top_k(lg, k=k, method="lax")
                assert jnp.array_equal(a, top_k(lg, k=k, method="sort")), (V, k)
                assert jnp.array_equal(a, top_k(lg, k=k, method="approx")), (V, k)
                assert jnp.array_equal(a, top_k(lg, k=k)), (V, k)  # default

    def test_top_p_keeps_nucleus(self):
        logits = jnp.log(jnp.array([[0.5, 0.3, 0.1, 0.05, 0.05]]))
        out = np.array(top_p(logits, thres=0.7))
        # 0.5 + 0.3 = 0.8 > 0.7, but exclusive-cum rule keeps both (reference
        # pads the removal mask by one)
        assert np.isfinite(out[0, 0]) and np.isfinite(out[0, 1])
        assert np.isinf(out[0, 2:]).all()

    def test_top_a(self):
        logits = jnp.log(jnp.array([[0.6, 0.3, 0.01, 0.09]]))
        out = np.array(top_a(logits, min_p_pow=2.0, min_p_ratio=0.1))
        # limit = 0.6^2 * 0.1 = 0.036 -> probs below are removed
        assert np.isfinite(out[0, 0]) and np.isfinite(out[0, 1])
        assert np.isinf(out[0, 2])

    def test_filter_and_sample_deterministic_peak(self):
        logits = jnp.array([[0.0, 20.0, 0.0]])
        sample = filter_logits_and_sample(jax.random.PRNGKey(0), logits, top_k, {"k": 1})
        assert int(sample[0]) == 1
        probs = filter_logits_and_sample(
            jax.random.PRNGKey(0), logits, top_k, {"k": 1}, sample=False
        )
        assert float(probs[0, 1]) > 0.999

    def test_traced_temperature_divides(self):
        # The static T=1 divide skip must not fire for a TRACED temperature
        # (RenderServer jits temperature as an argument): `!= 1.0` on a
        # tracer is not a Python bool. Regression for the serve-path break.
        from scoreperformer_tpu.ops.sampling import apply_temperature

        logits = jnp.array([[0.0, 2.0, 4.0, 1.0]])

        @jax.jit
        def probs(t):
            return jax.nn.softmax(apply_temperature(logits, t), axis=-1)

        hot = probs(jnp.float32(4.0))
        ref = jax.nn.softmax(logits / 4.0, axis=-1)
        np.testing.assert_allclose(np.asarray(hot), np.asarray(ref), rtol=1e-6)
        # static fast path still exact at T=1
        np.testing.assert_array_equal(
            np.asarray(apply_temperature(logits, 1.0)), np.asarray(logits)
        )

    def test_per_row_temperature(self):
        # coalesced server batches carry one temperature per request: a (b,)
        # array divides each batch row by its own T, at any logits rank
        from scoreperformer_tpu.ops.sampling import apply_temperature

        logits = jax.random.normal(jax.random.PRNGKey(0), (3, 4, 7))
        temps = jnp.array([1.0, 0.5, 2.0])
        out = jax.jit(apply_temperature)(logits, temps)
        for i in range(3):
            np.testing.assert_allclose(
                np.asarray(out[i]), np.asarray(logits[i]) / float(temps[i]),
                rtol=1e-6,
            )
        out2d = apply_temperature(logits[:, 0], temps)  # (b, V) rank too
        np.testing.assert_allclose(
            np.asarray(out2d), np.asarray(logits[:, 0]) / np.asarray(temps)[:, None],
            rtol=1e-6,
        )


def test_batched_topk_threshold_matches_streamwise():
    """The batched-sampling kmax trick: taking kmax candidates and reading
    each stream's own k-th value as its threshold keeps EXACTLY the same
    candidate set as per-stream top_k (models/wrappers.py fast path)."""
    import math

    import jax
    import numpy as np

    from scoreperformer_tpu.ops.sampling import top_k

    rng = np.random.RandomState(0)
    sizes = [12, 9, 30, 4]
    vmax = max(sizes)
    b = 5
    thres = 0.9
    NEG = -1e9

    lg = rng.randn(b, len(sizes), vmax).astype(np.float32) * 3
    for s, V in enumerate(sizes):
        lg[:, s, V:] = NEG  # padded columns

    k_s = [max(1, min(math.ceil((1 - thres) * V), V)) for V in sizes]
    kmax = max(k_s)
    vals = jax.lax.top_k(jnp.asarray(lg), kmax)[0]
    k_idx = jnp.asarray(np.array(k_s) - 1)
    kth = jnp.take_along_axis(
        vals, jnp.broadcast_to(k_idx[None, :, None], (b, len(sizes), 1)), axis=-1
    )
    batched_keep = np.asarray(lg >= np.asarray(kth))

    for s, V in enumerate(sizes):
        ref = np.asarray(top_k(jnp.asarray(lg[:, s, :V]), thres=thres))
        ref_keep = np.isfinite(ref)
        np.testing.assert_array_equal(batched_keep[:, s, :V], ref_keep, err_msg=f"stream {s}")


def test_write_kv_fallback_semantics():
    """ops/kv_cache.write_kv: dus fallback (CPU) matches .at[].set rows,
    including multi-row prefill writes and dtype casting."""
    import jax
    import numpy as np

    from scoreperformer_tpu.ops.kv_cache import _kernel_eligible, write_kv

    cache = jnp.zeros((10, 4, 8), jnp.float32)
    assert not _kernel_eligible(cache)  # CPU backend and/or small dims

    new = jnp.asarray(np.random.randn(1, 4, 8), jnp.float32)
    out = jax.jit(write_kv)(cache, new, 3)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(cache.at[3:4].set(new)))

    new3 = jnp.asarray(np.random.randn(3, 4, 8), jnp.float32)
    out = jax.jit(write_kv)(cache, new3, 6)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(cache.at[6:9].set(new3)))

    bf = jnp.zeros((10, 4, 8), jnp.bfloat16)
    out = jax.jit(write_kv)(bf, new, 0)
    assert out.dtype == jnp.bfloat16


def test_quantize_kv_rows_roundtrip():
    """Symmetric per-row int8 quantization: dequantized rows are within half
    a quantization step of the input, and all-zero rows stay exactly zero."""
    from scoreperformer_tpu.models.attention import quantize_kv_rows

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(6, 3, 16).astype(np.float32) * 4.0)
    q, s = quantize_kv_rows(x)
    assert q.dtype == jnp.int8 and s.shape == x.shape[:-1]
    deq = np.asarray(q, np.float32) * np.asarray(s)[..., None]
    step = np.asarray(s)[..., None]
    assert np.all(np.abs(deq - np.asarray(x)) <= 0.5 * step + 1e-7)

    zeros = jnp.zeros((2, 2, 8), jnp.float32)
    qz, sz = quantize_kv_rows(zeros)
    assert np.all(np.asarray(qz) == 0)
    deqz = np.asarray(qz, np.float32) * np.asarray(sz)[..., None]
    assert np.all(deqz == 0.0)


class TestMaskSelectAndSoftmaxLevers:
    """Scale-train tail levers (VERDICT r4 #2, models/attention.py):
    `fused_mask_select` must be BIT-identical (one where over the ANDed
    masks vs a chain of wheres with the same neg constant); `softmax_bf16`
    is a numerics-changing knob that must stay close and finite."""

    def _stack_and_batch(self, **attn_kwargs):
        from scoreperformer_tpu.models.transformer import (
            AttentionConfig,
            FeedForwardConfig,
            TransformerConfig,
            TransformerStack,
        )

        cfg = TransformerConfig(
            dim=32, depth=2, heads=2, causal=True,
            attention=AttentionConfig(
                dim_head=16, one_kv_head=True, alibi_pos_bias=True,
                alibi_learned=True, max_attend_past=24, **attn_kwargs,
            ),
            feed_forward=FeedForwardConfig(mult=2, glu=True, swish=True),
        )
        stack = TransformerStack(config=cfg)
        rng = np.random.RandomState(7)
        x = jnp.asarray(rng.randn(3, 20, 32), jnp.float32)
        mask = jnp.asarray(rng.rand(3, 20) > 0.15).at[:, 0].set(True)
        return stack, x, mask

    def test_fused_mask_select_bit_parity(self):
        base, x, mask = self._stack_and_batch()
        fused, _, _ = self._stack_and_batch(fused_mask_select=True)
        params = base.init({"params": jax.random.PRNGKey(0)}, x, mask=mask)["params"]
        out_base = base.apply({"params": params}, x, mask=mask)[0]
        out_fused = fused.apply({"params": params}, x, mask=mask)[0]
        assert (np.asarray(out_base) == np.asarray(out_fused)).all()

    def test_fused_mask_select_grad_bit_parity(self):
        base, x, mask = self._stack_and_batch()
        fused, _, _ = self._stack_and_batch(fused_mask_select=True)
        params = base.init({"params": jax.random.PRNGKey(1)}, x, mask=mask)["params"]

        def loss(stack):
            def f(p):
                out = stack.apply({"params": p}, x, mask=mask)[0]
                return jnp.sum(out**2)
            return f

        g_base = jax.grad(loss(base))(params)
        g_fused = jax.grad(loss(fused))(params)
        for a, b in zip(jax.tree.leaves(g_base), jax.tree.leaves(g_fused)):
            assert (np.asarray(a) == np.asarray(b)).all()

    def test_softmax_bf16_close_and_finite(self):
        base, x, mask = self._stack_and_batch()
        bf16, _, _ = self._stack_and_batch(softmax_bf16=True)
        params = base.init({"params": jax.random.PRNGKey(2)}, x, mask=mask)["params"]
        out_base = np.asarray(base.apply({"params": params}, x, mask=mask)[0])
        out_bf16 = np.asarray(bf16.apply({"params": params}, x, mask=mask)[0])
        assert np.isfinite(out_bf16).all()
        np.testing.assert_allclose(out_base, out_bf16, atol=0.15, rtol=0.1)
