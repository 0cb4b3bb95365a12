"""Mixture-of-Experts routing + expert parallelism (models/moe.py).

No reference analogue (SURVEY §2.8 lists expert parallelism as absent in
ilya16/ScorePerformer); these tests pin the GShard-style dense-dispatch
semantics: slot-major capacity priority, overflow dropping, gate
renormalization, padding-mask handling, aux-loss values, and EP-sharded
equivalence on a virtual expert mesh.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from scoreperformer_tpu.models.moe import MoEFeedForward
from scoreperformer_tpu.models.transformer import (
    AttentionConfig,
    FeedForwardConfig,
    TransformerConfig,
    TransformerStack,
)
from scoreperformer_tpu.parallel import make_mesh, params_shardings
from scoreperformer_tpu.parallel.mesh import EXPERT_AXIS, expert_parallel


def init_moe(module, x, seed=0):
    variables = module.init({"params": jax.random.PRNGKey(seed)}, x)
    return variables["params"]


def expert_mlp(params, e, t, glu=False, swish=False):
    """One expert applied to one token (numpy oracle)."""
    act = jax.nn.silu if swish else jax.nn.gelu
    h = t @ params["wi"][e]
    if glu:
        h, g = np.split(np.asarray(h), 2, axis=-1)
        h = h * np.asarray(act(jnp.asarray(g)))
    else:
        h = np.asarray(act(jnp.asarray(h)))
    return h @ params["wo"][e]


def routing_oracle(params, x, E, K, glu=False, swish=False):
    """Token-by-token dense routing with unlimited capacity."""
    x = np.asarray(x, np.float32)
    logits = x @ np.asarray(params["router"], np.float32)
    probs = np.asarray(jax.nn.softmax(jnp.asarray(logits), axis=-1))
    y = np.zeros_like(x)
    for b in range(x.shape[0]):
        for s in range(x.shape[1]):
            order = np.argsort(-probs[b, s], kind="stable")[:K]
            gates = probs[b, s][order]
            gates = gates / gates.sum()
            for g, e in zip(gates, order):
                y[b, s] += g * expert_mlp(params, e, x[b, s], glu, swish)
    return y


class TestRoutingSemantics:
    def test_matches_oracle_with_ample_capacity(self):
        """With capacity >= every token's K choices, the static-shape dense
        dispatch must equal naive per-token routing (covers dispatch/combine
        plumbing AND gate renormalization)."""
        E, K, B, S, D = 4, 2, 2, 8, 16
        module = MoEFeedForward(
            dim=D, num_experts=E, top_k=K, capacity_factor=float(E), mult=2,
            glu=True, swish=True,
        )
        x = jax.random.normal(jax.random.PRNGKey(1), (B, S, D))
        params = init_moe(module, x)
        y = module.apply({"params": params}, x, mutable=["losses"])[0]
        expected = routing_oracle(params, x, E, K, glu=True, swish=True)
        np.testing.assert_allclose(np.asarray(y), expected, atol=1e-5, rtol=1e-4)

    def test_capacity_overflow_drops_late_tokens(self):
        """All tokens route to expert 0 (uniform router, top_k tie -> lowest
        index); capacity 1 keeps only the first token in sequence order."""
        E, B, S, D = 2, 2, 4, 8
        module = MoEFeedForward(
            dim=D, num_experts=E, top_k=1, capacity_factor=0.5, mult=1,
        )
        x = jax.random.normal(jax.random.PRNGKey(2), (B, S, D))
        params = dict(init_moe(module, x))
        params["router"] = jnp.zeros_like(params["router"])
        y = np.asarray(module.apply({"params": params}, x, mutable=["losses"])[0])
        assert np.abs(y[:, 0]).max() > 1e-4  # token 0 processed
        np.testing.assert_array_equal(y[:, 1:], 0.0)  # overflow dropped

    def test_slot_major_priority(self):
        """First choices are placed before ANY second choice: a later token's
        first choice wins expert capacity over an earlier token's second
        choice (GShard ordering). Token-major placement would drop it."""
        E, K, B, S, D = 2, 2, 1, 4, 8
        # capacity = ceil(K*S*cf/E) = ceil(2*4*0.5/2) = 2
        module = MoEFeedForward(
            dim=D, num_experts=E, top_k=K, capacity_factor=0.5, mult=1,
        )
        # tokens 0,1 prefer expert 0; tokens 2,3 prefer expert 1
        x = np.zeros((B, S, D), np.float32)
        x[0, 0, 0] = x[0, 1, 0] = 1.0
        x[0, 2, 1] = x[0, 3, 1] = 1.0
        x = jnp.asarray(x)
        params = dict(init_moe(module, x))
        router = np.zeros((D, E), np.float32)
        router[0, 0] = 4.0  # feature 0 -> expert 0
        router[1, 1] = 4.0  # feature 1 -> expert 1
        params["router"] = jnp.asarray(router)

        y = np.asarray(module.apply({"params": params}, x, mutable=["losses"])[0])
        # every token's FIRST choice is kept (capacity 2 per expert, 2 tokens
        # per expert as first choice); second choices all overflow
        probs = np.asarray(jax.nn.softmax(x @ params["router"], axis=-1))
        for s, first in [(0, 0), (1, 0), (2, 1), (3, 1)]:
            gates = np.sort(probs[0, s])[::-1]
            gates = gates / gates.sum()
            expected = gates[0] * expert_mlp(params, first, np.asarray(x)[0, s])
            np.testing.assert_allclose(y[0, s], expected, atol=1e-5)

    def test_gate_renormalization_sums_to_one(self):
        """With K < E and ample capacity, an input routed to identical
        experts returns exactly one expert-output (gates sum to 1)."""
        E, K, B, S, D = 4, 2, 1, 2, 8
        module = MoEFeedForward(
            dim=D, num_experts=E, top_k=K, capacity_factor=float(E), mult=1,
        )
        x = jax.random.normal(jax.random.PRNGKey(3), (B, S, D))
        params = dict(init_moe(module, x))
        # identical experts: combined output must equal ONE expert's output
        # regardless of the (renormalized) gate split
        wi = np.asarray(params["wi"])
        wo = np.asarray(params["wo"])
        params["wi"] = jnp.asarray(np.broadcast_to(wi[:1], wi.shape))
        params["wo"] = jnp.asarray(np.broadcast_to(wo[:1], wo.shape))
        y = np.asarray(module.apply({"params": params}, x, mutable=["losses"])[0])
        expected = np.stack(
            [expert_mlp(params, 0, np.asarray(x)[0, s]) for s in range(S)]
        )[None]
        np.testing.assert_allclose(y, expected, atol=1e-5, rtol=1e-4)


class TestAuxLoss:
    def test_load_balance_hand_value(self):
        """Uniform router: importance = 1/E each, all top-1 traffic lands on
        expert 0 -> load = [1, 0, ...]; aux = E * (1/E * 1) * w = w."""
        E, B, S, D, w = 4, 2, 8, 8, 1e-2
        module = MoEFeedForward(
            dim=D, num_experts=E, top_k=2, capacity_factor=2.0, mult=1,
            router_aux_weight=w,
        )
        x = jax.random.normal(jax.random.PRNGKey(4), (B, S, D))
        params = dict(init_moe(module, x))
        params["router"] = jnp.zeros_like(params["router"])
        _, mut = module.apply({"params": params}, x, mutable=["losses"])
        (aux,) = mut["losses"]["moe_aux"]
        np.testing.assert_allclose(float(aux), w, rtol=1e-6)

    def test_router_z_loss_hand_value(self):
        """Zero router logits: logsumexp = log(E) -> z-loss = w_z*log(E)^2."""
        E, B, S, D, wz = 4, 1, 4, 8, 0.1
        module = MoEFeedForward(
            dim=D, num_experts=E, top_k=1, capacity_factor=2.0, mult=1,
            router_aux_weight=0.0, router_z_weight=wz,
        )
        x = jax.random.normal(jax.random.PRNGKey(5), (B, S, D))
        params = dict(init_moe(module, x))
        params["router"] = jnp.zeros_like(params["router"])
        _, mut = module.apply({"params": params}, x, mutable=["losses"])
        (aux,) = mut["losses"]["moe_aux"]
        np.testing.assert_allclose(float(aux), wz * np.log(E) ** 2, rtol=1e-5)


class TestPaddingMask:
    def test_pads_do_not_consume_capacity(self):
        """capacity 1, all tokens to expert 0, token 0 is a pad: the slot must
        go to the first REAL token, and the pad's output row must be zero."""
        E, B, S, D = 2, 2, 4, 8
        module = MoEFeedForward(
            dim=D, num_experts=E, top_k=1, capacity_factor=0.5, mult=1,
        )
        x = jax.random.normal(jax.random.PRNGKey(6), (B, S, D))
        params = dict(init_moe(module, x))
        params["router"] = jnp.zeros_like(params["router"])
        mask = jnp.asarray(np.array([[0, 1, 1, 1]] * B, bool))
        y = np.asarray(
            module.apply({"params": params}, x, mask=mask, mutable=["losses"])[0]
        )
        np.testing.assert_array_equal(y[:, 0], 0.0)  # pad gets nothing
        assert np.abs(y[:, 1]).max() > 1e-4  # first real token got the slot
        np.testing.assert_array_equal(y[:, 2:], 0.0)

    def test_aux_stats_over_real_tokens_only(self):
        """Load/importance means must ignore pads: same aux value whatever
        fraction of the batch is padding (uniform router hand case)."""
        E, B, S, D, w = 4, 2, 8, 8, 1e-2
        module = MoEFeedForward(
            dim=D, num_experts=E, top_k=1, capacity_factor=4.0, mult=1,
            router_aux_weight=w,
        )
        x = jax.random.normal(jax.random.PRNGKey(7), (B, S, D))
        params = dict(init_moe(module, x))
        params["router"] = jnp.zeros_like(params["router"])
        for n_pad in (0, 3, 6):
            mask = np.ones((B, S), bool)
            if n_pad:
                mask[:, -n_pad:] = False
            _, mut = module.apply(
                {"params": params}, x, mask=jnp.asarray(mask), mutable=["losses"]
            )
            (aux,) = mut["losses"]["moe_aux"]
            np.testing.assert_allclose(float(aux), w, rtol=1e-6)


class TestDtypeAndIntegration:
    def test_output_keeps_input_dtype(self):
        module = MoEFeedForward(dim=8, num_experts=2, top_k=1, mult=1)
        x = jax.random.normal(jax.random.PRNGKey(8), (1, 4, 8))
        params = init_moe(module, x)
        y = module.apply(
            {"params": params}, x.astype(jnp.bfloat16), mutable=["losses"]
        )[0]
        assert y.dtype == jnp.bfloat16

    def test_post_act_ln_with_moe_raises(self):
        cfg = TransformerConfig(
            dim=16, depth=1, heads=2, causal=True,
            attention=AttentionConfig(dim_head=8),
            feed_forward=FeedForwardConfig(num_experts=2, post_act_ln=True),
        )
        stack = TransformerStack(config=cfg)
        x = jnp.zeros((1, 4, 16))
        with pytest.raises(ValueError, match="post_act_ln"):
            stack.init({"params": jax.random.PRNGKey(0)}, x)

    def test_pipeline_guard_rejects_moe(self):
        from scoreperformer_tpu.parallel import make_unit_module

        cfg = TransformerConfig(
            dim=16, depth=2, heads=2, causal=True,
            attention=AttentionConfig(dim_head=8),
            feed_forward=FeedForwardConfig(num_experts=2),
        )
        with pytest.raises(NotImplementedError, match="MoE"):
            make_unit_module(cfg)

    def test_dense_model_sows_nothing(self):
        """A dense stack must not populate the `losses` collection (the
        trainer's mutable=['losses'] forward stays free for dense models)."""
        cfg = TransformerConfig(
            dim=16, depth=1, heads=2, causal=True,
            attention=AttentionConfig(dim_head=8),
        )
        stack = TransformerStack(config=cfg)
        x = jax.random.normal(jax.random.PRNGKey(9), (2, 8, 16))
        params = stack.init({"params": jax.random.PRNGKey(0)}, x)["params"]
        (out, _, _), mut = stack.apply({"params": params}, x, mutable=["losses"])
        assert jax.tree.leaves(mut.get("losses", {})) == []
        out2, _, _ = stack.apply({"params": params}, x)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))


def _moe_stack_and_batch(E=4, stride=1, depth=2, B=8, S=8, D=16, seed=0):
    cfg = TransformerConfig(
        dim=D, depth=depth, heads=2, causal=True,
        attention=AttentionConfig(dim_head=8, one_kv_head=True),
        feed_forward=FeedForwardConfig(
            num_experts=E, expert_top_k=2, capacity_factor=2.0,
            moe_stride=stride, glu=True, swish=True,
        ),
    )
    stack = TransformerStack(config=cfg)
    x = jax.random.normal(jax.random.PRNGKey(seed), (B, S, D))
    mask = jnp.ones((B, S), bool)
    params = stack.init({"params": jax.random.PRNGKey(seed + 1)}, x, mask=mask)[
        "params"
    ]
    return stack, params, x, mask


class TestTransformerIntegration:
    def test_moe_stride_substitution_and_aux_pickup(self):
        """moe_stride=2 over depth 2: exactly the SECOND feed-forward becomes
        MoE; one aux loss is sown under its layer name; grads are finite."""
        stack, params, x, mask = _moe_stack_and_batch(stride=2)
        assert "router" in params["layer_3_ff"]  # MoE slot
        assert "router" not in params["layer_1_ff"]  # dense slot

        def loss_fn(p):
            (out, _, _), mut = stack.apply(
                {"params": p}, x, mask=mask, mutable=["losses"]
            )
            sown = jax.tree.leaves(mut["losses"])
            assert len(sown) == 1
            return (out**2).mean() + sum(sown)

        loss, grads = jax.jit(jax.value_and_grad(loss_fn))(params)
        assert np.isfinite(float(loss))
        assert all(np.isfinite(np.asarray(g)).all() for g in jax.tree.leaves(grads))

    def test_expert_partition_rules_match_param_paths(self):
        """layer_N_ff/wi|wo get P(expert, ...) on an expert mesh; the router
        and non-MoE params stay replicated."""
        stack, params, x, mask = _moe_stack_and_batch(E=4)
        mesh = make_mesh(2, 1, expert=2, devices=jax.devices()[:4])
        shardings = params_shardings(params, mesh)
        for lyr in ("layer_1_ff", "layer_3_ff"):
            assert shardings[lyr]["wi"].spec == P(EXPERT_AXIS, None, None)
            assert shardings[lyr]["wo"].spec == P(EXPERT_AXIS, None, None)
            assert shardings[lyr]["router"].spec == P()
        assert shardings["layer_0_attn"]["to_q"]["kernel"].spec == P()

    def test_ep_sharded_forward_and_grad_parity(self):
        """Expert-parallel execution on a (2 data x 1 model x 2 expert) mesh
        must match the single-device run: forward outputs, loss, and grads."""
        stack, params, x, mask = _moe_stack_and_batch(E=4, B=8)

        def loss_fn(p, xx):
            (out, _, _), mut = stack.apply(
                {"params": p}, xx, mask=mask, mutable=["losses"]
            )
            return (out**2).mean() + sum(jax.tree.leaves(mut["losses"])), out

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

        (loss_ref, out_ref), grads_ref = jax.jit(grad_fn)(params, x)

        mesh = make_mesh(2, 1, expert=2, devices=jax.devices()[:4])
        sharded_params = jax.device_put(params, params_shardings(params, mesh))
        with expert_parallel(mesh):
            (loss_ep, out_ep), grads_ep = jax.jit(grad_fn)(sharded_params, x)

        np.testing.assert_allclose(float(loss_ref), float(loss_ep), rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(out_ref), np.asarray(out_ep), atol=1e-5, rtol=1e-4
        )
        for g_ref, g_ep in zip(jax.tree.leaves(grads_ref), jax.tree.leaves(grads_ep)):
            np.testing.assert_allclose(
                np.asarray(g_ref), np.asarray(g_ep), atol=1e-5, rtol=1e-3
            )

    def test_decode_cache_path_ignores_key_mask(self):
        """With a KV cache, `mask` covers cache keys, not queries: the MoE
        layer must not apply it to the fresh tokens (shape mismatch path)."""
        from scoreperformer_tpu.models.attention import init_kv_cache

        stack, params, x, mask = _moe_stack_and_batch(B=2, S=8)
        # layer pattern (a, f) x 2, one_kv_head -> kv_dim = dim_head = 8
        caches = [init_kv_cache(2, 16, 8), None, init_kv_cache(2, 16, 8), None]
        key_mask = jnp.zeros((2, 16), bool).at[:, :8].set(True)
        out, new_caches, _ = stack.apply(
            {"params": params}, x, mask=key_mask, caches=caches,
            cache_index=jnp.zeros((), jnp.int32), mutable=["losses"],
        )[0]
        assert out.shape == x.shape
        assert np.isfinite(np.asarray(out)).all()


class TestMoELearning:
    """Value proof (VERDICT r4 #4): MoE is not just a verified mechanism —
    a model trained through the `moe.yaml`-shaped config must actually
    LEARN (overfit one piece like tests/test_overfit.py), keep its router
    aux losses bounded, keep the expert drop rate sane, and land in the
    same accuracy band as the params-matched dense baseline trained
    identically in the same test."""

    @pytest.mark.slow
    def test_moe_overfit_matches_dense_baseline(self, tmp_path):
        from test_overfit import _build_overfit_trainer

        def moe_transform(cfg):
            # fresh dict: tiny_cfg shares one feed_forward dict across all
            # three stacks — only the decoder becomes MoE (moe.yaml shape)
            dec = cfg["perf_decoder"]["transformer"]
            dec["feed_forward"] = {
                **dec["feed_forward"],
                "num_experts": 4,
                "expert_top_k": 2,
                "capacity_factor": 1.5,
                "moe_stride": 2,
                "router_aux_weight": 0.01,
            }

        trainer, _, _ = _build_overfit_trainer(
            tmp_path / "moe", epochs=1000, cfg_transform=moe_transform
        )
        trainer._prepare()
        before = trainer.evaluate()
        state = trainer.train()
        evals = [l for l in state.log_history if "eval/accuracy" in l]
        assert evals, state.log_history[-3:]
        final = evals[-1]

        # 1) it learns: same trajectory bar as the dense overfit proof
        after = final["eval/accuracy"]
        assert after > 0.15, (before.get("eval/accuracy"), after)
        assert after > 4 * max(before.get("eval/accuracy", 0.0), 0.03)
        assert final["eval/loss"] < 0.5 * before["eval/loss"]

        # 2) router aux loss stays bounded through training (weight 0.01;
        # a balanced router sits near 0.01, collapse/explosion would not)
        aux = final.get("eval/loss/moe_aux")
        assert aux is not None and np.isfinite(aux) and 0.0 <= aux < 0.1, aux

        # 3) expert capacity drop rate is sane at capacity_factor 1.5
        drop = final.get("eval/stats/moe_drop")
        assert drop is not None and 0.0 <= drop < 0.5, drop

        # 4) params-matched dense baseline, identical data/seed/epochs:
        # MoE must land in the same band (same active FF width per token)
        dense_trainer, _, _ = _build_overfit_trainer(tmp_path / "dense", epochs=1000)
        dense_state = dense_trainer.train()
        dense_evals = [
            l for l in dense_state.log_history if "eval/accuracy" in l
        ]
        dense_after = dense_evals[-1]["eval/accuracy"]
        assert after > 0.6 * dense_after, (after, dense_after)
