"""Plateau LR annealing: host controller + opt-state scale leaf.

The reference routes lr_scheduler='plateau' to torch's ReduceLROnPlateau
(experiments/optimizers.py:54-56) and steps it once per epoch with the mean
train loss (experiments/trainer.py:269-270). Here the decision logic runs on
host (`PlateauController`, oracle-tested against torch itself below) and the
decayed factor lives as a scalar leaf of the optimizer state so the jitted
train step never retraces.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scoreperformer_tpu.training.optimizers import (
    OptimizerConfig,
    PlateauController,
    build_optimizer,
    get_plateau_scale,
    set_plateau_scale,
)


class TestPlateauController:
    @pytest.mark.parametrize(
        "kwargs",
        [
            dict(factor=0.1, patience=10),
            dict(factor=0.5, patience=2),
            dict(factor=0.5, patience=0),
            dict(factor=0.3, patience=3, cooldown=2),
            dict(factor=0.5, patience=1, threshold=0.05),
            dict(factor=0.1, patience=2, min_lr=1e-5),
        ],
    )
    def test_matches_torch_reduce_on_plateau(self, kwargs):
        """Oracle: the exact scheduler class the reference instantiates."""
        torch = pytest.importorskip("torch")

        lr = 1e-3
        min_lr = kwargs.pop("min_lr", 0.0)
        p = torch.nn.Parameter(torch.zeros(1))
        opt = torch.optim.SGD([p], lr=lr)
        sched = torch.optim.lr_scheduler.ReduceLROnPlateau(
            opt, mode="min", min_lr=min_lr, **kwargs
        )
        ctrl = PlateauController(min_scale=min_lr / lr, base_lr=lr, **kwargs)

        rng = np.random.RandomState(0)
        # a loss curve that improves, plateaus, improves again, then flattens
        metrics = np.concatenate(
            [
                3.0 - 0.1 * np.arange(10),
                np.full(15, 2.1) + rng.uniform(-1e-6, 1e-6, 15),
                2.0 - 0.05 * np.arange(5),
                np.full(20, 1.76) + rng.uniform(-1e-6, 1e-6, 20),
            ]
        )
        for i, m in enumerate(metrics):
            sched.step(float(m))
            scale = ctrl.step(float(m))
            torch_lr = opt.param_groups[0]["lr"]
            assert scale * lr == pytest.approx(torch_lr, rel=1e-12), (
                f"diverged at epoch {i}: ours {scale * lr}, torch {torch_lr}"
            )

    def test_state_dict_roundtrip(self):
        ctrl = PlateauController(factor=0.5, patience=1)
        for m in [3.0, 3.0, 3.0, 3.0]:
            ctrl.step(m)
        assert ctrl.scale < 1.0
        ctrl2 = PlateauController(factor=0.5, patience=1)
        ctrl2.load_state_dict(ctrl.state_dict())
        # both continue identically from the restored point
        for m in [3.0, 3.0, 3.0]:
            assert ctrl.step(m) == ctrl2.step(m)

    def test_from_config(self):
        cfg = OptimizerConfig(
            lr=1e-3,
            lr_scheduler="plateau",
            lr_scheduler_params={"factor": 0.2, "patience": 5, "min_lr": 1e-5},
        )
        ctrl = PlateauController.from_config(cfg)
        assert ctrl is not None
        assert ctrl.factor == 0.2 and ctrl.patience == 5
        assert ctrl.min_scale == pytest.approx(1e-2)
        assert PlateauController.from_config(OptimizerConfig(lr=1e-3)) is None


class TestPlateauTransform:
    def _params_grads(self):
        params = {"w": jnp.array([1.0, -2.0, 3.0]), "b": jnp.array([[0.5]])}
        grads = {"w": jnp.array([0.5, 1.0, -0.5]), "b": jnp.array([[1.0]])}
        return params, grads

    def test_scale_leaf_present_and_settable(self):
        params, grads = self._params_grads()
        tx = build_optimizer(
            OptimizerConfig(lr=1e-2, optimizer="adamw", lr_scheduler="plateau"), 10
        )
        state = tx.init(params)
        assert get_plateau_scale(state) == 1.0
        state = set_plateau_scale(state, 0.25)
        assert get_plateau_scale(state) == 0.25
        # non-plateau optimizer has no leaf
        tx2 = build_optimizer(OptimizerConfig(lr=1e-2, optimizer="adamw"), 10)
        assert get_plateau_scale(tx2.init(params)) is None

    def test_updates_scale_exactly(self):
        """With the scale at s, the applied update is exactly s times the
        scale-1 update (same moments: fresh state each side)."""
        params, grads = self._params_grads()
        cfg = OptimizerConfig(
            lr=1e-2, optimizer="adamw", lr_scheduler="plateau", grad_clip=1.0
        )
        tx = build_optimizer(cfg, 10)

        u_full, _ = tx.update(grads, tx.init(params), params)
        state = set_plateau_scale(tx.init(params), 0.1)
        u_scaled, _ = tx.update(grads, state, params)
        for a, b in zip(jax.tree.leaves(u_full), jax.tree.leaves(u_scaled)):
            np.testing.assert_allclose(np.array(a) * 0.1, np.array(b), rtol=1e-6)

    def test_survives_accumulation_and_flatten(self):
        """The leaf is findable/settable through MultiSteps and optax.flatten
        wrappers (the same wrappers the trainer may apply)."""
        params, grads = self._params_grads()
        cfg = OptimizerConfig(
            lr=1e-2,
            optimizer="adamw",
            lr_scheduler="plateau",
            grad_accum_steps=2,
            flat_updates=True,
        )
        tx = build_optimizer(cfg, 10)
        state = tx.init(params)
        assert get_plateau_scale(state) == 1.0
        state = set_plateau_scale(state, 0.5)
        assert get_plateau_scale(state) == 0.5
        # two micro-steps apply one scaled update without error
        p = params
        for _ in range(2):
            upd, state = tx.update(grads, state, p)
            p = jax.tree.map(lambda x, u: x + u, p, upd)
        assert all(np.isfinite(np.array(x)).all() for x in jax.tree.leaves(p))

    def test_set_preserves_sharding(self):
        """Replacing the leaf keeps the original device placement so the next
        donated jitted step sees an identically-placed argument."""
        params, _ = self._params_grads()
        tx = build_optimizer(
            OptimizerConfig(lr=1e-2, optimizer="adamw", lr_scheduler="plateau"), 10
        )
        state = jax.device_put(tx.init(params))
        before = None
        for leaf in jax.tree.leaves(state):
            before = leaf.sharding
            break
        state = set_plateau_scale(state, 0.3)
        found = []
        jax.tree_util.tree_map(lambda x: found.append(x), state)
        scales = [x for x in found if getattr(x, "shape", None) == ()]
        assert any(s.sharding == before for s in scales if hasattr(s, "sharding"))
