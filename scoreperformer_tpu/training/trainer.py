"""Trainer: jitted train/eval steps, epoch loop, checkpointing, callbacks.

Counterpart of scoreperformer/experiments/{trainer.py, trainer_config.py,
trainer_utils.py}, re-designed around a single pure `train_step(params,
opt_state, batch, rng)` compiled once (static batch shapes from the fixed-len
collator) and sharded over a device mesh (batch on the `data` axis).
"""
from __future__ import annotations

import os
import time
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..configs import ModuleConfig, to_dict
from ..data.collators import scoreperformer_model_inputs
from ..parallel import (
    batch_sharding,
    host_local_to_global_batch,
    make_mesh,
    maybe_distributed_initialize,
    shard_params,
)
from .callbacks import (
    CallbackHandler,
    DefaultFlowCallback,
    PrinterCallback,
    ProgressCallback,
    TrainerCallback,
    TrainerControl,
    TrainerState,
)
from .checkpoint import (
    freeze_mask,
    load_checkpoint,
    restore_sharded,
    save_checkpoint,
    warm_start_params,
)
from .optimizers import (
    OptimizerConfig,
    PlateauController,
    build_lr_schedule,
    build_optimizer,
    set_plateau_scale,
)


@dataclass
class TrainerConfig(ModuleConfig):
    output_dir: str = "results"
    do_train: bool = True
    do_eval: bool = True
    seed: int = 23

    log_strategy: str = "steps"  # no | epoch | steps
    log_steps: int = 5
    log_first_step: bool = True
    progress_steps: int = 5
    progress_metrics: List[str] = field(default_factory=lambda: ["loss"])
    disable_progress: bool = False

    shuffle: bool = True
    drop_last: bool = True
    num_workers: int = 4

    epochs: int = 100
    max_steps: int = -1
    batch_size: int = 32
    eval_batch_size: int = 64
    eval_batches: Optional[int] = None

    eval_strategy: str = "epoch"  # no | epoch | steps
    eval_steps: int = 1

    optimization: OptimizerConfig = field(default_factory=OptimizerConfig)

    save_strategy: str = "epoch"  # no | epoch | steps
    save_steps: int = 1
    save_optimizer: bool = False
    save_best_only: bool = True
    save_rewrite_checkpoint: bool = False
    metric_for_best_model: str = "loss"
    metric_maximize: bool = False

    resume_from_checkpoint: Optional[str] = None
    warm_start: bool = False
    ignore_layers: List[str] = field(default_factory=list)
    ignore_mismatched_keys: bool = True
    finetune_layers: List[str] = field(default_factory=list)

    # TPU-native additions
    mesh_data: Optional[int] = None  # None = all devices on the data axis
    mesh_model: int = 1
    # expert-parallel mesh axis for MoE configs (models/moe.py): shards
    # stacked expert kernels + dispatched activations over `expert`
    mesh_expert: int = 1
    # multi-host (DCN) execution (SURVEY §2.8 backend row): run
    # jax.distributed.initialize() at process start, build the mesh over
    # GLOBAL devices, and assemble host-local batches into global arrays via
    # jax.make_array_from_process_local_data. On TPU pods the coordinator
    # fields auto-detect from the environment; set them for CPU/GPU clusters.
    # Cannot be exercised with real multi-process here (single-host CI) —
    # the code path is unit-tested single-process.
    multihost: bool = False
    coordinator_address: Optional[str] = None
    num_processes: Optional[int] = None
    process_id: Optional[int] = None
    # ZeRO-1-style optimizer-state sharding over the data axis
    # (parallel.mesh.opt_state_shardings); parity-tested on the virtual mesh
    zero_sharding: bool = False
    # sequence-parallel activation sharding: with mesh_model > 1, constrain
    # the residual stream to P(data, model, None) between blocks
    # (parallel.mesh.shard_seq_activations) — activation memory drops
    # ~model-fold and TP all-reduces become reduce-scatter/all-gather pairs
    sequence_parallel: bool = False
    bf16_compute: bool = False
    # activation rematerialization (jax.checkpoint) in the train step:
    # recompute the forward during backward instead of storing activations
    remat: bool = False
    # TensorBoard event files in {output_dir}/tb via the self-contained
    # writer (training/tensorboard.py; reference integrations.py:14-55)
    tensorboard: bool = True
    # async checkpointing: arrays are fetched to host synchronously but the
    # disk commit runs on orbax's background thread, so periodic/best saves
    # leave the train loop immediately; the final save path waits for all
    # in-flight commits before returning (checkpoint.wait_for_async_saves)
    async_checkpoint: bool = False
    # sharded checkpointing: orbax serializes the (mesh-sharded) jax.Array
    # leaves directly — no host-gathered full tree per save — and resume
    # restores shards straight onto this run's mesh (restore_sharded; the
    # saving mesh may differ — cross-topology elastic restore is tested)
    sharded_checkpoint: bool = False
    debug_nans: bool = False  # jax_debug_nans toggle (SURVEY §5 sanitizers)
    # jax.profiler trace of [profile_start_step, +profile_num_steps) steps
    profile_dir: Optional[str] = None
    profile_start_step: int = 10
    profile_num_steps: int = 5


class Accumulator:
    """Running means (trainer_utils.py:15-65).

    Values may be device arrays: they are buffered as-is and fetched in ONE
    batched `jax.device_get` at `means()` time. Converting per step would
    force a host↔device round trip every step and serialize the pipeline —
    on a tunneled chip that sync dominates the step wall time entirely.
    """

    def __init__(self):
        self.sums: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}
        self._pending: List[Dict[str, Any]] = []

    def update(self, values: Dict[str, Any]):
        self._pending.append(dict(values))

    def _flush(self):
        if not self._pending:
            return
        for values in jax.device_get(self._pending):
            for key, value in values.items():
                self.sums[key] = self.sums.get(key, 0.0) + float(value)
                self.counts[key] = self.counts.get(key, 0) + 1
        self._pending = []

    def means(self) -> Dict[str, float]:
        self._flush()
        return {k: self.sums[k] / max(1, self.counts[k]) for k in self.sums}

    def reset(self):
        self.sums, self.counts = {}, {}
        self._pending = []


def _cast_tree(tree, dtype):
    return jax.tree.map(
        lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x, tree
    )


class Trainer:
    """(reference trainer.py:35-526)"""

    def __init__(
        self,
        model,
        config: TrainerConfig,
        train_dataset=None,
        eval_dataset=None,
        collator=None,
        evaluator=None,
        callbacks: Optional[List[TrainerCallback]] = None,
        model_config: Optional[Any] = None,
        input_fn: Callable = scoreperformer_model_inputs,
    ):
        self.model = model
        self.config = config
        self.train_dataset = train_dataset
        self.eval_dataset = eval_dataset
        self.collator = collator
        self.evaluator = evaluator
        self.model_config = model_config
        self.input_fn = input_fn

        os.makedirs(config.output_dir, exist_ok=True)

        if config.multihost:
            maybe_distributed_initialize(config)

        # mesh: data axis must divide the (smallest) batch size
        import math as _math

        n_devices = len(jax.devices())
        non_data = config.mesh_model * config.mesh_expert
        data_axis = config.mesh_data
        if data_axis is None:
            data_axis = n_devices // non_data
            batch_gcd = _math.gcd(config.batch_size, config.eval_batch_size)
            data_axis = _math.gcd(data_axis, batch_gcd) or 1
        if data_axis * non_data < n_devices:
            import warnings

            warnings.warn(
                f"mesh ({data_axis} data x {config.mesh_model} model x "
                f"{config.mesh_expert} expert) engages only "
                f"{data_axis * non_data} of {n_devices} devices: the data axis "
                f"is limited by gcd(batch={config.batch_size}, eval_batch="
                f"{config.eval_batch_size}). Set mesh_data explicitly or pick batch "
                "sizes divisible by the device count to use all devices.",
                stacklevel=2,
            )
        self.mesh = make_mesh(
            data_axis,
            config.mesh_model,
            expert=config.mesh_expert,
            devices=jax.devices()[: data_axis * non_data],
        )
        self._batch_sharding = batch_sharding(self.mesh)
        if config.sequence_parallel and config.mesh_model > 1:
            from ..parallel import sequence_parallel_sharding, set_activation_sharding

            set_activation_sharding(sequence_parallel_sharding(self.mesh))
        if config.mesh_expert > 1:
            from ..parallel import expert_sharding, set_expert_sharding

            set_expert_sharding(expert_sharding(self.mesh))

        self.state = TrainerState()
        self.control = TrainerControl()
        from .callbacks import FileLogCallback, JSONLMetricsCallback

        cb = [DefaultFlowCallback(), JSONLMetricsCallback(), FileLogCallback()]
        if config.tensorboard:
            from .callbacks import TensorBoardCallback

            cb.append(TensorBoardCallback())
        if not config.disable_progress:
            cb.append(ProgressCallback(config.progress_metrics, config.progress_steps))
        cb += callbacks or []
        self.callback_handler = CallbackHandler(cb)

        self.rng = jax.random.PRNGKey(config.seed)

        # init params from a sample batch
        self.params = None
        self.opt_state = None
        self.tx = None
        self._train_step = None
        self._eval_step = None
        self._plateau = None

        self.steps_per_epoch = None
        if train_dataset is not None:
            self.steps_per_epoch = max(1, len(train_dataset) // config.batch_size)

        self.callback_handler.on_init_end(self.config, self.state, self.control)

    # ---- setup ----

    def _sample_batch(self, dataset, batch_size: int) -> Dict[str, np.ndarray]:
        samples = [dataset[i % len(dataset)] for i in range(batch_size)]
        return self.input_fn(self.collator(samples))

    def init_params(self, sample_batch: Optional[Dict] = None):
        if sample_batch is None:
            sample_batch = self._sample_batch(self.train_dataset or self.eval_dataset, 2)
        rngs = {
            "params": self.rng,
            "dropout": jax.random.PRNGKey(0),
            "latent_dropout": jax.random.PRNGKey(1),
            "mmd": jax.random.PRNGKey(2),
        }
        # jit the init: eager init dispatches thousands of tiny ops, which is
        # catastrophically slow on remote-compile TPU platforms
        variables = jax.jit(
            lambda r, b: self.model.init(r, **b, deterministic=True)
        )(rngs, _to_jnp(sample_batch))
        self.params = variables["params"]
        self.params = shard_params(self.params, self.mesh)
        return self.params

    def setup_optimizer(self):
        self.tx = build_optimizer(self.config.optimization, self.steps_per_epoch or 1)
        self.opt_state = self.tx.init(self.params)
        if self.config.zero_sharding:
            from ..parallel import shard_opt_state

            self.opt_state = shard_opt_state(self.opt_state, self.mesh)
        self._lr_schedule = build_lr_schedule(
            self.config.optimization, self.steps_per_epoch or 1
        )
        # host-side plateau annealing (reference trainer.py:269-270 steps
        # ReduceLROnPlateau with the epoch train loss); the decayed factor is
        # a scalar leaf of opt_state so the jitted step never retraces
        self._plateau = PlateauController.from_config(self.config.optimization)

    def _build_train_step(self):
        model = self.model
        tx = self.tx
        bf16 = self.config.bf16_compute
        remat = self.config.remat
        trainable = freeze_mask(self.params, self.config.finetune_layers)
        # pin the ZeRO placement through the step: without the constraint,
        # sharding propagation may replicate the updated moments and the
        # memory saving would decay after the first step
        opt_shardings = None
        if self.config.zero_sharding:
            from ..parallel import opt_state_shardings

            opt_shardings = opt_state_shardings(self.opt_state, self.mesh)

        def forward(p, batch, rngs):
            # mutable=["losses"] collects aux losses sown by MoE layers
            # (models/moe.py router load-balance / z-loss); empty and free
            # for dense models
            out, mut = model.apply(
                {"params": p}, **batch, deterministic=False, rngs=rngs,
                mutable=["losses", "metrics"],
            )
            loss = out.loss.astype(jnp.float32)
            losses = dict(out.losses)
            sown = jax.tree.leaves(mut.get("losses", {}))
            if sown:
                aux = sum(v.astype(jnp.float32) for v in sown)
                loss = loss + aux
                losses["loss/moe_aux"] = aux
            sown_m = jax.tree.leaves(mut.get("metrics", {}))
            if sown_m:
                # mean over MoE layers; logged, NOT added to the loss
                losses["stats/moe_drop"] = sum(
                    v.astype(jnp.float32) for v in sown_m
                ) / len(sown_m)
            return loss, losses

        if remat:
            # trade recompute for activation memory (HBM): the backward pass
            # re-runs the forward instead of keeping every intermediate live.
            # Irrelevant at the flagship size; the lever for big configs.
            forward = jax.checkpoint(forward, static_argnums=())

        def train_step(params, opt_state, batch, rng):
            rngs = {
                "dropout": jax.random.fold_in(rng, 0),
                "latent_dropout": jax.random.fold_in(rng, 1),
                "mmd": jax.random.fold_in(rng, 2),
            }

            def loss_fn(p):
                p_c = _cast_tree(p, jnp.bfloat16) if bf16 else p
                return forward(p_c, batch, rngs)

            (loss, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            grads = _cast_tree(grads, jnp.float32)
            grads = jax.tree.map(
                lambda g, t: g if t else jnp.zeros_like(g), grads, trainable
            )
            grad_norm = optax_global_norm(grads)
            updates, new_opt_state = tx.update(grads, opt_state, params)
            if opt_shardings is not None:
                new_opt_state = jax.lax.with_sharding_constraint(
                    new_opt_state, opt_shardings
                )
            new_params = jax.tree.map(lambda p, u: p + u, params, updates)
            metrics = {"loss": loss, "stats/grad_norm": grad_norm}
            metrics.update({k: v.astype(jnp.float32) for k, v in losses.items()})
            return new_params, new_opt_state, metrics

        self._train_step = jax.jit(train_step, donate_argnums=(0, 1))

    def _build_eval_step(self):
        model = self.model
        evaluator = self.evaluator
        bf16 = self.config.bf16_compute

        def eval_step(params, batch, rng):
            rngs = {"mmd": rng}
            p_c = _cast_tree(params, jnp.bfloat16) if bf16 else params
            out, mut = model.apply(
                {"params": p_c}, **batch, deterministic=True, rngs=rngs,
                mutable=["losses", "metrics"],
            )
            metrics = {"loss": out.loss.astype(jnp.float32)}
            sown = jax.tree.leaves(mut.get("losses", {}))
            if sown:
                metrics["loss/moe_aux"] = sum(v.astype(jnp.float32) for v in sown)
            sown_m = jax.tree.leaves(mut.get("metrics", {}))
            if sown_m:
                metrics["stats/moe_drop"] = sum(
                    v.astype(jnp.float32) for v in sown_m
                ) / len(sown_m)
            metrics.update({k: v.astype(jnp.float32) for k, v in out.losses.items()})
            if evaluator is not None and "labels" in batch:
                metrics.update(evaluator(batch["labels"], out.perf_decoder.logits))
            return metrics

        self._eval_step = jax.jit(eval_step)

    def _prepare(self):
        if self.params is None:
            self.init_params()
        if self.tx is None:
            self.setup_optimizer()
        if self._train_step is None:
            self._build_train_step()
        if self._eval_step is None:
            self._build_eval_step()
        self._maybe_load_checkpoint()

    def _maybe_load_checkpoint(self):
        path = self.config.resume_from_checkpoint
        if not path:
            return
        if self.config.warm_start:
            loaded = load_checkpoint(path)
            self.params = warm_start_params(
                jax.device_get(self.params),
                loaded["params"],
                ignore_layers=self.config.ignore_layers,
                ignore_mismatched=self.config.ignore_mismatched_keys,
            )
            self.params = shard_params(self.params, self.mesh)
        else:
            if self.config.sharded_checkpoint:
                # device-direct: shards stream from disk onto this run's mesh
                loaded = restore_sharded(path, self.params, self.opt_state)
                self.params = loaded["params"]
            else:
                loaded = load_checkpoint(path, self.params, self.opt_state)
                self.params = shard_params(loaded["params"], self.mesh)
            if "opt_state" in loaded:
                self.opt_state = loaded["opt_state"]
            if "trainer_state" in loaded:
                ts = loaded["trainer_state"]
                self.state.epoch = ts.get("epoch", 0.0)
                self.state.global_step = ts.get("global_step", 0)
                self.state.best_metric = ts.get("best_metric")
                if self._plateau is not None and ts.get("plateau") is not None:
                    self._plateau.load_state_dict(ts["plateau"])

    # ---- data ----

    def _iter_batches(
        self, dataset, batch_size: int, shuffle: bool, epoch: int, skip: int = 0
    ):
        """Host batching with `num_workers` parallel producers: upcoming
        batches are sampled/collated while the device runs the current step.

        Every batch is a pure function of (seed, epoch, b): the shuffle order
        comes from the epoch seed and both the dataset sampling rng AND the
        collator masking rng are derived per batch index, never from shared
        sequential state — so producer-thread completion order cannot change
        training data, and `skip` resumes an interrupted epoch at the exact
        batch it stopped at (see train())."""
        import threading

        n = len(dataset)
        order = np.arange(n)
        if shuffle:
            epoch_rng = np.random.RandomState(self.config.seed * (epoch + 1))
            epoch_rng.shuffle(order)
        num_batches = n // batch_size if self.config.drop_last else -(-n // batch_size)
        num_batches = max(1, num_batches) if n > 0 else 0

        collator_lock = threading.Lock()
        has_collator_rng = hasattr(self.collator, "_rng")

        def make(b):
            idx = order[b * batch_size : (b + 1) * batch_size]
            if len(idx) < batch_size:  # wrap around to keep static shapes
                extra = np.resize(order, batch_size - len(idx))
                idx = np.concatenate([idx, extra])
            # per-batch RNG keeps parallel sampling deterministic & thread-safe
            rng = np.random.RandomState(
                (self.config.seed * 1_000_003 + epoch * 10_007 + b) % (2**31 - 1)
            )
            if hasattr(dataset, "get"):
                samples = [dataset.get(int(i), rng=rng) for i in idx]
            else:
                samples = [dataset[int(i)] for i in idx]
            if has_collator_rng:
                # per-batch masking rng: reseeding under the lock makes batch
                # content independent of producer-thread completion order
                with collator_lock:
                    self.collator._rng = np.random.RandomState(
                        (self.config.seed * 9_999_991 + epoch * 104_729 + b * 7919 + 1)
                        % (2**31 - 1)
                    )
                    batch = self.input_fn(self.collator(samples))
            else:
                batch = self.input_fn(self.collator(samples))
            return self._put_batch(batch)

        # parallel producers (the python sampling/augmentation path dominates
        # step time otherwise); numpy releases the GIL for the heavy parts.
        # NB: per-sample RNG draws reorder across workers — per-epoch
        # reproducibility is preserved by the epoch reseed, not sample order.
        from concurrent.futures import ThreadPoolExecutor

        skip = min(max(0, int(skip)), num_batches)
        workers = max(1, int(getattr(self.config, "num_workers", 4)))
        if workers == 1:
            for b in range(skip, num_batches):
                yield make(b)
            return

        with ThreadPoolExecutor(max_workers=workers) as pool:
            inflight = {}
            depth = workers + 1
            for b in range(skip, min(skip + depth, num_batches)):
                inflight[b] = pool.submit(make, b)
            for b in range(skip, num_batches):
                batch = inflight.pop(b).result()
                nxt = b + depth
                if nxt < num_batches:
                    inflight[nxt] = pool.submit(make, nxt)
                yield batch

    def _put_batch(self, batch):
        """Place a host batch onto the mesh. Single-host: one device_put with
        the batch sharding. Multi-host: every process holds only its local
        shard, assembled into a global array over DCN."""
        if self.config.multihost and jax.process_count() > 1:
            return host_local_to_global_batch(batch, self._batch_sharding)
        return jax.device_put(batch, self._batch_sharding)

    # ---- loops ----

    def train(self):
        self._prepare()
        config = self.config
        self.state.num_train_epochs = config.epochs
        self.state.max_steps = (
            config.max_steps if config.max_steps > 0 else config.epochs * self.steps_per_epoch
        )
        self.callback_handler.on_train_begin(config, self.state, self.control)

        if config.debug_nans:
            jax.config.update("jax_debug_nans", True)

        # preemption-safe save: SIGTERM/SIGINT request a graceful stop; the
        # `finally` below then writes checkpoint_last (reference only guards
        # exceptions via try/finally, trainer.py:203-213 — TPU pods preempt
        # with SIGTERM, so handle the signal too).
        import signal

        def _request_stop(signum, frame):
            self.control.should_training_stop = True

        prev_handlers = {}
        for sig in (signal.SIGTERM, signal.SIGINT):
            try:
                prev_handlers[sig] = signal.signal(sig, _request_stop)
            except ValueError:  # not in the main thread (e.g. under a test runner)
                pass

        profiling = config.profile_dir is not None
        profile_active = False

        accumulator = Accumulator()
        start_epoch = int(self.state.epoch)
        # exact mid-epoch resume: if the restored global_step sits inside
        # start_epoch, skip the batches already consumed — batch content is a
        # pure function of (seed, epoch, b), so the remaining stream is
        # bit-identical to the uninterrupted run's
        resume_skip = 0
        if self.steps_per_epoch:
            done_in_epoch = self.state.global_step - start_epoch * self.steps_per_epoch
            if 0 < done_in_epoch < self.steps_per_epoch:
                resume_skip = done_in_epoch
        self._last_log_time = time.perf_counter()
        self._last_log_step = self.state.global_step
        try:
            for epoch in range(start_epoch, config.epochs):
                self.control._new_epoch()
                self.callback_handler.on_epoch_begin(config, self.state, self.control)
                epoch_loss_acc = Accumulator() if self._plateau is not None else None

                for batch in self._iter_batches(
                    self.train_dataset,
                    config.batch_size,
                    config.shuffle,
                    epoch,
                    skip=resume_skip if epoch == start_epoch else 0,
                ):
                    self.control._new_step()
                    self.callback_handler.on_step_begin(config, self.state, self.control)

                    if profiling and self.state.global_step == config.profile_start_step:
                        jax.profiler.start_trace(config.profile_dir)
                        profile_active = True

                    step_rng = jax.random.fold_in(self.rng, self.state.global_step)
                    t0 = time.perf_counter()
                    with jax.profiler.StepTraceAnnotation(
                        "train", step_num=self.state.global_step
                    ):
                        self.params, self.opt_state, metrics = self._train_step(
                            self.params, self.opt_state, batch, step_rng
                        )
                    # metrics stay on device until the next log flush — a
                    # per-step float() would sync the pipeline every step
                    metrics["stats/time"] = time.perf_counter() - t0
                    accumulator.update(metrics)
                    if epoch_loss_acc is not None:
                        epoch_loss_acc.update({"loss": metrics["loss"]})

                    self.state.global_step += 1
                    if (
                        profile_active
                        and self.state.global_step
                        >= config.profile_start_step + config.profile_num_steps
                    ):
                        jax.profiler.stop_trace()
                        profile_active = False
                    self.state.epoch = epoch + (
                        (self.state.global_step % self.steps_per_epoch) / self.steps_per_epoch
                        or 1.0
                    )
                    self.callback_handler.on_step_end(config, self.state, self.control)
                    self._maybe_log_save_evaluate(accumulator)

                    if self.control.should_training_stop or self.control.should_epoch_stop:
                        break

                # a should_training_stop mid-epoch (preemption, early stop)
                # must NOT round state.epoch up: the fractional epoch is what
                # lets resume skip exactly the consumed batches
                stopped_mid_epoch = bool(self.steps_per_epoch) and (
                    self.control.should_training_stop
                    and self.state.global_step % self.steps_per_epoch != 0
                )
                if not stopped_mid_epoch:
                    self.state.epoch = float(epoch + 1)
                self.callback_handler.on_epoch_end(config, self.state, self.control)
                if epoch_loss_acc is not None and not stopped_mid_epoch:
                    epoch_loss = epoch_loss_acc.means().get("loss")
                    if epoch_loss is not None:
                        new_scale = self._plateau.step(epoch_loss)
                        self.opt_state = set_plateau_scale(self.opt_state, new_scale)
                self._maybe_log_save_evaluate(accumulator, prefix="train")

                if self.control.should_training_stop:
                    break
        finally:
            if profile_active:
                jax.profiler.stop_trace()
            import signal as _signal

            for sig, handler in prev_handlers.items():
                _signal.signal(sig, handler)
            # final save guarantee (reference trainer.py:203-213); with async
            # checkpointing, block until every queued commit is on disk
            self.save_checkpoint(name="checkpoint_last")
            if self.config.async_checkpoint:
                from .checkpoint import wait_for_async_saves

                wait_for_async_saves()
            self.callback_handler.on_train_end(config, self.state, self.control)
            if config.sequence_parallel and config.mesh_model > 1:
                from ..parallel import set_activation_sharding

                set_activation_sharding(None)  # don't leak into later traces
            if config.mesh_expert > 1:
                from ..parallel import set_expert_sharding

                set_expert_sharding(None)

        return self.state

    def _maybe_log_save_evaluate(self, accumulator: Accumulator, prefix: str = "train_step"):
        if self.control.should_log:
            logs = {f"{prefix}/{k}": v for k, v in accumulator.means().items()}
            lr = float(self._lr_schedule(self.state.global_step))
            if self._plateau is not None:
                lr *= self._plateau.scale
            logs[f"{prefix}/lr"] = lr
            # true pipelined throughput (wall clock between log flushes);
            # stats/time above is per-step *dispatch* time only
            now = time.perf_counter()
            dsteps = self.state.global_step - getattr(self, "_last_log_step", 0)
            if dsteps > 0 and hasattr(self, "_last_log_time"):
                logs[f"{prefix}/steps_per_sec"] = dsteps / max(
                    1e-9, now - self._last_log_time
                )
            self._last_log_time = now
            self._last_log_step = self.state.global_step
            self.state.log_history.append({"step": self.state.global_step, **logs})
            self.callback_handler.on_log(self.config, self.state, self.control, logs=logs)
            accumulator.reset()
            self.control.should_log = False

        if self.control.should_evaluate and self.config.do_eval and self.eval_dataset is not None:
            metrics = self.evaluate()
            self._track_best(metrics)
            self.callback_handler.on_evaluate(
                self.config, self.state, self.control, metrics=metrics
            )
            self.control.should_evaluate = False

        if self.control.should_save:
            if not self.config.save_best_only:
                name = (
                    "checkpoint_last"
                    if self.config.save_rewrite_checkpoint
                    else f"checkpoint_{self.state.global_step}"
                )
                self.save_checkpoint(name=name)
            self.callback_handler.on_save(self.config, self.state, self.control)
            self.control.should_save = False

    def _track_best(self, metrics: Dict[str, float]):
        key = f"eval/{self.config.metric_for_best_model}"
        value = metrics.get(key, metrics.get(self.config.metric_for_best_model))
        if value is None:
            return
        better = (
            self.state.best_metric is None
            or (self.config.metric_maximize and value > self.state.best_metric)
            or (not self.config.metric_maximize and value < self.state.best_metric)
        )
        if better:
            self.state.best_metric = float(value)
            path = self.save_checkpoint(name="checkpoint_best")
            self.state.best_model_checkpoint = path

    def evaluate(self) -> Dict[str, float]:
        self._prepare()
        accumulator = Accumulator()
        for i, batch in enumerate(
            self._iter_batches(self.eval_dataset, self.config.eval_batch_size, False, 0)
        ):
            if self.config.eval_batches is not None and i >= self.config.eval_batches:
                break
            # deterministic but decorrelated across eval batches (the MMD
            # prior subsample would otherwise reuse one sample every batch)
            metrics = self._eval_step(
                self.params, batch, jax.random.fold_in(jax.random.PRNGKey(0), i)
            )
            accumulator.update(metrics)  # fetched in one device_get at means()
        metrics = {f"eval/{k}": v for k, v in accumulator.means().items()}
        self.state.log_history.append({"step": self.state.global_step, **metrics})
        self.callback_handler.on_log(self.config, self.state, self.control, logs=metrics)
        return metrics

    def save_checkpoint(self, name: str = "checkpoint_last") -> str:
        import dataclasses as dc

        path = os.path.join(self.config.output_dir, name)
        save_checkpoint(
            path,
            self.params,
            opt_state=self.opt_state if self.config.save_optimizer else None,
            use_async=self.config.async_checkpoint,
            sharded=self.config.sharded_checkpoint,
            trainer_state={
                "epoch": self.state.epoch,
                "global_step": self.state.global_step,
                "best_metric": self.state.best_metric,
                **(
                    {"plateau": self._plateau.state_dict()}
                    if self._plateau is not None
                    else {}
                ),
            },
            model_config=to_dict(self.model_config) if self.model_config is not None else None,
        )
        self.state.save_to_json(os.path.join(path, "trainer_state.json"))
        # ship the tokenizer config so checkpoints are renderable standalone
        dataset = self.train_dataset or self.eval_dataset
        tokenizer = getattr(dataset, "tokenizer", None)
        if tokenizer is not None:
            tokenizer.save(os.path.join(path, "tokenizer.json"))
        return path


def optax_global_norm(tree) -> jnp.ndarray:
    leaves = jax.tree.leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(x)) for x in leaves))


def _to_jnp(batch: Dict[str, np.ndarray]) -> Dict[str, jnp.ndarray]:
    return {k: jnp.asarray(v) for k, v in batch.items()}
