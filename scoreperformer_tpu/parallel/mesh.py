"""Device mesh and sharding utilities.

The reference is single-device (SURVEY §2.8); this framework is mesh-native:
a (data, model) mesh with batch sharded over `data` and optional tensor
sharding of the large Dense kernels over `model`. Gradients are averaged by
the psum XLA inserts for replicated params — no explicit collectives here.
"""
from __future__ import annotations

import re
from typing import Dict, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"
EXPERT_AXIS = "expert"


def make_mesh(
    data: Optional[int] = None, model: int = 1, expert: int = 1, devices=None
) -> Mesh:
    """Build a (data, model) mesh over the available devices; with
    ``expert > 1`` a third `expert` axis is appended (MoE layers —
    models/moe.py — shard their stacked expert kernels and dispatched
    activations over it)."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data is None:
        data = n // (model * expert)
    assert data * model * expert == n, (
        f"mesh {data}x{model}x{expert} != {n} devices"
    )
    if expert > 1:
        device_array = np.asarray(devices).reshape(data, model, expert)
        return Mesh(device_array, (DATA_AXIS, MODEL_AXIS, EXPERT_AXIS))
    device_array = np.asarray(devices).reshape(data, model)
    return Mesh(device_array, (DATA_AXIS, MODEL_AXIS))


# Default tensor-parallel rules: shard the widest kernels over `model`.
# Everything else replicates. (The flagship is small — dim 256 — so these
# only engage when a model axis > 1 is requested.)
DEFAULT_PARTITION_RULES: Tuple[Tuple[str, P], ...] = (
    (r".*feed_forward.*proj_in.*kernel", P(None, MODEL_AXIS)),
    (r".*proj_in.*kernel", P(None, MODEL_AXIS)),
    (r".*proj_out.*kernel", P(MODEL_AXIS, None)),
    (r".*(to_q|to_k|to_v)\/kernel", P(None, MODEL_AXIS)),
    (r".*to_out\/kernel", P(MODEL_AXIS, None)),
)


# Expert-parallel rules: stacked MoE expert kernels (models/moe.py — leading
# axis = experts) shard over `expert`; the router stays replicated. Anchored
# to the MoE module scope (layer_N_ff) so an unrelated future param named
# wi/wo can't be silently expert-sharded.
EXPERT_PARTITION_RULES: Tuple[Tuple[str, P], ...] = (
    (r".*_ff/(wi|wo)", P(EXPERT_AXIS, None, None)),
    (r".*_ff/(bi|bo)", P(EXPERT_AXIS, None)),
)


def partition_spec_for(path: str, rules=DEFAULT_PARTITION_RULES) -> P:
    for pattern, spec in rules:
        if re.fullmatch(pattern, path):
            return spec
    return P()


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)


def params_shardings(params, mesh: Mesh, rules=DEFAULT_PARTITION_RULES):
    """NamedSharding tree matching `params` (replicate by default). Expert
    rules engage automatically when the mesh carries an `expert` axis."""
    if mesh.shape.get(MODEL_AXIS, 1) <= 1:
        rules = ()
    if mesh.shape.get(EXPERT_AXIS, 1) > 1:
        rules = tuple(rules) + EXPERT_PARTITION_RULES

    def spec(path, leaf):
        p = partition_spec_for(_path_str(path), rules)
        # only shard when divisible
        if p != P():
            axes = [a for a in p if a is not None]
            for dim, axis in zip(range(leaf.ndim), p):
                if axis is not None and leaf.shape[dim] % mesh.shape[axis] != 0:
                    return NamedSharding(mesh, P())
        return NamedSharding(mesh, p)

    return jax.tree_util.tree_map_with_path(spec, params)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading batch dim over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


# ---------------------------------------------------------------------------
# Sequence-parallel activation sharding (Megatron-SP dataflow, GSPMD-style).
#
# When a model axis > 1 is in use, the tensor-parallel Dense kernels already
# shard the matmul FLOPs — but the residual stream between blocks (layernorm,
# residual adds, dropout) is replicated over `model`, and so are the saved
# activations the backward pass keeps. Annotating the residual stream as
# P(data, model, None) (sequence axis sharded over `model`) lets XLA run the
# elementwise/LN region fully sharded and turn the TP all-reduces into
# reduce-scatter + all-gather pairs, cutting activation memory ~model-fold.
# The transformer stack calls `shard_seq_activations` after every residual
# add; it is a no-op unless a sharding has been installed (trainer flag
# `sequence_parallel`) and the activation shape divides the mesh.
# ---------------------------------------------------------------------------

_ACTIVATION_SHARDING: Optional[NamedSharding] = None


def sequence_parallel_sharding(mesh: Mesh) -> NamedSharding:
    """(batch, seq, dim) activations: batch over `data`, seq over `model`."""
    return NamedSharding(mesh, P(DATA_AXIS, MODEL_AXIS, None))


def set_activation_sharding(sharding: Optional[NamedSharding]) -> None:
    """Install (or clear, with None) the global activation sharding applied
    by `shard_seq_activations` at trace time."""
    global _ACTIVATION_SHARDING
    _ACTIVATION_SHARDING = sharding


class activation_sharding:
    """Context manager: install a sequence-parallel activation sharding for
    the duration of a trace (tests / ad-hoc jits)."""

    def __init__(self, mesh: Mesh):
        self.sharding = sequence_parallel_sharding(mesh)

    def __enter__(self):
        self._prev = _ACTIVATION_SHARDING
        set_activation_sharding(self.sharding)
        return self.sharding

    def __exit__(self, *exc):
        set_activation_sharding(self._prev)
        return False


def shard_seq_activations(x):
    """Constrain a (batch, seq, dim) activation to the installed
    sequence-parallel sharding; identity when none is installed or the
    static shape does not divide the mesh axes.

    Inside a `shard_map` that is manual over data/pipe but GSPMD-auto over
    `model` (the composed pipeline x tensor-parallel path,
    parallel/pipeline.py), the constraint is re-expressed against the
    current *abstract* mesh with the manual axes dropped — a spec may only
    mention auto axes there."""
    s = _ACTIVATION_SHARDING
    if s is None or getattr(x, "ndim", 0) != 3:
        return x
    data_n = s.mesh.shape.get(DATA_AXIS, 1)
    model_n = s.mesh.shape.get(MODEL_AXIS, 1)
    if model_n <= 1 or x.shape[1] % model_n:
        return x

    abstract = jax.sharding.get_abstract_mesh()
    manual_axes = (
        set()
        if abstract.empty
        else {
            name
            for name, ty in zip(abstract.axis_names, abstract.axis_types)
            if ty == jax.sharding.AxisType.Manual
        }
    )
    if manual_axes:
        if MODEL_AXIS in manual_axes or MODEL_AXIS not in abstract.axis_names:
            return x  # model axis unavailable for auto sharding here
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(abstract, P(None, MODEL_AXIS, None))
        )
    if x.shape[0] % data_n:
        return x
    return jax.lax.with_sharding_constraint(x, s)


# ---------------------------------------------------------------------------
# Expert-parallel activation sharding (GShard dataflow).
#
# MoE layers (models/moe.py) dispatch tokens into a static-capacity
# (experts, batch, capacity, dim) tensor with batched einsums. Constraining
# that tensor to P(expert, data, None, None) while the expert kernels are
# sharded P(expert, ...) makes XLA insert the all-to-alls over ICI and run
# each expert's matmuls only on the devices owning it. Installed by the
# trainer / dryrun when the mesh has an `expert` axis; `shard_expert_acts`
# is a no-op otherwise, so the layer stays mesh-agnostic.
# ---------------------------------------------------------------------------

_EXPERT_SHARDING: Optional[NamedSharding] = None


def expert_sharding(mesh: Mesh) -> NamedSharding:
    """(experts, batch, capacity, dim) dispatched activations: experts over
    `expert`, batch over `data`."""
    return NamedSharding(mesh, P(EXPERT_AXIS, DATA_AXIS, None, None))


def set_expert_sharding(sharding: Optional[NamedSharding]) -> None:
    """Install (or clear, with None) the sharding applied by
    `shard_expert_acts` at trace time."""
    global _EXPERT_SHARDING
    _EXPERT_SHARDING = sharding


class expert_parallel:
    """Context manager: install an expert-parallel activation sharding for
    the duration of a trace (tests / ad-hoc jits)."""

    def __init__(self, mesh: Mesh):
        self.sharding = expert_sharding(mesh)

    def __enter__(self):
        self._prev = _EXPERT_SHARDING
        set_expert_sharding(self.sharding)
        return self.sharding

    def __exit__(self, *exc):
        set_expert_sharding(self._prev)
        return False


def shard_expert_acts(x):
    """Constrain an (experts, batch, capacity, dim) dispatched-activation
    tensor to the installed expert sharding; identity when none is installed
    or the static shape does not divide the mesh axes."""
    s = _EXPERT_SHARDING
    if s is None or getattr(x, "ndim", 0) != 4:
        return x
    expert_n = s.mesh.shape.get(EXPERT_AXIS, 1)
    data_n = s.mesh.shape.get(DATA_AXIS, 1)
    if expert_n <= 1 or x.shape[0] % expert_n or x.shape[1] % data_n:
        return x
    return jax.lax.with_sharding_constraint(x, s)


def _zero_spec(leaf, mesh: Mesh) -> P:
    """ZeRO spec for one optimizer-state buffer: shard its largest
    data-axis-divisible dimension; scalars and indivisible shapes replicate."""
    n = mesh.shape[DATA_AXIS]
    if n <= 1 or getattr(leaf, "ndim", 0) == 0:
        return P()
    candidates = [
        (size, dim) for dim, size in enumerate(leaf.shape) if size % n == 0 and size >= n
    ]
    if not candidates:
        return P()
    _, dim = max(candidates)
    spec = [None] * leaf.ndim
    spec[dim] = DATA_AXIS
    return P(*spec)


def opt_state_shardings(opt_state, mesh: Mesh, zero: bool = True):
    """Optimizer-state placement (SURVEY §2.8 ZeRO-style sharding).

    With ``zero``, every moment buffer (adam mu/nu etc.) is sharded over the
    DATA axis on its largest divisible dimension instead of replicated —
    ZeRO-1 dataflow: the elementwise optimizer update runs sharded and XLA
    all-gathers only the parameter updates. Memory per device for optimizer
    state drops ~data_axis-fold; irrelevant at the 11.6M-param flagship but
    first-class for larger configs. Scalar leaves (step counts) replicate.
    """

    def spec(leaf):
        if not hasattr(leaf, "shape"):
            return NamedSharding(mesh, P())
        return NamedSharding(mesh, _zero_spec(leaf, mesh) if zero else P())

    return jax.tree.map(spec, opt_state, is_leaf=lambda x: hasattr(x, "shape"))


def shard_opt_state(opt_state, mesh: Mesh, zero: bool = True):
    return jax.device_put(opt_state, opt_state_shardings(opt_state, mesh, zero))


def shard_params(params, mesh: Mesh, rules=DEFAULT_PARTITION_RULES):
    shardings = params_shardings(params, mesh, rules)
    return jax.device_put(params, shardings)


def shard_batch(batch: Dict, mesh: Mesh) -> Dict:
    sharding = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def maybe_distributed_initialize(config) -> bool:
    """Best-effort `jax.distributed.initialize()` for multi-host (DCN) runs.

    The reference is single-device (SURVEY §2.8); the TPU-native answer to
    multi-host is JAX's runtime: call this ONCE at program start (before any
    other jax API touches the backend), then build the mesh over the global
    `jax.devices()`. On TPU pods all arguments auto-detect; on CPU/GPU
    clusters set coordinator_address/num_processes/process_id explicitly.

    Returns True if initialization ran, False if it was skipped (single
    process) or the backend was already initialized (warned, not fatal —
    single-process runs and tests hit this path).
    """
    if config.num_processes in (None, 0, 1) and config.coordinator_address is None:
        return False  # single-process: nothing to coordinate
    try:
        jax.distributed.initialize(
            coordinator_address=config.coordinator_address,
            num_processes=config.num_processes,
            process_id=config.process_id,
        )
        return True
    except RuntimeError as e:
        import warnings

        warnings.warn(
            "jax.distributed.initialize() failed (backend already initialized?). "
            "For multi-host runs call it at program start — train.py does this "
            f"when trainer.multihost is set. Original error: {e}",
            stacklevel=2,
        )
        return False


def host_local_to_global_batch(batch: Dict, sharding: NamedSharding) -> Dict:
    """Assemble per-process host-local batches into global sharded arrays
    (multi-host feeding via jax.make_array_from_process_local_data)."""
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sharding, np.asarray(x)),
        batch,
    )
