"""GPipe-style pipeline parallelism over a `pipe` mesh axis.

The reference is single-device; SURVEY §2.8 lists pipeline parallelism as
absent there and this framework provides it as a first-class option so the
transformer trunk can scale past one chip's HBM on deep configs.

Design (TPU-idiomatic, not a port of any torch PP engine):

- The trunk's **depth units** — one (attention, feed-forward) block pair of a
  `TransformerStack` with the ('a', 'f') layer pattern — have identical param
  pytrees, so their per-layer params restack into one pytree with a leading
  ``depth`` axis (`stack_unit_params`). That axis is sharded over the `pipe`
  mesh axis: each stage holds ``depth / pipe`` contiguous units and applies
  them with a `lax.scan`.
- `pipeline_apply` runs the classic GPipe microbatch schedule inside
  `jax.shard_map`: over ``M + S - 1`` ticks, stage 0 feeds microbatches in,
  every stage applies its units, and activations hop stage→stage with
  `lax.ppermute` (ICI neighbour traffic; no host round-trips). Bubble-tick
  outputs are dead dataflow that XLA eliminates; the last stage's outputs are
  gathered with a masked `psum`, so the result is replicated over `pipe` and
  sharded over `data` — composable with the data-parallel batch axis.
- The whole schedule is differentiable (ppermute/psum have exact transposes),
  so `jax.grad` through `pipeline_apply` yields per-stage grads for the
  stacked params with the same collectives reversed.

Scope: training/evaluation forward of the trunk. Embeddings, heads, and the
final norm stay replicated (negligible at these model sizes — the trunk is
where the depth lives). Autoregressive decode keeps the data-sharded batched
path (`tests/test_parallel.py::test_sharded_batched_decode...`) — at these
depths a pipeline would only add bubble latency to the sequential scan.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from jax.sharding import NamedSharding

from .mesh import DATA_AXIS, MODEL_AXIS, _path_str, partition_spec_for

PIPE_AXIS = "pipe"


def make_pipeline_mesh(
    pipe: int, data: int = 1, model: int = 1, devices=None
) -> Mesh:
    """(data, pipe[, model]) mesh: batch over `data`, trunk depth over
    `pipe`, and optionally tensor-parallel kernels over `model` (the `model`
    axis stays GSPMD-auto inside the pipeline shard_map)."""
    devices = devices if devices is not None else jax.devices()
    assert data * pipe * model == len(devices), (
        f"mesh {data}x{pipe}x{model} != {len(devices)} devices"
    )
    if model > 1:
        return Mesh(
            np.asarray(devices).reshape(data, pipe, model),
            (DATA_AXIS, PIPE_AXIS, MODEL_AXIS),
        )
    return Mesh(np.asarray(devices).reshape(data, pipe), (DATA_AXIS, PIPE_AXIS))


def make_unit_module(config):
    """A depth-1 `TransformerStack` (no final norm): one pipeline depth unit."""
    from ..models.transformer import TransformerStack

    assert not config.cross_attend, (
        "pipeline_apply supports the ('a','f') layer pattern; cross-attend "
        "stacks keep the data/tensor-parallel paths"
    )
    if config.feed_forward.num_experts > 1:
        # MoE (especially moe_stride > 1, mixing dense and MoE FF param
        # trees) breaks the homogeneous-unit restack assumption
        raise NotImplementedError(
            "pipeline parallelism does not compose with MoE feed-forward "
            "(num_experts > 1): depth units no longer share one param tree"
        )
    unit_cfg = dataclasses.replace(config, depth=1, final_norm=False)
    return TransformerStack(config=unit_cfg)


def stack_unit_params(stack_params: Dict[str, Any], depth: int) -> Dict[str, Any]:
    """Restack a depth-D `TransformerStack`'s per-layer params into the
    depth-1 unit's names with a leading ``depth`` axis.

    Unit u owns layers 2u (attention) and 2u+1 (feed-forward) plus their
    pre/post norms; all units share one pytree structure, so each leaf is a
    `jnp.stack` over units.
    """
    renames = {
        "layer_0_attn": "layer_{a}_attn",
        "layer_0_norm": "layer_{a}_norm",
        "layer_1_ff": "layer_{f}_ff",
        "layer_1_norm": "layer_{f}_norm",
    }
    units = []
    for u in range(depth):
        unit = {
            dst: stack_params[src.format(a=2 * u, f=2 * u + 1)]
            for dst, src in renames.items()
        }
        units.append(unit)
    return jax.tree.map(lambda *xs: jnp.stack(xs), *units)


def stacked_params_shardings(stacked: Dict[str, Any], mesh: Mesh):
    """NamedShardings for a `stack_unit_params` tree on a
    (data, pipe[, model]) mesh: the leading depth axis shards over `pipe`;
    when the mesh carries a `model` axis, the tensor-parallel kernel rules
    (mesh.DEFAULT_PARTITION_RULES) apply shifted one dim right. The `model`
    axis stays GSPMD-auto inside `pipeline_apply`'s shard_map, so XLA
    inserts its collectives per stage."""
    has_model = mesh.shape.get(MODEL_AXIS, 1) > 1

    def spec(path, leaf):
        axes = [PIPE_AXIS] + [None] * (leaf.ndim - 1)
        if has_model:
            tp = partition_spec_for(_path_str(path))
            for i, axis in enumerate(tp):
                if (
                    axis is not None
                    and i + 1 < leaf.ndim
                    and leaf.shape[i + 1] % mesh.shape[axis] == 0
                ):
                    axes[i + 1] = axis
        return NamedSharding(mesh, P(*axes))

    return jax.tree_util.tree_map_with_path(spec, stacked)


def unstack_unit_tree(stacked: Dict[str, Any], depth: int) -> Dict[str, Any]:
    """Inverse of `stack_unit_params` (e.g. to map pipeline grads back onto
    the flat per-layer param names)."""
    out: Dict[str, Any] = {}
    for u in range(depth):
        unit = jax.tree.map(lambda x: x[u], stacked)
        out[f"layer_{2 * u}_attn"] = unit["layer_0_attn"]
        out[f"layer_{2 * u}_norm"] = unit["layer_0_norm"]
        out[f"layer_{2 * u + 1}_ff"] = unit["layer_1_ff"]
        out[f"layer_{2 * u + 1}_norm"] = unit["layer_1_norm"]
    return out


def _split_microbatches(a: Optional[jnp.ndarray], m: int):
    if a is None:
        return None
    assert a.shape[0] % m == 0, f"batch {a.shape[0]} % microbatches {m} != 0"
    return a.reshape((m, a.shape[0] // m) + a.shape[1:])


def pipeline_apply(
    unit_module,
    stacked_params: Dict[str, Any],
    x: jnp.ndarray,
    mesh: Mesh,
    num_microbatches: int,
    mask: Optional[jnp.ndarray] = None,
    style_embeddings: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Run the trunk over a (data, pipe) mesh with the GPipe schedule.

    Args:
      unit_module: `make_unit_module(config)` — the depth-1 stack.
      stacked_params: `stack_unit_params(...)` pytree, leading axis = depth.
      x: (batch, seq, dim) trunk input (global array).
      mesh: mesh with a `pipe` axis (and optionally `data`).
      num_microbatches: M; batch must divide by M, and batch/M by the data
        axis size.
      mask: optional (batch, seq) padding mask.
      style_embeddings: optional (batch, seq, e) / (batch, e) AdaLN condition.

    Returns (batch, seq, dim) trunk output (before any final norm).
    """
    stages = mesh.shape[PIPE_AXIS]
    depth = jax.tree.leaves(stacked_params)[0].shape[0]
    assert depth % stages == 0, f"depth {depth} % pipe {stages} != 0"
    m = num_microbatches
    batch = x.shape[0]
    data_n = mesh.shape.get(DATA_AXIS, 1)
    assert (batch // m) % data_n == 0, (
        f"microbatch {batch // m} must divide the data axis {data_n}"
    )

    mbs = _split_microbatches(x, m)
    mb_spec = P(None, DATA_AXIS) if DATA_AXIS in mesh.axis_names else P(None)

    args: List[jnp.ndarray] = [stacked_params, mbs]
    specs: List[Any] = [P(PIPE_AXIS), mb_spec]
    has_mask = mask is not None
    has_style = style_embeddings is not None
    if has_mask:
        args.append(_split_microbatches(mask, m))
        specs.append(mb_spec)
    if has_style:
        args.append(_split_microbatches(style_embeddings, m))
        specs.append(mb_spec)

    def stage_fn(local_params, mbs_local, *rest):
        rest = list(rest)
        mmask = rest.pop(0) if has_mask else None
        msty = rest.pop(0) if has_style else None
        sid = jax.lax.axis_index(PIPE_AXIS)
        perm = [(i, i + 1) for i in range(stages - 1)]

        def apply_units(h, mb_mask, mb_sty):
            def body(carry, unit_params):
                y, _, _ = unit_module.apply(
                    {"params": unit_params},
                    carry,
                    mask=mb_mask,
                    style_embeddings=mb_sty,
                    deterministic=True,
                )
                return y, None

            h, _ = jax.lax.scan(body, h, local_params)
            return h

        recv = jnp.zeros_like(mbs_local[0])
        outs = jnp.zeros_like(mbs_local)
        for t in range(m + stages - 1):
            # stage s processes microbatch (t - s) at tick t; out-of-range
            # ticks compute dead dataflow that never reaches `outs`
            inp = jnp.where(sid == 0, mbs_local[min(t, m - 1)], recv)
            midx = jnp.clip(t - sid, 0, m - 1)
            mb_mask = (
                jax.lax.dynamic_index_in_dim(mmask, midx, 0, keepdims=False)
                if has_mask
                else None
            )
            mb_sty = (
                jax.lax.dynamic_index_in_dim(msty, midx, 0, keepdims=False)
                if has_style
                else None
            )
            y = apply_units(inp, mb_mask, mb_sty)
            if t >= stages - 1:
                outs = jax.lax.dynamic_update_index_in_dim(
                    outs, y, t - (stages - 1), 0
                )
            if perm:
                recv = jax.lax.ppermute(y, PIPE_AXIS, perm)
        # only the last stage's buffer holds real outputs; the masked psum
        # replicates them across `pipe`
        outs = jnp.where(sid == stages - 1, outs, jnp.zeros_like(outs))
        return jax.lax.psum(outs, PIPE_AXIS)

    # manual over data/pipe; any further mesh axes (e.g. `model` for tensor
    # parallelism of the per-stage kernels) stay GSPMD-auto: param/activation
    # shardings over them flow through and XLA inserts their collectives
    manual = {PIPE_AXIS} | ({DATA_AXIS} if DATA_AXIS in mesh.axis_names else set())
    out = jax.shard_map(
        stage_fn,
        mesh=mesh,
        in_specs=tuple(specs),
        out_specs=mb_spec,
        check_vma=False,
        axis_names=frozenset(manual),
    )(*args)
    return out.reshape((batch,) + x.shape[1:])
