"""Checkpointing on orbax.

Counterpart of the reference torch.save payload (trainer.py:296-347):
{model config, params, optimizer state, trainer state, tokenizer config} with
best-metric copies and warm-start key filtering (models/base.py:54-93).
"""
from __future__ import annotations

import os
import re
import shutil
from typing import Any, Dict, List, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from ..utils import dump_json, load_json


_ASYNC_CKPTR: Optional[ocp.AsyncCheckpointer] = None


def _async_checkpointer() -> ocp.AsyncCheckpointer:
    global _ASYNC_CKPTR
    if _ASYNC_CKPTR is None:
        _ASYNC_CKPTR = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
    return _ASYNC_CKPTR


def wait_for_async_saves() -> None:
    """Block until every in-flight async checkpoint write has committed."""
    if _ASYNC_CKPTR is not None:
        _ASYNC_CKPTR.wait_until_finished()


def save_checkpoint(
    directory: str,
    params,
    opt_state=None,
    trainer_state: Optional[Dict] = None,
    model_config: Optional[Dict] = None,
    extra_meta: Optional[Dict] = None,
    use_async: bool = False,
    sharded: bool = False,
) -> str:
    """With `use_async`, arrays are fetched to host synchronously (so the
    caller may keep donating/mutating device buffers) but the disk commit runs
    on orbax's background thread — the train loop resumes immediately. Any
    previous in-flight save is awaited first so repeated saves into the same
    rewritten directory (e.g. checkpoint_last) cannot race their own cleanup.
    Call `wait_for_async_saves()` (the Trainer does, in its final-save path)
    before reading a just-written checkpoint or exiting the process.

    `sharded=True` hands orbax the (possibly mesh-sharded) ``jax.Array``
    leaves directly instead of host-gathering the full tree — each process
    serializes only its addressable shards, so a ZeRO-partitioned optimizer
    state never materializes unsharded host copies (the host-gather path
    peaks at full-tree host memory per save). Restore either way:
    `load_checkpoint` yields host arrays, `restore_sharded` lays shards out
    directly onto a target mesh (which may differ from the saving one).
    Under `use_async`, orbax performs the device→host shard copies
    synchronously before backgrounding the write, so donated buffers stay
    safe."""
    directory = os.path.abspath(directory)
    if use_async:
        wait_for_async_saves()
    if os.path.exists(directory):
        shutil.rmtree(directory)
    os.makedirs(directory, exist_ok=True)

    p_payload = params if sharded else jax.device_get(params)
    o_payload = (
        (opt_state if sharded else jax.device_get(opt_state))
        if opt_state is not None else None
    )
    if use_async:
        ckptr = _async_checkpointer()
        ckptr.save(os.path.join(directory, "params"), p_payload)
        if o_payload is not None:
            ckptr.save(os.path.join(directory, "opt_state"), o_payload)
    else:
        with ocp.PyTreeCheckpointer() as ckptr:
            ckptr.save(os.path.join(directory, "params"), p_payload)
            if o_payload is not None:
                ckptr.save(os.path.join(directory, "opt_state"), o_payload)

    meta: Dict[str, Any] = {}
    if trainer_state is not None:
        meta["trainer_state"] = trainer_state
    if model_config is not None:
        meta["model_config"] = model_config
    if extra_meta:
        meta.update(extra_meta)
    dump_json(meta, os.path.join(directory, "meta.json"))
    return directory


def load_checkpoint(
    directory: str, params_template=None, opt_state_template=None
) -> Dict[str, Any]:
    directory = os.path.abspath(directory)
    wait_for_async_saves()  # never read a checkpoint mid-commit
    out: Dict[str, Any] = {}
    with ocp.PyTreeCheckpointer() as ckptr:
        params_path = os.path.join(directory, "params")
        if os.path.exists(params_path):
            if params_template is not None:
                ref = jax.tree.map(ocp.utils.to_shape_dtype_struct, jax.device_get(params_template))
                out["params"] = ckptr.restore(params_path, item=ref)
            else:
                out["params"] = ckptr.restore(params_path)
        opt_path = os.path.join(directory, "opt_state")
        if os.path.exists(opt_path):
            if opt_state_template is not None:
                ref = jax.tree.map(ocp.utils.to_shape_dtype_struct, jax.device_get(opt_state_template))
                out["opt_state"] = ckptr.restore(opt_path, item=ref)
            else:
                out["opt_state"] = ckptr.restore(opt_path)
    meta_path = os.path.join(directory, "meta.json")
    if os.path.exists(meta_path):
        out.update(load_json(meta_path))
    return out


def _abstract_with_sharding(tree):
    """ShapeDtypeStruct tree carrying each leaf's sharding (for device-direct
    restore). Leaves may be jax.Arrays or already-abstract structs."""
    def leaf(x):
        sharding = getattr(x, "sharding", None)
        if sharding is not None:
            return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=sharding)
        return ocp.utils.to_shape_dtype_struct(x)

    return jax.tree.map(leaf, tree)


def restore_sharded(
    directory: str, params_target, opt_state_target=None
) -> Dict[str, Any]:
    """Restore params (and optionally the optimizer state) DIRECTLY onto the
    target tree's shardings — shards stream from disk to their devices with
    no host-gathered full-tree intermediate. The targets are trees of
    ``jax.Array`` (or ``ShapeDtypeStruct`` with ``.sharding``) whose mesh may
    DIFFER from the one the checkpoint was written under: orbax re-lays the
    stored shards onto the requested sharding on read (cross-topology elastic
    restore; tests/test_parallel.py::TestShardedCheckpoint)."""
    directory = os.path.abspath(directory)
    wait_for_async_saves()
    out: Dict[str, Any] = {}
    with ocp.PyTreeCheckpointer() as ckptr:
        ref = _abstract_with_sharding(params_target)
        out["params"] = ckptr.restore(
            os.path.join(directory, "params"),
            item=ref,
            restore_args=ocp.checkpoint_utils.construct_restore_args(ref),
        )
        if opt_state_target is not None and os.path.exists(
            os.path.join(directory, "opt_state")
        ):
            oref = _abstract_with_sharding(opt_state_target)
            out["opt_state"] = ckptr.restore(
                os.path.join(directory, "opt_state"),
                item=oref,
                restore_args=ocp.checkpoint_utils.construct_restore_args(oref),
            )
    meta_path = os.path.join(directory, "meta.json")
    if os.path.exists(meta_path):
        out.update(load_json(meta_path))
    return out


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/" if prefix or True else k))
    else:
        out[prefix[:-1]] = tree
    return out


def warm_start_params(
    params,
    loaded_params,
    ignore_layers: Optional[List[str]] = None,
    ignore_mismatched: bool = True,
    verbose: bool = True,
):
    """Copy matching keys from `loaded_params` into `params`, skipping listed
    or shape-mismatched keys (reference base.py:54-93)."""
    ignore_layers = ignore_layers or []

    flat_new = _flatten(params)
    flat_old = _flatten(loaded_params)

    used = {}
    skipped = []
    for key, value in flat_new.items():
        if key in flat_old and not any(re.search(p, key) for p in ignore_layers):
            old = flat_old[key]
            if tuple(np.shape(old)) == tuple(np.shape(value)):
                used[key] = old
                continue
            if not ignore_mismatched:
                raise ValueError(f"shape mismatch for {key}: {np.shape(old)} vs {np.shape(value)}")
        skipped.append(key)

    if verbose and skipped:
        print(f"warm start: skipped {len(skipped)} keys (e.g. {skipped[:5]})")

    def rebuild(tree, prefix=""):
        if isinstance(tree, dict):
            return {k: rebuild(v, f"{prefix}{k}/") for k, v in tree.items()}
        key = prefix[:-1]
        return used.get(key, tree)

    return rebuild(params)


def freeze_mask(params, finetune_layers: List[str]):
    """True = trainable. When `finetune_layers` is non-empty, only matching
    paths train (reference trainer.py:386-387 + base.py:95-102)."""
    if not finetune_layers:
        return jax.tree.map(lambda _: True, params)

    flat = _flatten(params)
    decisions = {
        key: any(re.search(p, key) for p in finetune_layers) for key in flat
    }

    def rebuild(tree, prefix=""):
        if isinstance(tree, dict):
            return {k: rebuild(v, f"{prefix}{k}/") for k, v in tree.items()}
        return decisions[prefix[:-1]]

    return rebuild(params)
