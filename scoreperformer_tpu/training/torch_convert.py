"""Reference (PyTorch) checkpoint → flax params conversion.

Maps the reference ScorePerformer state_dict naming
(models/scoreperformer/{model,transformer,embeddings,mmd_transformer}.py,
modules/transformer/*) onto this framework's parameter tree so users of the
reference can carry their trained weights over.

Conventions handled:
- torch Linear weight (out, in) → flax Dense kernel (in, out) [transpose]
- LayerNorm weight/bias → scale/bias
- per-stream embeddings: nn.Embedding.weight / DiscreteDenseContinuous
  index_weight + value_layer MLP → StreamEmbedding index_weight + value_{i}
- the perf_decoder LM wrapper prefix (`perf_decoder.model.` → `perf_decoder.`)
- tied token embeddings (shared_emb_<Key> at the root when tie_token_emb)
- MMD VAE heads (`vae_head.<mode>.linear` → `vae_<mode>.linear`)
- AdaLayerNorm (`...0.0.linear` → `layer_{i}_norm.to_gamma_beta`)

The reference cannot execute in this environment (miditok is absent), so the
mapping is validated structurally: a synthetic reference-shaped state dict
must fill every parameter of the flax tree (tests/test_torch_convert.py).
"""
from __future__ import annotations

import re
from typing import Dict, List, Optional, Tuple

import numpy as np


def _torch_name_for(path: List[str]) -> Optional[Tuple[str, str]]:
    """flax param path → (torch state_dict name, transform).

    transform ∈ {"t" (transpose 2D), "id"}. Returns None when the parameter
    has no reference counterpart (should not happen for converted models).
    """
    parts = list(path)

    # --- submodel prefix ---
    prefix = ""
    if parts[0].startswith("shared_emb_"):
        key = parts[0][len("shared_emb_"):]
        return _embedding_leaf(f"perf_decoder.model.token_emb.embs.{key}", parts[1:])
    if parts[0] == "score_encoder":
        prefix = "score_encoder."
        parts = parts[1:]
    elif parts[0] == "perf_encoder":
        prefix = "perf_encoder."
        parts = parts[1:]
        if parts and parts[0] == "transformer":
            # MMD inherits TupleTransformer in the reference: unwrap one level
            parts = parts[1:]
        if parts and parts[0].startswith("vae_"):
            mode = parts[0][len("vae_"):]
            # MMDVAE.linear
            return (f"{prefix}vae_head.{mode}.linear.{_wb(parts[-1])}", "t" if parts[-1] == "kernel" else "id")
    elif parts[0] == "perf_decoder":
        prefix = "perf_decoder.model."
        parts = parts[1:]
    elif parts[0] == "classifiers":
        # classifiers.head_<G>.(layer_{i}|out).(kernel|bias)
        group = parts[1][len("head_"):]
        layer = parts[2]
        leaf = parts[3]
        if layer == "out":
            idx = "last"
        else:
            idx = int(layer[len("layer_"):]) * 2
        name = f"classifiers.heads.{group}.layers.{{{idx}}}.{_wb(leaf)}"
        return (name, "t" if leaf == "kernel" else "id")
    elif parts[0] == "transformer" and len(parts) > 1 and parts[1] in (
        "token_emb", "pos_emb", "emb_norm", "project_emb", "transformer", "final_norm", "lm_head",
    ):
        # Performer: PerformerModel.transformer → reference transformer.model.*
        prefix = "transformer.model."
        parts = parts[1:]

    return _tuple_transformer_leaf(prefix, parts)


def _wb(leaf: str) -> str:
    return {"kernel": "weight", "scale": "weight"}.get(leaf, leaf)


def _embedding_leaf(base: str, parts: List[str]) -> Tuple[str, str]:
    """StreamEmbedding params → Discrete(Dense)ContinuousEmbedding names."""
    leaf = parts[-1]
    if parts[0] == "index_weight":
        return (f"{base}.index_weight", "id")
    if parts[0] == "value":  # simple continuous: Linear(1, D, bias=False)
        return (f"{base}.value_layer.{_wb(leaf)}", "t" if leaf == "kernel" else "id")
    m = re.fullmatch(r"value_(\d+)", parts[0])
    if m:  # dense: value_layer.<i>.0 Linear
        return (
            f"{base}.value_layer.{m.group(1)}.0.{_wb(leaf)}",
            "t" if leaf == "kernel" else "id",
        )
    raise KeyError(f"unknown embedding leaf {parts}")


def _tuple_transformer_leaf(prefix: str, parts: List[str]) -> Optional[Tuple[str, str]]:
    leaf = parts[-1]
    head = parts[0]

    if head == "token_emb":
        sub = parts[1]
        if sub.startswith("emb_"):
            key = sub[len("emb_"):]
            return _embedding_leaf(f"{prefix}token_emb.embs.{key}", parts[2:])
        if sub == "norm":
            return (f"{prefix}token_emb.norm.{_wb(leaf)}", "id")
        if sub == "project_kernel":
            return (f"{prefix}token_emb.project_emb.weight", "t")
        if sub == "project_bias":
            return (f"{prefix}token_emb.project_emb.bias", "id")
        if sub == "project_multiemb":
            return (
                f"{prefix}token_emb.project_multiemb.{_wb(leaf)}",
                "t" if leaf == "kernel" else "id",
            )
    if head == "pos_emb":
        return (f"{prefix}pos_emb.emb.weight", "id")
    if head == "emb_norm":
        return (f"{prefix}emb_norm.{_wb(leaf)}", "id")
    if head == "project_emb":
        return (f"{prefix}project_emb.{_wb(leaf)}", "t" if leaf == "kernel" else "id")
    if head == "lm_head":
        sub = parts[1]
        if sub == "norm":
            return (f"{prefix}lm_head.norm.{_wb(leaf)}", "id")
        if sub == "project":  # non-reused projection
            return (f"{prefix}lm_head.project_emb.weight", "t")
        if sub.startswith("head_"):
            key = sub[len("head_"):]
            return (f"{prefix}lm_head.heads.{key}.{_wb(leaf)}", "t" if leaf == "kernel" else "id")
        if sub.startswith("to_emb_"):
            key = sub[len("to_emb_"):]
            return (f"{prefix}lm_head.to_embs.{key}.0.{_wb(leaf)}", "t" if leaf == "kernel" else "id")
        if sub.startswith("norm_"):
            key = sub[len("norm_"):]
            return (f"{prefix}lm_head.to_embs.{key}.1.{_wb(leaf)}", "id")
    if head == "transformer":
        sub = parts[1]
        m = re.fullmatch(r"layer_(\d+)_(attn|cross|ff|norm)", sub)
        if m:
            idx, kind = int(m.group(1)), m.group(2)
            if kind in ("attn", "cross"):
                inner = parts[2]
                if inner == "rel_pos":
                    return (f"{prefix}transformer.layers.{idx}.1.rel_pos.learned_logslopes", "id")
                return (
                    f"{prefix}transformer.layers.{idx}.1.{inner}.weight",
                    "t",
                )
            if kind == "ff":
                inner = parts[2]
                if inner == "proj_in":
                    # GLU: ff.0.proj; plain: ff.0.0
                    return (
                        f"{prefix}transformer.layers.{idx}.1.ff.0.proj|0.{_wb(leaf)}",
                        "t" if leaf == "kernel" else "id",
                    )
                if inner == "proj_out":
                    return (
                        f"{prefix}transformer.layers.{idx}.1.ff.3.{_wb(leaf)}",
                        "t" if leaf == "kernel" else "id",
                    )
                if inner == "post_act_norm":
                    return (f"{prefix}transformer.layers.{idx}.1.ff.1.{_wb(leaf)}", "id")
            if kind == "norm":
                inner = parts[2] if len(parts) > 2 else None
                if inner == "to_gamma_beta":
                    return (
                        f"{prefix}transformer.layers.{idx}.0.0.linear.{_wb(leaf)}",
                        "t" if leaf == "kernel" else "id",
                    )
                return (f"{prefix}transformer.layers.{idx}.0.0.{_wb(leaf)}", "id")
        if sub == "final_norm":
            inner = parts[2] if len(parts) > 2 else None
            if inner == "to_gamma_beta":
                return (
                    f"{prefix}transformer.final_norm.linear.{_wb(leaf)}",
                    "t" if leaf == "kernel" else "id",
                )
            return (f"{prefix}transformer.final_norm.{_wb(leaf)}", "id")
    return None


def _flatten(tree, prefix=()):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, prefix + (k,)))
    else:
        out[prefix] = tree
    return out


def _unflatten(flat):
    tree = {}
    for path, value in flat.items():
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = value
    return tree


def _resolve(state_dict: Dict[str, np.ndarray], name: str) -> Optional[np.ndarray]:
    """Fetch with support for `a|b` alternatives and `{last}` classifier index."""
    candidates = [name]
    if "|" in name:
        base = name
        candidates = []
        # expand alternatives segment-wise
        pre, alts_rest = base.split(".", 1) if False else (None, None)
        # simple: replace the single a|b group
        m = re.search(r"([^.]+)\|([^.]+)", base)
        if m:
            candidates = [base[: m.start()] + m.group(1) + base[m.end():],
                          base[: m.start()] + m.group(2) + base[m.end():]]
    out = []
    for cand in candidates:
        if "{last}" in cand:
            pattern = re.escape(cand).replace(r"\{last\}", r"(\d+)")
            hits = [(int(mm.group(1)), k) for k in state_dict for mm in [re.fullmatch(pattern, k)] if mm]
            if hits:
                out.append(state_dict[max(hits)[1]])
                continue
        elif re.search(r"\{\d+\}", cand):
            cand = cand.replace("{", "").replace("}", "")
        if cand in state_dict:
            out.append(state_dict[cand])
    return out[0] if out else None


def convert_reference_state_dict(
    state_dict: Dict[str, np.ndarray], params_template, strict: bool = True
):
    """Build a flax param tree from a reference torch state_dict
    (arrays as numpy; call `{k: v.numpy() for k, v in sd.items()}` first)."""
    flat = _flatten(params_template)
    converted = {}
    missing = []
    for path, template in flat.items():
        mapped = _torch_name_for(list(path))
        value = None
        if mapped is not None:
            name, transform = mapped
            value = _resolve(state_dict, name)
            if value is not None:
                value = np.asarray(value)
                if transform == "t" and value.ndim == 2:
                    value = value.T
        if value is None:
            missing.append((".".join(path), mapped[0] if mapped else None))
            converted[path] = template
            continue
        if tuple(value.shape) != tuple(np.shape(template)):
            raise ValueError(
                f"shape mismatch for {'.'.join(path)}: torch {value.shape} vs flax {np.shape(template)}"
            )
        converted[path] = value.astype(np.asarray(template).dtype)

    if missing and strict:
        raise KeyError(
            f"{len(missing)} params not found in the reference state dict, e.g. {missing[:5]}"
        )
    return _unflatten(converted), missing


def reference_names_for_template(params_template) -> Dict[str, Optional[str]]:
    """Debug helper: every flax param path → its derived reference name."""
    return {
        ".".join(path): (m[0] if (m := _torch_name_for(list(path))) else None)
        for path in _flatten(params_template)
    }


def export_reference_state_dict(params) -> Dict[str, np.ndarray]:
    """Inverse conversion: flax params → a reference-named torch state dict
    (numpy arrays; wrap with `torch.tensor` to `torch.save` it).

    The exact inverse of `convert_reference_state_dict`: the same name
    derivation, with 2-D Linear kernels transposed back to torch's
    (out, in) convention. Name placeholders are concretized the way the
    reference modules name things (GLU `ff.0.proj`; classifier MLP layer
    indices). Round-trip (export → convert) is identity-tested.
    """
    flat = _flatten(params)
    sd: Dict[str, np.ndarray] = {}
    for path, value in flat.items():
        mapped = _torch_name_for(list(path))
        assert mapped is not None, f"no reference name for {'.'.join(path)}"
        name, transform = mapped
        name = name.replace("proj|0", "proj")
        name = name.replace("{last}", "0").replace("{", "").replace("}", "")
        arr = np.asarray(value)
        if transform == "t" and arr.ndim == 2:
            arr = arr.T
        # shared/tied tables can map to one reference name from several paths;
        # the values are identical by construction (same underlying param)
        sd[name] = arr
    return sd


# ---- one-call import of a reference .pt checkpoint ------------------------


def _shape_template_for(model, model_cfg: Dict, b: int = 1, t: int = 8):
    """Parameter-tree template via `jax.eval_shape` over `model.init` — no
    compute runs, so this is cheap even for the flagship. The dummy batch only
    fixes structure (stream counts from the injected vocab-size dicts);
    parameter shapes are fully determined by the config."""
    import jax
    import jax.numpy as jnp

    n_perf = len(model_cfg["num_tokens"])
    perf = jnp.zeros((b, t, n_perf), jnp.int32)
    mask = jnp.ones((b, t), bool)
    kwargs = dict(perf_mask=mask, masked_perf=perf,
                  labels=jnp.full((b, t, n_perf), -100, jnp.int32),
                  bars=jnp.zeros((b, t), jnp.int32),
                  beats=jnp.zeros((b, t), jnp.int32),
                  onsets=jnp.zeros((b, t), jnp.int32),
                  deadpan_mask=jnp.zeros((b,), bool))
    if model_cfg.get("score_encoder") is not None:
        n_score = len(model_cfg["num_score_tokens"])
        kwargs["score"] = jnp.zeros((b, t, n_score), jnp.int32)
        kwargs["score_mask"] = mask
    clf = model_cfg.get("classifiers")
    if clf is not None and clf.get("num_classes"):
        kwargs["directions"] = jnp.zeros((b, t, len(clf["num_classes"])), jnp.int32)

    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
            "latent_dropout": jax.random.PRNGKey(2), "mmd": jax.random.PRNGKey(3)}

    shapes = jax.eval_shape(lambda: model.init(rngs, perf, **kwargs))
    return jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), shapes["params"])


def import_reference_checkpoint(path: str, strict: bool = True):
    """Load a reference single-file torch checkpoint (trainer.py:296-314
    layout: {model: {config, state_dict}, ...}) into (model, variables,
    model_config_dict) of this framework, in one call.

    The embedded model config is the post-injection recipe node (reference
    model.py:374-394 writes num_tokens / token_values / num_classes into it
    before training), so it builds our model directly; the state dict goes
    through `convert_reference_state_dict` (numerically parity-tested)."""
    import torch

    from ..models import MODELS

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    model_node = ckpt.get("model") or {}
    model_cfg = model_node.get("config")
    if model_cfg is None:
        raise ValueError(f"{path} carries no embedded model config")
    state_dict = {
        k: np.asarray(v.detach().cpu().numpy())
        for k, v in model_node["state_dict"].items()
    }

    name = model_cfg.get("_name_", "ScorePerformer")
    data = {k: v for k, v in model_cfg.items() if not k.startswith("_")}
    model, cfg = MODELS.get(name)(**data)

    template = _shape_template_for(model, data)
    params, _ = convert_reference_state_dict(state_dict, template, strict=strict)
    return model, {"params": params}, cfg
