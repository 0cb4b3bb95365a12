"""Functional decode loops: autoregressive generation and MixedLM unmasking.

Counterpart of scoreperformer/models/scoreperformer/wrappers.py:200-431,
re-designed for XLA: the reference iterates a Python loop with one forward per
token and concat-grown caches; here the whole loop is a `lax.scan` over a
static-shape KV cache, compiled once.

Reference decode alignment notes (replicated exactly for parity):
- ARWrapper.generate feeds `x[:, :-1]` through the CLM shift (wrappers.py:236,
  290-307), so the sample appended at position L conditions on tokens
  [0, L-2] and the style/context of position L-1.
- MixedLM unmask at position idx consumes token idx-1 (already unmasked) and
  predicts idx (wrappers.py:352-360, 409-431).
- per-stream constraints (wrappers.py:246-258): Bar is monotonically
  non-decreasing, Tempo copies forward within the same bar, TimeSig always
  copies forward; PAD/MASK logits are suppressed.
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.sampling import apply_temperature, top_k

NEG_INF = -1e9

# Batched sampling in mixedlm_unmask (one padded top_k + categorical over all
# streams instead of S of each). Measured on v5e-1 at the flagship config
# (batch 512, seq 256): 229k tok/s vs 302k for the per-stream path — the
# uniform kmax does ~5x the per-stream top_k work and the pad/stack adds
# traffic, so the per-stream path stays the default. The batched path is
# kept (and equivalence-tested) for configs with many same-sized streams.
BATCHED_SAMPLING = False


def _sample_stream(rng, logits, temperature, filter_fn, filter_kwargs, greedy):
    if greedy:
        return jnp.argmax(logits, axis=-1)
    filtered = filter_fn(logits, **(filter_kwargs or {}))
    filtered = apply_temperature(filtered, temperature)
    return jax.random.categorical(rng, filtered, axis=-1)


def make_decode_step(model, variables):
    """Returns step(seq_tokens, masked_tokens, style, context, caches, idx) →
    (hidden, caches) over the model's perf decoder."""

    def step(seq_tokens, masked_tokens, style_embeddings, context, caches, cache_index):
        out = model.apply(
            variables,
            seq_tokens,
            masked_tokens=masked_tokens,
            style_embeddings=style_embeddings,
            context=context,
            caches=caches,
            cache_index=cache_index,
            method="decode_step",
        )
        return out.hidden_state, out.caches

    return step


def make_lm_head(model, variables):
    def head(hidden):
        return model.apply(
            variables,
            hidden,
            method=lambda m, h: m.perf_decoder.apply_lm_head(h),
        )

    return head


def _stream_order(model) -> Dict[str, int]:
    order = getattr(model.config, "num_tokens", None)  # ScorePerformerModel
    if not order:
        order = getattr(model, "num_tokens", None)  # PerformerModel field
    assert order, "model carries no num_tokens stream order"
    return order


def _supports_batched_head(model) -> bool:
    """Batched (S, Vmax) logits need a tied head over uniform stream dims."""
    cfg = getattr(model.config, "perf_decoder", None) or getattr(
        model.config, "transformer", None
    )
    if cfg is None or getattr(cfg, "lm_head", None) is None:
        return False
    if cfg.lm_head._target_ != "lm-tied":
        return False
    emb_dims = cfg.token_embeddings.emb_dims
    if emb_dims is None or isinstance(emb_dims, int):
        return True
    dims = list(emb_dims.values())
    return all(d == dims[0] for d in dims)


def make_batched_lm_head(model, variables):
    def head(hidden):
        return model.apply(
            variables,
            hidden,
            method=lambda m, h: m.perf_decoder.apply_lm_head(h, batched=True),
        )

    return head


def logits_by_column(model, logits: Dict[str, jnp.ndarray]):
    """Align a per-stream logits dict with the token columns.

    NEVER iterate a logits dict positionally: any dict that crosses a
    jit/pytree boundary comes back with its keys SORTED ALPHABETICALLY (jax
    flattens dicts in sorted-key order), which silently writes one stream's
    samples into another stream's column. The model config's `num_tokens`
    dict carries the canonical column order; map by key instead.
    """
    order = getattr(model.config, "num_tokens", None)  # ScorePerformerModel
    if not order:
        order = getattr(model, "num_tokens", None)  # PerformerModel field
    assert order, "model carries no num_tokens stream order"
    keys = list(order)
    assert set(keys) == set(logits), (keys, sorted(logits))
    return [(s, key, logits[key]) for s, key in enumerate(keys)]


def mixedlm_unmask(
    model,
    variables,
    tokens: jnp.ndarray,
    tokens_masked: jnp.ndarray,
    rng: jax.Array,
    style_embeddings: Optional[jnp.ndarray] = None,
    context: Optional[jnp.ndarray] = None,
    valid_len: Optional[jnp.ndarray] = None,
    temperature: float = 1.0,
    filter_fn: Callable = top_k,
    filter_kwargs: Optional[Dict] = None,
    greedy: bool = False,
    mask_token_id: int = 1,
    pad_token_id: int = 0,
    forbid_ids: Optional[Dict[int, jnp.ndarray]] = None,
    cache_dtype=jnp.float32,
    chunk_size: Optional[int] = 16,
    fresh_dtype=None,
    static_prefix: bool = False,
    chunk_tokens: bool = False,
    unrolled_chunks: bool = False,
    capacity_stages: int = 1,
    sample_dims: Optional[Tuple[int, ...]] = None,
) -> jnp.ndarray:
    """Chord-wise MixedLM unmasking, whole sequence in one compiled scan.

    `tokens` is (b, T, S) with MASK at the positions/streams to predict;
    `tokens_masked` is the fully-masked parallel stream. Returns tokens with
    masks filled. Positions >= valid_len are left untouched.

    `sample_dims` (STATIC tuple of stream indices) restricts the per-step
    filter+sample work to the streams the caller actually masked. The select
    `where(was_masked, samples, target)` discards every other stream's sample
    anyway, yet the compiled step runs one top-k + one categorical per stream
    — S=12 of each at the flagship, where MixedLM masks only 4 perf streams
    (the widest discarded filter is Bar at 260 tokens). Skipped streams pass
    the target token through, so outputs are BIT-IDENTICAL to the default
    whenever the caller masks only `sample_dims` (the per-stream rng split is
    preserved; tests/test_models.py). If a stream outside `sample_dims` IS
    masked, its MASK token survives to the output — caller contract.
    Measured on v5e-1 (flagship b512/seq256, scripts/exp_sample_dims.py, two
    runs): sampled decode 967-976k -> **1.04M tok/s** (+7.0-7.3%); the GREEDY
    step measured ~4% SLOWER with the skip (the dropped argmaxes were
    overlapped; the pass-through serializes the sample stack on the target
    slice), so sample_dims is applied only when sampling and silently ignored
    for greedy=True — trajectories are identical either way. None = all.

    `cache_dtype=jnp.bfloat16` halves KV traffic but measured SLOWER than
    fp32 at the default chunk size (625k vs 679k tok/s at C=16; it only
    helped the larger C=32 chunks) — fp32 stays the default. The crossover
    is cache size: at dim 1024 / dim_head 128 (1.07 GB of fp32 caches)
    bf16 caches measured +18% (scripts/exp_scale_decode.py) — set it for
    serving configs at dim >= 1024.

    `cache_dtype=jnp.int8` stores the prefix quantized (symmetric per-row
    scales, attention.quantize_kv_rows) — prefix reads drop 4x vs fp32. The
    fresh carried buffers stay fp32; quantization happens once per chunk at
    the merge, and dequantization folds into the attend scales, so no fp32
    copy of the prefix is ever materialized. Trajectories are NOT
    bit-stable vs fp32 (quantization error) — measured greedy agreement at
    the deployed dim-1024 regime: int8 99.922% / bf16 99.963% over 523k
    filled slots (scripts/exp_int8_scale_agreement.py, BASELINE.md round
    4); requires the chunked path.
    Measured at the >= 1 GB scale regime (dim 1024, batch 256, seq 512):
    fp32 152k < bf16 179k < **int8 193k tok/s** (+27% / +7%) — the serving
    recommendation at dim >= 1024 (BASELINE.md round 3).

    `chunk_size` selects the chunked-carry decode: a two-level scan whose
    inner level carries only (chunk_size, b, kv) fresh-KV buffers while the
    big prefix caches stay loop-invariant, cutting the per-step defensive
    copies of scan-carried caches to one merge per chunk (see chunk_body).
    Measured on v5e-1 at the flagship config (batch 512, seq 256, fp32):
    classic scan 309k tok/s; C=4 471k, C=8 565k, C=16 679k (2.20x, the
    default), C=32 593k, C=64 470k. `chunk_size=None` restores the classic
    single-scan path (bit-identical greedy trajectories either way,
    tests/test_models.py::test_mixedlm_unmask_chunked_matches_classic).
    """
    import math

    b, T, S = tokens.shape
    if jnp.dtype(cache_dtype) == jnp.int8:
        assert chunk_size is not None, (
            "int8 caches require the chunked decode (the classic scan writes "
            "unquantized rows per step; quantization lives in the chunk merge)"
        )
    decode_step = make_decode_step(model, variables)
    lm_head = make_lm_head(model, variables)

    # chunked mode pads the step count to a chunk multiple; size the caches
    # so the final chunk merge never clamps (padded tail slots are masked)
    cache_len = T if chunk_size is None else -(-(T - 1) // int(chunk_size)) * int(chunk_size)
    cache_len = max(cache_len, T)
    caches = model.apply(
        variables, b, cache_len,
        method=lambda m, bb, tt: m.init_decoder_cache(bb, tt, dtype=cache_dtype),
    )

    unmask_mask = tokens == mask_token_id
    if valid_len is None:
        valid_len = jnp.full((b,), T, dtype=jnp.int32)

    # Fast path: keep the exact per-stream logits, but run ONE top_k and ONE
    # categorical over a padded (b, S, Vmax) stack instead of S of each — the
    # decode step is op-count-bound on TPU (measured: per-stream sampling is
    # ~12% of step time at batch 512, and a padded batched tied-head einsum
    # REGRESSED throughput, so only the sampling ops are batched). Per-stream
    # top-k semantics are preserved EXACTLY by taking kmax candidates and
    # reading each stream's own k-th value as its threshold
    # (tests/test_ops.py::test_batched_topk_threshold_matches_streamwise);
    # samples draw from the same distributions but a different RNG stream
    # than the per-stream path.
    from ..ops.sampling import top_k as _default_top_k

    if sample_dims is not None:
        # greedy: the skip measured ~4% SLOWER (see docstring) — ignore it
        sample_dims = None if greedy else tuple(int(s) for s in sample_dims)
    # the batched stack has no per-stream skip; sample_dims takes precedence
    use_batched = (
        BATCHED_SAMPLING
        and sample_dims is None
        and (greedy or filter_fn is _default_top_k)
    )
    if use_batched:
        order = _stream_order(model)
        sizes = list(order.values())
        assert len(sizes) == S
        vmax = max(sizes)
        col = np.arange(vmax)
        col_mask_np = np.zeros((S, vmax), np.float32)
        for s, V in enumerate(sizes):
            invalid = (col >= V) | (col == pad_token_id) | (col == mask_token_id)
            if forbid_ids and s in forbid_ids:
                invalid |= np.isin(col, np.asarray(forbid_ids[s]))
            col_mask_np[s, invalid] = NEG_INF
        col_mask = jnp.asarray(col_mask_np)
        if not greedy:
            thres = (filter_kwargs or {}).get("thres", 0.9)
            kfix = (filter_kwargs or {}).get("k")
            k_s = [
                max(1, min(int(kfix) if kfix else math.ceil((1 - thres) * V), V))
                for V in sizes
            ]
            kmax = max(k_s)
            k_idx = jnp.asarray(np.array(k_s) - 1)

    def _sample_batched(step_rng, logits):
        cols = logits_by_column(model, logits)
        lg = jnp.stack(
            [
                jnp.pad(l, ((0, 0), (0, vmax - l.shape[-1])), constant_values=NEG_INF)
                for _, _, l in cols
            ],
            axis=1,
        )  # (b, S, Vmax)
        lg = lg + col_mask[None]
        if greedy:
            return jnp.argmax(lg, axis=-1)
        vals = jax.lax.top_k(lg, kmax)[0]  # (b, S, kmax) sorted desc
        kth = jnp.take_along_axis(
            vals, jnp.broadcast_to(k_idx[None, :, None], (lg.shape[0], S, 1)), axis=-1
        )
        filtered = jnp.where(lg < kth, NEG_INF, lg)
        filtered = apply_temperature(filtered, temperature)
        return jax.random.categorical(step_rng, filtered, axis=-1)

    # the pre-decode token buffer: positions > j are untouched when step j
    # runs, so `target` reads can come from this loop-invariant operand —
    # EXCEPT in the carried-buffer step, whose padded tail steps clamp their
    # write onto the last position and rely on reading back the CURRENT
    # (already filled) value; there `target_src` must be the carried buffer
    tokens0 = tokens

    def _sample_position(seq_j, step_caches, rng, j, target_src):
        """One decode position: consume `seq_j` (token j, already final),
        predict j+1. Returns (updated row, new caches, rng)."""
        rng, step_rng = jax.random.split(rng)

        masked_j = jax.lax.dynamic_slice_in_dim(tokens_masked, j + 1, 1, axis=1)
        style_j = (
            jax.lax.dynamic_slice_in_dim(style_embeddings, j + 1, 1, axis=1)
            if style_embeddings is not None
            else None
        )
        context_j = (
            jax.lax.dynamic_slice_in_dim(context, j + 1, 1, axis=1)
            if context is not None
            else None
        )

        hidden, new_caches = decode_step(seq_j, masked_j, style_j, context_j, step_caches, j)
        logits = lm_head(hidden[:, 0])  # dict of (b, V_s)

        target = jax.lax.dynamic_slice_in_dim(target_src, j + 1, 1, axis=1)[:, 0]
        if use_batched:
            samples = _sample_batched(step_rng, logits)  # (b, S)
        else:
            new_vals = []
            rngs = jax.random.split(step_rng, S)
            for s, key, lg in logits_by_column(model, logits):
                if sample_dims is not None and s not in sample_dims:
                    # the caller never masks this stream: its sample would be
                    # discarded by the fill select below — skip the filter +
                    # categorical and pass the target token through
                    new_vals.append(target[:, s])
                    continue
                lg = lg.at[:, pad_token_id].set(NEG_INF).at[:, mask_token_id].set(NEG_INF)
                if forbid_ids and s in forbid_ids:
                    lg = lg.at[:, forbid_ids[s]].set(NEG_INF)
                new_vals.append(
                    _sample_stream(rngs[s], lg, temperature, filter_fn, filter_kwargs, greedy)
                )
            samples = jnp.stack(new_vals, axis=-1)  # (b, S)
        was_masked = jax.lax.dynamic_slice_in_dim(unmask_mask, j + 1, 1, axis=1)[:, 0]
        in_range = (j + 1) < valid_len
        fill = was_masked & in_range[:, None]
        updated = jnp.where(fill, samples, target)
        return updated, new_caches, rng

    def _step(tokens, step_caches, rng, j):
        """Carried-token-buffer step shared by the classic scan and the
        chunked-carry scan."""
        seq_j = jax.lax.dynamic_slice_in_dim(tokens, j, 1, axis=1)
        updated, new_caches, rng = _sample_position(seq_j, step_caches, rng, j, tokens)
        # past-the-end steps of a padded chunk clamp to T-1 and rewrite the
        # unchanged last token (fill is all-False there): harmless by design
        tokens = jax.lax.dynamic_update_slice_in_dim(tokens, updated[:, None], j + 1, axis=1)
        return tokens, new_caches, rng

    if chunk_size is None:
        def body(carry, j):
            tokens, caches, rng = carry
            tokens, caches, rng = _step(tokens, caches, rng, j)
            return (tokens, caches, rng), None

        (tokens, _, _), _ = jax.lax.scan(body, (tokens, caches, rng), jnp.arange(T - 1))
        return tokens

    # --- chunked-carry decode (VERDICT r2 #3) ---
    # The classic scan carries every (T, b, kv) cache buffer and pays a
    # defensive copy of each per step (~55% of step time, BASELINE.md). Here
    # the inner scan carries only (chunk, b, kv) fresh buffers; the big
    # prefix caches are loop-invariant operands of the inner scan (no
    # per-step copy) and are updated ONCE per chunk in the outer scan.
    C = int(chunk_size)
    n_chunks = -(-(T - 1) // C)

    # mixed-precision option: the fresh carried buffers may use a different
    # dtype than the big read-dominated prefix (e.g. bf16 prefix halves the
    # attend reads while fp32 fresh keeps full precision in the carry); the
    # chunk merge casts fresh -> prefix dtype. With an int8 (quantized)
    # prefix the fresh buffers stay fp32 — quantization happens only at the
    # per-chunk merge (see _merge_one).
    f_dtype = fresh_dtype

    def _fresh_dtype(layer):
        if f_dtype is not None:
            return f_dtype
        return jnp.float32 if layer["k"].dtype == jnp.int8 else layer["k"].dtype

    def _run_chunk(tokens, prefix_view, rng, base):
        """Inner scan of C steps over one chunk: carries only the fresh
        buffers; `prefix_view` is loop-invariant. Returns updated
        (tokens, fresh, rng)."""
        fresh = [
            {
                "fk": jnp.zeros((C,) + layer["k"].shape[1:], _fresh_dtype(layer)),
                "fv": jnp.zeros((C,) + layer["v"].shape[1:], _fresh_dtype(layer)),
            }
            if layer is not None
            else None
            for layer in prefix_view
        ]

        def body(carry, jj):
            tokens, fresh, rng = carry
            merged = [
                {**layer, **f, "base": base} if layer is not None else None
                for layer, f in zip(prefix_view, fresh)
            ]
            tokens, new_caches, rng = _step(tokens, merged, rng, base + jj)
            fresh = [
                {"fk": nc["fk"], "fv": nc["fv"]} if nc is not None else None
                for nc in new_caches
            ]
            return (tokens, fresh, rng), None

        (tokens, fresh, rng), _ = jax.lax.scan(body, (tokens, fresh, rng), jnp.arange(C))
        return tokens, fresh, rng

    def _run_chunk_rows(tokens, prefix_view, rng, base):
        """Like `_run_chunk` but the inner scan carries a tiny (C+1, b, S)
        row buffer instead of the full (b, T, S) token tensor: row 0 seeds
        with the token at `base`, step kk reads row kk and writes row kk+1,
        and the rows merge into `tokens` once per chunk — the same
        shrink-the-carry move as the fresh-KV buffers."""
        fresh = [
            {
                "fk": jnp.zeros((C,) + layer["k"].shape[1:], _fresh_dtype(layer)),
                "fv": jnp.zeros((C,) + layer["v"].shape[1:], _fresh_dtype(layer)),
            }
            if layer is not None
            else None
            for layer in prefix_view
        ]
        ftok = jnp.zeros((C + 1, b, S), tokens.dtype)
        seed = jax.lax.dynamic_slice_in_dim(tokens, base, 1, axis=1)  # (b, 1, S)
        ftok = jax.lax.dynamic_update_slice(ftok, seed.swapaxes(0, 1), (0, 0, 0))

        def body(carry, kk):
            ftok, fresh, rng = carry
            merged = [
                {**layer, **f, "base": base} if layer is not None else None
                for layer, f in zip(prefix_view, fresh)
            ]
            seq_j = jax.lax.dynamic_slice_in_dim(ftok, kk, 1, axis=0).swapaxes(0, 1)
            updated, new_caches, rng = _sample_position(
                seq_j, merged, rng, base + kk, tokens0
            )
            ftok = jax.lax.dynamic_update_slice(ftok, updated[None], (kk + 1, 0, 0))
            fresh = [
                {"fk": nc["fk"], "fv": nc["fv"]} if nc is not None else None
                for nc in new_caches
            ]
            return (ftok, fresh, rng), None

        (ftok, fresh, rng), _ = jax.lax.scan(body, (ftok, fresh, rng), jnp.arange(C))
        tokens = jax.lax.dynamic_update_slice(
            tokens, ftok[1:].swapaxes(0, 1), (0, base + 1, 0)
        )
        return tokens, fresh, rng

    def _merge_one(layer, f, base):
        # NOT write_kv: the in-place Pallas DMA merge measured 537k vs 689k
        # tok/s (BASELINE.md round 3) — the dus copies below show up in the
        # profile (~16% of step time) but XLA overlaps them with the inner
        # scan, while the aliased Pallas call serializes.
        if "k_s" in layer:
            # int8 prefix: quantize the chunk's fp32 fresh rows ONCE here
            # (reads dominate; the write-side quantize is per chunk, not per
            # step) and land rows + per-row scales together
            from .attention import quantize_kv_rows

            qk, sk = quantize_kv_rows(f["fk"].astype(jnp.float32))
            qv, sv = quantize_kv_rows(f["fv"].astype(jnp.float32))
            return {
                "k": jax.lax.dynamic_update_slice(layer["k"], qk, (base, 0, 0)),
                "k_s": jax.lax.dynamic_update_slice(layer["k_s"], sk, (base, 0)),
                "v": jax.lax.dynamic_update_slice(layer["v"], qv, (base, 0, 0)),
                "v_s": jax.lax.dynamic_update_slice(layer["v_s"], sv, (base, 0)),
            }
        return {
            "k": jax.lax.dynamic_update_slice(
                layer["k"], f["fk"].astype(layer["k"].dtype), (base, 0, 0)
            ),
            "v": jax.lax.dynamic_update_slice(
                layer["v"], f["fv"].astype(layer["v"].dtype), (base, 0, 0)
            ),
        }

    def _merge_chunk(prefix, fresh, base):
        return [
            _merge_one(layer, f, base) if layer is not None else None
            for layer, f in zip(prefix, fresh)
        ]

    assert all(c is None or c["k"].shape[0] >= n_chunks * C for c in caches), (
        "chunked decode requires cache capacity >= padded step count (no ring wrap)"
    )

    if unrolled_chunks and not static_prefix:
        # Unrolled-outer-loop variant WITHOUT static prefix slices: the outer
        # lax.scan carries the big prefix buffers and pays a defensive copy
        # per chunk merge (~20% of step time in the round-3 decode profile);
        # unrolling makes each merge straight-line dataflow whose
        # dynamic_update_slice XLA can apply in place once the inner scan's
        # last read of the old buffer is done. Distinct from `static_prefix`
        # (measured negative), which also sliced prefix[:base] — a copy that
        # ate the unrolling win. Program size grows ~n_chunks-fold.
        prefix = caches
        for c in range(n_chunks):
            base = c * C
            tokens, fresh, rng = _run_chunk(tokens, prefix, rng, base)
            prefix = _merge_chunk(prefix, fresh, base)
        return tokens[:, :T]

    if not static_prefix:
        run = _run_chunk_rows if chunk_tokens else _run_chunk
        if chunk_tokens:
            # pad so the final chunk's row merge never clamps; padded
            # positions are discarded below (fill is False past valid_len)
            pad = n_chunks * C + 1 - tokens.shape[1]
            if pad > 0:
                tokens = jnp.pad(tokens, ((0, 0), (0, pad), (0, 0)))

        def chunk_body(outer, c):
            tokens, prefix, rng = outer
            base = c * C
            tokens, fresh, rng = run(tokens, prefix, rng, base)
            return (tokens, _merge_chunk(prefix, fresh, base), rng), None

        if capacity_stages and int(capacity_stages) > 1:
            # Staged-capacity variant: G sequential outer scans where stage
            # g's prefix buffers only span the rows written by its chunks —
            # step j's masked prefix attend reads (and the per-chunk merge's
            # defensive copy of the carried prefix) shrink proportionally in
            # early stages (average read factor (G+1)/2G vs 1.0). Unlike
            # `static_prefix` (per-chunk slicing, measured negative), the
            # dynamic scan's cross-chunk pipelining survives within each
            # stage; only G-1 stage boundaries pay a program transition plus
            # one embed-copy of the smaller caches into the larger buffers.
            G = int(capacity_stages)
            bounds = sorted({(g * n_chunks) // G for g in range(G + 1)})
            prefix = None
            for c0, c1 in zip(bounds[:-1], bounds[1:]):
                stage = model.apply(
                    variables, b, c1 * C,
                    method=lambda m, bb, tt: m.init_decoder_cache(
                        bb, tt, dtype=cache_dtype
                    ),
                )
                if prefix is not None:
                    stage = [
                        {
                            key: jax.lax.dynamic_update_slice(
                                sl[key], pl[key], (0,) * sl[key].ndim
                            )
                            for key in sl
                        }
                        if sl is not None
                        else None
                        for sl, pl in zip(stage, prefix)
                    ]
                (tokens, prefix, rng), _ = jax.lax.scan(
                    chunk_body, (tokens, stage, rng), jnp.arange(c0, c1)
                )
            return tokens[:, :T]

        (tokens, _, _), _ = jax.lax.scan(
            chunk_body, (tokens, caches, rng), jnp.arange(n_chunks)
        )
        return tokens[:, :T]

    # static-prefix variant: unrolled Python loop over chunks, so each
    # chunk's prefix slice has STATIC length base = c*C — the attend reads
    # only the written rows (average cap/2) instead of full capacity with
    # masking. The merge still lands in the full-capacity buffers. Costs a
    # bigger program (n_chunks inner scans of distinct shapes).
    prefix = caches
    for c in range(n_chunks):
        base = c * C
        sliced = [
            {key: layer[key][:base] for key in layer}
            if layer is not None
            else None
            for layer in prefix
        ]
        tokens, fresh, rng = _run_chunk(tokens, sliced, rng, base)
        prefix = _merge_chunk(prefix, fresh, base)
    return tokens


def mlm_unmask(
    model,
    variables,
    tokens: jnp.ndarray,
    rng: jax.Array,
    single_run: bool = True,
    mask: Optional[jnp.ndarray] = None,
    style_embeddings: Optional[jnp.ndarray] = None,
    context: Optional[jnp.ndarray] = None,
    temperature: float = 1.0,
    filter_fn: Callable = top_k,
    filter_kwargs: Optional[Dict] = None,
    greedy: bool = False,
    mask_token_id: int = 1,
    num_special_tokens: int = 4,
    forbid_ids: Optional[Dict[int, jnp.ndarray]] = None,
) -> jnp.ndarray:
    """MLM unmasking (reference wrappers.py:99-182).

    single_run=True: one bidirectional forward, argmax fill (the reference
    falls back to argmax here too, wrappers.py:149-157). Otherwise positions
    are revealed left-to-right with a full re-encode per masked position
    (bidirectional attention invalidates incremental caches), each forward
    masked to the revealed prefix.
    """
    b, T, S = tokens.shape
    if mask is None:
        mask = jnp.ones((b, T), dtype=bool)
    unmask_mask = tokens == mask_token_id

    def forward(tok, attn_len_mask):
        out = model.apply(
            variables,
            tok,
            mask=attn_len_mask,
            style_embeddings=style_embeddings,
            context=context,
            method="decode_step",
        )
        return out.hidden_state

    if single_run:
        hidden = forward(tokens, mask)
        logits = model.apply(
            variables, hidden, method=lambda m, h: m.perf_decoder.apply_lm_head(h)
        )
        samples = jnp.stack([jnp.argmax(lg, axis=-1) for lg in logits.values()], axis=-1)
        return jnp.where(unmask_mask, samples, tokens)

    # iterative: reveal masked positions left-to-right
    position_masked = np.asarray(jax.device_get(unmask_mask.any(axis=-1)))  # (b, T)
    out_tokens = tokens
    for idx in range(1, T):
        if not position_masked[:, idx].any():
            continue
        prefix_mask = mask & (jnp.arange(T)[None, :] <= idx)
        hidden = forward(out_tokens, prefix_mask)
        logits = model.apply(
            variables,
            hidden[:, idx - 1],
            method=lambda m, h: m.perf_decoder.apply_lm_head(h),
        )
        rng, step_rng = jax.random.split(rng)
        rngs = jax.random.split(step_rng, S)
        new_vals = []
        for s, key, lg in logits_by_column(model, logits):
            lg = lg.at[:, :num_special_tokens].set(NEG_INF)
            if forbid_ids and s in forbid_ids:
                lg = lg.at[:, forbid_ids[s]].set(NEG_INF)
            new_vals.append(
                _sample_stream(rngs[s], lg, temperature, filter_fn, filter_kwargs, greedy)
            )
        samples = jnp.stack(new_vals, axis=-1)
        row_mask = unmask_mask[:, idx]
        updated = jnp.where(row_mask, samples, out_tokens[:, idx])
        out_tokens = out_tokens.at[:, idx].set(updated)
    return out_tokens


def ar_generate(
    model,
    variables,
    start_tokens: jnp.ndarray,
    seq_len: int,
    rng: jax.Array,
    style_embeddings: Optional[jnp.ndarray] = None,
    context: Optional[jnp.ndarray] = None,
    temperature: float = 1.0,
    filter_fn: Callable = top_k,
    filter_kwargs: Optional[Dict] = None,
    greedy: bool = False,
    stream_names: Optional[List[str]] = None,
    fix_errors: bool = True,
    eos_token_id: int = 3,
    pad_token_id: int = 0,
    max_bar: Optional[int] = None,
    max_seq_len: Optional[int] = None,
    chunk_size: Optional[int] = 16,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Autoregressive generation with per-stream constraints.

    Returns (generated (b, seq_len - t0, S), num_generated (b,)). After EOS
    (Bar stream), remaining positions are PAD.

    `max_seq_len` bounds the attention context to the model's trained window
    — the counterpart of the reference's `out[:, -max_seq_len:]` truncation
    (wrappers.py:236-237). Instead of shifting + re-prefilling, the KV cache
    is a ring buffer of `max_seq_len` slots (models/attention.py): past the
    window the oldest position is overwritten each step and ALiBi distances
    stay exact, so generation beyond the window runs in the same single
    compiled scan with memory bounded by the window.

    When the sequence fits the window (no ring wrap), the scan uses the same
    chunked-carry KV layout as `mixedlm_unmask` (small carried fresh buffers,
    frozen prefix operand, one merge per chunk — measured 2.2x there);
    wrapping generations fall back to the classic carried-cache scan.
    """
    b, t0, S = start_tokens.shape
    stream_names = stream_names or [str(i) for i in range(S)]
    name_to_idx = {n: i for i, n in enumerate(stream_names)}
    bar_idx = name_to_idx.get("Bar", 0)
    if fix_errors and "Tempo" in name_to_idx and "Bar" in name_to_idx:
        # the same-bar Tempo copy-forward reads this step's Bar sample, so
        # Bar must be emitted before Tempo in the canonical stream order
        assert name_to_idx["Bar"] < name_to_idx["Tempo"], (
            "Bar must precede Tempo in the stream order for copy-forward"
        )

    decode_step = make_decode_step(model, variables)
    lm_head = make_lm_head(model, variables)

    if max_seq_len is None:
        # the reference always bounds generation by the model window
        # (wrappers.py:236); default to the decoder's trained max_seq_len
        dec_cfg = getattr(model.config, "perf_decoder", None) or getattr(
            model.config, "transformer", None
        )
        max_seq_len = getattr(dec_cfg, "max_seq_len", None)

    total = seq_len + 1
    cache_len = total if max_seq_len is None else min(total, int(max_seq_len))
    assert t0 <= cache_len, (
        f"prompt ({t0}) must fit the context window ({cache_len})"
    )
    # chunked-carry only without ring wrap; pad capacity so the last chunk
    # merge never clamps
    num_steps = seq_len + 1 - t0
    use_chunks = chunk_size is not None and cache_len == total and t0 >= 2
    if use_chunks:
        C = int(chunk_size)
        n_chunks = -(-num_steps // C)
        cache_len = max(cache_len, (t0 - 2) + n_chunks * C)
    caches = model.apply(
        variables, b, cache_len, method=lambda m, bb, tt: m.init_decoder_cache(bb, tt)
    )

    # sequence buffer: start tokens + zeros
    buf = jnp.zeros((b, total, S), dtype=start_tokens.dtype)
    buf = jax.lax.dynamic_update_slice(buf, start_tokens, (0, 0, 0))

    # prefill with tokens [0, t0-2]; the reference CLM shift never consumes
    # the latest token (wrappers.py:236 + 290-307)
    if t0 > 1:
        prefix = start_tokens[:, : t0 - 1]
        style_p = style_embeddings[:, 1:t0] if style_embeddings is not None else None
        ctx_p = context[:, 1:t0] if context is not None else None
        _, caches = decode_step(prefix, None, style_p, ctx_p, caches, 0)

    def _step(buf, step_caches, rng, done, k):
        rng, step_rng = jax.random.split(rng)

        L = t0 + k  # current length; consume token L-2, predict position L
        consume_idx = L - 2
        seq_j = jax.lax.dynamic_slice_in_dim(buf, consume_idx, 1, axis=1)
        style_j = (
            jax.lax.dynamic_slice_in_dim(style_embeddings, consume_idx + 1, 1, axis=1)
            if style_embeddings is not None
            else None
        )
        ctx_j = (
            jax.lax.dynamic_slice_in_dim(context, consume_idx + 1, 1, axis=1)
            if context is not None
            else None
        )
        hidden, new_caches = decode_step(seq_j, None, style_j, ctx_j, step_caches, consume_idx)
        logits = lm_head(hidden[:, 0])

        last = jax.lax.dynamic_slice_in_dim(buf, L - 1, 1, axis=1)[:, 0]  # (b, S)
        last_bar = last[:, bar_idx]

        rngs = jax.random.split(step_rng, S)
        samples = {}
        for s, key, lg in logits_by_column(model, logits):
            name = stream_names[s] if s < len(stream_names) else key
            if fix_errors and name == "Bar":
                v = jnp.arange(lg.shape[-1])
                forbid = (v[None, :] >= 4) & (v[None, :] < last_bar[:, None])
                lg = jnp.where(forbid, NEG_INF, lg)
            lg = lg.at[:, :2].set(NEG_INF)
            sampled = _sample_stream(rngs[s], lg, temperature, filter_fn, filter_kwargs, greedy)
            if fix_errors:
                same_bar = samples.get("Bar", last_bar) == last_bar
                if name == "Tempo":
                    sampled = jnp.where(same_bar, last[:, s], sampled)
                elif name == "TimeSig":
                    sampled = last[:, s]
            samples[name] = sampled

        new_token = jnp.stack([samples[n] for n in stream_names], axis=-1)  # (b, S)

        is_eos = new_token[:, bar_idx] == eos_token_id
        if max_bar is not None:
            is_eos = is_eos | (new_token[:, bar_idx] > max_bar)
        # after EOS: pad all non-Bar streams (wrappers.py:265-269)
        pad_row = jnp.full_like(new_token, pad_token_id)
        pad_row = pad_row.at[:, bar_idx].set(new_token[:, bar_idx])
        new_token = jnp.where(is_eos[:, None], pad_row, new_token)
        new_token = jnp.where(done[:, None], jnp.full_like(new_token, pad_token_id), new_token)

        # padded chunk-tail steps (k >= num_steps) rewrite the clamped last
        # row unchanged instead of corrupting it
        L_eff = jnp.minimum(L, total - 1)
        existing = jax.lax.dynamic_slice_in_dim(buf, L_eff, 1, axis=1)[:, 0]
        new_token = jnp.where(k < num_steps, new_token, existing)
        is_eos = is_eos & (k < num_steps)

        buf = jax.lax.dynamic_update_slice(buf, new_token[:, None], (0, L_eff, 0))
        done = done | is_eos
        return buf, new_caches, rng, done

    done0 = jnp.zeros((b,), dtype=bool)

    if not use_chunks:
        def body(carry, k):
            buf, caches, rng, done = carry
            buf, caches, rng, done = _step(buf, caches, rng, done, k)
            return (buf, caches, rng, done), done

        (buf, _, _, _), dones = jax.lax.scan(
            body, (buf, caches, rng, done0), jnp.arange(num_steps)
        )
    else:
        # chunked-carry scan: fresh (C, b, kv) buffers carried, frozen prefix
        # merged once per chunk (see mixedlm_unmask)
        def chunk_body(outer, c):
            buf, prefix, rng, done = outer
            base = (t0 - 2) + c * C
            fresh = [
                {
                    "fk": jnp.zeros((C,) + layer["k"].shape[1:], layer["k"].dtype),
                    "fv": jnp.zeros((C,) + layer["v"].shape[1:], layer["v"].dtype),
                }
                if layer is not None
                else None
                for layer in prefix
            ]

            def body(carry, kk):
                buf, fresh, rng, done = carry
                merged = [
                    {**layer, **f, "base": base} if layer is not None else None
                    for layer, f in zip(prefix, fresh)
                ]
                buf, new_caches, rng, done = _step(buf, merged, rng, done, c * C + kk)
                fresh = [
                    {"fk": nc["fk"], "fv": nc["fv"]} if nc is not None else None
                    for nc in new_caches
                ]
                return (buf, fresh, rng, done), done

            (buf, fresh, rng, done), dones_c = jax.lax.scan(
                body, (buf, fresh, rng, done), jnp.arange(C)
            )
            # dus, not write_kv — see mixedlm_unmask._merge_chunk
            prefix = [
                {
                    "k": jax.lax.dynamic_update_slice(layer["k"], f["fk"], (base, 0, 0)),
                    "v": jax.lax.dynamic_update_slice(layer["v"], f["fv"], (base, 0, 0)),
                }
                if layer is not None
                else None
                for layer, f in zip(prefix, fresh)
            ]
            return (buf, prefix, rng, done), dones_c

        (buf, _, _, _), dones = jax.lax.scan(
            chunk_body, (buf, caches, rng, done0), jnp.arange(n_chunks)
        )
        dones = dones.reshape(n_chunks * C, b)[:num_steps]

    generated = buf[:, t0 : seq_len + 1]
    num_generated = jnp.where(
        dones.any(axis=0), jnp.argmax(dones, axis=0) + 1, num_steps
    )
    return generated, num_generated
