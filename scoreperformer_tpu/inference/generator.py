"""Real-time streaming performance generator.

Counterpart of scoreperformer/inference/generators.py:35-443: renders a piece
chord-group by chord-group inside a wall-clock time window, with a sliding
`max_context_len` window shifted at bar boundaries.

TPU-first re-design: instead of the reference's per-token Python forwards with
concat-grown caches, a `StreamingDecoder` holds ONE fixed-size KV cache and a
single compiled step function (consume token j, predict j+1); window shifts
reset the cache index and re-prefill — the same invalidation semantics as
generators.py:183-200 without recompilation.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.wrappers import NEG_INF, logits_by_column
from ..ops.sampling import top_k
from ..tokenizers import EOS, MASK, SOS, SPMuple2
from ..utils import find_closest
from .messengers import IntermediateData, SPMuple2IntermediateData, SPMupleMessenger


class StreamingDecoder:
    """MixedLM decoder with a persistent static KV cache.

    Known tokens are consumed in bucketed chunks, each chunk ONE parallel
    causal decode_step (see _consume_fn): a 64-row chunk costs roughly one
    row's parameter traffic plus the O(C·cap) attend, so large chunks win at
    every model size (measurements: BASELINE.md round 5 catch-up table).
    Each bucket size compiles once; when the caller does not need the
    returned logits, the TAIL chunk is padded UP to one bucket so any
    catch-up is at most two dispatches — on the tunneled chip the per-window
    cost at the context cap is dispatch-count-bound, not FLOPs-bound
    (BASELINE.md round 5 SLO breakdown).
    """

    CHUNKS = (128, 64, 8, 1)

    def __init__(self, model, variables, max_context_len: int, num_streams: int):
        self.model = model
        self.variables = variables
        self.max_context_len = max_context_len
        self.num_streams = num_streams
        self.caches = None
        self.consumed = 0  # number of tokens written into the cache

        self._consume = jax.jit(self._consume_fn)
        self._block_fns: Dict = {}
        self._cache0 = None  # device-resident zero cache, reused on reset
        # measurement counters (cheap, reset-free): consumed token count,
        # block-decode calls, and block refusals (bucket would overrun the
        # cache -> caller takes the per-note fallback). Used by the SLO
        # scripts to attribute window wall time.
        self.stats = {"consume_calls": 0, "consumed_tokens": 0,
                      "block_calls": 0, "block_refusals": 0, "resets": 0,
                      "consume_wall_s": 0.0, "block_wall_s": 0.0}

    def reset(self):
        self.caches = None
        self.consumed = 0
        self.stats["resets"] += 1

    def _init_cache(self):
        """Zero KV cache, built ON DEVICE once and reused for every reset.

        Nothing in the decode path donates cache buffers (updates are
        functional), so handing out the same device arrays after each window
        shift is safe — and free: the first implementation re-ran an EAGER
        init per reset, which costs one tunnel round-trip per zeros op
        (~100 ms/reset at the steady-state shift cadence, the largest single
        term of the round-5 SLO violations)."""
        if self._cache0 is None:
            self._cache0 = jax.jit(
                lambda v: self.model.apply(
                    v, 1, self.max_context_len,
                    method=lambda m, b, t: m.init_decoder_cache(b, t),
                )
            )(self.variables)
        return self._cache0

    def _consume_fn(self, variables, caches, seq, masked, style, ctx, start):
        """Consume `seq` (1, C, S) tokens at cache rows [start, start+C);
        returns (caches, logits at position start+C). masked/style/ctx are
        the +1-aligned companions (entries for positions start+1..start+C).

        PARALLEL PREFILL: all C rows are known tokens, so they go through
        ONE causal decode_step (the cached attend writes KV rows
        [start, start+C) and masks queries to key_pos <= pos_q) instead of a
        C-step `lax.scan`. Identical math — row j's attend sees exactly the
        rows < j either way — but the params stream through HBM once per
        CALL, not once per TOKEN: at dim 1024 the sequential scan costs
        ~8 ms/row (226M fp32 params per step); the parallel prefill makes a
        64-row chunk one forward (~a single step's params traffic). This is
        what turns the post-window-shift catch-up (~200 retained rows) from
        a multi-second stall into a sub-window blip (BASELINE.md round 5).

        `variables` is a TRACED argument, never a closure constant: the
        tunneled remote-compile helper serializes closure constants into the
        compile request body, and a dim-1024 param tree (~0.9 GB fp32)
        overflows it (HTTP 413)."""
        out = self.model.apply(
            variables,
            seq,
            masked_tokens=masked,
            style_embeddings=style,
            context=ctx,
            caches=caches,
            cache_index=start,
            method="decode_step",
        )
        logits = self.model.apply(
            variables,
            out.hidden_state[:, -1],
            method=lambda m, h: m.perf_decoder.apply_lm_head(h),
        )
        return out.caches, logits

    def predict(self, tokens, masked_tokens, style, context, position: int) -> Dict[str, np.ndarray]:
        """Consume final tokens up to `position`-1 and return logits for
        `position`. tokens: (T, S) numpy; style/context: (T, D) or None."""
        if self.caches is None:
            self.caches = self._init_cache()
            self.consumed = 0

        assert position >= 1, "position 0 has no preceding token to consume"
        if self.consumed >= position:
            # a previous speculative decode consumed at or past this position
            # (its tokens were discarded at the window cut): re-consume the
            # final row so the logits reflect the current window content.
            # Stale rows beyond `position` are masked by the attend's
            # key_pos <= pos_q causal check and overwritten on re-consume.
            self.consumed = position - 1

        return self._consume_to(tokens, masked_tokens, style, context, position)

    def _consume_to(self, tokens, masked_tokens, style, context, position,
                    need_logits=True):
        """Consume token rows [consumed, position); returns the logits of the
        final consume call (logits for row `position`), or None when already
        caught up.

        With `need_logits=False` the tail chunk is PADDED UP to the smallest
        bucket that fits the cache (repeating the last row), so a full
        catch-up is at most two dispatches. The padded rows write garbage
        K/V at cache indices [position, j+C) — safe because a cache row is
        only ever read by queries at positions >= its index, and every such
        query belongs to a later consume/block pass that re-writes the row
        first (queries only run at the write frontier). The returned logits
        would belong to the padded tail, so they are only valid (and only
        computed exactly) when need_logits=True."""
        import time as _time

        t0 = _time.perf_counter()
        logits = None
        while self.consumed < position:
            remaining = position - self.consumed
            j = self.consumed
            C = next(c for c in self.CHUNKS if c <= remaining)
            real = C
            if not need_logits:
                # smallest bucket >= remaining whose rows stay inside the
                # cache; CHUNKS is descending, so scan from the small end
                for b in reversed(self.CHUNKS):
                    if b >= remaining and j + b <= self.max_context_len:
                        C, real = b, remaining
                        break

            def chunk(a, lo):
                if a is None:
                    return None
                a = np.asarray(a[lo : lo + C])
                if a.shape[0] < C:
                    a = np.concatenate(
                        [a, np.repeat(a[-1:], C - a.shape[0], axis=0)], axis=0
                    )
                return jnp.asarray(a[None])

            self.caches, logits = self._consume(
                self.variables, self.caches, chunk(tokens, j),
                chunk(masked_tokens, j + 1), chunk(style, j + 1),
                chunk(context, j + 1), j,
            )
            self.consumed += real
            self.stats["consume_calls"] += 1
            self.stats["consumed_tokens"] += real
        self.stats["consume_wall_s"] += _time.perf_counter() - t0
        return logits

    def rollback(self, position: int):
        """Logical rollback: mark tokens from `position` as not consumed (the
        cache rows will simply be overwritten)."""
        self.consumed = min(self.consumed, position)

    def warmup(self, style_dim=None, ctx_dim=None, *, greedy=False,
               temperature=1.0, filter_kwargs=None, mask_cols=(),
               filter_fn=top_k):
        """Pre-compile (or load from the persistent compile cache) every
        decode-path program: one consume call per CHUNKS bucket and one
        block call per BLOCK_BUCKETS size, against zero-filled inputs.

        Without this, the first real-time window that reaches a new bucket
        size pays that program's compile/load INSIDE its wall-clock budget —
        measured as ~5-7 s one-off window spikes at both serving regimes
        (BASELINE.md round 5 SLO traces). Content of the warmup rows is
        irrelevant; only shapes/dtypes key the programs."""
        T = self.max_context_len
        toks = np.zeros((T + 2, self.num_streams), dtype=np.int64)
        style = (
            np.zeros((T + 2, style_dim), np.float32) if style_dim else None
        )
        ctx = np.zeros((T + 2, ctx_dim), np.float32) if ctx_dim else None
        self.caches = self._init_cache()
        self.consumed = 0
        # consuming to sum(distinct buckets) exercises each bucket exactly
        # once (the greedy bucket choice peels them largest-first)
        self._consume_to(toks, toks, style, ctx,
                         min(sum(set(self.CHUNKS)), T - 1))
        rng = jax.random.PRNGKey(0)
        for b in self.BLOCK_BUCKETS:
            if b + 1 > T:
                continue
            self.decode_block(
                toks, toks, style, ctx, 1, b, 0, rng, greedy, temperature,
                filter_kwargs, tuple(mask_cols), filter_fn,
            )
        jax.block_until_ready(self.caches)
        self.reset()

    # ---- block decode: sample ON DEVICE, one host sync per block ----
    #
    # The per-note path costs one device->host logits round-trip per note
    # (~30 ms each on a tunneled chip), which dominates the real-time window
    # budget. decode_block runs N sequential decode+sample steps inside ONE
    # compiled lax.scan — each step consumes the previous (possibly
    # just-sampled) row, applies the LM head, masks pad/mask ids, and samples
    # the masked streams on device — then syncs the N decoded rows in a
    # single transfer. N is bucketed so a handful of programs cover all
    # block lengths.

    BLOCK_BUCKETS = (4, 8, 16, 32, 64)

    def _build_block_fn(self, n_pad, greedy, filter_kwargs, mask_cols,
                        filter_fn):
        from ..models.wrappers import _stream_order

        model = self.model
        filter_kwargs = dict(filter_kwargs or {})
        n_streams = len(_stream_order(model))

        # `variables` is a traced argument (not a closure constant) for the
        # same remote-compile payload reason as _consume_fn
        def block_fn(variables, caches, prev_row, blk_tokens, blk_masked,
                     blk_style, blk_ctx, start, note_base, rng, temperature):
            # prev_row: (1, S) the already-known row at position first-1;
            # blk_*: (1, n_pad, ...) rows first..first+n_pad-1 (+1-aligned
            # companions of the consumed rows); start = first - 1;
            # note_base = absolute index (in the generated sequence) of the
            # first block row, anchoring the per-note rng derivation.
            def body(carry, k):
                caches, prev = carry

                def sl(a):
                    return (
                        jax.lax.dynamic_slice_in_dim(a, k, 1, 1)
                        if a is not None else None
                    )

                out = model.apply(
                    variables,
                    prev[:, None],
                    masked_tokens=sl(blk_masked),
                    style_embeddings=sl(blk_style),
                    context=sl(blk_ctx),
                    caches=caches,
                    cache_index=start + k,
                    method="decode_step",
                )
                logits = model.apply(
                    variables, out.hidden_state[:, -1],
                    method=lambda m, h: m.perf_decoder.apply_lm_head(h),
                )
                row = jax.lax.dynamic_slice_in_dim(blk_tokens, k, 1, 1)[:, 0]
                # PARTITION-INVARIANT key derivation: fold the absolute note
                # index into the window rng, then split per logit stream —
                # identical to _decode_rows_per_note, so the sampled stream
                # for a given seed does not depend on how notes are grouped
                # into blocks vs chord groups
                step_rng = jax.random.fold_in(rng, note_base + k)
                srngs = jax.random.split(step_rng, n_streams)
                new_row = row
                for s, key in mask_cols:
                    lg = logits[key].astype(jnp.float32)
                    lg = lg.at[:, 0].set(NEG_INF).at[:, 1].set(NEG_INF)
                    if greedy:
                        samp = jnp.argmax(lg, axis=-1)
                    else:
                        filtered = filter_fn(lg, **filter_kwargs)
                        samp = jax.random.categorical(
                            srngs[s], filtered / temperature, axis=-1
                        )
                    samp = samp.astype(row.dtype)
                    new_row = new_row.at[:, s].set(
                        jnp.where(row[:, s] == MASK, samp, row[:, s])
                    )
                return (out.caches, new_row), new_row[0]

            (caches, _), rows = jax.lax.scan(
                body, (caches, prev_row), jnp.arange(n_pad)
            )
            return caches, rows  # rows: (n_pad, S)

        return jax.jit(block_fn)

    def decode_block(
        self, tokens, masked_tokens, style, context, first, n, note_base,
        rng, greedy, temperature, filter_kwargs, mask_cols, filter_fn=top_k,
    ):
        """Decode rows [first, first+n) of `tokens` in one compiled scan.

        Catches the cache up to the block start (async per-token consumes),
        runs the block, advances `consumed` past the real rows (padded bucket
        rows are stale-but-masked, same semantics as rollback). Returns
        (n, S) decoded rows as numpy, or None when the group is larger than
        every bucket (caller falls back to the per-note path).

        Near the cache capacity the bucket is LEFT-ALIGNED over already-
        decoded rows instead of refused: re-feeding a known row re-writes its
        K/V rows bit-identically (the cache write depends only on the row
        content, which is unchanged) and its re-sampled streams are discarded
        by the `where(row == MASK, ...)` select, so the block stays the fast
        path all the way to the cap. Before this, groups decoded within
        bucket-distance of the cap fell back to the per-note path (one ~25 ms
        tunnel round-trip per note) — the dominant cost of every post-
        window-shift SLO violation at the dim-1024 serving regime."""
        if self.caches is None:
            self.caches = self._init_cache()
            self.consumed = 0
        if self.consumed >= first:
            self.consumed = max(0, first - 1)

        n_pad = next((b for b in self.BLOCK_BUCKETS if b >= n), None)
        if n_pad is None:
            self.stats["block_refusals"] += 1
            return None
        # left-shift the bucket so its last row stays inside the cache;
        # rows [first_eff, first) are already-known rows re-fed idempotently
        lpad = max(0, (first - 1) + n_pad - self.max_context_len)
        if lpad > n_pad - n or first - lpad < 1:
            self.stats["block_refusals"] += 1
            return None
        first_eff = first - lpad
        self.stats["block_calls"] += 1

        if self.consumed < first_eff - 1:
            # the block re-feeds from row first_eff-1, so the catch-up's
            # final logits are unused -> padded (fewest-dispatch) chunks
            self._consume_to(tokens, masked_tokens, style, context,
                             first_eff - 1, need_logits=False)

        def pad(a, width):
            if a is None:
                return None
            a = np.asarray(a[first_eff : first_eff + width])
            if a.shape[0] < width:
                a = np.concatenate(
                    [a, np.repeat(a[-1:], width - a.shape[0], axis=0)], axis=0
                )
            return jnp.asarray(a[None])

        # temperature is a TRACED argument of the block fn, not part of the
        # key: interactive temperature steering between windows must not
        # recompile the scan program (minutes-slow on a tunneled chip)
        key = (n_pad, bool(greedy),
               tuple(sorted((filter_kwargs or {}).items())), tuple(mask_cols),
               filter_fn)
        fn = self._block_fns.get(key)
        if fn is None:
            fn = self._build_block_fn(
                n_pad, greedy, filter_kwargs, tuple(mask_cols), filter_fn,
            )
            self._block_fns[key] = fn

        import time as _time

        t0 = _time.perf_counter()
        self.caches, rows = fn(
            self.variables,
            self.caches,
            jnp.asarray(tokens[None, first_eff - 1]),
            pad(tokens, n_pad),
            pad(masked_tokens, n_pad),
            pad(style, n_pad),
            pad(context, n_pad),
            first_eff - 1,
            # keys are fold_in(rng, note_base + k) over block rows k; shift
            # the base so the NEW rows keep their absolute-note-index keys
            # (re-fed known rows' keys don't matter — their samples are
            # discarded by the where)
            note_base - lpad,
            rng,
            jnp.float32(temperature),
        )
        self.consumed = first + n - 1  # padded tail rows are stale/masked
        out = np.asarray(jax.device_get(rows))[lpad : lpad + n]
        self.stats["block_wall_s"] += _time.perf_counter() - t0
        return out


@dataclass
class PerformanceData:
    perf_seq: Optional[np.ndarray] = None
    notes: Optional[np.ndarray] = None
    embeddings: Optional[np.ndarray] = None
    context: Optional[np.ndarray] = None
    gen_seq: Optional[np.ndarray] = None
    intermediates: Optional[IntermediateData] = None
    reached_eos: bool = False


class ScorePerformerGenerator:
    """(generators.py:35-443)"""

    def __init__(self, model, variables, dataset, collator, messenger: SPMupleMessenger):
        self.model = model
        self.variables = variables
        self.dataset = dataset
        self.tokenizer = dataset.tokenizer
        self.collator = collator
        self.messenger = messenger

        self.sos_token_id = SOS
        self.eos_token_id = EOS

        num_dims = len(self.tokenizer.sizes)
        self.mask_dims = np.array(
            sorted(set(range(num_dims)) - set(self.collator.mask_ignore_token_dims))
        )

        self.perf_data = PerformanceData()
        self._decoder: Optional[StreamingDecoder] = None
        self._last_window_start = 0

        # the chunked encoder pass runs once per window chunk with collator-
        # padded (fixed) shapes: jit it ONCE here — an eager `model.apply`
        # dispatch is minutes-slow through the tunneled remote-compile
        # platform (prepare measured 874 s eager -> seconds jitted).
        # `variables` is a traced argument, not a closure constant, to keep
        # the compile-request payload small at dim >= 1024 (HTTP 413).
        self._encode_jit = jax.jit(
            lambda variables, perf, perf_mask, score, score_mask, bars, beats, onsets:
            self.model.apply(
                variables, perf, perf_mask, score, score_mask, bars, beats,
                onsets, method="encode_embeddings",
                rngs={"mmd": jax.random.PRNGKey(0)},
            )
        )
        self._latents_jit = jax.jit(
            lambda variables, emb, bars, beats, onsets: self.model.apply(
                variables, emb, bars=bars, beats=beats, onsets=onsets,
                method=lambda m, e, **kw: m.perf_encoder.embeddings_to_latents(e, **kw),
            )
        )

    def reset(self):
        self.perf_data = PerformanceData()
        if self._decoder is not None:
            self._decoder.reset()

    # ---- preparation (generators.py:68-104) ----

    def prepare_performance_notes(
        self,
        perf_idx: int,
        score_embeddings: Optional[np.ndarray] = None,
        perf_embeddings: Optional[np.ndarray] = None,
        overlay_bars: float = 0.5,
    ) -> PerformanceData:
        perf_seq = self.dataset.performances[perf_idx]
        self.perf_data.perf_seq = perf_seq

        initial_tempo = 120.0
        if isinstance(self.tokenizer, SPMuple2) and hasattr(self.dataset, "initial_tempos"):
            initial_tempo = self.dataset.initial_tempos[
                self.dataset.performance_names[perf_idx]
            ]

        perf_seq = self.dataset.processor.add_sos_token(perf_seq)
        perf_seq = self.dataset.processor.add_eos_token(perf_seq)

        need_emb = perf_embeddings is None or score_embeddings is None
        if need_emb:
            score_embeddings, perf_embeddings, _ = self.encode_embeddings(
                perf_idx, overlay_bars=overlay_bars
            )

        perf_notes = perf_seq.copy()
        perf_notes[1:-1][:, self.mask_dims] = MASK

        self.perf_data.notes = perf_notes
        self.perf_data.embeddings = np.asarray(perf_embeddings) if perf_embeddings is not None else None
        self.perf_data.context = np.asarray(score_embeddings) if score_embeddings is not None else None

        if isinstance(self.tokenizer, SPMuple2):
            self.perf_data.intermediates = SPMuple2IntermediateData(initial_tempo=initial_tempo)

        return self.perf_data

    # ---- chunked encoder pass (generators.py:320-426) ----

    def encode_embeddings(
        self, perf_idx: int, compute_latents: bool = False, overlay_bars: float = 0.0
    ):
        from ..data.datasets import ScorePerformanceSampleMeta, get_end_bar

        dataset = self.dataset
        perf = dataset.performance_names[perf_idx]
        score, _ = dataset._performance_map[perf]
        score_idx = dataset.scores._name_to_idx[score]
        score_indices = dataset._score_indices[score_idx]
        if score_indices is None:
            score_indices = dataset.indexer.compute_bar_indices(dataset.scores[score_idx])
            dataset._score_indices[score_idx] = score_indices

        bar_col = self.tokenizer.types_idx["Bar"]
        z = self.tokenizer.zero_token
        score_seq = dataset.scores[score_idx]
        total_bars = score_seq[-1, bar_col] - z

        start_bar = 0
        end_bar = get_end_bar(score_indices, start_bar, dataset.max_seq_len, dataset.max_bar)
        meta = ScorePerformanceSampleMeta(
            idx=None, score_idx=score_idx, perf_idx=perf_idx,
            start_bar=start_bar, end_bar=end_bar,
        )
        sample = dataset.get(meta=meta)

        emb_start_bar = start_bar
        score_embeddings, perf_embeddings = [], []
        while True:
            has_sos = sample.score[0, 0] == self.sos_token_id
            has_eos = sample.score[-1, 0] == self.eos_token_id
            first_note_idx = int(has_sos)
            last_note_idx = sample.score.shape[0] - int(has_eos)
            last_perf_idx = sample.perf.shape[0] - int(has_eos)

            batch = self.collator([sample])
            from ..data.collators import scoreperformer_model_inputs

            inputs = scoreperformer_model_inputs(batch)

            # re-base bars to zero (generators.py:362-366)
            shift = inputs["score"][0, first_note_idx, bar_col] - z
            inputs["score"][0, first_note_idx:last_note_idx, bar_col] -= shift
            inputs["perf"][0, first_note_idx:last_perf_idx, bar_col] -= shift

            score_emb, perf_emb, _ = self._encode_jit(
                self.variables,
                jnp.asarray(inputs["perf"]),
                jnp.asarray(inputs["perf_mask"]),
                jnp.asarray(inputs["score"]),
                jnp.asarray(inputs["score_mask"]),
                jnp.asarray(inputs["bars"]),
                jnp.asarray(inputs["beats"]),
                jnp.asarray(inputs["onsets"]),
            )

            n_notes = sample.score.shape[0]
            note_cut_idx = 0
            if overlay_bars:
                hits = np.where(sample.score[:, bar_col] - z >= emb_start_bar)[0]
                note_cut_idx = (int(hits[0]) - first_note_idx) if len(hits) else 0

            if score_emb is not None:
                score_embeddings.append(np.asarray(score_emb[0, note_cut_idx:n_notes]))
            if perf_emb is not None:
                perf_embeddings.append(np.asarray(perf_emb[0, note_cut_idx:n_notes]))

            if has_eos:
                break

            if overlay_bars:
                start_bar = int(
                    sample.score[int(sample.score.shape[0] * (1 - overlay_bars)), 0] - z
                )
                emb_start_bar = end_bar + 1
            else:
                emb_start_bar = start_bar = end_bar + 1
            end_bar = get_end_bar(score_indices, start_bar, dataset.max_seq_len, dataset.max_bar)
            meta.start_bar, meta.end_bar = start_bar, end_bar
            sample = dataset.get(meta=meta)

        score_embeddings = np.concatenate(score_embeddings, 0) if score_embeddings else None
        perf_embeddings = np.concatenate(perf_embeddings, 0) if perf_embeddings else None

        latents = None
        if compute_latents and perf_embeddings is not None:
            bars = score_seq[:, 0]
            beats = dataset._beat_maps[score_idx]
            onsets = dataset._onset_maps[score_idx]
            bars, beats, onsets = (
                jnp.asarray(np.concatenate([[s[0]], s, [s[-1]]]))[None]
                for s in (bars, beats, onsets)
            )
            latents = self._latents_jit(
                self.variables,
                jnp.asarray(np.asarray(perf_embeddings)[None]),
                bars,
                beats,
                onsets,
            )

        return score_embeddings, perf_embeddings, latents

    # ---- streaming generation (generators.py:106-295) ----

    def warmup(
        self,
        max_context_len: int = 512,
        *,
        greedy: bool = False,
        temperature: float = 1.0,
        filter_fn: Callable = top_k,
        filter_kwargs: Optional[Dict] = None,
    ):
        """Pre-compile the streaming decode programs (consume buckets + block
        buckets) for the given sampling configuration, so no real-time window
        pays a first-use compile/load. Call once after loading the model,
        before the first `generate_performance_notes` window; pass the same
        sampling arguments you will stream with (they key the compiled block
        programs)."""
        if self._decoder is None or self._decoder.max_context_len != max_context_len:
            self._decoder = StreamingDecoder(
                self.model, self.variables, max_context_len,
                len(self.tokenizer.sizes),
            )
        cfg = self.model.config
        style_dim = (
            cfg.perf_encoder.embedding_dim if cfg.perf_encoder is not None else None
        )
        ctx_dim = cfg.dim if cfg.score_encoder is not None else None
        self._decoder.warmup(
            style_dim, ctx_dim, greedy=greedy, temperature=temperature,
            filter_kwargs=filter_kwargs,
            mask_cols=self._sampled_stream_cols(), filter_fn=filter_fn,
        )

    def _sampled_stream_cols(self):
        """Static (column, stream-name) pairs of the sampled streams, for the
        device-side block sampler."""
        from ..models.wrappers import _stream_order

        keys = list(_stream_order(self.model))
        return tuple((int(s), keys[int(s)]) for s in self.mask_dims)

    def _decode_rows_per_note(
        self, wb, wb_masked, style, ctx, window, base, num_new, note_base,
        bar_shift, bar_col, rng, greedy, temperature, filter_fn, filter_kwargs,
    ):
        """Per-note decode: one predict (host logits sync) per position."""
        for k in range(num_new):
            pos = base + k
            logits = self._decoder.predict(wb, wb_masked, style, ctx, pos)
            # ONE batched host transfer for all streams: per-leaf np.array()
            # fetches cost a device round-trip each (~25 ms on a tunneled
            # chip; measured 300 ms vs 32 ms per step)
            logits = jax.device_get(logits)
            # partition-invariant per-note key (see decode_block's scan body):
            # fold the ABSOLUTE note index into the window rng, so the drawn
            # key depends only on (seed, note), never on the chord-group or
            # block partition that reached it
            step_rng = jax.random.fold_in(rng, note_base + k)
            row = wb[pos].copy()
            srngs = jax.random.split(step_rng, len(logits))
            # NB: predict() crosses a jit boundary, which SORTS dict keys —
            # map logits to columns by stream name, never positionally
            for s, key, lg in logits_by_column(self.model, logits):
                if row[s] != MASK:
                    continue
                lg = np.array(lg[0])  # writable copy
                lg[0] = lg[1] = NEG_INF
                if greedy:
                    row[s] = int(np.argmax(lg))
                else:
                    filtered = filter_fn(jnp.asarray(lg[None]), **(filter_kwargs or {}))
                    row[s] = int(
                        jax.random.categorical(srngs[s], filtered / temperature, axis=-1)[0]
                    )
            wb[pos] = row
            window[pos] = row
            # restore absolute bar id in the carried window
            if row[bar_col] > EOS:
                window[pos, bar_col] = row[bar_col] + bar_shift

    def generate_performance_notes(
        self,
        start_time: float = 0.0,
        time_window: float = 0.2,
        time_window_overflow: float = 0.1,
        delta_embedding: Optional[np.ndarray] = None,
        max_context_len: int = 512,
        group_chord_notes: bool = True,
        rng: Optional[jax.Array] = None,
        temperature: float = 1.0,
        filter_fn: Callable = top_k,
        filter_kwargs: Optional[Dict] = None,
        greedy: bool = False,
        block_size: int = 16,
    ):
        tok = self.tokenizer
        perf_notes = self.perf_data.notes
        perf_embeddings = (
            self.perf_data.embeddings.copy() if self.perf_data.embeddings is not None else None
        )
        score_embeddings = self.perf_data.context
        rng = rng if rng is not None else jax.random.PRNGKey(0)

        if self.perf_data.gen_seq is None:
            self.perf_data.gen_seq = perf_notes[:1].copy()
        gen_total = self.perf_data.gen_seq

        if self._decoder is None or self._decoder.max_context_len != max_context_len:
            self._decoder = StreamingDecoder(
                self.model, self.variables, max_context_len, perf_notes.shape[1]
            )

        current_note_idx = gen_total.shape[0]
        intermediates = self.perf_data.intermediates
        bar_col = 0
        z = tok.zero_token

        # window start (generators.py:133-146)
        start_idx = 0
        if current_note_idx >= max_context_len - 1:
            bars = gen_total[1:, bar_col]
            next_bar_idx = np.where(np.diff(bars))[0]
            fits = np.where(current_note_idx - (next_bar_idx + 1) < max_context_len)[0]
            start_idx = 0 if len(fits) == 0 else int(next_bar_idx[fits[0]] + 2)

        # working buffers over the window
        window = gen_total[start_idx:].copy()
        known_len = window.shape[0]

        all_token_times: List[float] = []
        all_gen_tokens: List[np.ndarray] = []
        window_start = start_idx  # absolute index of window[0]
        # cache stays valid across calls only if the window start is unchanged
        needs_prefill = start_idx != self._last_window_start or self._decoder.caches is None
        self._last_window_start = start_idx

        tempo_col = tok.types_idx["Tempo"]
        # host tempo refresh rewrites each chord's Tempo token from the
        # messenger recursion BEFORE decoding it — the per-note path must
        # interleave host work per chord, so block decode is disabled then
        tempo_host_refresh = isinstance(tok, SPMuple2) and tempo_col not in self.mask_dims
        use_block = block_size > 1 and not tempo_host_refresh
        sampled_cols = self._sampled_stream_cols() if use_block else None
        # ADAPTIVE block sizing: each block dispatch costs a tunnel round
        # trip, so dense windows (a fast run of 100+ notes) want few BIG
        # blocks while sparse windows want small ones (a block decodes its
        # full bucket speculatively — oversize means wasted sequential
        # steps). Size each block from the score's predicted note count for
        # the window; the per-note rng keys are partition-invariant
        # (fold_in by absolute note index), so the block partition never
        # changes the sampled stream — parity-tested either way.
        n_est = 0
        if use_block:
            n_est = self.predict_number_of_notes(
                start_time, time_window + time_window_overflow,
                max_notes=2 * max(self._decoder.BLOCK_BUCKETS),
            )

        while not self.perf_data.reached_eos:
            if use_block:
                # block of upcoming notes (chord boundaries are irrelevant to
                # the device scan — each step feeds the previous decoded row);
                # bounded by half the context window so a block plus some
                # retained context always fits the KV cache
                # SHRINK-ONLY: the estimate rides the model's own sampled
                # tempo, which overshoots badly under an uncalibrated model —
                # blocks sized ABOVE block_size were measured to double the
                # shift cadence and waste 100s of ms of speculative scan
                # steps per window at dim 1024 (BASELINE.md round 5); sizing
                # BELOW block_size only trims real per-step cost
                est_left = n_est - len(all_token_times)
                eff = block_size if est_left <= 0 else max(
                    4, min(est_left + 2, block_size)
                )
                eff_block = max(1, min(eff, max_context_len // 2))
                end = min(current_note_idx + eff_block, len(perf_notes))
                new_notes = perf_notes[current_note_idx:end].copy()
                eos_rows = np.where(new_notes[:, bar_col] == self.eos_token_id)[0]
                if eos_rows.size:
                    new_notes = new_notes[: eos_rows[0]]
                    if new_notes.shape[0] == 0:
                        self.perf_data.reached_eos = True
                        break
            # chord group (generators.py:159-166)
            elif group_chord_notes:
                end = current_note_idx + 1
                while end < len(perf_notes) and np.all(
                    perf_notes[current_note_idx, :2] == perf_notes[end, :2]
                ):
                    end += 1
                new_notes = perf_notes[current_note_idx:end].copy()
            else:
                new_notes = perf_notes[current_note_idx : current_note_idx + 1].copy()
            num_new = new_notes.shape[0]

            # refresh tempo tokens from intermediates when not predicted
            if isinstance(tok, SPMuple2) and tempo_col not in self.mask_dims:
                tempo = (
                    intermediates.tempos[-1, 0]
                    if intermediates is not None and intermediates.tempos is not None
                    else intermediates.initial_tempo
                )
                new_notes[:, tempo_col] = find_closest(tok.vocab.tempos, tempo) + z

            if new_notes[-1, bar_col] == self.eos_token_id:
                self.perf_data.reached_eos = True
                break

            window = np.concatenate([window, new_notes], axis=0)

            # window shift at bar boundaries (generators.py:183-200)
            if window.shape[0] >= max_context_len:
                has_sos = window[0, bar_col] == self.sos_token_id
                first = int(has_sos)
                bars = window[first:, bar_col]
                next_bar_idx = np.where(np.diff(bars))[0]
                shift = 1
                if len(next_bar_idx) > 0:
                    fits = np.where(window.shape[0] - (next_bar_idx + first) < max_context_len)[0]
                    if len(fits) > 0 and next_bar_idx[fits[0]] + 1 + first != window.shape[0] - 1:
                        shift = int(next_bar_idx[fits[0]] + 1 + first)
                # hard cap: the decoder's KV cache holds max_context_len
                # rows, and decode positions are window indices — when no
                # bar boundary fits (a single bar wider than the window),
                # shift=1 would let the window outgrow the cache and clamp
                # KV writes past capacity, silently corrupting attention.
                # Starting mid-bar is what shift=1 already does; shift far
                # enough that the window fits.
                min_shift = window.shape[0] - max_context_len + 1
                if shift < min_shift:
                    if min_shift > window.shape[0] - num_new:
                        raise ValueError(
                            f"a single decode group of {num_new} notes "
                            f"cannot fit the {max_context_len}-token "
                            f"context window; raise max_context_len or "
                            f"disable group_chord_notes"
                        )
                    shift = min_shift
                window = window[shift:]
                known_len -= shift
                window_start += shift
                self._last_window_start = window_start
                self._decoder.reset()
                needs_prefill = True
                if known_len < max_context_len / 8:
                    break

            # bar re-base to zero (generators.py:203-204)
            wb = window.copy()
            first = int(wb[0, bar_col] == self.sos_token_id)
            live = wb[first:, bar_col] > EOS
            bar_shift = wb[first, bar_col] - z
            wb[first:, bar_col] = np.where(live, wb[first:, bar_col] - bar_shift, wb[first:, bar_col])

            # doubled masked input (generators.py:207-208)
            wb_masked = wb.copy()
            wb_masked[first:][:, self.mask_dims] = MASK

            # style delta (generators.py:211-212)
            if perf_embeddings is not None and delta_embedding is not None:
                perf_embeddings[current_note_idx : current_note_idx + num_new] += delta_embedding

            style = (
                perf_embeddings[window_start : window_start + wb.shape[0]]
                if perf_embeddings is not None
                else None
            )
            ctx = (
                score_embeddings[window_start : window_start + wb.shape[0]]
                if score_embeddings is not None
                else None
            )

            if needs_prefill:
                self._decoder.reset()
                needs_prefill = False

            base = wb.shape[0] - num_new
            rows = None
            if use_block:
                # ONE compiled scan decodes + samples the whole block on
                # device; a single host sync fetches the decoded rows
                rows = self._decoder.decode_block(
                    wb, wb_masked, style, ctx, base, num_new,
                    current_note_idx, rng,
                    greedy=greedy, temperature=temperature,
                    filter_kwargs=filter_kwargs,
                    mask_cols=sampled_cols,
                    filter_fn=filter_fn,
                )
            if rows is not None:
                for k in range(num_new):
                    row = rows[k]
                    wb[base + k] = row
                    window[base + k] = row
                    if row[bar_col] > EOS:
                        window[base + k, bar_col] = row[bar_col] + bar_shift
            else:
                # per-note fallback (tempo host refresh, or a block that
                # would wrap the ring cache): unmask each position in turn.
                # keys are fold_in(rng, absolute_note_index) — identical
                # derivation to the block path, so per-note keys can't
                # collide across groups and can't diverge from block decode
                self._decode_rows_per_note(
                    wb, wb_masked, style, ctx, window, base, num_new,
                    current_note_idx, bar_shift, bar_col, rng, greedy,
                    temperature, filter_fn, filter_kwargs,
                )

            gen_tokens = window[base:].copy()

            token_times, intermediates = self.messenger.tokens_to_messages(
                gen_tokens,
                note_attributes=False,
                note_off_events=False,
                intermediates=intermediates,
                return_intermediates=True,
                sort=False,
            )
            all_token_times.extend(np.atleast_1d(token_times).tolist())
            all_gen_tokens.append(gen_tokens)

            current_note_idx += num_new

            if np.max(token_times) >= start_time + time_window + time_window_overflow:
                break

        if not all_gen_tokens:
            return None, []

        # cut to the window (generators.py:259-276)
        times = np.array(all_token_times)
        fit = np.where(times <= start_time + time_window)[0]
        cut_idx = 0 if len(fit) == 0 else int(fit[-1] + 1)

        # tokens decoded beyond the cut are discarded: ROLL BACK the decoder
        # past them instead of resetting — the kept prefix rows stay valid, so
        # the next window never re-prefills the whole context (the reset here
        # used to cost a full window re-consume per overshooting window)
        overshoot = len(all_token_times) - cut_idx
        if overshoot > 0:
            self._decoder.rollback(max(0, self._decoder.consumed - overshoot))

        if cut_idx == 0:
            return None, []

        gen_tokens = np.concatenate(all_gen_tokens, axis=0)[:cut_idx]
        messages, self.perf_data.intermediates = self.messenger.tokens_to_messages(
            gen_tokens,
            intermediates=self.perf_data.intermediates,
            return_intermediates=True,
            to_times=True,
            sort=False,
        )

        if perf_embeddings is not None and delta_embedding is not None:
            total_len = self.perf_data.gen_seq.shape[0]
            self.perf_data.embeddings[total_len : total_len + cut_idx] = perf_embeddings[
                total_len : total_len + cut_idx
            ]

        self.perf_data.gen_seq = np.concatenate([self.perf_data.gen_seq, gen_tokens], axis=0)

        return gen_tokens, messages

    def predict_number_of_notes(
        self, start_time: float = 0.0, time_window: float = 0.2, max_notes: int = 32
    ):
        """(generators.py:297-318)"""
        num_gen = len(self.perf_data.gen_seq) - 1 if self.perf_data.gen_seq is not None else 0
        future = self.perf_data.perf_seq[num_gen : num_gen + max_notes].copy()
        if len(future) == 0:
            return 0

        inter = self.perf_data.intermediates
        if inter is not None and inter.tempos is not None:
            tempo_col = self.tokenizer.types_idx["Tempo"]
            tempo_token = int(
                find_closest(self.tokenizer.vocab.tempos, inter.tempos[-1, 0])
                + self.tokenizer.zero_token
            )
            shift = tempo_token - self.perf_data.perf_seq[num_gen - 1, tempo_col]
            z = self.tokenizer.zero_token
            # clip to the tempo vocab: the reference's shift assumes trained-
            # model tempos stay in range; extreme shifts would index past the
            # bin table during messaging
            future[:, tempo_col] = np.clip(
                future[:, tempo_col] + shift, z,
                z + len(self.tokenizer.vocab.tempos) - 1,
            )

        times = self.messenger.tokens_to_messages(
            future, note_attributes=False, note_off_events=False,
            intermediates=inter, sort=False,
        )
        return int((np.atleast_1d(times) <= start_time + time_window).sum())
