"""Persistent render server: load a checkpoint once, serve many requests.

Production serving layer (the reference has no server — its interactive flow
is the Colab notebook around inference/generators.py; reference README.md:13).
TPU-first design: scores are padded to LENGTH BUCKETS and requests coalesce
into BATCH BUCKETS, so the compiled encoder pass and the compiled MixedLM
decode scan are reused across requests — a running server sees at most a
handful of compilations regardless of request lengths or load (static shapes;
XLA caches per shape).

Dynamic request batching: decode throughput on TPU scales strongly with batch
(BASELINE.md: 107k tok/s at batch 32 vs 779k at 512 — per-row cost drops with
occupancy), so `render_batch` stacks any number of concurrent requests into
one compiled call with per-row valid lengths, per-row temperatures, and
per-row style deltas. serve.py's TCP mode coalesces concurrent client
requests into these batches (``--max-batch`` / ``--batch-window-ms``).

Padding correctness (length AND batch padding):
- encoder: padded positions carry mask=False; the MMD encoder zeroes masked
  hidden states before aggregation, and padded segment ids are set to a
  sentinel (clipped to max_segments-1) so they cannot dilute valid segments;
- decoder: `mixedlm_unmask(valid_len)` is per-row; positions >= valid_len are
  untouched and the decode is causal, so padded tails cannot influence valid
  positions. Rows are independent (`tests/test_parallel.py` sharded-decode
  bit-parity), so batch-padding rows (valid_len=1) cannot influence real rows;
- outputs are truncated back to each request's true length before
  detokenization.

Determinism: a single (uncoalesced) request reproduces exactly for a given
seed, independent of which length bucket it lands in. A coalesced SAMPLED
batch draws from one combined RNG stream (key = fold of the requests' seeds),
so its outputs are deterministic given the same batch composition; greedy
requests are batch-invariant.

Wire protocol (serve.py): one JSON object per line, over stdin/stdout or TCP.
"""
from __future__ import annotations

import os
import threading
import time
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..midi import MidiScore
from ..models.wrappers import mixedlm_unmask
from ..ops.sampling import top_k
from ..tokenizers import TokSequence, load_tokenizer
from .render import load_model_from_checkpoint, prepare_render_inputs


class RenderServer:
    """Stateful renderer with length- and batch-bucketed compiled paths."""

    def __init__(
        self,
        checkpoint: str,
        tokenizer_path: Optional[str] = None,
        bucket: int = 128,
        max_len: int = 2048,
        cache_dtype: str = "fp32",
        chunk_size: int = 16,
    ):
        """`cache_dtype`: decoder KV-cache precision, "fp32" (default —
        bit-stable, fastest at flagship size), "bf16" (measured +18%
        decode throughput once caches reach ~1 GB, i.e. serving configs at
        dim >= 1024 — scripts/exp_scale_decode.py / BASELINE.md round 3),
        or "int8" (quantized prefix, per-row scales — 4x smaller prefix
        reads; measured +27% over fp32 / +7% over bf16 at the 1 GB scale
        regime, BASELINE.md round 3; trajectories are not bit-stable vs
        fp32). "auto" applies that measured ladder by model dim: int8 at
        dim >= 1024, fp32 below (where bf16/int8 measured neutral-to-worse
        — BASELINE.md round 4 ceiling2 A/B).
        `chunk_size`: chunked-carry decode chunk (16 is the measured knee)."""
        self.model, self.variables, self.model_cfg = load_model_from_checkpoint(checkpoint)
        if cache_dtype == "auto":
            cache_dtype = "int8" if int(getattr(self.model_cfg, "dim", 0)) >= 1024 else "fp32"
        self.cache_dtype = cache_dtype
        if tokenizer_path is None:
            tokenizer_path = os.path.join(checkpoint, "tokenizer.json")
        self.tokenizer = load_tokenizer(tokenizer_path)
        self.bucket = int(bucket)
        # the decoder KV cache is sized per bucket, but the model's
        # max_seq_len bounds usable positions — clamp server capacity to it
        dec_max = getattr(self.model_cfg.perf_decoder, "max_seq_len", max_len)
        self.max_len = min(int(max_len), int(dec_max))
        self._lock = threading.Lock()
        self.stats = {"requests": 0, "errors": 0, "buckets": set(), "batches": {}}

        model = self.model
        kv_dtype = {"fp32": jnp.float32, "bf16": jnp.bfloat16, "int8": jnp.int8}[cache_dtype]
        chunk = int(chunk_size)
        # the decode fills only the perf streams — static, so the compiled
        # step can skip the other streams' discarded filters (mixedlm_unmask
        # sample_dims; +7% sampled decode, scripts/exp_sample_dims.py)
        from .render import PERF_STREAMS

        sample_dims = tuple(
            int(self.tokenizer.types_idx[k])
            for k in PERF_STREAMS
            if k in self.tokenizer.types_idx
        )

        # total style latent dim, known from the config (so style_delta can be
        # validated without waiting on device outputs)
        latent_dim = getattr(self.model_cfg.perf_encoder, "latent_dim", 0)
        self.style_dim = int(
            sum(latent_dim) if isinstance(latent_dim, (list, tuple)) else latent_dim
        )

        def render_step(variables, perf, pmask, score, smask, bars, beats,
                        onsets, tokens_in, masked_all, delta, rng, valid_len,
                        temperature, greedy):
            # ONE compiled program for encode + style steering + decode scan:
            # a split encode/decode needed a device sync between the two
            # dispatches, which on a tunneled remote chip costs a full round
            # trip per request. The style delta is added inside the compiled
            # path (a host-side eager add would trigger a remote compile).
            # All request-varying quantities are PER-ROW arrays: delta
            # (B, style_dim), valid_len (B,), temperature (B,).
            score_emb, style_emb, _ = model.apply(
                variables, perf, pmask, score, smask, bars, beats, onsets,
                method="encode_embeddings", rngs={"mmd": jax.random.PRNGKey(0)},
            )
            style = style_emb + delta[:, None, :]
            return mixedlm_unmask(
                model, variables, tokens_in, masked_all, rng=rng,
                style_embeddings=style, context=score_emb, valid_len=valid_len,
                temperature=temperature, filter_fn=top_k, greedy=greedy,
                cache_dtype=kv_dtype, chunk_size=chunk,
                sample_dims=sample_dims,
            )

        self._render_step = jax.jit(render_step, static_argnames=("greedy",))

    # ---- helpers ----

    def _bucketed_len(self, T: int) -> int:
        if T > self.max_len:
            raise ValueError(f"score has {T} tokens, server max_len is {self.max_len}")
        return min(self.max_len, -(-T // self.bucket) * self.bucket)

    @staticmethod
    def _bucketed_batch(B: int) -> int:
        """Next power of two — compiled programs are reused per batch bucket."""
        return 1 << max(0, B - 1).bit_length()

    @staticmethod
    def _pad_to(arr: np.ndarray, T_pad: int, value) -> np.ndarray:
        pad = T_pad - arr.shape[0]
        if pad <= 0:
            return arr
        width = [(0, pad)] + [(0, 0)] * (arr.ndim - 1)
        return np.pad(arr, width, constant_values=value)

    def warmup(self, lengths, greedy_variants=(False,), batch_sizes=(1,)) -> None:
        """Pre-compile the encoder + decode scan for the given padded lengths
        and batch buckets (dummy PAD inputs, valid_len=1) so requests never
        see compile latency. `greedy` is a static jit arg — pass
        greedy_variants=(False, True) to warm both the sampling and the
        greedy decode paths; pass batch_sizes=(1, max_batch) when serving
        with request coalescing."""
        S = len(self.tokenizer.sizes)
        S_sc = len(getattr(self.tokenizer, "score_sizes", self.tokenizer.sizes))
        for B in batch_sizes:
            B_pad = self._bucketed_batch(int(B))
            for T in lengths:
                T_pad = self._bucketed_len(int(T))
                # distinct buffers for every argument, exactly as a real
                # request builds them (host->device transfers of numpy arrays)
                zs = [jnp.asarray(np.zeros((B_pad, T_pad), np.int32)) for _ in range(3)]
                perf = jnp.asarray(np.zeros((B_pad, T_pad, S), np.int32))
                score = jnp.asarray(np.zeros((B_pad, T_pad, S_sc), np.int32))
                mask = jnp.asarray(np.broadcast_to((np.arange(T_pad) < 1)[None], (B_pad, T_pad)).copy())
                tokens_in = jnp.asarray(np.zeros((B_pad, T_pad, S), np.int32))
                masked_all = jnp.asarray(np.zeros((B_pad, T_pad, S), np.int32))
                delta = jnp.asarray(np.zeros((B_pad, self.style_dim), np.float32))
                with self._lock:
                    for greedy in greedy_variants:
                        out = self._render_step(
                            self.variables, perf, mask, score, mask, *zs,
                            tokens_in, masked_all, delta, jax.random.PRNGKey(0),
                            jnp.asarray(np.ones(B_pad, np.int32)),
                            jnp.asarray(np.ones(B_pad, np.float32)), greedy,
                        )
                        jax.block_until_ready(out)
                self.stats["buckets"].add(T_pad)
                self.stats["batches"].setdefault(B_pad, 0)

    # ---- API ----

    def render(
        self,
        score_midi: MidiScore,
        temperature: float = 1.0,
        greedy: bool = False,
        seed: int = 0,
        style_delta: Optional[np.ndarray] = None,
        output_path: Optional[str] = None,
    ) -> Dict:
        """Render one score; returns {perf, notes, wall_ms, padded_to}.

        `style_delta` (length = total style latent dim) is added to the
        encoder's style embeddings before decoding — the reference's
        interactive style steering (generators.py:211-212) exposed globally.
        """
        return self.render_batch([
            dict(score_midi=score_midi, temperature=temperature, greedy=greedy,
                 seed=seed, style_delta=style_delta, output_path=output_path)
        ])[0]

    def render_batch(self, requests: Sequence[Dict]) -> List[Dict]:
        """Render several scores in ONE compiled call (dynamic batching).

        Each request dict: {score_midi, temperature?, greedy?, seed?,
        style_delta?, output_path?}. All requests in a batch must share the
        `greedy` flag (it is a compiled-program variant — the serve.py
        coalescer groups by it). Returns one result dict per request, in
        order.
        """
        if not requests:
            return []
        t_start = time.perf_counter()
        greedy = bool(requests[0].get("greedy", False))
        if any(bool(r.get("greedy", False)) != greedy for r in requests):
            raise ValueError("all requests in a batch must share the greedy flag")

        prepared = [prepare_render_inputs(self.tokenizer, r["score_midi"])
                    for r in requests]
        lens = [len(p["deadpan_ids"]) for p in prepared]
        T_pad = self._bucketed_len(max(lens))
        B = len(requests)
        B_pad = self._bucketed_batch(B)

        # sentinel segment id for the padded tail: clips to max_segments-1 in
        # the one-hot aggregation, a bucket valid notes essentially never use.
        # NB: batching/padding happens in NUMPY before the transfer — a
        # device-side pad/broadcast is an eager op outside jit, and on
        # remote-compile TPU platforms every eager op costs a compile trip.
        sentinel = 10**6

        def stacked(key, value=0):
            rows = [self._pad_to(np.asarray(p[key]), T_pad, value) for p in prepared]
            if B_pad > B:
                filler = np.full_like(rows[0], value)
                rows = rows + [filler] * (B_pad - B)
            return jnp.asarray(np.ascontiguousarray(np.stack(rows)))

        perf = stacked("deadpan_ids")
        score = stacked("score_ids")
        bars = stacked("bars", sentinel)
        beats = stacked("beats", sentinel)
        onsets = stacked("onsets", sentinel)
        tokens_in = stacked("tokens_in")
        masked_all = stacked("masked_all")

        valid = np.asarray(lens + [1] * (B_pad - B), np.int32)
        mask = jnp.asarray(np.arange(T_pad)[None, :] < valid[:, None])

        deltas = np.zeros((B_pad, self.style_dim), np.float32)
        for i, r in enumerate(requests):
            sd = r.get("style_delta")
            if sd is None:
                continue
            d = np.asarray(sd, np.float32).reshape(-1)
            if d.shape[0] != self.style_dim:
                raise ValueError(
                    f"style_delta has {d.shape[0]} dims, "
                    f"style embedding has {self.style_dim}"
                )
            deltas[i] = d

        temps = np.asarray(
            [float(r.get("temperature", 1.0)) for r in requests]
            + [1.0] * (B_pad - B), np.float32,
        )
        seeds = [int(r.get("seed", 0)) for r in requests]
        rng = jax.random.PRNGKey(seeds[0])
        for s in seeds[1:]:  # combined stream for a coalesced sampled batch
            rng = jax.random.fold_in(rng, s)

        t_prep = time.perf_counter()
        with self._lock:
            out = self._render_step(
                self.variables, perf, mask, score, mask, bars, beats, onsets,
                tokens_in, masked_all, jnp.asarray(deltas), rng,
                jnp.asarray(valid), jnp.asarray(temps), greedy,
            )
            out_np = np.asarray(jax.device_get(out))
            t_dec = time.perf_counter()

        self.stats["requests"] += B
        self.stats["buckets"].add(T_pad)
        self.stats["batches"][B_pad] = self.stats["batches"].get(B_pad, 0) + 1
        ms = lambda a, b: round((b - a) * 1000, 2)  # noqa: E731

        results = []
        for i, r in enumerate(requests):
            perf_midi = self.tokenizer.performance_tokens_to_midi(
                TokSequence(ids=out_np[i, : lens[i]]),
                output_path=r.get("output_path"),
            )
            results.append({
                "perf": perf_midi,
                "notes": int(perf_midi.num_notes),
                "wall_ms": ms(t_start, time.perf_counter()),
                "padded_to": T_pad,
                "batched": B_pad,
                "timings": {
                    "prepare_ms": ms(t_start, t_prep),
                    "render_ms": ms(t_prep, t_dec),
                    "detok_ms": ms(t_dec, time.perf_counter()),
                },
            })
        return results

    # ---- wire layer ----

    @staticmethod
    def _parse_request(req: Dict) -> Dict:
        """JSON request dict -> render_batch request dict (raises on error)."""
        from ..midi import read_midi

        if "score" in req:
            score_midi = read_midi(req["score"])
        elif "score_b64" in req:
            import base64

            score_midi = read_midi(base64.b64decode(req["score_b64"]))
        else:
            raise ValueError("request needs 'score' (path) or 'score_b64'")
        return dict(
            score_midi=score_midi,
            temperature=float(req.get("temperature", 1.0)),
            greedy=bool(req.get("greedy", False)),
            seed=int(req.get("seed", 0)),
            style_delta=req.get("style_delta"),
            output_path=req.get("out"),
        )

    def _wire_response(self, rid, req: Dict, result: Dict) -> Dict:
        resp = {"id": rid, "ok": True, "notes": result["notes"],
                "wall_ms": result["wall_ms"], "padded_to": result["padded_to"],
                "batched": result["batched"], "timings": result["timings"]}
        out_path = req.get("out")
        if out_path:
            resp["out"] = out_path
        else:
            import base64

            from ..midi import write_midi

            resp["midi_b64"] = base64.b64encode(
                write_midi(result["perf"], None)
            ).decode("ascii")
        return resp

    def handle_request(self, req: Dict) -> Dict:
        """One JSON-dict request -> JSON-dict response (wire layer)."""
        return self.handle_batch([req])[0]

    def handle_batch(self, reqs: List[Dict]) -> List[Dict]:
        """Several JSON-dict requests -> responses, rendered in coalesced
        batches (one compiled call per greedy-flag group). Per-request parse
        errors produce per-request error responses; the rest still render."""
        responses: List[Optional[Dict]] = [None] * len(reqs)
        parsed = []
        for i, req in enumerate(reqs):
            rid = req.get("id")
            if req.get("cmd") == "ping":
                responses[i] = {"id": rid, "ok": True, "pong": True,
                                "requests": self.stats["requests"]}
                continue
            try:
                parsed.append((i, self._parse_request(req)))
            except Exception as e:  # noqa: BLE001 — wire boundary
                self.stats["errors"] += 1
                responses[i] = {"id": rid, "ok": False,
                                "error": f"{type(e).__name__}: {e}"}
        for greedy in (False, True):
            group = [(i, r) for i, r in parsed if r["greedy"] == greedy]
            if not group:
                continue
            try:
                results = self.render_batch([r for _, r in group])
                for (i, r), result in zip(group, results):
                    responses[i] = self._wire_response(reqs[i].get("id"), reqs[i], result)
            except Exception as e:  # noqa: BLE001 — report & keep serving
                self.stats["errors"] += len(group)
                for i, _ in group:
                    responses[i] = {"id": reqs[i].get("id"), "ok": False,
                                    "error": f"{type(e).__name__}: {e}"}
        return responses
