"""Persistent render server: load a checkpoint once, serve many requests.

Production serving layer (the reference has no server — its interactive flow
is the Colab notebook around inference/generators.py; reference README.md:13).
TPU-first design: scores are padded to LENGTH BUCKETS so the compiled encoder
pass and the compiled MixedLM decode scan are reused across requests — a
running server sees at most a handful of compilations regardless of request
lengths (static shapes; XLA caches per shape).

Padding correctness:
- encoder: padded positions carry mask=False; the MMD encoder zeroes masked
  hidden states before aggregation, and padded segment ids are set to a
  sentinel (clipped to max_segments-1) so they cannot dilute valid segments;
- decoder: `mixedlm_unmask(valid_len=T)` leaves positions >= T untouched and
  the decode is causal, so the padded tail cannot influence valid positions;
- outputs are truncated back to the true length before detokenization.

Wire protocol (serve.py): one JSON object per line, over stdin/stdout or TCP.
"""
from __future__ import annotations

import os
import threading
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..midi import MidiScore
from ..models.wrappers import mixedlm_unmask
from ..ops.sampling import top_k
from ..tokenizers import TokSequence, load_tokenizer
from .render import load_model_from_checkpoint, prepare_render_inputs


class RenderServer:
    """Stateful renderer with length-bucketed compiled paths."""

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
        fp32).
        `chunk_size`: chunked-carry decode chunk (16 is the measured knee)."""
        self.model, self.variables, self.model_cfg = load_model_from_checkpoint(checkpoint)
        if tokenizer_path is None:
            tokenizer_path = os.path.join(checkpoint, "tokenizer.json")
        self.tokenizer = load_tokenizer(tokenizer_path)
        self.bucket = int(bucket)
        # the decoder KV cache is sized per bucket, but the model's
        # max_seq_len bounds usable positions — clamp server capacity to it
        dec_max = getattr(self.model_cfg.perf_decoder, "max_seq_len", max_len)
        self.max_len = min(int(max_len), int(dec_max))
        self._lock = threading.Lock()
        self.stats = {"requests": 0, "errors": 0, "buckets": set()}

        model = self.model
        kv_dtype = {"fp32": jnp.float32, "bf16": jnp.bfloat16, "int8": jnp.int8}[cache_dtype]
        chunk = int(chunk_size)

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
            score_emb, style_emb, _ = model.apply(
                variables, perf, pmask, score, smask, bars, beats, onsets,
                method="encode_embeddings", rngs={"mmd": jax.random.PRNGKey(0)},
            )
            style = style_emb + delta[None, None, :]
            return mixedlm_unmask(
                model, variables, tokens_in, masked_all, rng=rng,
                style_embeddings=style, context=score_emb, valid_len=valid_len,
                temperature=temperature, filter_fn=top_k, greedy=greedy,
                cache_dtype=kv_dtype, chunk_size=chunk,
            )

        self._render_step = jax.jit(render_step, static_argnames=("greedy",))

    # ---- helpers ----

    def _bucketed_len(self, T: int) -> int:
        if T > self.max_len:
            raise ValueError(f"score has {T} tokens, server max_len is {self.max_len}")
        return min(self.max_len, -(-T // self.bucket) * self.bucket)

    @staticmethod
    def _pad_to(arr: np.ndarray, T_pad: int, value) -> np.ndarray:
        pad = T_pad - arr.shape[0]
        if pad <= 0:
            return arr
        width = [(0, pad)] + [(0, 0)] * (arr.ndim - 1)
        return np.pad(arr, width, constant_values=value)

    def warmup(self, lengths, greedy_variants=(False,)) -> None:
        """Pre-compile the encoder + decode scan for the given padded lengths
        (dummy PAD inputs, valid_len=1) so requests never see compile latency.
        `greedy` is a static jit arg — pass greedy_variants=(False, True) to
        warm both the sampling and the greedy decode paths."""
        S = len(self.tokenizer.sizes)
        S_sc = len(getattr(self.tokenizer, "score_sizes", self.tokenizer.sizes))
        for T in lengths:
            T_pad = self._bucketed_len(int(T))
            # distinct buffers for every argument, exactly as a real request
            # builds them (host->device transfers of numpy arrays)
            zs = [jnp.asarray(np.zeros((1, T_pad), np.int32)) for _ in range(3)]
            perf = jnp.asarray(np.zeros((1, T_pad, S), np.int32))
            score = jnp.asarray(np.zeros((1, T_pad, S_sc), np.int32))
            mask = jnp.asarray((np.arange(T_pad) < 1)[None])
            tokens_in = jnp.asarray(np.zeros((1, T_pad, S), np.int32))
            masked_all = jnp.asarray(np.zeros((1, T_pad, S), np.int32))
            delta = jnp.asarray(np.zeros(self.style_dim, np.float32))
            with self._lock:
                for greedy in greedy_variants:
                    out = self._render_step(
                        self.variables, perf, mask, score, mask, *zs,
                        tokens_in, masked_all, delta, jax.random.PRNGKey(0),
                        jnp.asarray([1], jnp.int32),
                        jnp.asarray(1.0, jnp.float32), greedy,
                    )
                    jax.block_until_ready(out)
            self.stats["buckets"].add(T_pad)

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
        t_start = time.perf_counter()
        inputs = prepare_render_inputs(self.tokenizer, score_midi)
        T = len(inputs["deadpan_ids"])
        T_pad = self._bucketed_len(T)

        # sentinel segment id for the padded tail: clips to max_segments-1 in
        # the one-hot aggregation, a bucket valid notes essentially never use.
        # NB: batch dims are added in NUMPY before the transfer — a device-side
        # `[None]` is an eager broadcast op outside jit, and on remote-compile
        # TPU platforms every eager op costs a full compile round trip.
        sentinel = 10**6

        def dev(arr, value=0):
            return jnp.asarray(
                np.ascontiguousarray(self._pad_to(np.asarray(arr), T_pad, value)[None])
            )

        perf = dev(inputs["deadpan_ids"])
        score = dev(inputs["score_ids"])
        mask = jnp.asarray((np.arange(T_pad) < T)[None])
        bars = dev(inputs["bars"], sentinel)
        beats = dev(inputs["beats"], sentinel)
        onsets = dev(inputs["onsets"], sentinel)
        tokens_in = dev(inputs["tokens_in"])
        masked_all = dev(inputs["masked_all"])

        if style_delta is not None:
            delta = np.asarray(style_delta, np.float32).reshape(-1)
            if delta.shape[0] != self.style_dim:
                raise ValueError(
                    f"style_delta has {delta.shape[0]} dims, "
                    f"style embedding has {self.style_dim}"
                )
        else:
            delta = np.zeros(self.style_dim, np.float32)

        t_prep = time.perf_counter()
        with self._lock:
            out = self._render_step(
                self.variables, perf, mask, score, mask, bars, beats, onsets,
                tokens_in, masked_all, jnp.asarray(delta),
                jax.random.PRNGKey(seed), jnp.asarray([T], jnp.int32),
                jnp.asarray(temperature, jnp.float32), greedy,
            )
            out_tokens = np.asarray(jax.device_get(out))[0, :T]
            t_dec = time.perf_counter()

        perf_midi = self.tokenizer.performance_tokens_to_midi(
            TokSequence(ids=out_tokens), output_path=output_path
        )
        self.stats["requests"] += 1
        self.stats["buckets"].add(T_pad)
        ms = lambda a, b: round((b - a) * 1000, 2)  # noqa: E731
        return {
            "perf": perf_midi,
            "notes": int(perf_midi.num_notes),
            "wall_ms": ms(t_start, time.perf_counter()),
            "padded_to": T_pad,
            "timings": {
                "prepare_ms": ms(t_start, t_prep),
                "render_ms": ms(t_prep, t_dec),
                "detok_ms": ms(t_dec, time.perf_counter()),
            },
        }

    def handle_request(self, req: Dict) -> Dict:
        """One JSON-dict request -> JSON-dict response (wire layer)."""
        rid = req.get("id")
        try:
            if req.get("cmd") == "ping":
                return {"id": rid, "ok": True, "pong": True,
                        "requests": self.stats["requests"]}

            from ..midi import read_midi

            if "score" in req:
                score_midi = read_midi(req["score"])
            elif "score_b64" in req:
                import base64

                score_midi = read_midi(base64.b64decode(req["score_b64"]))
            else:
                raise ValueError("request needs 'score' (path) or 'score_b64'")

            out_path = req.get("out")
            result = self.render(
                score_midi,
                temperature=float(req.get("temperature", 1.0)),
                greedy=bool(req.get("greedy", False)),
                seed=int(req.get("seed", 0)),
                style_delta=req.get("style_delta"),
                output_path=out_path,
            )
            resp = {"id": rid, "ok": True, "notes": result["notes"],
                    "wall_ms": result["wall_ms"], "padded_to": result["padded_to"],
                    "timings": result["timings"]}
            if out_path:
                resp["out"] = out_path
            else:
                import base64

                from ..midi import write_midi

                resp["midi_b64"] = base64.b64encode(
                    write_midi(result["perf"], None)
                ).decode("ascii")
            return resp
        except Exception as e:  # noqa: BLE001 — wire boundary, report & keep serving
            self.stats["errors"] += 1
            return {"id": rid, "ok": False, "error": f"{type(e).__name__}: {e}"}
