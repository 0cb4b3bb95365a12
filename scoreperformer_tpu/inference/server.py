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
    ):
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

        def encode(variables, perf, pmask, score, smask, bars, beats, onsets):
            return model.apply(
                variables, perf, pmask, score, smask, bars, beats, onsets,
                method="encode_embeddings", rngs={"mmd": jax.random.PRNGKey(0)},
            )

        def unmask(variables, tokens_in, masked_all, style, context, rng, valid_len, temperature, greedy):
            return mixedlm_unmask(
                model, variables, tokens_in, masked_all, rng=rng,
                style_embeddings=style, context=context, valid_len=valid_len,
                temperature=temperature, filter_fn=top_k, greedy=greedy,
            )

        self._encode = jax.jit(encode)
        self._unmask = jax.jit(unmask, static_argnames=("greedy",))

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

    # ---- API ----

    def render(
        self,
        score_midi: MidiScore,
        temperature: float = 1.0,
        greedy: bool = False,
        seed: int = 0,
        output_path: Optional[str] = None,
    ) -> Dict:
        """Render one score; returns {perf, notes, wall_ms, padded_to}."""
        t_start = time.perf_counter()
        inputs = prepare_render_inputs(self.tokenizer, score_midi)
        T = len(inputs["deadpan_ids"])
        T_pad = self._bucketed_len(T)

        # sentinel segment id for the padded tail: clips to max_segments-1 in
        # the one-hot aggregation, a bucket valid notes essentially never use
        sentinel = 10**6
        perf = jnp.asarray(self._pad_to(inputs["deadpan_ids"], T_pad, 0))[None]
        score = jnp.asarray(self._pad_to(inputs["score_ids"], T_pad, 0))[None]
        mask = jnp.asarray(np.arange(T_pad) < T)[None]
        bars = jnp.asarray(self._pad_to(inputs["bars"], T_pad, sentinel))[None]
        beats = jnp.asarray(self._pad_to(inputs["beats"], T_pad, sentinel))[None]
        onsets = jnp.asarray(self._pad_to(inputs["onsets"], T_pad, sentinel))[None]
        tokens_in = jnp.asarray(self._pad_to(inputs["tokens_in"], T_pad, 0))[None]
        masked_all = jnp.asarray(self._pad_to(inputs["masked_all"], T_pad, 0))[None]

        with self._lock:
            score_emb, style_emb, _ = self._encode(
                self.variables, perf, mask, score, mask, bars, beats, onsets
            )
            out = self._unmask(
                self.variables, tokens_in, masked_all, style_emb, score_emb,
                jax.random.PRNGKey(seed), jnp.asarray([T], jnp.int32),
                jnp.asarray(temperature, jnp.float32), greedy,
            )
            out_tokens = np.asarray(jax.device_get(out))[0, :T]

        perf_midi = self.tokenizer.performance_tokens_to_midi(
            TokSequence(ids=out_tokens), output_path=output_path
        )
        self.stats["requests"] += 1
        self.stats["buckets"].add(T_pad)
        return {
            "perf": perf_midi,
            "notes": int(perf_midi.num_notes),
            "wall_ms": round((time.perf_counter() - t_start) * 1000, 2),
            "padded_to": T_pad,
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
                output_path=out_path,
            )
            resp = {"id": rid, "ok": True, "notes": result["notes"],
                    "wall_ms": result["wall_ms"], "padded_to": result["padded_to"]}
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
