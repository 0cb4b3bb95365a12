"""Device-side (jittable) tokenizer operations.

The reference tokenizer is host-only numpy; here the performance-critical
decode path runs under jit with static shapes (SURVEY §7 step 3):

- `TokenizerOps.compute_ticks`: vectorized counterpart of
  octuple_m.py:460-520 with static caps on time-signature changes / bars /
  beats (padded + masked instead of dynamically sized).
- `TokenizerOps.spmuple2_decode_times`: the SPMuple2 onset-by-onset time
  reconstruction (spmuple2.py:398-444) re-formulated as a `lax.scan` over
  onset groups — the sequential dependency (onset i+1's time depends on onset
  i's performed-mean time) is carried, everything else is segment math.
  Batched via vmap: renders B performances at once.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class TokenizerConstants:
    """Static vocab tables shipped to the device once."""

    zero_token: int
    max_beat_res: int
    duration_values: np.ndarray  # beats per Duration token index
    tempos: np.ndarray
    time_signatures: np.ndarray  # (N, 2) num/den per TimeSig token index
    rel_onset_deviations: Optional[np.ndarray]
    rel_performed_durations: Optional[np.ndarray]
    types_idx: Dict[str, int]

    @classmethod
    def from_tokenizer(cls, tokenizer) -> "TokenizerConstants":
        v = tokenizer.vocab
        return cls(
            zero_token=tokenizer.zero_token,
            max_beat_res=tokenizer.max_beat_res,
            duration_values=np.asarray(v.duration_values),
            tempos=np.asarray(v.tempos),
            time_signatures=np.asarray(v.time_signatures),
            rel_onset_deviations=(
                np.asarray(v.rel_onset_deviations) if v.rel_onset_deviations is not None else None
            ),
            rel_performed_durations=(
                np.asarray(v.rel_performed_durations)
                if v.rel_performed_durations is not None
                else None
            ),
            types_idx=dict(tokenizer.types_idx),
        )


BEATS_IN_BARS_NUMERATORS = np.zeros(64, np.int32)
for _n in range(1, 64):
    BEATS_IN_BARS_NUMERATORS[_n] = _n
BEATS_IN_BARS_NUMERATORS[6] = 2
BEATS_IN_BARS_NUMERATORS[9] = 3
BEATS_IN_BARS_NUMERATORS[18] = 3
BEATS_IN_BARS_NUMERATORS[12] = 4
BEATS_IN_BARS_NUMERATORS[24] = 4


class TokenizerOps:
    def __init__(self, tokenizer, max_ts_changes: int = 8):
        self.const = TokenizerConstants.from_tokenizer(tokenizer)
        self.max_ts_changes = max_ts_changes

    # ---- compute_ticks (octuple_m.py:460-520) ----

    @partial(jax.jit, static_argnums=(0, 2))
    def note_on_ticks(self, tokens: jnp.ndarray, time_division: int = 480) -> jnp.ndarray:
        """Per-note onset ticks. tokens: (T, S) int."""
        c = self.const
        z = c.zero_token
        K = self.max_ts_changes
        T = tokens.shape[0]

        bars = tokens[:, c.types_idx["Bar"]] - z
        positions = tokens[:, c.types_idx["Position"]] - z
        ts_col = tokens[:, c.types_idx["TimeSig"]]

        ticks_per_sample = time_division / c.max_beat_res

        change = jnp.concatenate([jnp.array([True]), jnp.diff(ts_col) != 0])
        change_idx = jnp.where(change, size=K, fill_value=T - 1)[0]
        # ensure padded entries replicate the last real change
        order = jnp.sort(change_idx)
        change_bars = bars[order]
        sigs = jnp.asarray(c.time_signatures)[jnp.clip(ts_col[order] - z, 0, len(c.time_signatures) - 1)]
        ticks_per_bar = time_division * 4.0 * sigs[:, 0] / sigs[:, 1]

        # cumulative tick at each change boundary
        dbars = jnp.diff(change_bars, prepend=change_bars[0])
        cum_ticks = jnp.cumsum(dbars * jnp.concatenate([ticks_per_bar[:1], ticks_per_bar[:-1]]))

        seg = jnp.clip(jnp.searchsorted(change_bars, bars, side="right") - 1, 0, K - 1)
        note_ticks = (
            cum_ticks[seg]
            + (bars - change_bars[seg]) * ticks_per_bar[seg]
            + positions * ticks_per_sample
        )
        return note_ticks

    # ---- SPMuple2 decode (spmuple2.py:329-489 core) ----

    @partial(jax.jit, static_argnums=(0, 2))
    def spmuple2_decode_times(
        self, tokens: jnp.ndarray, time_division: int = 480
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Note (start, end) times in seconds + validity mask, one compiled
        program (non-recompute tempo mode: tempo = mean of onset tempo tokens,
        reference spmuple2.py:385-386, 404-405).

        tokens: (T, S). Returns (perf_times, perf_offset_times, is_performed).
        """
        c = self.const
        z = c.zero_token
        T = tokens.shape[0]
        tempo_scale = 60.0 / time_division
        ticks_per_sample = time_division // c.max_beat_res

        note_ticks = self.note_on_ticks(tokens, time_division)
        dur_idx = jnp.clip(tokens[:, c.types_idx["Duration"]] - z, 0, len(c.duration_values) - 1)
        duration_ticks = (
            jnp.asarray(c.duration_values)[dur_idx] * c.max_beat_res * ticks_per_sample
        )

        tempo_idx = jnp.clip(tokens[:, c.types_idx["Tempo"]] - z, 0, len(c.tempos) - 1)
        token_tempos = jnp.asarray(c.tempos)[tempo_idx]

        dev_idx = jnp.clip(
            tokens[:, c.types_idx["RelOnsetDev"]] - z, 0, len(c.rel_onset_deviations) - 1
        )
        rel_devs = jnp.asarray(c.rel_onset_deviations)[dev_idx]
        dur_rel_idx = jnp.clip(
            tokens[:, c.types_idx["RelPerfDuration"]] - z,
            0,
            len(c.rel_performed_durations) - 1,
        )
        rel_durs = jnp.asarray(c.rel_performed_durations)[dur_rel_idx]

        is_performed = tokens[:, c.types_idx["Velocity"]] != z

        # Group notes by tick (notes are tick-sorted), then keep only groups
        # containing at least one performed note (reference score_onsets =
        # unique(score_ticks[is_performed]), spmuple2.py:379) and renumber
        # them consecutively. All same-tick notes — performed or not — belong
        # to the group (the reference onset_mask is tick equality).
        num_groups = T  # static cap: at most T distinct ticks
        tick_change = jnp.concatenate([jnp.array([True]), jnp.diff(note_ticks) != 0])
        ag = jnp.cumsum(tick_change) - 1  # all-tick group id per note
        has_perf_g = (
            jax.ops.segment_max(is_performed.astype(jnp.int32), ag, num_segments=num_groups) > 0
        )
        perf_group_rank = jnp.cumsum(has_perf_g) - 1  # consecutive id per performed group
        in_group = has_perf_g[ag]
        oid = jnp.clip(perf_group_rank[ag], 0, num_groups - 1)

        w_note = in_group.astype(jnp.float32)
        w_perf = (in_group & is_performed).astype(jnp.float32)

        seg_sum = lambda x, w: jax.ops.segment_sum(x * w, oid, num_segments=num_groups)
        cnt_all = jnp.maximum(seg_sum(jnp.ones(T), w_note), 1.0)
        cnt_perf = jnp.maximum(seg_sum(jnp.ones(T), w_perf), 1.0)

        g_tick = jax.ops.segment_max(
            jnp.where(in_group, note_ticks, -jnp.inf), oid, num_segments=num_groups
        )
        g_tempo = seg_sum(token_tempos, w_note) / cnt_all
        g_mean_dev = seg_sum(rel_devs, w_perf) / cnt_perf
        g_valid = (
            jax.ops.segment_max(in_group.astype(jnp.int32), oid, num_segments=num_groups) > 0
        )
        g_tick = jnp.where(g_valid, g_tick, 0.0)

        first_tick_positive = note_ticks[0] > 0  # score_positions[0] > 0
        first_tempo = g_tempo[0]
        init_tick = jnp.where(first_tick_positive, 0.0, -1.0)
        init_time = jnp.where(first_tick_positive, 0.0, -1.0 / first_tempo * tempo_scale)

        def onset_step(carry, g):
            prev_tick, prev_time = carry
            tick, tempo, mean_dev, valid = g
            time_shift = (tick - prev_tick) / tempo * tempo_scale
            onset_time = prev_time + time_shift * (1.0 + mean_dev)
            new_carry = (
                jnp.where(valid, tick, prev_tick),
                jnp.where(valid, onset_time, prev_time),
            )
            return new_carry, (prev_time, time_shift)

        (_, _), (g_prev_time, g_time_shift) = jax.lax.scan(
            onset_step,
            (init_tick, init_time),
            (g_tick, g_tempo, g_mean_dev, g_valid),
        )

        note_prev_time = g_prev_time[oid]
        note_shift = g_time_shift[oid]
        note_tempo = g_tempo[oid]

        perf_times = note_prev_time + note_shift * (1.0 + rel_devs)
        score_time_dur = duration_ticks / note_tempo * tempo_scale
        perf_offset_times = perf_times + rel_durs * score_time_dur

        valid = in_group
        perf_times = jnp.where(valid, perf_times, 0.0)
        perf_offset_times = jnp.where(valid, perf_offset_times, 0.0)

        return perf_times, perf_offset_times, is_performed & valid

    def spmuple2_decode_times_batch(self, tokens: jnp.ndarray, time_division: int = 480):
        """vmapped decode over a batch of token matrices (B, T, S)."""
        fn = jax.vmap(lambda t: self.spmuple2_decode_times(t, time_division))
        return fn(tokens)

    # ---- deadpan (spmuple.py:513-540) ----

    def score_tokens_as_performance(self, score_tokens: jnp.ndarray) -> jnp.ndarray:
        c = self.const
        zero_dev = int(np.where(c.rel_onset_deviations == 0.0)[0][0]) + c.zero_token
        unit_dur = int(np.where(c.rel_performed_durations == 1.0)[0][0]) + c.zero_token
        n = score_tokens.shape[-2]
        dev_col = jnp.full((*score_tokens.shape[:-1], 1), zero_dev, score_tokens.dtype)
        dur_col = jnp.full((*score_tokens.shape[:-1], 1), unit_dur, score_tokens.dtype)
        return jnp.concatenate([score_tokens, dev_col, dur_col], axis=-1)
