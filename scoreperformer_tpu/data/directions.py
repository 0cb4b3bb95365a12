"""Musical-direction label maps.

Counterpart of scoreperformer/data/datasets/directions.py:16-98: converts
per-score direction dicts ({type, start, end} tick ranges or {type, offset}
note articulations) into per-note / per-bar binary maps.
"""
from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from ..utils import find_closest


def build_score_direction_maps(
    sp_dataset,
    score_directions_dict: Dict[str, List[dict]],
    direction_keys: Optional[List[str]] = None,
    bar_stretch: Optional[int] = None,
    time_division: int = 480,
):
    score_direction_bar_maps, score_direction_note_maps = [], []
    direction_score_bar_maps, direction_score_note_maps = {}, {}

    for score_idx, score in enumerate(sp_dataset.score_names):
        score_seq = sp_dataset.scores[score_idx]
        ticks_data = sp_dataset.tokenizer.compute_ticks(score_seq, time_division=time_division)
        score_notes, score_bars = ticks_data["note_on"], ticks_data["bar"]

        score_directions = score_directions_dict.get(score, [])
        if len(score_directions) and isinstance(score_directions[0], list):
            score_directions = [d for part in score_directions for d in part]

        direction_bar_maps, direction_note_maps = {}, {}
        for d in score_directions:
            key = d["type"]
            if direction_keys is not None and key not in direction_keys:
                continue

            if d.get("end", None) is not None:  # ranged markings
                if key not in direction_bar_maps:
                    direction_bar_maps[key] = np.zeros(score_bars.shape[0] - 1)
                bar_map = direction_bar_maps[key]

                start = int(find_closest(score_bars, d["start"]))
                end = int(find_closest(score_bars, d["end"]))
                end = max(end, start + 1)
                if bar_stretch is not None:
                    end = min(end, start + 1 + bar_stretch)
                bar_map[start:end] = 1

                if key not in direction_note_maps:
                    direction_note_maps[key] = np.zeros(score_seq.shape[0])
                note_map = direction_note_maps[key]
                note_map[(d["start"] <= score_notes) & (score_notes <= d["end"])] = 1

            elif d.get("offset", None) is not None:  # note articulation
                if key not in direction_note_maps:
                    direction_note_maps[key] = np.zeros(score_seq.shape[0])
                direction_note_maps[key][d["offset"]] = 1

        score_direction_bar_maps.append(dict(sorted(direction_bar_maps.items())))
        score_direction_note_maps.append(dict(sorted(direction_note_maps.items())))

        for key, bar_map in direction_bar_maps.items():
            direction_score_bar_maps.setdefault(key, [])
            if np.any(bar_map):
                direction_score_bar_maps[key].append((score_idx, bar_map))
        for key, note_map in direction_note_maps.items():
            direction_score_note_maps.setdefault(key, [])
            if np.any(note_map):
                direction_score_note_maps[key].append((score_idx, note_map))

    return {
        "score": {"bar": score_direction_bar_maps, "note": score_direction_note_maps},
        "direction": {
            "bar": dict(sorted(direction_score_bar_maps.items())),
            "note": dict(sorted(direction_score_note_maps.items())),
        },
    }
