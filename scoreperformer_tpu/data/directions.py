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


def get_performance_idx_map(sp_dataset, level: str = "bar") -> np.ndarray:
    """(directions.py:146-155)"""
    perf_ids = []
    for score_idx, score in enumerate(sp_dataset.score_names):
        score_seq = sp_dataset.scores[score_idx]
        for perf in sp_dataset.metadata[score]:
            num_ids = (
                score_seq[-1, 0] - sp_dataset.tokenizer.zero_token + 1
                if level == "bar"
                else score_seq.shape[0]
            )
            perf_ids.append(
                np.full(num_ids, sp_dataset.performances._name_to_idx[perf])
            )
    return np.concatenate(perf_ids, axis=0)


def get_direction_performances_map(
    sp_dataset, score_direction_maps, key: str, level: str = "bar"
) -> np.ndarray:
    """(directions.py:124-143)"""
    dir_perf_map = []
    for score_idx, score in enumerate(sp_dataset.score_names):
        score_dir_map = score_direction_maps[score_idx]
        if key not in score_dir_map:
            score_seq = sp_dataset.scores[score_idx]
            if level == "bar":
                dir_map = np.zeros(score_seq[-1, 0] - sp_dataset.tokenizer.zero_token + 1)
            else:
                dir_map = np.zeros(score_seq.shape[0])
        else:
            dir_map = score_dir_map[key]
        for _ in sp_dataset.metadata[score]:
            dir_perf_map.append(dir_map)
    return np.concatenate(dir_perf_map, axis=0).astype(bool)


class DirectionBarEmbeddingDataset:
    """(embedding, direction-label) pairs from precomputed bar embeddings with
    negative sampling (directions.py:158-286)."""

    def __init__(
        self,
        sp_dataset,
        direction_keys: List[str],
        embeddings: np.ndarray,
        score_directions_dict=None,
        direction_bar_stretch: Optional[int] = None,
        remove_multi_label: bool = False,
        negative_samples: float = 1.0,
        num_prev_embeddings: int = 0,
        seed: int = 23,
    ):
        from ..utils import load_json
        from pathlib import Path

        self.sp_dataset = sp_dataset
        self.direction_keys = direction_keys
        self.embeddings = np.asarray(embeddings)
        self._rng = np.random.RandomState(seed)

        if isinstance(score_directions_dict, (str, Path)):
            score_directions_dict = load_json(score_directions_dict)

        self.score_direction_maps = build_score_direction_maps(
            sp_dataset, score_directions_dict, bar_stretch=direction_bar_stretch
        )["score"]["bar"]

        self.perf_ids = get_performance_idx_map(sp_dataset)

        direction_maps = [
            (key, get_direction_performances_map(sp_dataset, self.score_direction_maps, key))
            for key in direction_keys
        ]

        nodir_map = np.ones(self.embeddings.shape[0], dtype=bool)
        for _, dir_map in direction_maps:
            nodir_map[dir_map] = False
        direction_maps.insert(0, (None, nodir_map))

        if remove_multi_label:
            counts = np.zeros(self.embeddings.shape[0])
            for _, dir_map in direction_maps:
                counts[dir_map] += 1
            direction_maps = [
                (key, np.logical_and(dir_map, counts == 1.0)) for key, dir_map in direction_maps
            ]

        self.direction_maps = dict(direction_maps)
        self.labels = {key: i for i, key in enumerate(self.direction_maps)}
        self.inv_labels = {i: key for i, key in enumerate(self.direction_maps)}

        direction_numbers = {
            key: int(dir_map.sum()) for key, dir_map in self.direction_maps.items()
        }
        num_dir_embs = sum(n for key, n in direction_numbers.items() if key is not None)
        direction_numbers[None] = min(
            int(self.direction_maps[None].sum()), int(negative_samples * num_dir_embs)
        )
        self.direction_numbers = direction_numbers
        self._length = sum(direction_numbers.values())

        sample_keys, sample_ids = [], []
        for key, dir_map in self.direction_maps.items():
            if key is None:
                continue
            sample_keys.extend([key] * direction_numbers[key])
            sample_ids.append(np.where(dir_map)[0])
        sample_keys.extend([None] * direction_numbers[None])
        sample_ids.append(np.full(direction_numbers[None], -1))

        self._sample_keys = sample_keys
        self._sample_ids = np.concatenate(sample_ids) if sample_ids else np.empty(0, int)
        self._nodir_ids = np.where(self.direction_maps[None])[0]
        self.num_prev_embeddings = num_prev_embeddings

    def get_emb_by_idx(self, emb_idx: int):
        if self.num_prev_embeddings > 0:
            start_idx = emb_idx
            for _ in range(self.num_prev_embeddings):
                if start_idx == 0 or self.perf_ids[start_idx - 1] != self.perf_ids[emb_idx]:
                    break
                start_idx -= 1
            return self.embeddings[start_idx : emb_idx + 1]
        return self.embeddings[emb_idx]

    def __getitem__(self, idx):
        label = self._sample_keys[idx]
        if label is None:
            emb_idx = int(self._nodir_ids[self._rng.randint(0, max(1, self.direction_numbers[None]))])
        else:
            emb_idx = int(self._sample_ids[idx])
        return emb_idx, self.get_emb_by_idx(emb_idx), self.labels[label]

    def __len__(self):
        return self._length


class DirectionEmbeddingCollator:
    """(collators/directions.py:6-33)"""

    def __call__(self, batch):
        ids = np.array([b[0] for b in batch])
        embeddings = np.stack([np.asarray(b[1]) for b in batch])
        labels = np.array([b[2] for b in batch])
        return {"ids": ids, "embeddings": embeddings, "labels": labels}
