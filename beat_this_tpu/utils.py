"""Cross-cutting helpers: framewise targets, beat numbering, TSV output.

Behavioural equivalents of the reference utilities
(reference: beat_this/utils.py:7-102)."""

from __future__ import annotations

from itertools import chain
from pathlib import Path

import numpy as np


def index_to_framewise(index, length: int) -> np.ndarray:
    """One-hot boolean sequence from frame indices
    (reference: beat_this/utils.py:7-11)."""
    sequence = np.zeros(length, dtype=bool)
    sequence[index] = True
    return sequence


def filename_to_augmentation(filename) -> dict:
    """Parse `_psN` / `_tsN` stem suffixes into an augmentation dict
    (reference: beat_this/utils.py:14-23)."""
    parts = Path(filename).stem.split("_")
    augmentations: dict[str, int] = {}
    for part in parts[1:]:
        if part.startswith("ps"):
            augmentations["shift"] = int(part[2:])
        elif part.startswith("ts"):
            augmentations["stretch"] = int(part[2:])
    return augmentations


def infer_beat_numbers(beats: np.ndarray, downbeats: np.ndarray) -> np.ndarray:
    """Assign beat counts (1 = downbeat) with a pickup-measure heuristic
    (reference: beat_this/utils.py:26-76). Requires every downbeat to also be
    listed as a beat."""
    if not np.all(np.isin(downbeats, beats)):
        raise ValueError("Not all downbeats are beats.")

    if len(downbeats) >= 2:
        first_downbeat, second_downbeat = np.searchsorted(beats, downbeats[:2])
        beats_in_first_measure = second_downbeat - first_downbeat
        pickup_beats = first_downbeat
        if pickup_beats < beats_in_first_measure:
            start_counter = beats_in_first_measure - pickup_beats
        else:
            print(
                "WARNING: There are more beats in the pickup measure than in "
                "the first measure. The beat count will start from 2 without "
                "trying to estimate the length of the pickup measure."
            )
            start_counter = 1
    else:
        print(
            "WARNING: There are less than two downbeats in the predictions. "
            "Something may be wrong. The beat count will start from 2 without "
            "trying to estimate the length of the pickup measure."
        )
        start_counter = 1

    numbers = []
    counter = start_counter
    downbeat_iter = chain(downbeats, [-1])
    next_downbeat = next(downbeat_iter)
    for beat in beats:
        if beat == next_downbeat:
            counter = 1
            next_downbeat = next(downbeat_iter)
        else:
            counter += 1
        numbers.append(counter)
    return np.asarray(numbers)


def save_beat_tsv(beats: np.ndarray, downbeats: np.ndarray, outpath) -> None:
    """Write the standard `.beats` TSV: `time<TAB>beat_number`
    (reference: beat_this/utils.py:79-102)."""
    numbers = infer_beat_numbers(beats, downbeats)
    outpath = Path(outpath)
    outpath.parent.mkdir(parents=True, exist_ok=True)
    try:
        with open(outpath, "w") as f:
            f.writelines(f"{beat}\t{number}\n" for beat, number in zip(beats, numbers))
    except KeyboardInterrupt:
        outpath.unlink()  # avoid half-written files
        raise


def replace_state_dict_key(state_dict: dict, old: str, new: str) -> dict:
    """Replace `old` with `new` in all keys (reference:
    beat_this/utils.py:105-111)."""
    keys = list(state_dict.keys())
    for key in keys:
        if old in key:
            state_dict[key.replace(old, new)] = state_dict.pop(key)
    return state_dict
