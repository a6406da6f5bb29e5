"""Postprocessing of framewise logits into beat/downbeat times.

Two modes, mirroring the reference (beat_this/model/postprocessor.py:9-173):

  * "minimal": strict local-maximum peak picking. The heavy part (masking,
    +/-70 ms max-pool comparison, thresholding) runs batched on device as one
    XLA kernel (`beat_this_tpu.ops.pool.peak_pick`); only the tiny variable-
    length tail (adjacent-peak dedup, downbeat-to-beat snapping) runs on host.
  * "dbn": the madmom DBNDownBeatTrackingProcessor equivalent, re-implemented
    as a `lax.scan` Viterbi decoder on device (beat_this_tpu/postprocessing/dbn.py).

Inputs may be single pieces (T,) or batches (B, T) with an optional padding
mask; outputs are numpy arrays of times in seconds (tuples thereof for
batches), exactly like the reference API.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

import numpy as np

from beat_this_tpu.ops.pool import peak_pick


def _merge_close_peaks(group: np.ndarray, width: float) -> list:
    """Scalar tail of `deduplicate_peaks` for one coarse group.

    A peak joins the open cluster while it lies within `width` of the
    cluster's current mean; otherwise the mean is emitted and a new cluster
    opens.  Tracking (sum, count) instead of an incremental mean keeps the
    arithmetic exact for long clusters.
    """
    means = []
    acc = 0.0
    n = 0
    for q in group:
        if n and q * n - acc > width * n:  # q - acc/n > width, without division
            means.append(acc / n)
            acc, n = 0.0, 0
        acc += q
        n += 1
    means.append(acc / n)
    return means


def deduplicate_peaks(peaks, width=1) -> np.ndarray:
    """Collapse clusters of near-coincident peaks into their mean position.

    Semantics match the reference (beat_this/model/postprocessor.py:176-197):
    scanning left to right, a peak is absorbed into the current cluster iff
    its distance to the cluster's *mean so far* is <= `width`.  Implemented
    in two stages: a vectorized coarse split wherever the raw gap between
    consecutive peaks already exceeds `width` (a cluster mean never exceeds
    its last member, so such a gap always terminates a cluster), then the
    exact mean-distance rule applied only inside coarse groups of >= 3
    members — singletons pass through and pairs always merge, so both skip
    the scalar loop entirely.
    """
    peaks = np.asarray(list(peaks), dtype=np.float64)
    if peaks.size == 0:
        return np.array([])
    cut_after = np.flatnonzero(np.diff(peaks) > width)
    out = []
    for group in np.split(peaks, cut_after + 1):
        if group.size == 1:
            out.append(group[0])
        elif group.size == 2:
            out.append(0.5 * (group[0] + group[1]))
        else:
            out.extend(_merge_close_peaks(group, width))
    return np.asarray(out)


class Postprocessor:
    """Convert framewise beat/downbeat logits to times in seconds.

    Args:
        type: "minimal" or "dbn".
        fps: frames per second of the model output (default 50).
    """

    def __init__(self, type: str = "minimal", fps: int = 50):
        if type not in ("minimal", "dbn"):
            raise ValueError("Invalid postprocessing type")
        self.type = type
        self.fps = fps
        if type == "dbn":
            from beat_this_tpu.postprocessing.dbn import DbnDecoder

            self.dbn = DbnDecoder(
                beats_per_bar=(3, 4),
                min_bpm=55.0,
                max_bpm=215.0,
                fps=fps,
                transition_lambda=100.0,
            )

    def __call__(self, beat, downbeat, padding_mask=None):
        beat = np.asarray(beat)
        downbeat = np.asarray(downbeat)
        batched = beat.ndim != 1
        if padding_mask is None:
            padding_mask = np.ones_like(beat, dtype=bool)
        else:
            padding_mask = np.asarray(padding_mask).astype(bool)
        if not batched:
            beat, downbeat, padding_mask = (
                beat[None], downbeat[None], padding_mask[None]
            )
        if self.type == "minimal":
            out_beat, out_downbeat = self.postp_minimal(beat, downbeat, padding_mask)
        else:
            out_beat, out_downbeat = self.postp_dbn(beat, downbeat, padding_mask)
        if not batched:
            return out_beat[0], out_downbeat[0]
        return out_beat, out_downbeat

    # -- minimal ----------------------------------------------------------
    def postp_minimal(self, beat, downbeat, padding_mask):
        # one fused device call for both targets
        stacked = np.stack([beat, downbeat], axis=0)  # (2, B, T)
        mask = np.broadcast_to(padding_mask[None], stacked.shape)
        peaks = np.asarray(peak_pick(stacked, mask))  # (2, B, T) bool
        with ThreadPoolExecutor() as executor:
            results = list(
                executor.map(
                    self._postp_minimal_item, peaks[0], peaks[1], padding_mask
                )
            )
        out_beat, out_downbeat = zip(*results)
        return tuple(out_beat), tuple(out_downbeat)

    def _postp_minimal_item(self, beat_peaks, downbeat_peaks, mask):
        """Host tail per piece (reference:
        beat_this/model/postprocessor.py:113-136)."""
        beat_frame = np.flatnonzero(beat_peaks[mask])
        downbeat_frame = np.flatnonzero(downbeat_peaks[mask])
        beat_frame = deduplicate_peaks(beat_frame, width=1)
        downbeat_frame = deduplicate_peaks(downbeat_frame, width=1)
        beat_time = beat_frame / self.fps
        downbeat_time = downbeat_frame / self.fps
        if len(beat_time) > 0:
            # snap each downbeat to its nearest beat
            for i, d_time in enumerate(downbeat_time):
                beat_idx = np.argmin(np.abs(beat_time - d_time))
                downbeat_time[i] = beat_time[beat_idx]
        downbeat_time = np.unique(downbeat_time)
        return beat_time, downbeat_time

    # -- dbn --------------------------------------------------------------
    def postp_dbn(self, beat, downbeat, padding_mask):
        # logits -> probabilities, clamped away from 0/1
        # (reference: beat_this/model/postprocessor.py:138-151)
        # errstate: batched eval pads short pieces with -1000 logits, whose
        # exp overflows to inf (the resulting prob 0 is correct and masked)
        with np.errstate(over="ignore"):
            beat_prob = 1.0 / (1.0 + np.exp(-beat.astype(np.float64)))
            downbeat_prob = 1.0 / (1.0 + np.exp(-downbeat.astype(np.float64)))
        epsilon = 1e-5
        beat_prob = beat_prob * (1 - epsilon) + epsilon / 2
        downbeat_prob = downbeat_prob * (1 - epsilon) + epsilon / 2
        combined = [
            self._combined_activations(b, d, m)
            for b, d, m in zip(beat_prob, downbeat_prob, padding_mask)
        ]
        # all pieces decode through batched Viterbi scans (grouped by length)
        decoded = self.dbn.decode_many(combined)
        out_beat, out_downbeat = [], []
        for dbn_out in decoded:
            out_beat.append(dbn_out[:, 0])
            out_downbeat.append(dbn_out[dbn_out[:, 1] == 1][:, 0])
        return tuple(out_beat), tuple(out_downbeat)

    @staticmethod
    def _combined_activations(beat_prob, downbeat_prob, mask):
        """Böck-style combined activation matrix (reference:
        beat_this/model/postprocessor.py:153-168)."""
        beat_prob = beat_prob[mask]
        downbeat_prob = downbeat_prob[mask]
        epsilon = 1e-5
        return np.stack(
            [np.maximum(beat_prob - downbeat_prob, epsilon / 2), downbeat_prob],
            axis=1,
        )
