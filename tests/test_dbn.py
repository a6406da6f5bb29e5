"""DBN Viterbi decoder tests: parity against an independent dense-matrix
numpy Viterbi oracle on a reduced state space, plus musical end-to-end checks
with the full madmom-default parameters."""

import numpy as np
import pytest

from beat_this_tpu.postprocessing.dbn import (
    DbnDecoder,
    build_pattern_hmm,
    threshold_activations,
)


def dense_viterbi_oracle(hmm, log_densities):
    """Dense-matrix max-product decode written independently of the padded
    gather formulation used on device."""
    s = hmm.num_states
    log_t = np.full((s, s), -np.inf)
    for state in range(s):
        for k in range(hmm.from_idx.shape[1]):
            lp = hmm.log_probs[state, k]
            if np.isfinite(lp):
                log_t[hmm.from_idx[state, k], state] = lp
    v = np.full(s, -np.log(s))
    back = np.zeros((len(log_densities), s), dtype=int)
    for t, dens in enumerate(log_densities):
        cand = v[:, None] + log_t  # (from, to)
        back[t] = np.argmax(cand, axis=0)
        v = np.max(cand, axis=0) + dens[hmm.pointers]
    state = int(np.argmax(v))
    path = np.empty(len(log_densities), dtype=int)
    for t in range(len(log_densities) - 1, -1, -1):
        path[t] = state
        state = back[t, state]
    return path, float(np.max(v))


@pytest.mark.parametrize("num_beats", [3, 4])
def test_viterbi_matches_dense_oracle(num_beats):
    # reduced tempo range keeps the dense oracle fast
    decoder = DbnDecoder(
        beats_per_bar=(num_beats,), min_bpm=120, max_bpm=180, fps=50,
        threshold=0,
    )
    hmm = decoder.patterns[0]
    rng = np.random.RandomState(num_beats)
    act = np.clip(rng.rand(120, 2) * 0.5, 1e-5, None)
    act[::12, 0] = 0.8  # periodic beat evidence
    act[:, 1] *= 0.1
    dens = decoder._log_densities(act)
    import jax.numpy as jnp

    from beat_this_tpu.postprocessing.dbn import _backtrack

    logp, state, choices = decoder._forward_pattern(hmm, dens)
    path = np.asarray(
        _backtrack(jnp.asarray(hmm.from_idx), choices, state)
    )[: len(dens)]
    opath, ologp = dense_viterbi_oracle(hmm, dens)
    np.testing.assert_allclose(logp, ologp, rtol=1e-5)
    # paths may differ only at exact ties; scores must match throughout
    np.testing.assert_array_equal(path, opath)


def make_click_activations(bpm, beats_per_bar, seconds, fps=50, strength=0.95):
    t = int(seconds * fps)
    act = np.full((t, 2), 0.01)
    period = int(round(60 * fps / bpm))
    for i, frame in enumerate(range(0, t, period)):
        if i % beats_per_bar == 0:
            act[frame, 1] = strength  # downbeat
        else:
            act[frame, 0] = strength  # beat
    return act


def test_decodes_120bpm_4_4():
    decoder = DbnDecoder()
    act = make_click_activations(120, 4, 20)
    out = decoder(act)
    assert out.shape[1] == 2
    times, numbers = out[:, 0], out[:, 1].astype(int)
    intervals = np.diff(times)
    np.testing.assert_allclose(intervals, 0.5, atol=0.06)
    # beat numbers cycle 1..4 and downbeats land on the strong frames
    assert set(numbers) == {1, 2, 3, 4}
    downbeat_times = times[numbers == 1]
    np.testing.assert_allclose(np.diff(downbeat_times), 2.0, atol=0.1)


def test_decodes_90bpm_3_4():
    decoder = DbnDecoder()
    act = make_click_activations(90, 3, 20)
    out = decoder(act)
    times, numbers = out[:, 0], out[:, 1].astype(int)
    np.testing.assert_allclose(np.diff(times), 60 / 90, atol=0.06)
    assert set(numbers) == {1, 2, 3}  # picks the 3/4 pattern


def test_decode_many_matches_single():
    decoder = DbnDecoder()
    pieces = [
        make_click_activations(120, 4, 12),
        make_click_activations(90, 3, 20),
        np.full((150, 2), 0.01),  # silent -> empty
        make_click_activations(140, 4, 12),
    ]
    batched = decoder.decode_many(pieces)
    for act, out in zip(pieces, batched):
        single = decoder(act)
        np.testing.assert_allclose(out, single)


def test_postprocessor_dbn_batched():
    from beat_this_tpu.postprocessing import Postprocessor

    pp = Postprocessor("dbn", fps=50)
    t = 600
    beat = np.full((2, t), -5.0, np.float32)
    downbeat = np.full((2, t), -5.0, np.float32)
    for i, period in enumerate((25, 20)):
        frames = np.arange(0, t, period)
        beat[i, frames] = 5.0
        downbeat[i, frames[::4]] = 5.0
    mask = np.ones((2, t), bool)
    mask[1, 500:] = False
    beats, downbeats = pp(beat, downbeat, mask)
    assert len(beats) == 2
    np.testing.assert_allclose(np.diff(beats[0]), 0.5, atol=0.06)
    np.testing.assert_allclose(np.diff(beats[1]), 0.4, atol=0.06)
    assert beats[1].max() < 10.0  # padding region excluded
    assert len(downbeats[0]) > 0


def test_threshold_trimming_offsets_times():
    decoder = DbnDecoder()
    act = make_click_activations(120, 4, 10)
    lead = np.full((100, 2), 0.01)  # 2 s of silence below threshold
    padded = np.vstack([lead, act])
    out_pad = decoder(padded)
    out = decoder(act)
    np.testing.assert_allclose(out_pad[:, 0], out[:, 0] + 2.0, atol=0.02)
    np.testing.assert_array_equal(out_pad[:, 1], out[:, 1])


def test_threshold_activations_helper():
    act = np.full((50, 2), 0.01)
    act[20:30] = 0.5
    trimmed, first = threshold_activations(act, 0.05)
    assert first == 20 and len(trimmed) == 10
    empty, first0 = threshold_activations(np.full((10, 2), 0.01), 0.05)
    assert len(empty) == 0


def test_all_silence_returns_empty():
    decoder = DbnDecoder()
    out = decoder(np.full((200, 2), 0.01))
    assert out.shape == (0, 2)


def test_state_space_sizes_match_madmom_defaults():
    hmm3 = build_pattern_hmm(3, 55.0, 215.0, 50.0, 100.0)
    hmm4 = build_pattern_hmm(4, 55.0, 215.0, 50.0, 100.0)
    # intervals 14..55 -> 1449 states per beat cycle
    assert hmm3.num_states == 3 * 1449
    assert hmm4.num_states == 4 * 1449
    # downbeat pointers only in the first beat
    assert (hmm4.pointers == 2).sum() > 0
    assert np.all(np.flatnonzero(hmm4.pointers == 2) < 1449)
