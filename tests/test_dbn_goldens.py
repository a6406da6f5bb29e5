"""Independently-derived goldens for the DBN state space and decoder.

`tests/test_dbn.py` validates the lax.scan Viterbi against a dense decode
built from the same `build_pattern_hmm` outputs — it cannot catch a bug in
the state-space/transition construction itself. This file re-derives the
madmom bar-pointer model (reference use: beat_this/model/postprocessor.py:29-37;
semantics per Krebs, Boeck & Widmer, "An Efficient State-Space Model for
Joint Tempo and Meter Tracking", ISMIR 2015, as implemented by
madmom.features.beats_hmm) from first principles:

  * states are explicit (beat, tempo-interval, phase) tuples, enumerated
    directly — beat-major, interval-ascending, phase-contiguous;
  * within a beat the phase advances deterministically; at a beat boundary
    the interval may change with probability proportional to
    exp(-lambda * |new_interval / old_interval - 1|), pruned at machine
    epsilon and normalized over the new interval;
  * a state observes "beat" when phase/interval < 1/observation_lambda,
    "downbeat" when additionally beat == 0, else "no beat".

Everything below (counts, positions, first/last states, the dense transition
matrix, observation pointers, and a dense-matrix Viterbi) is computed from
those tuples alone and compared against the production `build_pattern_hmm` /
`DbnDecoder`.
"""

import numpy as np
import pytest

from beat_this_tpu.postprocessing.dbn import (
    DbnDecoder,
    build_pattern_hmm,
    threshold_activations,
)

FPS = 50.0
OBS_LAMBDA = 16.0


# ---------------------------------------------------------------------------
# independent model derivation (pure tuples + dense matrices)
# ---------------------------------------------------------------------------


def interval_range(min_bpm, max_bpm, fps=FPS):
    return (
        int(np.round(60.0 * fps / max_bpm)),
        int(np.round(60.0 * fps / min_bpm)),
    )


def enumerate_states(num_beats, min_bpm, max_bpm):
    """All (beat, interval, phase) tuples in state-id order."""
    lo, hi = interval_range(min_bpm, max_bpm)
    return [
        (beat, iv, phase)
        for beat in range(num_beats)
        for iv in range(lo, hi + 1)
        for phase in range(iv)
    ]


def tempo_change_distribution(intervals, lam):
    """P(new interval | old interval), rows = old, columns = new."""
    intervals = np.asarray(intervals, float)
    p = np.exp(-lam * np.abs(intervals[None, :] / intervals[:, None] - 1.0))
    p[p <= np.spacing(1)] = 0.0
    return p / p.sum(axis=1, keepdims=True)


def dense_log_transitions(states, num_beats, lam):
    """(S, S) matrix of log P(state_to | state_from), from tuples alone."""
    index = {s: i for i, s in enumerate(states)}
    intervals = sorted({iv for _, iv, _ in states})
    change = tempo_change_distribution(intervals, lam)
    iv_pos = {iv: i for i, iv in enumerate(intervals)}
    log_t = np.full((len(states), len(states)), -np.inf)
    for to_id, (beat, iv, phase) in enumerate(states):
        if phase > 0:
            log_t[to_id, index[(beat, iv, phase - 1)]] = 0.0
        else:
            prev_beat = (beat - 1) % num_beats
            for old_iv in intervals:
                p = change[iv_pos[old_iv], iv_pos[iv]]
                if p > 0:
                    log_t[to_id, index[(prev_beat, old_iv, old_iv - 1)]] = np.log(p)
    return log_t


def observation_pointers(states):
    out = np.empty(len(states), np.int32)
    for i, (beat, iv, phase) in enumerate(states):
        if phase / iv < 1.0 / OBS_LAMBDA:
            out[i] = 2 if beat == 0 else 1
        else:
            out[i] = 0
    return out


def hmm_to_dense(hmm):
    """Expand the production (from_idx, log_probs) layout to a dense matrix."""
    dense = np.full((hmm.num_states, hmm.num_states), -np.inf)
    for to_id in range(hmm.num_states):
        for src, logp in zip(hmm.from_idx[to_id], hmm.log_probs[to_id]):
            if np.isfinite(logp):
                dense[to_id, src] = logp
    return dense


def dense_viterbi(log_t, pointers, log_densities):
    """Plain max-product forward + backtrack over the dense matrix, with
    madmom's convention: uniform init, one transition before each
    observation including the first."""
    s = log_t.shape[0]
    v = np.full(s, -np.log(s))
    back = np.empty((len(log_densities), s), np.int64)
    for t, dens in enumerate(log_densities):
        cand = log_t + v[None, :]  # (to, from)
        back[t] = np.argmax(cand, axis=1)
        v = cand[np.arange(s), back[t]] + dens[pointers]
    state = int(np.argmax(v))
    logp = float(v[state])
    path = np.empty(len(log_densities), np.int64)
    for t in range(len(log_densities) - 1, -1, -1):
        path[t] = state
        state = back[t, state]
    return path, logp


def log_densities_from_activations(act, obs_lambda=OBS_LAMBDA):
    return np.stack(
        [
            np.log((1.0 - act.sum(axis=1)) / (obs_lambda - 1.0)),
            np.log(act[:, 0]),
            np.log(act[:, 1]),
        ],
        axis=1,
    )


def independent_decode(act, num_beats_options, min_bpm, max_bpm, lam,
                       threshold=0.05, fps=FPS):
    """Full independent pipeline: threshold, per-pattern dense Viterbi, best
    pattern by final log-probability, beats corrected to activation peaks."""
    act = np.asarray(act, float)
    first = 0
    if threshold:
        act, first = threshold_activations(act, threshold)
    if not act.any():
        return np.empty((0, 2))
    dens = log_densities_from_activations(act)
    best = (-np.inf, None, None)
    for num_beats in num_beats_options:
        states = enumerate_states(num_beats, min_bpm, max_bpm)
        log_t = dense_log_transitions(states, num_beats, lam)
        pointers = observation_pointers(states)
        path, logp = dense_viterbi(log_t, pointers, dens)
        if logp > best[0]:
            best = (logp, path, states)
    _, path, states = best
    beats_of = np.array([s[0] for s in states])
    in_beat_window = np.array(
        [s[2] / s[1] < 1.0 / OBS_LAMBDA for s in states]
    )
    beat_numbers = beats_of[path] + 1
    window = in_beat_window[path]
    edges = np.nonzero(np.diff(window.astype(int)))[0] + 1
    if window[0]:
        edges = np.r_[0, edges]
    if window[-1]:
        edges = np.r_[edges, len(window)]
    frames = []
    for left, right in edges.reshape(-1, 2):
        frames.append(left + int(np.argmax(np.max(act[left:right], axis=1))))
    frames = np.asarray(frames, int)
    if frames.size == 0:
        return np.empty((0, 2))
    return np.vstack(((frames + first) / fps, beat_numbers[frames])).T


# ---------------------------------------------------------------------------
# goldens: state space
# ---------------------------------------------------------------------------


def test_interval_grid_reference_params():
    # 55-215 bpm at 50 fps: round(13.95)=14 .. round(54.55)=55
    assert interval_range(55, 215) == (14, 55)
    # 42 intervals summing to 1449 states per beat
    assert sum(range(14, 56)) == 1449


@pytest.mark.parametrize("num_beats,expected", [(3, 3 * 1449), (4, 4 * 1449)])
def test_num_states_reference_params(num_beats, expected):
    hmm = build_pattern_hmm(num_beats, 55, 215, FPS, 100)
    assert hmm.num_states == expected


def test_state_positions_and_layout_golden():
    """120-140 bpm, 3 beats: intervals 21..25, 115 states per beat."""
    hmm = build_pattern_hmm(3, 120, 140, FPS, 100)
    states = enumerate_states(3, 120, 140)
    assert interval_range(120, 140) == (21, 25)
    assert hmm.num_states == len(states) == 3 * (21 + 22 + 23 + 24 + 25)
    expected_positions = np.array(
        [beat + phase / iv for beat, iv, phase in states]
    )
    np.testing.assert_allclose(hmm.state_positions, expected_positions)
    # spot-check the layout directly: state 0 = (beat 0, interval 21,
    # phase 0); state 21 = (beat 0, interval 22, phase 0); state 115 =
    # (beat 1, interval 21, phase 0)
    assert states[0] == (0, 21, 0)
    assert states[21] == (0, 22, 0)
    assert states[115] == (1, 21, 0)
    assert hmm.state_positions[115] == 1.0


def test_observation_pointers_golden():
    hmm = build_pattern_hmm(3, 120, 140, FPS, 100, observation_lambda=OBS_LAMBDA)
    states = enumerate_states(3, 120, 140)
    np.testing.assert_array_equal(hmm.pointers, observation_pointers(states))
    # derived by hand: border 1/16; interval 21 -> phases {0, 1} inside the
    # window (1/21 = 0.0476 < 0.0625 <= 2/21), interval 25 -> phases {0, 1}
    # (1/25 = 0.04 < 0.0625 <= 2/25 = 0.08)
    index = {s: i for i, s in enumerate(states)}
    assert hmm.pointers[index[(0, 21, 0)]] == 2
    assert hmm.pointers[index[(0, 21, 1)]] == 2
    assert hmm.pointers[index[(0, 21, 2)]] == 0
    assert hmm.pointers[index[(1, 25, 1)]] == 1
    assert hmm.pointers[index[(1, 25, 2)]] == 0
    assert hmm.pointers[index[(2, 21, 0)]] == 1


def test_dense_transition_matrix_golden():
    lam = 100.0
    hmm = build_pattern_hmm(3, 120, 140, FPS, lam)
    states = enumerate_states(3, 120, 140)
    expected = dense_log_transitions(states, 3, lam)
    produced = hmm_to_dense(hmm)
    finite_e, finite_p = np.isfinite(expected), np.isfinite(produced)
    np.testing.assert_array_equal(finite_e, finite_p)
    np.testing.assert_allclose(
        produced[finite_p], expected[finite_e], atol=1e-6
    )


def test_transition_values_by_hand():
    """One row of the tempo-change distribution checked numerically by hand:
    old interval 23, lambda 100 -> exp(-100*|iv/23 - 1|) for iv in 21..25."""
    lam = 100.0
    raw = np.exp(-lam * np.abs(np.arange(21, 26) / 23.0 - 1.0))
    expected = raw / raw.sum()
    hmm = build_pattern_hmm(3, 120, 140, FPS, lam)
    states = enumerate_states(3, 120, 140)
    index = {s: i for i, s in enumerate(states)}
    dense = hmm_to_dense(hmm)
    from_id = index[(0, 23, 22)]  # last phase of interval 23, beat 0
    for k, iv in enumerate(range(21, 26)):
        to_id = index[(1, iv, 0)]
        np.testing.assert_allclose(
            np.exp(dense[to_id, from_id]), expected[k], atol=1e-7
        )
    # interior determinism: (0, 23, 10) must come only from (0, 23, 9)
    to_id = index[(0, 23, 10)]
    row = dense[to_id]
    assert np.isfinite(row).sum() == 1
    assert row[index[(0, 23, 9)]] == 0.0


def test_bar_wraparound_transitions():
    """First states of beat 0 are reachable only from last states of the
    final beat (the bar pointer wraps)."""
    hmm = build_pattern_hmm(3, 120, 140, FPS, 100)
    states = enumerate_states(3, 120, 140)
    index = {s: i for i, s in enumerate(states)}
    dense = hmm_to_dense(hmm)
    to_id = index[(0, 23, 0)]
    sources = np.nonzero(np.isfinite(dense[to_id]))[0]
    for src in sources:
        beat, iv, phase = states[src]
        assert beat == 2 and phase == iv - 1


# ---------------------------------------------------------------------------
# goldens: decoding
# ---------------------------------------------------------------------------


def _synthetic_activations(t, period, offset, beats_per_bar, rng,
                           p_beat=0.85, p_down=0.7, noise=0.02):
    act = np.full((t, 2), noise)
    act += rng.uniform(0, 0.01, (t, 2))
    count = 0
    for frame in range(offset, t, period):
        if count % beats_per_bar == 0:
            act[frame] = [noise, p_down]
        else:
            act[frame] = [p_beat, noise]
        count += 1
    return act


@pytest.mark.parametrize("num_beats", [3, 4])
def test_viterbi_path_matches_independent_dense_decoder(num_beats):
    lam = 100.0
    min_bpm, max_bpm = 100, 160
    rng = np.random.RandomState(num_beats)
    act = _synthetic_activations(200, 25, 4, num_beats, rng)
    dens = log_densities_from_activations(act)

    states = enumerate_states(num_beats, min_bpm, max_bpm)
    log_t = dense_log_transitions(states, num_beats, lam)
    pointers = observation_pointers(states)
    path_ind, logp_ind = dense_viterbi(log_t, pointers, dens)

    decoder = DbnDecoder(
        beats_per_bar=(num_beats,), min_bpm=min_bpm, max_bpm=max_bpm,
        fps=FPS, transition_lambda=lam, threshold=0,
    )
    from beat_this_tpu.postprocessing.dbn import _backtrack

    import jax.numpy as jnp

    hmm = decoder.patterns[0]
    logp_prod, state, choices = decoder._forward_pattern(hmm, dens)
    path_prod = np.asarray(
        _backtrack(jnp.asarray(hmm.from_idx), choices, state)
    )[: len(dens)]
    np.testing.assert_allclose(logp_prod, logp_ind, rtol=1e-5)
    np.testing.assert_array_equal(path_prod, path_ind)


def test_full_decoder_matches_independent_pipeline():
    """End to end (thresholding, pattern selection among [3, 4], peak
    correction) against the from-scratch pipeline."""
    rng = np.random.RandomState(7)
    act = _synthetic_activations(300, 22, 9, 4, rng)
    act[:5] = 0.001  # below threshold: exercises the trimming offset
    decoder = DbnDecoder(
        beats_per_bar=(3, 4), min_bpm=100, max_bpm=160, fps=FPS,
        transition_lambda=100.0,
    )
    produced = decoder(act)
    expected = independent_decode(act, (3, 4), 100, 160, 100.0)
    np.testing.assert_allclose(produced, expected)
    # sanity: it actually found the 4/4 grid with period 22 at 50 fps
    assert len(produced) >= 10
    assert set(produced[:, 1]) == {1.0, 2.0, 3.0, 4.0}


# ---------------------------------------------------------------------------
# recursion-free ground truth: exhaustive path enumeration
# ---------------------------------------------------------------------------


def _exhaustive_best(log_t, pointers, dens):
    """Argmax over ALL positive-probability state sequences by depth-first
    enumeration of the transition graph — no dynamic program, no backtrack
    table, nothing structurally shared with EITHER Viterbi implementation.
    Returns (best_logp, best_path). Feasible because within a beat the
    phase advances deterministically (branching only at beat boundaries);
    keep the state space tiny."""
    s = log_t.shape[0]
    succ = [np.flatnonzero(np.isfinite(log_t[:, frm])) for frm in range(s)]
    t_total = len(dens)
    best = [-np.inf, None]

    def extend(path, score):
        t = len(path)
        if t == t_total:
            if score > best[0]:
                best[0], best[1] = score, list(path)
            return
        for nxt in succ[path[-1]]:
            extend(
                path + [int(nxt)],
                score + log_t[nxt, path[-1]] + dens[t][pointers[nxt]],
            )

    # madmom convention: uniform init over a hidden s0, one transition
    # before the first observation
    init = -np.log(s)
    for first in range(s):
        pred = log_t[first, :]
        if not np.isfinite(pred).any():
            continue
        extend([first], init + float(np.max(pred)) + dens[0][pointers[first]])
    return best[0], np.asarray(best[1])


def _path_score(log_t, pointers, dens, path):
    """Score an explicit path under the same convention."""
    s = log_t.shape[0]
    score = -np.log(s) + float(np.max(log_t[path[0], :]))
    score += dens[0][pointers[path[0]]]
    for t in range(1, len(path)):
        score += log_t[path[t], path[t - 1]] + dens[t][pointers[path[t]]]
    return score


def test_viterbi_matches_exhaustive_path_enumeration():
    """Both Viterbi decoders (the independent dense one and the production
    lax.scan one) against brute force, on a 10-state model (2 beats,
    intervals {2, 3}) small enough to enumerate every valid path of a
    20-frame sequence. transition_lambda is small so tempo changes are NOT
    pruned and the graph genuinely branches."""
    import jax.numpy as jnp

    from beat_this_tpu.postprocessing.dbn import _backtrack

    num_beats, min_bpm, max_bpm, lam = 2, 1000, 1500, 5.0
    assert interval_range(min_bpm, max_bpm) == (2, 3)
    rng = np.random.RandomState(3)
    act = rng.uniform(0.005, 0.45, (20, 2))
    dens = log_densities_from_activations(act)

    states = enumerate_states(num_beats, min_bpm, max_bpm)
    log_t = dense_log_transitions(states, num_beats, lam)
    pointers = observation_pointers(states)

    logp_brute, path_brute = _exhaustive_best(log_t, pointers, dens)
    assert np.isfinite(logp_brute)

    path_dense, logp_dense = dense_viterbi(log_t, pointers, dens)
    np.testing.assert_allclose(logp_dense, logp_brute, rtol=1e-10)
    # ties are measure-zero under continuous uniform activations, but stay
    # tie-proof anyway: the decoded path must SCORE optimally
    np.testing.assert_allclose(
        _path_score(log_t, pointers, dens, path_dense), logp_brute,
        rtol=1e-10,
    )

    decoder = DbnDecoder(
        beats_per_bar=(num_beats,), min_bpm=min_bpm, max_bpm=max_bpm,
        fps=FPS, transition_lambda=lam, threshold=0,
    )
    hmm = decoder.patterns[0]
    assert hmm.num_states == len(states)
    logp_prod, state, choices = decoder._forward_pattern(hmm, dens)
    path_prod = np.asarray(
        _backtrack(jnp.asarray(hmm.from_idx), choices, state)
    )[: len(dens)]
    np.testing.assert_allclose(logp_prod, logp_brute, rtol=1e-5)
    np.testing.assert_allclose(
        _path_score(log_t, pointers, dens, path_prod), logp_brute,
        rtol=1e-10,
    )
