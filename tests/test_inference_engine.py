"""Tests for chunk planning, the batched chunked predictor (vs a host-side
oracle implementing the reference chunk/stitch semantics), the minimal
postprocessor, and TSV output."""

import numpy as np
import pytest

import jax

from beat_this_tpu.inference import ChunkedPredictor, LoadedModel, plan_chunks
from beat_this_tpu.model import BeatThisConfig, apply_beat_this, init_beat_this
from beat_this_tpu.postprocessing import Postprocessor, deduplicate_peaks
from beat_this_tpu.utils import infer_beat_numbers, save_beat_tsv

CHUNK, BORDER = 96, 6  # small chunks so CPU tests stay fast
STRIDE = CHUNK - 2 * BORDER


@pytest.fixture(scope="module")
def model():
    cfg = BeatThisConfig(transformer_dim=64, n_layers=1)
    params, state = init_beat_this(3, cfg)
    return LoadedModel(cfg, params, state)


def oracle_predict(model, spect, chunk_size, border_size,
                   overlap_mode="keep_first"):
    """Host-side re-implementation of the reference chunked inference
    (beat_this/inference.py:100-230): keep_first/keep_last overlap,
    avoid_short_end, and — crucially — pieces no longer than one chunk run as
    a single SHORTER chunk of length t + 2*border (reference
    inference.py:111-135), not a zero-padded full-size one."""
    t = len(spect)
    starts = plan_chunks(t, chunk_size, border_size)
    fwd = jax.jit(
        lambda x: apply_beat_this(model.params, model.state, x, model.config)[0]
    )
    chunk_outs = []
    for start in starts:
        lo, hi = max(start, 0), min(start + chunk_size, t)
        left = max(0, -start)
        right = max(0, min(border_size, start + chunk_size - t))
        chunk = np.concatenate(
            [
                np.zeros((left, spect.shape[1]), np.float32),
                spect[lo:hi],
                np.zeros((right, spect.shape[1]), np.float32),
            ]
        )
        out = fwd(chunk[None])
        chunk_outs.append(
            (np.asarray(out["beat"][0]), np.asarray(out["downbeat"][0]))
        )
    beat = np.full(t, -1000.0, np.float32)
    downbeat = np.full(t, -1000.0, np.float32)
    pairs = list(zip(starts, chunk_outs))
    if overlap_mode == "keep_first":
        pairs = reversed(pairs)
    for start, (cb, cd) in pairs:
        cb = cb[border_size:-border_size] if border_size else cb
        cd = cd[border_size:-border_size] if border_size else cd
        lo = start + border_size
        hi = min(start + chunk_size - border_size, t)
        beat[max(lo, 0) : hi] = cb[: hi - lo]
        downbeat[max(lo, 0) : hi] = cd[: hi - lo]
    return beat, downbeat


def test_plan_chunks_matches_reference_semantics():
    # reference: starts every chunk_size - 2*border from -border;
    # last start moved to length - (chunk_size - border) when long enough
    starts = plan_chunks(300, 96, 6)
    assert starts[0] == -6
    assert np.all(np.diff(starts)[:-1] == STRIDE)
    assert starts[-1] == 300 - (96 - 6)
    # piece shorter than stride: single chunk, no shift
    assert list(plan_chunks(50, 96, 6)) == [-6]
    # exactly stride: single chunk
    assert list(plan_chunks(STRIDE, 96, 6)) == [-6]
    assert list(plan_chunks(STRIDE + 1, 96, 6)) == [-6, (STRIDE + 1) - 90]


@pytest.mark.parametrize("t", [300, 2 * STRIDE, 200, 97])
def test_chunked_predictor_matches_host_oracle(model, t):
    rng = np.random.RandomState(t)
    spect = rng.randn(t, 128).astype(np.float32)
    predictor = ChunkedPredictor(model, chunk_size=CHUNK, border_size=BORDER)
    beat, downbeat = predictor.predict(spect)
    ob, od = oracle_predict(model, spect, CHUNK, BORDER)
    assert beat.shape == (t,)
    np.testing.assert_allclose(beat, ob, atol=5e-5)
    np.testing.assert_allclose(downbeat, od, atol=5e-5)


def test_jitted_fns_shared_across_predictor_instances(model):
    """Fresh predictors with the same geometry must reuse the module-level
    jitted callables — the guarantee that repeated `cli.run()` calls in one
    process pay tracing/executable-load once, not per invocation (the warm
    CLI-directory cost through a relay-attached TPU)."""
    from beat_this_tpu import inference

    p1 = ChunkedPredictor(model, chunk_size=CHUNK, border_size=BORDER)
    p2 = ChunkedPredictor(model, chunk_size=CHUNK, border_size=BORDER)
    assert p1._stitch_fn() is p2._stitch_fn()
    assert p1._short_fn() is p2._short_fn()
    assert p1._forward_chunks_fn() is p2._forward_chunks_fn()

    rng = np.random.RandomState(7)
    spect = rng.randn(250, 128).astype(np.float32)
    b1, d1 = p1.predict(spect)
    n_fns = len(inference._SHARED_FNS)
    b2, d2 = p2.predict(spect)
    assert len(inference._SHARED_FNS) == n_fns  # no new traces for p2
    np.testing.assert_array_equal(b1, b2)
    np.testing.assert_array_equal(d1, d2)
    # a different geometry or dtype must NOT collide with the cached fns
    p3 = ChunkedPredictor(model, chunk_size=CHUNK + 12, border_size=BORDER)
    assert p3._stitch_fn() is not p1._stitch_fn()


def test_load_model_cached_per_file_and_placement_shared(tmp_path):
    """Local-file checkpoints load once per (path, mtime, size): repeat
    `load_model` calls return the SAME LoadedModel instance so the parse and
    the device placement (~2 s through a relay-attached TPU) are paid once
    per process; rewriting the file invalidates the cache."""
    torch = pytest.importorskip("torch")
    from beat_this_tpu.inference import load_model
    from beat_this_tpu.io.torch_ckpt import pytree_to_torch_state_dict
    from beat_this_tpu.model import BeatThisConfig, init_beat_this

    def write(seed):
        cfg = BeatThisConfig(transformer_dim=64, n_layers=1)
        params, state = init_beat_this(seed, cfg)
        sd = pytree_to_torch_state_dict(params, state)
        torch.save(
            {
                "state_dict": {
                    "model." + k: torch.as_tensor(np.ascontiguousarray(v))
                    for k, v in sd.items()
                },
                "hyper_parameters": {"transformer_dim": 64, "n_layers": 1},
            },
            tmp_path / "m.ckpt",
        )

    write(0)
    m1 = load_model(str(tmp_path / "m.ckpt"))
    m2 = load_model(str(tmp_path / "m.ckpt"))
    assert m1 is m2

    p1 = ChunkedPredictor(m1, chunk_size=CHUNK, border_size=BORDER)
    p2 = ChunkedPredictor(m2, chunk_size=CHUNK, border_size=BORDER)
    assert p1._params_on_device() is p2._params_on_device()

    import os
    import time as _time

    _time.sleep(0.01)
    write(1)  # same size, new mtime -> must reload
    os.utime(tmp_path / "m.ckpt")
    m3 = load_model(str(tmp_path / "m.ckpt"))
    assert m3 is not m1
    import jax

    leaves1 = jax.tree_util.tree_leaves(m1.params)
    leaves3 = jax.tree_util.tree_leaves(m3.params)
    assert any(
        not np.array_equal(a, b) for a, b in zip(leaves1, leaves3)
    ), "reload after rewrite must see the new weights"


@pytest.mark.parametrize("t", [300, 200])
def test_keep_last_overlap_mode(model, t):
    rng = np.random.RandomState(1000 + t)
    spect = rng.randn(t, 128).astype(np.float32)
    predictor = ChunkedPredictor(
        model, chunk_size=CHUNK, border_size=BORDER, overlap_mode="keep_last"
    )
    beat, downbeat = predictor.predict(spect)
    ob, od = oracle_predict(model, spect, CHUNK, BORDER, "keep_last")
    np.testing.assert_allclose(beat, ob, atol=5e-5)
    np.testing.assert_allclose(downbeat, od, atol=5e-5)
    # the overlap region must actually differ between the two modes
    fb, _ = oracle_predict(model, spect, CHUNK, BORDER, "keep_first")
    assert not np.allclose(ob, fb)
    # the batched multi-piece path stitches identically
    (mb, md), = predictor.predict_many([spect])
    np.testing.assert_allclose(mb, beat, atol=5e-5)
    np.testing.assert_allclose(md, downbeat, atol=5e-5)


def test_split_predict_aggregate_keep_last(model):
    from beat_this_tpu.inference import split_predict_aggregate

    spect = np.random.RandomState(7).randn(250, 128).astype(np.float32)
    out = split_predict_aggregate(spect, CHUNK, BORDER, "keep_last", model)
    ob, od = oracle_predict(model, spect, CHUNK, BORDER, "keep_last")
    np.testing.assert_allclose(out["beat"], ob, atol=5e-5)
    np.testing.assert_allclose(out["downbeat"], od, atol=5e-5)
    with pytest.raises(ValueError):
        split_predict_aggregate(spect, CHUNK, BORDER, "keep_middle", model)


def test_short_piece_single_chunk(model):
    spect = np.random.RandomState(0).randn(40, 128).astype(np.float32)
    predictor = ChunkedPredictor(model, chunk_size=CHUNK, border_size=BORDER)
    beat, downbeat = predictor.predict(spect)
    ob, od = oracle_predict(model, spect, CHUNK, BORDER)
    np.testing.assert_allclose(beat, ob, atol=5e-5)


# ---------------------------------------------------------------------------
# postprocessor
# ---------------------------------------------------------------------------


def logits_with_peaks(t, peak_frames, peak_value=5.0):
    x = np.full(t, -5.0, np.float32)
    x[peak_frames] = peak_value
    return x


def test_minimal_postprocessor_basic():
    pp = Postprocessor("minimal", fps=50)
    beat = logits_with_peaks(500, [50, 150, 250, 350, 450])
    downbeat = logits_with_peaks(500, [52, 250])  # 52 should snap to beat 50
    b, d = pp(beat, downbeat)
    np.testing.assert_allclose(b, [1.0, 3.0, 5.0, 7.0, 9.0])
    np.testing.assert_allclose(d, [1.0, 5.0])  # 52/50 -> snapped to 1.0


def test_minimal_postprocessor_batched_and_mask():
    pp = Postprocessor("minimal", fps=50)
    beat = np.stack([logits_with_peaks(300, [100]), logits_with_peaks(300, [100, 290])])
    downbeat = np.full((2, 300), -5.0, np.float32)
    mask = np.ones((2, 300), bool)
    mask[1, 250:] = False  # peak at 290 is padding
    b, d = pp(beat, downbeat, mask)
    assert isinstance(b, tuple) and len(b) == 2
    np.testing.assert_allclose(b[0], [2.0])
    np.testing.assert_allclose(b[1], [2.0])
    assert len(d[0]) == 0


def test_minimal_postprocessor_adjacent_peaks_dedup():
    pp = Postprocessor("minimal", fps=50)
    # plateau: two equal maxima 1 frame apart both survive peak picking
    beat = np.full(200, -5.0, np.float32)
    beat[100] = beat[101] = 4.0
    b, _ = pp(beat, np.full(200, -5.0, np.float32))
    np.testing.assert_allclose(b, [100.5 / 50])  # averaged then /fps


def test_deduplicate_peaks():
    # running-mean semantics: after merging 1,2 the mean 1.5 is >1 from 3,
    # so the chain breaks (matches reference postprocessor.py:176-197)
    np.testing.assert_allclose(deduplicate_peaks([1, 2, 3, 10]), [1.5, 3.0, 10.0])
    np.testing.assert_allclose(deduplicate_peaks([4, 5]), [4.5])
    np.testing.assert_allclose(deduplicate_peaks([]), [])
    np.testing.assert_allclose(deduplicate_peaks([5]), [5.0])


def test_peaks_below_threshold_dropped():
    pp = Postprocessor("minimal", fps=50)
    beat = np.full(100, -5.0, np.float32)
    beat[50] = -0.1  # below logit 0 => prob < 0.5
    b, _ = pp(beat, np.full(100, -5.0, np.float32))
    assert len(b) == 0


# ---------------------------------------------------------------------------
# beat numbering + TSV
# ---------------------------------------------------------------------------


def test_infer_beat_numbers_pickup():
    beats = np.array([0.5, 1.0, 1.5, 2.0, 2.5, 3.0, 3.5])
    downbeats = np.array([1.0, 3.0])  # 1 pickup beat, 4 beats per measure
    numbers = infer_beat_numbers(beats, downbeats)
    np.testing.assert_array_equal(numbers, [4, 1, 2, 3, 4, 1, 2])


def test_save_beat_tsv(tmp_path):
    out = tmp_path / "x.beats"
    beats = np.array([0.5, 1.0, 1.5, 2.0])
    downbeats = np.array([1.0])
    save_beat_tsv(beats, downbeats, out)
    lines = out.read_text().strip().split("\n")
    assert lines[1] == "1.0\t1"
    assert len(lines) == 4


def test_infer_beat_numbers_long_pickup_warns_and_counts_from_two():
    # pickup (4 beats) longer than first full measure (2 beats)
    beats = np.arange(8, dtype=float)
    downbeats = np.array([4.0, 6.0])
    with pytest.warns(UserWarning):
        numbers = infer_beat_numbers(beats, downbeats)
    np.testing.assert_array_equal(numbers, [2, 3, 4, 5, 1, 2, 1, 2])


def test_infer_beat_numbers_single_downbeat_warns():
    beats = np.array([0.0, 0.5, 1.0, 1.5])
    downbeats = np.array([1.0])
    with pytest.warns(UserWarning):
        numbers = infer_beat_numbers(beats, downbeats)
    np.testing.assert_array_equal(numbers, [2, 3, 1, 2])


def test_infer_beat_numbers_no_downbeats_counts_up():
    beats = np.array([0.0, 0.5, 1.0])
    with pytest.warns(UserWarning):
        numbers = infer_beat_numbers(beats, np.array([]))
    np.testing.assert_array_equal(numbers, [2, 3, 4])


def test_infer_beat_numbers_requires_downbeats_subset():
    with pytest.raises(ValueError):
        infer_beat_numbers(np.array([0.0, 1.0]), np.array([0.5]))


def test_infer_beat_numbers_counts_past_last_downbeat():
    beats = np.arange(10, dtype=float)
    downbeats = np.array([0.0, 3.0])
    numbers = infer_beat_numbers(beats, downbeats)
    np.testing.assert_array_equal(numbers, [1, 2, 3, 1, 2, 3, 4, 5, 6, 7])


def test_save_beat_tsv_leaves_no_staging_file(tmp_path):
    out = tmp_path / "y.beats"
    save_beat_tsv(np.array([0.5, 1.0]), np.array([0.5]), out)
    assert out.exists()
    assert list(tmp_path.glob("*.part")) == []
