"""The grouped eval fast path (`predict_postprocess_batched`) must produce
results identical to the per-piece predict + postprocess loop it replaces in
the eval drivers (compute_paper_metrics.py, Trainer.test)."""

import numpy as np
import pytest

from beat_this_tpu.inference import (
    ChunkedPredictor,
    LoadedModel,
    predict_postprocess_batched,
)
from beat_this_tpu.model import BeatThisConfig, init_beat_this
from beat_this_tpu.postprocessing import Postprocessor

CHUNK, BORDER = 96, 6


@pytest.fixture(scope="module")
def model():
    cfg = BeatThisConfig(transformer_dim=64, n_layers=1)
    params, state = init_beat_this(5, cfg)
    return LoadedModel(cfg, params, state)


def _pieces():
    rng = np.random.RandomState(0)
    # mix of short (single-chunk) and long (multi-chunk) pieces, odd lengths
    return [
        {"spect": rng.randn(t, 128).astype(np.float32), "name": f"p{t}"}
        for t in (40, 210, 150, 97, 300)
    ]


@pytest.mark.parametrize("pp_type", ["minimal", "dbn"])
def test_batched_eval_matches_per_piece(model, pp_type):
    predictor = ChunkedPredictor(model, chunk_size=CHUNK, border_size=BORDER)
    postp = Postprocessor(pp_type, fps=50)
    pieces = _pieces()

    expected = []
    for piece in pieces:
        bl, dl = predictor.predict(piece["spect"])
        expected.append(postp(bl, dl))

    got = list(
        predict_postprocess_batched(predictor, postp, pieces, group_size=3)
    )
    assert [p["name"] for p, _, _ in got] == [p["name"] for p in pieces]
    for (piece, beat, down), (exp_beat, exp_down) in zip(got, expected):
        np.testing.assert_allclose(beat, exp_beat, atol=1e-9, err_msg=piece["name"])
        np.testing.assert_allclose(down, exp_down, atol=1e-9, err_msg=piece["name"])
