"""Multi-chip (8 virtual devices) data-parallel batched inference."""

import numpy as np

from beat_this_tpu.inference import ChunkedPredictor, LoadedModel
from beat_this_tpu.model import BeatThisConfig, init_beat_this
from beat_this_tpu.parallel import make_mesh


def test_predict_many_sharded_matches_local():
    cfg = BeatThisConfig(transformer_dim=64, n_layers=1)
    params, state = init_beat_this(3, cfg)
    model = LoadedModel(cfg, params, state)
    rng = np.random.RandomState(0)
    spects = [rng.randn(t, 128).astype(np.float32) for t in (300, 150, 97)]

    local = ChunkedPredictor(model, chunk_size=96, border_size=6)
    mesh = make_mesh()
    sharded = ChunkedPredictor(model, chunk_size=96, border_size=6, mesh=mesh)

    out_local = local.predict_many(spects)
    out_sharded = sharded.predict_many(spects)
    for (b0, d0), (b1, d1) in zip(out_local, out_sharded):
        np.testing.assert_allclose(b1, b0, atol=5e-5)
        np.testing.assert_allclose(d1, d0, atol=5e-5)
