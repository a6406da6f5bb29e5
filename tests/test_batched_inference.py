"""Batched multi-piece inference: predict_many must match per-piece predict;
the CLI directory path routes through BatchedFile2File."""

import numpy as np
import pytest

from beat_this_tpu.inference import ChunkedPredictor, LoadedModel
from beat_this_tpu.model import BeatThisConfig, init_beat_this


@pytest.fixture(scope="module")
def model():
    cfg = BeatThisConfig(transformer_dim=64, n_layers=1)
    params, state = init_beat_this(3, cfg)
    return LoadedModel(cfg, params, state)


def test_predict_many_matches_predict(model):
    predictor = ChunkedPredictor(model, chunk_size=96, border_size=6)
    rng = np.random.RandomState(0)
    spects = [rng.randn(t, 128).astype(np.float32) for t in (300, 150, 97, 40)]
    batched = predictor.predict_many(spects)
    for spect, (beat_b, down_b) in zip(spects, batched):
        beat_s, down_s = predictor.predict(spect)
        np.testing.assert_allclose(beat_b, beat_s, atol=5e-5)
        np.testing.assert_allclose(down_b, down_s, atol=5e-5)


def test_cli_batched_directory(tmp_path):
    torch = pytest.importorskip("torch")
    from beat_this_tpu.cli import run
    from beat_this_tpu.io.audio import save_wav
    from beat_this_tpu.io.torch_ckpt import pytree_to_torch_state_dict

    cfg = BeatThisConfig(transformer_dim=64, n_layers=1)
    params, state = init_beat_this(1, cfg)
    sd = pytree_to_torch_state_dict(params, state)
    ckpt = tmp_path / "m.ckpt"
    torch.save(
        {
            "state_dict": {
                "model." + k: torch.as_tensor(np.ascontiguousarray(v))
                for k, v in sd.items()
            },
            "hyper_parameters": {"transformer_dim": 64, "n_layers": 1},
        },
        ckpt,
    )
    wavs = tmp_path / "wavs"
    wavs.mkdir()
    rng = np.random.RandomState(0)
    for i, n in enumerate((22050, 11025, 33075)):
        save_wav(wavs / f"f{i}.wav", 0.1 * rng.randn(n), 22050)
    # one corrupt file to exercise the error path
    (wavs / "bad.wav").write_bytes(b"not audio")

    out = tmp_path / "out"
    run(
        inputs=[str(wavs)], model=str(ckpt), output=str(out), suffix=".beats",
        append=False, skip_existing=False, touch_first=False, dbn=False,
        gpu=0, float16=False, activations=True, batch_files=2,
    )
    for i in range(3):
        assert (out / f"f{i}.beats").exists()
        acts = np.load(out / f"f{i}.npy")
        assert acts.shape[0] == 2
    assert not (out / "bad.beats").exists() or (out / "bad.beats").stat().st_size == 0
