"""End-to-end tests: synthetic checkpoint + wav file through the public class
tower (File2Beats) and the CLI (multi-file directory mode, --skip-existing,
--activations)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from beat_this_tpu.cli import derive_output_path, run
from beat_this_tpu.io.audio import load_audio, save_wav
from beat_this_tpu.io.torch_ckpt import pytree_to_torch_state_dict
from beat_this_tpu.model import BeatThisConfig, init_beat_this
from pathlib import Path


@pytest.fixture(scope="module")
def ckpt_path(tmp_path_factory):
    cfg = BeatThisConfig(transformer_dim=64, n_layers=1)
    params, state = init_beat_this(11, cfg)
    sd = pytree_to_torch_state_dict(params, state)
    ckpt = {
        "state_dict": {
            "model." + k: torch.as_tensor(np.ascontiguousarray(v))
            for k, v in sd.items()
        },
        "hyper_parameters": {"transformer_dim": 64, "n_layers": 1},
        "datamodule_hyper_parameters": {},
        "pytorch-lightning_version": "2.0.0",
    }
    path = tmp_path_factory.mktemp("ckpt") / "tiny.ckpt"
    torch.save(ckpt, path)
    return str(path)


@pytest.fixture(scope="module")
def wav_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("audio")
    rng = np.random.RandomState(0)
    t = np.arange(int(22050 * 1.5)) / 22050.0
    x = 0.1 * np.sin(2 * np.pi * 220 * t) + 0.01 * rng.randn(len(t))
    save_wav(d / "a.wav", x, 22050)
    save_wav(d / "b.wav", x[: 22050 // 2], 22050)
    return d


def test_wav_roundtrip(tmp_path):
    x = np.sin(np.arange(1000) * 0.05) * 0.7
    save_wav(tmp_path / "t.wav", x, 22050)
    y, sr = load_audio(tmp_path / "t.wav")
    assert sr == 22050
    assert y.shape == (1000,)
    np.testing.assert_allclose(y, x, atol=1e-4)


def test_file2beats(ckpt_path, wav_dir):
    from beat_this_tpu.inference import File2Beats

    f2b = File2Beats(ckpt_path)
    beats, downbeats = f2b(wav_dir / "a.wav")
    assert isinstance(beats, np.ndarray) and isinstance(downbeats, np.ndarray)
    assert beats.ndim == 1 and downbeats.ndim == 1


def test_derive_output_path():
    p = Path("/x/y/song.wav")
    assert derive_output_path(p, ".beats", False) == Path("/x/y/song.beats")
    assert derive_output_path(p, ".beats", True) == Path("/x/y/song.wav.beats")
    assert derive_output_path(
        p, ".beats", False, Path("/out"), parent=Path("/x")
    ) == Path("/out/y/song.beats")


def test_cli_directory_mode(ckpt_path, wav_dir, tmp_path):
    out = tmp_path / "out"
    run(
        inputs=[str(wav_dir)], model=ckpt_path, output=str(out), suffix=".beats",
        append=False, skip_existing=False, touch_first=False, dbn=False,
        gpu=0, float16=False, activations=False,
    )
    assert (out / "a.beats").exists()
    assert (out / "b.beats").exists()
    # .beats format: time<TAB>number per line (may be empty for random model)
    for line in (out / "a.beats").read_text().splitlines():
        time_s, number = line.split("\t")
        float(time_s), int(number)

    # --skip-existing must not rewrite
    mtime = (out / "a.beats").stat().st_mtime_ns
    run(
        inputs=[str(wav_dir)], model=ckpt_path, output=str(out), suffix=".beats",
        append=False, skip_existing=True, touch_first=False, dbn=False,
        gpu=0, float16=False, activations=False,
    )
    assert (out / "a.beats").stat().st_mtime_ns == mtime


def test_cli_single_file_activations(ckpt_path, wav_dir, tmp_path):
    outfile = tmp_path / "single.beats"
    run(
        inputs=[str(wav_dir / "a.wav")], model=ckpt_path, output=str(outfile),
        suffix=".beats", append=False, skip_existing=False, touch_first=False,
        dbn=False, gpu=0, float16=False, activations=True,
    )
    assert outfile.exists()
    acts = np.load(outfile.with_suffix(".npy"))
    n_frames = int(22050 * 1.5) // 441 + 1
    assert acts.shape == (2, n_frames)
    assert np.all(np.isfinite(acts))
