"""Integration tests for the launch scripts: offline preprocessing from raw
wavs, the eval driver on a synthetic checkpoint, and checkpoint cleaning."""

import json
import sys
from pathlib import Path

import numpy as np
import pytest

LAUNCH = Path(__file__).resolve().parent.parent / "launch_scripts"
sys.path.insert(0, str(LAUNCH))


@pytest.fixture(scope="module")
def raw_corpus(tmp_path_factory, monkeypatch_module=None):
    """Raw wav corpus + annotations in the reference layout."""
    root = tmp_path_factory.mktemp("project")
    audio_src = root / "raw_audio"
    audio_src.mkdir()
    ann = root / "data" / "annotations" / "mini" / "annotations" / "beats"
    ann.mkdir(parents=True)
    from beat_this_tpu.io.audio import save_wav

    rng = np.random.RandomState(0)
    for i in range(2):
        t = np.arange(22050 * 2) / 22050
        x = 0.2 * np.sin(2 * np.pi * (300 + 100 * i) * t)
        x += 0.02 * rng.randn(len(t))
        save_wav(audio_src / f"song{i}.wav", x, 22050)
        times = np.arange(0.5, 1.9, 0.5)
        values = (np.arange(len(times)) % 2) + 1
        np.savetxt(ann / f"song{i}.beats", np.stack([times, values], 1),
                   fmt="%.3f\t%d")
    (root / "data" / "annotations" / "mini" / "info.json").write_text(
        json.dumps({"has_downbeats": True})
    )
    (root / "data" / "audio_paths.tsv").write_text(f"mini,{audio_src}\n")
    return root


def test_preprocess_pipeline(raw_corpus, monkeypatch):
    import preprocess_audio as pa

    monkeypatch.setattr(pa, "BASEPATH", raw_corpus)
    prep = pa.AudioPreprocessing(
        raw_corpus / "data" / "audio_paths.tsv",
        pitch_shift=(-1, 1), time_stretch=(4, 4),
    )
    prep.preprocess_audio()
    mono = raw_corpus / "data" / "audio" / "mono_tracks" / "mini" / "song0"
    assert (mono / "track.wav").exists()
    assert (mono / "track_ps-1.wav").exists()
    assert (mono / "track_ps1.wav").exists()
    assert (mono / "track_ts-4.wav").exists()
    assert (mono / "track_ts4.wav").exists()

    # stretched variant has scaled duration
    from beat_this_tpu.io.audio import load_audio

    x, sr = load_audio(mono / "track.wav")
    xs, _ = load_audio(mono / "track_ts4.wav")
    assert abs(len(xs) - len(x) / 1.04) < 1000

    sc = pa.SpectCreation((-1, 1), (4, 4))
    sc.create_spects()
    spect_dir = raw_corpus / "data" / "audio" / "spectrograms" / "mini" / "song0"
    spect = np.load(spect_dir / "track.npy")
    assert spect.dtype == np.float16
    assert spect.shape == (len(x) // 441 + 1, 128)

    pa.create_npz(raw_corpus / "data" / "audio" / "spectrograms")
    npz = raw_corpus / "data" / "audio" / "spectrograms" / "mini.npz"
    assert npz.exists()
    from beat_this_tpu.data import MemmappedNpz

    m = MemmappedNpz(npz)
    assert "song0/track" in m and "song0/track_ps1" in m


def _make_ckpt(tmp_path, dm_hparams, name="eval.ckpt", seed=0):
    import torch

    from beat_this_tpu.io.torch_ckpt import pytree_to_torch_state_dict
    from beat_this_tpu.model import BeatThisConfig, init_beat_this

    cfg = BeatThisConfig(transformer_dim=64, n_layers=1)
    params, state = init_beat_this(seed, cfg)
    sd = pytree_to_torch_state_dict(params, state)
    ckpt = {
        "state_dict": {
            "model." + k: torch.as_tensor(np.ascontiguousarray(v))
            for k, v in sd.items()
        },
        "hyper_parameters": {"transformer_dim": 64, "n_layers": 1,
                             "eval_trim_beats": 0},
        "datamodule_hyper_parameters": dm_hparams,
        "pytorch-lightning_version": "2.0.0",
    }
    path = tmp_path / name
    torch.save(ckpt, path)
    return path


def test_compute_paper_metrics_single(tmp_path, capsys):
    pytest.importorskip("torch")
    from tests.test_dataset import make_corpus

    root = tmp_path / "data"
    root.mkdir()
    make_corpus(root, n_pieces=2, frames=300, dataset="gtzan", augmentations={})
    ckpt = _make_ckpt(tmp_path, {"batch_size": 2, "test_dataset": "gtzan"})

    import compute_paper_metrics as cpm

    args = cpm.get_parser().parse_args(
        ["--models", str(ckpt), "--datasplit", "test", "--data-dir", str(root),
         "--dump-predictions", str(tmp_path / "preds.npz")]
    )
    cpm.main(args)
    out = capsys.readouterr().out
    assert "F-measure_beat" in out
    assert "gtzan" in out
    assert (tmp_path / "preds.npz").exists()


def test_clean_checkpoints(tmp_path):
    pytest.importorskip("torch")
    ckpt = _make_ckpt(tmp_path, {"batch_size": 2})
    # add resume state to be stripped
    from beat_this_tpu.io.torch_ckpt import load_torch_checkpoint
    from beat_this_tpu.io.torch_save import save_torch_checkpoint

    full = load_torch_checkpoint(ckpt)
    full["beat_this_tpu"] = {"step": 5, "epoch": 1, "opt_leaves": {}}
    full["datamodule_hyper_parameters"]["data_dir"] = "/somewhere"
    save_torch_checkpoint(full, ckpt)

    import clean_checkpoints as cc

    cc.main(type("A", (), {"checkpoints": [str(ckpt)], "suffix": True})())
    cleaned = load_torch_checkpoint(ckpt.with_suffix(".cleaned.ckpt"))
    assert "beat_this_tpu" not in cleaned
    assert "data_dir" not in cleaned["datamodule_hyper_parameters"]
    assert "state_dict" in cleaned


def test_compute_paper_metrics_mean_std(tmp_path, capsys):
    """Two checkpoints aggregated as mean ± std over seeds (reference
    compute_paper_metrics.py:59-98)."""
    pytest.importorskip("torch")
    from tests.test_dataset import AUGS, make_corpus

    root = tmp_path / "data"
    root.mkdir()
    make_corpus(root, n_pieces=3, frames=280, dataset="alpha",
                augmentations=AUGS)
    dm_hparams = {"batch_size": 2, "test_dataset": "gtzan",
                  "augmentations": AUGS}
    ckpts = [
        str(_make_ckpt(tmp_path, dm_hparams, name=f"seed{s}.ckpt", seed=s))
        for s in (0, 1)
    ]

    import compute_paper_metrics as cpm

    args = cpm.get_parser().parse_args(
        ["--models", *ckpts, "--datasplit", "val", "--data-dir", str(root),
         "--aggregation-type", "mean-std"]
    )
    cpm.main(args)
    out = capsys.readouterr().out
    assert "+-" in out
    assert "F-measure_beat" in out and "AMLt_downbeat" in out


def test_compute_paper_metrics_kfold(tmp_path, capsys):
    """Two fold checkpoints: per-fold val pieces are concatenated, the
    duplicate-piece assertion holds, and predictions dump for all pieces
    (reference compute_paper_metrics.py:99-156)."""
    pytest.importorskip("torch")
    from tests.test_dataset import AUGS, make_corpus

    root = tmp_path / "data"
    root.mkdir()
    make_corpus(root, n_pieces=4, frames=280, dataset="alpha",
                augmentations=AUGS, split="folds")
    ckpts = [
        str(
            _make_ckpt(
                tmp_path,
                {"batch_size": 2, "test_dataset": "gtzan", "fold": fold,
                 "augmentations": AUGS},
                name=f"fold{fold}.ckpt",
                seed=fold,
            )
        )
        for fold in (0, 1)
    ]
    dump = tmp_path / "kfold_preds.npz"

    import compute_paper_metrics as cpm

    args = cpm.get_parser().parse_args(
        ["--models", *ckpts, "--datasplit", "val", "--data-dir", str(root),
         "--aggregation-type", "k-fold", "--dump-predictions", str(dump)]
    )
    cpm.main(args)
    out = capsys.readouterr().out
    assert "alpha:" in out
    preds = np.load(dump)
    # every piece appears exactly once across the two folds
    assert len(preds.files) == 4
    for name in preds.files:
        rows = preds[name]
        assert rows.ndim == 2 and rows.shape[1] == 2
        assert np.all(np.diff(rows[:, 0]) > 0)  # times strictly increasing
        assert np.all(rows[:, 1] >= 1)  # beat numbers start at 1


def test_compute_paper_metrics_kfold_rejects_duplicates(tmp_path):
    """The same fold twice must trip the repeated-pieces assertion
    (reference compute_paper_metrics.py:135-137)."""
    pytest.importorskip("torch")
    from tests.test_dataset import AUGS, make_corpus

    root = tmp_path / "data"
    root.mkdir()
    make_corpus(root, n_pieces=4, frames=280, dataset="alpha",
                augmentations=AUGS, split="folds")
    dm_hparams = {"batch_size": 2, "test_dataset": "gtzan", "fold": 0,
                  "augmentations": AUGS}
    ckpts = [
        str(_make_ckpt(tmp_path, dm_hparams, name=f"dup{i}.ckpt", seed=i))
        for i in (0, 1)
    ]

    import compute_paper_metrics as cpm

    args = cpm.get_parser().parse_args(
        ["--models", *ckpts, "--datasplit", "val", "--data-dir", str(root),
         "--aggregation-type", "k-fold"]
    )
    with pytest.raises(AssertionError, match="repeated pieces"):
        cpm.main(args)
