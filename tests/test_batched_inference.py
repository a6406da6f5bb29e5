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


def test_process_many_batches_postprocessing(model, tmp_path, monkeypatch):
    """Directory mode must postprocess each group in ONE batched call (per
    file costs one device round trip each on a high-latency link), with
    identical beat times to the per-file path, and fall back to per-file
    isolation only when the batched call fails."""
    import beat_this_tpu.inference as inf
    from beat_this_tpu.io.audio import save_wav
    from beat_this_tpu.postprocessing import Postprocessor

    f2f = inf.BatchedFile2File.__new__(inf.BatchedFile2File)
    f2f.model = model
    f2f.predictor = inf.ChunkedPredictor(model, chunk_size=96, border_size=6)
    f2f.frames2beats = Postprocessor(type="minimal")
    f2f.group_size = 4
    f2f.signal2spect = inf.Audio2Frames.signal2spect.__get__(f2f)
    f2f.spect2frames = f2f.predictor.predict

    rng = np.random.RandomState(0)
    tasks = []
    for i in range(4):
        t = np.arange(int(22050 * 1.2)) / 22050.0
        x = (0.2 * np.sin(2 * np.pi * (250 + 40 * i) * t)).astype(np.float32)
        for b in (0.3, 0.7):
            j = int(b * 22050)
            x[j : j + 400] += np.hanning(400).astype(np.float32)
        path = tmp_path / f"in{i}.wav"
        save_wav(path, x, 22050)
        tasks.append((path, tmp_path / f"out{i}.beats"))

    calls = []
    orig = Postprocessor.__call__

    def counting(self, beat, downbeat, padding_mask=None):
        calls.append(np.asarray(beat).ndim)
        return orig(self, beat, downbeat, padding_mask)

    monkeypatch.setattr(Postprocessor, "__call__", counting)
    f2f.process_many(tasks)
    # one 2D batched call for the whole group, no per-file 1D calls
    assert calls == [2]
    outputs = sorted(p.name for p in tmp_path.glob("out*.beats"))
    assert len(outputs) == 4

    # the batched times must equal the per-file path's
    monkeypatch.setattr(Postprocessor, "__call__", orig)
    signals = [f2f._load_one(p) for p, _ in tasks]
    spects = f2f._batched_spects(signals)
    for (path, out), spect in zip(tasks, spects):
        b_logits, d_logits = f2f.predictor.predict(spect)
        beats, downbeats = f2f.frames2beats(b_logits, d_logits)
        text = out.read_text()
        written = np.array(
            [float(line.split("\t")[0]) for line in text.splitlines()]
        )
        np.testing.assert_allclose(written, np.round(beats, 6), atol=1e-6)


def test_predict_many_device_matches_host(model):
    """The device-resident group path (flat mel stays on device, chunk and
    short-piece windows gathered by `_gather_fn`) must produce bit-identical
    logits to the host path (download mel, slice, re-upload chunk batches):
    the gathered tensors are constructed to be float-exact equal, and both
    feed the same cached executables. Lengths straddle the short/long
    boundary (nframes == stride) and include multi-chunk and tiny pieces."""
    import beat_this_tpu.inference as inf
    from beat_this_tpu.ops.mel import num_frames

    predictor = ChunkedPredictor(model, chunk_size=96, border_size=6)
    stride = predictor.stride  # 84 frames
    f2f = inf.BatchedFile2File.__new__(inf.BatchedFile2File)
    f2f.predictor = predictor

    rng = np.random.RandomState(11)
    lengths = [
        300,  # tiny (shorter than the reflect window)
        3000,  # short
        441 * stride - 441,  # nframes just below stride
        441 * stride,  # nframes == stride (short/long boundary)
        441 * stride + 441,  # just over: two-chunk piece
        441 * 200,  # multi-chunk
    ]
    signals = [0.3 * rng.randn(n).astype(np.float32) for n in lengths]
    for n, sig in zip(lengths, signals):
        assert num_frames(n) in range(1, 250)

    mel_dev, offsets, nframes_ = f2f._batched_spects_device(signals)
    got = predictor.predict_many_device(mel_dev, offsets, nframes_)
    want = predictor.predict_many(f2f._batched_spects(signals))
    assert len(got) == len(want)
    for (gb, gd), (wb, wd) in zip(got, want):
        np.testing.assert_array_equal(gb, wb)
        np.testing.assert_array_equal(gd, wd)


def test_group_logits_fallback_is_observable(model, capsys):
    """_group_logits: the device-resident path is the default; a failure in
    it must warn on stderr and fall back to the host path with correct
    results (the ADVICE r4 observability contract)."""
    import beat_this_tpu.inference as inf

    f2f = inf.BatchedFile2File.__new__(inf.BatchedFile2File)
    f2f.predictor = ChunkedPredictor(model, chunk_size=96, border_size=6)

    rng = np.random.RandomState(3)
    signals = [0.3 * rng.randn(n).astype(np.float32) for n in (22050, 60000)]
    want = f2f.predictor.predict_many(f2f._batched_spects(signals))

    res_fast = f2f._group_logits(signals)
    assert "falling back" not in capsys.readouterr().err
    for (gb, gd), (wb, wd) in zip(res_fast, want):
        np.testing.assert_array_equal(gb, wb)

    def boom(*a, **k):
        raise RuntimeError("synthetic device-path failure")

    f2f.predictor.predict_many_device = boom
    res_slow = f2f._group_logits(signals)
    err = capsys.readouterr().err
    assert "device-resident group inference failed" in err
    assert "RuntimeError" in err
    for (gb, gd), (wb, wd) in zip(res_slow, want):
        np.testing.assert_array_equal(gb, wb)
        np.testing.assert_array_equal(gd, wd)


def test_batched_spects_matches_per_file():
    """The packed-flat group mel must be samplewise identical to the
    per-file `signal2spect` mel for every length class: sub-second, odd
    lengths, exact hop multiples (441*k and +-1), and a file shorter than
    the 512-sample reflect window."""
    import beat_this_tpu.inference as inf

    f2f = inf.BatchedFile2File.__new__(inf.BatchedFile2File)
    rng = np.random.RandomState(7)
    lengths = [300, 600, 441 * 50, 441 * 50 - 1, 441 * 50 + 1, 22050, 70007]
    signals = [0.3 * rng.randn(n).astype(np.float32) for n in lengths]

    batched = f2f._batched_spects(signals)

    from beat_this_tpu.ops.mel import LogMelConfig, log_mel_spectrogram, num_frames

    bucket = inf.Audio2Frames._MEL_BUCKET_SAMPLES
    for s, got in zip(signals, batched):
        import math

        padded = inf._pad_wave_for_mel(
            s, max(1, math.ceil(len(s) / bucket)) * bucket
        )
        want = np.asarray(log_mel_spectrogram(padded, LogMelConfig()))
        want = want[: num_frames(len(s))]
        assert got.shape == want.shape
        np.testing.assert_array_equal(got, want)


def test_pcm16_upload_is_bit_exact():
    """16-bit-PCM-exact signals ride the halved int16 upload and must
    produce bit-identical mels to the f32 upload (the device undoes the
    power-of-two scale exactly); non-representable signals fall through."""
    import beat_this_tpu.inference as inf
    from beat_this_tpu.ops.mel import LogMelConfig, log_mel_spectrogram, num_frames

    rng = np.random.RandomState(21)
    # exactly what a 16-bit wav decode produces: k / 32768
    pcm = [
        (rng.randint(-32768, 32768, n).astype(np.float32) / 32768.0)
        for n in (400, 22050, 441 * 30 + 7)
    ]
    converted = inf._as_pcm16_if_exact(pcm[1])
    assert converted.dtype == np.int16

    # float-valued (e.g. resampled) audio must pass through unchanged
    fl = 0.3 * rng.randn(5000).astype(np.float32)
    assert inf._as_pcm16_if_exact(fl) is fl
    # full-scale edge: +32767/32768 representable, anything above is not
    edge = np.float32(32767.0 / 32768.0) * np.ones(16, np.float32)
    assert inf._as_pcm16_if_exact(edge).dtype == np.int16
    over = np.float32(1.0001) * np.ones(16, np.float32)
    assert inf._as_pcm16_if_exact(over) is over

    f2f = inf.BatchedFile2File.__new__(inf.BatchedFile2File)
    got = f2f._batched_spects(pcm)
    import math

    bucket = inf.Audio2Frames._MEL_BUCKET_SAMPLES
    for s, g in zip(pcm, got):
        padded = inf._pad_wave_for_mel(
            s, max(1, math.ceil(len(s) / bucket)) * bucket
        )
        want = np.asarray(
            log_mel_spectrogram(padded.astype(np.float32), LogMelConfig())
        )[: num_frames(len(s))]
        np.testing.assert_array_equal(g, want)
