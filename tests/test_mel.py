"""Golden tests for the fused log-mel frontend against an independent oracle:
torch.stft (the exact kernel torchaudio's MelSpectrogram wraps) plus a
loop-written slaney filterbank."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from beat_this_tpu.ops.mel import (
    LogMelConfig,
    log_mel_spectrogram,
    mel_filterbank,
    num_frames,
)


def oracle_logmel(x: np.ndarray) -> np.ndarray:
    spec = torch.stft(
        torch.from_numpy(x).float(),
        n_fft=1024,
        hop_length=441,
        window=torch.hann_window(1024),
        center=True,
        pad_mode="reflect",
        return_complex=True,
    )
    mag = spec.abs().numpy() / np.sqrt(1024.0)  # normalized="frame_length"
    fb = oracle_fbank()
    mel = fb.T @ mag  # (128, frames)
    return np.log1p(1000.0 * mel).T  # (frames, 128)


def oracle_fbank() -> np.ndarray:
    """Slaney-scale triangular filters written as explicit loops."""

    def hz2mel(f):
        if f < 1000.0:
            return f / (200.0 / 3.0)
        return 15.0 + np.log(f / 1000.0) / (np.log(6.4) / 27.0)

    def mel2hz(m):
        if m < 15.0:
            return m * (200.0 / 3.0)
        return 1000.0 * np.exp((np.log(6.4) / 27.0) * (m - 15.0))

    n_freqs, n_mels = 513, 128
    freqs = np.linspace(0, 11025, n_freqs)
    mel_pts = np.linspace(hz2mel(30.0), hz2mel(11000.0), n_mels + 2)
    hz_pts = np.array([mel2hz(m) for m in mel_pts])
    fb = np.zeros((n_freqs, n_mels))
    for j in range(n_mels):
        lo, ctr, hi = hz_pts[j], hz_pts[j + 1], hz_pts[j + 2]
        for i, f in enumerate(freqs):
            if lo < f < ctr:
                fb[i, j] = (f - lo) / (ctr - lo)
            elif ctr <= f < hi:
                fb[i, j] = (hi - f) / (hi - ctr)
            elif f == ctr:
                fb[i, j] = 1.0
    return fb


def test_filterbank_matches_loop_oracle():
    fb = mel_filterbank(513, 30.0, 11000.0, 128, 22050)
    np.testing.assert_allclose(fb, oracle_fbank(), atol=1e-6)


def test_logmel_matches_stft_oracle():
    rng = np.random.RandomState(0)
    x = (rng.randn(22050) * 0.1).astype(np.float32)  # 1 s of noise
    ours = np.asarray(log_mel_spectrogram(x))
    ref = oracle_logmel(x)
    assert ours.shape == ref.shape == (num_frames(22050), 128)
    np.testing.assert_allclose(ours, ref, atol=2e-4)


def test_logmel_sine_and_batch():
    t = np.arange(44100) / 22050.0
    x = (0.5 * np.sin(2 * np.pi * 440.0 * t)).astype(np.float32)
    ours = np.asarray(log_mel_spectrogram(x))
    ref = oracle_logmel(x)
    np.testing.assert_allclose(ours, ref, atol=1e-3)
    # batch dimension agrees with single
    both = np.asarray(log_mel_spectrogram(np.stack([x, x])))
    np.testing.assert_allclose(both[0], ours, atol=1e-6)
    np.testing.assert_allclose(both[1], ours, atol=1e-6)


def test_frame_count_matches_reference_convention():
    # frames = samples // hop + 1 (torch.stft with center=True)
    for n in (441, 442, 22050, 30 * 22050):
        assert num_frames(n) == n // 441 + 1
        x = np.zeros(n, dtype=np.float32)
        assert log_mel_spectrogram(x).shape == (n // 441 + 1, 128)


def test_bucketed_padding_matches_exact_length():
    """The inference path computes mel on bucket-padded signals; frames of
    the true signal must match an exact-length computation (reflect padding
    at the true end, not zeros)."""
    from beat_this_tpu.inference import _pad_wave_for_mel
    from beat_this_tpu.ops.mel import num_frames as nf

    rng = np.random.RandomState(5)
    x = (rng.randn(22050 + 123) * 0.3).astype(np.float32)
    exact = np.asarray(log_mel_spectrogram(x))
    padded = _pad_wave_for_mel(x, 441 * 64)
    bucketed = np.asarray(log_mel_spectrogram(padded))[: nf(len(x))]
    np.testing.assert_allclose(bucketed, exact, atol=1e-5)


def test_config_is_reference_default():
    c = LogMelConfig()
    assert (c.sample_rate, c.n_fft, c.hop_length) == (22050, 1024, 441)
    assert (c.f_min, c.f_max, c.n_mels, c.log_multiplier) == (30.0, 11000.0, 128, 1000.0)
