"""Fused log-mel spectrogram frontend, TPU-native.

Replaces the reference's torchaudio `MelSpectrogram` (reference:
beat_this/preprocessing.py:27-59) with a single XLA graph designed for the
MXU: framing + Hann window + real DFT are expressed as ONE strided
convolution (filters = windowed DFT basis), followed by magnitude, the
`normalized="frame_length"` scaling (divide by sqrt(n_fft)), a mel filterbank
matmul, and `log1p(1000 * x)`. No gathers, no FFT primitive — everything maps
onto the systolic array, and XLA fuses the elementwise tail.

Semantics matched to torchaudio defaults used by the reference:
  * center=True with reflect padding of n_fft//2 samples,
  * periodic Hann window of length n_fft,
  * onesided spectrum (n_fft//2 + 1 bins), power=1 (magnitude),
  * `normalized="frame_length"`: complex STFT divided by sqrt(win_length),
  * slaney-scale mel filterbank, norm=None, f_min=30, f_max=11000, 128 mels,
  * frame count = T // hop + 1.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def hz_to_mel_slaney(freq):
    """Slaney HTK-free mel scale: linear below 1 kHz, log above."""
    freq = np.asarray(freq, dtype=np.float64)
    f_sp = 200.0 / 3.0
    mels = freq / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(
        freq >= min_log_hz, min_log_mel + np.log(freq / min_log_hz) / logstep, mels
    )


def mel_to_hz_slaney(mels):
    mels = np.asarray(mels, dtype=np.float64)
    f_sp = 200.0 / 3.0
    freqs = mels * f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(
        mels >= min_log_mel, min_log_hz * np.exp(logstep * (mels - min_log_mel)), freqs
    )


@functools.lru_cache(maxsize=8)
def mel_filterbank(
    n_freqs: int, f_min: float, f_max: float, n_mels: int, sample_rate: int
) -> np.ndarray:
    """Triangular slaney-scale filterbank, shape (n_freqs, n_mels), float32.

    Equivalent to torchaudio.functional.melscale_fbanks(..., norm=None,
    mel_scale="slaney").
    """
    all_freqs = np.linspace(0, sample_rate // 2, n_freqs)
    m_pts = np.linspace(
        hz_to_mel_slaney(f_min), hz_to_mel_slaney(f_max), n_mels + 2
    )
    f_pts = mel_to_hz_slaney(m_pts)
    f_diff = f_pts[1:] - f_pts[:-1]
    slopes = f_pts[None, :] - all_freqs[:, None]  # (n_freqs, n_mels + 2)
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0.0, np.minimum(down, up))
    return fb.astype(np.float32)


@functools.lru_cache(maxsize=4)
def _dft_conv_filter(n_fft: int) -> np.ndarray:
    """Windowed real-DFT basis as a conv filter (n_fft, 1, 2 * n_bins).

    Column k < n_bins is cos(2 pi n k / n_fft) * hann(n); column n_bins + k is
    -sin(...) * hann(n), so a strided convolution produces [Re | Im] directly.
    """
    n_bins = n_fft // 2 + 1
    n = np.arange(n_fft, dtype=np.float64)
    window = 0.5 * (1.0 - np.cos(2.0 * np.pi * n / n_fft))  # periodic Hann
    k = np.arange(n_bins, dtype=np.float64)
    angles = 2.0 * np.pi * np.outer(n, k) / n_fft
    basis = np.concatenate([np.cos(angles), -np.sin(angles)], axis=1)
    return (basis * window[:, None]).astype(np.float32)[:, None, :]


@dataclass(frozen=True)
class LogMelConfig:
    """Parameters mirroring reference beat_this/preprocessing.py:27-41."""

    sample_rate: int = 22050
    n_fft: int = 1024
    hop_length: int = 441
    f_min: float = 30.0
    f_max: float = 11000.0
    n_mels: int = 128
    log_multiplier: float = 1000.0


def num_frames(num_samples: int, hop_length: int = 441) -> int:
    return num_samples // hop_length + 1


@functools.partial(jax.jit, static_argnames=("config",))
def log_mel_spectrogram(
    waveform: jnp.ndarray, config: LogMelConfig = LogMelConfig()
) -> jnp.ndarray:
    """Compute a log-mel spectrogram on device.

    Args:
        waveform: float32 (or int16 PCM, scaled by 1/32768 on device) array
            of shape (num_samples,) or (batch, num_samples) at
            `config.sample_rate`.
    Returns:
        (frames, n_mels) or (batch, frames, n_mels) float32 log-mel values,
        frames = num_samples // hop_length + 1.
    """
    c = config
    squeeze = waveform.ndim == 1
    if squeeze:
        waveform = waveform[None]
    x = waveform.astype(jnp.float32)
    if waveform.dtype == jnp.int16:
        # 16-bit PCM convention. The int16->f32 cast and the power-of-two
        # scale are both exact, so callers whose samples are exactly
        # representable as PCM (any 16-bit wav) can upload HALF the bytes
        # over the host->device link with bit-identical results vs an f32
        # upload — the link is the mel stage's bottleneck on a relay-attached
        # TPU (tools/profile_mel_stage.py).
        x = x * jnp.float32(1.0 / 32768.0)
    pad = c.n_fft // 2
    x = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")
    # framing + window + rDFT as one strided conv on the MXU
    filt = jnp.asarray(_dft_conv_filter(c.n_fft))
    out = lax.conv_general_dilated(
        x[..., None],  # (B, T, 1)
        filt,  # (n_fft, 1, 2 * n_bins)
        window_strides=(c.hop_length,),
        padding="VALID",
        dimension_numbers=("NWC", "WIO", "NWC"),
    )  # (B, frames, 2 * n_bins)
    n_bins = c.n_fft // 2 + 1
    re, im = out[..., :n_bins], out[..., n_bins:]
    mag = jnp.sqrt(re * re + im * im) * (1.0 / np.sqrt(c.n_fft))
    fb = jnp.asarray(
        mel_filterbank(n_bins, c.f_min, c.f_max, c.n_mels, c.sample_rate)
    )
    mel = mag @ fb  # (B, frames, n_mels)
    out = jnp.log1p(c.log_multiplier * mel)
    return out[0] if squeeze else out


class LogMelSpect:
    """Callable-class surface of `log_mel_spectrogram`, mirroring the
    reference's `beat_this.preprocessing.LogMelSpect` torch module
    (beat_this/preprocessing.py:26-63): construct with the spectrogram
    parameters, call with a (num_samples,) or (batch, num_samples)
    waveform, get (frames, n_mels) log-mel values. `mel_scale`,
    `normalized` and `power` accept only the reference's defaults (the
    only values the model was ever trained with); `device` is accepted
    for API compatibility and ignored (JAX places the computation on the
    default backend)."""

    def __init__(self, sample_rate=22050, n_fft=1024, hop_length=441,
                 f_min=30, f_max=11000, n_mels=128, mel_scale="slaney",
                 normalized="frame_length", power=1, log_multiplier=1000,
                 device=None):
        if (mel_scale, normalized, power) != ("slaney", "frame_length", 1):
            raise NotImplementedError(
                "only the reference configuration is implemented: "
                "mel_scale='slaney', normalized='frame_length', power=1"
            )
        del device
        self.config = LogMelConfig(
            sample_rate=sample_rate, n_fft=n_fft, hop_length=hop_length,
            f_min=float(f_min), f_max=float(f_max), n_mels=n_mels,
            log_multiplier=float(log_multiplier),
        )

    def __call__(self, waveform):
        return log_mel_spectrogram(jnp.asarray(waveform), self.config)
