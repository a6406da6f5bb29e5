"""beat_this_tpu — a TPU-native (JAX/XLA/Pallas) beat & downbeat tracking framework.

Re-implements the full capabilities of CPJKU/beat_this (ISMIR 2024,
arXiv:2407.21658) with a TPU-first design: fused XLA audio frontend, a
functional JAX model that loads the released PyTorch checkpoints, fixed-shape
batched chunked inference, on-device postprocessing (peak picking and a
lax.scan Viterbi replacement for the madmom DBN), mir_eval-equivalent metrics,
and data-parallel training over a `jax.sharding.Mesh`.

Public API mirrors the reference (reference: beat_this/inference.py:233-315):
    Spect2Frames, Audio2Frames, Audio2Beats, File2Beats, File2File, load_model
"""

__version__ = "0.1.0"

_INFERENCE_EXPORTS = (
    "Spect2Frames",
    "Audio2Frames",
    "Audio2Beats",
    "File2Beats",
    "File2File",
    "load_model",
)


def __getattr__(name):  # lazy re-export to keep `import beat_this_tpu` light
    if name in _INFERENCE_EXPORTS:
        import beat_this_tpu.inference as _inf

        return getattr(_inf, name)
    raise AttributeError(name)
