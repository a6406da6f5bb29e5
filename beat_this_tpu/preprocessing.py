"""Module-path parity with the reference's `beat_this.preprocessing`
(beat_this/preprocessing.py): `load_audio` and `LogMelSpect` importable
from the same place a migrating user expects."""

from beat_this_tpu.io.audio import load_audio  # noqa: F401
from beat_this_tpu.ops.mel import LogMelConfig, LogMelSpect  # noqa: F401
