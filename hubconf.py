"""Hub entry points (equivalent surface to the reference hubconf.py).

The reference exposes its loader and inference classes through torch.hub;
here the same names are importable from this file (torch.hub itself can load
it with `source="local"`-style usage, and plain `import hubconf` works too —
the objects are torch-free)."""

dependencies = ["jax", "numpy"]

from beat_this_tpu.inference import (  # noqa: F401, E402
    Audio2Beats,
    Audio2Frames,
    BeatThis,
    File2Beats,
    File2File,
    Spect2Frames,
    load_model as beat_this,
)
