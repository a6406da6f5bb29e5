from beat_this_tpu.postprocessing.postprocessor import (  # noqa: F401
    Postprocessor,
    deduplicate_peaks,
)
