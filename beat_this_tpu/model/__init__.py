from beat_this_tpu.model.beat_this import (  # noqa: F401
    BeatThisConfig,
    apply_beat_this,
    init_beat_this,
)
